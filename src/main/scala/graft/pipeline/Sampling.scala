package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling for training-data pipelines —
  * rebalance over-represented strata (languages, sources, length buckets)
  * by keeping a row iff `hash(id) mod D < rate(stratum) · D`.
  *
  * Versus `rand()`-based sampling: the decision is a pure function of the
  * row id, so it is reproducible across runs, retries, engines and
  * partitionings (a re-run keeps the SAME documents — essential when the
  * sample feeds a training corpus that must be auditable), and it needs
  * no RNG state, no shuffle, no driver coordination: one codegen'd
  * projection in the scan. The hash is the mod-prime affine family
  * (TextHashes.polyA/polyB, stream index 16384 — disjoint from the
  * minhash/simhash/IVF streams), so a SQL oracle replays the decision in
  * plain BIGINT arithmetic.
  *
  * Rates are fixed-point per-myriad (rate · 10000 rounded) on BOTH the
  * Spark and oracle sides, so no float comparison sits on the keep/drop
  * boundary.
  */
object Sampling {

  private val D = 10000L
  private[graft] val SeedIdx = 16384L

  /** The per-myriad threshold a rate maps to — shared with oracle
    * generators so both sides round identically. */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    math.round(rate * D)
  }

  /** The sampling hash in [0, D). Replay note: Spark's pmod keeps the id
    * reduction non-negative, so an engine with C-style `%` (DuckDB,
    * Postgres) must replay NEGATIVE ids as `((id % P) + P) % P`; for
    * non-negative ids plain `(A * (id % P) + B) % P % 10000` is identical
    * (what the registered oracle uses — doc_id >= 0). */
  def sampleHash(id: Column): Column = {
    val P = graft.functions.TextHashes.PolyP
    ((lit(graft.functions.TextHashes.polyA(SeedIdx)) * pmod(id.cast("long"), lit(P)) +
      lit(graft.functions.TextHashes.polyB(SeedIdx))) % lit(P)) % lit(D)
  }

  /** Keep-decision for a stratified sample: per-stratum rates, with a
    * default for strata not listed. */
  def stratifiedKeep(id: Column, stratum: Column, rates: Map[String, Double],
                     defaultRate: Double = 1.0): Column = {
    val thr = rates.foldLeft(lit(threshold(defaultRate))) { case (acc, (k, r)) =>
      when(stratum === k, lit(threshold(r))).otherwise(acc)
    }
    sampleHash(id) < thr
  }

  /** FIXED-SIZE per-stratum sample: exactly min(k, |stratum|) rows per
    * group, chosen by ranking the deterministic sample hash (ties broken
    * by id) — a uniform without-replacement draw that is reproducible
    * across runs/engines/partitionings, the complement of the
    * fraction-based [[stratifiedKeep]] ("give me 10k docs per source",
    * not "keep 3% of each source").
    *
    * Scale shape: the rank ≤ k filter compiles to WindowGroupLimit, so
    * each input partition prunes to its local k per group BEFORE the
    * group exchange — the shuffle moves O(groups · k · partitions) rows,
    * never the corpus (plan-tested). */
  def kPerGroup(df: DataFrame, groupCol: String, k: Int,
                idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    require(!df.columns.contains("__rk"),
      "a __rk column already exists — rename it before sampling")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(sampleHash(col(idCol)).asc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w)).where(col("__rk") <= k).drop("__rk")
  }
}
