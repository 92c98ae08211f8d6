package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate documents into
  * fixed-token-budget training sequences ("concat then chunk" — a doc may
  * straddle two sequences, the standard GPT-style packing).
  *
  * Scale design: a single global packing order would serialize the corpus
  * through one window partition, so documents are first sharded by a
  * deterministic hash of the id (the mod-prime affine family — seed
  * stream 32768, disjoint from the minhash/IVF/sampling streams) and
  * packed WITHIN each shard: the running-token-offset window runs
  * per-shard, so parallelism equals the shard count (sized to the
  * cluster, not the data). This mirrors how distributed training actually
  * consumes data — each worker packs its own shard; no cross-shard order
  * is ever promised. All arithmetic is integral (token counts, integer
  * division), so the DuckDB oracle replays it exactly.
  */
object Packing {

  /** Seed-stream index for the shard hash (disjoint from Sampling's
    * 16384 and the IVF seed's 8192). */
  private[graft] val SeedIdx = 32768L

  /** Default knobs, shared between the registered queries and their DuckDB
    * oracles (interpolated into the SQL) so the two can never desync. */
  val DefaultBudget = 512
  val DefaultShards = 8

  /** The shard of an id: poly-hash then mod `shards` — uniform regardless
    * of id distribution (sequential ids would stripe mod-only shards). */
  def shardOf(id: Column, shards: Int): Column = {
    val P = graft.functions.TextHashes.PolyP
    val h = (lit(graft.functions.TextHashes.polyA(SeedIdx)) * pmod(id.cast("long"), lit(P)) +
      lit(graft.functions.TextHashes.polyB(SeedIdx))) % lit(P)
    pmod(h, lit(shards.toLong)).cast("int")
  }

  /** Assign every document a (shard, seq_in_shard, offset_in_seq) packing
    * position: documents are laid out back-to-back in id order within
    * their shard, and sequence boundaries fall every `budget` tokens.
    *
    * Returns (idCol, shard, n_tokens, seq_in_shard, offset_in_seq).
    */
  def packSequences(docs: DataFrame, budget: Int, shards: Int,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol), shardOf(col(idCol), shards).as("shard"),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col(idCol), col("shard"), col("n_tokens"),
        expr(s"offset div $budget").as("seq_in_shard"),
        pmod(col("offset"), lit(budget.toLong)).as("offset_in_seq"))
  }
}
