package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Scale design: queries are broadcast (they are the small side by
  * definition); the corpus is never shuffled for brute force — each
  * partition scores its slice and the only exchange is the per-query top-k
  * (a window over k·|queries| rows after per-partition pruning by rank).
  * The LSH path buckets the corpus by random-hyperplane signature so each
  * query only scores its own bucket — the 100 TB path where brute force
  * would read everything per query.
  */
object Similarity {

  /** Named IVF defaults — referenced by queries.IvfSql so the oracle's
    * replay constants cannot silently drift from the defaults the
    * registered query runs with (same coupling discipline as
    * DedupSql.bucketCte). */
  val DefaultNumCentroids = 16
  val DefaultLloydIters = 3
  val DefaultNProbe = 4
  val DefaultTopK = 5

  /** Lloyd-refinement hash-sample modulus the REGISTERED persisted-index
    * query runs with (keep 1/4 of the corpus, selected by the same seed
    * hash the oracle replays). This is the knob that keeps the index
    * build's per-iteration scan cost sublinear in the corpus — at 100 TB
    * the refinement runs on a fixed-rate sample while the one-time
    * assignment pass still covers every vector. Library defaults stay at
    * sampleMod = 1 (tiny test corpora can't spare rows); the driver query
    * and IvfSql share THIS constant so the replay can't drift. */
  val DefaultLloydSampleMod = 4

  /** Cosine similarity between two double arrays — the native fused-loop
    * Catalyst expression (graft.functions.CosineSim, with doGenCode). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim.cosineSim(a, b)

  /** The composed-builtins formulation (zip_with + aggregate), kept as the
    * reference implementation the native expression is tested against. */
  def cosineComposed(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v * v))
    when(na === 0 || nb === 0, 0.0).otherwise(dot / (na * nb))
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self-match excluded). Queries side is broadcast. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), asDouble(col(vecCol)).as("c_vec"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("q_vec"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("q_vec"), col("c_vec")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Sign of the (j,k) random-projection weight: splitmix64 of the flat
    * index j·outDim+k, thresholded to {+1,−1,0} with density 1/3
    * (Achlioptas 2003, "Database-friendly random projections"). The mix
    * matters: a raw power-of-two-modulus LCG here preserves the index's
    * parity, which with an even `outDim` locks every output dimension to
    * weights of a single sign — subset sums, not signed projections —
    * quietly degrading shortlist recall on vectors with a nonzero mean
    * component. splitmix64 (TextHashes.splitmix, the same mix the
    * hyperplane LSH uses) has full avalanche, so signs decorrelate from
    * index structure. Deterministic integer arithmetic end to end — the
    * oracle precomputes the identical matrix from THIS function and
    * embeds it as a literal ±v[j] chain (PipelineQueries), nothing
    * serialized at runtime. */
  def rpSign(j: Int, k: Int, outDim: Int): Double = {
    val z = graft.functions.TextHashes.splitmix(j.toLong * outDim + k)
    java.lang.Math.floorMod(z, 6L) match {
      case 0L => 1.0; case 1L => -1.0; case _ => 0.0
    }
  }

  /** Deterministic sparse random projection: appends `outCol` =
    * Array[Double](outDim) with out(k) = Σ_j v(j)·rpSign(j,k). The usual
    * √(3/outDim) scale factor is dropped — cosine is scale-invariant,
    * and {±1,0} weights keep the fold bit-reproducible across engines.
    *
    * Zero-weight terms are skipped (the sum is emitted as a literal
    * ±element_at chain, ~inDim·outDim/3 fused adds inside codegen): an
    * oracle replaying the FULL left fold adds v(j)·0 = ±0.0 there, and
    * IEEE `acc + ±0.0 == acc` for every acc this fold produces — the
    * accumulator starts at +0.0 and an exact-zero sum rounds to +0.0
    * under round-to-nearest, so it is never −0.0 — hence the skip is
    * bit-exact, not approximate.
    *
    * Scale: pure map-side projection, zero shuffles — the standard
    * candidate-generation move for ANN over a 100 TB corpus: shortlist
    * in the low-dim space, re-rank exact on the full vectors
    * ([[rpRerankTopK]]). */
  def randomProject(df: DataFrame, inDim: Int, outDim: Int,
                    vecCol: String = "embedding", outCol: String = "rp"): DataFrame = {
    val dims = (0 until outDim).map { k =>
      (0 until inDim).foldLeft(lit(0.0)) { (acc, j) =>
        rpSign(j, k, outDim) match {
          case 1.0  => acc + element_at(col(vecCol), j + 1).cast("double")
          case -1.0 => acc - element_at(col(vecCol), j + 1).cast("double")
          case _    => acc
        }
      }
    }
    df.withColumn(outCol, array(dims: _*))
  }

  /** Project → shortlist → exact re-rank ANN: cosine top-`shortlist` in
    * the `outDim`-dim projected space (cheap), then exact cosine over the
    * full `inDim`-dim vectors on that candidate set only, top-`k`. The
    * candidate set is queries·shortlist rows — broadcast back against the
    * corpus, so the full vectors of non-candidates are never scored. */
  def rpRerankTopK(corpus: DataFrame, queries: DataFrame, inDim: Int, outDim: Int,
                   shortlist: Int = 20, k: Int = 5,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val rc = randomProject(corpus, inDim, outDim, vecCol).select(col(idCol), col("rp"))
    val rq = randomProject(queries, inDim, outDim, vecCol).select(col(idCol), col("rp"))
    val cand = bruteForceTopK(rc, rq, k = shortlist, idCol = idCol, vecCol = "rp")
      .select("query_id", "corpus_id")
    val cv = corpus.select(col(idCol).as("corpus_id"), asDouble(col(vecCol)).as("c_vec"))
    val qv = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("q_vec"))
    val scored = cv.join(broadcast(cand), "corpus_id")
      .join(broadcast(qv), "query_id")
      .select(col("query_id"), col("corpus_id"),
        cosine(col("q_vec"), col("c_vec")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Random-hyperplane signature for one LSH table (native expression;
    * see TextHashes.HyperplaneSigs — all tables in one fused loop). */
  def lshSignature(vec: Column, planes: Int = 6, table: Int = 0): Column =
    element_at(graft.functions.TextHashes.hyperplaneSigs(asDouble(vec), planes, table + 1), table + 1)

  /** All-tables signatures as one array column (the hot path). */
  private def lshSignatures(vec: Column, planes: Int, tables: Int): Column =
    graft.functions.TextHashes.hyperplaneSigs(asDouble(vec), planes, tables)

  /** Approximate top-k via multi-table hyperplane LSH (OR-amplified):
    * each of `tables` independent signatures buckets the corpus; a pair is
    * scored if it collides in ANY table. Collision probability for angle θ
    * is 1−(1−(1−θ/π)^planes)^tables — raise `tables` for recall, `planes`
    * for precision. Candidates are deduped before scoring, so each pair is
    * scored once regardless of how many tables it collides in. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5, planes: Int = 6,
              tables: Int = 8, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def sigs(df: DataFrame, id: String, vecOut: String) =
      df.select(col(idCol).as(id), asDouble(col(vecCol)).as(vecOut),
        posexplode(lshSignatures(col(vecCol), planes, tables)).as(Seq("tbl", "sig")))
    val c = sigs(corpus, "corpus_id", "c_vec")
    val q = sigs(queries, "query_id", "q_vec")
    val candidates = c.select("corpus_id", "tbl", "sig")
      .join(broadcast(q.select("query_id", "tbl", "sig")), Seq("tbl", "sig"))
      .where(col("corpus_id") =!= col("query_id"))
      .select("query_id", "corpus_id").distinct()
    val cv = corpus.select(col(idCol).as("corpus_id"), asDouble(col(vecCol)).as("c_vec"))
    val qv = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("q_vec"))
    val scored = candidates.join(cv, "corpus_id").join(broadcast(qv), "query_id")
      .select(col("query_id"), col("corpus_id"),
        cosine(col("q_vec"), col("c_vec")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Per-row nearest-centroid id (1-based) against the centroid table:
    * ONE fused native k×dim loop (functions.NearestCentroid) inside the
    * scan projection — no window, no shuffle, no exchange of the corpus,
    * and no per-centroid expression trees to codegen (the 16-tree literal
    * formulation spent seconds compiling per action). Ties break to the
    * lowest cid, matching the probe side's (csim desc, cid asc) ordering. */
  private def nearestCid(v: Column, cents: Array[Array[Double]]): Column =
    graft.functions.NearestCentroid.nearestCentroid(v, cents)

  /** Build the IVF coarse quantizer: deterministic hash-ordered seed of
    * `numCentroids` corpus vectors, refined with `lloydIters` Lloyd
    * (k-means) iterations over a hash sample of the corpus.
    *
    * This is the index-BUILD phase and runs Spark actions (like writing
    * an index file would): the seed is a TakeOrderedAndProject of k rows
    * (per-partition top-k, driver merge — never a SinglePartition
    * exchange), and each Lloyd step is a map-side argmax + a
    * (cid, dim)-keyed partial-aggregated mean, so shuffle volume per
    * iteration is bounded by partitions × k × dim regardless of corpus
    * size. The sample cap keeps the refinement cost fixed at 100 TB. */
  def ivfBuild(corpus: DataFrame, numCentroids: Int = DefaultNumCentroids,
               lloydIters: Int = DefaultLloydIters,
               sampleMod: Int = 1, idCol: String = "vec_id",
               vecCol: String = "embedding", portableSeed: Boolean = false,
               sampleTarget: Long = 0L): Array[Array[Double]] = {
    // the seed is a deterministic hash shuffle of the ids; `portableSeed`
    // swaps XXH64 for the mod-prime affine family (every intermediate
    // < 2^60) so a SQL oracle can replay the exact seed order — id is
    // reduced mod P first, which keeps the product in range for any id.
    // portableSeed ALSO rounds each Lloyd mean to 6 decimals: fp summation
    // order inside avg() differs between engines (and between Spark runs),
    // and the rounding absorbs that noise so the replayed centroids — and
    // therefore every downstream assignment — are value-identical
    val P = graft.functions.TextHashes.PolyP
    val seedHash =
      if (portableSeed)
        (lit(graft.functions.TextHashes.polyA(8192L)) * pmod(col(idCol).cast("long"), lit(P)) +
          lit(graft.functions.TextHashes.polyB(8192L))) % lit(P)
      else xxhash64(col(idCol))
    // the build phase runs 1 + lloydIters actions over the same projection
    // — cache it so parquet is read once, not per action. Storage-level
    // guarded: a re-entrant build over the same corpus would otherwise
    // re-cache an identical plan and draw the CacheManager warning.
    val cPlan = corpus.select(seedHash.as("h"), col(idCol).cast("long").as("sid"),
      asDouble(col(vecCol)).as("v"))
    val cWasCached = cPlan.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val c = if (cWasCached) cPlan else cPlan.cache()
    try {
      // secondary sort on id: limit-under-ties must be deterministic for
      // the oracle (XXH64 never collides in practice, the poly hash can)
      var cents: Array[Array[Double]] = timed("seed")(c.orderBy("h", "sid").limit(numCentroids)
        .collect().map(_.getSeq[Double](2).toArray))
      require(cents.nonEmpty, "ivfBuild: corpus is empty — nothing to seed centroids from")
      val sample = lloydSample(c, sampleMod, sampleTarget)
      for (it <- 1 to lloydIters) {
        val means = timed(s"lloyd$it")(sample.select(nearestCid(col("v"), cents).as("cid"),
            posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("cid", "pos")
          .agg((if (portableSeed) round(avg("x"), 6) + lit(0.0) else avg("x")).as("m"))
          .groupBy("cid").agg(map_from_arrays(collect_list("pos"), collect_list("m")).as("byPos"))
          .collect().map { r =>
            val m = r.getMap[Int, Double](1)
            r.getInt(0) -> Array.tabulate(cents(0).length)(d => m(d))
          }.toMap)
        cents = cents.indices.map(i => means.getOrElse(i + 1, cents(i))).toArray
      }
      cents
    } finally if (!cWasCached) c.unpersist(blocking = false)
  }

  /** The Lloyd refinement sample. Two modes:
    *
    *   - `sampleTarget > 0` — fixed-SIZE: one count over the (cached)
    *     projection derives a fixed-point keep fraction, so the refinement
    *     shuffle is bounded by ~sampleTarget rows at ANY corpus size. This
    *     is the 100 TB posture: build cost stops growing with N once the
    *     sample saturates (k-means quality needs ~k×1000 points, not the
    *     corpus). Wins over `sampleMod` when both are set.
    *   - `sampleMod > 1` — fixed-RATE: keep every sampleMod-th hash value;
    *     cost stays linear in N but the predicate is trivially replayable
    *     in SQL, which is why the oracle-registered query keeps using it
    *     (IvfSql replays DefaultLloydSampleMod).
    *
    * Both select on the SAME deterministic per-row hash `h` used for
    * seeding, so the sample is reproducible across runs and engines; the
    * fixed-size threshold compares `h mod 2^20` against fraction×2^20,
    * independent of the `orderBy(h).limit(k)` seed choice for any
    * non-degenerate corpus (the k seed rows are the k smallest h — a
    * vanishing fraction of the range). */
  private[graft] def lloydSample(c: DataFrame, sampleMod: Int, sampleTarget: Long): DataFrame =
    if (sampleTarget > 0L) {
      val n = c.count()
      if (n <= sampleTarget) c
      else {
        val scale = 1L << 20
        val thr = math.max(1L, sampleTarget * scale / n)
        c.where(pmod(col("h"), lit(scale)) < lit(thr))
      }
    } else if (sampleMod <= 1) c
    else c.where(pmod(col("h"), lit(sampleMod)) === 0)

  /** IVF (inverted-file) index: a small set of coarse centroids partitions
    * the corpus into lists; queries probe only the `nprobe` nearest lists.
    *
    * At 100 TB the centroid set stays tiny (k ≈ √N) and rides into every
    * task as literals in the generated code; the corpus is scanned ONCE to
    * assign lists — a map-side argmax projection, zero shuffles — and a
    * query touches nprobe/k of the data instead of all of it. */
  def ivfAssign(corpus: DataFrame, cents: Array[Array[Double]],
                idCol: String, vecCol: String): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = cents.zipWithIndex.map { case (v, i) => (i + 1, v) }.toSeq
      .toDF("cid", "centroid")
    val assignments = corpus.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("cid", nearestCid(col("v"), cents))
    (centroids, assignments)
  }

  /** The probe phase shared by the in-memory and persisted index paths:
    * pick each query's `nprobe` nearest centroids from the broadcast
    * centroid table, then score ONLY those lists. */
  private def ivfProbe(centroids: DataFrame, assignments: DataFrame, queries: DataFrame,
                       k: Int, nprobe: Int, idCol: String, vecCol: String): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("q_vec"))
    val probeW = Window.partitionBy("query_id").orderBy(col("csim").desc, col("cid").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("q_vec"), col("centroid")))
      .withColumn("pr", row_number().over(probeW))
      .where(col("pr") <= nprobe)
      .select("query_id", "q_vec", "cid")
    val scored = assignments.join(broadcast(probes), "cid")
      .where(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("corpus_id"),
        cosine(col("q_vec"), col("v")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF approximate top-k: probe the `nprobe` closest centroid lists per
    * query and score only those lists. Recall grows with nprobe
    * (nprobe == numCentroids ⇒ exact brute force). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = DefaultTopK,
              numCentroids: Int = DefaultNumCentroids, nprobe: Int = DefaultNProbe,
              lloydIters: Int = DefaultLloydIters,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = ivfBuild(corpus, numCentroids, lloydIters, 1, idCol, vecCol)
    val (centroids, assignments) = ivfAssign(corpus, cents, idCol, vecCol)
    ivfProbe(centroids, assignments, queries, k, nprobe, idCol, vecCol)
  }

  /** Persist a built IVF index: centroid table + list assignments, the
    * lists laid out `partitionBy(cid)` so a probe's scan is pruned to its
    * own lists' files — the build-once/probe-many workflow a 100 TB
    * corpus actually uses (assignment scan runs once at write time). */
  private def timed[T](what: String)(f: => T): T = {
    if (sys.env.contains("GRAFT_IVF_DEBUG")) {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[ivf] $what ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    } else f
  }

  def ivfWrite(corpus: DataFrame, path: String, numCentroids: Int = DefaultNumCentroids,
               lloydIters: Int = DefaultLloydIters, idCol: String = "vec_id",
               vecCol: String = "embedding", portableSeed: Boolean = false,
               sampleMod: Int = 1, sampleTarget: Long = 0L): Unit = {
    val cents = timed("build")(
      ivfBuild(corpus, numCentroids, lloydIters, sampleMod, idCol, vecCol, portableSeed,
        sampleTarget))
    val (centroids, assignments) = ivfAssign(corpus, cents, idCol, vecCol)
    timed("write")(ivfWriteParts(centroids, assignments, path))
  }

  private def ivfWriteParts(centroids: DataFrame, assignments: DataFrame, path: String): Unit = {
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    // co-locate each list before the partitioned write: without this every
    // shuffle partition writes a sliver into every cid directory —
    // numPartitions × k tiny files (and as many probe-side opens); with it
    // each cid's rows land together. At larger corpora the hash partition
    // splits a big list across tasks naturally, so file sizes stay bounded.
    assignments.repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/lists")
  }

  /** Probe a persisted index; `cid` is a partition column of the lists
    * table, so the equi-join key prunes unprobed lists at the source. */
  def ivfQuery(spark: org.apache.spark.sql.SparkSession, path: String, queries: DataFrame,
               k: Int = DefaultTopK, nprobe: Int = DefaultNProbe, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val assignments = spark.read.parquet(s"$path/lists")
    ivfProbe(centroids, assignments, queries, k, nprobe, idCol, vecCol)
  }

  /** Planes needed so the EXPECTED bucket holds ≤ targetBucketSize vectors
    * (2^planes ≥ n/target): within-bucket pairing is O(n²/2^planes), so a
    * fixed plane count goes quadratic as the corpus grows — the bucket
    * count must scale with N. */
  def planesForCorpus(n: Long, targetBucketSize: Long = 4096): Int =
    math.max(4, math.ceil(math.log(math.max(n.toDouble / targetBucketSize, 1.0)) / math.log(2.0)).toInt)

  /** Embedding-cosine near-duplicate pairs above a threshold, via LSH
    * buckets (within-bucket pairs only — never all-pairs). `planes <= 0`
    * derives the bucket count from the corpus size (one count() action)
    * so the within-bucket pair blow-up is bounded at any scale. */
  def cosineNearDup(corpus: DataFrame, threshold: Double = 0.95, planes: Int = 0,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val p = if (planes > 0) planes else planesForCorpus(corpus.count())
    // coalesce = nullability barrier (unreachable after the notnull
    // filter): without it the self-join's inferred isnotnull(sig)
    // constraint re-evaluates the hyperplane signature in the scan filter
    // on both sides (same pattern as Dedup.simhash)
    val c = corpus.where(col(vecCol).isNotNull)
      .select(col(idCol), asDouble(col(vecCol)).as("v"),
        coalesce(element_at(lshSignatures(col(vecCol), p, 1), 1), lit(0)).as("sig"))
    val a = c.toDF("a_id", "a_v", "sig")
    val b = c.toDF("b_id", "b_v", "sig")
    a.join(b, "sig").where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), cosine(col("a_v"), col("b_v")).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** STAR edges over the hyperplane buckets — [[cosineNearDup]]'s
    * linear-edge twin for CLUSTERING consumers (the embedding analogue
    * of Dedup.bucketStarEdges/simhashStarEdges): per signature bucket,
    * only the bucket-min hub links to each member, so edge count is
    * linear in bucket size where the all-pairs self-join is quadratic.
    * The cosine rides along un-gated (threshold = the caller's gate,
    * applied on the ROUNDED value by the registered query — the
    * established cross-engine boundary convention); a member pair whose
    * mutual cosine passes the gate but whose hub links both fail it may
    * land in split components — the standard LSH recall trade, pinned by
    * the oracle's replay of this construction. Returns
    * (a_id, b_id, cosine). */
  def cosineNearDupStar(corpus: DataFrame, planes: Int = 0,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val p = if (planes > 0) planes else planesForCorpus(corpus.count())
    val c = corpus.where(col(vecCol).isNotNull)
      .select(col(idCol), asDouble(col(vecCol)).as("v"),
        coalesce(element_at(lshSignatures(col(vecCol), p, 1), 1), lit(0)).as("sig"))
      // one explicit sig exchange shared by the hub aggregation and the
      // hub↔member join (ReuseExchange)
      .repartition(col("sig"))
    // min over (id, vector) structs: ids are unique, so the struct min IS
    // the min-id member, carrying its vector without a recovery join
    val hubs = c.groupBy("sig")
      .agg(min(struct(col(idCol), col("v"))).as("h"))
      .select(col("sig"), col("h")(idCol).as("a_id"), col("h")("v").as("a_v"))
    c.join(hubs, "sig").where(col(idCol) =!= col("a_id"))
      .select(col("a_id"), col(idCol).as("b_id"), cosine(col("a_v"), col("v")).as("cosine"))
  }
}
