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

  /** Scala-side twin of `shardOf` (used by the streaming packer's group
    * key — must stay bit-identical to the Column expression). */
  private[graft] def shardOfId(id: Long, shards: Int): Int = {
    val P = graft.functions.TextHashes.PolyP
    val h = (graft.functions.TextHashes.polyA(SeedIdx) * java.lang.Math.floorMod(id, P) +
      graft.functions.TextHashes.polyB(SeedIdx)) % P
    java.lang.Math.floorMod(h, shards.toLong).toInt
  }

  /** Shared base: (idCol, shard, n_tokens, offset) where `offset` is the
    * running token offset of the doc within its shard's back-to-back
    * layout. One hash exchange (on shard) feeds the window; everything
    * downstream of it — position arithmetic or slice explosion — is
    * narrow. Ids are assumed non-negative (the same contract `ivfBuild`
    * states): `shardOf` hashes with pmod while the DuckDB oracle replays
    * sign-following `%`, so the two only agree for ids >= 0. */
  private def withOffsets(docs: DataFrame, shards: Int,
                          idCol: String, textCol: String,
                          carryText: Boolean = false): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = Seq(col(idCol), shardOf(col(idCol), shards).as("shard"),
      size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tokens"))
    docs.select((if (carryText) base :+ col(textCol) else base): _*)
      .withColumn("offset", coalesce(sum("n_tokens").over(w), lit(0L)))
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
    withOffsets(docs, shards, idCol, textCol)
      .select(col(idCol), col("shard"), col("n_tokens"),
        expr(s"offset div $budget").as("seq_in_shard"),
        pmod(col("offset"), lit(budget.toLong)).as("offset_in_seq"))
  }

  /** Materialize the slice map a trainer actually consumes: one row per
    * (sequence, document-slice). A document that straddles a sequence
    * boundary emits one row for EACH sequence it touches — `sequence(
    * offset div budget, (offset + n_tokens - 1) div budget)` + explode —
    * with integer slice arithmetic locating the cut:
    *
    *   - `doc_from`      first token of the doc that lands in this sequence
    *   - `take_len`      how many tokens of the doc this sequence takes
    *   - `offset_in_seq` where in the sequence the slice is written
    *
    * so `seq[offset_in_seq : offset_in_seq+take_len] =
    * doc[doc_from : doc_from+take_len]` reassembles every sequence
    * exactly. Per-shard slice counts stay contiguous: sum(take_len) over a
    * (shard, seq_id) group is `budget` for every full sequence.
    *
    * Scale: the explode is narrow (runs inside the same stage as the
    * window — no second shuffle) and fans out at most
    * ceil(n_tokens/budget)+1 rows per doc, so output size is
    * O(total_tokens/budget + n_docs). All arithmetic is integral; the
    * DuckDB oracle replays it exactly via generate_series.
    *
    * Returns (shard, seq_id, idCol, doc_from, take_len, offset_in_seq).
    */
  def packSlices(docs: DataFrame, budget: Int, shards: Int,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    slicesBase(docs, budget, shards, idCol, textCol, carryText = false)

  private def slicesBase(docs: DataFrame, budget: Int, shards: Int,
                         idCol: String, textCol: String, carryText: Boolean): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val b = lit(budget.toLong)
    val out = Seq(col("shard"), col("seq_id"), col(idCol),
      greatest(col("seq_id") * b - col("offset"), lit(0L)).as("doc_from"),
      (least(col("offset") + col("n_tokens"), (col("seq_id") + lit(1L)) * b)
        - greatest(col("offset"), col("seq_id") * b)).as("take_len"),
      (greatest(col("offset"), col("seq_id") * b) - col("seq_id") * b).as("offset_in_seq"))
    withOffsets(docs, shards, idCol, textCol, carryText)
      .withColumn("seq_id", explode(sequence(
        expr(s"offset div $budget"),
        expr(s"(offset + n_tokens - 1) div $budget"))))
      .select((if (carryText) out :+ col(textCol) else out): _*)
  }

  /** Assemble the actual training sequences: join the slice map back to
    * the documents, cut each doc's token slice, and concatenate a
    * sequence's slices in doc order. The end product a trainer streams —
    * every row is one fixed-budget token sequence (the last sequence of a
    * shard may run short).
    *
    * Shape at scale: ONE exchange total (plan-tested). The text rides
    * the shard shuffle alongside its token count — no join back to the
    * corpus (the join formulation moved the same bytes through three
    * more exchanges) — and the (shard, seq_id) groupBy reuses the shard
    * partitioning (shard ⊂ grouping keys, so the window's exchange
    * already satisfies the aggregation's distribution). collect_list
    * holds ONE sequence's pieces (≤ budget tokens by construction),
    * never a shard's. Slice arithmetic is the integer map from
    * packSlices, so the oracle replays the text assembly exactly (Spark
    * slice(arr, start, len) ↔ DuckDB list_slice(l, begin, end) with
    * end = start+len−1).
    *
    * Returns (shard, seq_id, n_tokens, seq_text).
    */
  def packText(docs: DataFrame, budget: Int, shards: Int,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val pieces = slicesBase(docs, budget, shards, idCol, textCol, carryText = true)
      .withColumn("piece", concat_ws(" ",
        slice(split(trim(col(textCol)), "\\s+"),
          (col("doc_from") + 1).cast("int"), col("take_len").cast("int"))))
    pieces.groupBy("shard", "seq_id")
      .agg(sum("take_len").as("n_tokens"),
        array_sort(collect_list(struct(col(idCol), col("piece")))).as("ps"))
      .select(col("shard"), col("seq_id"), col("n_tokens"),
        concat_ws(" ", transform(col("ps"), p => p.getField("piece"))).as("seq_text"))
  }

  /** Token-window document chunking (the RAG/context-window splitter, a
    * different beast from sequence packing: chunking SPLITS one long doc
    * into overlapping windows, packing CONCATENATES short docs into full
    * sequences). Windows start every `size − overlap` tokens; a doc of
    * ≤ size tokens yields exactly one chunk; the final window may run
    * short rather than spill past the doc. Pure per-row explode — zero
    * shuffles, no state: each doc computes its own windows in the scan.
    * Output: (idCol, chunk_id, n_tokens, chunk_text). */
  def chunkTokens(docs: DataFrame, size: Int = 64, overlap: Int = 8,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val sz = org.apache.spark.sql.functions.size(col("__toks"))
    // n_chunks = 1 + ceil((len − size)/stride) for len > size; the double
    // division is exact at any real token count (< 2^52)
    val nChunks = when(sz <= size, lit(1L))
      .otherwise(floor((sz - lit(size) + lit(stride) - 1).cast("double") / lit(stride)) + 1)
    val chunk = slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"), lit(size))
    docs.select(col(idCol), Dedup.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        org.apache.spark.sql.functions.size(chunk).as("n_tokens"),
        concat_ws(" ", chunk).as("chunk_text"))
  }
}
