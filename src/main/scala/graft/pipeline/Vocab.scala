package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary: token frequency + document frequency, top-k by
  * occurrences with a lexicographic tiebreak (deterministic cutoff).
  *
  * Skew posture at 100 TB: `n_occurrences` is algebraic, so hot tokens
  * ("the") partial-aggregate map-side and each reducer sees one row per
  * partition. Document frequency is NOT — exact `countDistinct` routes
  * every distinct (token, doc) pair of a hot token through that token's
  * single reducer, which is exactly the skew the occurrence leg avoids.
  * `exactDocFreq = false` (the corpus-scale default) swaps in
  * `approx_count_distinct` whose HLL sketches merge map-side, restoring
  * skew immunity at ~2% relative error; `true` keeps the exact count for
  * oracle-verified runs at test scale. The top-k itself compiles to
  * TakeOrderedAndProject either way (per-partition top-k + driver merge,
  * never a global sort — plan-tested in PlanSpec).
  */
object Vocab {

  def topK(docs: DataFrame, k: Int, exactDocFreq: Boolean = false,
           textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // Dedup.tokens: the one shared normalization (same as the dedup
    // signatures and the repetition filter)
    val toks = docs.select(col(idCol),
        explode(Dedup.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
    rank(toks, k, exactDocFreq, idCol)
  }

  /** Word-n-gram vocabulary — same ranking, the unit is an n-token
    * window ("of the", "in the …"). Grams come from Repetition.ngrams
    * (one construction for the filter and the vocabulary), built per row
    * with transform/sequence — no self-join of the token table, which
    * would shuffle the corpus n times; docs shorter than n contribute
    * nothing. */
  def ngramTopK(docs: DataFrame, n: Int, k: Int, exactDocFreq: Boolean = false,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(n >= 2, "use topK for single tokens")
    val grams = Repetition.ngrams(Dedup.tokens(col(textCol)), n)
    rank(docs.select(col(idCol), explode(grams).as("token")), k, exactDocFreq, idCol)
  }

  /** Per-document TF-IDF top-k terms (keyword extraction for corpus
    * curation): score = tf · ln(N / df), ranked per document with a
    * lexicographic tiebreak.
    *
    * Scale shape: tf is one partial-aggregated groupBy on (doc, token);
    * the df join is keyed on TOKEN, where natural-language corpora are
    * maximally skewed ("the" appears in every document) — `saltBuckets >
    * 0` routes it through [[graft.etl.SkewJoin.saltedJoin]], spreading
    * the hot token over that many reducers with identical semantics.
    * The per-document top-k is a row_number window + filter, which
    * compiles to WindowGroupLimit (per-partition pruning BEFORE the
    * per-doc exchange — plan-tested). `exactDocFreq = false` swaps the
    * df leg onto map-side-merged HLL sketches, same trade as [[topK]].
    */
  def tfidfTopK(docs: DataFrame, k: Int, exactDocFreq: Boolean = true,
                saltBuckets: Int = 0,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol),
        explode(Dedup.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val docFreq =
      if (exactDocFreq) countDistinct(col(idCol))
      else approx_count_distinct(col(idCol))
    val dfreq = toks.groupBy("token").agg(docFreq.as("df"))
    val joined =
      if (saltBuckets > 0)
        graft.etl.SkewJoin.saltedJoin(tf, dfreq, Seq("token"), saltBuckets)
      else tf.join(dfreq, "token")
    val n = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("token").asc)
    joined.crossJoin(n)
      .withColumn("score", col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col(idCol), col("rk"), col("token"), col("tf"), col("score"))
  }

  /** Top-k vocabulary through the Misra–Gries heavy-hitters aggregate
    * (functions.MisraGries — a native TypedImperativeAggregate): every
    * map-side partial is capped at `capacity` entries regardless of
    * corpus size, and partials merge by the Agarwal et al. mergeable-
    * summaries rule, so the reduce side sees O(partitions · capacity)
    * rows — the vocabulary path for a corpus whose token groupBy would
    * otherwise funnel hot keys. With capacity ≥ distinct tokens the
    * counts are exact (no decrement ever fires) — the regime the
    * hash-gated query runs in; below that, counts carry the one-sided
    * −N/(capacity+1) bound and any token above that frequency is
    * guaranteed present. */
  def topKHeavyHitters(docs: DataFrame, k: Int, capacity: Int,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    heavyHitters(docs.select(explode(Dedup.tokens(col(textCol))).as("token"))
      .where(col("token") =!= ""), k, capacity)

  /** Word-n-gram heavy hitters — the unit where the sketch matters most:
    * the n-gram key space grows combinatorially (this corpus has ~24×
    * more bigram types than tokens), so the exact groupBy's reducer
    * state grows with it while the MG summary stays at `capacity`
    * entries per partial at ANY n. */
  def ngramTopKHeavyHitters(docs: DataFrame, n: Int, k: Int, capacity: Int,
                            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(n >= 2, "use topKHeavyHitters for single tokens")
    heavyHitters(docs.select(
      explode(Repetition.ngrams(Dedup.tokens(col(textCol)), n)).as("token")), k, capacity)
  }

  private def heavyHitters(units: DataFrame, k: Int, capacity: Int): DataFrame =
    units
      .agg(graft.functions.MisraGries.misraGries(col("token"), capacity).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.token").as("token"), col("e.n_occurrences").as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(k)

  /** CCNet-style unigram language-model quality score: per document, the
    * mean log-probability of its tokens under the corpus unigram
    * distribution — low (very negative) means rare/garbled content, high
    * means common fluent text; pipelines threshold or bucket on it the
    * way CCNet buckets on LM perplexity. Docs with zero non-empty tokens
    * emit nothing (there is no distribution to score them under).
    *
    * Scale + determinism shape: tf is one partial-aggregated (doc,
    * token) groupBy; the corpus-count join is keyed on TOKEN (maximally
    * skewed — `saltBuckets > 0` routes it through the salted join like
    * [[tfidfTopK]]); the per-doc summation order is engine- and
    * partition-nondeterministic, so each tf·ln(n/N) term is cast to
    * DECIMAL(38,12) first — decimal addition is exact, hence
    * order-independent — and only the final mean returns to double. */
  def unigramScore(docs: DataFrame, saltBuckets: Int = 0,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(Dedup.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val counts = toks.groupBy("token").agg(count(lit(1)).as("n"))
    val total = broadcast(counts.agg(sum(col("n")).as("n_total")))
    val joined =
      if (saltBuckets > 0)
        graft.etl.SkewJoin.saltedJoin(tf, counts, Seq("token"), saltBuckets)
      else tf.join(counts, "token")
    joined.crossJoin(total)
      .withColumn("term",
        (col("tf") * log(col("n").cast("double") / col("n_total"))).cast("decimal(38,12)"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_toks"), sum(col("term")).as("s"))
      .select(col(idCol), col("n_toks"),
        (col("s").cast("double") / col("n_toks")).as("logprob"))
  }

  /** Dense token-id assignment for training tokenization: ids 1..k by
    * (occurrences desc, token asc); 0 stays reserved for
    * out-of-vocabulary. The count aggregation partial-aggregates
    * map-side; the top-k compiles to TakeOrderedAndProject; the
    * row_number window then runs over the ALREADY-LIMITED set — k rows
    * on one partition is bounded by construction (it is the vocabulary,
    * not the corpus). The id comes from a single-partition in-order
    * index (coalesce + sortWithinPartitions + monotonically_increasing_id
    * — partition 0, so the raw id IS the row index), not a global
    * row_number window: same execution shape, but WindowExec's "No
    * Partition Defined" warning stays reserved for windows that are
    * global over UNBOUNDED input — so when that warning appears in a
    * bench tail it is a real finding, not noise. */
  def assignIds(docs: DataFrame, vocabSize: Int,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(explode(Dedup.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token").asc).limit(vocabSize)
      .coalesce(1)
      .sortWithinPartitions(col("n_occurrences").desc, col("token").asc)
      .withColumn("id", (monotonically_increasing_id() + 1).cast("int"))

  /** Default cutover from the plan-literal encode to the join-based one:
    * ~64k entries is the upper end of the vocabularies that are cheaper
    * as one codegen'd map literal than as a broadcast join. */
  val MaxLiteralVocab: Int = 65536

  /** Encode every document as its token-id sequence (order preserved,
    * empty tokens dropped, OOV → 0), auto-dispatched on vocabulary size:
    *
    *   - up to `maxLiteralVocab` entries, the id map rides the plan as
    *     ONE map<string,int> literal — the same literal pattern as the
    *     IVF centroids — so the corpus side is a zero-shuffle, zero-join
    *     per-row transform (the shape for the 30–60k vocabularies
    *     training tokenizers actually use);
    *   - beyond it, [[encodeJoin]] — a vocabulary that no longer fits a
    *     plan literal must not be collected to the driver at all.
    *
    * The probe collects at most maxLiteralVocab+1 (token, id) rows, so
    * dispatch itself never materializes an oversized vocabulary. */
  def encode(docs: DataFrame, vocab: DataFrame,
             textCol: String = "text", idCol: String = "doc_id",
             maxLiteralVocab: Int = MaxLiteralVocab): DataFrame = {
    val head = vocab.select(col("token"), col("id"))
      .limit(maxLiteralVocab + 1).collect()
    if (head.length > maxLiteralVocab) encodeJoin(docs, vocab, textCol, idCol)
    else {
      val idMap = typedLit(head.map(r => r.getString(0) -> r.getInt(1)).toMap)
      docs.select(col(idCol),
        transform(filter(Dedup.tokens(col(textCol)), _ =!= ""),
          t => coalesce(element_at(idMap, t), lit(0))).as("ids"))
    }
  }

  /** Join-based encode for vocabularies too large for a plan literal:
    * posexplode the corpus tokens, broadcast-join the (token → id) map,
    * re-assemble per document in position order, then left-join back to
    * the corpus so the output contract matches [[encode]]'s literal path
    * EXACTLY — one row per input doc, `null` ids for null text, an empty
    * array for docs with no non-empty tokens, OOV → 0 (parity-tested).
    *
    * Scale: the corpus side pays one doc_id shuffle for the re-assembly
    * (the literal path pays zero — that is the price of an unbounded
    * vocabulary); the vocabulary side is broadcast, which holds to
    * ~10⁷ entries. Past that, swap the hint for
    * [[graft.etl.SkewJoin.saltedJoin]] on `word` — natural-language
    * token keys are maximally skewed, so a plain shuffle join would
    * funnel the hot tokens. */
  def encodeJoin(docs: DataFrame, vocab: DataFrame,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(filter(Dedup.tokens(col(textCol)), _ =!= ""))
        .as(Seq("pos", "word")))
    val enc = toks
      .join(broadcast(vocab.select(col("token").as("word"), col("id"))), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), coalesce(col("id"), lit(0)).as("id")))),
        x => x("id")).as("__ids"))
    docs.select(col(idCol),
        filter(Dedup.tokens(col(textCol)), _ =!= "").as("__toks"))
      .join(enc, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__toks").isNull, lit(null).cast("array<int>"))
          .when(col("__ids").isNull, typedLit(Seq.empty[Int]))
          .otherwise(col("__ids")).as("ids"))
  }

  /** Fingerprint-prefiltered exact n-gram top-k — same contract and same
    * result as [[ngramTopK]]`(exactDocFreq = true)`, restructured so gram
    * STRINGS never ride the corpus-wide shuffle. At corpus scale most
    * n-grams are singletons, so the direct string groupBy shuffles ~n×
    * the text volume mostly to count tail grams to 1 and discard them.
    *
    * Two passes: (1) occurrence counts per 8-byte gram fingerprint — the
    * only corpus-wide exchange, narrow keys, map-side partials; one
    * BOUNDED driver collect (≤ maxCandidates+1 (fp, count) rows, the
    * [[MaxLiteralVocab]] convention) yields the k-th count and every fp
    * at-or-above it. (2) a second scan recovers strings for candidate
    * fps only — a plan-literal InSet probe inside the scan stage, no
    * join — and recounts occurrences + exact doc frequency per STRING,
    * so the ranking and tiebreak are computed on true per-gram values.
    * Candidates are k plus count-ties at the threshold; if ties overflow
    * the collect bound (degenerate near-all-singleton corpora, where no
    * prefilter can help) it falls back to the direct path. Trade: one
    * extra text-column scan buys the long tail's removal from the wide
    * shuffle — the same trade [[graft.pipeline.Dedup.frequentSpans]]
    * makes, and the right one whenever shuffle IO prices above scan IO. */
  def ngramTopKFp(docs: DataFrame, n: Int, k: Int,
                  textCol: String = "text", idCol: String = "doc_id",
                  maxCandidates: Int = MaxLiteralVocab): DataFrame = {
    require(n >= 2, "use topK for single tokens")
    val toks = Dedup.tokens(col(textCol))
    val grams = Repetition.ngrams(toks, n)
    // xxhash64 of the gram STRING (not the poly rolling hash, whose
    // structured-input collisions measurably inflate fp counts — see
    // Dedup.frequentSpans). An fp count can only sit AT or ABOVE its
    // gram's true count, which the exactness argument below leans on.
    val fpCounts = docs.select(explode(transform(grams, g => xxhash64(g))).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("n_occ"))
    // two-phase candidate collect: a TakeOrdered heap of `limit` entries
    // costs every input row a log(limit) tuple comparison, so probe with
    // a small slack first (covers ordinary tie counts) and escalate to
    // the full literal bound only when ties overflow it
    def headAt(limit: Int): Array[org.apache.spark.sql.Row] =
      fpCounts.orderBy(col("n_occ").desc, col("fp")).limit(limit + 1).collect()
    // a collect at `limit` is complete when it was exhaustive (≤ limit
    // rows came back for a limit+1 ask) or when the k-th count's ties
    // are strictly inside it (the last row sorts below the threshold)
    def complete(h: Array[org.apache.spark.sql.Row], limit: Int): Boolean =
      h.length <= limit || h.last.getLong(1) < h(k - 1).getLong(1)
    val slack = math.max(k, math.min(8 * k, maxCandidates))
    val probe = headAt(slack)
    val (head, lim) =
      if (complete(probe, slack) || slack >= maxCandidates) (probe, slack)
      else (headAt(maxCandidates), maxCandidates)
    val thresh = if (head.length <= k) Long.MinValue else head(k - 1).getLong(1)
    val cand = head.takeWhile(r => head.length <= k || r.getLong(1) >= thresh)
      .map(_.getLong(0))
    lazy val direct = ngramTopK(docs, n, k, exactDocFreq = true, textCol, idCol)
    if (head.isEmpty || !complete(head, lim)) direct
    else {
      // pass 2: only candidate grams' occurrences reach the string-keyed
      // aggregation (plan-literal InSet probe inside the scan — no join).
      // Every gram with true count ≥ thresh IS a candidate (its fp count
      // is at least its true count), so the recount sees the complete
      // ≥-thresh population and ranks it on TRUE per-string values.
      val pairs = transform(grams, g => struct(g.as("gram"), xxhash64(g).as("fp")))
      val res = docs.select(col(idCol), explode(pairs).as("p"))
        .select(col(idCol), col("p.gram").as("token"), col("p.fp").as("fp"))
        .where(col("fp").isin(cand.toSeq: _*))
        .groupBy("token")
        .agg(count(lit(1)).as("n_occurrences"), countDistinct(col(idCol)).as("n_docs"))
        .orderBy(col("n_occurrences").desc, col("token").asc)
        .limit(k)
      val rows = res.collect()
      // exactness gate: with ≥ k recounted grams at-or-above thresh, no
      // non-candidate gram can rank top-k (each has true count < thresh
      // — else its fp would be a candidate). An fp collision among the
      // heavy hitters could inflate thresh past the true k-th count and
      // starve the recount below k; vanishingly unlikely under xxhash64,
      // and detected here deterministically → direct path.
      val exact = rows.length >= k && rows.lastOption.forall(_.getLong(1) >= thresh)
      if (exact || head.length <= k)
        docs.sparkSession.createDataFrame(
          docs.sparkSession.sparkContext.parallelize(rows.toSeq, 1), res.schema)
      else direct
    }
  }

  /** Regime-dispatched exact n-gram top-k: probe a ~1% doc sample
    * ([[Dedup.singletonDominated]]), then run [[ngramTopKFp]] on
    * singleton-dominated corpora (web-text regime — the fp prefilter
    * keeps the long tail off the wide shuffle) and the direct
    * [[ngramTopK]]`(exactDocFreq = true)` on repeated-vocabulary ones
    * (template regime — map-side partials already collapse the string
    * shuffle, and a degenerate near-all-singleton TOP-k would make the
    * fp path pay its pass 1 only to fall back). Identical results either
    * way. */
  def ngramTopKAuto(docs: DataFrame, n: Int, k: Int,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    // fp probe, not string n-grams: same ratio, no gram strings built
    // (see frequentSpansAuto — ShingleFps composes the identical
    // space-joined unit the string path hashes)
    if (Dedup.singletonDominated(docs,
        graft.functions.TextHashes.shingleFps(Dedup.tokens(col(textCol)), n)))
      ngramTopKFp(docs, n, k, textCol, idCol)
    else ngramTopK(docs, n, k, exactDocFreq = true, textCol, idCol)

  private def rank(units: DataFrame, k: Int, exactDocFreq: Boolean,
                   idCol: String): DataFrame = {
    val docFreq =
      if (exactDocFreq) countDistinct(col(idCol))
      else approx_count_distinct(col(idCol))
    units.groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"), docFreq.as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(k)
  }

  /** Bound-twin gate for the HLL doc-frequency leg: ONE aggregation
    * computes the exact document frequency AND the
    * `approx_count_distinct` HLL estimate per token, then emits the
    * exact columns plus a boolean asserting the sketch landed within its
    * error budget — `|hll − exact| ≤ max(1, ceil(4·rsd·exact))`, four
    * standard errors of the sketch's configured relative standard
    * deviation plus an absolute floor of 1 for the small-cardinality
    * sparse regime. The exact columns hash-verify against the oracle for
    * real; the boolean is the sketch gate — DuckDB replays the exact leg
    * and the constant `TRUE`, so an estimate drifting outside the bound
    * flips the column and fails the hash. HLL++ is deterministic
    * (xxhash64-seeded registers), so a green run is a stable fact, not a
    * lucky draw. This is the verification twin of [[topK]]'s
    * `exactDocFreq = false` corpus path (whose map-side sketch-merge
    * plan PlanSpec pins separately). */
  def topKHllBound(docs: DataFrame, k: Int, rsd: Double = 0.05,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(Dedup.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
    toks.groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs"),
        approx_count_distinct(col(idCol), rsd).as("n_docs_hll"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(k)
      .select(col("token"), col("n_occurrences"), col("n_docs"),
        (abs(col("n_docs_hll") - col("n_docs")) <=
          greatest(lit(1L), ceil(col("n_docs") * lit(4 * rsd)))).as("hll_ok"))
  }
}
