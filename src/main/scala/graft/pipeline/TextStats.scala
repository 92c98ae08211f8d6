package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, n-gram language ID, and content
  * fingerprinting. All pure Column expressions (codegen'd, no UDFs) —
  * at 100 TB these run entirely inside the parquet scan stage with no
  * shuffle at all.
  */
object TextStats {

  /** Whitespace tokens of the raw text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def nTokens(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: runs of letters, runs of digits, and single
    * punctuation marks each count as one token (a cheap stand-in for a
    * real tokenizer's granularity). Formulated with plain regex extraction
    * — no lookarounds — so the same expression runs under RE2 engines
    * (and the DuckDB oracle). */
  def bpeishTokens(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+"), lit(0))) +
      size(regexp_extract_all(text, lit("[0-9]+"), lit(0))) +
      length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))

  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / length(text)

  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"()-]", "")).cast("double") / length(text)

  def meanTokenLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") / nTokens(text)

  /** Tiny per-language stopword lists for the n-gram/stopword language
    * heuristic. Deliberately small: language ID at pipeline scale is a
    * cheap filter, not a classifier. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"),
    "es" -> Seq("el", "la", "los", "que", "y", "es", "un", "una", "de", "por"))

  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val sw = array(stopwords(lang).map(lit): _*)
    size(filter(tokens(lower(text)), t => array_contains(sw, t))).cast("double") / nTokens(text)
  }

  /** The five language scores (de, en, es, fr, zh — the langScoreLangs
    * order) as ONE array column: each score is evaluated exactly once
    * inside the array constructor. Project this into a column and feed
    * the attribute to `langIdFromScores` — inlining the scores into the
    * argmax tree (the old langId shape) duplicated every score ~6× (best
    * appears in each tie-check), each duplicate re-tokenizing: ~30 regex
    * splits per document, measured as the dominant cost of the langid
    * queries at sf0.1. */
  val langScoreLangs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  def langScores(text: Column): Column = {
    val toks = tokens(lower(text))
    val n = size(toks).cast("double")
    val sws = stopwords.toSeq.sortBy(_._1).map { case (_, words) =>
      val sw = array(words.map(lit): _*)
      size(filter(toks, t => array_contains(sw, t))).cast("double") / n
    }
    array(sws :+
      (length(regexp_replace(text, "[^\\u4e00-\\u9fff]", "")).cast("double") / length(text)): _*)
  }

  /** Argmax over a (projected) langScores attribute, tie priority
    * zh > fr > es > en > de, 'und' when nothing scores — cheap element_at
    * reads, no re-evaluation. */
  def langIdFromScores(scores: Column): Column = {
    val best = array_max(scores)
    langScoreLangs.zipWithIndex.foldLeft(lit("und")) { case (acc, (lang, i)) =>
      when(element_at(scores, i + 1) > 0 && element_at(scores, i + 1) === best, lit(lang))
        .otherwise(acc)
    }
  }

  /** Language ID: per-language stopword hit ratio + a CJK character ratio
    * for zh; argmax with 'und' fallback when nothing scores. Convenience
    * single-column form — when the caller can project, prefer
    * langScores + langIdFromScores (see langScores' scaladoc). */
  def langId(text: Column): Column = langIdFromScores(langScores(text))

  /** Composite quality score in [0,1]: length sweet-spot, alpha ratio,
    * moderate punctuation, plausible mean token length. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 200.0, lit(1.0))
    val alpha = alphaRatio(text)
    val punct = punctRatio(text)
    val mtl = meanTokenLen(text)
    val mtlScore = when(mtl.between(3.0, 10.0), 1.0).otherwise(0.5)
    greatest(least((lenScore + alpha + (lit(1.0) - least(punct * 5, lit(1.0))) + mtlScore) / 4.0,
      lit(1.0)), lit(0.0))
  }

  /** Content fingerprint over whitespace-normalized lowercase text: a
    * polynomial rolling hash over code points, mod 1e9+7 — the classic
    * document-fingerprinting primitive, and engine-portable (the DuckDB
    * oracle replays the identical fold; xxhash64 has no cross-engine
    * twin). Still a single codegen'd pass inside the scan. */
  def fingerprint(text: Column): Column = {
    val norm = lower(regexp_replace(trim(text), "\\s+", " "))
    when(length(norm) === 0, 0L).otherwise(
      aggregate(split(norm, ""), lit(0L),
        (h, c) => (h * 131 + ascii(c)) % 1000000007L))
  }

  /** 64-bit xxhash64 variant (fast, Spark-native) for callers that want a
    * wider fingerprint and don't need cross-engine reproducibility. */
  def fingerprint64(text: Column): Column =
    xxhash64(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Bound-twin gate for the t-digest percentile leg: per group, compute
    * `approx_percentile(v, p, accuracy)` for each requested percentile
    * AND — in a second pass joined back over the (tiny, one-row-per-group,
    * broadcast) sketch output — the exact rank window the returned value
    * occupies. The sketch's published guarantee is a RANK error of at
    * most `N / accuracy`, so the engine-checkable assertion is rank-space,
    * not value-space: with `cnt_le = #{v ≤ v_p}` and `cnt_lt = #{v < v_p}`,
    * require `cnt_le ≥ p·N − (N/accuracy + 1)` and
    * `cnt_lt ≤ p·N + (N/accuracy + 1)` (the +1 absorbs the two engines'
    * discrete-rank conventions). Output is one row per group: the exact
    * row count plus one boolean per percentile — the oracle replays the
    * exact count and the constant `TRUE`, so a sketch outside its rank
    * budget flips a boolean and fails the hash. The sketch itself is
    * deterministic (Greenwald–Khanna compression of a fixed input order
    * per partition is not order-stable in general, but the ±N/accuracy
    * bound holds for EVERY merge order, which is exactly what this
    * asserts). The production-shape leg (sketches merging map-side, no
    * second pass) is [[graft]] PlanSpec's partial_approx_percentile
    * pin; this is its verification twin. */
  def quantileBoundCheck(docs: DataFrame, groupCol: String, valueExpr: Column,
                         percentiles: Seq[Double], accuracy: Int): DataFrame = {
    val d = docs.select(col(groupCol), valueExpr.as("__v"))
    val ps = array(percentiles.map(lit): _*)
    val sketch = d.groupBy(groupCol).agg(
      count(lit(1)).as("__n"),
      percentile_approx(col("__v"), ps, lit(accuracy)).as("__vp"))
    val j = d.join(broadcast(sketch), groupCol)
    val aggs = percentiles.zipWithIndex.flatMap { case (_, i) =>
      Seq(
        sum(when(col("__v") <= element_at(col("__vp"), i + 1), 1L).otherwise(0L))
          .as(s"__le_$i"),
        sum(when(col("__v") < element_at(col("__vp"), i + 1), 1L).otherwise(0L))
          .as(s"__lt_$i"))
    }
    val counted = j.groupBy(col(groupCol))
      .agg(first(col("__n")).as("n_docs"), aggs: _*)
    val slack = col("n_docs").cast("double") / accuracy + 1.0
    val checks = percentiles.zipWithIndex.map { case (p, i) =>
      ((col(s"__le_$i").cast("double") >= col("n_docs") * p - slack) &&
        (col(s"__lt_$i").cast("double") <= col("n_docs") * p + slack))
        .as(s"p${(p * 100).round}_ok")
    }
    counted.select(col(groupCol) +: col("n_docs") +: checks: _*)
  }

  /** Convenience: attach the standard stats columns. */
  def withStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_tokens", nTokens(t))
      .withColumn("n_tokens_bpeish", bpeishTokens(t))
      .withColumn("alpha_ratio", alphaRatio(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("mean_token_len", meanTokenLen(t))
      .withColumn("stopword_ratio_en", stopwordRatio(t))
      .withColumn("__lang_scores", langScores(t))
      .withColumn("lang_pred", langIdFromScores(col("__lang_scores")))
      .drop("__lang_scores")
      .withColumn("quality_score", qualityScore(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
