package graft.queries

/** Shared DuckDB oracle-SQL fragments. The driver registers each testdata
  * parquet as a table named by its file stem (events, lineitem, documents,
  * …) and hash-compares the DuckDB result against the Spark parquet dump
  * with columns sorted by name — so every query here aliases its outputs to
  * exactly the Spark-side names and orders rows deterministically.
  *
  * All value outputs are rounded to 6 decimals on BOTH engines: the window
  * arithmetic is identical, but aggregation-order differences (DuckDB
  * segment trees vs Spark streaming frames) can differ in the last ulp.
  */
object Sql {

  /** The canonical bar-frame prelude — must mirror Tables.bars exactly
    * (series key, gap/body/shadow derivation, IEEE expression structure). */
  val bars: String =
    """WITH ser AS (
      |  SELECT event_type || '_' || CAST(user_id % 16 AS VARCHAR) AS symbol,
      |         event_id AS ord, value AS close
      |  FROM events
      |), b0 AS (
      |  SELECT symbol, ord, close,
      |         close * (1.0 + (CAST(((ord * 7919) % 4000) - 2000 AS DOUBLE) / 9973.0)) AS open
      |  FROM ser
      |), bars AS (
      |  SELECT symbol, ord, close, open,
      |         greatest(open, close) * (1.0 + (CAST((ord * 104729) % 7 AS DOUBLE) / 401.0)) AS high,
      |         least(open, close) * (1.0 - (CAST((ord * 15485863) % 5 AS DOUBLE) / 499.0)) AS low,
      |         CAST((ord % 1000) + 10 AS DOUBLE) AS volume
      |  FROM b0
      |)""".stripMargin

  /** Named window-frame definitions. `w` = plain per-series ordering;
    * `wn{n}` = trailing n-row frame; `wc` = cumulative. */
  val wDef: String = "w AS (PARTITION BY symbol ORDER BY ord)"
  def wnDef(n: Int): String =
    s"wn$n AS (PARTITION BY symbol ORDER BY ord ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)"
  val wcDef: String =
    "wc AS (PARTITION BY symbol ORDER BY ord ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"

  /** WINDOW clause declaring `w` plus a trailing frame per requested n. */
  def windows(ns: Int*): String =
    "WINDOW " + (wDef +: ns.distinct.map(wnDef)).mkString(", ")

  /** Warm-up gate + round, the standard output shape. `+ 0.0` normalizes
    * IEEE −0.0 to 0.0 on both engines so hashes can't differ on sign of
    * zero (Spark side mirrors with `round(c, 6) + lit(0.0)`). */
  def gatedR6(x: String, n: Int, expr: String, as: String): String =
    s"round(CASE WHEN count($x) OVER wn$n >= $n THEN $expr END, 6) + 0.0 AS $as"

  def r6(expr: String, as: String): String = s"round($expr, 6) + 0.0 AS $as"

  val tail: String = "ORDER BY symbol, ord"

  // ------------------------------------------------------------------
  // List-fold machinery for the RECURSIVE indicator family. A cumulative
  // `list(x) OVER wc` per row + a `list_reduce` left fold replays the
  // kernel's sequential arithmetic with the IDENTICAL IEEE operation
  // order, so EMA/RSI/ADX/KAMA recurrences hash-match bit-for-bit (the
  // same trick the CCI/AROON oracles use for their window lists). Alpha
  // constants are embedded as exact string-cast doubles so DuckDB parses
  // the very value the Scala kernel computed.
  // ------------------------------------------------------------------

  /** Exact double literal — string cast round-trips the IEEE value. */
  def dlit(x: Double): String = s"CAST('$x' AS DOUBLE)"

  /** Per-series cumulative list of the non-null values of `c`. */
  def filt(c: String): String = s"list_filter(list($c) OVER wc, x -> x IS NOT NULL)"

  /** Sequential left-sum of xs[1:n] — matches a Scala `s += v` loop. */
  def seqSum(xs: String, n: Int): String = s"list_reduce($xs[1:$n], (acc, x) -> acc + x)"

  /** SMA-seeded left fold (Kernels.emaAlpha shape): NULL until n values,
    * seed = seqSum/n, then `rec` (in terms of acc, x) per value. */
  def foldList(xs: String, n: Int, rec: String): String =
    s"CASE WHEN len($xs) >= $n THEN list_reduce(list_prepend(${seqSum(xs, n)} / $n, $xs[${n + 1}:]), (acc, x) -> $rec) END"

  /** EMA fold, α = 2/(n+1) — Kernels.ema. */
  def emaList(xs: String, n: Int): String = {
    val a = 2.0 / (n + 1)
    foldList(xs, n, s"${dlit(a)} * x + ${dlit(1 - a)} * acc")
  }

  /** Wilder RMA fold, α = 1/n — Kernels.rma. */
  def rmaList(xs: String, n: Int): String = {
    val a = 1.0 / n
    foldList(xs, n, s"${dlit(a)} * x + ${dlit(1 - a)} * acc")
  }

  /** Wilder AVERAGE fold: SMA seed, then (acc·(n−1)+x)/n — RSI/ADX shape. */
  def wilderFold(xs: String, n: Int): String = foldList(xs, n, s"(acc * ${n - 1} + x) / $n")

  /** Wilder SUM-seeded smoothing: seed = Σ first n, then acc − acc/n + x —
    * the ±DM/TR pipeline shape (Kernels.dmPipeline). */
  def wilderSumFold(xs: String, n: Int): String =
    s"CASE WHEN len($xs) >= $n THEN list_reduce(list_prepend(${seqSum(xs, n)}, $xs[${n + 1}:]), (acc, x) -> acc - acc / $n + x) END"

  /** Rolling-sum SMA replay — Kernels.sma's exact IEEE order: seed =
    * sequential Σ of the first n, then s = (s − oldest) + newest per
    * step. A fresh per-window avg (DuckDB segment tree) computes the
    * same value in a DIFFERENT order and can land on the other side of
    * the 6-decimal rounding boundary (the ppo_12_26 sf0.1 residual). */
  def smaRollList(xs: String, n: Int): String =
    s"CASE WHEN len($xs) >= $n THEN ${zipFold(seqSum(xs, n),
      s"$xs[${n + 1}:]", s"$xs[1:len($xs)-$n]",
      "(acc.list_1 - z.list_2) + z.list_1")} / $n END"

  /** WMA replay over the last n values of xs — Kernels.wma's IEEE order:
    * oldest-first accumulation of value·weight (weights 1..n, newest
    * heaviest), then one division by n(n+1)/2. Zips the tail slice with a
    * literal weight list so the fold visits values in kernel order. */
  def wmaList(xs: String, n: Int): String = {
    val weights = (1 to n).map(k => s"$k.0").mkString("[", ", ", "]")
    s"CASE WHEN len($xs) >= $n THEN ${zipFold("0.0",
      s"$xs[len($xs) - ${n - 1}:]", weights,
      "acc.list_1 + z.list_1 * z.list_2")} / ${n * (n + 1) / 2}.0 END"
  }

  /** Left fold with a DOUBLE accumulator over zip(newL, oldL). DuckDB's
    * list_reduce needs accumulator type == element type, so the scalar
    * accumulator rides in field list_1 of a struct. `rec` sees
    * acc.list_1 (accumulator), z.list_1 (new), z.list_2 (old). */
  def zipFold(seed: String, newL: String, oldL: String, rec: String): String =
    s"list_reduce(list_prepend({'list_1': $seed, 'list_2': 0.0}, list_zip($newL, $oldL)), " +
      s"(acc, z) -> {'list_1': $rec, 'list_2': 0.0}).list_1"

  /** EMA-cascade CTE chain over close: c0 (cumulative close list), then per
    * level k a CTE computing e{k} plus (below the last) a filtered list
    * f{k} feeding the next level. Returns (cteSql, lastCteName); the final
    * CTE exposes e1..e{levels}. Must be appended to the `bars` prelude. */
  def emaCascade(levels: Int, n: Int): (String, String) = {
    val ctes = scala.collection.mutable.Buffer(
      s"c0 AS (SELECT symbol, ord, list(close) OVER wc AS y0 FROM bars WINDOW $wcDef)")
    for (k <- 1 to levels) {
      val srcCte = if (k == 1) "c0" else s"f${k - 1}"
      val src = if (k == 1) "y0" else s"y${k - 1}"
      val carry = (1 until k).map(j => s"e$j, ").mkString
      ctes += s"c$k AS (SELECT symbol, ord, $carry${emaList(src, n)} AS e$k FROM $srcCte)"
      if (k < levels) {
        val carry2 = (1 to k).map(j => s"e$j").mkString(", ")
        ctes += s"f$k AS (SELECT symbol, ord, $carry2, ${filt(s"e$k")} AS y$k FROM c$k WINDOW $wcDef)"
      }
    }
    (ctes.mkString(", "), s"c$levels")
  }
}
