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
}
