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
    * (incl. the event_type × user_id%16 series key of Tables.series). */
  val bars: String =
    """WITH ser AS (
      |  SELECT event_type || '_' || CAST(user_id % 16 AS VARCHAR) AS symbol,
      |         event_id AS ord, value AS close
      |  FROM events
      |), b0 AS (
      |  SELECT symbol, ord, close,
      |         lag(close, 1) OVER (PARTITION BY symbol ORDER BY ord) AS p1,
      |         lag(close, 2) OVER (PARTITION BY symbol ORDER BY ord) AS p2
      |  FROM ser
      |), bars AS (
      |  SELECT symbol, ord, close,
      |         coalesce(p1, close) AS open,
      |         greatest(coalesce(p1, close), close, coalesce(p2, close)) AS high,
      |         least(coalesce(p1, close), close, coalesce(p2, close)) AS low,
      |         CAST(ord % 1000 + 10 AS DOUBLE) AS volume
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
