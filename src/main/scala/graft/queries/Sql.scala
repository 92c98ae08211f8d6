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

  /** The canonical bar-frame prelude — must mirror Tables.bars exactly. */
  val bars: String =
    """WITH b0 AS (
      |  SELECT event_type AS symbol, event_id AS ord, value AS close,
      |         lag(value, 1) OVER (PARTITION BY event_type ORDER BY event_id) AS p1,
      |         lag(value, 2) OVER (PARTITION BY event_type ORDER BY event_id) AS p2
      |  FROM events
      |), bars AS (
      |  SELECT symbol, ord, close,
      |         coalesce(p1, close) AS open,
      |         greatest(coalesce(p1, close), close, coalesce(p2, close)) AS high,
      |         least(coalesce(p1, close), close, coalesce(p2, close)) AS low,
      |         CAST(ord % 1000 + 10 AS DOUBLE) AS volume
      |  FROM b0
      |)""".stripMargin

  /** WINDOW clause: w = plain per-series; wn = trailing n-row frame. */
  def windows(n: Int): String =
    s"WINDOW w AS (PARTITION BY symbol ORDER BY ord), " +
      s"wn AS (PARTITION BY symbol ORDER BY ord ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)"

  /** Warm-up gate + round, the standard output shape. */
  def gatedR6(x: String, n: Int, expr: String, as: String): String =
    s"round(CASE WHEN count($x) OVER wn >= $n THEN $expr END, 6) AS $as"

  def r6(expr: String, as: String): String = s"round($expr, 6) AS $as"

  val tail: String = "ORDER BY symbol, ord"
}
