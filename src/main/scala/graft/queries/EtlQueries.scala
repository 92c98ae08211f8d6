package graft.queries

import graft.Tables
import graft.etl.Align
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract registration for the alignment ETL (the reference's one
  * real query-optimizer path, `python/polars_quant/backtest/sequential.py:
  * 44-93`): dates × symbols grid + left join + per-symbol forward fill +
  * default fill, oracled with DuckDB's `last_value(… IGNORE NULLS)`.
  *
  * The input frame is made deliberately SPARSE — each (symbol, ord) row is
  * kept by a deterministic stride predicate that differs per symbol — so
  * the grid join genuinely manufactures missing rows and the forward fill
  * genuinely fills them (a dense frame would make the whole pipeline a
  * no-op and verify nothing).
  */
object EtlQueries {
  type Q = (SparkSession, String) => DataFrame

  private def r6(c: Column): Column = round(c, 6) + lit(0.0)

  /** Keep ~40% of rows, phase-shifted per symbol via its length. */
  private val keepSql = "(ord * 31 + length(symbol) * 7) % 5 < 2"

  final case class Entry(name: String, q: Q, oracle: Option[String])

  val entries: Seq[Entry] = Seq(
    Entry("align_grid",
      (spark, dir) => {
        val sparse = Tables.bars(spark, dir)
          .select(col("symbol"), col("ord").as("date"), col("close"), col("volume"))
          .where((col("date") * 31 + length(col("symbol")) * 7) % 5 < 2)
        Align.align(sparse, dateCol = "date")
          .select(col("date"), col("symbol"),
            r6(col("close")).as("close"), r6(col("volume")).as("volume"))
          .orderBy("date", "symbol")
      },
      Some(s"""${Sql.bars}, sparse AS (
        |  SELECT symbol, ord AS date, close, volume FROM bars WHERE $keepSql
        |), dates AS (SELECT DISTINCT date FROM sparse),
        |syms AS (SELECT DISTINCT symbol FROM sparse),
        |grid AS (SELECT d.date, s.symbol FROM dates d CROSS JOIN syms s),
        |j AS (
        |  SELECT g.date, g.symbol, sp.close, sp.volume
        |  FROM grid g LEFT JOIN sparse sp ON sp.date = g.date AND sp.symbol = g.symbol
        |), f AS (
        |  SELECT date, symbol,
        |    last_value(close IGNORE NULLS) OVER wf AS close,
        |    last_value(volume IGNORE NULLS) OVER wf AS volume
        |  FROM j WINDOW wf AS (PARTITION BY symbol ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT date, symbol, ${Sql.r6("coalesce(close, 0.0)", "close")},
        |  ${Sql.r6("coalesce(volume, 0.0)", "volume")}
        |FROM f ORDER BY date, symbol""".stripMargin)),

    Entry("align_grid_zero",
      // the zero-fill strategy: manufactured grid rows coalesce straight
      // to 0.0, no window at all
      (spark, dir) => {
        val sparse = Tables.bars(spark, dir)
          .select(col("symbol"), col("ord").as("date"), col("close"))
          .where((col("date") * 31 + length(col("symbol")) * 7) % 5 < 2)
        Align.align(sparse, dateCol = "date", fillNullStrategy = "zero")
          .select(col("date"), col("symbol"), r6(col("close")).as("close"))
          .orderBy("date", "symbol")
      },
      Some(s"""${Sql.bars}, sparse AS (
        |  SELECT symbol, ord AS date, close FROM bars WHERE $keepSql
        |), dates AS (SELECT DISTINCT date FROM sparse),
        |syms AS (SELECT DISTINCT symbol FROM sparse),
        |grid AS (SELECT d.date, s.symbol FROM dates d CROSS JOIN syms s),
        |j AS (
        |  SELECT g.date, g.symbol, sp.close
        |  FROM grid g LEFT JOIN sparse sp ON sp.date = g.date AND sp.symbol = g.symbol
        |)
        |SELECT date, symbol, ${Sql.r6("coalesce(close, 0.0)", "close")}
        |FROM j ORDER BY date, symbol""".stripMargin)),

    Entry("align_grid_backward",
      // the backward-fill strategy: first(ignoreNulls) over the following
      // frame, trailing gaps default-filled
      (spark, dir) => {
        val sparse = Tables.bars(spark, dir)
          .select(col("symbol"), col("ord").as("date"), col("close"))
          .where((col("date") * 31 + length(col("symbol")) * 7) % 5 < 2)
        Align.align(sparse, dateCol = "date", fillNullStrategy = "backward")
          .select(col("date"), col("symbol"), r6(col("close")).as("close"))
          .orderBy("date", "symbol")
      },
      Some(s"""${Sql.bars}, sparse AS (
        |  SELECT symbol, ord AS date, close FROM bars WHERE $keepSql
        |), dates AS (SELECT DISTINCT date FROM sparse),
        |syms AS (SELECT DISTINCT symbol FROM sparse),
        |grid AS (SELECT d.date, s.symbol FROM dates d CROSS JOIN syms s),
        |j AS (
        |  SELECT g.date, g.symbol, sp.close
        |  FROM grid g LEFT JOIN sparse sp ON sp.date = g.date AND sp.symbol = g.symbol
        |), f AS (
        |  SELECT date, symbol,
        |    first_value(close IGNORE NULLS) OVER wb AS close
        |  FROM j WINDOW wb AS (PARTITION BY symbol ORDER BY date ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT date, symbol, ${Sql.r6("coalesce(close, 0.0)", "close")}
        |FROM f ORDER BY date, symbol""".stripMargin)),

    Entry("asof_join",
      // the quotes-to-trades primitive: every 3rd bar is a "trade", every
      // 5th a "quote"; each trade picks up the latest quote at-or-before
      // its time (ord % 15 rows are both — the equal-time quote matches).
      // The oracle is DuckDB's NATIVE ASOF LEFT JOIN — an independent
      // implementation of the semantics, not a replay of our union+fill
      // composition, so the two algorithms cross-check each other.
      (spark, dir) => {
        val bars = Tables.bars(spark, dir)
        val trades = bars.where(col("ord") % 3 === 0)
          .select(col("symbol"), col("ord"), col("close").as("trade_px"))
        val quotes = bars.where(col("ord") % 5 === 0)
          .select(col("symbol"), col("ord"), col("open").as("quote_px"))
        graft.etl.AsOf.asofJoin(trades, quotes, valueCols = Seq("quote_px"))
          .select(col("symbol"), col("ord"), r6(col("trade_px")).as("trade_px"),
            r6(col("quote_px")).as("quote_px"), col("matched_ord"))
          .orderBy("symbol", "ord")
      },
      Some(s"""${Sql.bars},
        |trades AS (SELECT symbol, ord, close AS trade_px FROM bars WHERE ord % 3 = 0),
        |quotes AS (SELECT symbol, ord AS qord, open AS quote_px FROM bars WHERE ord % 5 = 0)
        |SELECT t.symbol, t.ord, ${Sql.r6("t.trade_px", "trade_px")},
        |  ${Sql.r6("q.quote_px", "quote_px")}, q.qord AS matched_ord
        |FROM trades t ASOF LEFT JOIN quotes q
        |  ON t.symbol = q.symbol AND t.ord >= q.qord
        |ORDER BY t.symbol, t.ord""".stripMargin)),

    Entry("range_join",
      // points-to-intervals containment via the bucketed equi-join
      // (RangeJoin): every 10th bar opens a [ord, ord+6] interval, every
      // bar is a point; each qualifying pair is emitted exactly once
      // because a point owns exactly one bucket. The oracle is DuckDB's
      // native inequality join (IEJoin) — again an independent algorithm
      // for the same semantics.
      (spark, dir) => {
        val bars = Tables.bars(spark, dir)
        val points = bars.select(col("symbol"), col("ord"), col("close"))
        val intervals = bars.where(col("ord") % 10 === 0)
          .select(col("symbol"), col("ord").as("start"), (col("ord") + 6).as("end"))
        graft.etl.RangeJoin.rangeJoin(points, intervals, "ord", "start", "end")
          .select(col("symbol"), col("start"), col("ord"), r6(col("close")).as("close"))
          .orderBy("symbol", "start", "ord")
      },
      Some(s"""${Sql.bars},
        |points AS (SELECT symbol, ord, close FROM bars),
        |iv AS (SELECT symbol, ord AS start, ord + 6 AS "end" FROM bars WHERE ord % 10 = 0)
        |SELECT i.symbol, i.start, p.ord, ${Sql.r6("p.close", "close")}
        |FROM iv i JOIN points p
        |  ON i.symbol = p.symbol AND p.ord BETWEEN i.start AND i."end"
        |ORDER BY i.symbol, i.start, p.ord""".stripMargin))
  )

  val queries: Map[String, Q] = entries.map(e => e.name -> e.q).toMap
  val oracle: Map[String, String] = entries.flatMap(e => e.oracle.map(e.name -> _)).toMap
}
