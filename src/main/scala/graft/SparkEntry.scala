package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-indicator single-pass showcase: three recursive kernels (EMA,
    * RSI, ATR) computed in ONE shuffle via Recursive.multi with inputs
    * carried through, then frame ops composed in the same plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    implicit val w = Window.partitionBy("symbol").orderBy("ord")
    val bars = Tables.bars(spark, "/root/testdata/sf0.001")
    val rec = ta.Recursive.multi(bars, Seq("open", "high", "low", "close"), Seq(
      "ema5" -> (a => ta.Kernels.ema(a(3), 5)),
      "rsi5" -> (a => ta.Kernels.rsi(a(3), 5)),
      "atr5" -> (a => ta.Kernels.atr(a(1), a(2), a(3), 5))))
    rec.select(col("symbol"), col("ord"), col("close"),
        ta.Frames.typprice(col("high"), col("low"), col("close")).as("typprice"),
        ta.Frames.bop(col("open"), col("high"), col("low"), col("close")).as("bop"),
        ta.Frames.sma(col("close"), 5).as("sma5"),
        ta.Frames.mom(col("close"), 1).as("mom1"),
        col("ema5"), col("rsi5"), col("atr5"))
      .filter(col("sma5").isNotNull)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.TaQueries.queries ++ graft.queries.PatternQueries.queries ++
      graft.queries.PipelineQueries.queries ++ graft.queries.EtlQueries.queries ++
      graft.queries.RelationalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible (recursive)
    * ops → driver records a rows-only check; those are covered by golden
    * scalatests instead. */
  def oracleSql: Map[String, String] =
    graft.queries.TaQueries.oracle ++ graft.queries.PatternQueries.oracle ++
      graft.queries.PipelineQueries.oracle ++ graft.queries.EtlQueries.oracle ++
      graft.queries.RelationalQueries.oracle
}
