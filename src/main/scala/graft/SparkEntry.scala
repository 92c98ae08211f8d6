package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-indicator single-pass showcase: price transforms + SMA + MOM over
    * the bar frame compose into ONE plan with a single window exchange.
    */
  def entry(spark: SparkSession): DataFrame = {
    implicit val w = Window.partitionBy("symbol").orderBy("ord")
    Tables.bars(spark, "/root/testdata/sf0.001")
      .select(col("symbol"), col("ord"), col("close"),
        ta.Frames.typprice(col("high"), col("low"), col("close")).as("typprice"),
        ta.Frames.bop(col("open"), col("high"), col("low"), col("close")).as("bop"),
        ta.Frames.sma(col("close"), 5).as("sma5"),
        ta.Frames.mom(col("close"), 1).as("mom1"))
      .filter(col("sma5").isNotNull)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.TaQueries.queries ++ graft.queries.PatternQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible (recursive)
    * ops → driver records a rows-only check; those are covered by golden
    * scalatests instead. */
  def oracleSql: Map[String, String] =
    graft.queries.TaQueries.oracle ++ graft.queries.PatternQueries.oracle
}
