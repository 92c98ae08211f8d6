package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Readers for the driver test tables (TESTDATA.md) plus the canonical
  * long-format OHLCV bar frame derived deterministically from `events`.
  *
  * Data convention for the whole TA library (SURVEY.md §1): long format
  * `(symbol: String, ord: Long, open, high, low, close, volume: Double)`.
  * `ord` is any monotonically increasing per-symbol sort key; for the
  * driver tables we use `event_id`, which is globally ordered by `ts`
  * (verified on every scale factor), avoiding cross-engine timestamp
  * precision issues (events.ts is nanosecond parquet).
  *
  * Scale notes (100 TB design): all per-series operators partition by
  * `symbol`, so Spark parallelizes across series natively; the bar
  * derivation itself is a single window over (symbol, ord) — one shuffle,
  * reused by every downstream indicator in the same plan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS); Spark 4 rejects it unless mapped to
    // long. Runtime-settable, and set here (not only in our mains) because
    // the driver smoke-runs entry() with its own SparkSession.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Number of user-hash buckets folded into the series key. 80 series
    * (5 event types × 16 buckets) at every scale factor — enough to keep
    * local[32] saturated; on a real cluster the key would be an actual
    * instrument id with unbounded cardinality, which this layout models.
    */
  val SymbolBuckets = 16

  /** events projected to (symbol, ord, close).
    *
    * The series key is `event_type × (user_id mod 16)`, NOT bare
    * `event_type`: event_type has cardinality 5, which would cap every
    * window/groupByKey plan at 5-way parallelism forever (the round-1
    * scale-killer). The DuckDB oracle (Sql.bars) mirrors this derivation
    * exactly.
    */
  def series(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").select(
      concat(col("event_type"), lit("_"),
        (col("user_id") % SymbolBuckets).cast("string")).as("symbol"),
      col("event_id").as("ord"),
      col("value").as("close"))

  /** Deterministic synthetic OHLCV bars from `events` — the shared input of
    * every indicator query. open = previous close; high/low bracket the last
    * three closes; volume is a deterministic function of ord. The DuckDB
    * oracle (Sql.barsCte) recomputes the identical derivation.
    */
  def bars(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("ord")
    series(spark, dir)
      .withColumn("p1", lag("close", 1).over(w))
      .withColumn("p2", lag("close", 2).over(w))
      .withColumn("open", coalesce(col("p1"), col("close")))
      .withColumn("high", greatest(col("open"), col("close"), coalesce(col("p2"), col("close"))))
      .withColumn("low", least(col("open"), col("close"), coalesce(col("p2"), col("close"))))
      .withColumn("volume", (col("ord") % 1000 + 10).cast("double"))
      .drop("p1", "p2")
  }

  def documents(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
}
