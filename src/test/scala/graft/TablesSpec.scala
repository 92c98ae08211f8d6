package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Tables.eventsNs must deliver BIGINT nanos whatever timestamp unit the
  * driver's parquet writer chose — the round-10 testdata regen flipped
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and broke every raw `ts div`
  * consumer at bench time, which is exactly the drift this pins. */
class TablesSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("graft-tables-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def stage(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("tables_spec_").toString
    // Tables.table reads $dir/events.parquet — a directory named like the
    // driver's single-file layout works identically through the Hadoop FS
    df.repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("eventsNs converts a timestamp-typed ts to epoch nanos (UTC)") {
    val micros = Seq(0L, 1_000_000L, 1_700_000_000_123_456L)
    val dir = stage(spark.range(micros.length).select(
      col("id").as("event_id"),
      expr(s"timestamp_micros(element_at(array(${micros.mkString(",")}), cast(id+1 as int)))").as("ts"),
      (col("id") % 3).as("user_id")))
    val out = Tables.eventsNs(spark, dir)
    assert(out.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    val got = out.orderBy("event_id").select("ts").collect().map(_.getLong(0)).toSeq
    assert(got == micros.map(_ * 1000L),
      "nanos must be micros*1000 under the UTC session tz, whatever TZ the host runs")
  }

  test("eventsNs passes a long ts through untouched") {
    val dir = stage(spark.range(4).select(
      col("id").as("event_id"), (col("id") * 1_000_000_007L).as("ts")))
    val out = Tables.eventsNs(spark, dir)
    assert(out.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    assert(out.orderBy("event_id").select("ts").collect().map(_.getLong(0)).toSeq ==
      (0 until 4).map(_ * 1_000_000_007L))
  }
}
