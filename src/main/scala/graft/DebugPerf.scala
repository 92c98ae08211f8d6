package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf isolation for round work (not part of the contract). */
object DebugPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[perf] $what%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = Tables.documents(spark, sfDir)
    docs.count()
    timed("where(repetitionKeep).count")(
      docs.where(graft.pipeline.Repetition.repetitionKeep(col("text"))).count())
    timed("select keep flag count")(
      docs.select(graft.pipeline.Repetition.repetitionKeep(col("text")).as("k"))
        .where(col("k")).count())
    timed("distinctRatio only filter")(
      docs.where(graft.pipeline.Repetition.distinctRatio(col("text")) > 0.2).count())
    timed("topTokenRatio only filter")(
      docs.where(graft.pipeline.Repetition.topTokenRatio(col("text")) < 0.3).count())
    timed("dup2 only filter")(
      docs.where(coalesce(graft.pipeline.Repetition.dupNgramRatio(col("text"), 2), lit(0.0)) < 0.5).count())
    timed("bigram topK")(
      graft.pipeline.Vocab.ngramTopK(docs, 2, 100, exactDocFreq = true).count())
    timed("packText alone")(
      graft.pipeline.Packing.packText(docs, 512, 8).count())
    timed("packText on pre-filtered")(
      graft.pipeline.Packing.packText(
        docs.where(graft.pipeline.Repetition.repetitionKeep(col("text"))), 512, 8).count())
    // does .count() prune projection work? compare against full materialization
    val sma = SparkEntry.queries("sma_20")
    timed("sma_20 .count()")(sma(spark, sfDir).count())
    timed("sma_20 toRdd.count()")(sma(spark, sfDir).queryExecution.toRdd.count())
    val rep = SparkEntry.queries("repetition_stats")
    timed("repetition_stats .count()")(rep(spark, sfDir).count())
    timed("repetition_stats toRdd.count()")(rep(spark, sfDir).queryExecution.toRdd.count())
    spark.stop()
  }
}
