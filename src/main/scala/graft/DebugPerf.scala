package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch perf isolation for round work (not part of the contract). */
object DebugPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    def timed(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[perf] $what%-48s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // per-job wall listener
    val jobT = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobT.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobT.remove(je.jobId)
        if (t0 != 0L)
          println(f"[job] ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    })
    val bars = Tables.bars(spark, sfDir)
    bars.count()
    noop(bars.limit(64).select(col("symbol")))
    val q = SparkEntry.queries("cdlengulfing")
    // planning cost alone
    timed("cdlengulfing plan only") {
      q(spark, sfDir).queryExecution.executedPlan; 0L
    }
    timed("cdlengulfing run 1")(noop(q(spark, sfDir)))
    timed("cdlengulfing run 2")(noop(q(spark, sfDir)))
    timed("cdlengulfing run 3")(noop(q(spark, sfDir)))
    val q2 = SparkEntry.queries("sma_20")
    timed("sma_20 run 1")(noop(q2(spark, sfDir)))
    timed("sma_20 run 2")(noop(q2(spark, sfDir)))
    spark.stop()
  }
}
