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
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    def timed(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[perf] $what%-48s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val emb = Tables.embeddings(spark, sfDir)
    emb.limit(1).collect()
    noop(emb.limit(64))
    val q = emb.where(col("vec_id") < 10)

    // --- ANN res family breakdown ---
    val resDir = java.nio.file.Files.createTempDirectory("graft_dbg_res_").toString
    timed("ivfPqResWrite (fixture build)") {
      graft.pipeline.Similarity.ivfPqResWrite(emb, resDir); 0L
    }
    timed("ivfPqResAdcTopK (ADC scan + rank)") {
      noop(graft.pipeline.Similarity.ivfPqResAdcTopK(spark, resDir, q))
    }
    timed("ivfPqResQuery (ADC + exact rerank) 1") {
      noop(graft.pipeline.Similarity.ivfPqResQuery(spark, resDir, emb, q))
    }
    timed("ivfPqResQuery (ADC + exact rerank) 2") {
      noop(graft.pipeline.Similarity.ivfPqResQuery(spark, resDir, emb, q))
    }
    timed("bruteForceTopK 1") {
      noop(graft.pipeline.Similarity.bruteForceTopK(emb, q))
    }
    timed("bruteForceTopK 2") {
      noop(graft.pipeline.Similarity.bruteForceTopK(emb, q))
    }
    // the full recall assembly, as registered
    def recallAssembly(): org.apache.spark.sql.DataFrame = {
      val k = graft.pipeline.Similarity.DefaultTopK
      val approx = graft.pipeline.Similarity.ivfPqResQuery(spark, resDir, emb, q)
      val bf = graft.pipeline.Similarity.bruteForceTopK(emb, q, k = k)
        .select(col("query_id"), col("corpus_id"))
      val hits = approx.select(col("query_id"), col("corpus_id"))
        .join(bf, Seq("query_id", "corpus_id"))
        .groupBy("query_id").agg(count(lit(1)).as("__h"))
      q.select(col("vec_id").as("query_id")).join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          (coalesce(col("__h"), lit(0L)) / lit(k.toDouble)).as("recall_at_k"))
        .orderBy("query_id")
    }
    timed("res recall assembly 1")(noop(recallAssembly()))
    timed("res recall assembly 2")(noop(recallAssembly()))
    timed("res recall assembly 3")(noop(recallAssembly()))

    // --- BPE breakdown ---
    val docs = Tables.documents(spark, sfDir)
    var model: graft.pipeline.Bpe.Model = null
    timed("Bpe.train(20)") {
      model = graft.pipeline.Bpe.train(docs, 20); 0L
    }
    timed("Bpe.encode (doc_id < 300)") {
      noop(graft.pipeline.Bpe.encode(docs.where(col("doc_id") < 300), model.wordPieces))
    }
    timed("Bpe.encode again") {
      noop(graft.pipeline.Bpe.encode(docs.where(col("doc_id") < 300), model.wordPieces))
    }
    timed("Bpe.train(20) mg=4096") {
      graft.pipeline.Bpe.train(docs, 20, pairCapacity = Some(4096)); 0L
    }
    spark.stop()
  }
}
