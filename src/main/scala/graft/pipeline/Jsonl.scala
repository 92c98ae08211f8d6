package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** JSONL (line-delimited JSON) source/sink for document corpora — the
  * interchange format LLM training data actually ships in.
  *
  * Reads take an EXPLICIT schema: schema inference is a full extra pass
  * over the data (at 100 TB, a second 100 TB scan before the first real
  * one), and silently widens types on dirty rows. Writes are plain
  * `spark.write.json` — one JSON object per line, splittable downstream,
  * standard JSON string escaping so embedded quotes/newlines/unicode
  * round-trip exactly (tested).
  */
object Jsonl {

  /** The documents-table schema (TESTDATA.md contract). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocuments(spark: SparkSession, path: String): DataFrame =
    read(spark, path, documentsSchema)

  /** Read with a caller-supplied schema (corpora with extra fields).
    * FAILFAST, not the PERMISSIVE default: a malformed line (truncated
    * write, stray log text) must surface as an error, not silently
    * become an all-null row that downstream dedup/packing miscounts —
    * the same dirty-data posture as refusing schema inference. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  def write(docs: DataFrame, path: String): Unit =
    docs.write.mode("overwrite").json(path)
}
