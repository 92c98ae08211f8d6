package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, and run decode / feature-extraction as a
  * batched per-partition pass (the Scala analog of `mapInPandas` — one
  * iterator per partition, vectorizable batch shape, no per-row overhead).
  *
  * The DECODE STEP IS A STUB: this container has no image/audio codecs, so
  * `decodeStub` produces a deterministic fake feature vector from the raw
  * bytes. The Spark-side contract — binary column in, fixed-width
  * float-array feature out, partition-batched execution, explicit output
  * schema — is real and tested; swap `decodeStub` for a JNI/codec call in
  * production without touching the plumbing.
  */
object Multimodal {

  val FeatureDim = 16

  /** STUB: deterministic "decode + feature extract" — a real deployment
    * replaces this with an actual decoder (e.g. JPEG → CHW floats →
    * pooled features). Output shape/determinism contract matches. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    var h = 1125899906842597L
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      out(i % FeatureDim) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    // fold the rolling hash in so equal-length different payloads differ
    out(((h % FeatureDim) + FeatureDim).toInt % FeatureDim) += 1.0f
    out
  }

  /** Attach decoded features to a frame with (idCol, binCol) columns.
    * Partition-batched: the decode loop runs once per partition iterator,
    * the schema is explicit, rows stream through without materializing the
    * whole partition. */
  def withFeatures(df: DataFrame, idCol: String = "doc_id",
                   binCol: String = "payload"): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("n_bytes", IntegerType),
      StructField("features", ArrayType(FloatType))))
    df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          Row(id, bytes.length, decodeStub(bytes).toSeq)
        }
      }(Encoders.row(schema))
  }

  /** Demo source: fabricate a binary payload column from document text
    * (the testdata ships no real media; the plumbing is the product). */
  def demoBinary(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8"))
}
