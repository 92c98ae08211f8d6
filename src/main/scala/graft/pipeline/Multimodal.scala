package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, and run decode / feature-extraction as a
  * batched per-partition pass (the Scala analog of `mapInPandas` — one
  * iterator per partition, vectorizable batch shape, no per-row overhead).
  *
  * Two formats are decoded FOR REAL, pure-JVM (no codec libraries in this
  * container): WAV (RIFF PCM16) and PPM (P6 binary RGB). Payloads that are
  * neither fall back to `decodeStub`, a deterministic fake that keeps the
  * shape contract — swap it for a JNI/codec call in production without
  * touching the plumbing. Format dispatch sniffs magic bytes, never file
  * names, so the path works on any binary column at any scale.
  */
object Multimodal {

  val FeatureDim = 16

  val KindWav = "wav"; val KindPpm = "ppm"; val KindRaw = "raw"

  /** STUB fallback: deterministic "decode + feature extract" for unknown
    * formats. Output shape/determinism contract matches the real paths. */
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

  @inline private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  @inline private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o).toLong) | (u16(b, o + 2).toLong << 16)
  @inline private def ascii(b: Array[Byte], o: Int, s: String): Boolean =
    b.length >= o + s.length && s.indices.forall(i => b(o + i) == s.charAt(i).toByte)

  /** RIFF/WAVE PCM16 decode → audio features:
    * [0] duration (s), [1] RMS, [2] zero-crossing rate, [3] peak,
    * [4..15] 12-bin histogram of |sample| (all amplitudes normalized to
    * [0,1] by 32768). Walks the chunk list, so extra chunks (LIST, fact)
    * are fine. Returns None unless PCM16 with a valid fmt+data pair. */
  def decodeWav(bytes: Array[Byte]): Option[Array[Float]] = {
    if (!(ascii(bytes, 0, "RIFF") && ascii(bytes, 8, "WAVE"))) return None
    var fmtOk = false; var sampleRate = 0; var channels = 0
    var dataOff = -1; var dataLen = 0
    var o = 12
    var walking = true
    while (walking && o + 8 <= bytes.length) {
      val size = u32(bytes, o + 4).toInt
      if (size < 0) walking = false // malformed size (>2^31) — stop, don't loop
      else {
        if (ascii(bytes, o, "fmt ") && o + 8 + 16 <= bytes.length) {
          val audioFormat = u16(bytes, o + 8)
          channels = u16(bytes, o + 10)
          sampleRate = u32(bytes, o + 12).toInt
          val bits = u16(bytes, o + 22)
          fmtOk = audioFormat == 1 && bits == 16 && channels >= 1 && sampleRate > 0
        } else if (ascii(bytes, o, "data")) {
          dataOff = o + 8; dataLen = math.min(size, bytes.length - dataOff)
        }
        // advance in Long: a size near 2^31 would wrap the Int addition
        // negative and index with a bogus offset instead of terminating
        val next = o.toLong + 8L + size + (size & 1) // chunks are word-aligned
        if (next > bytes.length) walking = false else o = next.toInt
      }
    }
    if (!fmtOk || dataOff < 0 || dataLen < 2) return None
    val n = dataLen / 2
    val out = new Array[Float](FeatureDim)
    var i = 0; var sumSq = 0.0; var crossings = 0; var peak = 0.0
    var prevSign = 0
    while (i < n) {
      val s = u16(bytes, dataOff + 2 * i).toShort.toInt
      val a = math.abs(s) / 32768.0
      sumSq += a * a
      if (a > peak) peak = a
      val sign = Integer.signum(s)
      if (sign != 0) {
        if (prevSign != 0 && sign != prevSign) crossings += 1
        prevSign = sign
      }
      out(4 + math.min((a * 12).toInt, 11)) += 1.0f
      i += 1
    }
    out(0) = n.toFloat / channels / sampleRate
    out(1) = math.sqrt(sumSq / n).toFloat
    out(2) = if (n > 1) crossings.toFloat / (n - 1) else 0.0f
    out(3) = peak.toFloat
    var b = 4
    while (b < FeatureDim) { out(b) /= n; b += 1 }
    Some(out)
  }

  /** Parse a P6 header starting at `start`: (width, height, maxval,
    * body offset), or None if it isn't a well-formed P6 prefix. */
  private[graft] def parsePpmHeader(bytes: Array[Byte], start: Int): Option[(Int, Int, Int, Int)] = {
    if (!ascii(bytes, start, "P6")) return None
    // header: "P6" <ws> width <ws> height <ws> maxval <single ws> rgb...
    var o = start + 2
    val fields = new Array[Int](3)
    var f = 0
    while (f < 3) {
      while (o < bytes.length && (bytes(o) == ' ' || bytes(o) == '\n' || bytes(o) == '\t' || bytes(o) == '\r')) o += 1
      if (o < bytes.length && bytes(o) == '#') { while (o < bytes.length && bytes(o) != '\n') o += 1 }
      else {
        var v = 0; var any = false
        while (o < bytes.length && bytes(o) >= '0' && bytes(o) <= '9') {
          v = v * 10 + (bytes(o) - '0'); o += 1; any = true
          if (v > (1 << 15)) return None // absurd field — reject before Int overflow
        }
        if (!any) return None
        fields(f) = v; f += 1
      }
    }
    o += 1 // the single whitespace after maxval
    if (fields(0) <= 0 || fields(1) <= 0 || fields(2) <= 0 || fields(2) > 255) None
    else Some((fields(0), fields(1), fields(2), o))
  }

  /** PPM P6 (binary RGB, maxval ≤ 255) decode → image features:
    * [0] width, [1] height, [2..4] mean R/G/B in [0,1],
    * [5..15] 11-bin histogram of Rec.601 luma. */
  def decodePpm(bytes: Array[Byte]): Option[Array[Float]] = {
    val hdr = parsePpmHeader(bytes, 0)
    if (hdr.isEmpty) return None
    val (w, h, maxv, o) = hdr.get
    // fields are capped at 2^15 so w*h*3 ≤ 3·2^30 still needs a Long
    val needL = w.toLong * h * 3
    if (bytes.length - o < needL) return None
    val need = needL.toInt
    val out = new Array[Float](FeatureDim)
    var i = 0; var sr = 0.0; var sg = 0.0; var sb = 0.0
    while (i < need) {
      val r = (bytes(o + i) & 0xFF) / maxv.toDouble
      val g = (bytes(o + i + 1) & 0xFF) / maxv.toDouble
      val b = (bytes(o + i + 2) & 0xFF) / maxv.toDouble
      sr += r; sg += g; sb += b
      val luma = 0.299 * r + 0.587 * g + 0.114 * b
      out(5 + math.min((luma * 11).toInt, 10)) += 1.0f
      i += 3
    }
    val px = w * h
    out(0) = w.toFloat; out(1) = h.toFloat
    out(2) = (sr / px).toFloat; out(3) = (sg / px).toFloat; out(4) = (sb / px).toFloat
    var b2 = 5
    while (b2 < FeatureDim) { out(b2) /= px; b2 += 1 }
    Some(out)
  }

  /** Magic-byte dispatch: real decode where we have one, stub otherwise. */
  def decode(bytes: Array[Byte]): (String, Array[Float]) =
    decodeWav(bytes).map((KindWav, _))
      .orElse(decodePpm(bytes).map((KindPpm, _)))
      .getOrElse((KindRaw, decodeStub(bytes)))

  /** Nearest-neighbor P6 resize, re-emitting P6 bytes: source pixel
    * (⌊y·h/outH⌋, ⌊x·w/outW⌋) — pure integer index math, so the oracle
    * replays it exactly. None if the payload isn't a complete P6. */
  def resizePpm(bytes: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
    require(outW > 0 && outH > 0, "output dims must be positive")
    parsePpmHeader(bytes, 0).flatMap { case (w, h, maxv, off) =>
      if (bytes.length - off < w.toLong * h * 3) None
      else {
        val header = s"P6\n$outW $outH\n$maxv\n".getBytes
        val body = new Array[Byte](outW * outH * 3)
        var y = 0
        while (y < outH) {
          val sy = (y.toLong * h / outH).toInt
          var x = 0
          while (x < outW) {
            val sx = (x.toLong * w / outW).toInt
            val src = off + (sy * w + sx) * 3
            val dst = (y * outW + x) * 3
            body(dst) = bytes(src); body(dst + 1) = bytes(src + 1); body(dst + 2) = bytes(src + 2)
            x += 1
          }
          y += 1
        }
        Some(header ++ body)
      }
    }
  }

  /** Split a concatenated-P6 "video" payload into frames. None unless the
    * WHOLE payload is a seamless sequence of complete P6 frames (a codec
    * would own real container formats; the plumbing — schema, fan-out,
    * per-frame work distribution — is what this exercises). */
  def splitFrames(bytes: Array[Byte]): Option[IndexedSeq[Array[Byte]]] = {
    val frames = IndexedSeq.newBuilder[Array[Byte]]
    var o = 0
    while (o < bytes.length) {
      parsePpmHeader(bytes, o) match {
        case Some((w, h, _, body)) =>
          // Long end: header dims up to 2^15 pass the parser, and
          // 32768·32768·3 overflows Int — malformed must mean None, not
          // a negative-range crash inside a task
          val end = body.toLong + w.toLong * h * 3
          if (end > bytes.length) return None
          frames += java.util.Arrays.copyOfRange(bytes, o, end.toInt)
          o = end.toInt
        case None => return None
      }
    }
    Some(frames.result())
  }

  /** Frame sampling: every `every`-th frame of a concatenated-P6 video,
    * starting at frame 0 (the standard decimation a video pipeline does
    * before feature extraction). */
  def sampleFrames(bytes: Array[Byte], every: Int): Option[IndexedSeq[Array[Byte]]] = {
    require(every > 0, "every must be positive")
    splitFrames(bytes).map(_.zipWithIndex.collect { case (f, i) if i % every == 0 => f })
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
      StructField("kind", StringType),
      StructField("features", ArrayType(FloatType))))
    df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val (kind, feats) = decode(bytes)
          Row(id, bytes.length, kind, feats.toSeq)
        }
      }(Encoders.row(schema))
  }

  /** Resize every PPM payload to outW×outH and re-extract features —
    * decode → transform → re-encode → decode, all inside one
    * partition-batched pass (non-PPM payloads pass through with null
    * outputs so the caller can filter or inspect). */
  def withResizedFeatures(df: DataFrame, outW: Int, outH: Int,
                          idCol: String = "doc_id",
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
          resizePpm(bytes, outW, outH) match {
            case Some(resized) =>
              Row(id, resized.length, decodePpm(resized).map(_.toSeq).orNull)
            case None => Row(id, null, null)
          }
        }
      }(Encoders.row(schema))
  }

  /** Explode a video column into its sampled frames: one output row per
    * KEPT frame, with per-frame mean Rec.601 luma (double, the exact
    * left-fold order the oracle replays). The fan-out runs inside the
    * scan stage — no shuffle; a 100 TB video corpus distributes by input
    * split and each task streams its own payloads. */
  def withSampledFrames(df: DataFrame, every: Int,
                        idCol: String = "doc_id",
                        binCol: String = "payload"): DataFrame = {
    require(every > 0, "every must be positive")
    val schema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("frame_idx", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("luma_mean", DoubleType)))
    df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
      .mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          splitFrames(bytes) match {
            case Some(frames) =>
              frames.indices.collect { case i if i % every == 0 =>
                val f = frames(i)
                val (w, h, maxv, off) = parsePpmHeader(f, 0).get
                var s = 0.0
                var p = 0
                val n = w * h
                while (p < n) {
                  val cr = (f(off + 3 * p) & 0xFF) / maxv.toDouble
                  val cg = (f(off + 3 * p + 1) & 0xFF) / maxv.toDouble
                  val cb = (f(off + 3 * p + 2) & 0xFF) / maxv.toDouble
                  s += 0.299 * cr + 0.587 * cg + 0.114 * cb
                  p += 1
                }
                Row(id, i, frames.length, w, h, s / n)
              }
            case None => Nil
          }
        }
      }(Encoders.row(schema))
  }

  // ---------------------------------------------------------------- demo

  /** Deterministic synthetic PCM16 mono WAV (integer triangle-ish wave —
    * no floating point, so payload bytes are platform-independent). */
  def synthWav(seed: Long, nSamples: Int = 256, sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataLen); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1); buf.putShort(1) // PCM, mono
    buf.putInt(sampleRate); buf.putInt(sampleRate * 2)
    buf.putShort(2); buf.putShort(16)
    buf.put("data".getBytes); buf.putInt(dataLen)
    val k = (seed % 7 + 1).toInt
    var t = 0
    while (t < nSamples) {
      buf.putShort((((t * k) % 256 - 128) * 200).toShort)
      t += 1
    }
    buf.array()
  }

  /** Deterministic synthetic 8×8 P6 PPM. */
  def synthPpm(seed: Long, w: Int = 8, h: Int = 8): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes
    val body = Array.tabulate(w * h * 3)(i => ((seed * 31 + i * 17) % 256).toByte)
    header ++ body
  }

  /** Demo source: mixed-modality payload column — a third each WAV, PPM,
    * and raw text bytes (the testdata ships no real media; dispatch and
    * decode are what the query exercises). */
  def demoMedia(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType), StructField("payload", BinaryType)))
    docs.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val payload = (id % 3) match {
            case 0 => synthWav(id)
            case 1 => synthPpm(id)
            case _ => r.getString(1).getBytes("UTF-8")
          }
          Row(id, payload)
        }
      }(Encoders.row(schema))
  }

  /** Demo source kept for compat: fabricate a binary payload from text. */
  def demoBinary(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Deterministic synthetic "video": (doc_id % 4 + 2) concatenated 8×8
    * P6 frames, frame f seeded with doc_id + f. */
  def demoVideo(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType), StructField("payload", BinaryType)))
    docs.select(col(idCol).cast(LongType))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val nFrames = (id % 4 + 2).toInt
          Row(id, (0 until nFrames).map(f => synthPpm(id + f)).reduce(_ ++ _))
        }
      }(Encoders.row(schema))
  }
}
