package graft.queries

/** DuckDB replay of the multimodal demo pipeline (Multimodal.demoMedia →
  * withFeatures): the payloads are PURE FUNCTIONS of the documents table —
  * synthWav/synthPpm are integer arithmetic on doc_id and the raw branch
  * is the UTF-8 text itself — so the decode+feature-extract output is
  * SQL-expressible without parsing any binary: the oracle re-derives the
  * samples/pixels/bytes from the same formulas and replays the feature
  * arithmetic exactly.
  *
  * Exactness notes (all probed against DuckDB 1.x semantics):
  *   - DuckDB FLOAT ops are true float32 (FLOAT+FLOAT→FLOAT, FLOAT/INT→
  *     FLOAT), so the decoder's float accumulations replay bit-for-bit
  *     via list_reduce folds over FLOAT;
  *   - Java's `(x).toInt` truncates while DuckDB CAST rounds — every bin
  *     index goes through trunc();
  *   - decodeStub's wrapping 64-bit rolling hash is replayed in HUGEINT
  *     mod 2^64 (Java's floorMod(h,16) equals the unsigned h % 16 because
  *     2^64 ≡ 0 mod 16);
  *   - doubles divide via CAST(... AS DOUBLE) so no DECIMAL arithmetic
  *     sneaks in;
  *   - same ASCII corpus assumption as DedupSql.tokCte;
  *   - the raw branch additionally assumes text payloads do NOT sniff as
  *     media: Multimodal.decode dispatches on magic bytes, so a document
  *     whose text happens to parse as a complete WAV ("RIFF…WAVE" +
  *     valid fmt/data) or PPM ("P6" + valid header + enough body bytes)
  *     would be decoded as media by Spark while this replay treats it as
  *     the stub — impossible for natural-language text, but a corpus of
  *     binary-in-text would need a kind gate on both sides.
  */
object MultimodalSql {

  private val P64 = "CAST('18446744073709551616' AS HUGEINT)"

  /** synthWav: 256 PCM16 mono samples s_t = ((t·k) mod 256 − 128)·200 with
    * k = id%7+1; decodeWav: duration/RMS/zero-cross/peak + 12-bin |sample|
    * histogram (Multimodal.scala:53-103, 185-201). */
  private val wavCtes: String = {
    val bins = (0 until 12).map(b =>
      s"    CAST(sum(CASE WHEN bin = $b THEN 1 ELSE 0 END) AS FLOAT) / CAST(256 AS FLOAT) AS f${4 + b}")
      .mkString(",\n")
    s"""wavd AS (SELECT doc_id, (doc_id % 7 + 1) AS k FROM documents WHERE doc_id % 3 = 0),
      |wavs AS (
      |  SELECT d.doc_id, r.t, ((r.t * d.k) % 256 - 128) * 200 AS s
      |  FROM wavd d CROSS JOIN range(256) r(t)
      |),
      |wavx AS (
      |  SELECT doc_id, t, s, CAST(abs(s) AS DOUBLE) / 32768.0 AS a,
      |    CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 ELSE 0 END AS sgn
      |  FROM wavs
      |),
      |wavw AS (
      |  SELECT doc_id, t, a, sgn,
      |    lag(nullif(sgn, 0) IGNORE NULLS) OVER (PARTITION BY doc_id ORDER BY t) AS prev,
      |    least(CAST(trunc(a * 12) AS INT), 11) AS bin
      |  FROM wavx
      |),
      |wavagg AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(a * a ORDER BY t)), (x, y) -> x + y) AS sumsq,
      |    max(a) AS peak,
      |    sum(CASE WHEN sgn != 0 AND prev IS NOT NULL AND sgn != prev THEN 1 ELSE 0 END) AS crossings,
      |$bins
      |  FROM wavw GROUP BY doc_id
      |),
      |wavf AS (
      |  SELECT doc_id, CAST(556 AS INTEGER) AS n_bytes, 'wav' AS kind,
      |    [CAST(CAST(256 AS FLOAT) / 1 / 8000 AS FLOAT),
      |     CAST(sqrt(sumsq / 256) AS FLOAT),
      |     CAST(crossings AS FLOAT) / 255,
      |     CAST(peak AS FLOAT),
      |     f4, f5, f6, f7, f8, f9, f10, f11, f12, f13, f14, f15] AS feats
      |  FROM wavagg
      |)""".stripMargin
  }

  /** synthPpm: 8×8 P6, byte i = (id·31 + i·17) mod 256; decodePpm:
    * w/h/mean-RGB + 11-bin Rec.601 luma histogram
    * (Multimodal.scala:108-151, 204-208). */
  private val ppmCtes: String = {
    val bins = (0 until 11).map(b =>
      s"    CAST(sum(CASE WHEN bin = $b THEN 1 ELSE 0 END) AS FLOAT) / CAST(64 AS FLOAT) AS f${5 + b}")
      .mkString(",\n")
    s"""ppmp AS (
      |  SELECT d.doc_id, r.p,
      |    CAST((d.doc_id * 31 + (3 * r.p + 0) * 17) % 256 AS DOUBLE) / 255.0 AS cr,
      |    CAST((d.doc_id * 31 + (3 * r.p + 1) * 17) % 256 AS DOUBLE) / 255.0 AS cg,
      |    CAST((d.doc_id * 31 + (3 * r.p + 2) * 17) % 256 AS DOUBLE) / 255.0 AS cb
      |  FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 1) d CROSS JOIN range(64) r(p)
      |),
      |ppml AS (
      |  SELECT doc_id, p, cr, cg, cb,
      |    least(CAST(trunc((0.299 * cr + 0.587 * cg + 0.114 * cb) * 11) AS INT), 10) AS bin
      |  FROM ppmp
      |),
      |ppmagg AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(cr ORDER BY p)), (x, y) -> x + y) AS sr,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(cg ORDER BY p)), (x, y) -> x + y) AS sg,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(cb ORDER BY p)), (x, y) -> x + y) AS sb,
      |$bins
      |  FROM ppml GROUP BY doc_id
      |),
      |ppmf AS (
      |  SELECT doc_id, CAST(203 AS INTEGER) AS n_bytes, 'ppm' AS kind,
      |    [CAST(8 AS FLOAT), CAST(8 AS FLOAT),
      |     CAST(sr / 64 AS FLOAT), CAST(sg / 64 AS FLOAT), CAST(sb / 64 AS FLOAT),
      |     f5, f6, f7, f8, f9, f10, f11, f12, f13, f14, f15] AS feats
      |  FROM ppmagg
      |)""".stripMargin
  }

  /** decodeStub over the raw UTF-8 text bytes: per-slot float accumulation
    * of b/255 plus the +1 vote at floorMod(rolling-hash, 16)
    * (Multimodal.scala:27-39). */
  private val rawCtes: String = {
    val slots = (0 until 16).map(j =>
      s"""    list_reduce(list_prepend(CAST(0 AS FLOAT), list_transform(
         |      list_filter(range(len(bs)), i -> i % 16 = $j),
         |      i -> CAST(bs[i + 1] AS FLOAT) / CAST(255 AS FLOAT))), (x, y) -> x + y) AS f$j""".stripMargin)
      .mkString(",\n")
    val feats = (0 until 16).map(j =>
      s"CASE WHEN idx = $j THEN f$j + CAST(1 AS FLOAT) ELSE f$j END").mkString(", ")
    s"""rawb AS (
      |  SELECT doc_id, length(text) AS n,
      |    CASE WHEN length(text) = 0 THEN [] ELSE
      |      list_transform(string_split(text, ''), c -> ascii(c)) END AS bs
      |  FROM documents WHERE doc_id % 3 = 2
      |),
      |rawh AS (
      |  SELECT doc_id, n, bs,
      |    CAST(list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
      |      list_transform(bs, b -> CAST(b AS HUGEINT))),
      |      (h, b) -> (31 * h + b) % $P64) % 16 AS INT) AS idx,
      |$slots
      |  FROM rawb
      |),
      |rawf AS (
      |  SELECT doc_id, CAST(n AS INTEGER) AS n_bytes, 'raw' AS kind,
      |    [$feats] AS feats
      |  FROM rawh
      |)""".stripMargin
  }

  /** Spark-side `aggregate(features, 0.0, (a,v) -> a + v*v)` replay: an
    * ordered double fold over the 16 floats widened to double. */
  private val sqNorm: String =
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      "list_transform(feats, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), (x, y) -> x + y)"

  val multimodalFeaturesSql: String =
    s"""WITH $wavCtes, $ppmCtes, $rawCtes,
      |allf AS (SELECT * FROM wavf UNION ALL SELECT * FROM ppmf UNION ALL SELECT * FROM rawf)
      |SELECT doc_id, n_bytes, kind, round($sqNorm, 6) + 0.0 AS feature_sq_norm
      |FROM allf ORDER BY doc_id""".stripMargin

  /** Multimodal.resizePpm(8×8 → 4×4) + decodePpm replay: nearest-neighbor
    * maps destination pixel (y, x) to source pixel (2y, 2x) — pure index
    * arithmetic — then the feature extraction is the ppmCtes fold over
    * the 16 mapped pixels. Resized payload = 11 header + 48 body bytes. */
  val multimodalResizeSql: String = {
    val bins = (0 until 11).map(b =>
      s"    CAST(sum(CASE WHEN bin = $b THEN 1 ELSE 0 END) AS FLOAT) / CAST(16 AS FLOAT) AS f${5 + b}")
      .mkString(",\n")
    s"""WITH rp AS (
      |  SELECT d.doc_id, r.q,
      |    ((r.q // 4) * 2) * 8 + (r.q % 4) * 2 AS src
      |  FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 1) d CROSS JOIN range(16) r(q)
      |),
      |px AS (
      |  SELECT doc_id, q,
      |    CAST((doc_id * 31 + (3 * src + 0) * 17) % 256 AS DOUBLE) / 255.0 AS cr,
      |    CAST((doc_id * 31 + (3 * src + 1) * 17) % 256 AS DOUBLE) / 255.0 AS cg,
      |    CAST((doc_id * 31 + (3 * src + 2) * 17) % 256 AS DOUBLE) / 255.0 AS cb
      |  FROM rp
      |),
      |lm AS (
      |  SELECT doc_id, q, cr, cg, cb,
      |    least(CAST(trunc((0.299 * cr + 0.587 * cg + 0.114 * cb) * 11) AS INT), 10) AS bin
      |  FROM px
      |),
      |agg AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(cr ORDER BY q)), (x, y) -> x + y) AS sr,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(cg ORDER BY q)), (x, y) -> x + y) AS sg,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(cb ORDER BY q)), (x, y) -> x + y) AS sb,
      |$bins
      |  FROM lm GROUP BY doc_id
      |),
      |f AS (
      |  SELECT doc_id, CAST(59 AS INTEGER) AS n_bytes,
      |    [CAST(4 AS FLOAT), CAST(4 AS FLOAT),
      |     CAST(sr / 16 AS FLOAT), CAST(sg / 16 AS FLOAT), CAST(sb / 16 AS FLOAT),
      |     f5, f6, f7, f8, f9, f10, f11, f12, f13, f14, f15] AS feats
      |  FROM agg
      |)
      |SELECT doc_id, n_bytes, round($sqNorm, 6) + 0.0 AS feature_sq_norm
      |FROM f ORDER BY doc_id""".stripMargin
  }

  /** Multimodal.demoVideo + withSampledFrames(every=2) replay: doc_id has
    * (doc_id % 4 + 2) frames, frames 0/2/4 kept; frame f is synthPpm with
    * seed doc_id + f, mean Rec.601 luma folded in pixel order (the exact
    * left-fold the Scala loop runs). */
  val multimodalFramesSql: String =
    s"""WITH vids AS (
      |  SELECT doc_id, CAST(doc_id % 4 + 2 AS INT) AS nf FROM documents
      |),
      |kept AS (
      |  SELECT v.doc_id, v.nf, CAST(f.f AS INT) AS frame_idx
      |  FROM vids v CROSS JOIN range(5) f(f)
      |  WHERE f.f < v.nf AND f.f % 2 = 0
      |),
      |px AS (
      |  SELECT k.doc_id, k.nf, k.frame_idx, r.p,
      |    CAST(((k.doc_id + k.frame_idx) * 31 + (3 * r.p + 0) * 17) % 256 AS DOUBLE) / 255.0 AS cr,
      |    CAST(((k.doc_id + k.frame_idx) * 31 + (3 * r.p + 1) * 17) % 256 AS DOUBLE) / 255.0 AS cg,
      |    CAST(((k.doc_id + k.frame_idx) * 31 + (3 * r.p + 2) * 17) % 256 AS DOUBLE) / 255.0 AS cb
      |  FROM kept k CROSS JOIN range(64) r(p)
      |)
      |SELECT doc_id, frame_idx, nf AS n_frames,
      |  CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
      |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list(0.299 * cr + 0.587 * cg + 0.114 * cb ORDER BY p)), (x, y) -> x + y) / 64, 6) + 0.0 AS luma_mean
      |FROM px GROUP BY doc_id, frame_idx, nf
      |ORDER BY doc_id, frame_idx""".stripMargin
}
