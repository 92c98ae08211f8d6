package graft.queries

import graft.functions.TextHashes.{polyA, polyB, PolyP => P}

/** DuckDB replay of the PORTABLE (mod-prime) dedup signatures
  * (functions.TextHashes.{MinhashSigPoly, SimHashPoly64}, pipeline.Dedup
  * `portable = true` mode). Every coefficient is generated from the SAME
  * splitmix-derived polyA/polyB the Spark expressions use, and every
  * intermediate stays below 2^63, so plain BIGINT arithmetic replays the
  * signatures bit-for-bit — this is what upgrades the four dedup queries
  * from rows-only to hash-verified.
  *
  * The pair-level oracles are deliberately SEMANTIC, not structural: the
  * minhash pair set is re-derived from the same (band, bucket) collisions,
  * but the simhash pair set is the plain all-pairs Hamming≤k predicate the
  * pigeonhole join *guarantees* — so the oracle also re-proves the chunk
  * join's exactly-once recall, not just its arithmetic.
  */
object DedupSql {

  /** Whitespace tokens of the lowered text (parity with Spark
    * `split(trim(lower(text)), "\\s+")` proven by the text_quality oracle).
    *
    * Corpus assumption (shared by every replay in this file and the
    * established PipelineQueries string_split+ascii pattern): documents are
    * ASCII and use only RE2∩Java whitespace (space/tab/LF/CR). fpLambda's
    * `string_split(s,'') + ascii(c)` equals `codePointAt` only for
    * single-codepoint characters, and RE2's '\s' excludes Java's \x0B —
    * both hold for the synthetic documents table these oracles run on;
    * non-ASCII corpora would need text normalized to this subset on both
    * sides before hashing. */
  val tokCte: String =
    """tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents)"""

  /** Word 3-shingles with Dedup.shingles' short-text fallback. */
  val shCte: String =
    """sh AS (
      |  SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |    ELSE list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS sh
      |  FROM tok
      |)""".stripMargin

  /** Polynomial code-point fingerprint of one string expression
    * (TextHashes.polyFingerprint): h ← (h·131 + codepoint) mod P. */
  def fpLambda(v: String): String =
    s"CASE WHEN length($v) = 0 THEN CAST(0 AS BIGINT) ELSE " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($v, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(h, c) -> (h * 131 + c) % $P) END"

  /** Per-doc shingle fingerprints. */
  val shFpCte: String =
    s"fp AS (SELECT doc_id, list_transform(sh, s -> ${fpLambda("s")}) AS f FROM sh)"

  /** 32-perm minhash signature list: sig[p+1] = min over shingles of
    * (a_p·f + b_p) mod P. */
  def sigCte(numPerms: Int = 32): String = {
    val mins = (0 until numPerms).map(p =>
      s"list_min(list_transform(f, x -> (${polyA(p)} * x + ${polyB(p)}) % $P))")
      .mkString("[", ", ", "]")
    s"sig AS (SELECT doc_id, $mins AS sig FROM fp)"
  }

  /** (doc_id, band, bucket) rows; bucket = poly fold of the band's slice,
    * identical to Dedup.lshBuckets' portable aggregate. Band geometry is
    * derived from the SAME (numPerms, bands) pair as sigCte, with
    * lshBuckets' divisibility invariant, so the replay cannot silently
    * drift from rows = numPerms / bands. */
  def bucketCte(numPerms: Int = 32, bands: Int = 16): String = {
    val rows = numPerms / bands
    require(rows * bands == numPerms, "bands must divide numPerms")
    val rowsSql = (0 until bands).map { b =>
      val fold = (0 until rows).foldLeft("CAST(0 AS BIGINT)")((acc, r) =>
        s"(($acc) * 1000003 + sig[${b * rows + r + 1}]) % $P")
      s"SELECT doc_id, CAST($b AS INTEGER) AS band, $fold AS bucket FROM sig"
    }.mkString(" UNION ALL ")
    s"b AS ($rowsSql)"
  }

  private val minhashCtes =
    s"$tokCte, $shCte, $shFpCte, ${sigCte()}, ${bucketCte()}"

  val minhashBucketsSql: String =
    s"""WITH $minhashCtes
      |SELECT doc_id, band, bucket FROM b ORDER BY doc_id, band""".stripMargin

  val minhashPairsSql: String = {
    val agree = (1 to 32).map(i => s"CASE WHEN sa.sig[$i] = sb.sig[$i] THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH $minhashCtes,
      |p AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id
      |  FROM b a JOIN b b2 ON a.band = b2.band AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id
      |), shd AS (SELECT doc_id, list_distinct(sh) AS shd FROM sh),
      |est AS (
      |  SELECT p.a_id, p.b_id, CAST($agree AS DOUBLE) / 32 AS est_jaccard
      |  FROM p JOIN sig sa ON sa.doc_id = p.a_id JOIN sig sb ON sb.doc_id = p.b_id
      |)
      |SELECT e.a_id, e.b_id, round(e.est_jaccard, 6) + 0.0 AS est_jaccard,
      |  round(CASE WHEN len(list_distinct(list_concat(da.shd, db.shd))) = 0 THEN 0.0
      |       ELSE CAST(len(list_intersect(da.shd, db.shd)) AS DOUBLE)
      |            / CAST(len(list_distinct(list_concat(da.shd, db.shd))) AS DOUBLE) END, 6) + 0.0 AS jaccard
      |FROM est e JOIN shd da ON da.doc_id = e.a_id JOIN shd db ON db.doc_id = e.b_id
      |ORDER BY a_id, b_id""".stripMargin
  }

  /** Incremental/cross-corpus near-dup flagging — replays
    * Dedup.crossCorpusNearDup over the % 3 corpus/reference split: the
    * banded bucket join restricted to corpus×reference pairs, exact
    * n-gram jaccard verify, then per-corpus-doc any/max rollup with the
    * no-candidate docs surfacing (false, NULL). */
  def crossCorpusDedupSql(bands: Int = 16): String =
    crossCorpusDedupSqlOver("doc_id % 3 != 0", "doc_id % 3 = 0", bands)

  /** The same replay with caller-pinned corpus/reference predicates
    * (over the bare column name `doc_id`, alias-qualified here) — the
    * index-maintenance gates (dedupIndexDelete) replay a SHRUNK
    * reference through the identical pipeline text.
    *
    * The bare-column contract is ENFORCED: qualification happens on the
    * identifier boundary (`\bdoc_id\b` — substrings like `my_doc_id`
    * never touched), and a predicate that arrives already qualified
    * (`d.doc_id`) is rejected rather than corrupted into `d.cb.doc_id`. */
  def crossCorpusDedupSqlOver(corpusPred: String, refPred: String,
                              bands: Int = 16): String = {
    def qualify(pred: String, alias: String): String = {
      require(!pred.contains(".doc_id"),
        s"crossCorpusDedupSqlOver: predicate '$pred' already qualifies doc_id — " +
        "pass predicates over the BARE column name; this generator alias-qualifies them")
      pred.replaceAll("\\bdoc_id\\b", s"$alias.doc_id")
    }
    s"""WITH $tokCte, $shCte, $shFpCte, ${sigCte()}, ${bucketCte(bands = bands)},
      |p AS (
      |  SELECT DISTINCT cb.doc_id AS a_id, rb.doc_id AS b_id
      |  FROM b cb JOIN b rb ON cb.band = rb.band AND cb.bucket = rb.bucket
      |  WHERE (${qualify(corpusPred, "cb")})
      |    AND (${qualify(refPred, "rb")})
      |), shd AS (SELECT doc_id, list_distinct(sh) AS shd FROM sh),
      |jac AS (
      |  SELECT p.a_id,
      |    CASE WHEN len(list_distinct(list_concat(da.shd, db.shd))) = 0 THEN 0.0
      |         ELSE CAST(len(list_intersect(da.shd, db.shd)) AS DOUBLE)
      |              / CAST(len(list_distinct(list_concat(da.shd, db.shd))) AS DOUBLE) END AS jaccard
      |  FROM p JOIN shd da ON da.doc_id = p.a_id JOIN shd db ON db.doc_id = p.b_id
      |)
      |SELECT d.doc_id,
      |  coalesce(bool_or(j.jaccard >= 0.5), false) AS near_dup,
      |  round(max(j.jaccard), 6) + 0.0 AS max_jaccard
      |FROM (SELECT doc_id FROM documents WHERE $corpusPred) d
      |LEFT JOIN jac j ON j.a_id = d.doc_id
      |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
  }

  /** Cross-source overlap matrix: verified near-dup pairs (n-gram
    * jaccard ≥ thr) grouped by UNORDERED source pair — counts and max
    * similarity only (order-independent aggregates; an avg would sit on
    * the fp-summation-order boundary). */
  def sourceOverlapSql(thr: Double): String =
    s"""WITH $minhashCtes,
      |p AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id
      |  FROM b a JOIN b b2 ON a.band = b2.band AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id
      |), shd AS (SELECT doc_id, list_distinct(sh) AS shd FROM sh),
      |jac AS (
      |  SELECT p.a_id, p.b_id,
      |    CASE WHEN len(list_distinct(list_concat(da.shd, db.shd))) = 0 THEN 0.0
      |         ELSE CAST(len(list_intersect(da.shd, db.shd)) AS DOUBLE)
      |              / CAST(len(list_distinct(list_concat(da.shd, db.shd))) AS DOUBLE) END AS jaccard
      |  FROM p JOIN shd da ON da.doc_id = p.a_id JOIN shd db ON db.doc_id = p.b_id
      |),
      |ws AS (
      |  SELECT least(sa.source, sb.source) AS source_a,
      |         greatest(sa.source, sb.source) AS source_b, jaccard
      |  FROM jac j JOIN documents sa ON sa.doc_id = j.a_id
      |             JOIN documents sb ON sb.doc_id = j.b_id
      |  WHERE jaccard >= ${Sql.dlit(thr)}
      |)
      |SELECT source_a, source_b, count(*) AS n_pairs,
      |  round(max(jaccard), 6) + 0.0 AS max_jaccard
      |FROM ws GROUP BY source_a, source_b ORDER BY source_a, source_b""".stripMargin

  /** The regime-dispatched overlap matrix's oracle — the EXACT leg with
    * the dispatcher's uniform schema (est_pairs as a rounded double =
    * Σw with w = 1, exactly count(*)). Valid wherever the candidate-mass
    * probe stays below Dedup.verifiedPairsAuto's maxExactPairs, which
    * every gated scale factor does by ~3 orders of magnitude; the
    * sampled regime's replay is sourceOverlapSampledSql. */
  def sourceOverlapAutoSql(thr: Double): String =
    s"""WITH $minhashCtes,
      |p AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id
      |  FROM b a JOIN b b2 ON a.band = b2.band AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id
      |), shd AS (SELECT doc_id, list_distinct(sh) AS shd FROM sh),
      |jac AS (
      |  SELECT p.a_id, p.b_id,
      |    CASE WHEN len(list_distinct(list_concat(da.shd, db.shd))) = 0 THEN 0.0
      |         ELSE CAST(len(list_intersect(da.shd, db.shd)) AS DOUBLE)
      |              / CAST(len(list_distinct(list_concat(da.shd, db.shd))) AS DOUBLE) END AS jaccard
      |  FROM p JOIN shd da ON da.doc_id = p.a_id JOIN shd db ON db.doc_id = p.b_id
      |),
      |ws AS (
      |  SELECT least(sa.source, sb.source) AS source_a,
      |         greatest(sa.source, sb.source) AS source_b, jaccard
      |  FROM jac j JOIN documents sa ON sa.doc_id = j.a_id
      |             JOIN documents sb ON sb.doc_id = j.b_id
      |  WHERE jaccard >= ${Sql.dlit(thr)}
      |)
      |SELECT source_a, source_b,
      |  round(CAST(count(*) AS DOUBLE), 6) + 0.0 AS est_pairs,
      |  round(max(jaccard), 6) + 0.0 AS max_jaccard
      |FROM ws GROUP BY source_a, source_b ORDER BY source_a, source_b""".stripMargin

  /** Per-token fingerprints + per-bit vote counts (SimHashPoly64: bit j
    * votes on the parity of (a_{4096+j}·f + b_{4096+j}) mod P). */
  private val simVoteCtes: String = {
    val sums = (0 until 64).map { j =>
      s"sum(CASE WHEN (((${polyA(4096L + j)} * x + ${polyB(4096L + j)}) % $P) & 1) = 1 THEN 1 ELSE -1 END) AS c$j"
    }.mkString(", ")
    s"""tf AS (SELECT doc_id, list_transform(toks, t -> ${fpLambda("t")}) AS f FROM tok),
      |u AS (SELECT doc_id, unnest(f) AS x FROM tf),
      |v AS (SELECT doc_id, $sums FROM u GROUP BY doc_id)""".stripMargin
  }

  /** Signed-64 signature assembled from the vote signs (bit 63 via the
    * two's-complement offset so BIGINT never overflows). */
  private val simSigExpr: String =
    "(CASE WHEN c63 > 0 THEN -9223372036854775807 - 1 ELSE 0 END)" +
      (0 to 62).map(j => s" + (CASE WHEN c$j > 0 THEN ${1L << j} ELSE 0 END)").mkString

  val simhash64Sql: String =
    s"""WITH $tokCte, $simVoteCtes,
      |s AS (SELECT doc_id, $simSigExpr AS simhash FROM v)
      |SELECT doc_id, simhash FROM s ORDER BY doc_id""".stripMargin

  /** Hamming≤k pairs — the all-pairs SEMANTIC contract of the pigeonhole
    * chunk join (exactly-once emission, full recall for k < numChunks). */
  val simhashPairsSql: String =
    s"""WITH $tokCte, $simVoteCtes,
      |s AS (SELECT doc_id, $simSigExpr AS simhash FROM v)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
      |FROM s a JOIN s b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 7
      |ORDER BY a_id, b_id""".stripMargin

  /** Simhash STAR construction → min-label transitive closure (shared by
    * the cluster-shaped oracles below) — replays Dedup.simhashStarEdges
    * exactly: identical signatures collapse to their min-id rep
    * (Hamming-0 `ident` edges), distinct signatures explode into 8×8-bit
    * pigeonhole chunks, each (chunk, key) bucket's min-id hub links to
    * its members, and ONLY hub↔member links pay the Hamming-≤7
    * verification. Replaying the construction (not the all-pairs
    * contract) pins the star's recall trade in the gate; the exact
    * all-pairs pair contract stays gated via simhashPairsSql. */
  private val starComponentCtes: String =
    s"""$tokCte, $simVoteCtes,
      |s AS (SELECT doc_id, $simSigExpr AS simhash FROM v),
      |r AS (SELECT simhash, min(doc_id) AS rep FROM s GROUP BY simhash),
      |ident AS (SELECT r.rep AS a_id, s.doc_id AS b_id
      |          FROM s JOIN r USING (simhash) WHERE s.doc_id != r.rep),
      |ck AS (SELECT rep AS doc_id, simhash, CAST(t.c AS INTEGER) AS chunk,
      |         ((simhash >> (CAST(t.c AS INTEGER) * 8)) & 255) AS ckey
      |       FROM r CROSS JOIN range(8) t(c)),
      |hub AS (SELECT chunk, ckey, min(doc_id) AS a_id FROM ck GROUP BY chunk, ckey),
      |hs AS (SELECT h.chunk, h.ckey, h.a_id, s2.simhash AS a_sim
      |       FROM hub h JOIN s s2 ON s2.doc_id = h.a_id),
      |star AS (
      |  SELECT DISTINCT hs.a_id, ck.doc_id AS b_id
      |  FROM ck JOIN hs ON ck.chunk = hs.chunk AND ck.ckey = hs.ckey
      |  WHERE ck.doc_id != hs.a_id AND bit_count(xor(hs.a_sim, ck.simhash)) <= 7
      |),
      |p AS (SELECT a_id, b_id FROM star UNION SELECT a_id, b_id FROM ident),
      |edges AS (SELECT a_id AS src, b_id AS dst FROM p UNION SELECT b_id, a_id FROM p),
      |lab AS (
      |  SELECT doc_id AS id, doc_id AS label FROM documents
      |  UNION
      |  SELECT e.src AS id, lab.label FROM edges e JOIN lab ON lab.id = e.dst
      |)""".stripMargin

  /** Simhash star edges → connected components → canonical representative. */
  val dedupClustersSql: String =
    s"""WITH RECURSIVE $starComponentCtes
      |SELECT id AS doc_id, min(label) AS cluster_id, min(label) = id AS is_representative
      |FROM lab GROUP BY id ORDER BY doc_id""".stripMargin

  /** Star-vs-verified-all-pairs recall measurement (round 13, advisor-
    * directed): closes BOTH the star construction (lab — hub-verified
    * links only, the dedup_clusters default) and the full verified
    * Hamming-≤7 all-pairs graph (lab2), then emits the Rand
    * decomposition from cluster-size marginals. `pairs_split` counts
    * pairs co-clustered under all-pairs verification but separated by
    * the star — the star default's recall loss, measured at every gated
    * SF instead of assumed from one spec fixture. */
  val starRecallSql: String =
    s"""WITH RECURSIVE $starComponentCtes,
      |p2 AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |       FROM s a JOIN s b ON a.doc_id < b.doc_id
      |       WHERE bit_count(xor(a.simhash, b.simhash)) <= 7),
      |edges2 AS (SELECT a_id AS src, b_id AS dst FROM p2 UNION SELECT b_id, a_id FROM p2),
      |lab2 AS (
      |  SELECT doc_id AS id, doc_id AS label FROM documents
      |  UNION
      |  SELECT e.src AS id, lab2.label FROM edges2 e JOIN lab2 ON lab2.id = e.dst
      |),
      |ca AS (SELECT id, min(label) AS c FROM lab GROUP BY id),
      |cb AS (SELECT id, min(label) AS c FROM lab2 GROUP BY id),
      |joint AS (SELECT ca.c AS x, cb.c AS y, count(*) AS n
      |          FROM ca JOIN cb ON ca.id = cb.id GROUP BY 1, 2),
      |ma AS (SELECT x, sum(n) AS n FROM joint GROUP BY x),
      |mb AS (SELECT y, sum(n) AS n FROM joint GROUP BY y),
      |agg AS (SELECT
      |  (SELECT count(*) FROM ma) AS n_clusters_star,
      |  (SELECT count(*) FROM mb) AS n_clusters_allpairs,
      |  (SELECT CAST(sum(n*(n-1)//2) AS BIGINT) FROM ma) AS pairs_star,
      |  (SELECT CAST(sum(n*(n-1)//2) AS BIGINT) FROM mb) AS pairs_allpairs,
      |  (SELECT CAST(sum(n*(n-1)//2) AS BIGINT) FROM joint) AS pairs_both)
      |SELECT n_clusters_star, n_clusters_allpairs, pairs_star, pairs_allpairs,
      |  pairs_both, pairs_star - pairs_both AS pairs_merged,
      |  pairs_allpairs - pairs_both AS pairs_split
      |FROM agg""".stripMargin

  /** Bucket-SAMPLED source-overlap estimate — replays
    * Dedup.sampledVerifiedPairs: keep buckets with hash ≡ 0 mod s,
    * pair inside surviving cells, verify jaccard, recount each sampled
    * pair's total matching bands k, weight by the SAME exact decimal
    * literal table the Spark plan carries (1/(1−(1−1/s)^k) at 6 dp), and
    * Horvitz-Thompson-sum per unordered source pair. Decimal summation
    * is exact ⇒ order-independent ⇒ the estimate hash-matches
    * bit-for-bit. */
  def sourceOverlapSampledSql(sampleMod: Int, thr: Double): String = {
    val weights = graft.pipeline.Dedup.htWeights(sampleMod, 16)
      .map(wv => s"CAST('${graft.pipeline.Dedup.dec6(wv)}' AS DECIMAL(38,12))")
      .mkString("[", ", ", "]")
    s"""WITH $minhashCtes,
      |sb AS (SELECT * FROM b WHERE bucket % $sampleMod = 0),
      |p AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id
      |  FROM sb a JOIN sb b2 ON a.band = b2.band AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id
      |), kk AS (
      |  SELECT p.a_id, p.b_id, count(*) AS k
      |  FROM p JOIN b ba ON ba.doc_id = p.a_id
      |         JOIN b bb2 ON bb2.doc_id = p.b_id AND bb2.band = ba.band AND bb2.bucket = ba.bucket
      |  GROUP BY p.a_id, p.b_id
      |), shd AS (SELECT doc_id, list_distinct(sh) AS shd FROM sh),
      |jac AS (
      |  SELECT p.a_id, p.b_id,
      |    CASE WHEN len(list_distinct(list_concat(da.shd, db.shd))) = 0 THEN 0.0
      |         ELSE CAST(len(list_intersect(da.shd, db.shd)) AS DOUBLE)
      |              / CAST(len(list_distinct(list_concat(da.shd, db.shd))) AS DOUBLE) END AS jaccard
      |  FROM p JOIN shd da ON da.doc_id = p.a_id JOIN shd db ON db.doc_id = p.b_id
      |),
      |v AS (
      |  SELECT least(sa.source, sb2.source) AS source_a,
      |         greatest(sa.source, sb2.source) AS source_b,
      |         j.jaccard, ($weights)[kk.k] AS w
      |  FROM jac j JOIN kk ON kk.a_id = j.a_id AND kk.b_id = j.b_id
      |              JOIN documents sa ON sa.doc_id = j.a_id
      |              JOIN documents sb2 ON sb2.doc_id = j.b_id
      |  WHERE j.jaccard >= ${Sql.dlit(thr)}
      |)
      |SELECT source_a, source_b, count(*) AS n_pairs_sampled,
      |  round(CAST(sum(w) AS DOUBLE), 6) + 0.0 AS est_pairs,
      |  round(max(jaccard), 6) + 0.0 AS max_jaccard
      |FROM v GROUP BY source_a, source_b ORDER BY source_a, source_b""".stripMargin
  }

  /** Minhash-LSH bucket STAR edges → min-label transitive closure →
    * components: replays Dedup.bucketStarEdges over the portable minhash
    * buckets (one bucket-min → member edge per bucket membership), then
    * the same least-fixpoint closure the simhash cluster oracles use.
    * Components equal the all-pairs bucket join's by construction — the
    * oracle pins that the linear-edge construction changes nothing. */
  val minhashStarClustersSql: String =
    s"""WITH RECURSIVE $minhashCtes,
      |bm AS (SELECT band, bucket, min(doc_id) AS a_id FROM b GROUP BY band, bucket),
      |p AS (
      |  SELECT DISTINCT bm.a_id, b2.doc_id AS b_id
      |  FROM b b2 JOIN bm ON b2.band = bm.band AND b2.bucket = bm.bucket
      |  WHERE b2.doc_id != bm.a_id
      |),
      |edges AS (SELECT a_id AS src, b_id AS dst FROM p UNION SELECT b_id, a_id FROM p),
      |lab AS (
      |  SELECT doc_id AS id, doc_id AS label FROM documents
      |  UNION
      |  SELECT e.src AS id, lab.label FROM edges e JOIN lab ON lab.id = e.dst
      |)
      |SELECT id AS doc_id, min(label) AS cluster_id, min(label) = id AS is_representative
      |FROM lab GROUP BY id ORDER BY doc_id""".stripMargin

  /** The full production dedup recipe on the LINEAR path — replays
    * minhash-LSH star edges → components → keep-longest representative →
    * the kept-document list with each kept doc's cluster size. This is
    * the one query a user copies to dedup a corpus end-to-end, and every
    * stage of it is the scale-safe construction. */
  val minhashKeepListSql: String =
    s"""WITH RECURSIVE $minhashCtes,
      |bm AS (SELECT band, bucket, min(doc_id) AS a_id FROM b GROUP BY band, bucket),
      |p AS (
      |  SELECT DISTINCT bm.a_id, b2.doc_id AS b_id
      |  FROM b b2 JOIN bm ON b2.band = bm.band AND b2.bucket = bm.bucket
      |  WHERE b2.doc_id != bm.a_id
      |),
      |edges AS (SELECT a_id AS src, b_id AS dst FROM p UNION SELECT b_id, a_id FROM p),
      |lab AS (
      |  SELECT doc_id AS id, doc_id AS label FROM documents
      |  UNION
      |  SELECT e.src AS id, lab.label FROM edges e JOIN lab ON lab.id = e.dst
      |),
      |cl AS (SELECT id AS doc_id, min(label) AS cluster_id FROM lab GROUP BY id),
      |sz AS (SELECT cluster_id, CAST(count(*) AS INTEGER) AS n_members FROM cl GROUP BY cluster_id),
      |k AS (
      |  SELECT c.doc_id, c.cluster_id,
      |    row_number() OVER (PARTITION BY c.cluster_id
      |      ORDER BY length(d.text) DESC NULLS LAST, c.doc_id ASC) = 1 AS keep
      |  FROM cl c JOIN documents d USING (doc_id)
      |)
      |SELECT k.doc_id, k.cluster_id, sz.n_members
      |FROM k JOIN sz USING (cluster_id)
      |WHERE k.keep ORDER BY k.doc_id""".stripMargin

  /** Bloom position stream i of fingerprint expression `x` modulo m —
    * replays Dedup.bloomPosition (seed stream 40960+, disjoint from
    * every other sketch stream). Pure BIGINT arithmetic: a,b,x < P ≈ 1e9 keeps
    * a·x ≈ 1e18 inside 64-bit range on both engines. */
  def bloomPos(i: Int, x: String, m: Long): String =
    s"(((${polyA(40960L + i)} * $x + ${polyB(40960L + i)}) % $P) % $m)"

  /** Components + keep-longest representative selection: rank within each
    * cluster by text length (engine-exact, no fp ordering), ties on
    * ascending id. */
  val clusterKeepLongestSql: String =
    s"""WITH RECURSIVE $starComponentCtes,
      |cl AS (SELECT id AS doc_id, min(label) AS cluster_id FROM lab GROUP BY id)
      |SELECT c.doc_id, c.cluster_id,
      |  row_number() OVER (PARTITION BY c.cluster_id
      |    ORDER BY length(d.text) DESC NULLS LAST, c.doc_id ASC) = 1 AS keep
      |FROM cl c JOIN documents d USING (doc_id) ORDER BY c.doc_id""".stripMargin
}
