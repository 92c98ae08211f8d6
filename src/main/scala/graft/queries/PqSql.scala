package graft.queries

import graft.functions.TextHashes.{polyA, polyB, PolyP => P}
import graft.pipeline.Similarity

/** DuckDB replay of the FULL product-quantization ANN pipeline
  * (Similarity.pqTrain → PqEncode → ADC scan → exact re-rank): the
  * portable seed order, every per-subspace Lloyd round, the L2
  * codeword assignment, the per-query lookup tables, the ADC shortlist
  * and the final exact-cosine top-k — so the quantized path is
  * hash-verified end to end, not recall-bounded.
  *
  * Replayability rests on the same two design points as IvfSql plus one
  * more: (1) the seed hash is plain BIGINT arithmetic; (2) every Lloyd
  * mean and every LUT entry is rounded to 6 decimals on both sides; and
  * (3) every floating sum the ranking depends on — subvector dots,
  * codeword norms, the m-term ADC numerator/denominator — is written as
  * an explicit LEFT-ASSOCIATED chain in the same index order the Scala
  * loops fold, so the doubles are bit-identical rather than merely
  * close (an aggregate SUM() would have engine-chosen order). */
class PqSqlGen(private[queries] val K: Int, private[queries] val Shortlist: Int) {
  // shared with the implementation, not hand-copied (IvfSql discipline)
  private[queries] val Dim = PipelineQueries.EmbDim
  private[queries] val M = Similarity.DefaultPqM
  private[queries] val Sub = Dim / M
  private[queries] val Iters = Similarity.DefaultPqIters
  private[queries] val SampleMod = Similarity.DefaultPqSampleMod
  private[queries] val TopK = Similarity.DefaultTopK
  private[queries] val Seed = Similarity.PqHashSeed

  private[queries] val hashExpr = s"((${polyA(Seed)} * (vec_id % $P) + ${polyB(Seed)}) % $P)"

  private[queries] val embCte =
    "emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"

  /** Left-associated dot between subspace `j` of vector `v` and codeword
    * list `c` — PqEncode's inner-loop fold order. */
  private[queries] def dotSub(v: String, j: String, c: String): String =
    (1 to Sub).map(d => s"$v[$j*$Sub+$d]*$c[$d]").mkString(" + ")

  /** ‖c‖², summed in dim order (PqEncode's halfNsq / pqTopKWith's
    * nsqFlat chain). */
  private[queries] def nsqChain(c: String): String =
    (1 to Sub).map(d => s"$c[$d]*$c[$d]").mkString(" + ")

  /** Nearest-codeword assignment of every `src` row per subspace —
    * argmax (dot − ‖c‖²/2), ties to the lowest codeword (PqEncode's
    * strict-`>` first-wins scan). */
  private[queries] def assignCte(name: String, cents: String, src: String): String =
    s"""$name AS (
      |  SELECT vec_id, j, k FROM (
      |    SELECT s.vec_id, c.j, c.k,
      |      row_number() OVER (PARTITION BY s.vec_id, c.j
      |        ORDER BY ((${dotSub("s.v", "c.j", "c.c")}) - (${nsqChain("c.c")})/2) DESC,
      |                 c.k ASC) AS rn
      |    FROM $src s CROSS JOIN $cents c
      |  ) WHERE rn = 1
      |)""".stripMargin

  /** One per-subspace Lloyd round: per-(j, code, dim) mean rounded to 6
    * (pqTrain's fixed point); an uncaptured codeword keeps its previous
    * value (the getOrElse / coalesce twin). */
  private[queries] def lloydCte(i: Int): String =
    s"""${assignCte(s"pa$i", s"pcb${i - 1}", "psamp")},
      |pm$i AS (
      |  SELECT a.j, a.k, t.d, round(avg(s.v[a.j*$Sub + t.d + 1]), 6) + 0.0 AS mu
      |  FROM pa$i a JOIN psamp s USING (vec_id) CROSS JOIN range($Sub) t(d)
      |  GROUP BY a.j, a.k, t.d
      |),
      |pcb$i AS (
      |  SELECT p.j, p.k, coalesce(mm.c, p.c) AS c
      |  FROM pcb${i - 1} p LEFT JOIN
      |    (SELECT j, k, list(mu ORDER BY d) AS c FROM pm$i GROUP BY j, k) mm
      |    ON mm.j = p.j AND mm.k = p.k
      |)""".stripMargin

  /** ADC numerator: m explicit lookups summed left-to-right in subspace
    * order (the zip_with/aggregate fold). `l`/`d` are the LUT and codes
    * table aliases of the consuming query. */
  private[queries] val adcNum: String =
    (0 until M).map(j => s"l.lut[$j*$K + d.cd[${j + 1}]]").mkString(" + ")
  private[queries] val adcDen: String =
    (0 until M).map(j => s"n.nl[$j*$K + d.cd[${j + 1}]]").mkString(" + ")

  /** The PQ training half — seed, initial per-subspace codebooks, the
    * Lloyd sample, every refinement round — ending at pcb$Iters. Shared
    * verbatim with IvfPqSql so the fused oracle replays the IDENTICAL
    * codebook (same CTE text, same fixed points). `src` is the training
    * table: emb for the raw paths, remb (residuals) for IvfPqResSql. */
  private[queries] def trainCtesOver(src: String): String = {
    val lloyds = (1 to Iters).map(lloydCte).mkString(",\n")
    s"""psd AS (
      |  SELECT row_number() OVER (ORDER BY h, sid) AS k, v FROM (
      |    SELECT $hashExpr AS h, vec_id AS sid, v
      |    FROM $src WHERE v IS NOT NULL ORDER BY h, sid LIMIT $K
      |  )
      |),
      |pcb0 AS (
      |  SELECT t.j, psd.k, list_slice(v, t.j*$Sub+1, (t.j+1)*$Sub) AS c
      |  FROM psd CROSS JOIN range($M) t(j)
      |),
      |psamp AS (
      |  SELECT vec_id, v FROM $src
      |  WHERE $hashExpr % $SampleMod = 0 AND len(v) = $Dim
      |),
      |$lloyds""".stripMargin
  }
  private[queries] val trainCtes: String = trainCtesOver("emb")

  /** The encode + probe-prep half: every valid-dim vector's code list
    * (pcd), the codeword-norm lookup (pnl), and the per-query LUTs
    * (plu) for the `vec_id < 10` query batch. */
  private[queries] def encodeCtesOver(src: String): String =
    s"""pall AS (SELECT vec_id, v FROM $src WHERE len(v) = $Dim),
      |${assignCte("paf", s"pcb$Iters", "pall")},
      |pcd AS (SELECT vec_id, list(k ORDER BY j) AS cd FROM paf GROUP BY vec_id),
      |pnl AS (SELECT list((${nsqChain("c")}) ORDER BY j, k) AS nl FROM pcb$Iters),
      |plu AS (
      |  SELECT q.vec_id AS query_id,
      |    list(round(${dotSub("q.v", "c.j", "c.c")}, 6) + 0.0 ORDER BY c.j, c.k) AS lut
      |  -- the q.v guard mirrors pqLutDf's drop-malformed-queries
      |  -- contract (null / wrong-dimension query vectors emit no rows)
      |  FROM emb q CROSS JOIN pcb$Iters c
      |  WHERE q.vec_id < 10 AND q.v IS NOT NULL AND len(q.v) = $Dim
      |  GROUP BY q.vec_id
      |)""".stripMargin
  private[queries] val encodeCtes: String = encodeCtesOver("emb")

  /** The shortlist → exact-re-rank CTEs, ending at pr (ranked exact
    * cosines); shared with IvfPqSql and the recall gates (`pad` is the
    * consumer-specific ADC scan CTE). */
  private[queries] val rerankCtes: String =
    s"""psh AS (
      |  SELECT query_id, corpus_id FROM (
      |    SELECT query_id, corpus_id,
      |      row_number() OVER (PARTITION BY query_id
      |        -- <= 0, not = 0: the raw paths' den is a sum of squares
      |        -- (identical semantics), the residual path's ‖ĉ+r̂‖² can
      |        -- round fractionally negative and must not reach sqrt
      |        ORDER BY (CASE WHEN den <= 0 THEN 0.0 ELSE num/sqrt(den) END) DESC,
      |                 corpus_id ASC) AS rn
      |    FROM pad
      |  ) WHERE rn <= $Shortlist
      |),
      |pex AS (
      |  SELECT psh.query_id, psh.corpus_id, list_cosine_similarity(eq.v, ec.v) AS cos
      |  FROM psh JOIN emb ec ON ec.vec_id = psh.corpus_id
      |           JOIN emb eq ON eq.vec_id = psh.query_id
      |),
      |pr AS (
      |  SELECT query_id, corpus_id, cos,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC) AS rnk
      |  FROM pex
      |)""".stripMargin

  /** The final top-k projection over pr. */
  private[queries] val finalSelect: String =
    s"""SELECT query_id, corpus_id, round(cos, 6) + 0.0 AS cosine, CAST(rnk AS INTEGER) AS rank
      |FROM pr WHERE rnk <= $TopK ORDER BY query_id, rank""".stripMargin

  /** The shortlist → exact-re-rank → final-projection tail, shared with
    * IvfPqSql (`pad` is the consumer-specific ADC scan CTE). */
  private[queries] val rerankTail: String =
    s"""$rerankCtes
      |$finalSelect""".stripMargin

  /** The flat-PQ ADC scan: every valid-dim code row against every query
    * LUT (the crossJoin shape — no coarse pruning). */
  private[queries] val padFlatCte: String =
    s"""pad AS (
      |  SELECT l.query_id, d.vec_id AS corpus_id,
      |    ($adcNum) AS num, ($adcDen) AS den
      |  FROM pcd d CROSS JOIN plu l CROSS JOIN pnl n
      |  WHERE d.vec_id != l.query_id
      |)""".stripMargin

  /** Exact brute-force top-k per query (the ann_brute_top5 ranking) —
    * the ground truth the recall gates compare against. */
  private[queries] val bfCte: String =
    s"""bf AS (
      |  SELECT query_id, corpus_id FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id ASC) AS rn
      |    FROM emb q CROSS JOIN emb c WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
      |  ) WHERE rn <= $TopK
      |)""".stripMargin

  /** recall@k of the approximate top-k (pr) against brute force (bf),
    * per query — the final shape both recall gates share. */
  private[queries] val recallSelect: String =
    s"""apx AS (SELECT query_id, corpus_id FROM pr WHERE rnk <= $TopK),
      |h AS (
      |  SELECT query_id, count(*) AS nh
      |  FROM apx JOIN bf USING (query_id, corpus_id) GROUP BY query_id
      |)
      |SELECT q.vec_id AS query_id, coalesce(h.nh, 0) / $TopK.0 AS recall_at_k
      |FROM emb q LEFT JOIN h ON h.query_id = q.vec_id
      |WHERE q.vec_id < 10 ORDER BY query_id""".stripMargin

  val annPqTop5Sql: String =
    s"""WITH $embCte,
      |$trainCtes,
      |$encodeCtes,
      |$padFlatCte,
      |$rerankTail""".stripMargin

  /** The measured-recall gate for the flat PQ path: re-derives the PQ
    * top-k AND the exact brute-force top-k, emitting per-query recall@k
    * — the dedup_star_recall discipline (the quantization trade is
    * MEASURED in the gate at every SF, not assumed). */
  val annPqRecallSql: String =
    s"""WITH $embCte,
      |$trainCtes,
      |$encodeCtes,
      |$padFlatCte,
      |$rerankCtes,
      |$bfCte,
      |$recallSelect""".stripMargin
}

/** The default-config generator instance — every member compiles from
  * the registered defaults, so the emitted SQL is exactly the
  * pre-parameterization text. */
object PqSql extends PqSqlGen(Similarity.DefaultPqK, Similarity.DefaultPqShortlist)

/** The quality-tier codebook generator (ksub/shortlist from the same
  * constants the HQ impl legs compile from — Similarity.HqPqK /
  * HqShortlist). */
object PqSqlHq extends PqSqlGen(Similarity.HqPqK, Similarity.HqShortlist)
