package graft.queries

/** DuckDB replay of the RESIDUAL-encoded fused index
  * (Similarity.ivfPqResWrite → ivfPqResQuery — the FAISS-IVFPQ
  * refinement): the coarse quantizer trains exactly as IvfSql replays
  * it; every valid-dim vector's RESIDUAL (v − cent[cid]) is derived as
  * an exact elementwise subtraction; the PQ codebooks train over the
  * residual table through the UNCHANGED PqSql CTEs (trainCtesOver /
  * encodeCtesOver pointed at `remb`); and the ADC scan adds the
  * residual corrections — dot(q, cent) per (query, cell) through the
  * same 6-dp LUT fixed point, and the per-(cell, subspace, codeword)
  * cross+norm table 2·c_j·cw + ‖cw‖² — every sum in the same fold
  * order as the Scala loops, so the refined path is hash-gated end to
  * end like the raw one.
  */
object IvfPqResSql {
  private val Dim = PipelineQueries.EmbDim
  private val M = PqSql.M
  private val K = PqSql.K
  private val Sub = PqSql.Sub

  /** Full-dim left-associated chains over a 64-dim list pair / single. */
  private def dotFull(a: String, b: String): String =
    (1 to Dim).map(d => s"$a[$d]*$b[$d]").mkString(" + ")
  private def nsqFull(a: String): String =
    (1 to Dim).map(d => s"$a[$d]*$a[$d]").mkString(" + ")

  /** The residual table: every valid-dim vector's cell assignment and
    * v − cent[cid], list built in dim order (exact subtraction —
    * replayable without rounding because the inputs are identical on
    * both engines). */
  private val residCtes: String =
    s"""rall AS (SELECT vec_id, v FROM emb WHERE len(v) = $Dim),
      |${IvfSql.assignCte("raf", s"cents${IvfSql.Iters}", "rall")},
      |remb AS (
      |  SELECT a.vec_id, a.cid,
      |    list(a.v[t.pos+1] - c.c[t.pos+1] ORDER BY t.pos) AS v
      |  FROM raf a JOIN cents${IvfSql.Iters} c ON c.cid = a.cid
      |       CROSS JOIN range($Dim) t(pos)
      |  GROUP BY a.vec_id, a.cid
      |)""".stripMargin

  /** dot(q, cent) per (query, cell), dim-order fold through the LUT's
    * 6-dp fixed point (it is a lookup-table entry like any other). */
  private val qctCte: String =
    s"""qct AS (
      |  SELECT q.vec_id AS query_id, c.cid,
      |    round(${dotFull("q.v", "c.c")}, 6) + 0.0 AS qc
      |  -- the q.v guard mirrors pqLutDf's drop-malformed-queries
      |  -- contract (null / wrong-dimension query vectors emit no rows)
      |  FROM emb q CROSS JOIN cents${IvfSql.Iters} c
      |  WHERE q.vec_id < 10 AND q.v IS NOT NULL AND len(q.v) = ${PqSql.Dim}
      |)""".stripMargin

  /** ‖cent‖² per cell and the per-(cell, j, k) correction
    * 2·(c_j·cw_{j,k}) + ‖cw_{j,k}‖², flattened per cell in (j, k)
    * order — the tFlat layout ivfPqResQuery builds on the driver. */
  private val corrCtes: String =
    s"""ctn AS (SELECT cid, (${nsqFull("c")}) AS cnsq FROM cents${IvfSql.Iters}),
      |tq AS (
      |  SELECT cn.cid, p.j, p.k,
      |    2*(${PqSql.dotSub("cn.c", "p.j", "p.c")}) + (${PqSql.nsqChain("p.c")}) AS t
      |  FROM cents${IvfSql.Iters} cn CROSS JOIN pcb${PqSql.Iters} p
      |),
      |tl AS (SELECT cid, list(t ORDER BY j, k) AS tl FROM tq GROUP BY cid)""".stripMargin

  /** The residual ADC scan over probed cells: num = qc + Σ_j lut,
    * den = ‖c‖² + Σ_j t[j, code_j] — parenthesized so the lut/t sums
    * fold left-to-right FIRST, then add the per-cell constant (the
    * Scala `qc + aggregate(...)` order). */
  private val padResCte: String = {
    val num = (0 until M).map(j => s"l.lut[$j*$K + d.cd[${j + 1}]]").mkString(" + ")
    val den = (0 until M).map(j => s"tl.tl[$j*$K + d.cd[${j + 1}]]").mkString(" + ")
    s"""pad AS (
      |  SELECT p.query_id, d.vec_id AS corpus_id,
      |    (qc.qc + ($num)) AS num,
      |    (cn.cnsq + ($den)) AS den
      |  FROM pcd d JOIN raf a ON a.vec_id = d.vec_id
      |       JOIN probes p ON p.cid = a.cid
      |       JOIN plu l ON l.query_id = p.query_id
      |       JOIN qct qc ON qc.query_id = p.query_id AND qc.cid = a.cid
      |       JOIN ctn cn ON cn.cid = a.cid
      |       JOIN tl ON tl.cid = a.cid
      |  WHERE d.vec_id != p.query_id
      |)""".stripMargin
  }

  private val prefixCtes: String =
    s"""WITH ${IvfSql.embCte},
      |${IvfSql.trainCtes},
      |$residCtes,
      |${PqSql.trainCtesOver("remb")},
      |${PqSql.encodeCtesOver("remb")},
      |${IvfSql.probesCte},
      |$qctCte,
      |$corrCtes,
      |$padResCte""".stripMargin

  val annIvfPqResTop5Sql: String =
    s"""$prefixCtes,
      |${PqSql.rerankTail}""".stripMargin

  /** recall@k of the residual-encoded fused path against exact brute
    * force — side by side with ann_ivfpq_recall, this prices what the
    * residual refinement BUYS at the same codebook budget. */
  val annIvfPqResRecallSql: String =
    s"""$prefixCtes,
      |${PqSql.rerankCtes},
      |${PqSql.bfCte},
      |${PqSql.recallSelect}""".stripMargin
}
