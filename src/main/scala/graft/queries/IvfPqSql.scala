package graft.queries

/** DuckDB replay of the FUSED IVF-PQ ANN pipeline
  * (Similarity.ivfPqWrite → ivfPqQuery): the coarse quantizer's portable
  * seed + Lloyd rounds (IvfSql's CTEs, verbatim), the per-subspace PQ
  * codebook training and encoding (PqSql's CTEs, verbatim), the nprobe
  * coarse-list selection, the ADC scan restricted to probed lists only,
  * and the exact-cosine re-rank — so the composed index layout is
  * hash-verified end to end, exactly like each half is on its own.
  *
  * The composition is the point: this oracle is the two verified replays
  * JOINED — `pcd ⋈ af ⋈ probes` IS the statement "score codes, but only
  * in probed cells". No constant or fold order is restated here; every
  * piece is the shared CTE text from IvfSql/PqSql, so a change to either
  * half's defaults or fixed points recompiles into this oracle
  * automatically (the established can't-drift discipline).
  */
class IvfPqSqlGen(pq: PqSqlGen, nprobe: Int, scaledCells: Boolean = false,
                  scaledNprobe: Boolean = false) {
  require(!scaledNprobe || scaledCells,
    "scaledNprobe derives its bound from the scaled seed's ncnt CTE — " +
    "it is only meaningful with scaledCells")

  /** The coarse training half: the pinned-K seed by default, the
    * √n-scaled seed (IvfSql.trainCtesScaled) for the production
    * cell-count configs — everything downstream is count-agnostic. */
  private val coarseTrain: String =
    if (scaledCells) IvfSql.trainCtesScaled else IvfSql.trainCtes

  /** The probe CTE: literal nprobe by default, the data-derived
    * max(HqNProbe, ⌈cells/3⌉) rule for the production config. */
  private def probesCte: String =
    if (scaledNprobe) IvfSql.probesCteScaledNp else IvfSql.probesCteWith(nprobe)

  /** The fused ADC scan: codes joined to their coarse cell, restricted
    * to each query's probed cells — the pruning statement itself. */
  private val padFusedCte: String =
    s"""pad AS (
      |  SELECT p.query_id, d.vec_id AS corpus_id,
      |    (${pq.adcNum}) AS num, (${pq.adcDen}) AS den
      |  FROM pcd d JOIN af a ON a.vec_id = d.vec_id
      |       JOIN probes p ON p.cid = a.cid
      |       JOIN plu l ON l.query_id = p.query_id
      |       CROSS JOIN pnl n
      |  WHERE d.vec_id != p.query_id
      |)""".stripMargin

  private val prefixCtes: String =
    s"""WITH ${IvfSql.embCte},
      |$coarseTrain,
      |${pq.trainCtes},
      |${pq.encodeCtes},
      |$probesCte,
      |${IvfSql.assignCte("af", s"cents${IvfSql.Iters}")},
      |$padFusedCte""".stripMargin

  val annIvfPqTop5Sql: String =
    s"""$prefixCtes,
      |${pq.rerankTail}""".stripMargin

  /** The deletion replay (Similarity.ivfPqWrite over the full corpus →
    * ivfPqDelete of some ids → ivfPqQuery): the model trains and encodes
    * over emb exactly like the bulk leg — deletion never retrains — and
    * the ADC scan simply excludes the deleted rows (`keepPred` over the
    * code-table alias `d`), which IS the post-swap lists content since
    * the delete rewrites affected cells to their survivors and touches
    * nothing else. */
  def annIvfPqDeleteTop5SqlOver(keepPred: String): String = {
    val padKept =
      s"""pad AS (
        |  SELECT p.query_id, d.vec_id AS corpus_id,
        |    (${pq.adcNum}) AS num, (${pq.adcDen}) AS den
        |  FROM pcd d JOIN af a ON a.vec_id = d.vec_id
        |       JOIN probes p ON p.cid = a.cid
        |       JOIN plu l ON l.query_id = p.query_id
        |       CROSS JOIN pnl n
        |  WHERE d.vec_id != p.query_id AND ($keepPred)
        |)""".stripMargin
    s"""WITH ${IvfSql.embCte},
      |$coarseTrain,
      |${pq.trainCtes},
      |${pq.encodeCtes},
      |$probesCte,
      |${IvfSql.assignCte("af", s"cents${IvfSql.Iters}")},
      |$padKept,
      |${pq.rerankTail}""".stripMargin
  }

  /** The incremental-index replay (Similarity.ivfPqWrite over a training
    * prefix → ivfPqAppend of the rest → ivfPqQuery): BOTH models — the
    * coarse centroids and the PQ codebooks — train on `trainCteName`
    * ONLY, while the encode, the full-corpus cell assignment, and the
    * probe run over emb. That is exactly the lists the write+append
    * union holds, because the append is a pure encode under the
    * persisted model (deterministic given centroids+codebook), so the
    * incremental path is hash-verified end to end like the bulk one.
    * `trainCte` is the prefix definition the caller pins (it must
    * expose (vec_id, v)). */
  def annIvfPqAppendTop5SqlOver(trainCteName: String, trainCte: String): String =
    s"""WITH ${IvfSql.embCte},
      |$trainCte,
      |${IvfSql.trainCtesOver(trainCteName)},
      |${pq.trainCtesOver(trainCteName)},
      |${pq.encodeCtes},
      |$probesCte,
      |${IvfSql.assignCte("af", s"cents${IvfSql.Iters}")},
      |$padFusedCte,
      |${pq.rerankTail}""".stripMargin

  /** The combined-maintenance replay (ivfPqWrite over a training prefix
    * → fragmenting ivfPqAppend batches → ivfPqMaintain deleting some ids
    * AND compacting in one staging pass): the append replay's
    * prefix-trained models + the delete replay's survivor exclusion,
    * composed — compaction is content-invariant by contract, so the
    * maintained index must probe bit-identically to this text, which is
    * itself the two verified single-purpose replays joined. */
  def annIvfPqMaintainTop5SqlOver(trainCteName: String, trainCte: String,
                                  keepPred: String): String = {
    val padKept =
      s"""pad AS (
        |  SELECT p.query_id, d.vec_id AS corpus_id,
        |    (${pq.adcNum}) AS num, (${pq.adcDen}) AS den
        |  FROM pcd d JOIN af a ON a.vec_id = d.vec_id
        |       JOIN probes p ON p.cid = a.cid
        |       JOIN plu l ON l.query_id = p.query_id
        |       CROSS JOIN pnl n
        |  WHERE d.vec_id != p.query_id AND ($keepPred)
        |)""".stripMargin
    s"""WITH ${IvfSql.embCte},
      |$trainCte,
      |${IvfSql.trainCtesOver(trainCteName)},
      |${pq.trainCtesOver(trainCteName)},
      |${pq.encodeCtes},
      |$probesCte,
      |${IvfSql.assignCte("af", s"cents${IvfSql.Iters}")},
      |$padKept,
      |${pq.rerankTail}""".stripMargin
  }

  /** The measured-recall gate for the fused path: both pruning losses —
    * unprobed cells AND quantized shortlist order — priced against the
    * exact brute-force top-k, per query, at every gated SF. */
  val annIvfPqRecallSql: String =
    s"""$prefixCtes,
      |${pq.rerankCtes},
      |${pq.bfCte},
      |${pq.recallSelect}""".stripMargin
}

/** The default fused generator — emits exactly the pre-parameterization
  * SQL (same CTE text, same constants). */
object IvfPqSql extends IvfPqSqlGen(PqSql, graft.pipeline.Similarity.DefaultNProbe)

/** The quality-tier fused generator: ksub = 64 codewords per subspace,
  * shortlist 256, nprobe 12 — the registered production-recall config
  * (measured recall@5 0.94/0.96 at sf0.01/sf0.1 where the default
  * codebook sits at 0.36–0.50). Same replay discipline: both verified
  * halves composed, every constant compiled from the shared Similarity
  * Hq* values. */
object IvfPqHqSql extends IvfPqSqlGen(PqSqlHq, graft.pipeline.Similarity.HqNProbe)

/** The PRODUCTION-cell-count quality-tier generator: the hq knobs with
  * numCentroids derived from corpus size (max(16, ⌈√n⌉) — computed in
  * SQL by IvfSql.seedCteScaledOver so one oracle text holds at every
  * SF). This is the config that exposed the ×35 Lloyd plan bug at the
  * r15 decade audit — registering it pins cell-count-dependent code to
  * the hash gate, not just the ScaleBench walls. */
object IvfPqHqScaledSql extends IvfPqSqlGen(PqSqlHq,
  graft.pipeline.Similarity.HqNProbe, scaledCells = true)

/** The production config with BOTH data-derived knobs: √n cells AND the
  * nprobe scaling rule max(HqNProbe, ⌈cells/3⌉) (Similarity.scaledNProbe
  * — computed in SQL by IvfSql.probesCteScaledNp over the same ncnt the
  * seed derives). At fixed nprobe the probed fraction decays with corpus
  * size and recall decays with it (0.90/0.86/0.68 across the gated SFs);
  * this generator's paired recall gate prices what the rule buys back at
  * every SF with one oracle text. */
object IvfPqHqScaledNpSql extends IvfPqSqlGen(PqSqlHq,
  graft.pipeline.Similarity.HqNProbe, scaledCells = true, scaledNprobe = true)
