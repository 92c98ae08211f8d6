package graft.queries

import graft.functions.TextHashes.{polyA, polyB, PolyP => P}

/** DuckDB replay of the FULL portable IVF pipeline (Similarity.ivfBuild
  * `portableSeed = true` → ivfWrite → ivfQuery): the mod-prime seed order,
  * all three Lloyd refinement steps, the nearest-centroid assignment, the
  * nprobe centroid selection, and the final per-query top-k — so the
  * persisted-index ANN path is hash-verified end to end, not rows-only.
  *
  * Replayability rests on two deliberate design points of the portable
  * mode: (1) the seed hash is plain BIGINT arithmetic (every intermediate
  * < 2^60), and (2) each Lloyd mean is rounded to 6 decimals on BOTH
  * sides, which absorbs the engine-specific fp summation order inside
  * avg() — after the rounding, centroids (and hence every argmax
  * assignment downstream) are value-identical across engines.
  */
object IvfSql {
  // shared with the implementation, not hand-copied: a change to the
  // registered defaults recompiles into this oracle automatically
  private[queries] val Dim = PipelineQueries.EmbDim
  private[queries] val K = graft.pipeline.Similarity.DefaultNumCentroids
  private[queries] val Iters = graft.pipeline.Similarity.DefaultLloydIters
  private[queries] val NProbe = graft.pipeline.Similarity.DefaultNProbe
  private[queries] val TopK = graft.pipeline.Similarity.DefaultTopK
  private[queries] val SampleMod = graft.pipeline.Similarity.DefaultLloydSampleMod

  private[queries] val embCte =
    "emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"

  /** The Lloyd refinement's hash sample (ivfBuild `sampleMod`): keep a
    * vector iff its seed hash ≡ 0 (mod SampleMod). Means are computed on
    * THIS subset; the final assignment (af) still covers every vector. */
  private[queries] def sampCteOver(src: String): String =
    s"""samp AS (
      |  SELECT vec_id, v FROM $src
      |  WHERE ((${polyA(8192L)} * (vec_id % $P) + ${polyB(8192L)}) % $P) % $SampleMod = 0
      |    AND v IS NOT NULL
      |)""".stripMargin
  private[queries] val sampCte = sampCteOver("emb")

  /** cents0: portable-hash-ordered seed of K raw corpus vectors — replays
    * ivfBuild's orderBy(h, sid).limit(K); cid = 1-based collect order. */
  private[queries] def seedCteOver(src: String): String =
    s"""cents0 AS (
      |  SELECT row_number() OVER (ORDER BY h, sid) AS cid, v AS c
      |  FROM (
      |    SELECT (${polyA(8192L)} * (vec_id % $P) + ${polyB(8192L)}) % $P AS h,
      |           vec_id AS sid, v
      |    FROM $src WHERE v IS NOT NULL ORDER BY h, sid LIMIT $K
      |  )
      |)""".stripMargin
  private[queries] val seedCte = seedCteOver("emb")

  /** Nearest-centroid assignment of every `src` vector against `cents`
    * (argmax cosine, ties to the lowest cid — NearestCentroid's first-wins
    * scan order). */
  private[queries] def assignCte(name: String, cents: String, src: String = "emb"): String =
    s"""$name AS (
      |  SELECT vec_id, v, cid FROM (
      |    SELECT e.vec_id, e.v, c.cid,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.cid ASC) AS rn
      |    FROM $src e CROSS JOIN $cents c
      |  ) WHERE rn = 1
      |)""".stripMargin

  /** One Lloyd step: per-(cid, dim) mean rounded to 6 (the portable mode's
    * rounding); a cid that captured no vectors keeps its previous centroid
    * (ivfBuild's means.getOrElse). */
  private[queries] def lloydCte(i: Int): String =
    s"""${assignCte(s"a$i", s"cents${i - 1}", src = "samp")},
      |m$i AS (
      |  SELECT cid, pos, round(avg(v[pos + 1]), 6) + 0.0 AS m
      |  FROM a$i CROSS JOIN range($Dim) t(pos)
      |  GROUP BY cid, pos
      |),
      |cents$i AS (
      |  SELECT p.cid, coalesce(mm.c, p.c) AS c
      |  FROM cents${i - 1} p LEFT JOIN
      |    (SELECT cid, list(m ORDER BY pos) AS c FROM m$i GROUP BY cid) mm
      |    ON mm.cid = p.cid
      |)""".stripMargin

  /** The coarse-quantizer training half — hash sample, portable seed,
    * every Lloyd round — ending at cents$Iters. Shared verbatim with
    * IvfPqSql so the fused oracle replays the IDENTICAL centroids.
    * `src` is the training corpus: emb everywhere except the
    * incremental-index replay, which trains on a prefix CTE
    * (IvfPqSqlGen.annIvfPqAppendTop5SqlOver). */
  private[queries] def trainCtesOver(src: String): String = {
    val lloyds = (1 to Iters).map(lloydCte).mkString(",\n")
    s"""${sampCteOver(src)},
      |${seedCteOver(src)},
      |$lloyds""".stripMargin
  }
  private[queries] val trainCtes: String = trainCtesOver("emb")

  /** cents0 at the DATA-DERIVED cell count max(floor, ⌈√n⌉) — the
    * production rule (Similarity.scaledNumCentroids, one definition)
    * computed IN SQL over the same non-null count the Spark build uses,
    * so ONE oracle text holds at every SF. Same portable seed order as
    * [[seedCteOver]]; only the count differs (a scalar-subquery bound
    * instead of a literal LIMIT). */
  private[queries] def seedCteScaledOver(src: String): String =
    s"""ncnt AS (
      |  SELECT greatest(${graft.pipeline.Similarity.ScaledMinCentroids},
      |    CAST(ceil(sqrt(count(*))) AS BIGINT)) AS k
      |  FROM $src WHERE v IS NOT NULL
      |),
      |cents0 AS (
      |  SELECT cid, c FROM (
      |    SELECT row_number() OVER (ORDER BY h, sid) AS cid, v AS c
      |    FROM (
      |      SELECT (${polyA(8192L)} * (vec_id % $P) + ${polyB(8192L)}) % $P AS h,
      |             vec_id AS sid, v
      |      FROM $src WHERE v IS NOT NULL
      |    )
      |  ) WHERE cid <= (SELECT k FROM ncnt)
      |)""".stripMargin

  /** [[trainCtesOver]] with the scaled seed — the coarse half of the
    * ann_ivfpq_hq_scaled_* oracles. */
  private[queries] val trainCtesScaled: String = {
    val lloyds = (1 to Iters).map(lloydCte).mkString(",\n")
    s"""${sampCteOver("emb")},
      |${seedCteScaledOver("emb")},
      |$lloyds""".stripMargin
  }

  /** nprobe nearest centroids per query (the `vec_id < 10` batch) —
    * argmax cosine with ties to the lowest cid, exactly ivfProbe's
    * window. Shared with IvfPqSql. */
  private[queries] val probesCte: String = probesCteWith(NProbe)

  /** The probe CTE at the DATA-DERIVED nprobe max(HqNProbe, ⌈k/3⌉)
    * (Similarity.scaledNProbe, one definition) — the rn bound is a
    * scalar subquery over the same `ncnt` cell count the scaled seed
    * derives, so ONE oracle text prices the scaling rule at every SF.
    * Only valid alongside [[seedCteScaledOver]] (ncnt must be in
    * scope). */
  private[queries] val probesCteScaledNp: String =
    s"""probes AS (
      |  SELECT query_id, qv, cid FROM (
      |    SELECT q.vec_id AS query_id, q.v AS qv, c.cid,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_cosine_similarity(q.v, c.c) DESC, c.cid ASC) AS rn
      |    FROM emb q CROSS JOIN cents$Iters c WHERE q.vec_id < 10
      |  ) WHERE rn <= (SELECT greatest(${graft.pipeline.Similarity.HqNProbe},
      |    CAST(ceil(k / 3.0) AS BIGINT)) FROM ncnt)
      |)""".stripMargin

  /** The same probe CTE at a caller-chosen nprobe (the HQ leg's knob). */
  private[queries] def probesCteWith(nprobe: Int): String =
    s"""probes AS (
      |  SELECT query_id, qv, cid FROM (
      |    SELECT q.vec_id AS query_id, q.v AS qv, c.cid,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_cosine_similarity(q.v, c.c) DESC, c.cid ASC) AS rn
      |    FROM emb q CROSS JOIN cents$Iters c WHERE q.vec_id < 10
      |  ) WHERE rn <= $nprobe
      |)""".stripMargin

  val annIvfTop5Sql: String = {
    s"""WITH $embCte,
      |$trainCtes,
      |$probesCte,
      |${assignCte("af", s"cents$Iters")},
      |s AS (
      |  SELECT p.query_id, a.vec_id AS corpus_id,
      |    list_cosine_similarity(p.qv, a.v) AS cos
      |  FROM probes p JOIN af a ON a.cid = p.cid
      |  WHERE a.vec_id != p.query_id
      |),
      |r AS (
      |  SELECT query_id, corpus_id, cos,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC) AS rnk
      |  FROM s
      |)
      |SELECT query_id, corpus_id, round(cos, 6) + 0.0 AS cosine, CAST(rnk AS INTEGER) AS rank
      |FROM r WHERE rnk <= $TopK ORDER BY query_id, rank""".stripMargin
  }
}
