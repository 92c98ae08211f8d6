package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional storage layout: Z-ORDER clustering for parquet.
  *
  * A single-column sort makes parquet row-group min/max stats selective
  * for THAT column only — a 100 TB events table sorted by time answers
  * time ranges with a sliver of IO but scans everything for a
  * (user, time-range) lookup, because every row group spans every user.
  * Z-ordering interleaves the bits of several columns into one sort key,
  * so rows near each other on EVERY dimension land in the same row
  * groups and the footer stats of all interleaved columns become
  * selective at once (the Morton-curve layout every lakehouse OPTIMIZE
  * implements; Spark itself has no native z-order — this is the
  * pure-Column construction, fully codegen'd, no UDF).
  *
  * Scale shape: one pass to compute per-column stats (skippable — see
  * [[ZStats]]), one range exchange on the z-value, a within-partition
  * sort, and a plain parquet write — the same cost as any global sort of
  * the table. Nothing is collected but the stat cells and, for string
  * dimensions, a bounded dictionary.
  */
object Layout {

  /** Per-column scaling state for [[zValue]]/[[zOrderWrite]]: numeric
    * columns carry (min, max); STRING columns carry a sorted-order
    * dictionary (value → 0-based rank, lexicographic, so prefix-adjacent
    * values land in adjacent cells) and scale over [0, size−1]. Stats
    * from a PREVIOUS snapshot are explicitly fine — out-of-range numerics
    * clamp to the edge cells and unseen strings encode null → cell 0;
    * they cluster, just coarsely — which is what makes the single-scan
    * write ([[zOrderWrite]]'s `stats` argument) safe for derived
    * pipelines whose input is expensive to scan twice. */
  final case class ZStats(mins: Seq[Double], maxs: Seq[Double],
                          dicts: Seq[Option[Map[String, Int]]]) {
    require(mins.length == maxs.length && mins.length == dicts.length,
      "ZStats: mins/maxs/dicts must be parallel")
  }

  /** Compute [[ZStats]] for `zCols` of `df`: one aggregation for every
    * numeric column's min/max, plus one bounded distinct-collect per
    * string column (capped at `maxDict` values — z-order string keys are
    * low-cardinality dimensions like lang/source/type by design; a
    * high-cardinality string belongs in a hash or truncation first).
    * Persist the result alongside a table snapshot to make every later
    * [[zOrderWrite]] single-scan. */
  def zStats(df: DataFrame, zCols: Seq[String], maxDict: Int = 65536): ZStats = {
    val isStr = zCols.map(c =>
      df.schema(c).dataType == org.apache.spark.sql.types.StringType)
    val dicts = zCols.zip(isStr).map {
      case (c, true) =>
        val vals = df.select(col(c)).where(col(c).isNotNull)
          .distinct().orderBy(col(c)).limit(maxDict + 1)
          .collect().map(_.getString(0))
        require(vals.length <= maxDict,
          s"zStats: string column $c exceeds $maxDict distinct values — " +
          "dictionary-encoded z-order is for low-cardinality dimensions; " +
          "hash or truncate the column first")
        Some(vals.zipWithIndex.toMap)
      case _ => None
    }
    val numIdx = zCols.indices.filterNot(isStr)
    val numStats: Map[Int, (Double, Double)] =
      if (numIdx.isEmpty) Map.empty
      else {
        val aggs = numIdx.flatMap(j =>
          Seq(min(col(zCols(j))).cast("double"), max(col(zCols(j))).cast("double")))
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        numIdx.zipWithIndex.map { case (j, i) =>
          j -> (if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i),
                if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1))
        }.toMap
      }
    ZStats(
      zCols.indices.map(j => dicts(j).map(_ => 0.0).getOrElse(numStats(j)._1)),
      zCols.indices.map(j => dicts(j).map(d => math.max(d.size - 1, 1).toDouble)
        .getOrElse(numStats(j)._2)),
      dicts)
  }

  /** The z-value (Morton code) of `cols` as ONE Column: each column is
    * min/max-scaled to a `bits`-bit integer (clamped; nulls → 0) and the
    * bits interleave LSB-first — bit i of column j lands at position
    * i·n + j, so the code orders by the interleaved prefix exactly like
    * the textbook construction. Pure bitwise Columns (shift/and/or), so
    * the whole key codegens into the scan projection.
    *
    * `bits · cols.length` must fit a signed long (≤ 63). The min/max
    * scaling is the caller's contract: stats from a PREVIOUS snapshot
    * are fine (new out-of-range values clamp to the edge cells — they
    * cluster, just coarsely). String dimensions enter through the
    * dictionary front ([[zStats]] / the `dicts` overload below). */
  def zValue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
             bits: Int): Column = {
    val n = cols.length
    require(n > 0 && bits > 0 && n * bits <= 63,
      s"zValue: need 0 < cols*bits <= 63, got $n cols x $bits bits")
    val cells = (1L << bits).toDouble
    val scaled = cols.zipWithIndex.map { case (c, j) =>
      val lo = mins(j)
      val span = math.max(maxs(j) - lo, java.lang.Double.MIN_VALUE)
      least(greatest(
          floor((coalesce(c.cast("double"), lit(lo)) - lit(lo)) / lit(span) * lit(cells)),
          lit(0.0)),
        lit(cells - 1.0)).cast("long")
    }
    (0 until bits).flatMap { i =>
      scaled.zipWithIndex.map { case (s, j) =>
        shiftleft(shiftright(s, i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** [[zValue]] over mixed numeric + string dimensions: string columns
    * pass through their [[ZStats]] dictionary (value → lexicographic
    * rank; unseen or null values → null → cell 0) and then scale like
    * any numeric. The map lookup is a literal `element_at` — still a
    * pure codegen'd expression, no UDF. */
  def zValueWith(cols: Seq[Column], stats: ZStats, bits: Int): Column = {
    val encoded = cols.zip(stats.dicts).map {
      case (c, Some(dict)) =>
        if (dict.isEmpty) lit(null).cast("int")
        else element_at(typedLit(dict), c)
      case (c, None) => c
    }
    zValue(encoded, stats.mins, stats.maxs, bits)
  }

  /** Write `df` to `path` z-ordered on `zCols` (numeric AND/OR string —
    * strings dictionary-encode through [[zStats]]): per-column stats in
    * one pass (SKIPPED when the caller supplies `stats`, making the
    * whole write single-scan — the derived-pipeline posture), a range
    * exchange on the z-value (so files tile the curve), a
    * within-partition sort, and the parquet write — the key itself is
    * dropped before writing (the layout IS the artifact; the footer
    * stats of the original columns carry the skipping).
    * `numFiles <= 0` keeps the session's shuffle parallelism. */
  def zOrderWrite(df: DataFrame, zCols: Seq[String], path: String,
                  bits: Int = 16, numFiles: Int = 0,
                  stats: Option[ZStats] = None): Unit =
    zOrderedFrame(df, zCols, bits, numFiles, stats)
      .write.mode("overwrite").parquet(path)

  /** Append an INCREMENT to an existing z-ordered layout — the
    * incremental OPTIMIZE a daily partition needs: the new rows
    * curve-order among themselves under the SNAPSHOT's stats (pass the
    * `ZStats` persisted at layout time — out-of-range values clamp, the
    * documented trade) and land as new files beside the resident ones,
    * which never rewrite. Each file set tiles the curve independently,
    * so footer-stat skipping still prunes within every set; what
    * accumulates is files per curve tile, not lost selectivity —
    * re-cluster with a fresh [[zOrderWrite]] when file counts decay
    * reads (the ivfPqCompact posture). */
  def zOrderAppend(df: DataFrame, zCols: Seq[String], path: String,
                   stats: ZStats, bits: Int = 16, numFiles: Int = 0): Unit =
    zOrderedFrame(df, zCols, bits, numFiles, Some(stats))
      .write.mode("append").parquet(path)

  private def zOrderedFrame(df: DataFrame, zCols: Seq[String], bits: Int,
                            numFiles: Int, stats: Option[ZStats]): DataFrame = {
    val st = stats.getOrElse(zStats(df, zCols))
    val z = zValueWith(zCols.map(col), st, bits)
    val keyed = df.withColumn("__zvalue", z)
    val ranged = if (numFiles > 0) keyed.repartitionByRange(numFiles, col("__zvalue"))
                 else keyed.repartitionByRange(col("__zvalue"))
    ranged.sortWithinPartitions("__zvalue").drop("__zvalue")
  }
}
