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
  * Scale shape: one pass to compute per-column min/max, one range
  * exchange on the z-value, a within-partition sort, and a plain parquet
  * write — the same cost as any global sort of the table. Nothing is
  * collected but the 2·k stat cells.
  */
object Layout {

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
    * cluster, just coarsely). */
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

  /** Write `df` to `path` z-ordered on `zCols`: per-column min/max in
    * one aggregation, a range exchange on the z-value (so files tile the
    * curve), a within-partition sort, and the parquet write — the key
    * itself is dropped before writing (the layout IS the artifact; the
    * footer stats of the original columns carry the skipping).
    * `numFiles <= 0` keeps the session's shuffle parallelism. */
  def zOrderWrite(df: DataFrame, zCols: Seq[String], path: String,
                  bits: Int = 16, numFiles: Int = 0): Unit = {
    val aggs = zCols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val mins = zCols.indices.map(j => if (stats.isNullAt(2 * j)) 0.0 else stats.getDouble(2 * j))
    val maxs = zCols.indices.map(j => if (stats.isNullAt(2 * j + 1)) 0.0 else stats.getDouble(2 * j + 1))
    val z = zValue(zCols.map(col), mins, maxs, bits)
    val keyed = df.withColumn("__zvalue", z)
    val ranged = if (numFiles > 0) keyed.repartitionByRange(numFiles, col("__zvalue"))
                 else keyed.repartitionByRange(col("__zvalue"))
    ranged.sortWithinPartitions("__zvalue")
      .drop("__zvalue")
      .write.mode("overwrite").parquet(path)
  }
}
