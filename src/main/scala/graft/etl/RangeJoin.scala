package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Points-to-intervals range join — `point ∈ [start, end]` — as a BUCKETED
  * equi-join instead of a range predicate.
  *
  * Why: Spark executes a bare `p.t BETWEEN i.s AND i.e` join (plus an
  * equality on `by`) as a join on the equi-key only, filtering the range
  * afterwards — every point meets every interval of its group first. The
  * bucket decomposition makes the join key (by, bucket): each interval
  * explodes into the `⌈len/W⌉ + 1` fixed-width buckets it overlaps, each
  * point hashes to exactly ONE bucket, and the equi-join + exact BETWEEN
  * filter touches only same-bucket pairs. Because a point owns a single
  * bucket, every qualifying (interval, point) pair is emitted EXACTLY
  * once — no distinct needed. Shuffle volume is O(points + intervals ·
  * spans); worst-case work per bucket is bounded by bucket occupancy, not
  * group size.
  *
  * `bucketWidth` tunes the trade: wider buckets = fewer interval copies
  * but more non-matching pairs filtered per bucket. A good default is the
  * typical interval length.
  */
object RangeJoin {

  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, startCol: String, endCol: String,
                byCol: String = "symbol", bucketWidth: Long = 16L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket", floor(col(pointCol) / bucketWidth))
    // explicit step 1: a malformed interval (end < start) then raises
    // Spark's illegal-sequence-boundaries error loudly instead of silently
    // generating a DESCENDING bucket list (the default step is sign-
    // inferred) whose rows all die in the BETWEEN filter after shuffling
    val i = intervals.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth), lit(1L))))
    i.join(p, Seq(byCol, "__bucket"))
      .where(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }
}
