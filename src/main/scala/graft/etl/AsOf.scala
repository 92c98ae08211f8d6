package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the quotes-to-trades primitive Spark lacks
  * natively: for each left row, attach the LATEST right row with
  * `right.time <= left.time` in the same `by` group (equality matches;
  * rows with no earlier right row get nulls, like a left join).
  *
  * Spark-first composition instead of a custom physical operator: tag the
  * two inputs, union them, and forward-fill the right-side value columns
  * over one (by, time, tag) window — right rows sort before left rows at
  * equal time, so the running `last(ignoreNulls)` seen AT a left row is
  * exactly the as-of match. ONE shuffle on `by` total, O(n log n) in each
  * group, no range cross-product — survives any corpus size where a
  * per-group sort does. (An equivalent formulation with a range join
  * would explode: every left row would pair with EVERY earlier right row
  * before aggregation.)
  *
  * Correctness is driver-verified against DuckDB's NATIVE `ASOF LEFT
  * JOIN` — an independent implementation of the same semantics, not a
  * replay of this one (queries/EtlQueries `asof_join`).
  *
  * Contract: right rows must be unique per (by, time) — with duplicates
  * the chosen row is undefined (same as DuckDB's ASOF). `tolerance`
  * (same unit as `timeCol`) nulls out matches older than
  * `left.time - tolerance`.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame,
               timeCol: String = "ord", byCol: String = "symbol",
               valueCols: Seq[String] = Seq.empty,
               tolerance: Option[Long] = None): DataFrame = {
    val vcols = if (valueCols.nonEmpty) valueCols
      else right.columns.filterNot(c => c == timeCol || c == byCol).toSeq
    require(vcols.nonEmpty, "asofJoin: right side has no value columns")
    val clash = vcols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"asofJoin: value columns ${clash.mkString(", ")} already exist on the left")

    val rTime = "__asof_rt"
    val l = left.withColumn("__tag", lit(1))
    val r = right.select((col(byCol) +: col(timeCol) +:
        col(timeCol).as(rTime) +: vcols.map(col)): _*)
      .withColumn("__tag", lit(0))
    // right rows order before left rows at the same time (tag 0 < 1), so
    // an equal-time quote is visible to the trade — ASOF's `<=`
    val w = Window.partitionBy(byCol).orderBy(col(timeCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filledCols = vcols.map(c => last(col(c), ignoreNulls = true).over(w).as(c))
    val matchedAt = last(col(rTime), ignoreNulls = true).over(w).as(rTime)
    val filled = l.unionByName(r, allowMissingColumns = true)
      .select((left.columns.map(col) :+ col("__tag")) ++ filledCols :+ matchedAt: _*)
      .where(col("__tag") === 1)
    val gated = tolerance match {
      case Some(tol) =>
        // a match older than the tolerance is no match at all
        val stale = col(rTime).isNull || (col(timeCol) - col(rTime) > tol)
        filled.select(left.columns.map(col) ++
          vcols.map(c => when(stale, lit(null)).otherwise(col(c)).as(c)) :+
          when(stale, lit(null)).otherwise(col(rTime)).as(rTime): _*)
      case None => filled.drop("__tag")
    }
    gated.withColumnRenamed(rTime, "matched_" + timeCol)
  }
}
