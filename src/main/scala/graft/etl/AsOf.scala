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
    val matchedCol = "matched_" + timeCol
    val clash = (vcols :+ matchedCol).toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"asofJoin: output columns ${clash.mkString(", ")} already exist on the left " +
        "(rename before joining, e.g. when chaining asofJoins)")
    require(!vcols.contains(matchedCol),
      s"asofJoin: a right value column may not be named $matchedCol")

    // the whole right ROW rides as one struct: last(ignoreNulls) then picks
    // the latest right row ATOMICALLY — a NULL inside a value column stays
    // the matched row's NULL (DuckDB ASOF semantics) instead of being
    // skipped back to an older row's value, and multiple value columns can
    // never come from different rows
    val rowCol = "__asof_row"
    val l = left.withColumn("__tag", lit(1))
    val r = right.select(col(byCol), col(timeCol),
        struct(col(timeCol).as(matchedCol) +: vcols.map(col): _*).as(rowCol))
      .withColumn("__tag", lit(0))
    // right rows order before left rows at the same time (tag 0 < 1), so
    // an equal-time quote is visible to the trade — ASOF's `<=`
    val w = Window.partitionBy(byCol).orderBy(col(timeCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = last(col(rowCol), ignoreNulls = true).over(w)
    // a match older than the tolerance is no match at all
    val gatedMatch = tolerance match {
      case Some(tol) => when(col(timeCol) - matched(matchedCol) <= tol, matched)
      case None => matched
    }
    l.unionByName(r, allowMissingColumns = true)
      .select(left.columns.map(col) :+ col("__tag") :+ gatedMatch.as(rowCol): _*)
      .where(col("__tag") === 1)
      .select(left.columns.map(col) ++
        vcols.map(c => col(s"$rowCol.$c").as(c)) :+
        col(s"$rowCol.$matchedCol").as(matchedCol): _*)
  }
}
