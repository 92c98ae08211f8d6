package graft.ta

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic distributed executor for per-series recurrence kernels.
  *
  * `overSeries` groups the frame by `symbol`, sorts each group by `ord`,
  * hands the input columns to an array kernel, and emits
  * `(symbol, ord, outCols…)` rows. This is the idiomatic Spark shape for
  * order-dependent state machines (SURVEY.md §7.2): one shuffle on the
  * series key, then embarrassingly parallel sequential folds.
  *
  * Scale: one series' full history is materialized on one executor —
  * correct for daily/bar-level data (thousands of rows per key, millions of
  * keys on a cluster). For tick-scale series that exceed executor memory,
  * the documented hardening path is `repartitionByRange(symbol, ord)` +
  * `mapPartitions` with carried state across chunk boundaries.
  */
object SeriesOps {

  /** Hard cap on rows materialized per series inside one task (~50M rows
    * ≈ a few GB of doubles — a comfortable executor working set). */
  val MaxRowsPerSeries: Int = 50_000_000

  /** @param df   input with `symbol` (string), `ord` (castable to long) and `in` numeric columns
    * @param in   input column names fed to the kernel (cast to double; null → NaN)
    * @param out  output column names
    * @param f    kernel: per-series column arrays → output column arrays (NaN → null)
    *
    * Input columns are CARRIED THROUGH to the output (distinct names, in
    * order), so computing an indicator does not force a join back to the
    * source frame — the round-1 design cost k shuffles + k joins for k
    * indicators; this costs one shuffle total and zero joins.
    */
  def overSeries(df: DataFrame, in: Seq[String], out: Seq[String])
                (f: Array[Array[Double]] => Array[Array[Double]]): DataFrame = {
    val carried = in.distinct
    val proj = df.select(
      col("symbol").cast(StringType) +:
      col("ord").cast(LongType) +:
      carried.map(c => col(c).cast(DoubleType)): _*)
    val outSchema = StructType(
      StructField("symbol", StringType) ::
      StructField("ord", LongType) ::
      (carried.toList ++ out.toList).map(StructField(_, DoubleType)))
    val inIdx = in.map(c => carried.indexOf(c) + 2)
    proj
      .groupByKey(_.getString(0))(Encoders.STRING)
      .flatMapGroups { (sym: String, it: Iterator[Row]) =>
        val rows = it.toArray
        // One series' history is materialized on one executor. Guard the
        // assumption instead of OOMing opaquely: beyond this bound, use the
        // streaming layer (graft.streaming — state machines carry across
        // chunks) or pre-aggregate to coarser bars.
        require(rows.length <= MaxRowsPerSeries,
          s"series '$sym' has ${rows.length} rows (> $MaxRowsPerSeries); " +
            "use graft.streaming state machines or coarser bars for unbounded series")
        java.util.Arrays.sort(rows, Ordering.by((r: Row) => r.getLong(1)))
        val ins = inIdx.toArray.map { j =>
          Array.tabulate(rows.length) { i =>
            if (rows(i).isNullAt(j)) Double.NaN else rows(i).getDouble(j)
          }
        }
        val outs = f(ins)
        require(outs.length == out.length, s"kernel returned ${outs.length} cols, expected ${out.length}")
        rows.indices.iterator.map { i =>
          Row.fromSeq(
            sym +: rows(i).getLong(1) +:
            (carried.indices.map(j => if (rows(i).isNullAt(j + 2)) null else rows(i).getDouble(j + 2)) ++
             outs.indices.map(j => if (java.lang.Double.isNaN(outs(j)(i))) null else outs(j)(i))))
        }
      }(Encoders.row(outSchema))
  }
}
