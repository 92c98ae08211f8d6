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
        // assumption instead of OOMing opaquely: beyond this bound, run the
        // kernel's step form through overSeriesChunked (state carried
        // across bounded chunks — same results, bounded working set), or
        // use the streaming layer / coarser bars.
        require(rows.length <= MaxRowsPerSeries,
          s"series '$sym' has ${rows.length} rows (> $MaxRowsPerSeries); " +
            "use SeriesOps.overSeriesChunked (or overSeriesAuto) with the " +
            "kernel's Chunked.StepKernel form for unbounded series")
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

  /** Chunked-state executor for UNBOUNDED series: the same per-series
    * recurrence as [[overSeries]], but one task never materializes more
    * than `chunkRows` rows of a series. The kernel's scan state
    * ([[Chunked.StepKernel]] — the loop variables of the array kernel) is
    * carried across chunk boundaries the way the streaming twins carry it
    * across micro-batches, so outputs are bit-identical to `overSeries`
    * (parity-pinned in ChunkedSpec).
    *
    * Execution shape (the 100 TB story):
    *   1. one pass assigns each row its per-series chunk index
    *      (`(row_number − 1) div chunkRows` — the row_number window is a
    *      streaming running count, spill-backed, never an in-memory
    *      materialization) and writes the corpus to scratch parquet
    *      partitioned by chunk;
    *   2. chunks are processed IN ORDER, each as one partition-pruned read
    *      (only chunk k's files are touched — the same pruning the
    *      persisted IVF index rides) + one flatMapGroups in which every
    *      series steps its `≤ chunkRows` rows from the broadcast state;
    *   3. each pass emits its output rows plus one tiny state row per
    *      series; the states (O(numSeries · stateSize) doubles) are
    *      collected and broadcast into the next pass.
    *
    * Total I/O = one corpus write + one partitioned read, regardless of
    * chunk count; driver traffic is only the per-series state vectors.
    * Within a series the recurrence is inherently sequential, so chunk
    * passes cannot overlap — parallelism comes from series × chunk-local
    * row processing, exactly like `overSeries`, with memory decoupled
    * from series length.
    *
    * `ord` must be unique per series (same contract as overSeries: ties
    * would make the scan order ambiguous).
    */
  def overSeriesChunked(df: DataFrame, in: Seq[String], out: Seq[String],
                        kernel: Chunked.StepKernel, chunkRows: Int,
                        scratchDir: Option[String] = None): DataFrame = {
    require(chunkRows > 0, "chunkRows must be positive")
    require(kernel.numInputs == in.length && kernel.numOutputs == out.length,
      s"kernel is ${kernel.numInputs}→${kernel.numOutputs}, got ${in.length}→${out.length} columns")
    val spark = df.sparkSession
    val carried = in.distinct
    val inIdx = in.map(c => carried.indexOf(c) + 2).toArray
    val proj = df.select(
      col("symbol").cast(StringType) +:
      col("ord").cast(LongType) +:
      carried.map(c => col(c).cast(DoubleType)): _*)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("symbol").orderBy("ord")
    val scratch = scratchDir.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_chunked_").toString)
    proj.withColumn("__chunk",
        ((row_number().over(w) - 1) / chunkRows).cast(IntegerType))
      .write.mode("overwrite").partitionBy("__chunk").parquet(scratch)
    val staged = spark.read.parquet(scratch)
    val chunkIds = staged.select("__chunk").distinct()
      .collect().map(_.getInt(0)).sorted
    val outSchema = StructType(
      StructField("symbol", StringType) ::
      StructField("ord", LongType) ::
      (carried.toList ++ out.toList).map(StructField(_, DoubleType)) :::
      StructField("__state", ArrayType(DoubleType)) :: Nil)
    var states = Map.empty[String, Array[Double]]
    val parts = chunkIds.map { k =>
      val bc = spark.sparkContext.broadcast(states)
      val res = staged.where(col("__chunk") === k)
        .select("symbol", ("ord" +: carried): _*)   // __chunk pruned at the source
        .groupByKey(_.getString(0))(Encoders.STRING)
        .flatMapGroups { (sym: String, it: Iterator[Row]) =>
          val rows = it.toArray
          java.util.Arrays.sort(rows, Ordering.by((r: Row) => r.getLong(1)))
          val st = bc.value.get(sym).map(_.clone()).getOrElse(kernel.init())
          val inBuf = new Array[Double](inIdx.length)
          val dataRows = rows.iterator.map { r =>
            var j = 0
            while (j < inIdx.length) {
              inBuf(j) = if (r.isNullAt(inIdx(j))) Double.NaN else r.getDouble(inIdx(j))
              j += 1
            }
            val o = kernel.step(st, inBuf)
            Row.fromSeq(
              sym +: r.getLong(1) +:
              (carried.indices.map(c => if (r.isNullAt(c + 2)) null else r.getDouble(c + 2)) ++
               o.indices.map(c => if (java.lang.Double.isNaN(o(c))) null else o(c)) ++
               Seq(null)))
          }
          dataRows ++ Iterator.single(Row.fromSeq(
            sym +: 0L +: Seq.fill(carried.length + out.length)(null) :+ st.toSeq))
        }(Encoders.row(outSchema))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      states = states ++ res.where(col("__state").isNotNull)
        .select("symbol", "__state").collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1).toArray)
      res.where(col("__state").isNull).drop("__state")
    }
    if (parts.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(outSchema.dropRight(1)))
    else parts.reduce(_.union(_))
  }

  /** Size-aware dispatch: run the whole-series executor when every series
    * fits one task's working set, otherwise fall back to the chunked-state
    * path. The sizing probe is one partial-aggregated count per series —
    * cheap next to the recurrence itself, and only paid when the caller
    * opts into auto mode. */
  def overSeriesAuto(df: DataFrame, in: Seq[String], out: Seq[String],
                     kernel: Chunked.StepKernel,
                     maxRows: Int = MaxRowsPerSeries,
                     chunkRows: Int = 10_000_000,
                     scratchDir: Option[String] = None)
                    (f: Array[Array[Double]] => Array[Array[Double]]): DataFrame = {
    val longest = df.groupBy("symbol").count()
      .agg(max("count")).head().getLong(0)
    if (longest <= maxRows) overSeries(df, in, out)(f)
    else overSeriesChunked(df, in, out, kernel, chunkRows, scratchDir)
  }
}
