package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Presentation-sort lineage barrier shared by the query registrations
  * (r18). Every registered query orders its output for the driver's
  * row-order-sensitive hash, but a global sort's RangePartitioning
  * SAMPLES its child in a separate pass — re-executing everything
  * between the last materialization point and the sort. For a
  * scan-stage body that is the whole query; for a window / typed
  * flatMapGroups body it is the whole post-shuffle stage (the kernel
  * compute — only the exchange's map side is reused via shuffle files).
  * `localCheckpoint(eager = false)` materializes the body's partitions
  * on first use, so the sampler and the sort shuffle read stored
  * blocks instead of recomputing. Rows, their order (partition layout
  * and intra-partition order are preserved, so ties sort identically)
  * and the noop-materialize semantics are unchanged.
  *
  * 100 TB reading: one materialization of the OUTPUT in exchange for
  * not re-running the body — and only on sorts that exist for
  * presentation (the align(sorted = false) doctrine: production
  * consumers that don't need row order should skip the sort entirely;
  * those that do would otherwise pay the body twice). The trade is
  * explicit: the checkpoint truncates lineage, so an executor lost
  * AFTER the barrier materializes fails the query instead of
  * recomputing it — presentation sorts are for bounded outputs a
  * driver consumes; unbounded consumers take the unsorted leg.
  *
  * The blocks are freed deterministically (r19): each barrier frame is
  * tracked here and [[releaseBarriers]] unpersists it once its query's
  * output is materialized — otherwise a long sweep pins every query's
  * full output in block-manager storage until GC, and storage competes
  * with execution memory (guide §5 "unpersist when done"; the r18
  * sweeps' WARN churn and in-sweep stall inflation). */
object Present {
  private val liveBarriers =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  def sortedBarrier(df: DataFrame, keys: String*): DataFrame = {
    val cp = df.localCheckpoint(eager = false)
    liveBarriers.add(cp)
    cp.orderBy(keys.map(col): _*)
  }

  /** Free every live barrier's storage blocks. Call ONLY between
    * queries (harness loop / after an oracle collect): the lineage is
    * truncated, so a freed barrier cannot recompute — any later scan of
    * the same DataFrame object throws. Each registration call builds a
    * fresh barrier, so re-running a query after release is safe. */
  def releaseBarriers(): Unit = {
    var df = liveBarriers.poll()
    while (df != null) {
      df.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false): Unit
        case _ =>
      }
      df = liveBarriers.poll()
    }
  }
}
