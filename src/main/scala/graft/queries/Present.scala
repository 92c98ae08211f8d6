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
  * those that do would otherwise pay the body twice). */
private[queries] object Present {
  def sortedBarrier(df: DataFrame, keys: String*): DataFrame =
    df.localCheckpoint(eager = false).orderBy(keys.map(col): _*)
}
