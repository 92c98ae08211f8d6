package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the canonical event-stream grouping: a
  * user's events belong to one session while consecutive gaps stay
  * within `gapNanos`; a larger gap opens a new session.
  *
  * One window per user (lag for the gap test, running sum for the
  * session number) — a single hash exchange on the user key, the same
  * shape as the packing offsets. Parallelism is user-count, which is
  * unbounded at scale; session numbering is per-user so no global
  * coordination exists. Timestamps are raw int64 nanos (Tables.eventsNs
  * normalizes whatever unit the parquet writer chose), so all arithmetic
  * is integral and a SQL oracle replays it exactly.
  */
object Sessions {

  /** Tag every event with its (per-user, 1-based) `session_id`. Ordering
    * within a user is (ts, ordCol) — the tiebreaker makes the fold
    * deterministic under equal timestamps. */
  def sessionize(events: DataFrame, gapNanos: Long, userCol: String = "user_id",
                 tsCol: String = "ts", ordCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol, ordCol)
    val prev = lag(col(tsCol), 1).over(w)
    val opens: Column = when(prev.isNull || col(tsCol) - prev > gapNanos, 1L).otherwise(0L)
    events.withColumn("session_id",
      sum(opens).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** One row per session: event count, first/last event time, duration. */
  def sessionStats(events: DataFrame, gapNanos: Long, userCol: String = "user_id",
                   tsCol: String = "ts", ordCol: String = "event_id"): DataFrame =
    sessionize(events, gapNanos, userCol, tsCol, ordCol)
      .groupBy(userCol, "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ns"), max(col(tsCol)).as("end_ns"))
      .withColumn("duration_ns", col("end_ns") - col("start_ns"))
}
