package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the standard event-stream primitive for
  * behavioral features and training-data windowing: consecutive events of
  * an entity belong to one session until the inter-event gap exceeds
  * `gapSeconds`.
  *
  * One shuffle end to end: the lag, the boundary flag, and the running
  * boundary count (= session index) all ride a single window partitioning
  * on the entity; session_id is `(entity, session_idx)` — derivable
  * without a second pass or a join. The streaming analog is
  * `session_window` in StreamingIngest-style aggregations; this is the
  * batch/backfill formulation whose output an oracle can replay exactly.
  */
object Sessionize {

  /** Adds `session_idx` (0-based per entity) and `gap_s` (seconds since
    * the entity's previous event; 0 for the first). Ties on the
    * timestamp are broken by `tieCol` for determinism. */
  def assign(events: DataFrame, entityCol: String, tsCol: String,
             tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("gap_s",
        coalesce(unix_timestamp(col(tsCol)) -
          lag(unix_timestamp(col(tsCol)), 1).over(w), lit(0L)))
      .withColumn("session_idx",
        sum(when(col("gap_s") > gapSeconds, 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session aggregates: event count, span in seconds, first/last
    * event time. Groups on (entity, session_idx) — the partial
    * aggregation is map-side combined; with [[assign]]'s window already
    * partitioned on the entity, AQE coalesces the second exchange. */
  def sessions(events: DataFrame, entityCol: String, tsCol: String,
               tieCol: String, gapSeconds: Long): DataFrame =
    assign(events, entityCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(entityCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .as("span_s"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
}
