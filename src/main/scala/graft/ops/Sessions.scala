package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization over an event log — the classic gap rule: within
  * a user, a new session starts when the time since the previous event
  * exceeds `gapSec` (web-analytics default 30 min). The batch twin of the
  * streaming sessionization in `graft.streaming.StreamingOps`, and the
  * aggregation a pipeline runs to turn raw interaction logs into
  * conversation/session training units.
  *
  * Mechanics: one window over (user, ts, event_id) marks session starts
  * (`lag` gap test), a running sum assigns the per-user session index,
  * and a groupBy rolls sessions up. Timestamps compare as exact epoch
  * microseconds (`unix_micros`), never as floats.
  *
  * Shape at 100 TB: ONE exchange — the window partitions by user, and
  * the session rollup groups on (user, session_id), which hash
  * partitioning on user already clusters, so Catalyst reuses the window's
  * exchange (asserted in PlanSpec). Skew bound: one user's event count.
  */
object Sessions {

  /** Roll an event log `(user_id, event_id, ts, value, …)` into sessions:
    * `(user_id, session_id, n_events, start_us, end_us, duration_us,
    * peak_value)`. `session_id` counts from 1 per user in time order. */
  def sessionize(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    require(gapSec > 0, s"session gap must be positive: $gapSec")
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val gapUs = gapSec * 1000000L
    val marked = events
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("new_sess",
        when(lag(col("ts_us"), 1).over(w).isNull
          || col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy(col("user_id"), col("session_id")).agg(
      count(lit(1)).as("n_events"),
      min(col("ts_us")).as("start_us"),
      max(col("ts_us")).as("end_us"),
      (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
      max(col("value")).as("peak_value"))
  }

  /** Two-step conversion funnel over the event log: for every user with
    * a `fromType` event, the first `toType` event at-or-after their
    * first `fromType`, and whether it arrived within `windowSec`
    * (classic signup→purchase conversion). Exact epoch-microsecond
    * arithmetic throughout.
    *
    * Shape: a per-user window pins the first `fromType` timestamp, the
    * rollup groups on the same user key — hash partitioning on user
    * satisfies both, so the plan carries ONE exchange (the sessionize
    * discipline, asserted in PlanSpec). Skew bound: one user's events. */
  def conversionFunnel(events: DataFrame, fromType: String, toType: String,
                       windowSec: Long): DataFrame = {
    require(windowSec > 0, s"conversion window must be positive: $windowSec")
    val w = Window.partitionBy("user_id")
    val withFrom = events
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("from_us",
        min(when(col("event_type") === fromType, col("ts_us"))).over(w))
      .filter(col("from_us").isNotNull)
    withFrom.groupBy(col("user_id")).agg(
        min(col("from_us")).as("from_us"),
        min(when(col("event_type") === toType
              && col("ts_us") >= col("from_us"), col("ts_us"))).as("to_us"))
      .withColumn("converted",
        coalesce(col("to_us") - col("from_us") <= windowSec * 1000000L,
          lit(false)))
  }
}
