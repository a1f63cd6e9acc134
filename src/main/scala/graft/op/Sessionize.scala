package graft.op

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gap-based event sessionization — the standard events-table operator
  * for behavioral pipelines: consecutive events of a user closer than
  * `gap` belong to one session.
  *
  * Uses Spark's native `session_window` (merged-interval semantics,
  * identical to lag/cumulative-flag assignment over per-user time
  * order), which works unchanged over batch and Structured Streaming
  * inputs — streaming gets watermark-driven state cleanup for free.
  */
object Sessionize {

  /** Per-session aggregate over a (user, timestamp) event table.
    * Output: one row per (userCol, session) with start/end/n/total.
    */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               valueCol: String, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("total_value"))
      .drop("session_window")

  /** Session ordinal per user (0-based, by start time) — joins the
    * session back onto flat analytics without exposing window structs.
    */
  def numberedSessions(events: DataFrame, userCol: String, tsCol: String,
                       valueCol: String, gap: String = "30 minutes"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col("session_start"))
    sessions(events, userCol, tsCol, valueCol, gap)
      .withColumn("session_seq", row_number().over(w) - 1)
  }

  /** Streaming form: identical plan over a streaming source, with a
    * watermark so closed sessions are emitted and state is bounded.
    */
  def streamingSessions(events: DataFrame, userCol: String, tsCol: String,
                        valueCol: String, gap: String = "30 minutes",
                        watermark: String = "1 hour"): DataFrame =
    sessions(events.withWatermark(tsCol, watermark), userCol, tsCol, valueCol, gap)
}
