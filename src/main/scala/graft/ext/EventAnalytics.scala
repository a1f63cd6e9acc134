package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event stream — the cohort/funnel
  * queries a collection platform runs next to its pipelines. Both
  * operators are single-key shuffle shapes: every stage groups or joins
  * on the user id, so one hash partitioning is reused end-to-end
  * (Catalyst plans the reuse; nothing ever shuffles on a second key).
  */
object EventAnalytics {

  /** Classic retention matrix: users bucketed by the calendar day of
    * their first event (the cohort), counted on each later day they
    * return. Returns (cohort, offset_days, n_users).
    *
    * Scale shape: distinct (user, day) first — that collapses the event
    * volume to at most users × active-days before anything else runs —
    * then a min-aggregation and a self-join both keyed on the user, then
    * the final small aggregation on (cohort, offset).
    */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val days = events
      .select(col(userCol).as("user"), to_date(col(tsCol)).as("day"))
      .distinct()
    val first = days.groupBy("user").agg(min(col("day")).as("cohort"))
    days.join(first, Seq("user"))
      .withColumn("offset_days", datediff(col("day"), col("cohort")))
      .groupBy("cohort", "offset_days")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Strictly-ordered funnel: for each user, the first `stages(0)`
    * event, then the first `stages(1)` event strictly after it, and so
    * on. Returns one row per user (every user with ≥1 event) with a
    * `ts_i` timestamp column per stage (null once the funnel breaks)
    * and `stage` = number of stages completed.
    *
    * Strict ordering (`>` not `>=`) means a click at the same instant
    * as the view does NOT advance the funnel — ties are ambiguous
    * evidence, and both engines must agree on the rule.
    *
    * Scale shape: one filtered min-aggregation per stage plus a join
    * back to the per-user row, all keyed on the user id — depth-many
    * passes over the (filtered) events, no window over the full stream
    * and no per-user event collection.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    val users = events.select(col(userCol).as("user")).distinct()
    val (acc, _) = stages.zipWithIndex.foldLeft((users, Option.empty[String])) {
      case ((acc, prev), (stage, i)) =>
        val tsName = s"ts_$i"
        val candidates = events.filter(col(typeCol) === stage)
          .select(col(userCol).as("user"), col(tsCol).as("_t"))
        val gated = prev match {
          case None => candidates
          case Some(p) =>
            candidates.join(acc.select(col("user"), col(p)), Seq("user"))
              .filter(col("_t") > col(p))
              .select(col("user"), col("_t"))
        }
        val firsts = gated.groupBy("user").agg(min(col("_t")).as(tsName))
        (acc.join(firsts, Seq("user"), "left"), Some(tsName))
    }
    // fold ascending so the LAST stage becomes the OUTERMOST when():
    // depth must test the deepest completed stage first
    val depth = stages.indices.foldLeft(lit(0)) {
      case (els, i) => when(col(s"ts_$i").isNotNull, lit(i + 1)).otherwise(els)
    }
    acc.withColumn("stage", depth)
  }
}
