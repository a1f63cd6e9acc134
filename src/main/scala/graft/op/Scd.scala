package graft.op

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history building — the warehouse
  * pattern for "what was this entity's state at time T?". The reference
  * keeps only last-write-wins current state (`Dedup.lastWriteWins`);
  * SCD2 is its history-preserving dual: consecutive snapshots with the same
  * state collapse into one validity interval `[valid_from, valid_to)`,
  * the newest interval per key stays open (`valid_to` null,
  * `is_current` true).
  *
  * Classic gaps-and-islands: mark state changes with `lag`, number the
  * runs with a cumulative sum, aggregate each run to an interval, then
  * close each interval with `lead` of the next run's start. All four
  * steps ride ONE hash partitioning on `key` (window + groupBy + window
  * on the same key), so at 100 TB the plan is a single shuffle followed
  * by map-side work — no self-joins, no per-key iteration.
  *
  * `orderCol` must totally order the snapshots within a key (ties make
  * run boundaries nondeterministic — same contract as any ORDER BY).
  */
object Scd {

  def collapse(snapshots: DataFrame, key: String, state: String,
               orderCol: Column, countCol: String = "n_snapshots"): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(orderCol)
    val prev = lag(col(state), 1).over(byKey)
    val runs = snapshots
      .withColumn("_chg",
        when(prev.isNull || prev =!= col(state), lit(1)).otherwise(lit(0)))
      .withColumn("_run", sum(col("_chg"))
        .over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val intervals = runs.groupBy(col(key), col("_run"))
      // state is constant within a run; min() is its deterministic read
      .agg(min(col(state)).as(state),
        min(orderCol).as("valid_from"),
        count(lit(1)).as(countCol))
    val byStart = Window.partitionBy(key).orderBy(col("valid_from"))
    intervals
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byStart))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_run")
  }
}
