package graft.op

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed (start, end) spans — the classic
  * merge-overlapping-intervals problem (ad exposure time, machine
  * uptime, session coverage) done as window passes instead of a
  * driver-side sweep line.
  */
object Intervals {

  /** Merge overlapping/adjacent intervals per key and measure
    * coverage.
    *
    * The textbook sweep line becomes three window passes over each
    * key's spans in (start, end) order: (1) the running maximum of
    * `end` over preceding rows decides whether a span starts a NEW
    * merged island (its start exceeds everything seen before);
    * (2) a running sum of that flag numbers the islands; (3) one
    * aggregation per (key, island) yields merged bounds. Adjacency
    * (`start == prior end`) merges — spans touch, no gap. All
    * arithmetic on the raw integer time column; no floats anywhere.
    *
    * Output: (key, island, i_start, i_end, n_spans) — one row per
    * merged island.
    *
    * Scale shape: every window/aggregation is keyed on `key`, so ONE
    * hash partitioning serves all three passes (Catalyst collapses
    * the sorts); per-key span counts bound the window buffers. A
    * single key's spans land on one task — the same contract as every
    * per-user window in the engine; salt the key first if one entity
    * can own ~10⁸ spans.
    */
  def mergeIntervals(spans: DataFrame, key: String, start: String,
                     end: String): DataFrame = {
    val wOrd = Window.partitionBy(key).orderBy(col(start), col(end))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    spans
      .withColumn("_hwm", max(col(end)).over(wPrev))
      .withColumn("_new",
        when(col("_hwm").isNull || col(start) > col("_hwm"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("_new")).over(wOrd))
      .groupBy(col(key), col("island"))
      .agg(min(col(start)).as("i_start"), max(col(end)).as("i_end"),
        count(lit(1)).as("n_spans"))
  }

  /** Per-key coverage report over the merged islands: total covered
    * time, island count, span count, and the largest uncovered gap
    * BETWEEN islands (0 when a single island covers the key).
    */
  def coverage(spans: DataFrame, key: String, start: String,
               end: String): DataFrame = {
    val islands = mergeIntervals(spans, key, start, end)
    val wOrd = Window.partitionBy(key).orderBy(col("i_start"))
    islands
      .withColumn("_gap",
        col("i_start") - lag(col("i_end"), 1).over(wOrd))
      .groupBy(col(key))
      .agg(sum(col("i_end") - col("i_start")).as("covered"),
        count(lit(1)).as("n_islands"),
        sum(col("n_spans")).as("n_spans"),
        coalesce(max(col("_gap")), lit(0L)).as("max_gap"))
  }
}
