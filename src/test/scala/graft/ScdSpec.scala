package graft

import org.apache.spark.sql.functions._
import graft.op.Scd

/** SCD2 run-collapse semantics on hand-built histories. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def hist(rows: (Long, String, Int)*) =
    rows.toDF("k", "state", "t")

  test("consecutive same-state snapshots collapse; intervals chain") {
    val df = hist((1L, "a", 1), (1L, "a", 2), (1L, "b", 3),
      (1L, "a", 4), (1L, "a", 5))
    val out = Scd.collapse(df, "k", "state", col("t"))
      .orderBy("valid_from")
      .select("state", "valid_from", "valid_to", "n_snapshots", "is_current")
      .collect().map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), r.getLong(3), r.getBoolean(4)))
    // a@[1,3) ×2, b@[3,4) ×1, a@[4,∞) ×2 — the state FLIP reopens "a"
    assert(out.toSeq == Seq(
      ("a", 1, 3, 2L, false), ("b", 3, 4, 1L, false), ("a", 4, -1, 2L, true)))
  }

  test("single snapshot is one open interval; keys are independent") {
    val df = hist((1L, "x", 10), (2L, "x", 1), (2L, "y", 2))
    val out = Scd.collapse(df, "k", "state", col("t"))
      .orderBy("k", "valid_from")
      .select("k", "state", "is_current").as[(Long, String, Boolean)]
      .collect().toSeq
    assert(out == Seq((1L, "x", true), (2L, "x", false), (2L, "y", true)))
  }

  test("interval bounds cover the timeline: each valid_to equals the next valid_from") {
    val ev = graft.source.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("cast(ts_us as timestamp_ntz)").as("ts"))
    val out = Scd.collapse(ev, "user_id", "event_type", col("ts"))
    // exactly one open interval per user
    val opens = out.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_open"))
      .filter(col("n_open") =!= 1).count()
    assert(opens == 0)
    // n_snapshots adds back up to the raw event count
    val total = out.agg(sum("n_snapshots")).head().getLong(0)
    assert(total == ev.count())
  }
}
