package graft

import org.apache.spark.sql.functions._
import graft.op.Attribution
import graft.streaming.EventStream

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  test("lastTouch: most recent in-horizon touch wins; ties break to larger id") {
    val touches = Seq(
      (1L, 100L, 10L), // candidate
      (1L, 150L, 11L), // later candidate — the winner
      (1L, 150L, 12L), // same ts, larger id — beats 11
      (1L, 300L, 13L), // after the conversion: excluded
      (2L, 10L, 20L)   // out of horizon for user 2's conversion
    ).toDF("u", "ts", "id")
    val convs = Seq(
      (1L, 200L, 50L),
      (2L, 500L, 51L), // nearest touch is 490ns away > horizon 100
      (3L, 200L, 52L)  // no touches at all
    ).toDF("u", "ts", "id")
    val got = Attribution.lastTouch(touches, convs, "u", "ts", "id",
      horizonNs = 100L)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSet
    // only conversion 50 attributes: winner touch 12 at ts=150, 3 candidates
    assert(got == Set((50L, 12L, 150L, 3L)))
  }

  test("stream-stream attribution joins across micro-batches and bounds by horizon") {
    val dirT = java.nio.file.Files.createTempDirectory("attT").toString
    val dirC = java.nio.file.Files.createTempDirectory("attC").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // touches batch 1
    Seq((1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 10:10:00"), 101L),
      (2L, ts("2024-01-01 08:00:00"), 102L))
      .toDF("user_id", "ts", "event_id").coalesce(1).write.parquet(dirT + "/f1")
    // conversions: one same-window, one for user 2 far beyond horizon
    Seq((1L, ts("2024-01-01 10:20:00"), 200L),
      (2L, ts("2024-01-01 11:00:00"), 201L))
      .toDF("user_id", "ts", "event_id").coalesce(1).write.parquet(dirC + "/f1")
    val tStream = spark.readStream
      .schema("user_id bigint, ts timestamp, event_id bigint").parquet(dirT + "/*")
    val cStream = spark.readStream
      .schema("user_id bigint, ts timestamp, event_id bigint").parquet(dirC + "/*")
    val joined = EventStream.attributionCandidatesStream(
      tStream, cStream, "user_id", "ts", "event_id", horizon = "30 minutes")
    EventStream.runAvailableNow(joined, "att_cand")
    val got = spark.sql("select conv_id, touch_id from att_cand")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // conversion 200 matches both of user 1's touches (10:00 and 10:10
    // are within 30min of 10:20); user 2's 08:00 touch is 3h before
    // 11:00 — outside the horizon, never emitted
    assert(got == Set((200L, 100L), (200L, 101L)))
  }

  test("left_outer stream-stream join emits unattributed conversions once watermark passes") {
    val dirT = java.nio.file.Files.createTempDirectory("attTo").toString
    val dirC = java.nio.file.Files.createTempDirectory("attCo").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq((1L, ts("2024-01-01 10:00:00"), 100L))
      .toDF("user_id", "ts", "event_id").coalesce(1).write.parquet(dirT + "/f1")
    // conv 200 matches; conv 201 (user 2) has no touch ever
    Seq((1L, ts("2024-01-01 10:20:00"), 200L),
      (2L, ts("2024-01-01 10:20:00"), 201L))
      .toDF("user_id", "ts", "event_id").coalesce(1).write.parquet(dirC + "/f1")
    Thread.sleep(1100)
    // watermark-advancing sentinel far in the future on BOTH sides, in a
    // LATER micro-batch (maxFilesPerTrigger=1): outer rows only emit
    // once the watermark proves no matching touch can still arrive
    Seq((9L, ts("2024-01-02 10:00:00"), 900L))
      .toDF("user_id", "ts", "event_id").coalesce(1).write.parquet(dirT + "/f2")
    Seq((9L, ts("2024-01-02 10:00:00"), 901L))
      .toDF("user_id", "ts", "event_id").coalesce(1).write.parquet(dirC + "/f2")
    val tStream = spark.readStream
      .schema("user_id bigint, ts timestamp, event_id bigint")
      .option("maxFilesPerTrigger", "1").parquet(dirT + "/*")
    val cStream = spark.readStream
      .schema("user_id bigint, ts timestamp, event_id bigint")
      .option("maxFilesPerTrigger", "1").parquet(dirC + "/*")
    val joined = EventStream.attributionCandidatesStream(
      tStream, cStream, "user_id", "ts", "event_id",
      horizon = "30 minutes", watermark = "5 minutes", joinType = "left_outer")
    EventStream.runAvailableNow(joined, "att_outer")
    val got = spark.sql("select conv_id, touch_id from att_outer")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(200L).contains(100L)) // attributed
    assert(got.contains(201L) && got(201L).isEmpty,
      s"unattributed conversion missing or wrongly matched: $got")
  }

  test("t_attribution query is non-empty and every winner is within horizon") {
    val df = SparkEntry.queries("t_attribution")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val conv = r.getLong(2); val touch = r.getLong(4)
      touch <= conv && conv - touch <= 86400L * 1000000000L
    })
  }
}
