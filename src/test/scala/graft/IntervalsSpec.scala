package graft

import graft.op.Intervals

/** op.Intervals — merge/coverage algebra on hand-checked span sets. */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def cov(spans: Seq[(Long, Long, Long)]) =
    Intervals.coverage(spans.toDF("k", "s", "f"), "k", "s", "f")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("overlap and adjacency merge; gaps split islands") {
    val spans = Seq(
      (1L, 0L, 10L), (1L, 5L, 15L),   // overlap → [0,15)
      (1L, 15L, 20L),                 // adjacent → extends to [0,20)
      (1L, 30L, 40L),                 // gap of 10 → second island
      (2L, 0L, 5L))                   // single-span key
    assert(cov(spans) == Map(
      1L -> ((30L, 2L, 4L, 10L)), // covered 20+10, 2 islands, gap 10
      2L -> ((5L, 1L, 1L, 0L))))
  }

  test("containment and duplicates collapse into one island") {
    val spans = Seq(
      (1L, 0L, 100L), (1L, 10L, 20L), (1L, 10L, 20L), (1L, 0L, 100L))
    assert(cov(spans) == Map(1L -> ((100L, 1L, 4L, 0L))))
  }

  test("activityIslandsStream: islands merge across micro-batches, emit once on closure") {
    import graft.streaming.EventStream
    val dir = java.nio.file.Files.createTempDirectory("isl").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ts(offMin: Int) = new java.sql.Timestamp(base + offMin * 60000L)
    val cols = Seq("user_id", "ts", "event_id", "event_type", "value", "props")
    // span = 10 min. batch 1: events at 0 and 5 min (one island 0..15)
    Seq((1L, ts(0), 1L, "e", 0.0, ""), (1L, ts(5), 2L, "e", 0.0, ""))
      .toDF(cols: _*).coalesce(1).write.parquet(dir + "/f1")
    // batch 2: 12 min EXTENDS the carried island (12 < 15); 60 min
    // starts a new island, which CLOSES (and emits) the first
    Seq((1L, ts(12), 3L, "e", 0.0, ""), (1L, ts(60), 4L, "e", 0.0, ""))
      .toDF(cols: _*).coalesce(1).write.parquet(dir + "/f2")
    val stream = spark.readStream
      .schema("user_id bigint, ts timestamp, event_id bigint, " +
        "event_type string, value double, props string")
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
    val out = EventStream.activityIslandsStream(spark, stream,
      spanNs = 600000000000L).toDF()
    EventStream.runAvailableNow(out, "isl_out")
    val got = spark.sql("select i_start, i_end, n_spans from isl_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // exactly ONE emission: the closed island [0, 22min) built from 3
    // spans across both batches; the 60-min island stays open in state
    val b = base * 1000000L
    assert(got == Seq((b, b + 22L * 60 * 1000000000L, 3L)))
  }

  test("mergeIntervals emits per-island bounds in order") {
    val got = Intervals.mergeIntervals(
      Seq((1L, 5L, 9L), (1L, 0L, 2L), (1L, 2L, 4L)).toDF("k", "s", "f"),
      "k", "s", "f")
      .orderBy("island")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((0L, 4L, 2L), (5L, 9L, 1L)))
  }
}
