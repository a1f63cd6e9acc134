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

  test("mergeIntervals emits per-island bounds in order") {
    val got = Intervals.mergeIntervals(
      Seq((1L, 5L, 9L), (1L, 0L, 2L), (1L, 2L, 4L)).toDF("k", "s", "f"),
      "k", "s", "f")
      .orderBy("island")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((0L, 4L, 2L), (5L, 9L, 1L)))
  }
}
