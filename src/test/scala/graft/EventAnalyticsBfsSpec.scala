package graft

import org.apache.spark.sql.functions._
import graft.op.Graph

/** Graph.bfsDistances + the round-9 event-analytics query kernels
  * (transitions / integer-exact outliers / top paths) on hand-checked
  * inputs. The registered queries themselves are oracle-gated; these
  * units pin the algorithmic edges the oracle can't isolate.
  */
class EventAnalyticsBfsSpec extends SparkSpec {
  import spark.implicits._

  private def bfs(edges: Seq[(Long, Long)], seeds: Seq[Long],
                  depth: Int): Map[Long, Int] =
    Graph.bfsDistances(edges.toDF("s", "d"), "s", "d",
      seeds.toDF("node"), "node", depth)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("bfsDistances: path graph layers from a single seed") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(bfs(path, Seq(1L), 4) ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    // depth bound truncates the frontier, not the found layers
    assert(bfs(path, Seq(1L), 2) == Map(1L -> 0, 2L -> 1, 3L -> 2))
    assert(bfs(path, Seq(1L), 0) == Map(1L -> 0))
  }

  test("bfsDistances: multi-source takes the MIN distance; edges are undirected") {
    // 1-2-3-4-5 seeded at both ends: 3 is 2 hops from either
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(bfs(path, Seq(1L, 5L), 4) ==
      Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
    // direction of the input tuples is irrelevant after symmetrization
    assert(bfs(path.map(p => (p._2, p._1)), Seq(5L), 2) ==
      Map(5L -> 0, 4L -> 1, 3L -> 2))
  }

  test("bfsDistances: disconnected components stay unreached; isolated seeds emit dist 0") {
    val g = Seq((1L, 2L), (10L, 11L), (3L, 3L)) // self-loop dropped
    val got = bfs(g, Seq(1L, 99L), 4)
    assert(got == Map(1L -> 0, 99L -> 0, 2L -> 1)) // 10/11/3 unreached
  }

  test("bfsDistances: cycle converges (no infinite frontier), dup edges canonicalized") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 2L), (2L, 1L))
    assert(bfs(cyc, Seq(1L), 10) == Map(1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("transition kernel: lead pairs + floor ppm matches hand count") {
    val ev = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "a"),
      (2L, 10L, "a"), (2L, 20L, "b")
    ).toDF("user_id", "ts", "event_type")
      .withColumn("event_id", col("ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val got = ev.select(col("event_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("from_type")))
      .withColumn("p_ppm", expr("n * 1000000 div total"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(4))).toSet
    // from a: a→b twice (both users); from b: b→a once
    assert(got == Set(("a", "b", 2L, 1000000L), ("b", "a", 1L, 1000000L)))
  }

  test("integer 3-sigma test: (vn-S)^2 > 9(nQ-S^2) flags exactly the planted spike") {
    // user 1: a hundred 100s and one 10000 — the spike is ~10σ out; the
    // 100s are not. (n must be largish: a single point in a sample of n
    // is at most √(n−1)·σ from the mean, so a 10-point sample can NEVER
    // strictly exceed 3σ — the first draft of this test planted exactly
    // 3.00σ and proved it.)
    val vals = Seq.fill(100)(100L) :+ 10000L
    val df = vals.zipWithIndex
      .map { case (c, i) => (1L, i.toLong, c) }
      .toDF("user_id", "event_id", "cents")
    val st = df.groupBy("user_id").agg(
      count(lit(1)).as("n"),
      sum(col("cents").cast("decimal(38,0)")).as("s"),
      sum((col("cents") * col("cents")).cast("decimal(38,0)")).as("q"))
    val out = df.join(st, Seq("user_id"))
      .filter(col("n") >= 2)
      .withColumn("dev",
        col("cents").cast("decimal(38,0)") * col("n") - col("s"))
      .filter(col("dev") * col("dev") >
        lit(9) * (col("q") * col("n") - col("s") * col("s")))
      .select("event_id").as[Long].collect().toSeq
    assert(out == Seq(100L))
    // cross-check against the double formulation on this exact data
    val n = vals.size.toDouble
    val mean = vals.sum / n
    val sd = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / n)
    assert(vals.count(v => math.abs(v - mean) > 3 * sd) == 1)
  }

  test("personalizedPageRank: mass stays near the seed; unreached components score 0") {
    // star 1-{2,3,4,5} plus a disconnected pair {10,11}, seeded at 1
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (10L, 11L))
    val sym = star ++ star.map(e => (e._2, e._1))
    val got = Graph.personalizedPageRank(sym.toDF("a", "b"), "a", "b",
      Seq(1L).toDF("node"), "node", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) > got(2L)) // the seed keeps the teleport mass
    assert(got(2L) > 0L && Seq(3L, 4L, 5L).forall(l => got(l) == got(2L)))
    assert(got(10L) == 0L && got(11L) == 0L) // no seed mass ever arrives
  }

  test("personalizedPageRank: exact hand-unrolled recurrence on a path; diffusion is depth-bounded") {
    // Path 1-2-3-4-5 seeded at 1, 3 iterations, hand-unrolled with the
    // exact integer divisions (init 1e12, base 150e9, damping 85/100).
    // Note the mass SLOSHES on a bipartite path — rank(3) < rank(4)
    // after an odd iteration count is correct, not a proximity bug:
    // node 3 just forwarded its mass outward while 4 just received.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val sym = path ++ path.map(e => (e._2, e._1))
    val got = Graph.personalizedPageRank(sym.toDF("a", "b"), "a", "b",
      Seq(1L).toDF("node"), "node", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 204187500000L, 2L -> 588093750000L, 3L -> 54187500000L,
      4L -> 153531250000L, 5L -> 0L)) // 4 hops out, 3 iters: unreached
  }

  test("transitionPairsStream: state carries the chain head across micro-batches = batch lead kernel") {
    import graft.streaming.EventStream
    val dir = java.nio.file.Files.createTempDirectory("trans").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val b1 = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0, ""),
      (1L, ts("2024-01-01 10:05:00"), 2L, "b", 0.0, ""),
      (2L, ts("2024-01-01 10:00:00"), 3L, "x", 0.0, ""))
    val b2 = Seq( // user 1 continues in a LATER micro-batch; user 3 is new
      (1L, ts("2024-01-01 10:10:00"), 4L, "c", 0.0, ""),
      (2L, ts("2024-01-01 10:20:00"), 5L, "y", 0.0, ""),
      (3L, ts("2024-01-01 10:00:00"), 6L, "a", 0.0, ""))
    val cols = Seq("user_id", "ts", "event_id", "event_type", "value", "props")
    b1.toDF(cols: _*).coalesce(1).write.parquet(dir + "/f1")
    b2.toDF(cols: _*).coalesce(1).write.parquet(dir + "/f2")
    val stream = spark.readStream
      .schema("user_id bigint, ts timestamp, event_id bigint, " +
        "event_type string, value double, props string")
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
    val out = EventStream.transitionPairsStream(spark, stream).toDF()
    EventStream.runAvailableNow(out, "trans_pairs")
    val got = spark.sql(
      "select user_id, from_type, to_type, from_event_id, to_event_id " +
        "from trans_pairs")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    // the a→b pair lands in batch 1; b→c and x→y REQUIRE the carried
    // state (their from-rows arrived a micro-batch earlier); user 3's
    // single event emits nothing
    assert(got == Set(
      (1L, "a", "b", 1L, 2L), (1L, "b", "c", 2L, 4L), (2L, "x", "y", 3L, 5L)))
  }

  test("runningOutlierStream: spike flagged against carried prior-state moments") {
    import graft.streaming.EventStream
    val dir = java.nio.file.Files.createTempDirectory("rout").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ts(offS: Int) = new java.sql.Timestamp(base + offS * 1000L)
    val cols = Seq("user_id", "ts", "event_id", "event_type", "value", "props")
    // batch 1: a hundred 1.00-value events for user 1 (the history)
    (1 to 100).map(i => (1L, ts(i), i.toLong, "e", 1.0, ""))
      .toDF(cols: _*).coalesce(1).write.parquet(dir + "/f1")
    // batch 2: the 100.00 spike, a post-spike normal, and a fresh user
    Seq((1L, ts(200), 200L, "e", 100.0, ""),
      (1L, ts(201), 201L, "e", 1.0, ""),
      (2L, ts(200), 300L, "e", 50.0, ""))
      .toDF(cols: _*).coalesce(1).write.parquet(dir + "/f2")
    val stream = spark.readStream
      .schema("user_id bigint, ts timestamp, event_id bigint, " +
        "event_type string, value double, props string")
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
    val out = EventStream.runningOutlierStream(spark, stream).toDF()
    EventStream.runAvailableNow(out, "run_outliers")
    val got = spark.sql(
      "select event_id, n_prior, is_outlier from run_outliers")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // the spike tests against the CARRIED 100-event state (zero
    // variance → any deviation flags); the post-spike normal tests
    // against moments that now absorb the spike (σ ≈ 9.9 → 1.00 is
    // within 3σ of the ≈1.99 mean); user 2's first event has no prior
    assert(got(200L) == (100L, true))
    assert(got(201L) == (101L, false))
    assert(got(300L) == (0L, false))
    assert(got.size == 103) // the history rows all emitted, unflagged
    assert((1L to 100L).forall(i => !got(i)._2))
  }

  test("runningOutlierStream: $30M+ values don't wrap the moment state (BigInt regression)") {
    import graft.streaming.EventStream
    // cents = 3.1e9 → cents² ≈ 9.6e18 > Long.MaxValue: the old Long
    // state wrapped Q negative, making 9·(nQ−S²) negative and flagging
    // an IDENTICAL third value as an outlier. BigInt state: three equal
    // values → zero variance → equal is never an outlier; a genuinely
    // deviant fourth IS.
    val dir = java.nio.file.Files.createTempDirectory("routBig").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ts(offS: Int) = new java.sql.Timestamp(base + offS * 1000L)
    val cols = Seq("user_id", "ts", "event_id", "event_type", "value", "props")
    Seq((1L, ts(1), 1L, "e", 31000000.0, ""),
      (1L, ts(2), 2L, "e", 31000000.0, ""),
      (1L, ts(3), 3L, "e", 31000000.0, ""),
      (1L, ts(4), 4L, "e", 32000000.0, ""))
      .toDF(cols: _*).coalesce(1).write.parquet(dir + "/f1")
    val stream = spark.readStream
      .schema("user_id bigint, ts timestamp, event_id bigint, " +
        "event_type string, value double, props string")
      .parquet(dir + "/*")
    val out = EventStream.runningOutlierStream(spark, stream).toDF()
    EventStream.runAvailableNow(out, "run_outliers_big")
    val got = spark.sql(
      "select event_id, n_prior, is_outlier from run_outliers_big")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(1L) == (0L, false))
    assert(got(2L) == (1L, false))
    assert(got(3L) == (2L, false)) // Long-wrapped state flagged this true
    assert(got(4L) == (3L, true))  // dev² = 9e16 > 9·0 on zero variance
  }

  test("top-paths kernel: first-5 path per user in (ts,event_id) order") {
    val ev = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 2L, 3L, "c"), // ts tie → id order
      (2L, 5L, 1L, "a"), (2L, 6L, 2L, "b"), (2L, 7L, 3L, "c"),
      (2L, 8L, 4L, "d"), (2L, 9L, 5L, "e"), (2L, 10L, 6L, "f") // 6th trimmed
    ).toDF("user_id", "ts", "event_id", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val got = ev.select(col("user_id"), col("event_type"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 5)
      .groupBy("user_id")
      .agg(expr("array_join(transform(array_sort(" +
        "collect_list(struct(rn, event_type))), x -> x.event_type), '>')")
        .as("path"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a>b>c", 2L -> "a>b>c>d>e"))
  }
}
