package graft

import org.apache.spark.sql.functions._
import graft.op.DataQuality

class DataQualityTwapSpec extends SparkSpec {
  import spark.implicits._

  test("audit: planted violations are counted per rule in one pass") {
    val df = Seq(
      (1L, Some("HIGH"), 10.0),
      (2L, None, 20.0),        // null_priority
      (3L, Some("LOW"), -5.0), // nonpositive
      (4L, None, 0.0)          // both
    ).toDF("id", "prio", "price")
    val got = DataQuality.audit(df, Seq(
      "null_prio" -> col("prio").isNull,
      "nonpos_price" -> (col("price") <= 0)))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("null_prio" -> 2L, "nonpos_price" -> 2L))
    // the whole report is ONE aggregation: no join, single exchange
    val plan = DataQuality.audit(df, Seq("a" -> col("prio").isNull))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("audit on an empty frame reports zero violations, not nulls") {
    val df = Seq((1L, "x")).toDF("id", "v").filter(col("id") < 0)
    val got = DataQuality.audit(df, Seq("bad" -> col("v").isNull))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("bad" -> 0L))
  }

  test("orphanCount: null and missing FKs are orphans; duplicateKeyCount counts extras") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val orph = DataQuality.orphanCount(child, "fk", parent, "pk", "orph")
      .collect().head
    assert(orph.getString(0) == "orph" && orph.getLong(1) == 2L) // 99 + null
    val dups = DataQuality.duplicateKeyCount(
      Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k"), "k", "dups").collect().head
    assert(dups.getLong(1) == 3L) // 2 extra 1s + 1 extra 3
    val none = DataQuality.duplicateKeyCount(
      Seq(1L, 2L).toDF("k"), "k", "dups").collect().head
    assert(none.getLong(1) == 0L)
  }

  test("t_resample_ffill fills interior gaps with the last observation") {
    val dir = java.nio.file.Files.createTempDirectory("rsmp").toString
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val H = 3600L * 1000 // one hour in ms
    Seq(
      (1L, ts(0L * H + 5), 7L, "click", 10.00, "{}"),      // hour 0
      (2L, ts(0L * H + 99), 7L, "click", 12.00, "{}"),     // hour 0, later → wins
      (3L, ts(3L * H + 1), 7L, "click", 30.00, "{}")       // hour 3; 1,2 gap
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(dir + "/events.parquet")
    val got = SparkEntry.queries("t_resample_ffill")(spark, dir)
      .collect().map(r => (r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq((1200L, "obs"), (1200L, "ffill"),
      (1200L, "ffill"), (3000L, "obs")))
  }

  test("ns_length_buckets: exact power-of-two bucketing at the boundaries") {
    // the formula under test: bucket = smallest 2^k >= n via bin-length
    val df = Seq(1L, 2L, 3L, 4L, 5L, 8L, 9L, 1024L, 1025L).toDF("n")
      .withColumn("bucket_len",
        when(col("n") <= 1, lit(1L))
          .otherwise(expr("shiftleft(1L, length(bin(n - 1)))")))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 4L, 4L -> 4L, 5L -> 8L,
      8L -> 8L, 9L -> 16L, 1024L -> 1024L, 1025L -> 2048L))
  }

  test("t_twap matches a hand computation on a tiny user") {
    // fabricate an events dir with one user, 3 events, ms-aligned gaps
    val dir = java.nio.file.Files.createTempDirectory("twap").toString
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    Seq(
      (1L, ts(1000L), 7L, "click", 10.00, "{}"),
      (2L, ts(3000L), 7L, "click", 20.00, "{}"), // w1 = 2000ms @ 1000c
      (3L, ts(4000L), 7L, "click", 99.00, "{}")  // w2 = 1000ms @ 2000c
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(dir + "/events.parquet")
    val got = SparkEntry.queries("t_twap")(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 7L && r.getLong(1) == 3L && r.getLong(2) == 3000L)
    // twap = (1000*2000 + 2000*1000) / 3000 = 4000000/3000 = 1333.333333
    assert(math.abs(r.getDouble(3) - 1333.333333) < 1e-6, r)
  }
}
