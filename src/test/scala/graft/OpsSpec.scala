package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.op.{Dedup, Normalize, PriceGen}
import graft.source.Tables

/** Unit specs for the reference-faithful operators (SURVEY §2.2),
  * pinning the edge cases called out in SURVEY §5.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("T4 city after last comma: normal / no comma / null / trailing spaces") {
    val df = Seq(
      ("238 Moorhouse Avenue, Christchurch"),
      ("NoCommaHere"),
      ("a, b,   Riccarton  "),
      (null: String)).toDF("addr")
      .select(Normalize.cityAfterLastComma(col("addr")).as("city"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("Christchurch", "", "Riccarton", ""))
  }

  test("T5 anti-join equals set difference on keys") {
    val batch = Seq(("a", 1), ("b", 2), ("c", 3), ("c", 4)).toDF("k", "v")
    val existing = Seq(("b", 9), ("x", 0)).toDF("k", "v")
    val out = Dedup.newKeysOnly(batch, existing, "k", hintBroadcast = true)
    assert(out.select("k").as[String].collect().toSet == Set("a", "c"))
    assert(out.count() == 3) // both 'c' rows survive — dedup is T6's job
  }

  test("T6 first-seen keeps the lowest-ordered row per key") {
    val df = Seq(("a", 2, "second"), ("a", 1, "first"), ("b", 5, "only"))
      .toDF("k", "seq", "name")
    val out = Dedup.firstSeen(df, Seq("k"), Seq(col("seq")))
    assert(out.orderBy("k").as[(String, Int, String)].collect().toSeq ==
      Seq(("a", 1, "first"), ("b", 5, "only")))
  }

  test("T10 last-write-wins is idempotent (apply twice == once)") {
    val df = Seq(("a", "x", 1, 10.0), ("a", "x", 2, 20.0), ("b", "x", 1, 5.0))
      .toDF("k1", "k2", "ver", "price")
    val once = Dedup.lastWriteWins(df, Seq("k1", "k2"), Seq(col("ver")))
    val twice = Dedup.lastWriteWins(once, Seq("k1", "k2"), Seq(col("ver")))
    assert(once.orderBy("k1").collect().toSeq == twice.orderBy("k1").collect().toSeq)
    assert(once.filter($"k1" === "a").select("price").as[Double].head() == 20.0)
  }

  test("T9 price stays in the reference band [base-0.37, base+0.23]") {
    val prices = PriceGen.generate(
      Tables.table(spark, sf, "supplier"), "s_suppkey",
      Tables.fuelTypes(spark), to_date(lit("2024-06-01")))
    val joined = prices.join(Tables.fuelTypes(spark), "fuel_type")
      .select(($"price" - $"base_price").as("delta"))
    val (lo, hi) = joined.agg(min("delta"), max("delta"))
      .as[(Double, Double)].head()
    assert(lo >= -0.37 - 1e-9 && hi <= 0.23 + 1e-9)
    // deterministic: two runs agree
    val again = PriceGen.generate(
      Tables.table(spark, sf, "supplier"), "s_suppkey",
      Tables.fuelTypes(spark), to_date(lit("2024-06-01")))
    assert(prices.orderBy("location_id", "fuel_type").collect().toSeq ==
      again.orderBy("location_id", "fuel_type").collect().toSeq)
  }

  test("T12 full address appends postal code only when present") {
    val df = Seq(("1 Main St", "Chch", "Cant", "NZ", "8011"),
      ("2 Side St", "Chch", "Cant", "NZ", ""),
      ("3 Back St", "Chch", "Cant", "NZ", null))
      .toDF("a", "c", "s", "n", "p")
      .select(Normalize.fullAddress($"a", $"c", $"s", $"n", $"p").as("f"))
    assert(df.as[String].collect().toSeq == Seq(
      "1 Main St, Chch, Cant, NZ 8011",
      "2 Side St, Chch, Cant, NZ",
      "3 Back St, Chch, Cant, NZ"))
  }

  test("T13 row-to-json matches the reference to_dict shape") {
    val df = Seq((1L, "BP")).toDF("location_id", "brand_name")
      .select(Normalize.rowToJson(Seq($"location_id", $"brand_name")).as("js"))
    assert(df.as[String].head() == """{"location_id":1,"brand_name":"BP"}""")
  }

  test("price pipeline works on string business keys (ANSI mode)") {
    val stations = Seq("bp-001", "mob-001", "ChIJxxxx").toDF("location_id")
    val prices = graft.pipeline.Pipeline.dailyPrices(spark, stations,
      "location_id", None, to_date(lit("2024-06-01")))
    val rows = prices.collect()
    assert(rows.length == 12) // 3 stations × 4 fuel types
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("price"))))
    // deterministic across runs
    val again = graft.pipeline.Pipeline.dailyPrices(spark, stations,
      "location_id", None, to_date(lit("2024-06-01")))
    assert(prices.orderBy("location_id", "fuel_type").collect().toSeq ==
      again.orderBy("location_id", "fuel_type").collect().toSeq)
  }

  test("backfill replays a date range idempotently (catchup converges)") {
    import java.time.LocalDate
    val stations = Seq("bp-001", "mob-001", "ChIJxxxx").toDF("location_id")
    def run(existing: Option[org.apache.spark.sql.DataFrame],
            from: String, to: String) =
      graft.pipeline.Pipeline.backfillPrices(spark, stations, "location_id",
        existing, LocalDate.parse(from), LocalDate.parse(to))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("location_id", "fuel_type", "date").collect().toSeq
    // one shot over the full range is the ground truth
    val full = run(None, "2024-06-01", "2024-06-04")
    assert(full.count() == 3 * 4 * 4) // stations x fuels x days
    // replaying the SAME range over its own output is a fixpoint
    assert(rows(run(Some(full), "2024-06-01", "2024-06-04")) == rows(full))
    // catchup: days 1-2 processed, then an overlapping replay of 2-4
    // converges to the same table as the one-shot full range
    val firstHalf = run(None, "2024-06-01", "2024-06-02")
    assert(rows(run(Some(firstHalf), "2024-06-02", "2024-06-04")) == rows(full))
  }

  test("rolling fingerprint evaluates under ANSI and is order-sensitive") {
    val fp = Seq(Tuple1("alpha beta gamma"), Tuple1("beta alpha gamma"),
      Tuple1("alpha beta gamma")).toDF("text")
      .select(graft.ext.TextAnalysis.fingerprint($"text").as("fp"))
      .as[Long].collect()
    assert(fp(0) == fp(2) && fp(0) != fp(1))
    assert(fp.forall(v => v >= 0 && v < 1000000007L))
  }

  test("sessionize: gap splits sessions, ordinals count from zero") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq((7L, ts(0), 1.0), (7L, ts(10), 2.0), (7L, ts(50), 3.0),
      (8L, ts(5), 4.0)).toDF("user_id", "ts_us", "value")
    val out = graft.op.Sessionize.numberedSessions(ev, "user_id", "ts_us", "value")
      .select("user_id", "session_seq", "n_events", "total_value")
      .orderBy("user_id", "session_seq")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(out == Seq((7L, 0, 2L, 3.0), (7L, 1, 1L, 3.0), (8L, 0, 1L, 4.0)))
  }

  test("streaming sessionize emits closed sessions") {
    val dir = java.nio.file.Files.createTempDirectory("sessstream").toString
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 7L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 7L, "click", 2.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 03:00:00"), 7L, "click", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    val sessions = graft.op.Sessionize.streamingSessions(
      graft.streaming.EventStream.readEvents(spark, dir),
      "user_id", "ts", "value", "30 minutes", "1 hour")
    graft.streaming.EventStream.runAvailableNow(sessions, "sessions_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    // the 00:0x session closes once the 03:00 event advances the watermark
    val closed = spark.sql("select n_events, total_value from sessions_out")
      .as[(Long, Double)].collect().toSet
    assert(closed.contains((2L, 3.0)))
  }

  test("events reader exposes exact nanos and truncated micros") {
    val ev = Tables.events(spark, sf)
    val Row(ns: Long, us: java.sql.Timestamp) =
      ev.select($"ts", $"ts_us").orderBy("event_id").head()
    assert(us.getTime / 1000 * 1000000 + us.getNanos / 1000 == ns / 1000)
  }
}
