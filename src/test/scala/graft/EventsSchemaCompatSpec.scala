package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import graft.source.Tables

/** Pins the schema-adaptive `Tables.events` contract: the upstream test-data
  * generator has shipped `events.ts` as BOTH int64 nanoseconds and parquet
  * `timestamp[us]` (round-8 regression: the loader assumed nanos and 26
  * event-family queries went dark when the data switched to µs). This spec
  * fabricates an events file in each encoding and asserts the loader yields
  * identical `ts` (long nanos) / `ts_us` (µs TIMESTAMP) semantics on both,
  * so a future driver-side regeneration can't zero a round again.
  */
class EventsSchemaCompatSpec extends SparkSpec {
  import spark.implicits._

  // known instants, expressed as epoch micros (UTC session pinned in TestSpark)
  private val rows = Seq(
    (1L, 1704067200000000L, 7L, "click", 1.5, "{}"),   // 2024-01-01 00:00:00
    (2L, 1704067200123456L, 7L, "view", 2.0, "{}"),    // ...  +123456 µs
    (3L, 1735689599999999L, 8L, "click", 3.0, "{}"))   // 2024-12-31 23:59:59.999999

  private def writeDir(suffix: String): String =
    java.nio.file.Files.createTempDirectory(s"events_compat_$suffix").toString + "/d"

  test("events loader: int64-nanos and timestamp[us] files read identically") {
    // encoding A: ts as int64 nanoseconds (the legacy generator shape)
    val nanosDir = writeDir("ns")
    rows.map { case (id, us, u, t, v, p) => (id, us * 1000L, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(nanosDir)

    // encoding B: ts as parquet timestamp[us] NTZ (the pyarrow/pandas shape
    // the current generator ships — TimestampNTZType round-trips to
    // isAdjustedToUTC=false micros, exactly what pq.read_schema reports)
    val microsDir = writeDir("us")
    rows.toDF("event_id", "ts_raw", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_raw")).cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(microsDir)

    // Tables.events appends "/events.parquet"; point it at our dirs by symlink
    def load(dir: String): org.apache.spark.sql.DataFrame = {
      val base = java.nio.file.Files.createTempDirectory("events_sf").toString
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(base, "events.parquet"),
        java.nio.file.Paths.get(dir))
      Tables.events(spark, base)
    }
    val fromNanos = load(nanosDir)
    val fromMicros = load(microsDir)

    for (df <- Seq(fromNanos, fromMicros)) {
      assert(df.schema("ts").dataType == LongType)
      assert(df.schema("ts_us").dataType == TimestampType)
      assert(df.columns.toSeq ==
        Seq("event_id", "ts", "user_id", "event_type", "value", "props", "ts_us"))
    }

    val proj = Seq($"event_id", $"ts", unix_micros($"ts_us").as("us"),
      $"user_id", $"event_type", $"value", $"props")
    val gotNanos = fromNanos.select(proj: _*).orderBy("event_id").collect().toSeq
    val gotMicros = fromMicros.select(proj: _*).orderBy("event_id").collect().toSeq
    assert(gotNanos == gotMicros)
    // and both match the authored instants (ts = µs*1000, ts_us = µs exactly)
    val expected = rows.sortBy(_._1).map { case (id, us, u, t, v, p) =>
      (id, us * 1000L, us, u, t, v, p) }
    assert(gotNanos.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getString(4), r.getDouble(5), r.getString(6))) == expected)
  }
}
