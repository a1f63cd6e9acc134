package graft

import org.apache.spark.sql.functions._
import graft.op.Cdc
import graft.sink.ParquetMerge

/** op.Cdc.applyChanges + sink.ParquetMerge.upsertPartitions. */
class CdcMergeSpec extends SparkSpec {
  import spark.implicits._

  private val snap = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
    .toDF("k", "v", "tag")

  test("applyChanges: upsert wins by version, delete removes, untouched passes through") {
    val ch = Seq(
      (1L, 5L, "U", 11L, "a1"), (1L, 7L, "U", 12L, "a2"), // latest wins
      (2L, 9L, "D", 0L, "x"),                             // delete key 2
      (4L, 1L, "U", 40L, "d")                             // insert new key
    ).toDF("k", "ver", "op", "v", "tag")
    val got = Cdc.applyChanges(snap, ch, "k", "ver", "op")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, 12L, "a2"), (3L, 30L, "c"), (4L, 40L, "d")))
  }

  test("applyChanges: delete-then-reinsert resolves by version; absent-key delete is a no-op") {
    val ch = Seq(
      (3L, 5L, "D", 0L, "x"), (3L, 6L, "U", 33L, "c2"), // reinsert after delete
      (9L, 1L, "D", 0L, "x")                            // delete absent key
    ).toDF("k", "ver", "op", "v", "tag")
    val got = Cdc.applyChanges(snap, ch, "k", "ver", "op")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 10L), (2L, 20L), (3L, 33L)))
  }

  test("applyChanges: equal-version tie breaks U over D (pinned, order-independent)") {
    val ch = Seq((1L, 7L, "D", 0L, "x"), (1L, 7L, "U", 15L, "z"))
      .toDF("k", "ver", "op", "v", "tag")
    val got = Cdc.applyChanges(snap, ch, "k", "ver", "op")
      .filter(col("k") === 1L).collect()
    assert(got.length == 1 && got.head.getLong(1) == 15L)
  }

  test("upsertPartitions: merges only touched partitions; untouched files stay byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("pmerge").toString + "/tbl"
    Seq(("d1", 1L, 1L, 100L), ("d1", 2L, 1L, 200L), ("d2", 3L, 1L, 300L))
      .toDF("day", "k", "ver", "v")
      .write.partitionBy("day").parquet(dir)
    def files(p: String) = new java.io.File(s"$dir/day=$p").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    val d2Before = files("d2")
    // delta touches ONLY d1: update k=1, insert k=9
    val delta = Seq(("d1", 1L, 2L, 111L), ("d1", 9L, 1L, 900L))
      .toDF("day", "k", "ver", "v")
    ParquetMerge.upsertPartitions(spark, dir, delta, "day", "k", "ver")
    val got = spark.read.parquet(dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 111L), (2L, 1L, 200L), (3L, 1L, 300L),
      (9L, 1L, 900L)))
    // the untouched d2 partition was not rewritten
    assert(files("d2") == d2Before)
    // a second identical merge is idempotent
    ParquetMerge.upsertPartitions(spark, dir, delta, "day", "k", "ver")
    assert(spark.read.parquet(dir).count() == 4)
  }

  test("upsertPartitions: missing table degrades to a plain partitioned write") {
    val dir = java.nio.file.Files.createTempDirectory("pmergeF").toString + "/t2"
    val delta = Seq(("d1", 1L, 1L, 10L)).toDF("day", "k", "ver", "v")
    ParquetMerge.upsertPartitions(spark, dir, delta, "day", "k", "ver")
    assert(spark.read.parquet(dir).count() == 1)
  }
}
