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

  test("deleteAndUpsertPartitions: deletes, rewrites at original ver, removes emptied partitions, leaves the rest byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("pdel").toString + "/tbl"
    Seq(("d1", 1L, 1L, 100L), ("d1", 2L, 1L, 200L), ("d2", 3L, 1L, 300L),
      ("d3", 4L, 2L, 400L))
      .toDF("day", "k", "ver", "v")
      .write.partitionBy("day").parquet(dir)
    def files(p: String) = new java.io.File(s"$dir/day=$p").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    val d3Before = files("d3")
    // delete k=1 (d1) and k=3 (ALL of d2 — the partition must vanish
    // from disk, not just from the overwrite); rewrite k=2 at its
    // ORIGINAL ver with a new payload
    val delKeys = Seq(("d1", 1L), ("d2", 3L)).toDF("day", "k")
    val ups = Seq(("d1", 2L, 1L, 222L)).toDF("day", "k", "ver", "v")
    ParquetMerge.deleteAndUpsertPartitions(spark, dir, delKeys, ups,
      "day", "k", "ver")
    val got = spark.read.parquet(dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((2L, 1L, 222L), (4L, 2L, 400L)))
    assert(!new java.io.File(s"$dir/day=d2").exists())
    assert(files("d3") == d3Before)
    // deleting nothing that exists is a no-op
    ParquetMerge.deleteAndUpsertPartitions(spark, dir,
      Seq(("d1", 99L)).toDF("day", "k"), ups.limit(0), "day", "k", "ver")
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("mergeStream: per-micro-batch LWW merge; checkpoint restart re-merges idempotently") {
    import graft.streaming.EventStream
    val src = java.nio.file.Files.createTempDirectory("msrc").toString
    val tbl = java.nio.file.Files.createTempDirectory("mtbl").toString + "/t"
    val ckp = java.nio.file.Files.createTempDirectory("mckp").toString
    val cols = Seq("day", "k", "ver", "v")
    Seq(("d1", 1L, 1L, 100L), ("d2", 2L, 1L, 200L))
      .toDF(cols: _*).coalesce(1).write.parquet(src + "/f1")
    Seq(("d1", 1L, 2L, 111L), ("d1", 3L, 1L, 300L))
      .toDF(cols: _*).coalesce(1).write.parquet(src + "/f2")
    def run() = {
      val st = spark.readStream
        .schema("day string, k bigint, ver bigint, v bigint")
        .option("maxFilesPerTrigger", "1").parquet(src + "/*")
      EventStream.mergeStream(st, tbl, "day", "k", "ver", ckp)
        .awaitTermination(120000)
    }
    run()
    def state() = spark.read.parquet(tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expect = Seq((1L, 2L, 111L), (2L, 1L, 200L), (3L, 1L, 300L))
    assert(state() == expect)
    // same-checkpoint restart with no new files: nothing replays, the
    // table is unchanged — and a NEW file merges incrementally
    run()
    assert(state() == expect)
    Seq(("d2", 2L, 5L, 222L)).toDF(cols: _*).coalesce(1)
      .write.parquet(src + "/f3")
    run()
    assert(state() == Seq((1L, 2L, 111L), (2L, 5L, 222L), (3L, 1L, 300L)))
  }

  test("resizeImages: real pixel resample for readable images, stub truncation otherwise") {
    import graft.ext.Multimodal
    def imageBytes(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xFF0000)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val png = imageBytes(8, 6)
    val junk = Array.fill[Byte](10000)(42)
    val df = Seq((1L, png), (2L, junk)).toDF("doc_id", "media")
      .withColumn("media_meta", struct(
        lit("image").as("media_type"),
        length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("checksum")))
    val out = Multimodal.resizeImages(df, 4, 3, stubBytes = 100)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("media")).toMap
    // the real path: decoded dims of the resized blob are the target
    assert(Multimodal.decodeImage(out(1L)).exists(f => f.width == 4 && f.height == 3))
    // the fallback path: unreadable bytes truncate to the stub budget
    assert(out(2L).length == 100)
  }

  test("upsertPartitions: a fresh table still collapses the first batch to one row per (partition, key)") {
    val dir = java.nio.file.Files.createTempDirectory("pmergeF").toString + "/t2"
    // two versions of k=1 arrive in the very first batch: the LWW fold
    // must apply even when there is no current table to merge against
    val delta = Seq(("d1", 1L, 1L, 10L), ("d1", 1L, 2L, 11L))
      .toDF("day", "k", "ver", "v")
    ParquetMerge.upsertPartitions(spark, dir, delta, "day", "k", "ver")
    val got = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 11L)))
  }

  test("upsertPartitions: date-LOOKING string partitions still merge (inference regression)") {
    // day values that parse as dates used to come back DATE on the
    // read-back (partition type inference) while updates' day was
    // STRING — the isin prune matched nothing, cur was empty, and the
    // merge silently became a partition REPLACE dropping k=1's row.
    val dir = java.nio.file.Files.createTempDirectory("pmergeD").toString + "/t4"
    Seq(("2024-01-01", 1L, 1L, 100L), ("2024-01-02", 2L, 1L, 200L))
      .toDF("day", "k", "ver", "v")
      .write.partitionBy("day").parquet(dir)
    ParquetMerge.upsertPartitions(spark, dir,
      Seq(("2024-01-01", 9L, 1L, 900L)).toDF("day", "k", "ver", "v"),
      "day", "k", "ver")
    val got = spark.read.option("inferSchema", "false").parquet(dir)
      .select(col("day").cast("string"), col("k"), col("v"))
      .orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // k=1 SURVIVES next to the inserted k=9; the untouched day keeps k=2
    assert(got == Seq(("2024-01-01", 1L, 100L), ("2024-01-02", 2L, 200L),
      ("2024-01-01", 9L, 900L)))
  }

  test("applyChanges: reserved internal column names are rejected loudly") {
    // a payload column literally named _op (or a _c_ alias) would pass
    // the payload-equality require and then mis-resolve in the merge
    val snap2 = Seq((1L, 10L)).toDF("k", "_op")
    val ch2 = Seq((1L, 1L, "U", 11L)).toDF("k", "ver", "op", "_op")
    val e = intercept[IllegalArgumentException] {
      Cdc.applyChanges(snap2, ch2, "k", "ver", "op")
    }
    assert(e.getMessage.contains("_op"))
    val snap3 = Seq((1L, 10L, 5L)).toDF("k", "v", "_c_v")
    val ch3 = Seq((1L, 1L, "U", 11L, 6L)).toDF("k", "ver", "op", "v", "_c_v")
    intercept[IllegalArgumentException] {
      Cdc.applyChanges(snap3, ch3, "k", "ver", "op")
    }
  }

  test("upsertPartitions: merge scope is the PARTITION — a migrating key keeps one row per partition") {
    // the documented contract: partition-local rewrites cannot see a
    // key's rows in untouched partitions; LWW dedup is per (day, k)
    val dir = java.nio.file.Files.createTempDirectory("pmergeS").toString + "/t3"
    Seq(("d1", 1L, 1L, 100L)).toDF("day", "k", "ver", "v")
      .write.partitionBy("day").parquet(dir)
    // k=1 "migrates" to d2: d1 is untouched and must keep its row
    ParquetMerge.upsertPartitions(spark, dir,
      Seq(("d2", 1L, 2L, 200L)).toDF("day", "k", "ver", "v"),
      "day", "k", "ver")
    val got = spark.read.parquet(dir).orderBy("ver")
      .collect().map(r => (r.getString(3), r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("d1", 1L, 1L, 100L), ("d2", 1L, 2L, 200L)))
    // and when BOTH partitions are touched, each keeps its own winner —
    // the earlier global-key fold would have dropped d1's row entirely
    ParquetMerge.upsertPartitions(spark, dir,
      Seq(("d1", 1L, 3L, 101L), ("d2", 1L, 3L, 201L))
        .toDF("day", "k", "ver", "v"),
      "day", "k", "ver")
    val got2 = spark.read.parquet(dir).orderBy("v")
      .collect().map(r => (r.getString(3), r.getLong(2))).toSeq
    assert(got2 == Seq(("d1", 101L), ("d2", 201L)))
  }

  test("compactPartitions: oversplit partitions collapse to the byte-justified file count; compact ones stay byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    // d1: 6 files of a few KB (the post-merge small-file pathology);
    // d2: already 1 file
    (1L to 600L).map(i => ("d1", i, i * 10))
      .toDF("day", "k", "v").repartition(6)
      .write.partitionBy("day").parquet(dir)
    Seq(("d2", 1L, 7L)).toDF("day", "k", "v")
      .coalesce(1).write.mode("append").partitionBy("day").parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def files(p: String) = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$dir/day=$p")).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    assert(files("d1").size == 6)
    val d2Before = files("d2").map(s => (s.getPath.getName, s.getLen,
      s.getModificationTime))
    val before = spark.read.parquet(dir).orderBy("day", "k")
      .collect().map(_.toSeq).toSeq

    // huge target -> every oversplit partition should become ONE file
    val report = ParquetMerge.compactPartitions(spark, dir, "day",
      targetFileBytes = 1L << 30)
      .sortBy(_.partition)
    assert(report.map(r => (r.partition, r.filesBefore, r.filesAfter)) ==
      Seq(("d1", 6, 1), ("d2", 1, 0)))
    assert(files("d1").size == 1)
    // the compact partition was NOT rewritten: same file, same mtime
    assert(files("d2").map(s => (s.getPath.getName, s.getLen,
      s.getModificationTime)) == d2Before)
    // data identical after compaction
    val after = spark.read.parquet(dir).orderBy("day", "k")
      .collect().map(_.toSeq).toSeq
    assert(after == before)

    // scoped call: restricting to d2 touches nothing even at a tiny
    // target (its single file already satisfies count <= want is
    // false only when files > want)
    val r2 = ParquetMerge.compactPartitions(spark, dir, "day",
      targetFileBytes = 1L, onlyPartitions = Some(Seq("d2")))
    assert(r2.map(_.partition) == Seq("d2") && r2.head.filesAfter == 0)
    // a merge keeps working on the compacted table (the nightly cycle:
    // upsert -> compact -> upsert)
    ParquetMerge.upsertPartitions(spark, dir,
      Seq(("d1", 1L, 999L)).toDF("day", "k", "v"), "day", "k", "v")
    assert(spark.read.parquet(dir).filter(col("k") === 1 && col("day") === "d1")
      .select("v").head().getLong(0) == 999L)
  }

  test("compactPartitions: minFiles amortizes rewrite frequency — a " +
    "partition below the threshold keeps its delta files untouched") {
    val dir = java.nio.file.Files.createTempDirectory("compactmf")
      .toString + "/t"
    // simulate three nightly folds: baseline + 2 delta files
    (1 to 3).foreach { i =>
      Seq(("d1", i.toLong, i * 10L)).toDF("day", "k", "v")
        .coalesce(1).write.mode("append").partitionBy("day").parquet(dir)
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def nFiles = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$dir/day=d1")).toSeq
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    assert(nFiles == 3)
    // below the threshold: skipped (filesAfter = 0 marks no rewrite)
    val r3 = ParquetMerge.compactPartitions(spark, dir, "day",
      targetFileBytes = 1L << 30, minFiles = 4)
    assert(r3.map(r => (r.filesBefore, r.filesAfter)) == Seq((3, 0)))
    assert(nFiles == 3)
    // the fourth fold crosses it: the sweep now rewrites to one file
    Seq(("d1", 4L, 40L)).toDF("day", "k", "v")
      .coalesce(1).write.mode("append").partitionBy("day").parquet(dir)
    val r4 = ParquetMerge.compactPartitions(spark, dir, "day",
      targetFileBytes = 1L << 30, minFiles = 4)
    assert(r4.map(r => (r.filesBefore, r.filesAfter)) == Seq((4, 1)))
    assert(nFiles == 1)
    assert(spark.read.parquet(dir).orderBy("k")
      .select("v").as[Long].collect().toSeq == Seq(10L, 20L, 30L, 40L))
  }

  test("compactPartitions: Hive-escaped partition values round-trip (no double-escape, scoped match on the real value)") {
    // a partition value with a colon lives on disk as "day=a%3Ab";
    // compaction must write BACK to the same directory, not to a
    // doubly-escaped "day=a%253Ab", and onlyPartitions must match the
    // REAL value
    val dir = java.nio.file.Files.createTempDirectory("compesc").toString + "/t"
    (1L to 40L).map(i => ("a:b", i, i)).toDF("day", "k", "v")
      .repartition(4).write.partitionBy("day").parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def dirs() = fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName).sorted
    assert(dirs() == Seq("day=a%3Ab"))
    val r = ParquetMerge.compactPartitions(spark, dir, "day",
      targetFileBytes = 1L << 30, onlyPartitions = Some(Seq("a:b")))
    assert(r.map(x => (x.partition, x.filesBefore, x.filesAfter)) ==
      Seq(("a:b", 4, 1)))
    assert(dirs() == Seq("day=a%3Ab")) // same dir, no a%253Ab twin
    val got = spark.read.parquet(dir)
    assert(got.count() == 40 &&
      got.select("day").distinct().head().getString(0) == "a:b")
  }
}
