package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Bucket-count scaling measurement (round-13 verdict #5): the one
  * 100 TB claim TUNING.md carried without a number behind it is that
  * fold cost tracks the TOUCHED partition fraction — candidate
  * probes, LWW merges, and the compaction sweep are all
  * partition-scoped, so a batch landing in k of N state partitions
  * should cost ~O(batch + k·perPartitionOverhead), not O(N) and not
  * O(state). The x25 steady state cannot show it: a 4k-doc night's
  * pmod(id, 8..32) touches every partition.
  *
  * This driver measures the claim DIRECTLY. Protocol:
  *  1. build base state with `SPARK_GRAFT_BASE_NIGHTS` composite
  *     nightly folds (the x25 protocol's front third), under whatever
  *     `SPARK_GRAFT_STATE_PARTS` the sweep is probing;
  *  2. from the UNSEEN remainder of the corpus, assemble equal-SIZE
  *     batches whose ids are filtered to `pmod(id, StateParts) < k`
  *     for k in a doubling ladder (1, 2, 4, ..., StateParts) — same
  *     row count, different touched-partition count by construction;
  *  3. fold each through the same composite nightly and emit one JSON
  *     line per k: seconds, rows, touched partitions, state footprint.
  *
  * Flat-in-k cost ⇒ per-partition overhead is negligible at this
  * state size (the O(batch) term dominates); cost rising linearly to
  * ~2× between k = 1 and k = N bounds the per-touched-partition
  * coefficient the 100 TB design leans on. Run at several
  * SPARK_GRAFT_STATE_PARTS values (64/128/256) to also price the
  * partition-COUNT overhead of production layouts.
  *
  * Usage:
  *   SPARK_GRAFT_STATE_PARTS=64 SPARK_GRAFT_BASE_NIGHTS=8 \
  *     SPARK_GRAFT_CPUS=32 sbt "runMain graft.PartitionSweep \
  *     /tmp/stress_x25 sweep64.json"
  *
  * Measurement driver, like [[SteadyState]] — not a library path.
  */
object PartitionSweep {
  def main(args: Array[String]): Unit = {
    val Array(dir, outPath) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val baseNights = sys.env.get("SPARK_GRAFT_BASE_NIGHTS")
      .flatMap(_.toIntOption).getOrElse(8)
    val batchRows = sys.env.get("SPARK_GRAFT_SWEEP_ROWS")
      .flatMap(_.toIntOption).getOrElse(2000)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    def emit(kv: Map[String, Any]): Unit = {
      val line = kv.map {
        case (k, v: String) => s""""$k":${graft.util.Json.quote(v)}"""
        case (k, v) => s""""$k":$v"""
      }.mkString("{", ",", "}")
      println(s"SWEEP $line")
      sb.append(line).append('\n')
    }
    val parts = graft.pipeline.IncrementalCuration.StateParts
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang", "source")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = docs.count()
    // front half of the id space builds base state; the sweep batches
    // draw from the unseen back half so admission behavior is uniform
    // (same protocol as SteadyState's ascending-id nights)
    val idCut = docs.stat.approxQuantile("doc_id", Array(0.5), 0.001)(0)
    emit(Map("step" -> "corpus", "n_docs" -> n, "dir" -> dir,
      "state_parts" -> parts, "base_nights" -> baseNights,
      "batch_rows" -> batchRows, "id_cut" -> idCut.toLong))

    val rootP = Files.createTempDirectory("psweep")
    val root = rootP.toString + "/state"
    val base = docs.filter(col("doc_id") <= idCut.toLong)
    val cuts = base.stat.approxQuantile("doc_id",
      (1 to baseNights).map(_.toDouble / baseNights).toArray, 0.001)
      .map(_.toLong)
    var lo = Long.MinValue
    (1 to baseNights).foreach { night =>
      val hi = cuts(night - 1)
      val b = base.filter(col("doc_id") > lo && col("doc_id") <= hi)
      lo = hi
      val t0 = System.nanoTime()
      val r = graft.pipeline.IncrementalPipeline.nightly(spark, root, b,
        "text", "doc_id", batchNo = night.toLong)
      emit(Map("step" -> s"base_night_$night",
        "sec" -> math.round((System.nanoTime() - t0) / 1e6) / 1000.0,
        "n_batch" -> r.nBatch, "n_admitted" -> r.nAdmitted))
      try spark.catalog.clearCache() catch { case _: Throwable => () }
    }

    // the k-ladder: equal-row batches touching exactly k of the
    // StateParts curation partitions (ids filtered to the first k
    // pmod residues), each folded into its own pristine COPY of the
    // base state — per-copy the ascending-id convergence contract
    // holds (every back-half id exceeds the base max), steps can't
    // contaminate each other, and the state size under fold is
    // IDENTICAL across steps. The copy is a local walk of a
    // dimension-sized dir (~hundreds of small files), not measured.
    val rest = docs.filter(col("doc_id") > idCut.toLong)
    val ladder = Iterator.iterate(1)(_ * 2).takeWhile(_ < parts).toSeq :+ parts
    // equal size REQUIRES every step to fill its batch; the k=1 pool
    // (1/parts of the unseen half) is the binding constraint — clamp
    // rather than silently compare unequal batches
    val poolK1 = rest.filter(pmod(col("doc_id"), lit(parts.toLong)) === 0)
      .count()
    val rows = math.min(batchRows.toLong, poolK1).toInt
    if (rows < batchRows)
      emit(Map("step" -> "clamp", "requested" -> batchRows,
        "batch_rows_effective" -> rows, "pool_k1" -> poolK1))
    def copyDir(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      Files.walk(src).iterator().asScala.foreach { p =>
        val t = dst.resolve(src.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else { Files.createDirectories(t.getParent); Files.copy(p, t) }
      }
    }
    def rmDir(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (Files.exists(p))
        Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(q => { Files.deleteIfExists(q); () })
    }
    ladder.foreach { k =>
      val cand = rest.filter(
          pmod(col("doc_id"), lit(parts.toLong)) < k)
        .orderBy("doc_id").limit(rows)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val got = cand.count()
      val stepRootP = Files.createTempDirectory(s"psweep_k$k")
      val stepRoot = stepRootP.toString + "/state"
      copyDir(Paths.get(root), Paths.get(stepRoot))
      val t0 = System.nanoTime()
      val r = graft.pipeline.IncrementalPipeline.nightly(spark, stepRoot,
        cand, "text", "doc_id", batchNo = baseNights + 1L)
      val sec = (System.nanoTime() - t0) / 1e9
      cand.unpersist()
      emit(Map("step" -> s"touch_$k", "k" -> k,
        "sec" -> math.round(sec * 1000) / 1000.0,
        "n_batch" -> got, "n_admitted" -> r.nAdmitted))
      rmDir(stepRootP)
      try spark.catalog.clearCache() catch { case _: Throwable => () }
    }
    Files.write(Paths.get(outPath), sb.toString.getBytes)
    import scala.jdk.CollectionConverters._
    Files.walk(rootP).iterator().asScala.toSeq.reverse
      .foreach(p => { Files.deleteIfExists(p); () })
    docs.unpersist()
    spark.stop()
  }
}
