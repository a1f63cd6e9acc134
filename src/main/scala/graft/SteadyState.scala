package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Multi-night STEADY-STATE stress driver (round-12 verdict #6): every
  * other stress row prices fold-from-empty, so the O(batch) nightly
  * contract — cost per night flat as state accumulates — was design
  * reading, not measurement. This main runs N sequential composite
  * nightly folds (plus periodic retractions) into ONE persistent state
  * root and emits one JSON line per night: wall seconds, admitted
  * rows, and the state's total parquet file/byte footprint — the
  * cost curve TUNING.md's steady-state table records.
  *
  *  - A FLAT per-night curve = the fold contract holds (each night
  *    touches O(batch) + fixed per-table partition overhead).
  *  - A RISING curve = state-scan creep or small-file growth — the
  *    failure mode the in-nightly compaction (round-13, task 3) is
  *    wired to prevent; run with SPARK_GRAFT_COMPACT=0 to measure the
  *    counterfactual file growth.
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 SPARK_GRAFT_NIGHTS=30 SPARK_GRAFT_RETRACTS=3 \
  *     SPARK_GRAFT_COMPACT=1 SPARK_DRIVER_MEM=24g \
  *     sbt "runMain graft.SteadyState <corpusDir> <outJson>"
  *
  * Batches split the corpus by contiguous id range (the ascending-id
  * arrival contract); retractions delete every 11th id of the oldest
  * still-present night's range at evenly spaced points, exercising
  * promotion/resurrection against OLD state — the expensive direction.
  *
  * SPARK_GRAFT_STEADY_EMBED=1 runs the EMBEDDING-side composite
  * instead (`nightlyEmbed` over the embeddings table: night 0 trains
  * + freezes the quantizers, later nights fold semdedup + IVF + PQ +
  * LSH; retractions via `retractNightlyEmbed`).
  */
object SteadyState {
  def main(args: Array[String]): Unit = {
    val Array(dir, outPath) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nights = sys.env.get("SPARK_GRAFT_NIGHTS")
      .flatMap(_.toIntOption).getOrElse(30)
    val nRetracts = sys.env.get("SPARK_GRAFT_RETRACTS")
      .flatMap(_.toIntOption).getOrElse(3)
    val compact = sys.env.getOrElse("SPARK_GRAFT_COMPACT", "1") == "1"
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
      println(s"STEADY $line")
      sb.append(line).append('\n')
    }
    // state footprint: total parquet files/bytes under the root — the
    // quantity compaction bounds (driver-side walk; the state root is
    // O(tables × partitions × files), a dimension)
    def footprint(root: java.nio.file.Path): (Long, Long) = {
      import scala.jdk.CollectionConverters._
      if (!Files.exists(root)) return (0L, 0L)
      val fs = Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(p => Files.size(p)).toSeq
      (fs.size.toLong, fs.sum)
    }

    val embedMode = sys.env.getOrElse("SPARK_GRAFT_STEADY_EMBED", "0") == "1"
    val idCol = if (embedMode) "vec_id" else "doc_id"
    val docs = (if (embedMode)
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select("vec_id", "embedding")
    else
      spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text", "lang", "source"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // night cuts at id QUANTILES, not uniform id ranges: stress
    // corpora carry sparse remapped ids, and a range split would give
    // most nights zero rows. ntile keeps the ascending-id arrival
    // contract and equal-sized nights. (Global window — fine for a
    // measurement driver; cuts are a dimension.)
    val w = org.apache.spark.sql.expressions.Window.orderBy(idCol)
    val cuts = docs.select(col(idCol),
        ntile(nights).over(w).as("night"))
      .groupBy("night").agg(max(idCol).as("cut"))
      .orderBy("night").collect().map(_.getLong(1))
    emit(Map("step" -> "corpus", "n_docs" -> docs.count(), "dir" -> dir,
      "nights" -> nights, "retracts" -> nRetracts, "compact" -> compact,
      "mode" -> (if (embedMode) "embed" else "text")))

    val rootP = Files.createTempDirectory("steady")
    val root = rootP.toString + "/state"
    val retractAt =
      if (nRetracts <= 0) Set.empty[Int]
      else (1 to nRetracts).map(i => i * nights / (nRetracts + 1))
        .filter(_ >= 1).toSet
    // the embed composite numbers nights from 0 (night 0 = the init
    // night that trains + freezes the quantizers)
    var ver = if (embedMode) -1L else 0L
    var totalSec = 0.0
    val warmRetract =
      sys.env.getOrElse("SPARK_GRAFT_WARM_RETRACT", "0") == "1"
    var warmRetractDone = false
    (1 to nights).foreach { night =>
      ver += 1L
      val lo = if (night == 1) Long.MinValue else cuts(night - 2)
      val batch = docs.filter(col(idCol) > lo &&
        col(idCol) <= cuts(night - 1))
      val t0 = System.nanoTime()
      val (nBatch, nAdmitted, nCompacted) =
        if (embedMode) {
          val r = graft.pipeline.IncrementalPipeline.nightlyEmbed(spark,
            root, batch, "vec_id", "embedding", batchNo = ver,
            compact = compact)
          (r.nBatch, r.nAdmitted, r.compaction.size)
        } else {
          val r = graft.pipeline.IncrementalPipeline.nightly(spark, root,
            batch, "text", "doc_id", batchNo = ver, compact = compact)
          (r.nBatch, r.nAdmitted, r.compaction.size)
        }
      val sec = (System.nanoTime() - t0) / 1e9
      totalSec += sec
      val (nf, nb) = footprint(Paths.get(root))
      emit(Map("step" -> s"night_$night", "sec" -> math.round(sec * 1000) / 1000.0,
        "n_batch" -> nBatch, "n_admitted" -> nAdmitted,
        "files" -> nf, "bytes" -> nb,
        "compacted_parts" -> nCompacted))
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      if (retractAt.contains(night)) {
        // Warm-twin instrumentation (round-13 verdict #6): the x25 run
        // priced the FIRST retraction at 309.8 s vs 53-54 s for the
        // later two. SPARK_GRAFT_WARM_RETRACT=1 runs a single-id
        // retraction immediately before the first real one: it walks
        // every retraction code path (curation delete, CC
        // re-contraction, negative index folds) with a trivial
        // promotion load, so its cost ≈ the one-time codegen/JIT
        // share. If the real retraction right after it still costs
        // ~300 s, the gap is promotion settling, not JIT.
        if (warmRetract && !warmRetractDone) {
          warmRetractDone = true
          ver += 1L
          val one = docs.filter(col(idCol) <= cuts(0) &&
              col(idCol) % 11 =!= night.toLong % 11)
            .select(idCol).orderBy(idCol).limit(1)
          val tw = System.nanoTime()
          if (embedMode)
            graft.pipeline.IncrementalPipeline.retractNightlyEmbed(spark,
              root, one, "vec_id", "embedding", retractVer = ver)
          else
            graft.pipeline.IncrementalPipeline.retractNightly(spark, root,
              one, "text", "doc_id", retractVer = ver)
          val wsec = (System.nanoTime() - tw) / 1e9
          totalSec += wsec
          emit(Map("step" -> "retract_warmup",
            "sec" -> math.round(wsec * 1000) / 1000.0))
          try spark.catalog.clearCache() catch { case _: Throwable => () }
        }
        ver += 1L
        // every 11th id of the OLDEST night's range still present —
        // old-state deletes exercise promotion/resurrection against
        // maximal accumulated state
        val x = docs.filter(col(idCol) <= cuts(0) &&
            col(idCol) % 11 === night.toLong % 11)
          .select(idCol)
        val t1 = System.nanoTime()
        if (embedMode)
          graft.pipeline.IncrementalPipeline.retractNightlyEmbed(spark,
            root, x, "vec_id", "embedding", retractVer = ver)
        else
          graft.pipeline.IncrementalPipeline.retractNightly(spark, root,
            x, "text", "doc_id", retractVer = ver)
        val rsec = (System.nanoTime() - t1) / 1e9
        totalSec += rsec
        val (rf, rb) = footprint(Paths.get(root))
        emit(Map("step" -> s"retract_after_$night",
          "sec" -> math.round(rsec * 1000) / 1000.0,
          "files" -> rf, "bytes" -> rb))
        try spark.catalog.clearCache() catch { case _: Throwable => () }
      }
    }
    // the steady-state verdict numbers: first-vs-last thirds of the
    // night curve (flat ⇒ ratio ≈ 1) and the final footprint
    val (ff, fb) = footprint(Paths.get(root))
    emit(Map("step" -> "summary", "total_sec" -> math.round(totalSec * 10) / 10.0,
      "files_final" -> ff, "bytes_final" -> fb))
    Files.write(Paths.get(outPath), sb.toString.getBytes)
    // keep nothing: the state root is a measurement artifact
    import scala.jdk.CollectionConverters._
    Files.walk(rootP).iterator().asScala.toSeq.reverse
      .foreach(p => { Files.deleteIfExists(p); () })
    docs.unpersist()
    spark.stop()
  }
}
