package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{IncrementalBm25, IncrementalMinhash, IncrementalSample,
  IncrementalSketch, IncrementalStats}

/** The composite NIGHTLY fold — the orchestration layer that makes the
  * incremental family one job instead of eight: a crawl batch goes
  * through curation ADMISSION ([[IncrementalCuration.curateBatch]] —
  * quality gate + exact dedup + near-dup tombstones against the
  * corpus state), and the docs that SURVIVE admission fold into every
  * maintained downstream artifact at the same `batchNo` version:
  * BM25 postings, MinHash band buckets, the CMS + grid-quantile +
  * per-source profiles, and the bottom-k sample.
  *
  * Why this composes exactly: the curation fold is keep-first under
  * ascending-id arrival — near-dup LOSERS are always the newer doc
  * (`IncrementalCuration`'s cross losers select `id_new`; intra
  * losers select `id_b`, the larger id) — so an admitted doc is NEVER
  * retroactively tombstoned by a later batch. Each index therefore
  * holds exactly the admitted docs of the batches folded so far, and
  * a probe over any index equals the one-shot build over
  * `IncrementalCuration.survivors` — the cross-fold consistency the
  * spec pins.
  *
  * Versioning: every sub-fold shares the caller's `batchNo`, so an
  * at-least-once redelivery replays through each sub-fold's own
  * idempotence clause (curation replay exemption, LWW delta rewrite,
  * set-semantic sample union, self-loop contraction). A crash between
  * sub-folds resumes by replaying the batch: completed sub-folds
  * no-op, missing ones fold — the same effective-exactly-once story
  * as the streaming faces.
  *
  * State layout under `root`: `curation/`, `bm25/`, `minhash/`,
  * `cms/`, `stats/`, `sample/` (+ the folds' own sidecar tables).
  */
object IncrementalPipeline {

  /** Per-fold admission/row report for the nightly log line. */
  final case class NightlyReport(batchNo: Long, nBatch: Long,
                                 nAdmitted: Long)

  /** Fold one batch end-to-end. `batch` carries `id`, `text`, and
    * optionally `lang`/`source` (defaulted when absent so the profile
    * and sample folds always run).
    */
  def nightly(spark: SparkSession, root: String, batch: DataFrame,
              text: String, id: String, batchNo: Long,
              minQuality: Double = 0.7, jaccardThreshold: Double = 0.3,
              sampleK: Int = 40): NightlyReport = {
    val dirs = Map(
      "curation" -> s"$root/curation", "bm25" -> s"$root/bm25",
      "minhash" -> s"$root/minhash", "cms" -> s"$root/cms",
      "stats" -> s"$root/stats", "sample" -> s"$root/sample")
    val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBatch = b.count()
    // RETRACTABLE curation (since the composite gained retractNightly):
    // same survivor semantics, plus the tombstone/edge state deletion
    // needs. The thin docmeta sidecar keeps every batch doc's
    // (lang, source, n_chars) — what the sample REBUILD and the
    // retraction-time negative folds need without re-crawling (text
    // itself lives in the curation state).
    IncrementalCuration.curateBatchRetractable(spark, dirs("curation"), b,
      text, id, batchNo, minQuality = minQuality,
      jaccardThreshold = jaccardThreshold)
    val metaRows = b
      .withColumn("lang",
        if (b.columns.contains("lang")) col("lang") else lit("und"))
      .withColumn("source",
        if (b.columns.contains("source")) col("source") else lit("crawl"))
      .withColumn("n_chars", length(col(text)).cast("long"))
      .withColumn("part", pmod(col(id), lit(8L)))
      .withColumn("ver", lit(batchNo))
      .select(col("part"), col(id), col("ver"), col("lang"),
        col("source"), col("n_chars"))
    graft.sink.ParquetMerge.upsertPartitions(spark, s"$root/docmeta",
      metaRows, "part", id, "ver")
    // the docs THIS batch admitted: survivor rows at this version
    // (keep-first means they are final; see the class doc)
    val admittedIds = spark.read.parquet(dirs("curation"))
      .filter(col("is_survivor") && col("ver") === batchNo)
      .select(col(id))
    val admitted = b.join(admittedIds, Seq(id), "left_semi")
      .withColumn("lang",
        if (b.columns.contains("lang")) col("lang") else lit("und"))
      .withColumn("source",
        if (b.columns.contains("source")) col("source") else lit("crawl"))
      .withColumn("n_chars", length(col(text)).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nAdmitted = admitted.count()
    if (nAdmitted > 0L) {
      IncrementalBm25.fold(spark, dirs("bm25"), admitted, text, id, batchNo)
      IncrementalMinhash.fold(spark, dirs("minhash"), admitted, text, id,
        batchNo)
      IncrementalSketch.cmsFold(spark, dirs("cms"), admitted, text, batchNo)
      IncrementalSketch.gridFold(spark, dirs("cms"), admitted, "n_chars",
        "source", batchNo)
      IncrementalStats.fold(spark, dirs("stats"), admitted, text, "source",
        batchNo)
      IncrementalSample.fold(spark, dirs("sample"), admitted, "lang", id,
        sampleK)
    }
    admitted.unpersist(); b.unpersist()
    NightlyReport(batchNo, nBatch, nAdmitted)
  }

  /** Streaming face: each micro-batch runs the whole nightly fold at
    * version batchId + 1 (checkpoint + per-fold idempotence =
    * effective exactly-once across the composite).
    */
  def nightlyStream(docs: DataFrame, root: String, text: String,
                    id: String, checkpoint: String,
                    minQuality: Double = 0.7,
                    jaccardThreshold: Double = 0.3, sampleK: Int = 40)
  : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          if (!b.isEmpty) {
            nightly(b.sparkSession, root, b.toDF(), text, id,
              batchNo = batchId + 1L, minQuality = minQuality,
              jaccardThreshold = jaccardThreshold, sampleK = sampleK)
            ()
          }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** RETRACT a doc set through EVERY maintained artifact — one delete
    * call propagates the right-to-be-forgotten request end to end,
    * and afterwards each index equals the one-shot build over the
    * admitted set of the never-retracted corpus:
    *
    *  1. [[IncrementalCuration.retract]] settles admission: exact
    *     promotion, tombstone resurrection, promoted-suppresses —
    *     membership can move BOTH ways (docs leave, docs enter).
    *  2. The admission DELTA (removals = was-admitted, no longer;
    *     additions = newly admitted, e.g. resurrected) drives each
    *     index: BM25 and MinHash drop posting/band rows of removals
    *     and fold additions; CMS/grid/profile take exact NEGATIVE
    *     delta rows for removals and positive folds for additions
    *     (their cells/sums are associative — subtraction is sound);
    *     the bottom-k sample REBUILDS from the docmeta sidecar (a
    *     bottom-k sketch is not subtractive — evicted candidates are
    *     gone — so shrink means recompute over O(corpus) thin rows,
    *     never text).
    *  3. Removal text is captured BEFORE the curation delete (a
    *     retracted doc's text must leave the corpus — it survives
    *     only inside this job's transient frames); `retractVer` is
    *     recorded as the curation retraction watermark so every later
    *     fold runs strictly above it — no version can collide with
    *     the retraction's own delta rows.
    *
    * `retractVer` must exceed every folded batch version. Quiesce the
    * nightly stream first (the [[IncrementalCuration.retract]]
    * replay contract).
    */
  def retractNightly(spark: SparkSession, root: String,
                     retractIds: DataFrame, text: String, id: String,
                     retractVer: Long, jaccardThreshold: Double = 0.3,
                     sampleK: Int = 40): Unit = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cur = s"$root/curation"
    val stBefore = spark.read.parquet(cur)
    val maxVer = stBefore.agg(max("ver")).head().getLong(0)
    require(retractVer > maxVer,
      s"retractVer $retractVer must exceed every folded version ($maxVer)")
    // and every PRIOR retraction version (pinned as the curation
    // watermark below) — reusing one would LWW-collide the negative
    // stats deltas of two different retractions
    val rwmP = new org.apache.hadoop.fs.Path(
      cur + IncrementalCuration.RetractWmSuffix)
    if (rwmP.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(rwmP)) {
      val rwm = spark.read
        .parquet(cur + IncrementalCuration.RetractWmSuffix)
        .agg(max("wm")).head().getLong(0)
      require(retractVer > rwm,
        s"retractVer $retractVer must exceed the prior retraction " +
          s"watermark $rwm")
    }
    val x = retractIds.select(col(id)).distinct().persist(lvl)
    val before = stBefore.filter(col("is_survivor")).select(col(id))
      .localCheckpoint(true)
    // capture retracted survivors' text NOW — the curation delete is
    // about to erase it, and the negative folds need it once more
    val xSurvText = stBefore.filter(col("is_survivor"))
      .join(x, Seq(id), "left_semi").select(col(id), col(text))
      .localCheckpoint(true)
    IncrementalCuration.retract(spark, cur, x, text, id,
      jaccardThreshold = jaccardThreshold)
    // pin the watermark AT retractVer (retract records max folded ver;
    // the composite needs later folds above ITS version too)
    spark.range(1).select(lit(retractVer).as("wm"))
      .write.mode("overwrite")
      .parquet(cur + IncrementalCuration.RetractWmSuffix)
    val stAfter = spark.read.parquet(cur)
    val after = stAfter.filter(col("is_survivor")).select(col(id))
      .localCheckpoint(true)
    val removals = before.join(after, Seq(id), "left_anti")
      .localCheckpoint(true)
    val additions = after.join(before, Seq(id), "left_anti")
      .localCheckpoint(true)
    // newly-fallen removals (not retracted themselves) keep their
    // state row — their text reads back; retracted ones were captured
    val removalDocs = stAfter.select(col(id), col(text))
      .join(removals, Seq(id), "left_semi")
      .unionByName(xSurvText.join(removals, Seq(id), "left_semi"))
      .localCheckpoint(true)
    val additionDocs = stAfter.select(col(id), col(text))
      .join(additions, Seq(id), "left_semi")
      .localCheckpoint(true)
    // docmeta loses the retracted rows (thin table, key-partitioned)
    val metaDir = s"$root/docmeta"
    val meta = spark.read.parquet(metaDir)
    val metaGone = meta.join(x, Seq(id), "left_semi")
      .select(col("part"), col(id)).localCheckpoint(true)
    val withMeta = (d: DataFrame) => d
      .join(meta.select(col(id), col("lang"), col("source"),
        col("n_chars")), Seq(id))
      .localCheckpoint(true)
    val remFull = withMeta(removalDocs)
    val addFull = withMeta(additionDocs)
    graft.sink.ParquetMerge.deleteAndUpsertPartitions(spark, metaDir,
      metaGone, meta.limit(0), "part", id, "ver")
    if (!removals.isEmpty) {
      IncrementalBm25.retractDocs(spark, s"$root/bm25", removals, id,
        retractVer)
      IncrementalMinhash.retractDocs(spark, s"$root/minhash", removals, id)
      IncrementalSketch.cmsRetract(spark, s"$root/cms", remFull, text,
        retractVer)
      IncrementalSketch.gridRetract(spark, s"$root/cms", remFull,
        "n_chars", "source", retractVer)
      IncrementalStats.retractFold(spark, s"$root/stats", remFull, text,
        "source", retractVer)
    }
    if (!additions.isEmpty) {
      IncrementalBm25.fold(spark, s"$root/bm25", addFull, text, id,
        retractVer)
      IncrementalMinhash.fold(spark, s"$root/minhash", addFull, text, id,
        retractVer)
      IncrementalSketch.cmsFold(spark, s"$root/cms", addFull, text,
        retractVer)
      IncrementalSketch.gridFold(spark, s"$root/cms", addFull, "n_chars",
        "source", retractVer)
      IncrementalStats.fold(spark, s"$root/stats", addFull, text,
        "source", retractVer)
    }
    // the sample is the one non-subtractive artifact: rebuild it from
    // the post-retraction admitted set's thin metadata
    IncrementalSample.rebuild(spark, s"$root/sample",
      spark.read.parquet(metaDir).join(after, Seq(id), "left_semi")
        .select(col("lang"), col(id)),
      "lang", id, sampleK)
    x.unpersist()
  }
}
