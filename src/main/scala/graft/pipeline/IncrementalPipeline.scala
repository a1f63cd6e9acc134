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
    IncrementalCuration.curateBatch(spark, dirs("curation"), b, text, id,
      batchNo, minQuality = minQuality,
      jaccardThreshold = jaccardThreshold)
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
}
