package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{IncrementalAnn, IncrementalBm25, IncrementalClusters,
  IncrementalDsir, IncrementalLsh, IncrementalMinhash, IncrementalSample,
  IncrementalSemDedup, IncrementalSimhash, IncrementalSketch,
  IncrementalStats, IncrementalWinnow}
import graft.sink.ParquetMerge

/** The composite NIGHTLY fold — the orchestration layer that makes the
  * incremental family one job instead of eleven: a crawl batch goes
  * through curation ADMISSION ([[IncrementalCuration.curateBatch]] —
  * quality gate + exact dedup + near-dup tombstones against the
  * corpus state), and the docs that SURVIVE admission fold into every
  * maintained downstream artifact at the same `batchNo` version:
  * BM25 postings, MinHash band buckets, SimHash signatures, winnowing
  * fingerprints, the CMS + grid-quantile + per-source profiles, and
  * the bottom-k sample — plus the batch's near-dup PAIR EDGES fold
  * into the connected-component labeling (clusters are over the pair
  * graph, not the admitted set, so the CC fold runs even on a night
  * where every batch doc lost its pairing).
  *
  * Why this composes exactly: the curation fold is keep-first under
  * ascending-id arrival — near-dup LOSERS are always the newer doc
  * (`IncrementalCuration`'s cross losers select `id_new`; intra
  * losers select `id_b`, the larger id) — so an admitted doc is NEVER
  * retroactively tombstoned by a later batch. Each index therefore
  * holds exactly the admitted docs of the batches folded so far, and
  * a probe over any index equals the one-shot build over
  * `IncrementalCuration.survivors` — the cross-fold consistency the
  * spec pins. The CC labeling holds the min-id contraction over the
  * union of every batch's edges — equal to the one-shot contraction
  * over the full maintained edge table (min-label composition).
  *
  * Versioning: every sub-fold shares the caller's `batchNo`, so an
  * at-least-once redelivery replays through each sub-fold's own
  * idempotence clause (curation replay exemption, LWW delta rewrite,
  * set-semantic sample union, self-loop contraction). A crash between
  * sub-folds resumes by replaying the batch: completed sub-folds
  * no-op, missing ones fold — the same effective-exactly-once story
  * as the streaming faces.
  *
  * MAINTENANCE is part of the nightly, not a separate job: after the
  * sub-folds, every partitioned state table runs a small-file
  * compaction pass ([[ParquetMerge.compactPartitions]]). No
  * touched-partition list is threaded through — none is needed: the
  * pass rewrites ONLY partitions whose file count exceeds what their
  * bytes justify, and a partition this nightly did NOT touch was left
  * compacted by the last nightly that did, so it skips on the listing
  * alone. In steady state the sweep therefore does exactly
  * touched-partition work (each touched partition was just rewritten
  * by its fold's dynamic-overwrite as N task files; compaction folds
  * them to `ceil(bytes/target)`), plus one O(partitions) directory
  * listing per table — the lakehouse contract that partition count is
  * a dimension, not a fact. Reports surface in the
  * [[NightlyReport]]. Disable with `compact = false` when an external
  * table service owns maintenance.
  *
  * State layout under `root`: `curation/` (+ `_edges`), `docmeta/`,
  * `bm25/`, `minhash/`, `simhash/`, `winnow/`, `cc/` (+ `_redir`),
  * `cms/` (+ `_vocab`, `_grid`), `stats/`, `sample/`.
  */
object IncrementalPipeline {

  /** Per-fold admission/row report for the nightly log line, plus the
    * compaction decisions the maintenance pass took (table-qualified
    * partition names; rewritten partitions only — skips are silent).
    */
  final case class NightlyReport(batchNo: Long, nBatch: Long,
                                 nAdmitted: Long,
                                 compaction: Seq[ParquetMerge.CompactionReport]
                                 = Seq.empty)

  private def exists(spark: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).exists(hp)
  }

  /** The partitioned state tables a text nightly maintains under
    * `root` — the compaction sweep's worklist. */
  private def textTables(root: String): Seq[String] = {
    val cur = s"$root/curation"
    Seq(cur, cur + IncrementalCuration.EdgesSuffix, s"$root/docmeta",
      s"$root/bm25", s"$root/bm25" + IncrementalBm25.StatsSuffix,
      s"$root/minhash", s"$root/simhash", s"$root/winnow",
      s"$root/cc", s"$root/cc" + IncrementalClusters.RedirectSuffix,
      s"$root/cms", s"$root/cms" + IncrementalSketch.VocabSuffix,
      s"$root/cms" + IncrementalSketch.GridSuffix, s"$root/stats",
      s"$root/dsir")
  }

  /** The in-nightly maintenance sweep — EAGER by design (`minFiles =
    * 2`: any partition with a delta file rewrites). The x25
    * steady-state A/B (TUNING.md) tested the amortization alternative
    * (`minFiles = 4`, each partition carries up to 3 delta files
    * before rewriting) and it LOST: 30-night total 3097 s vs 2830 s,
    * last-third median 90.5 s vs 71.5 s — every fold and probe reads
    * the state tables, so the read amplification of the extra delta
    * files outweighs the saved rewrite volume. The knob stays for
    * deployments whose read:write ratio differs; the measured default
    * is eager.
    */
  private def compactSweep(spark: SparkSession, tables: Seq[String],
                           minFiles: Int = 2)
  : Seq[ParquetMerge.CompactionReport] =
    tables.flatMap { t =>
      ParquetMerge.compactPartitions(spark, t, "part", minFiles = minFiles)
        .filter(_.filesAfter > 0)
        .map(r => r.copy(partition = s"$t#${r.partition}"))
    }

  /** Fold one batch end-to-end. `batch` carries `id`, `text`, and
    * optionally `lang`/`source` (defaulted when absent so the profile
    * and sample folds always run).
    */
  def nightly(spark: SparkSession, root: String, batch: DataFrame,
              text: String, id: String, batchNo: Long,
              minQuality: Double = 0.7, jaccardThreshold: Double = 0.3,
              sampleK: Int = 40, compact: Boolean = true,
              dsirTargetLang: String = "en"): NightlyReport = {
    val dirs = Map(
      "curation" -> s"$root/curation", "bm25" -> s"$root/bm25",
      "minhash" -> s"$root/minhash", "simhash" -> s"$root/simhash",
      "winnow" -> s"$root/winnow", "cc" -> s"$root/cc",
      "cms" -> s"$root/cms", "stats" -> s"$root/stats",
      "sample" -> s"$root/sample", "dsir" -> s"$root/dsir")
    val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBatch = b.count()
    // an empty crawl night is a semantic no-op for every fold (the
    // quality gate admits nothing, no edges form) — skip rather than
    // pay the curation fold's state-side probe for zero batch rows
    if (nBatch == 0L) {
      b.unpersist()
      return NightlyReport(batchNo, 0L, 0L)
    }
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
      IncrementalSimhash.fold(spark, dirs("simhash"), admitted, text, id,
        batchNo)
      IncrementalWinnow.fold(spark, dirs("winnow"), admitted, text, id,
        batchNo)
      IncrementalSketch.cmsFold(spark, dirs("cms"), admitted, text, batchNo)
      IncrementalSketch.gridFold(spark, dirs("cms"), admitted, "n_chars",
        "source", batchNo)
      IncrementalStats.fold(spark, dirs("stats"), admitted, text, "source",
        batchNo)
      IncrementalSample.fold(spark, dirs("sample"), admitted, "lang", id,
        sampleK)
      // the DSIR selection model: raw counts from every admitted doc,
      // target counts from the target-language slice — the importance
      // scorer stays current with the corpus the nightly curates
      IncrementalDsir.fold(spark, dirs("dsir"), admitted, text, id,
        col("lang") === dsirTargetLang, batchNo)
    }
    // the CC labeling folds THIS batch's pair edges (the curation fold
    // just wrote them at ver = batchNo) — outside the admitted guard:
    // a night where every batch doc lost still produced edges, and
    // those edges are exactly what the labeling must learn. A replay
    // re-reads the identical LWW-rewritten edges and contracts to
    // self-loops (no-op).
    val edgesDir = dirs("curation") + IncrementalCuration.EdgesSuffix
    if (exists(spark, edgesDir)) {
      val batchEdges = spark.read.parquet(edgesDir)
        .filter(col("ver") === batchNo).select("id_a", "id_b")
      IncrementalClusters.fold(spark, dirs("cc"), batchEdges, batchNo)
    }
    admitted.unpersist(); b.unpersist()
    val reports =
      if (compact) compactSweep(spark, textTables(root)) else Seq.empty
    NightlyReport(batchNo, nBatch, nAdmitted, reports)
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
    *     index: BM25, MinHash, SimHash and winnowing drop
    *     posting/band/signature/fingerprint rows of removals and fold
    *     additions; CMS/grid/profile take exact NEGATIVE delta rows
    *     for removals and positive folds for additions (their
    *     cells/sums are associative — subtraction is sound); the
    *     bottom-k sample REBUILDS from the docmeta sidecar (a
    *     bottom-k sketch is not subtractive — evicted candidates are
    *     gone — so shrink means recompute over O(corpus) thin rows,
    *     never text).
    *  3. The CC labeling takes the EDGE delta, not the admission
    *     delta (clusters live over the pair graph): the surviving old
    *     edges (minus everything touching the retracted set) drive
    *     [[IncrementalClusters.retract]]'s affected-component
    *     re-contraction, and the retraction's FRESH promotion edges
    *     fold in after at `retractVer` — composing to the one-shot
    *     contraction over the post-retraction edge table.
    *  4. Removal text is captured BEFORE the curation delete (a
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
                     sampleK: Int = 40,
                     dsirTargetLang: String = "en",
                     compact: Boolean = true): Unit = {
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
    // the surviving OLD pair edges, pinned BEFORE the curation delete
    // rewrites the edge table — the CC re-contraction's edge set
    val edgesDir = cur + IncrementalCuration.EdgesSuffix
    val emptyEdges = spark.range(0)
      .select(col("id").as("id_a"), col("id").as("id_b"))
    val liveOld: DataFrame =
      if (exists(spark, edgesDir))
        spark.read.parquet(edgesDir).select("id_a", "id_b")
          .join(x.withColumnRenamed(id, "id_a"), Seq("id_a"), "left_anti")
          .join(x.withColumnRenamed(id, "id_b"), Seq("id_b"), "left_anti")
          .localCheckpoint(true)
      else emptyEdges
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
      if (exists(spark, s"$root/simhash"))
        IncrementalSimhash.retractDocs(spark, s"$root/simhash", removals, id)
      if (exists(spark, s"$root/winnow"))
        IncrementalWinnow.retractDocs(spark, s"$root/winnow", removals, id)
      IncrementalSketch.cmsRetract(spark, s"$root/cms", remFull, text,
        retractVer)
      IncrementalSketch.gridRetract(spark, s"$root/cms", remFull,
        "n_chars", "source", retractVer)
      IncrementalStats.retractFold(spark, s"$root/stats", remFull, text,
        "source", retractVer)
      if (exists(spark, s"$root/dsir"))
        IncrementalDsir.retractDocs(spark, s"$root/dsir", remFull, text,
          id, col("lang") === dsirTargetLang, retractVer)
    }
    if (!additions.isEmpty) {
      IncrementalBm25.fold(spark, s"$root/bm25", addFull, text, id,
        retractVer)
      IncrementalMinhash.fold(spark, s"$root/minhash", addFull, text, id,
        retractVer)
      IncrementalSimhash.fold(spark, s"$root/simhash", addFull, text, id,
        retractVer)
      IncrementalWinnow.fold(spark, s"$root/winnow", addFull, text, id,
        retractVer)
      IncrementalSketch.cmsFold(spark, s"$root/cms", addFull, text,
        retractVer)
      IncrementalSketch.gridFold(spark, s"$root/cms", addFull, "n_chars",
        "source", retractVer)
      IncrementalStats.fold(spark, s"$root/stats", addFull, text,
        "source", retractVer)
      if (exists(spark, s"$root/dsir"))
        IncrementalDsir.fold(spark, s"$root/dsir", addFull, text, id,
          col("lang") === dsirTargetLang, retractVer)
    }
    // CC: remove the retracted nodes over the PINNED surviving-old
    // edge set (every removed edge lies inside an affected component —
    // its endpoints were connected), then fold the retraction's fresh
    // promotion edges; min-label composition makes the result the
    // one-shot contraction over the post-retraction edge table
    val ccDir = s"$root/cc"
    if (exists(spark, ccDir)) {
      IncrementalClusters.retract(spark, ccDir, x, liveOld)
      val newEdges: DataFrame =
        if (exists(spark, edgesDir))
          spark.read.parquet(edgesDir).select("id_a", "id_b")
            .join(liveOld, Seq("id_a", "id_b"), "left_anti")
            .localCheckpoint(true)
        else emptyEdges
      if (!newEdges.isEmpty)
        IncrementalClusters.fold(spark, ccDir, newEdges, retractVer)
    }
    // the sample is the one non-subtractive artifact: rebuild it from
    // the post-retraction admitted set's thin metadata
    IncrementalSample.rebuild(spark, s"$root/sample",
      spark.read.parquet(metaDir).join(after, Seq(id), "left_semi")
        .select(col("lang"), col(id)),
      "lang", id, sampleK)
    // sweep HERE, not on the next night: a retraction writes one
    // negative-delta file per touched (table, partition) — at
    // StateParts = 64 the r14 x25 run measured 419 → 1,301 files,
    // and the NEXT two nights paid the read amplification (279 s /
    // 700 s vs a ~100 s steady night). The cleanup belongs in the
    // retraction's own accounting.
    if (compact) { compactSweep(spark, textTables(root)); () }
    x.unpersist()
  }

  /** Per-night report of the EMBEDDING-side composite: batch/admitted
    * counts, the night's IVF drift ratio (the re-train trigger — a
    * value ≫ 1 means the frozen quantizer no longer fits the
    * distribution; see [[IncrementalAnn.ivfRetrain]]), and the
    * maintenance pass's compaction decisions.
    */
  final case class EmbedNightlyReport(batchNo: Long, nBatch: Long,
                                      nAdmitted: Long, driftRatio: Double,
                                      compaction: Seq[ParquetMerge.CompactionReport]
                                      = Seq.empty)

  private def embedTables(root: String): Seq[String] =
    Seq(s"$root/semdedup",
      s"$root/semdedup" + IncrementalSemDedup.CellStatsSuffix,
      s"$root/ivf", s"$root/ivf" + IncrementalAnn.AuditSuffix,
      s"$root/pq", s"$root/lsh",
      s"$root/lsh" + IncrementalLsh.VecsSuffix)

  /** The EMBEDDING-side nightly — the sibling composite for the vector
    * half of a training-data pipeline: a batch of embeddings goes
    * through SemDedup ADMISSION ([[IncrementalSemDedup.fold]] —
    * cell-bucketed dominance against the corpus state), and the
    * vectors that SURVIVE fold into EVERY maintained ANN artifact at
    * the same version: the IVF assignment table, the PQ code table
    * (frozen quantizers, O(batch) folds), and the multi-table LSH
    * bucket index ([[IncrementalLsh]] — the best-recall tier, no
    * training, folds from night 0). The per-night drift audit row is
    * surfaced in the report — the operational re-train trigger.
    *
    * NIGHT 0 is the INIT night: it trains the IVF centroids and PQ
    * codebooks on the first batch's admitted vectors and freezes them
    * ([[IncrementalAnn.ivfInit]]/[[IncrementalAnn.pqInit]] — both
    * replay-safe, so a crashed init re-delivers idempotently). Later
    * nights fold at `batchNo >= 1` against the frozen quantizers.
    * Same composition argument as the text nightly: dominance is
    * keep-first under ascending-id arrival, so an admitted vector is
    * never retroactively tombstoned and each index holds exactly the
    * admitted vectors folded so far.
    *
    * State layout under `root`: `semdedup/` (+ `_cells`), `ivf/`
    * (+ `_centroids`, `_audit`), `pq/` (+ `_codebooks`).
    */
  def nightlyEmbed(spark: SparkSession, root: String, batch: DataFrame,
                   id: String, vec: String, batchNo: Long,
                   signBits: Int = 4, threshold: Double = 0.45,
                   maxCell: Long = 100000L, nLists: Int = 16, m: Int = 8,
                   kCent: Int = 16, seed: Long = 42L,
                   lshBits: Int = 6, lshTables: Int = 4,
                   compact: Boolean = true): EmbedNightlyReport = {
    val sem = s"$root/semdedup"
    val ivf = s"$root/ivf"
    val pq = s"$root/pq"
    val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBatch = b.count()
    IncrementalSemDedup.fold(spark, sem, b, id, vec, batchNo,
      signBits = signBits, threshold = threshold, maxCell = maxCell)
    // this batch's admitted vectors: survivor rows at this version
    // (keep-first dominance means they are final — class doc)
    val admitted = spark.read.parquet(sem)
      .filter(col("is_survivor") && col("ver") === batchNo)
      .select(col("vid").as(id), col("vec").as(vec))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nAdmitted = admitted.count()
    val centExists = exists(spark, ivf + IncrementalAnn.CentroidsSuffix)
    if (!centExists || batchNo == 0L) {
      require(batchNo == 0L,
        s"no trained quantizers at $ivf — the first embed night must " +
          s"run at batchNo 0 (the init night); got batchNo $batchNo")
      require(nAdmitted > 0L,
        "init night admitted no vectors — cannot train the quantizers")
      IncrementalAnn.ivfInit(spark, ivf, admitted, id, vec, nLists, seed)
      IncrementalAnn.pqInit(spark, pq, admitted, id, vec, m, kCent, seed)
    } else if (nAdmitted > 0L) {
      IncrementalAnn.ivfFold(spark, ivf, admitted, id, vec, batchNo)
      IncrementalAnn.pqFold(spark, pq, admitted, id, vec, batchNo)
    }
    // the LSH tier needs no training, so it folds every night
    // including night 0 — geometry is frozen by its own config table
    if (nAdmitted > 0L)
      IncrementalLsh.fold(spark, s"$root/lsh", admitted, id, vec,
        batchNo, bits = lshBits, tables = lshTables)
    admitted.unpersist(); b.unpersist()
    // the night's drift signal: the latest FOLD audit row (negative
    // batch_no rows are retraction decrements, not fits)
    val driftRow = IncrementalAnn.ivfAudit(spark, ivf)
      .filter(col("batch_no") >= 0L)
      .orderBy(desc("batch_no")).select("drift_ratio").limit(1).head()
    val reports =
      if (compact) compactSweep(spark, embedTables(root)) else Seq.empty
    EmbedNightlyReport(batchNo, nBatch, nAdmitted,
      driftRow.getDouble(0), reports)
  }

  /** Streaming face of [[nightlyEmbed]]: micro-batch 0 is the init
    * night (trains + freezes the quantizers), later micro-batches
    * fold — checkpoint + per-fold idempotence (and the replay-safe
    * inits) = effective exactly-once across the composite.
    */
  def nightlyEmbedStream(emb: DataFrame, root: String, id: String,
                         vec: String, checkpoint: String,
                         signBits: Int = 4, threshold: Double = 0.45,
                         maxCell: Long = 100000L, nLists: Int = 16,
                         m: Int = 8, kCent: Int = 16, seed: Long = 42L)
  : org.apache.spark.sql.streaming.StreamingQuery =
    emb.writeStream
      .foreachBatch {
        (mb: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          if (!mb.isEmpty) {
            nightlyEmbed(mb.sparkSession, root, mb.toDF(), id, vec,
              batchNo = batchId, signBits = signBits,
              threshold = threshold, maxCell = maxCell, nLists = nLists,
              m = m, kCent = kCent, seed = seed)
            ()
          }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** RETRACT a vector set through the embedding-side composite:
    * [[IncrementalSemDedup.retract]] settles admission (vectors
    * suppressed solely by retracted dominators RESURRECT — additions;
    * retracted survivors leave — removals), and the delta drives
    * every ANN artifact: removals delete from the IVF assignment, PQ
    * code and LSH bucket/vector tables (all partition-pruned; IVF/PQ
    * audit-decremented), additions fold in against the frozen
    * quantizers/geometry at `retractVer`. Afterwards each artifact
    * equals the one-shot build over the admitted set of the
    * never-retracted corpus.
    *
    * `retractVer` must exceed every folded batch version; quiesce the
    * embed stream first (the SemDedup retraction watermark makes
    * pre-retraction replays fail loudly).
    */
  def retractNightlyEmbed(spark: SparkSession, root: String,
                          retractIds: DataFrame, id: String, vec: String,
                          retractVer: Long,
                          threshold: Double = 0.45,
                          compact: Boolean = true): Unit = {
    val sem = s"$root/semdedup"
    val st = spark.read.parquet(sem)
    val maxVer = st.agg(max("ver")).head().getLong(0)
    require(retractVer > maxVer,
      s"retractVer $retractVer must exceed every folded version ($maxVer)")
    val before = st.filter(col("is_survivor")).select("vid")
      .localCheckpoint(true)
    IncrementalSemDedup.retract(spark, sem, retractIds, id,
      threshold = threshold)
    val stAfter = spark.read.parquet(sem)
    val after = stAfter.filter(col("is_survivor")).select("vid")
      .localCheckpoint(true)
    val removals = before.join(after, Seq("vid"), "left_anti")
      .select(col("vid").as(id)).localCheckpoint(true)
    val additions = after.join(before, Seq("vid"), "left_anti")
      .localCheckpoint(true)
    if (!removals.isEmpty) {
      IncrementalAnn.ivfRetract(spark, s"$root/ivf", removals, id,
        retractVer)
      IncrementalAnn.ivfRetract(spark, s"$root/pq", removals, id,
        retractVer)
      if (exists(spark, s"$root/lsh"))
        IncrementalLsh.retract(spark, s"$root/lsh", removals, id)
    }
    if (!additions.isEmpty) {
      // resurrected vectors re-read from the SemDedup state (it keeps
      // every seen vector precisely for fate recomputes)
      val addVecs = stAfter.join(additions, Seq("vid"), "left_semi")
        .select(col("vid").as(id), col("vec").as(vec))
        .localCheckpoint(true)
      IncrementalAnn.ivfFold(spark, s"$root/ivf", addVecs, id, vec,
        retractVer)
      IncrementalAnn.pqFold(spark, s"$root/pq", addVecs, id, vec,
        retractVer)
      if (exists(spark, s"$root/lsh")) {
        val (gb, gt) = IncrementalLsh.geometry(spark, s"$root/lsh")
        IncrementalLsh.fold(spark, s"$root/lsh", addVecs, id, vec,
          retractVer, bits = gb, tables = gt)
      }
    }
    // same post-retraction sweep rule as retractNightly: the delete's
    // per-(table, partition) delta files are this operation's cost,
    // not the next fold's
    if (compact) { compactSweep(spark, embedTables(root)); () }
  }
}
