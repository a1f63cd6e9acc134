package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sink.ParquetMerge

/** Incrementally-maintained SimHash signature index — the sixth
  * instance of the repo's state-fold pattern
  * ([[graft.pipeline.IncrementalCuration]], [[IncrementalAnn]],
  * [[IncrementalBm25]], [[IncrementalWinnow]], [[IncrementalMinhash]]),
  * closing the dedup ladder: every signature family the reference-style
  * nightly pipeline could probe (n-gram postings, winnowing
  * fingerprints, BM25 postings, IVF cells, MinHash band buckets, and
  * now SimHash signatures) has a fold-maintained stored artifact.
  *
  * This is the LIGHTEST of the folds, and the only one whose probe
  * reads NO document text at all: the stored state is one 8-byte
  * signature per document (the engine-portable 32-bit
  * [[TextDedup.portableSimhashSig]], so the fold stays
  * oracle-verifiable — the DuckDB twin recomputes the identical bits),
  * and hamming distance is computed from signatures alone. A 10-billion
  * document corpus is an ~160 GB signature table; the nightly probe
  * signs only the day's batch map-side and joins it against the stored
  * table through the same pigeonhole chunk keys as the one-shot
  * matcher — O(batch·chunks) explode, one hash join, zero corpus
  * re-tokenization and zero text fetch.
  *
  * Signatures are a pure per-document function of the text, so the
  * folded table is batch-split invariant and a matcher pass over it
  * hash-matches the one-shot [[TextDedup.simhashPairsPortable]] twin
  * over the merged corpus — the fold ≡ rebuild property, enforced BY
  * HASH through `ns_simhash_incremental`.
  *
  * Layout at `dir`: `(part = pmod(xxhash64(doc), StateParts),
  * pk = doc, ver, doc, sim)` — one row per doc, LWW on re-fold.
  * Partitioning is by DOC identity, not by signature: the matcher
  * joins on pigeonhole chunk pieces (a map-side explode of `sim`), so
  * signature-value partitioning would co-locate nothing — while
  * doc-identity partitioning makes a re-crawled doc's new signature
  * land in the SAME partition as its stale row, which the
  * partition-scoped LWW merge then supersedes (re-sign-in-place is
  * safe here, unlike the exploded-row folds, whose contract routes
  * identity changes through the curation fold first).
  */
object IncrementalSimhash {

  val StateParts: Int = graft.util.StateConf.parts(8)

  /** Sign one batch map-side and fold the `(doc, sim)` rows into the
    * stored signature table. `batchNo` is the merge version; replays
    * re-merge idempotently (partition-scoped LWW).
    */
  /** RETRACT a doc set: drop their signature rows. Signatures are
    * per-doc-pure and the table is doc-identity-partitioned, so the
    * delete is a partition-pruned rewrite and the post-delete table
    * equals a fresh fold over the surviving docs exactly. The
    * partitions to open are DERIVED from the retract ids
    * (`part = pmod(xxhash64(doc), StateParts)` — the same
    * derived-partition filter the IVF/LSH retract faces use), so the
    * locate step never scans the corpus-sized table whatever
    * StateParts a large deployment raises it to.
    */
  def retractDocs(spark: SparkSession, dir: String,
                  docIds: org.apache.spark.sql.DataFrame,
                  id: String): Unit = {
    graft.util.StateConf.bind(spark, dir, StateParts)
    val x = docIds.select(col(id).as("doc")).distinct()
      .localCheckpoint(true)
    val parts = x.select(pmod(xxhash64(col("doc")),
        lit(StateParts.toLong)))
      .distinct().collect().map(_.getLong(0))
    if (parts.isEmpty) return
    val gone = spark.read.parquet(dir)
      .filter(col("part").isin(parts: _*))
      .join(x, Seq("doc"), "left_semi")
      .select("part", "pk").localCheckpoint(true)
    val none = spark.read.parquet(dir)
      .select("part", "pk", "ver", "doc", "sim").limit(0)
    ParquetMerge.deleteAndUpsertPartitions(spark, dir, gone, none,
      "part", "pk", "ver")
  }

  def fold(spark: SparkSession, dir: String, batch: DataFrame,
           text: String, id: String, batchNo: Long): Unit = {
    graft.util.StateConf.bind(spark, dir, StateParts)
    val rows = batch
      .select(col(id).as("doc"), TextDedup.tokens(col(text)).as("toks"))
      .select(col("doc"), TextDedup.portableSimhashSig("toks").as("sim"))
      .withColumn("part", pmod(xxhash64(col("doc")), lit(StateParts.toLong)))
      .withColumn("pk", col("doc").cast("string"))
      .withColumn("ver", lit(batchNo))
      .select("part", "pk", "ver", "doc", "sim")
    ParquetMerge.upsertPartitions(spark, dir, rows, "part", "pk", "ver")
    // exit-side bind: the first fold of a fresh root records its layout
    graft.util.StateConf.bind(spark, dir, StateParts)
  }

  /** Streaming face of [[fold]]: each micro-batch folds through the
    * same idempotent LWW merge, versioned by the streaming batchId
    * (checkpoint + LWW = effective exactly-once, the
    * [[IncrementalAnn.ivfFoldStream]] contract).
    */
  def foldStream(docs: DataFrame, dir: String, text: String, id: String,
                 checkpoint: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          fold(b.sparkSession, dir, b.toDF(), text, id,
            batchNo = batchId + 1L)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Stored signature rows, narrowed to the matcher's columns. */
  private def stored(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).select(col("doc"), col("sim"))

  /** All-pairs near-dup matches over the folded signature table — the
    * unchanged one-shot pigeonhole kernel reading stored signatures
    * instead of re-signing the corpus. Returns (id_a, id_b, hamming)
    * at hamming ≤ `maxHamming`; needs no document text.
    */
  def matches(spark: SparkSession, dir: String,
              maxHamming: Int = 3): DataFrame =
    TextDedup.simhashPairsFromSigs(stored(spark, dir), sigBits = 32,
      maxHamming)

  /** Ingest-time probe: which docs of a NEW batch simhash-near-dup the
    * folded corpus. Signs ONLY the batch; the corpus contributes its
    * stored signatures and is never read beyond them. Probe-only —
    * does NOT fold the batch; call [[fold]] after if it is admitted.
    *
    * Returns (doc_id, corpus_id, hamming) at hamming ≤ `maxHamming` —
    * the [[TextDedup.simhashCrossPortable]] contract with the corpus
    * side served from state.
    */
  def crossProbe(spark: SparkSession, dir: String, batch: DataFrame,
                 text: String, id: String,
                 maxHamming: Int = 3): DataFrame = {
    val batchSigs = batch
      .select(col(id).as("doc"), TextDedup.tokens(col(text)).as("toks"))
      .select(col("doc"), TextDedup.portableSimhashSig("toks").as("sim"))
    TextDedup.simhashCrossFromSigs(batchSigs, stored(spark, dir),
      maxHamming)
  }
}
