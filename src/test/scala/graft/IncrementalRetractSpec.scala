package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Curation, IncrementalCuration}

/** Retraction (right-to-be-forgotten) over the retractable curation
  * fold: after `retract(X)` the state must equal the from-scratch
  * rebuild over everything EXCEPT X — exact-group promotion,
  * tombstone resurrection, and promoted-suppresses-younger all
  * engage, sequential retractions compose, and pre-retraction
  * replays are rejected loudly.
  */
class IncrementalRetractSpec extends SparkSpec {
  import spark.implicits._

  // the IncrementalPipelineSpec jaccard geometry: 20-word docs around
  // a fixed 12-word middle; prefix/suffix edits tune pairwise jaccard
  private val mid =
    "delta the foxtrot golf hotel the juliet kilo lima mike november oscar"
  private val d1t = s"alpha bravo charlie dingo $mid papa quebec romeo sierra"
  private val d2t = s"alpha bravo charlie dingo $mid tango uniform victor whiskey"
  private val d4t = s"yankee zulu aardvark badger $mid tango uniform victor whiskey"
  private val d3t = "one two three four " + mid + " five six seven eight"
  private val d7t = "red blue green cyan " + mid + " pink gray black white"
  // d8: NORMALIZED-equal to d1 (commas strip away) but its RAW tokens
  // differ, so its shingle profile is its own — the promotion case
  private val d8t = s"alpha, bravo, charlie, dingo, $mid papa quebec romeo sierra"
  // d9: shares d8's comma'd prefix + mid (pairs with d8 at ~0.64) but
  // no ≥0.5 pair with anything else — the promoted-suppresses case
  private val d9t = s"alpha, bravo, charlie, dingo, $mid magenta indigo maroon teal"

  private def corpus = Seq(
    (1L, d1t), (2L, d2t), (3L, d3t),           // batch 1
    (4L, d4t), (5L, d3t),                      // d5: exact dup of d3
    (6L, "tiny doc"),                          // fails the quality gate
    (7L, d7t), (8L, d8t), (9L, d9t)            // batch 2
  ).toDF("doc_id", "text")

  private def foldBoth(dir: String): Unit = {
    IncrementalCuration.curateBatchRetractable(spark, dir,
      corpus.filter(col("doc_id") <= 3), "text", "doc_id",
      batchNo = 1L, jaccardThreshold = 0.5)
    IncrementalCuration.curateBatchRetractable(spark, dir,
      corpus.filter(col("doc_id") > 3), "text", "doc_id",
      batchNo = 2L, jaccardThreshold = 0.5)
  }

  private def surv(dir: String): Set[Long] =
    IncrementalCuration.survivors(spark, dir)
      .select("doc_id").as[Long].collect().toSet

  private def oneShotSurv(df: org.apache.spark.sql.DataFrame): Set[Long] =
    Curation.curate(df, "text", "doc_id", minQuality = 0.7,
      jaccardThreshold = 0.5).select("doc_id").as[Long].collect().toSet

  test("retractable fold matches the plain fold's survivor contract") {
    val dir = java.nio.file.Files.createTempDirectory("retr0")
      .toString + "/st"
    foldBoth(dir)
    // d8 exact-loses to d1; d9 pairs with nothing deduped (d8 is not
    // in the deduped set); d2/d4 are the tombstone chain
    assert(surv(dir) == Set(1L, 3L, 7L, 9L))
    assert(surv(dir) == oneShotSurv(corpus))
    // the extra state rows are flagged, not surfaced
    val st = spark.read.parquet(dir)
    assert(st.filter(!col("in_deduped"))
      .select("doc_id").as[Long].collect().toSet == Set(5L, 8L))
  }

  test("retract engages promotion, resurrection, and promoted-suppresses; equals rebuild-without-X") {
    val dir = java.nio.file.Files.createTempDirectory("retr1")
      .toString + "/st"
    foldBoth(dir)
    IncrementalCuration.retract(spark, dir,
      Seq(1L).toDF("doc_id"), jaccardThreshold = 0.5)
    // d8 promoted into the deduped set (group keeper d1 gone);
    // d2 resurrects (its only suppressor d1 gone);
    // d9 falls (newly paired with the promoted elder d8);
    // d4 stays dead (its suppressor d2 is a tombstone, still deduped)
    assert(surv(dir) == Set(2L, 3L, 7L, 8L))
    assert(surv(dir) == oneShotSurv(corpus.filter(col("doc_id") =!= 1L)))
    // full row contract too
    val got = IncrementalCuration.survivors(spark, dir)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val want = Curation.curate(corpus.filter(col("doc_id") =!= 1L),
        "text", "doc_id", minQuality = 0.7, jaccardThreshold = 0.5)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got == want)

    // sequential retraction composes: drop a tombstone (no fate moves)
    IncrementalCuration.retract(spark, dir,
      Seq(4L).toDF("doc_id"), jaccardThreshold = 0.5)
    assert(surv(dir) == Set(2L, 3L, 7L, 8L))
    assert(surv(dir) ==
      oneShotSurv(corpus.filter(!col("doc_id").isin(1L, 4L))))
    // retract the promoted doc itself: d9's suppressor vanishes again
    IncrementalCuration.retract(spark, dir,
      Seq(8L).toDF("doc_id"), jaccardThreshold = 0.5)
    assert(surv(dir) == Set(2L, 3L, 7L, 9L))
    assert(surv(dir) ==
      oneShotSurv(corpus.filter(!col("doc_id").isin(1L, 4L, 8L))))
  }

  test("post-retraction folds converge; pre-retraction replays fail loudly; absent ids no-op") {
    val dir = java.nio.file.Files.createTempDirectory("retr2")
      .toString + "/st"
    foldBoth(dir)
    IncrementalCuration.retract(spark, dir,
      Seq(1L).toDF("doc_id"), jaccardThreshold = 0.5)
    // replaying batch 2 would re-merge rows retraction may have
    // deleted — the watermark rejects it
    val e = intercept[IllegalArgumentException] {
      IncrementalCuration.curateBatchRetractable(spark, dir,
        corpus.filter(col("doc_id") > 3), "text", "doc_id",
        batchNo = 2L, jaccardThreshold = 0.5)
    }
    assert(e.getMessage.contains("retraction"))
    // a fresh batch above the watermark folds and still converges:
    // d10 exact-dups the PROMOTED d8's normalized text; d11 is new
    val b3 = Seq((10L, d8t), (11L, "the lazy owl reads " + mid +
      " under warm lamp light")).toDF("doc_id", "text")
    IncrementalCuration.curateBatchRetractable(spark, dir, b3,
      "text", "doc_id", batchNo = 3L, jaccardThreshold = 0.5)
    val all = corpus.unionByName(b3)
    assert(surv(dir) == oneShotSurv(all.filter(col("doc_id") =!= 1L)))
    // retracting an id that does not exist changes nothing
    val before = surv(dir)
    IncrementalCuration.retract(spark, dir,
      Seq(999L).toDF("doc_id"), jaccardThreshold = 0.5)
    assert(surv(dir) == before)
  }

  private def foldBothIndexed(dir: String): Unit = {
    IncrementalCuration.curateBatchIndexedRetractable(spark, dir,
      corpus.filter(col("doc_id") <= 3), "text", "doc_id",
      batchNo = 1L, jaccardThreshold = 0.5)
    IncrementalCuration.curateBatchIndexedRetractable(spark, dir,
      corpus.filter(col("doc_id") > 3), "text", "doc_id",
      batchNo = 2L, jaccardThreshold = 0.5)
  }

  private def postingsOf(dir: String): Seq[(Long, Long)] =
    spark.read.parquet(dir + IncrementalCuration.PostingsSuffix)
      .select("doc", "shc").as[(Long, Long)].collect().toSeq.sorted

  private def dfTotalsOf(dir: String): Seq[(Long, String, Long)] =
    spark.read.parquet(dir + IncrementalCuration.DfSuffix)
      .groupBy("shc", "sh").agg(sum("df_delta").as("df"))
      .as[(Long, String, Long)].collect().toSeq.sorted

  test("indexed retractable: retract maintains postings + df summary; future indexed folds converge") {
    val dir = java.nio.file.Files.createTempDirectory("retr4")
      .toString + "/st"
    foldBothIndexed(dir)
    assert(surv(dir) == Set(1L, 3L, 7L, 9L))
    IncrementalCuration.retract(spark, dir,
      Seq(1L).toDF("doc_id"), jaccardThreshold = 0.5)
    assert(surv(dir) == Set(2L, 3L, 7L, 8L))
    assert(surv(dir) == oneShotSurv(corpus.filter(col("doc_id") =!= 1L)))
    // the maintained index equals a fresh indexed rebuild over the
    // never-retracted corpus: same (doc, shingle-code) posting set,
    // same per-shingle df totals — so future probes prune identically
    val rb = java.nio.file.Files.createTempDirectory("retr4rb")
      .toString + "/st"
    IncrementalCuration.curateBatchIndexedRetractable(spark, rb,
      corpus.filter(col("doc_id") <= 3 && col("doc_id") =!= 1L),
      "text", "doc_id", batchNo = 1L, jaccardThreshold = 0.5)
    IncrementalCuration.curateBatchIndexedRetractable(spark, rb,
      corpus.filter(col("doc_id") > 3), "text", "doc_id",
      batchNo = 2L, jaccardThreshold = 0.5)
    assert(postingsOf(dir) == postingsOf(rb) && postingsOf(dir).nonEmpty)
    assert(dfTotalsOf(dir) == dfTotalsOf(rb))
    // a post-retraction indexed fold probes the maintained index and
    // still converges to the rebuild
    val b3 = Seq((10L, d8t), (11L, "the lazy owl reads " + mid +
      " under warm lamp light")).toDF("doc_id", "text")
    IncrementalCuration.curateBatchIndexedRetractable(spark, dir, b3,
      "text", "doc_id", batchNo = 3L, jaccardThreshold = 0.5)
    val all = corpus.unionByName(b3)
    assert(surv(dir) == oneShotSurv(all.filter(col("doc_id") =!= 1L)))
  }

  test("real corpus: fold two batches, retract every fifth id, equals rebuild-without-X") {
    val docs = graft.source.Tables.documents(spark, sf)
      .select("doc_id", "text").filter(col("doc_id") <= 400)
    val midId = docs.agg(max("doc_id")).head().getLong(0) / 2
    val dir = java.nio.file.Files.createTempDirectory("retr3")
      .toString + "/st"
    IncrementalCuration.curateBatchRetractable(spark, dir,
      docs.filter(col("doc_id") <= midId), "text", "doc_id", batchNo = 1L)
    IncrementalCuration.curateBatchRetractable(spark, dir,
      docs.filter(col("doc_id") > midId), "text", "doc_id", batchNo = 2L)
    val x = docs.filter(col("doc_id") % 5 === 0).select("doc_id")
    IncrementalCuration.retract(spark, dir, x)
    val got = IncrementalCuration.survivors(spark, dir)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val want = Curation.curate(docs.filter(col("doc_id") % 5 =!= 0),
        "text", "doc_id", minQuality = 0.7, jaccardThreshold = 0.3)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got == want && want.nonEmpty)
  }
}
