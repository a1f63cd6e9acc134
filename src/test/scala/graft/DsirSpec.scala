package graft

import org.apache.spark.sql.functions._
import graft.ext.Dsir

/** DSIR importance resampling (round 13): hashed-gram model counts
  * are hand-checkable, importance weights rank target-like docs above
  * noise, the deterministic and Gumbel selections behave, and scores
  * are partitioning-invariant (pure integer algebra end to end).
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val target = "spark sql fast query engine"
  private val noise = "lorem ipsum dolor sit amet"

  private def corpus = {
    val rows =
      (0L until 20L).map(i => (i, target, "en")) ++
        (20L until 60L).map(i => (i, noise, "xx")) ++
        Seq((60L, target, "xx"), // target-looking doc OUTSIDE the slice
          (61L, noise, "xx"),
          (62L, "spark sql fast lorem ipsum", "xx")) // mixed
    rows.toDF("doc_id", "text", "lang")
  }

  test("gram counts: a d-token doc contributes 2d-1 grams; model " +
    "totals add up and target counts never exceed raw") {
    val g = Dsir.gramBuckets(Seq((1L, "a bb ccc")).toDF("doc_id", "text"),
      "text", "doc_id")
    assert(g.agg(sum("c")).as[Long].head == 5L) // 3 unigrams + 2 bigrams
    val m = Dsir.modelCounts(corpus, "text", "doc_id", col("lang") === "en")
    val (raw, tgt) = m.agg(sum("n_raw"), sum("n_target"))
      .as[(Long, Long)].head
    assert(raw == 63L * 9) // every doc is 5 tokens -> 9 grams
    assert(tgt == 20L * 9)
    assert(m.filter(col("n_target") > col("n_raw")).isEmpty)
  }

  test("weights rank the target-like doc above noise; the mixed doc " +
    "falls between; weights are partitioning-invariant") {
    val w = Dsir.logWeights(corpus, "text", "doc_id", col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(60L) > w(62L), "pure target phrasing above mixed")
    assert(w(62L) > w(61L), "mixed above pure noise")
    assert(w(60L) == w(0L), "identical text, identical score")
    val w8 = Dsir.logWeights(corpus.repartition(8), "text", "doc_id",
      col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w == w8, "scores must not depend on partitioning")
  }

  test("deterministic select takes the k best by (score desc, id) and " +
    "prefers target-like docs") {
    val sel = Dsir.select(corpus, "text", "doc_id", col("lang") === "en",
      k = 21).select("doc_id").as[Long].collect().toSet
    assert(sel.size == 21)
    // the 20 in-slice target docs + the out-of-slice target twin win
    assert((0L until 20L).forall(sel.contains) && sel.contains(60L))
    assert(!sel.contains(61L))
  }

  test("gumbel resample: same seed reproduces, k respected, and the " +
    "overwhelming-weight docs still dominate the sample") {
    val a = Dsir.gumbelSelect(corpus, "text", "doc_id",
      col("lang") === "en", k = 10, seed = 7L)
      .select("doc_id").as[Long].collect().toSeq
    val b = Dsir.gumbelSelect(corpus, "text", "doc_id",
      col("lang") === "en", k = 10, seed = 7L)
      .select("doc_id").as[Long].collect().toSeq
    assert(a == b, "seeded resample must be reproducible")
    assert(a.size == 10)
    val targetIds = ((0L until 20L) ++ Seq(60L)).toSet
    assert(a.count(targetIds.contains) >= 8,
      s"softmax mass sits on target-like docs, got $a")
  }

  test("degenerate docs: single-token and whitespace-only texts score " +
    "without crashing (the bigram branch is guarded)") {
    val df = Seq((1L, "solo", "en"), (2L, "  ", "en"), (3L, "", "xx"))
      .toDF("doc_id", "text", "lang")
    val w = Dsir.logWeights(df, "text", "doc_id", col("lang") === "en")
    assert(w.count() == 3)
    assert(w.filter(col("doc_id") === 1L).select("gram_n")
      .as[Long].head == 1L)
  }
}
