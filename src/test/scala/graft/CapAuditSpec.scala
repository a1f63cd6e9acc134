package graft

import org.apache.spark.sql.functions._
import graft.ext.TextDedup

/** Proves the boilerplate caps ENGAGE and that engaging them leaves
  * the similarity results unchanged (round-5 verdict #1, test-scale
  * half; the corpus-scale half is graft.ScaleStress over
  * tools/make_scale_corpus.py, recorded in TUNING.md).
  */
class CapAuditSpec extends SparkSpec {
  import spark.implicits._

  // 24 docs of unique prose + 3 planted near-dup pairs; EVERY doc
  // carries the same 5-token header, so all header shingles have
  // df = 30 >> maxPostings = 10
  private val header = "site nav hdr foo bar"
  private def mkDoc(i: Int): String =
    (0 until 12).map(j => s"w${i}x$j").mkString(" ")
  private def corpus = {
    val uniques = (0 until 24).map(i => (i.toLong, mkDoc(i)))
    val dups = Seq(
      (100L, mkDoc(100)), (101L, mkDoc(100)), // exact near-dup pair
      (102L, mkDoc(102)), (103L, mkDoc(102) + " extraA extraB"),
      (104L, mkDoc(104)), (105L, "lead1 lead2 " + mkDoc(104)))
    (uniques ++ dups).map { case (id, t) => (id, header + " " + t) }
      .toDF("doc_id", "text")
  }
  private def noHeader = {
    val uniques = (0 until 24).map(i => (i.toLong, mkDoc(i)))
    val dups = Seq(
      (100L, mkDoc(100)), (101L, mkDoc(100)),
      (102L, mkDoc(102)), (103L, mkDoc(102) + " extraA extraB"),
      (104L, mkDoc(104)), (105L, "lead1 lead2 " + mkDoc(104)))
    (uniques ++ dups).toDF("doc_id", "text")
  }

  test("overCapShingles audit fires on planted boilerplate") {
    val oc = TextDedup.overCapShingles(corpus, "text", "doc_id",
      maxPostings = 10).as[(String, Long)].collect()
    assert(oc.nonEmpty)
    // the all-header trigrams have df = n_docs
    assert(oc.exists { case (sh, df) => sh == "site nav hdr" && df == 30 })
    assert(oc.forall(_._2 > 10))
  }

  test("df-prune engages without changing the detected pair set") {
    val withCap = TextDedup.ngramJaccardPairs(corpus, "text", "doc_id",
      threshold = 0.3, maxPostings = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val clean = TextDedup.ngramJaccardPairs(noHeader, "text", "doc_id",
      threshold = 0.3, maxPostings = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // boilerplate pruned -> the header cannot manufacture pairs, and
    // the real near-dup pairs all survive
    assert(withCap == clean)
    assert(withCap.contains((100L, 101L)))
    assert(withCap.contains((102L, 103L)))
    assert(withCap.contains((104L, 105L)))
    assert(withCap.size == 3)
  }

  test("uncapped run on the same corpus manufactures boilerplate pairs") {
    // the counterfactual that justifies the cap: with the cap lifted the
    // header shingles pair EVERY doc with every other doc
    val unpruned = TextDedup.ngramJaccardPairs(corpus, "text", "doc_id",
      threshold = 0.05, maxPostings = 10000)
      .count()
    assert(unpruned >= 30L * 29 / 2) // all-pairs via shared header
  }

  test("minhash bucket cap drops the boilerplate clique, audit reports it") {
    // make every doc IDENTICAL except an id-marker tail: all signatures
    // collide in every band -> every (band, bucket) holds all 30 docs
    val clones = (0 until 30).map(i =>
      (i.toLong, header + " " + (0 until 16).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val dropped = TextDedup.minhashDroppedBuckets(clones, "text", "doc_id",
      maxBucket = 10).as[(Int, Long, Long)].collect()
    assert(dropped.nonEmpty)
    assert(dropped.forall(_._3 == 30))
    val pairs = TextDedup.minhashLsh(clones, "text", "doc_id",
      maxBucket = 10)
    assert(pairs.count() == 0) // every bucket over cap -> no candidates
  }
}
