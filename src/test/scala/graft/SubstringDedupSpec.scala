package graft

import org.apache.spark.sql.functions._
import graft.ext.TextDedup

/** Exact repeated-substring dedup ([[TextDedup.repeatedSpans]] /
  * [[TextDedup.stripRepeatedSpans]]): the suffix-array-style operator
  * that catches UNALIGNED repeated spans, which the fixed 8-word grid
  * of blockDedup provably cannot.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // a 12-token passage planted at offset 3 in doc 1 and offset 7 in
  // doc 2 — never 8-block-aligned in either
  private val passage = "alpha bravo charlie delta echo foxtrot golf " +
    "hotel india juliet kilo lima"
  private val doc1 =
    "p1 p2 p3 " + passage + " tail1 tail2 tail3 tail4 tail5"
  private val doc2 =
    "q1 q2 q3 q4 q5 q6 q7 " + passage + " zed1 zed2 zed3 zed4 zed5 zed6"
  private def corpus = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")

  test("blockDedup misses the unaligned shared passage") {
    val rows = TextDedup.blockDedup(corpus, "text", "doc_id", blockWords = 8)
      .collect().map(r => (r.getAs[Long]("doc"),
        (r.getAs[Long]("n_blocks"), r.getAs[Long]("n_kept")))).toMap
    // different offsets -> no block of doc2 equals any block of doc1:
    // every block survives, nothing deduped
    assert(rows(1L)._1 == rows(1L)._2)
    assert(rows(2L)._1 == rows(2L)._2)
  }

  test("repeatedSpans finds the unaligned passage; first occurrence survives") {
    val spans = TextDedup.repeatedSpans(corpus, "text", "doc_id", k = 8)
      .as[(Long, Int, Int)].collect().sorted
    // only doc 2 (the later occurrence) is marked: the 12-token passage
    // at offset 7 => window starts 7..11 => one maximal span (7, 12)
    assert(spans.toSeq == Seq((2L, 7, 12)))
  }

  test("stripRepeatedSpans removes the later copy verbatim, keeps the first") {
    val out = TextDedup.stripRepeatedSpans(corpus, "text", "doc_id", k = 8)
      .collect().map(r => (r.getAs[Long]("doc"),
        (r.getAs[String]("clean"), r.getAs[Long]("n_tokens_before"),
          r.getAs[Long]("n_tokens_after")))).toMap
    assert(out(1L)._1 == doc1) // survivor untouched
    assert(out(2L)._1 == "q1 q2 q3 q4 q5 q6 q7 zed1 zed2 zed3 zed4 zed5 zed6")
    assert(out(2L)._2 == 25 && out(2L)._3 == 13)
  }

  test("within-doc self-repeat: second copy marked, strip keeps one") {
    val df = Seq((1L, "a b c d e f g h a b c d e f g h"))
      .toDF("doc_id", "text")
    val spans = TextDedup.repeatedSpans(df, "text", "doc_id", k = 8)
      .as[(Long, Int, Int)].collect()
    assert(spans.toSeq == Seq((1L, 8, 8)))
    val clean = TextDedup.stripRepeatedSpans(df, "text", "doc_id", k = 8)
      .select("clean").as[String].head()
    assert(clean == "a b c d e f g h")
  }

  test("overlapping token coverage of adjacent runs is counted once") {
    // doc3 repeats span A (s1..s12, first seen in doc2) and span B
    // (s9..u4, first seen in doc1). Its marked window runs {0..4} and
    // {8..12} are disjoint in window-start space but their TOKEN covers
    // (0..11 and 8..19) overlap — naive span-length subtraction would
    // yield a negative count; the filtered-array count must say 0.
    val df = Seq(
      (1L, "v1 v2 s9 s10 s11 s12 t1 t2 t3 t4 u1 u2 u3 u4"),
      (2L, "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12 w1 w2"),
      (3L, "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12 t1 t2 t3 t4 u1 u2 u3 u4"))
      .toDF("doc_id", "text")
    val spans = TextDedup.repeatedSpans(df, "text", "doc_id", k = 8)
      .as[(Long, Int, Int)].collect().sorted
    assert(spans.toSeq == Seq((3L, 0, 12), (3L, 8, 12)))
    val out = TextDedup.stripRepeatedSpans(df, "text", "doc_id", k = 8)
      .collect().map(r => (r.getAs[Long]("doc"),
        (r.getAs[String]("clean"), r.getAs[Long]("n_tokens_before"),
          r.getAs[Long]("n_tokens_after")))).toMap
    assert(out(1L)._3 == 14 && out(2L)._3 == 14) // first occurrences intact
    assert(out(3L)._2 == 20 && out(3L)._3 == 0 && out(3L)._1 == "")
  }

  test("clean corpus: no spans, strip is identity") {
    val df = Seq((1L, "one two three four five six seven eight nine"),
      (2L, "ten eleven twelve thirteen fourteen fifteen sixteen seventeen"))
      .toDF("doc_id", "text")
    assert(TextDedup.repeatedSpans(df, "text", "doc_id", k = 8).count() == 0)
    val out = TextDedup.stripRepeatedSpans(df, "text", "doc_id", k = 8)
      .select("doc", "clean").as[(Long, String)].collect().toMap
    assert(out(1L).startsWith("one two"))
    assert(out(2L).endsWith("seventeen"))
  }

  test("minSpanTokens filters short repeats") {
    val df = Seq(
      (1L, "x1 x2 x3 x4 x5 x6 x7 x8 a b c"),
      (2L, "y1 y2 x1 x2 x3 x4 x5 x6 x7 x8 d e")).toDF("doc_id", "text")
    val all = TextDedup.repeatedSpans(df, "text", "doc_id", k = 8,
      minSpanTokens = 8).as[(Long, Int, Int)].collect()
    assert(all.toSeq == Seq((2L, 2, 8)))
    val strict = TextDedup.repeatedSpans(df, "text", "doc_id", k = 8,
      minSpanTokens = 9)
    assert(strict.count() == 0)
  }
}
