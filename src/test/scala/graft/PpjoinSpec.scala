package graft

import org.apache.spark.sql.functions._
import graft.ext.TextDedup

/** TextDedup.prefixJaccardJoin — the lossless prefix-filtering
  * (All-Pairs/PPJoin) exact set-similarity join.
  */
class PpjoinSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force jaccard pairs computed in plain Scala from the same
    * shingle sets the engine uses — the no-candidate-scheme referee.
    */
  private def brute(rows: Seq[(Long, String)], tP: Long): Set[(Long, Long, Long)] = {
    val sets = TextDedup.docShingles(rows.toDF("id", "txt"), "txt", "id")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet)).toMap
    (for {
      a <- sets.keys.toSeq; b <- sets.keys.toSeq if a < b
      inter = (sets(a) & sets(b)).size.toLong
      if inter * 1000 >= tP * (sets(a).size + sets(b).size - inter)
    } yield (a, b, inter)).toSet
  }

  private def engine(rows: Seq[(Long, String)], tP: Int): Set[(Long, Long, Long)] =
    TextDedup.prefixJaccardJoin(rows.toDF("id", "txt"), "txt", "id",
      thresholdPermille = tP)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog tonight"),
    (1L, "the quick brown fox jumps over the lazy dog tonight"), // clone of 0
    (2L, "the quick brown fox jumps over the lazy cat tonight"), // near-dup
    (3L, "completely different words about spark shuffles and joins"),
    (4L, "words about spark shuffles and joins at scale"), // overlaps 3
    (5L, "tiny doc"), // < 3 tokens: whole-text single shingle
    (6L, "tiny doc"), // clone of 5 (jaccard 1 on singleton sets)
    (7L, ""))

  test("prefixJaccardJoin equals brute force at several thresholds") {
    for (tP <- Seq(300, 500, 800, 1000)) {
      assert(engine(corpus, tP) == brute(corpus, tP), s"threshold $tP")
    }
  }

  test("prefix filtering is lossless where a df-cap would truncate: a " +
    "corpus-wide boilerplate shingle does not hide a qualifying pair") {
    // every doc shares the same 3-word header (a df=N shingle);
    // docs 0/1 are clones beyond it
    val boiler = (0L until 30L).map { i =>
      (i, s"common header words unique tail $i with more filler ${i * 7}")
    } ++ Seq((100L, "common header words exact duplicate tail here"),
      (101L, "common header words exact duplicate tail here"))
    val got = engine(boiler, 500)
    assert(got == brute(boiler, 500))
    assert(got.exists { case (a, b, _) => a == 100L && b == 101L })
  }

  test("output contract: ordered pairs only, integer rule at the edge") {
    // sets {a b c, b c d} vs {b c d, c d e}: inter=1, union=3 → 1/3 < 0.5
    // sets sharing 2 of 3 shingles: 2/4 = exactly 0.5 → kept at 500
    val rows = Seq(
      (1L, "a b c d e"), // shingles: abc bcd cde
      (2L, "a b c d f")) // shingles: abc bcd cdf  → inter 2, union 4
    val got = TextDedup.prefixJaccardJoin(rows.toDF("id", "txt"), "txt", "id",
      thresholdPermille = 500).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 3L && r.getLong(4) == 3L)
    assert(math.abs(r.getDouble(5) - 0.5) < 1e-12)
    // one permille tighter: the edge pair drops
    assert(engine(rows, 501).isEmpty)
  }
}
