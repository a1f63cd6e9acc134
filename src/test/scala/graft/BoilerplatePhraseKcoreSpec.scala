package graft

import org.apache.spark.sql.functions._
import graft.ext.{TextAnalysis, TextDedup}
import graft.op.Graph

/** TextDedup.stripFrequentLines (C4 boilerplate-line filter),
  * TextAnalysis.phraseMatches (positional phrase search), Graph.kCore
  * (synchronous-peeling k-core).
  */
class BoilerplatePhraseKcoreSpec extends SparkSpec {
  import spark.implicits._

  private def strip(rows: Seq[(Long, String)], permille: Int) =
    TextDedup.stripFrequentLines(rows.toDF("id", "txt"), "txt", "id", permille)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.sortBy(_._1)

  test("stripFrequentLines: frequent lines removed everywhere, prose kept") {
    // FOOTER in 10/10 docs, COOKIE in 6/10, unique prose per doc
    val rows = (0L until 10L).map { i =>
      val cookie = if (i < 6) "\nCOOKIE" else ""
      (i, s"FOOTER\nprose $i$cookie")
    }
    val got = strip(rows, permille = 500)
    assert(got.size == 10)
    got.foreach { case (i, clean, nRemoved) =>
      assert(clean == s"prose $i", s"doc $i")
      assert(nRemoved == (if (i < 6) 2L else 1L), s"doc $i")
    }
  }

  test("stripFrequentLines: in-document repetition counts one doc for df " +
    "but every occurrence is stripped") {
    // "F" is in 2 of 4 docs (50%): frequent at 500‰. Doc 0 carries it
    // twice — both copies go. "X\nX\nX" is df=1 (25%): kept verbatim.
    val rows = Seq(
      (0L, "F\nkeep zero\nF"),
      (1L, "F\nkeep one"),
      (2L, "X\nX\nX"),
      (3L, "keep three"))
    val got = strip(rows, permille = 500)
    assert(got == Seq(
      (0L, "keep zero", 2L),
      (1L, "keep one", 1L),
      (2L, "X\nX\nX", 0L),
      (3L, "keep three", 0L)))
  }

  test("stripFrequentLines: a doc that is entirely boilerplate keeps an " +
    "empty clean text, not a dropped row") {
    val rows = Seq((0L, "BP"), (1L, "BP"), (2L, "BP\nreal"), (3L, "other"))
    val got = strip(rows, permille = 500)
    assert(got == Seq(
      (0L, "", 1L), (1L, "", 1L), (2L, "real", 1L), (3L, "other", 0L)))
  }

  test("stripFrequentLines: threshold is >= (a line at exactly the permille " +
    "cut is boilerplate); blank lines can qualify like any other") {
    // blank line (from a trailing \n) in exactly 2 of 4 docs at 500‰
    val rows = Seq(
      (0L, "a\n"), (1L, "b\n"), (2L, "c"), (3L, "d"))
    val got = strip(rows, permille = 500)
    assert(got == Seq(
      (0L, "a", 1L), (1L, "b", 1L), (2L, "c", 0L), (3L, "d", 0L)))
  }

  private def phrases(rows: Seq[(Long, String)], phrase: Seq[String]) =
    TextAnalysis.phraseMatches(rows.toDF("id", "txt"), "txt", "id", phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)

  test("phraseMatches: counts every occurrence; non-matching docs absent") {
    val rows = Seq(
      (0L, "a b c a b c a b"), // two full occurrences, one dangling prefix
      (1L, "a b x c"), // broken run: no match
      (2L, "x y z"))
    assert(phrases(rows, Seq("a", "b", "c")) == Seq((0L, 2L)))
  }

  test("phraseMatches: repeated-word phrases count overlapping starts") {
    assert(phrases(Seq((0L, "a a a"), (1L, "a b a")), Seq("a", "a")) ==
      Seq((0L, 2L)))
  }

  test("phraseMatches: tokenizer folds case and whitespace runs") {
    assert(phrases(Seq((0L, "  A\tb  C ")), Seq("a", "b", "c")) ==
      Seq((0L, 1L)))
  }

  test("phraseMatches: single-word phrase is term frequency") {
    assert(phrases(Seq((0L, "w q w"), (1L, "q")), Seq("w")) == Seq((0L, 2L)))
  }

  private def core(edges: Seq[(Long, Long)], k: Int) =
    Graph.kCore(edges.toDF("s", "d"), "s", "d", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSeq.sortBy(_._1)

  test("kCore: pendant chain peels off, the K4 backbone survives") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val chain = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val got = core(k4 ++ chain, k = 2)
    assert(got == (1L to 4L).map(i => (i, 3L, true)))
    // k above the densest core: everything peels, empty result
    assert(core(k4 ++ chain, k = 4).isEmpty)
  }

  test("kCore: a cycle is its own 2-core (immediate fixed point)") {
    val c5 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    assert(core(c5, k = 2) == (1L to 5L).map(i => (i, 2L, true)))
    // ... and a path needs several synchronous rounds to vanish
    assert(core(c5.dropRight(1), k = 2).isEmpty)
  }

  test("kCore: duplicate/reversed/self-loop edges are canonicalized") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (2L, 3L))
    assert(core(messy, k = 2) ==
      Seq((1L, 2L, true), (2L, 2L, true), (3L, 2L, true)))
  }

  test("kCore: empty edge list yields an empty frame with the contract schema") {
    val got = Graph.kCore(Seq.empty[(Long, Long)].toDF("s", "d"), "s", "d", 2)
    assert(got.columns.toSeq == Seq("node", "core_deg", "converged"))
    assert(got.isEmpty)
  }
}
