package graft

import org.apache.spark.sql.functions._
import graft.op.{Fuzzy, Graph}

/** op.Fuzzy (blocked entity resolution) + Graph.triangleCounts. */
class FuzzyGraphSpec extends SparkSpec {
  import spark.implicits._

  test("blockedSelfJoin: finds within-block near-misses, skips cross-block") {
    val df = Seq("red widget", "red widgit", "red bolt", "blue widget",
      "red widget", "red widgit").toDF("nm")
    val got = Fuzzy.blockedSelfJoin(df, "nm", maxDist = 2)
      .orderBy("name_a", "name_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    // "red widget"↔"red widgit" d=1 (one substitution); "blue widget"
    // is another block; "red bolt" is distance >2 from both
    assert(got.toSeq == Seq(("red widget", "red widgit", 1, 2L, 2L)))
  }

  test("blockedSelfJoin: maxBlock cap truncates deterministically and audit sees it") {
    val df = (1 to 9).map(i => s"aa name$i").toDF("nm")
    // cap at 3: only the 3 lexicographically-first names survive the block
    val capped = Fuzzy.blockedSelfJoin(df, "nm", maxDist = 2, maxBlock = 3)
      .collect()
    assert(capped.length == 3) // C(3,2)=3 pairs, all within distance 1
    val audit = Fuzzy.overCapBlocks(df, "nm", maxBlock = 3).collect()
    assert(audit.length == 1 && audit.head.getLong(1) == 9L)
    assert(Fuzzy.overCapBlocks(df, "nm", maxBlock = 1000).isEmpty)
  }

  test("canonicalize: family maps to highest-count member, singletons to themselves") {
    val df = (Seq.fill(5)("hot rod") ++ Seq.fill(2)("hot rodd") ++
      Seq("hot bolt") ++ Seq.fill(3)("cold gear")).toDF("nm")
    val got = Fuzzy.canonicalize(df, "nm", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // "hot rod"(5) ↔ "hot rodd"(2) are one family (d=1) → canon "hot rod";
    // "hot bolt" is d≥3 from both → itself; "cold gear" singleton block
    assert(got == Set(
      ("hot rod", "hot rod", 5L), ("hot rodd", "hot rod", 2L),
      ("hot bolt", "hot bolt", 1L), ("cold gear", "cold gear", 3L)))
  }

  test("canonicalize: tie on count breaks to smallest name") {
    val df = Seq("aa b", "aa c").flatMap(Seq.fill(2)(_)).toDF("nm")
    val got = Fuzzy.canonicalize(df, "nm", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("aa b", "aa b"), ("aa c", "aa b")))
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("sortedNeighborhood equals the naive sorted-window model") {
    val raw = Seq("mango", "mangoo", "mango", "apple", "apples", "zebra",
      "zebraa", "apricot", "banana", "bananna")
    val df = raw.toDF("nm")
    val catalog = raw.groupBy(identity).map { case (n, o) => n -> o.size }
    val sorted = catalog.keys.toSeq.sorted
    for (w <- Seq(2, 3, 8)) {
      val want = (for {
        i <- sorted.indices; j <- sorted.indices
        if j > i && j - i < w && lev(sorted(i), sorted(j)) <= 2
      } yield (sorted(i), sorted(j), lev(sorted(i), sorted(j)).toLong,
        catalog(sorted(i)).toLong, catalog(sorted(j)).toLong)).toSet
      val got = Fuzzy.sortedNeighborhood(df, "nm", window = w, maxDist = 2)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got == want, s"window $w")
    }
  }

  test("sortedNeighborhood: each pair once; a near-dup separated by more " +
    "than the window in sort order is the documented miss") {
    // sort order: aa, aaa, aab, ab, abb, ac — aa/aaa are adjacent →
    // found; aa/ac (lev 1, so WOULD match) are rank distance 5 apart,
    // beyond window 3 → the documented single-pass miss
    val df = Seq("aa", "aaa", "aab", "ab", "abb", "ac").toDF("nm")
    val got = Fuzzy.sortedNeighborhood(df, "nm", window = 3, maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got.size == got.distinct.size)
    assert(got.contains(("aa", "aaa")))
    assert(!got.exists { case (a, b) => a == "aa" && b == "ac" })
  }

  test("triangleCounts: K4 gives every node 3 triangles; path gives none") {
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong))
      .toDF("s", "d")
    val got = Graph.triangleCounts(k4, "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (1 to 4).map(i => (i.toLong, 3L)).toSet)

    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    assert(Graph.triangleCounts(path, "s", "d").isEmpty)
  }

  test("triangleCounts: duplicate/reversed/self-loop edges are canonicalized away") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (2L, 3L)).toDF("s", "d")
    val got = Graph.triangleCounts(messy, "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("triangleCounts: two triangles sharing an edge credit the shared corners twice") {
    // triangles (1,2,3) and (2,3,4) share edge (2,3)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("s", "d")
    val got = Graph.triangleCounts(e, "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L)))
  }
}
