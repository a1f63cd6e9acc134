package graft

import org.apache.spark.sql.functions._
import graft.ext.Sketches

/** Sketches.cmsTermCounts / featureHash — the portable-hash sketch
  * surfaces with exact oracles.
  */
class SketchPortableSpec extends SparkSpec {
  import spark.implicits._

  test("cmsTermCounts: est >= true always; collision-free terms estimate exactly") {
    // distinct first letters + lengths → distinct codes, and width 997
    // (prime ≫ 4 terms) keeps every (d, bucket) private → est == true
    val docs = Seq((1L, "alpha beta gamma alpha"), (2L, "delta beta")).toDF("doc_id", "text")
    val got = Sketches.cmsTermCounts(docs, "text", depth = 4, width = 997)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("alpha") == (2L, 2L, 0L) && got("beta") == (2L, 2L, 0L)
      && got("gamma") == (1L, 1L, 0L) && got("delta") == (1L, 1L, 0L))
  }

  test("cmsTermCounts: width 1 collapses every cell — est = corpus token count") {
    val docs = Seq((1L, "alpha beta gamma alpha")).toDF("doc_id", "text")
    val got = Sketches.cmsTermCounts(docs, "text", depth = 4, width = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.forall(_._3 == 4L)) // every estimate is the 4-token total
    assert(got.forall(r => r._3 >= r._2)) // CMS never underestimates
  }

  test("gridQuantiles: hand-checked coverage cells on 0..9, grid 4") {
    // cells: {0..3}→cell 0 (4 rows), {4..7}→cell 1 (4), {8,9}→cell 2 (2)
    // p50: first cum ≥ 5 is cell 1 → 4; p90/p95/p99 land in cell 2 → 8
    val docs = (0L to 9L).map(v => ("s", v)).toDF("source", "n_chars")
    val r = Sketches.gridQuantiles(docs, "n_chars", "source", grid = 4L).head()
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ("s", 10L, 4L, 8L, 8L, 8L))
  }

  test("gridQuantiles: FLOOR cells for negative values; per-group independence") {
    // -5 floors to cell -2 (lower bound -8), not DIV's toward-zero -1
    val docs = Seq(("a", -5L), ("a", 3L), ("b", 100L)).toDF("source", "n_chars")
    val got = Sketches.gridQuantiles(docs, "n_chars", "source", grid = 4L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("a") == (2L, -8L)) // p50 covers at the first (negative) cell
    assert(got("b") == (1L, 100L)) // 100 DIV 4 = cell 25 → lower bound 100
  }

  test("distinctErrorAudit: exact counts carried, HLL verdict inside the 3-sigma envelope") {
    // two groups with known exact cardinalities; HLL at rsd=0.05 must
    // sit well inside the 0.15 envelope on thousands of distinct longs
    val df = ((1L to 3000L).map(i => ("a", i)) ++
      (1L to 500L).map(i => ("b", i * 7))).toDF("grp", "v")
    val got = Sketches.distinctErrorAudit(df, "v", "grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(got.map(x => (x._1, x._2)).toSeq == Seq(("a", 3000L), ("b", 500L)))
    assert(got.forall(_._3), s"HLL strayed past 3·rsd: ${got.toSeq}")
    // a zero-tolerance bound flips the verdict when the estimate is off
    // at all — proving within_bound really compares approx vs exact
    // (exact small-cardinality mode would pass even at bound 0)
    val tight = Sketches.distinctErrorAudit(df, "v", "grp", boundRsd = 0.0)
      .collect().map(r => (r.getString(0), r.getBoolean(2))).toMap
    assert(!tight("a")) // 3000 distinct is far past HLL's exact regime
  }

  test("featureHash: pinned portable buckets and counts") {
    // code(aa) = 97·131+2 = 12709 → bucket 31; code(bb) = 12840 → 60
    val got = Sketches.featureHash(Seq((7L, "aa bb aa")).toDF("doc_id", "text"),
      "text", "doc_id", width = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((7L, 31L, 2L), (7L, 60L, 1L)))
  }
}
