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

  test("featureHash: pinned portable buckets and counts") {
    // code(aa) = 97·131+2 = 12709 → bucket 31; code(bb) = 12840 → 60
    val got = Sketches.featureHash(Seq((7L, "aa bb aa")).toDF("doc_id", "text"),
      "text", "doc_id", width = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((7L, 31L, 2L), (7L, 60L, 1L)))
  }
}
