package graft

import org.apache.spark.sql.functions._
import graft.ext.VectorSearch

/** Semantic dedup (sign-cell SemDeDup): planted near-duplicate vectors
  * pin the dominance-drop contract, the within-cell-only pairing, and
  * the maxCell escape hatch.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // all-positive leading signs => cell 15 (signBits 4); the "neg" family
  // flips dim 0 => cell 14 — near-identical across families never pairs
  private def v(head: Float, tail: Float*): Array[Float] =
    (head +: tail).toArray

  private val planted = Seq(
    (1L, v(1f, 1f, 1f, 1f, 0.9f, 0.1f)),          // cell 15, keeper
    (2L, v(1f, 1f, 1f, 1f, 0.9f, 0.11f)),         // ~dup of 1 => dropped
    (3L, v(1f, 1f, 1f, 1f, 0.91f, 0.12f)),        // ~dup of 1 and 2 => dropped
    (4L, v(1f, 1f, 1f, 1f, -20f, 19f)),           // cell 15 but far => survives
    (5L, v(-1f, 1f, 1f, 1f, 0.9f, 0.1f)),         // cell 14: near 1 but other cell
    (6L, v(-1f, 1f, 1f, 1f, 0.9f, 0.105f)))       // ~dup of 5 in cell 14 => dropped
    .toDF("vec_id", "embedding")

  test("dominance drop within cells; cross-cell near-dups survive") {
    val got = VectorSearch.semDedup(planted, "vec_id", "embedding",
      signBits = 4, threshold = 0.9)
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 15L), (4L, 15L), (5L, 14L)))
  }

  test("dominance, not greedy: a doc is dropped by ANY lower-id cell-mate") {
    // 3 is similar to 2 (dropped) and to 1 (kept) — under dominance it
    // drops either way; pin the documented rule by checking 3 is gone
    // even when only 2 (itself dropped) is above the threshold
    val chain = Seq(
      (1L, v(1f, 1f, 1f, 1f, 10f, 0f)),
      (2L, v(1f, 1f, 1f, 1f, 9f, 4f)),   // cos(1,2) ~ 0.93 => dropped by 1
      (3L, v(1f, 1f, 1f, 1f, 7f, 7f)))   // cos(2,3) ~ 0.97, cos(1,3) ~ 0.83
      .toDF("vec_id", "embedding")
    val got = VectorSearch.semDedup(chain, "vec_id", "embedding",
      signBits = 4, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L), "3 dominated by the already-dropped 2 still drops")
  }

  test("maxCell: oversized cells opt out of pairing and fully survive") {
    val got = VectorSearch.semDedup(planted, "vec_id", "embedding",
      signBits = 4, threshold = 0.9, maxCell = 3L)
      .select("vec_id").as[Long].collect().toSeq.sorted
    // cell 15 has 4 members (> 3) => all survive unpaired; cell 14 (2
    // members) still dedups 6 away
    assert(got == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("matches a brute-force reference on the real embeddings table") {
    val emb = graft.source.Tables.embeddings(spark, sf)
    val got = VectorSearch.semDedup(emb, "vec_id", "embedding",
      signBits = 4, threshold = 0.45)
      .select("vec_id").as[Long].collect().toSeq.sorted
    val cell = (0 until 4).map(j =>
      when(element_at(col("embedding"), j + 1) > lit(0f), lit(1L << j))
        .otherwise(lit(0L))).reduce(_ + _)
    val b = emb.select(col("vec_id"), cell.as("cell"), col("embedding"))
    val dropped = b.as("x").join(b.as("y"),
        col("x.cell") === col("y.cell") && col("y.vec_id") < col("x.vec_id"))
      .filter(VectorSearch.cosine(col("x.embedding"), col("y.embedding")) > 0.45)
      .select(col("x.vec_id")).distinct().as[Long].collect().toSet
    val want = b.select("vec_id").as[Long].collect().toSeq
      .filterNot(dropped).sorted
    assert(got == want)
    assert(dropped.nonEmpty, "the planted near-dups must make this bite")
  }
}
