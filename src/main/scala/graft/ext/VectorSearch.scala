package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers (SURVEY §7.4):
  *  - `bruteForceTopK` — exact cosine top-k; the correctness baseline.
  *    Cost O(|queries|·|corpus|·dim): fine when the query side is small
  *    or as the per-bucket kernel.
  *  - random-hyperplane LSH (`lshBuckets` + `annTopK`) — the 100 TB
  *    path: vectors land in 2^bits sign-pattern buckets; queries probe
  *    only their own bucket (plus optional multi-probe neighbors), so
  *    the scan per query is corpus/2^bits on average and the whole
  *    search is one equi-join Catalyst plans as a hash join.
  *
  * All arithmetic is double-precision fold-left over the array —
  * deterministic, and bit-identical to DuckDB's DOUBLE[] cosine, which
  * the oracle uses.
  */
object VectorSearch {

  /** Cosine similarity of two float-array columns, computed in double.
    * Higher-order functions evaluate in-JVM with no serialization.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** L2-normalize once so repeated searches only pay dot products. */
  def normalized(df: DataFrame, vec: String): DataFrame =
    df.withColumn("_norm",
      sqrt(aggregate(transform(col(vec), v => v.cast("double") * v.cast("double")),
        lit(0.0), (acc, v) => acc + v)))
      .withColumn(vec, transform(col(vec), v => v.cast("double") / col("_norm")))
      .drop("_norm")

  /** Exact cosine top-k: for each query row, the k nearest corpus rows.
    * The query side is broadcast (it is small by contract), so the
    * corpus never shuffles for the join; the only shuffle is the
    * per-query top-k window. Ranking uses (rounded sim, id) so the
    * result order is stable across engines/ulp.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     id: String, vec: String, k: Int): DataFrame = {
    val c = corpus.select(col(id).as("vec_id"), col(vec).as("cv"))
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("cv"), col("qv")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("sim"))
  }

  /** Deterministic pseudo-random hyperplane component p_j for plane p,
    * dimension j: xxhash64 of (p, j) mapped uniformly into [-1, 1].
    * No stored model, no randomness — any executor recomputes the same
    * planes, which is what makes the index reproducible at scale.
    */
  private def planeComponent(p: Int): String =
    s"(cast(pmod(xxhash64($p, j), 2000001) as double) / 1000000.0 - 1.0)"

  /** Sign-pattern LSH bucket id (`bits` hyperplanes → long in
    * [0, 2^bits)) for the vector array column named `v`.
    */
  def lshBucketExpr(bits: Int, vecCol: String): Column =
    expr((0 until bits).map { p =>
      s"if(aggregate(zip_with($vecCol, sequence(0, size($vecCol) - 1), " +
        s"(x, j) -> cast(x as double) * ${planeComponent(p)}), " +
        s"0.0D, (acc, v) -> acc + v) >= 0, shiftleft(1L, $p), 0L)"
    }.mkString(" + "))

  /** Assign every vector its LSH bucket. Map-side; persist/bucket-write
    * the result once and reuse it across queries.
    */
  def lshBuckets(df: DataFrame, vec: String, bits: Int = 8): DataFrame =
    df.withColumn("bucket", lshBucketExpr(bits, vec))

  /** Approximate top-k: probe only the query's bucket. Recall is traded
    * against `bits` (and can be raised with multi-probe: pass
    * `probeNeighbors > 0` to also search buckets at Hamming distance 1).
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, id: String,
              vec: String, k: Int, bits: Int = 8,
              probeNeighbors: Int = 0): DataFrame = {
    val c = lshBuckets(corpus, vec, bits)
      .select(col("bucket"), col(id).as("vec_id"), col(vec).as("cv"))
    val q0 = lshBuckets(queries, vec, bits)
      .select(col("bucket"), col(id).as("query_id"), col(vec).as("qv"))
    val q = if (probeNeighbors == 0) q0 else {
      // multi-probe: original bucket + all buckets at Hamming distance 1
      q0.select(col("query_id"), col("qv"),
        explode(expr(
          s"array_union(array(bucket), transform(sequence(0, ${bits - 1}), " +
            "b -> cast(bucket as long) ^ shiftleft(1L, b)))")).as("bucket"))
    }
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("cv"), col("qv")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("sim"))
  }
}
