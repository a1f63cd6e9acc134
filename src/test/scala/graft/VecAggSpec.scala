package graft

import org.apache.spark.sql.functions._
import graft.ext.VectorSearch
import graft.functions.VecSumAgg

/** The vector-sum Aggregator (UDAF surface): bit-parity with the
  * explode-form centroids and the rounding/merge edge cases.
  */
class VecAggSpec extends SparkSpec {
  import spark.implicits._

  private def centroidsViaAgg(df: org.apache.spark.sql.DataFrame) = {
    val vecsum = udaf(VecSumAgg)
    df.groupBy("label").agg(vecsum(col("embedding")).as("st"))
      .select(col("label"), col("st.n").as("n"),
        posexplode(col("st.sums")).as(Seq("dim", "_s")))
      .withColumn("centroid",
        round(col("_s").cast("double") / (col("n") * lit(1000000.0)), 6))
      .select("label", "dim", "n", "centroid")
  }

  test("UDAF centroids are bit-equal to the explode form on real data") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val viaAgg = centroidsViaAgg(emb).orderBy("label", "dim").collect()
    val viaExplode = VectorSearch.labelCentroids(emb, "label", "embedding")
      .select("label", "dim", "n", "centroid")
      .orderBy("label", "dim").collect()
    assert(viaAgg.sameElements(viaExplode))
  }

  test("UDAF result is invariant under input partitioning (merge path)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = centroidsViaAgg(emb.repartition(13)).orderBy("label", "dim").collect()
    val b = centroidsViaAgg(emb.coalesce(1)).orderBy("label", "dim").collect()
    assert(a.sameElements(b))
  }

  test("per-element rounding is HALF_UP like Spark's round, not math.round") {
    // -0.0078125f * 1e6 = -7812.5 exactly (dyadic): HALF_UP -> -7813,
    // while math.round would give -7812
    val df = Seq((0, Array(-0.0078125f)), (0, Array(0.0078125f)))
      .toDF("label", "embedding")
    val vecsum = udaf(VecSumAgg)
    val st = df.groupBy("label").agg(vecsum(col("embedding")).as("st"))
      .select("st.sums").as[Array[Long]].head()
    assert(st.toSeq == Seq(-7813L + 7813L))
    val spark7813 = df.select(
      expr("cast(round(cast(embedding[0] as double) * 1000000) as bigint)"))
      .as[Long].collect().toSet
    assert(spark7813 == Set(-7813L, 7813L)) // the contract being matched
  }

  test("ragged vectors fail loudly; nulls are skipped") {
    val vecsum = udaf(VecSumAgg)
    val ragged = Seq((0, Array(1.0f)), (0, Array(1.0f, 2.0f)))
      .toDF("label", "embedding")
    val e = intercept[Exception] {
      ragged.groupBy("label").agg(vecsum(col("embedding"))).collect()
    }
    assert(e.getMessage != null)
    val withNull = Seq((0, Array(2.0f)), (0, null.asInstanceOf[Array[Float]]))
      .toDF("label", "embedding")
    val st = withNull.groupBy("label").agg(vecsum(col("embedding")).as("st"))
      .select("st.n", "st.sums").as[(Long, Array[Long])].head()
    assert(st._1 == 1L && st._2.toSeq == Seq(2000000L))
  }
}
