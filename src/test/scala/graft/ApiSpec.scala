package graft

import org.apache.spark.sql.functions._
import graft.ext.TextDedup
import graft.model.{GasStation, GasStationOps}

/** Specs for the SQL function registration and the typed Dataset API. */
class ApiSpec extends SparkSpec {
  import spark.implicits._

  test("native expressions are usable from SQL after registration") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf/embeddings.parquet").createOrReplaceTempView("emb")
    val sim = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS s FROM emb WHERE vec_id = 0")
      .as[Double].head()
    assert(math.abs(sim - 1.0) < 1e-12)
    val buckets = spark.sql(
      "SELECT lsh_bucket(embedding, 6) AS b FROM emb").as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 64))
    val sh = spark.sql(
      "SELECT word_shingles(array('a','b','c','d'), 3) AS s").as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    assert(spark.sql("SELECT minhash_sig(array('x','y'), 8) AS m")
      .as[Seq[Long]].head().length == 8)
  }

  test("typed GasStation Dataset: full address, json, point lookup, typed agg") {
    val ds = Seq(
      GasStation("bp-1", "BP", "BP One", Some(-43.5), Some(172.6),
        "1 Main St", "Chch", "Cant", "8011", "NZ"),
      GasStation("z-1", "Z", "Z One", None, None,
        "2 Side St", "Chch", "", "", "NZ")).toDS()
    val fa = GasStationOps.withFullAddress(ds)
      .select("location_id", "full_address").as[(String, String)].collect().toMap
    assert(fa("bp-1") == "1 Main St, Chch, Cant, NZ 8011")
    assert(fa("z-1") == "2 Side St, Chch, , NZ") // empty postal: no suffix
    val js = GasStationOps.toJsonDocs(ds).collect()
    assert(js.exists(_.contains(""""location_id":"bp-1"""")))
    assert(GasStationOps.byLocationId(ds, "z-1").count() == 1)
    assert(GasStationOps.countByBrand(ds).collect().toMap ==
      Map("BP" -> 1L, "Z" -> 1L))
  }

  test("LSH-bucketed near-dup is a subset of exact near-dup; " +
    "OR-amplified tables raise recall over the single-table form") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val exact = TextDedup.embeddingNearDups(emb, "vec_id", "embedding", 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val single = TextDedup.embeddingNearDupsBucketed(emb, "vec_id",
      "embedding", 0.35, bits = 5, probeNeighbors = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(single.subsetOf(exact)) // exact verify ⇒ no false positives
    assert(single.nonEmpty)
    val recall1 = single.size.toDouble / exact.size
    assert(recall1 > 0.2, s"single-table recall $recall1")
    // the registered (r14) parameterization: 4 tables × 4 bits + probe.
    // Boundary pairs collide per table with p ≈ 0.49, so the union
    // should approach 1 - 0.51^4 ≈ 0.93; assert a safe floor and
    // strict improvement
    val multi = TextDedup.embeddingNearDupsBucketed(emb, "vec_id",
      "embedding", 0.35, bits = 4, probeNeighbors = 1, tables = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(multi.subsetOf(exact), "multi-table must stay exact-verified")
    val recallM = multi.size.toDouble / exact.size
    assert(recallM > recall1, s"OR-amplification must help: $recallM vs $recall1")
    assert(recallM > 0.75, s"multi-table recall $recallM")
  }
}
