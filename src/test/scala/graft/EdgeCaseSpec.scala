package graft

import org.apache.spark.sql.functions._
import graft.ext.VectorSearch
import graft.sink.Sinks
import graft.source.JsonIngest

/** Edge cases for public APIs not exercised elsewhere. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("VectorSearch.normalized produces unit vectors, dot == cosine") {
    val df = Seq((1L, Array(3.0f, 4.0f)), (2L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val n = VectorSearch.normalized(df, "embedding")
    val norms = n.select(
      aggregate(transform($"embedding", v => v * v), lit(0.0), _ + _))
      .as[Double].collect()
    assert(norms.forall(v => math.abs(v - 1.0) < 1e-12))
    // after normalization, plain dot product equals cosine of originals
    val a = n.filter($"vec_id" === 1).select($"embedding".as("va"))
    val b = n.filter($"vec_id" === 2).select($"embedding".as("vb"))
    val dot = a.crossJoin(b).select(
      aggregate(zip_with($"va", $"vb", _ * _), lit(0.0), _ + _)).as[Double].head()
    val cos = df.filter($"vec_id" === 1).select($"embedding".as("va"))
      .crossJoin(df.filter($"vec_id" === 2).select($"embedding".as("vb")))
      .select(VectorSearch.cosine($"va", $"vb")).as[Double].head()
    assert(math.abs(dot - cos) < 1e-9)
  }

  test("upsert SQL for key-only tables: DO NOTHING / no MATCHED clause") {
    val pg = Sinks.upsertSql("seen", Seq("location_id"), Seq("location_id"))
    assert(pg.endsWith("ON CONFLICT (location_id) DO NOTHING"))
    val (merge, params) = Sinks.ansiMergeDialect("seen", Seq("location_id"), Seq("location_id"))
    assert(!merge.contains("WHEN MATCHED"))
    assert(merge.contains("WHEN NOT MATCHED THEN INSERT"))
    assert(params == Seq("location_id", "location_id"))
  }

  test("corrupt payloads, lenient: normalizers yield no rows, not failures (Places policy)") {
    assert(JsonIngest.normalizePlaces(spark,
      spark.createDataset(Seq("this is not json"))).count() == 0)
    assert(JsonIngest.normalizeMobil(spark,
      spark.createDataset(Seq("""{"WrongKey": []}""")), strict = false).count() == 0)
    assert(JsonIngest.normalizeBp(spark,
      spark.createDataset(Seq("{}")), strict = false).count() == 0)
  }

  test("corrupt payloads, strict (BP/Mobil default): parse fails loudly (KeyError policy)") {
    // missing envelope key — the reference's response.json()["Locations"]
    intercept[Exception] {
      JsonIngest.normalizeMobil(spark,
        spark.createDataset(Seq("""{"WrongKey": []}"""))).count()
    }
    // unparseable JSON
    intercept[Exception] {
      JsonIngest.normalizeBp(spark,
        spark.createDataset(Seq("this is not json"))).count()
    }
    // row present but id key missing — row["id"] KeyError
    intercept[Exception] {
      JsonIngest.normalizeBp(spark,
        spark.createDataset(Seq("""[{"name": "no id here"}]"""))).count()
    }
    intercept[Exception] {
      JsonIngest.normalizeMobil(spark,
        spark.createDataset(Seq("""{"Locations": [{"BrandName": "Mobil"}]}"""))).count()
    }
    // well-formed payloads still parse under strict
    assert(JsonIngest.normalizeBp(spark,
      spark.createDataset(Seq(Fixtures.bp))).count() == 1)
  }

  test("skew report mean basis includes all keys (regression guard)") {
    val df = (Seq.fill(10)("a") ++ Seq("b", "c")).toDF("k")
    val rows = graft.op.Scale.skewReport(df, "k", topN = 3).collect()
    assert(rows.length == 3)
    assert(rows.head.getString(0) == "a")
    // mean = 12/3 = 4.0, so skew for 'a' = 2.5
    assert(math.abs(rows.head.getDouble(2) - 2.5) < 1e-9)
  }

  test("withMedia: null bytes produce null media and checksum, not a crash") {
    val df = Seq((1L, null: Array[Byte]), (2L, "x".getBytes))
      .toDF("doc_id", "raw")
    val out = graft.ext.Multimodal.withMedia(df, "raw", "image")
      .orderBy("doc_id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("media")))
    assert(!out(1).isNullAt(out(1).fieldIndex("media")))
  }

  test("curation pipeline is idempotent: running on its own output is a no-op") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val once = graft.pipeline.Curation.curate(docs, "text", "doc_id")
    val survivors = docs.join(once.select("doc_id"), Seq("doc_id"))
    val twice = graft.pipeline.Curation.curate(survivors, "text", "doc_id")
    assert(once.count() == twice.count())
  }

  test("curation checkpointDir path yields output identical to the persist path") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("curation_ckpt")
      .toString
    val persisted = graft.pipeline.Curation.curate(docs, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val checkpointed = graft.pipeline.Curation.curate(docs, "text", "doc_id",
      checkpointDir = Some(tmp))
      .orderBy("doc_id").collect().toSeq
    assert(persisted == checkpointed)
    // the stage boundary is on disk and survives the plan
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$tmp/curation_deduped")))
  }

  test("round-6 operators: empty inputs and contract violations") {
    import graft.ext.Sampling
    val empty = Seq.empty[(String, Long, Long)].toDF("source", "doc_id", "n_chars")
    // empty in -> empty out, no crash
    assert(Sampling.capPerGroup(empty, "source", 3,
      Seq(desc_nulls_last("n_chars")), "doc_id").count() == 0)
    assert(graft.op.Scale.shuffleOrder(
      Seq.empty[Long].toDF("k"), "k", numPartitions = 3).count() == 0)
    // jackknife contracts: >= 2 groups, k >= 1 caps
    intercept[IllegalArgumentException] {
      Sampling.jackknifeMean(Seq((1L, 2L)).toDF("k", "m"), "k",
        col("m"), groups = 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.capPerGroup(empty, "source", 0, Seq(col("n_chars")), "doc_id")
    }
    // bm25Route on docs with zero matching terms emits nothing
    val model = graft.ext.TextAnalysis.bm25Snapshot(
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), "text", "doc_id",
      Map("r" -> Seq("alpha")))
    assert(graft.ext.TextAnalysis.bm25Route(
      Seq((9L, "zzz qqq")).toDF("doc_id", "text"),
      "text", "doc_id", model).count() == 0)
  }
}
