package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.source.Tables

/** Pins the contract-schema loaders for the generator-owned tables
  * (`Tables.embeddings` / `Tables.documents`). Round 8 proved the
  * upstream test-data generator can re-encode a column under the engine
  * (events ns→µs); the vector kernels require `array<float>` exactly, so
  * an `embedding` column regenerated as `list<double>` would kill every
  * embedding query's analysis the same way. This spec fabricates each
  * table in today's encoding AND a plausibly-drifted one and asserts the
  * loaders yield identical contract schemas and values on both.
  */
class TableContractSpec extends SparkSpec {
  import spark.implicits._

  private def sfDir(table: String, df: DataFrame): String = {
    val base = java.nio.file.Files.createTempDirectory("contract_sf").toString
    df.write.parquet(s"$base/$table.parquet")
    base
  }

  private val embRows = Seq(
    (1L, Array(0.25f, -1.5f, 3.0f), 0),
    (2L, Array(0.5f, 2.75f, -0.125f), 1),
    (3L, Array(1.0f, 0.0f, -2.5f), 0))

  test("embeddings loader: float and double encodings read identically") {
    val asFloat = sfDir("embeddings",
      embRows.toDF("vec_id", "embedding", "label"))
    // drifted shape: list<double> elements, int32 vec_id (values chosen
    // exactly representable in float, so narrowing is lossless)
    val asDouble = sfDir("embeddings",
      embRows.map { case (id, v, l) => (id.toInt, v.map(_.toDouble), l) }
        .toDF("vec_id", "embedding", "label"))

    val frames = Seq(Tables.embeddings(spark, asFloat),
      Tables.embeddings(spark, asDouble))
    for (df <- frames) {
      assert(df.schema("vec_id").dataType == LongType)
      assert(df.schema("embedding").dataType
        .asInstanceOf[ArrayType].elementType == FloatType)
      assert(df.schema("label").dataType == IntegerType)
      val got = df.orderBy("vec_id").collect().map(r =>
        (r.getLong(0), r.getSeq[Float](1).toList, r.getInt(2))).toSeq
      assert(got == embRows.map { case (id, v, l) => (id, v.toList, l) })
    }
    // the contract loader feeds the kernels: cosine over the narrowed
    // double encoding must equal cosine over the native float one
    def cos(df: DataFrame): Seq[(Long, Long, Double)] = {
      val a = df.select($"vec_id".as("ida"), $"embedding".as("va"))
      val b = df.select($"vec_id".as("idb"), $"embedding".as("vb"))
      a.join(b, $"ida" < $"idb")
        .select($"ida", $"idb",
          graft.functions.VectorExpressions.cosine_sim($"va", $"vb").as("sim"))
        .orderBy("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    }
    assert(cos(frames.head) == cos(frames.last))
  }

  private val docRows = Seq(
    (10L, "alpha beta", "en", "web", 10L),
    (11L, "gamma", "de", "book", 5L))

  test("documents loader: int64 and int32 numeric encodings read identically") {
    val native = sfDir("documents",
      docRows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val drifted = sfDir("documents",
      docRows.map { case (id, t, l, s, n) => (id.toInt, t, l, s, n.toInt) }
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    for (dir <- Seq(native, drifted)) {
      val df = Tables.documents(spark, dir)
      assert(df.schema("doc_id").dataType == LongType)
      assert(df.schema("n_chars").dataType == LongType)
      val got = df.orderBy("doc_id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
          r.getLong(4))).toSeq
      assert(got == docRows)
    }
  }

  test("contract loader is identity on already-conforming frames") {
    val dir = sfDir("embeddings", embRows.toDF("vec_id", "embedding", "label"))
    // no drift ⇒ no extra Project over the scan: the analyzed plans of
    // the raw read and the contract read are the same shape
    val raw = Tables.table(spark, dir, "embeddings")
    val loaded = Tables.embeddings(spark, dir)
    assert(loaded.queryExecution.analyzed.schema == raw.queryExecution.analyzed.schema)
    assert(loaded.queryExecution.optimizedPlan.getClass ==
      raw.queryExecution.optimizedPlan.getClass)
  }

  test("missing contract column fails loudly at the read") {
    val dir = sfDir("documents",
      docRows.map { case (id, t, l, s, _) => (id, t, l, s) }
        .toDF("doc_id", "text", "lang", "source"))
    val e = intercept[IllegalArgumentException](Tables.documents(spark, dir))
    assert(e.getMessage.contains("n_chars"))
  }

  test("extra generator-added columns pass through") {
    val dir = sfDir("documents",
      docRows.map { case (id, t, l, s, n) => (id, t, l, s, n, "v2") }
        .toDF("doc_id", "text", "lang", "source", "n_chars", "gen_version"))
    val df = Tables.documents(spark, dir)
    assert(df.columns.contains("gen_version"))
    assert(df.schema("doc_id").dataType == LongType)
  }
}
