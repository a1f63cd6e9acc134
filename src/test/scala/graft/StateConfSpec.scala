package graft

import org.apache.spark.sql.functions._
import graft.util.StateConf

/** The per-root partition-count contract (round-15): a state root
  * records the StateParts it was laid out with in a `_`-prefixed
  * marker inside the table directory, every open validates against
  * it, and the sizing helper follows the measured per-partition-bytes
  * rule (TUNING.md round-14 StateParts rows).
  */
class StateConfSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def markerPath(dir: String) =
    new org.apache.hadoop.fs.Path(dir, StateConf.MarkerFile)

  private def fs(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  test("bind on an absent root is a no-op; first fold records the marker") {
    val dir = tmpDir("scnf") + "/state"
    StateConf.bind(spark, dir, 8) // absent: must not create anything
    assert(!fs(dir).exists(new org.apache.hadoop.fs.Path(dir)))
    graft.ext.IncrementalLsh.fold(spark,
      dir, spark.range(1, 40)
        .select(col("id").as("vec_id"),
          expr("transform(sequence(1, 4), i -> cast(id * i as float))")
            .as("embedding")),
      "vec_id", "embedding", batchNo = 1L, bits = 4, tables = 2)
    assert(fs(dir).exists(markerPath(dir)),
      "first fold must record the layout marker")
    // the marker survives a second fold's dynamic-overwrite merge
    graft.ext.IncrementalLsh.fold(spark,
      dir, spark.range(40, 80)
        .select(col("id").as("vec_id"),
          expr("transform(sequence(1, 4), i -> cast(id * i as float))")
            .as("embedding")),
      "vec_id", "embedding", batchNo = 2L, bits = 4, tables = 2)
    assert(fs(dir).exists(markerPath(dir)))
  }

  test("a mismatched partition count fails loudly before any prune") {
    val dir = tmpDir("scnf2") + "/state"
    spark.range(4).select(pmod(col("id"), lit(8L)).as("part"),
        col("id").as("pk"), lit(1L).as("ver"), col("id").as("v"))
      .write.partitionBy("part").parquet(dir)
    StateConf.bind(spark, dir, 8) // adopt at 8
    val e = intercept[IllegalArgumentException] {
      StateConf.bind(spark, dir, 64)
    }
    assert(e.getMessage.contains("laid out with 8"))
    // matching binds keep passing
    StateConf.bind(spark, dir, 8)
    // a re-lay under a new count is the explicit rebind move
    StateConf.rebind(spark, dir, 64)
    StateConf.bind(spark, dir, 64)
    intercept[IllegalArgumentException](StateConf.bind(spark, dir, 8))
  }

  test("a module open of a foreign-parts root fails loudly") {
    val dir = tmpDir("scnf3") + "/state"
    val docs = spark.range(1, 30).select(col("id").as("doc_id"),
      concat(lit("alpha beta gamma delta text "), col("id")).as("text"))
    graft.ext.IncrementalMinhash.fold(spark, dir, docs, "text", "doc_id",
      batchNo = 1L)
    // simulate a JVM whose SPARK_GRAFT_STATE_PARTS resolved differently
    StateConf.rebind(spark, dir, 999)
    intercept[IllegalArgumentException] {
      graft.ext.IncrementalMinhash.retractDocs(spark, dir,
        docs.filter(col("doc_id") === 3).select("doc_id"), "doc_id")
    }
    intercept[IllegalArgumentException] {
      graft.ext.IncrementalMinhash.fold(spark, dir, docs, "text",
        "doc_id", batchNo = 2L)
    }
  }

  test("partsForBytes follows the per-partition-bytes rule") {
    val MiB = 1024L * 1024
    // tiny corpora lay out at 1 partition — never parts-for-parallelism
    assert(StateConf.partsForBytes(0L) == 1)
    assert(StateConf.partsForBytes(10 * MiB) == 1)
    // target-sized: ceil(total / 256 MiB)
    assert(StateConf.partsForBytes(1024 * MiB) == 4)
    assert(StateConf.partsForBytes(1025 * MiB) == 5)
    // never below the 16 MiB per-partition floor
    assert(StateConf.partsForBytes(40 * MiB) <= 2)
    val parts = StateConf.partsForBytes(100L * 1024 * MiB) // 100 GiB
    assert(parts == 400)
    intercept[IllegalArgumentException](
      StateConf.partsForBytes(1024, targetBytes = 1024))
  }
}
