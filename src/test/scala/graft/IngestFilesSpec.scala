package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.source.TextSources
import graft.streaming.EventStream

/** Flat-file ingestion policies + streaming checkpoint incrementality. */
class IngestFilesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("id BIGINT, name STRING, qty INT")

  private def writeCsv(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.csv"),
      ("id,name,qty" +: lines).mkString("\n"))
    dir
  }

  test("csv Keep quarantines malformed lines in _corrupt_record") {
    val dir = writeCsv(Seq("1,alpha,10", "2,beta,notanint", "3,gamma,30"))
    val got = TextSources.csv(spark, dir, schema, TextSources.Keep)
      .cache() // PERMISSIVE corrupt-column contract needs one pass
    assert(got.count() == 3)
    val bad = got.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1 && bad.head.getAs[String]("_corrupt_record")
      .contains("notanint"))
    // clean rows parse fully
    assert(got.filter(col("_corrupt_record").isNull)
      .agg(sum("qty")).head().getLong(0) == 40L)
    got.unpersist()
  }

  test("csv Drop silently drops malformed; Strict fails loudly") {
    val dir = writeCsv(Seq("1,alpha,10", "2,beta,notanint"))
    // the scaladoc'd sharp edge: under column pruning count() parses no
    // columns, so DROPMALFORMED drops nothing...
    assert(TextSources.csv(spark, dir, schema, TextSources.Drop).count() == 2)
    // ...while materializing the typed columns drops the bad row
    assert(TextSources.csv(spark, dir, schema, TextSources.Drop)
      .collect().length == 1)
    val e = intercept[org.apache.spark.SparkException] {
      TextSources.csv(spark, dir, schema, TextSources.Strict).collect()
    }
    assert(e.getMessage.contains("MALFORMED") ||
      e.getCause != null, e.getMessage)
  }

  test("jsonLines policies: Keep quarantines, Strict throws") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "d.jsonl"),
      """{"id": 1, "name": "a", "qty": 5}
        |{"id": "oops" broken json
        |{"id": 3, "name": "c", "qty": 7}""".stripMargin)
    val kept = TextSources.jsonLines(spark, dir, schema, TextSources.Keep)
      .cache()
    assert(kept.count() == 3)
    assert(kept.filter(col("_corrupt_record").isNotNull).count() == 1)
    kept.unpersist()
    intercept[org.apache.spark.SparkException] {
      TextSources.jsonLines(spark, dir, schema, TextSources.Strict).collect()
    }
  }

  test("checkpointed file-sink restart processes only new input (no dup, no loss)") {
    val in = java.nio.file.Files.createTempDirectory("ckin").toString
    val out = java.nio.file.Files.createTempDirectory("ckout").toString
    val ck = java.nio.file.Files.createTempDirectory("ckck").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.parquet(in + "/f1")
    def stream() = spark.readStream
      .schema("id bigint, v string").parquet(in + "/*")
      .withColumn("tagged", concat(col("v"), lit("!")))
    EventStream.runToParquet(stream(), out, ck)
    assert(spark.read.parquet(out).count() == 2)
    // second batch arrives; SAME checkpoint → only the new file runs
    Seq((3L, "c")).toDF("id", "v").coalesce(1).write.parquet(in + "/f2")
    EventStream.runToParquet(stream(), out, ck)
    val rows = spark.read.parquet(out).collect()
    assert(rows.length == 3, s"expected exactly 3 (no dup/loss): ${rows.toSeq}")
    assert(rows.map(_.getString(2)).sorted.toSeq == Seq("a!", "b!", "c!"))
    // a FRESH checkpoint reprocesses everything — proving the original
    // checkpoint (not the sink) is what made the restart incremental
    val out2 = java.nio.file.Files.createTempDirectory("ckout2").toString
    val ck2 = java.nio.file.Files.createTempDirectory("ckck2").toString
    EventStream.runToParquet(stream(), out2, ck2)
    assert(spark.read.parquet(out2).count() == 3)
  }
}
