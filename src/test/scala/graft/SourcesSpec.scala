package graft

import org.apache.spark.sql.functions._
import graft.source.Tables

/** File-level schema evolution: mergeSchema across parquet snapshots
  * written under different schema versions.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("readEvolved merges footers; pre-evolution files null-fill the new column") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "kind")
      .write.parquet(s"$dir/v1")
    Seq((3L, "c", 30.0), (4L, "d", 40.0)).toDF("id", "kind", "score")
      .write.parquet(s"$dir/v2")
    val merged = Tables.readEvolved(spark, Seq(s"$dir/v1", s"$dir/v2"))
    assert(merged.columns.sorted.toSeq == Seq("id", "kind", "score"))
    val rows = merged.orderBy("id")
      .select(col("id"), col("score"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(rows.toSeq == Seq(1L -> None, 2L -> None, 3L -> Some(30.0), 4L -> Some(40.0)))
    // a plain single-path read of the OLD snapshot still works and has
    // no phantom column — evolution is opt-in at the read site
    assert(!spark.read.parquet(s"$dir/v1").columns.contains("score"))
  }
}
