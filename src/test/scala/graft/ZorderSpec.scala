package graft

import org.apache.spark.sql.functions._
import graft.op.Scale

/** Z-order layout utility: exact Morton arithmetic + the locality
  * property that justifies it at scale.
  */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue matches hand-computed Morton codes") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 1023L))
      .toDF("x", "y")
      .select(Scale.zValue(col("x"), col("y"), bits = 10).as("z"))
      .as[Long].collect().toSeq
    // morton(3,5): x bits 0,1 -> pos 0,2 = 5; y bits 0,2 -> pos 1,5 = 34
    assert(got == Seq(0L, 1L, 2L, 39L, (1L << 20) - 1))
  }

  test("zValue masks inputs to the requested width") {
    val got = Seq((1024L + 3L, 0L)).toDF("x", "y")
      .select(Scale.zValue(col("x"), col("y"), bits = 10).as("z"))
      .as[Long].head()
    assert(got == 5L) // bit 10 of x is beyond the 10-bit mask
  }

  test("z-order layout localizes BOTH dimensions where lex sort cannot") {
    // 64x64 grid; 16 range partitions of ~256 rows each
    val grid = spark.range(64L * 64)
      .select((col("id") % 64).as("x"), (col("id") / 64).as("y"))
    def meanSpans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spans = df
        .withColumn("_pid", spark_partition_id())
        .groupBy("_pid")
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).head()
      (spans.getDouble(0), spans.getDouble(1))
    }
    val (zx, zy) = meanSpans(Scale.zorderBy(grid, "x", "y",
      bits = 6, numPartitions = 16))
    val (lx, ly) = meanSpans(grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y"))
    // lexicographic: x is tightly clustered but y spans the full range
    assert(lx < 16.0 && ly > 55.0)
    // z-order: BOTH dimensions compact (each partition ~a rectangle)
    assert(zx < 40.0 && zy < 40.0)
  }

  test("zorderBy leaves a caller column named like its temp intact") {
    // regression: the temp column used to be the fixed name "_zv" —
    // a caller column of that name was overwritten and then dropped
    val df = Seq((1L, 2L, "keep-a"), (3L, 4L, "keep-b"))
      .toDF("x", "y", "_zv0").withColumn("_zv", lit("payload"))
    val out = Scale.zorderBy(df, "x", "y", bits = 4, numPartitions = 2)
    assert(out.columns.toSet == Set("x", "y", "_zv0", "_zv"))
    assert(out.select("_zv").as[String].collect().toSet == Set("payload"))
    assert(out.select("_zv0").as[String].collect().toSet ==
      Set("keep-a", "keep-b"))
  }
}
