package graft

import org.apache.spark.sql.functions._
import graft.op.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join results on skewed data") {
    val left = (Seq.fill(500)("hot") ++ Seq("a", "b", "c")).zipWithIndex
      .toDF("k", "v")
    val right = Seq(("hot", 1), ("a", 2), ("x", 3)).toDF("k", "w")
    val plain = left.join(right, "k").select("k", "v", "w")
    val salted = Scale.saltedJoin(left, right, "k", saltFactor = 8)
      .select("k", "v", "w")
    assert(salted.count() == plain.count())
    assert(salted.orderBy("k", "v").collect().toSeq ==
      plain.orderBy("k", "v").collect().toSeq)
  }

  test("skew report surfaces the hot key with its ratio") {
    val df = (Seq.fill(90)("hot") ++ (1 to 10).map(i => s"k$i")).toDF("k")
    val top = Scale.skewReport(df, "k", topN = 3).head()
    assert(top.getString(0) == "hot")
    assert(top.getLong(1) == 90L)
    assert(top.getDouble(2) > 5.0)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Scale.writeBucketed(
        spark.read.parquet(s"$sf/orders.parquet"), "orders_b", "o_orderkey", 4)
      Scale.writeBucketed(
        spark.read.parquet(s"$sf/lineitem.parquet")
          .select("l_orderkey", "l_quantity")
          .withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", 4)
      val joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
