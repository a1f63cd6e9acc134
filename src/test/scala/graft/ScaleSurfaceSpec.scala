package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Round-5 scale-surface queries: salted join, bucketed co-located
  * join, partial re-aggregation, robust stats — data-level equivalence
  * to their naive forms plus the plan properties that make them scale.
  */
class ScaleSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("t_salted_join equals the plain join aggregate") {
    val got = SparkEntry.queries("t_salted_join")(spark, sf).collect().toSeq
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val sup = spark.read.parquet(s"$sf/supplier.parquet")
    val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy("s_name").collect().toSeq
    assert(got == plain)
  }

  test("t_salted_join plan replicates the dim across explicit salt keys") {
    val p = SparkEntry.queries("t_salted_join")(spark, sf)
      .queryExecution.explainString(FormattedMode)
    // the dimension side carries the explode that fans each dim row out
    // over the salt range, and the join matches on (key, salt)
    assert(p.contains("Generate"), p)
    assert(p.contains("_salt"), p)
  }

  test("t_bucketed_join: no shuffle on the join key, result matches raw") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("t_bucketed_join")(spark, sf)
      val p = df.queryExecution.explainString(FormattedMode)
      // both scans are pre-bucketed on o_orderkey: the SMJ needs no
      // exchange on the join key — the only shuffles left are the
      // priority aggregate and the final order-by
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning(o_orderkey"), p)
      val got = df.collect().toSeq
      val o = spark.read.parquet(s"$sf/orders.parquet")
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val plain = o.join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(expr("cast(round(l_extendedprice * (1 - l_discount), 4) as decimal(18,4))"))
            .cast("double").as("revenue"))
        .orderBy("o_orderpriority").collect().toSeq
      assert(got == plain)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
  }

  test("triangleCounts (degree-oriented) equals the naive a<b<c triple join") {
    // the support>=2 market-basket graph at this sf, closed both ways
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
    val e = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("x"), col("b.l_partkey").as("y"))
      .agg(count(lit(1)).as("sup")).filter(col("sup") >= 2)
      .select("x", "y").cache()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e1.y") === col("e2.x"))
      .join(e.as("e3"), col("e3.x") === col("e1.x") && col("e3.y") === col("e2.y"))
      .select(explode(array(col("e1.x"), col("e1.y"), col("e2.y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oriented = graft.op.Graph.triangleCounts(e, "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    e.unpersist()
    assert(naive.nonEmpty && oriented == naive,
      s"oriented=${oriented.size} naive=${naive.size}")
  }

  test("t_reaggregate: merging daily partials equals aggregating raw") {
    val got = SparkEntry.queries("t_reaggregate")(spark, sf).collect().toSeq
    val direct = graft.source.Tables.events(spark, sf)
      .groupBy(date_trunc("month", col("ts_us")).cast("date").as("month"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(to_date(col("ts_us"))).as("n_days"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("month", "event_type").collect().toSeq
    assert(got == direct)
  }

  test("MAD: exact median/deviation on a known set; robust to one outlier") {
    // values 1..9 plus one wild outlier: the mean jumps, the median
    // moves one rank and MAD stays put — that robustness is the op
    val df = ((1 to 9).map(v => ("a", v.toDouble)) :+ ("a", 1e9))
      .toDF("event_type", "value")
    val med = df.groupBy("event_type")
      .agg(expr("percentile(value, 0.5D)").as("med"))
    val r = df.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("value") - col("med")))
      .groupBy("event_type")
      .agg(round(first(col("med")), 6).as("median_value"),
        round(expr("percentile(adev, 0.5D)"), 6).as("mad"))
      .head()
    assert(r.getDouble(1) == 5.5) // interpolated median of 1..9 + outlier
    assert(r.getDouble(2) == 2.5) // adevs {4.5,3.5,...,0.5,...} median
  }

  test("MAD: single-value group has zero spread") {
    val df = Seq(("a", 7.0)).toDF("event_type", "value")
    val med = df.groupBy("event_type")
      .agg(expr("percentile(value, 0.5D)").as("med"))
    val r = df.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("value") - col("med")))
      .groupBy("event_type")
      .agg(round(expr("percentile(adev, 0.5D)"), 6).as("mad"))
      .head()
    assert(r.getDouble(1) == 0.0)
  }
}
