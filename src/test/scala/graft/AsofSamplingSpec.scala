package graft

import org.apache.spark.sql.functions._
import graft.ext.Sampling
import graft.op.AsofJoin

/** As-of join and deterministic sampling/mixing operators. */
class AsofSamplingSpec extends SparkSpec {
  import spark.implicits._

  private val trades = Seq(
    ("a", 100L, 1L), ("a", 205L, 2L), ("b", 150L, 3L), ("c", 90L, 4L))
    .toDF("sym", "t", "trade_id")
  private val quotes = Seq(
    ("a", 90L, 10L, 1.0), ("a", 100L, 11L, 1.1), ("a", 200L, 12L, 1.2),
    ("b", 160L, 13L, 2.0))
    .toDF("sym", "qt", "quote_id", "px")

  test("asof backward: latest right <= left time, inclusive; no match -> nulls") {
    val out = AsofJoin.asof(trades, quotes, "sym", "t", "qt",
      Seq("quote_id", "px"))
      .select("sym", "trade_id", "asof_quote_id").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // trade a@100 matches quote 11 (equal time inclusive), a@205 -> 12,
    // b@150 has no quote at/before 150, c has no quotes at all
    assert(out == Set(("a", 1L, 11L), ("a", 2L, 12L), ("b", 3L, -1L), ("c", 4L, -1L)))
  }

  test("asof forward: earliest right >= left time") {
    val out = AsofJoin.asof(trades, quotes, "sym", "t", "qt",
      Seq("quote_id"), direction = "forward")
      .select("sym", "trade_id", "asof_quote_id").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // a@100 -> quote 11 (equal time), a@205 -> none, b@150 -> 13
    assert(out == Set(("a", 1L, 11L), ("a", 2L, -1L), ("b", 3L, 13L), ("c", 4L, -1L)))
  }

  test("asof: equal-time right rows resolved by tiebreak, struct kept atomic") {
    val q2 = Seq(("a", 100L, 20L, 5.0), ("a", 100L, 21L, 6.0))
      .toDF("sym", "qt", "quote_id", "px")
    val one = Seq(("a", 100L, 1L)).toDF("sym", "t", "trade_id")
    val r = AsofJoin.asof(one, q2, "sym", "t", "qt",
      Seq("quote_id", "px"), rightTiebreak = Some("quote_id")).head()
    // highest tiebreak wins AND its px comes from the same row
    assert(r.getAs[Long]("asof_quote_id") == 21L)
    assert(r.getAs[Double]("asof_px") == 6.0)
    val fwd = AsofJoin.asof(one, q2, "sym", "t", "qt",
      Seq("quote_id", "px"), rightTiebreak = Some("quote_id"),
      direction = "forward").head()
    // forward: the FIRST right row in scan order = lowest tiebreak
    assert(fwd.getAs[Long]("asof_quote_id") == 20L)
    assert(fwd.getAs[Double]("asof_px") == 5.0)
  }

  test("asof matches a per-key scala model on random-ish data") {
    val left = (1 to 50).map(i => ((i % 5).toString, (i * 17 % 97).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = (1 to 40).map(i => ((i % 5).toString, (i * 13 % 89).toLong, (1000 + i).toLong))
      .toDF("k", "rt", "rid")
    val deduped = graft.op.Dedup.lastWriteWins(right, Seq("k", "rt"), Seq(col("rid")))
    val got = AsofJoin.asof(left, deduped, "k", "t", "rt", Seq("rid"))
      .select("k", "lid", "asof_rid").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val rightRows = deduped.select("k", "rt", "rid").as[(String, Long, Long)]
      .collect().groupBy(_._1)
    val leftRows = left.select("k", "t", "lid").as[(String, Long, Long)].collect()
    leftRows.foreach { case (k, t, lid) =>
      val expect = rightRows.getOrElse(k, Array.empty)
        .filter(_._2 <= t).sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      assert(got((k, lid)) == expect, s"key $k lid $lid")
    }
  }

  test("auto anti-join honors a disabled (-1) broadcast threshold") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val batch = spark.range(100).selectExpr("id AS location_id")
      val small = spark.range(10).selectExpr("id AS location_id")
      val df = graft.op.Dedup.newKeysOnlyAuto(batch, small, "location_id")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan) // no pinned broadcast
      assert(df.count() == 90)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("stratified sample matches the integer-threshold hash model exactly") {
    val keys = spark.range(10000).selectExpr("id AS doc_id", "'en' AS lang")
    val kept = Sampling.stratifiedSample(keys, "lang", "doc_id",
      Map("en" -> 0.07)).select("doc_id").as[Long].collect().toSet
    def bucket(k: Long): Long = ((k % 1000000007L) * 2654435761L) % 1000L
    val model = (0L until 10000L).filter(bucket(_) < 70).toSet
    assert(kept == model, s"sizes ${kept.size} vs ${model.size}")
    // 64-bit ids beyond the naive-multiply overflow point still work
    val big = Seq(5000000000L, Long.MaxValue / 2).toDF("doc_id")
      .selectExpr("doc_id", "'en' AS lang")
    assert(Sampling.stratifiedSample(big, "lang", "doc_id",
      Map("en" -> 1.0)).count() == 2)
  }

  test("stratified sample: deterministic, fraction 0 drops, 1 keeps all") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang")
    val once = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.3), defaultFraction = 1.0)
    val twice = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.3), defaultFraction = 1.0)
    assert(once.collect().toSet == twice.collect().toSet)
    val nEn = docs.filter($"lang" === "en").count()
    val kept = once.filter($"lang" === "en").count()
    assert(kept < nEn && kept > 0, s"$kept of $nEn")
    // non-en strata untouched at default 1.0
    assert(once.filter($"lang" =!= "en").count() ==
      docs.filter($"lang" =!= "en").count())
    assert(Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.0), 1.0).filter($"lang" === "en").count() == 0)
  }

  test("weighted sample: keep rate tracks the per-row weight; 0/1 edges") {
    val rows = spark.range(20000).selectExpr("id AS doc_id",
      "CAST(id % 200 AS DOUBLE) / 200.0 AS w")
    val kept = Sampling.weightedSample(rows, "doc_id", col("w"))
    // exact model: bucket(k) < round(w * 1000)
    def bucket(k: Long): Long = ((k % 1000000007L) * 2654435761L) % 1000L
    val model = (0L until 20000L)
      .filter(k => bucket(k) < math.round((k % 200).toDouble / 200.0 * 1000.0))
    assert(kept.count() == model.size)
    assert(kept.select("doc_id").as[Long].collect().toSet == model.toSet)
    // weight 0 keeps nothing, weight 1 keeps everything
    assert(Sampling.weightedSample(rows, "doc_id", lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(rows, "doc_id", lit(1.0)).count() == 20000)
  }

  test("poisson bootstrap: deterministic, n_eff near N, multiplicity pmf") {
    val rows = spark.range(20000).selectExpr("id AS doc_id", "id % 100 AS m")
    val a = Sampling.poissonBootstrap(rows, "doc_id", "m", replicates = 10)
      .orderBy("rep").collect()
    val b = Sampling.poissonBootstrap(rows.repartition(9), "doc_id", "m",
      replicates = 10).orderBy("rep").collect()
    assert(a.sameElements(b)) // partitioning cannot change a resample
    // E[n_eff] = N (Poisson(1) multiplicities, quantized): every
    // replicate within 5% of N at N = 20000
    a.foreach { r =>
      val nEff = r.getLong(r.fieldIndex("n_eff"))
      assert(math.abs(nEff - 20000L) < 1000L, s"n_eff $nEff")
      // replicate means stay near the true mean 49.5 of id % 100
      val mean = r.getDouble(r.fieldIndex("mean_metric"))
      assert(mean > 48.0 && mean < 51.0, s"mean $mean")
    }
    // the replicates genuinely differ (it is a resample, not a copy)
    assert(a.map(_.getLong(1)).distinct.length > 1)
  }

  test("corpus mix: weights repeat rows with copy ordinals; 0 drops") {
    val docs = Seq((1L, "de"), (2L, "en"), (3L, "zh")).toDF("doc_id", "lang")
    val out = Sampling.mixCorpus(docs, "lang", Map("de" -> 3, "zh" -> 0))
      .select("doc_id", "copy").as[(Long, Int)].collect().toSet
    assert(out == Set((1L, 1), (1L, 2), (1L, 3), (2L, 1)))
  }

  test("range join equals the naive inequality join; bounds inclusive") {
    val pts = (1 to 60).map(i => ((i % 4).toLong, i.toLong * 7 % 101, i.toLong))
      .toDF("k", "t", "pid")
    val ivs = (1 to 25).map { i =>
      val s = (i.toLong * 11) % 90; ((i % 4).toLong, s, s + (i % 13), 100L + i)
    }.toDF("k", "s", "e", "iid")
    val chunked = graft.op.RangeJoin.pointInInterval(
      pts, ivs, "t", "s", "e", chunkWidth = 8, keys = Seq("k"))
      .select("k", "pid", "iid").as[(Long, Long, Long)].collect().toSet
    val naive = pts.join(ivs, Seq("k"))
      .filter($"t" >= $"s" && $"t" <= $"e")
      .select("k", "pid", "iid").as[(Long, Long, Long)].collect().toSet
    assert(chunked == naive, s"diff: ${(chunked diff naive) ++ (naive diff chunked)}")
    assert(naive.nonEmpty)
    // boundary inclusivity both ends
    val b = graft.op.RangeJoin.pointInInterval(
      Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 21L, 3L)).toDF("k", "t", "pid"),
      Seq((1L, 10L, 20L, 9L)).toDF("k", "s", "e", "iid"),
      "t", "s", "e", chunkWidth = 4, keys = Seq("k"))
      .select("pid").as[Long].collect().toSet
    assert(b == Set(1L, 2L))
  }

  test("range join fails loudly on an interval spanning too many chunks") {
    val pts = Seq((1L, 5L, 1L)).toDF("k", "t", "pid")
    val huge = Seq((1L, 0L, 10000L, 9L)).toDF("k", "s", "e", "iid")
    intercept[Exception] {
      graft.op.RangeJoin.pointInInterval(pts, huge, "t", "s", "e",
        chunkWidth = 1, keys = Seq("k"), maxChunks = 100).count()
    }
  }

  test("tfidf: exact tf/df and smoothed weight on a tiny corpus") {
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "d d d")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.tfidf(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out((1L, "a"))._1 == 2 && out((1L, "a"))._2 == 2)
    assert(out((2L, "c"))._1 == 1 && out((2L, "c"))._2 == 1)
    assert(out((3L, "d"))._1 == 3 && out((3L, "d"))._2 == 1)
    // smoothed idf: tf * (ln((N+1)/(df+1)) + 1), N = 3
    val expect = 2.0 * (math.log(4.0 / 3.0) + 1)
    assert(math.abs(out((1L, "a"))._3 - expect) < 1e-12)
  }

  test("plan shapes: sampling/mixing shuffle-free, asof exactly one shuffle") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang")
    val sPlan = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.5)).queryExecution.executedPlan.toString
    assert(!sPlan.contains("Exchange"), sPlan)
    val mPlan = Sampling.mixCorpus(docs, "lang", Map("de" -> 2))
      .queryExecution.executedPlan.toString
    assert(!mPlan.contains("Exchange"), mPlan)
    // as-of: union of both sides, ONE hash shuffle on the key for the
    // window pass — never a per-key range explosion or a sort-merge pair
    val aPlan = AsofJoin.asof(trades, quotes, "sym", "t", "qt", Seq("px"))
      .queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(aPlan).size
    assert(nExchanges == 1, s"expected 1 hash exchange, got $nExchanges:\n$aPlan")
    // range join: the chunked formulation must plan as a HASH join on
    // (keys, chunk) — the naive BETWEEN predicate would be a nested loop
    val rPlan = graft.op.RangeJoin.pointInInterval(
      trades.withColumnRenamed("t", "pt"), quotes, "pt", "qt", "qt",
      chunkWidth = 8, keys = Seq("sym"))
      .queryExecution.executedPlan.toString
    assert(!rPlan.contains("NestedLoop") && !rPlan.contains("Cartesian"), rPlan)
    assert(rPlan.contains("HashJoin") || rPlan.contains("SortMergeJoin"), rPlan)
  }

  test("capPerGroup keeps the k best rows per group, deterministic ties") {
    val df = Seq(
      ("s1", 1L, 100L), ("s1", 2L, 300L), ("s1", 3L, 300L), ("s1", 4L, 200L),
      ("s2", 5L, 50L), ("s2", 6L, 60L))
      .toDF("source", "doc_id", "n_chars")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.capPerGroup(d, "source", 2,
        Seq(desc_nulls_last("n_chars")), "doc_id")
        .select("doc_id").as[Long].collect().toSet
    // s1: the 300-tie breaks by doc_id (2 before 3) and 4 drops;
    // s2: under cap, both survive
    assert(run(df) == Set(2L, 3L, 5L, 6L))
    assert(run(df.repartition(9)) == Set(2L, 3L, 5L, 6L))
    // compiles to WindowGroupLimit: map-side group limit, the exchange
    // never carries more than k rows per group per task
    val p = Sampling.capPerGroup(df, "source", 2,
      Seq(desc_nulls_last("n_chars")), "doc_id")
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("capPerGroup survives a caller column named like its temp") {
    val df = Seq(("s1", 1L, 9L), ("s1", 2L, 8L))
      .toDF("source", "doc_id", "_qrn0")
    val out = Sampling.capPerGroup(df, "source", 1,
      Seq(col("_qrn0").desc), "doc_id")
    assert(out.columns.toSeq == Seq("source", "doc_id", "_qrn0"))
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("grouped bootstrap matches the exact per-group model") {
    val data = (0L until 300L).map(k => (k % 12, (k % 5) + 1))
    val rows = data.toDF("g", "m")
    val out = Sampling.groupedBootstrap(rows, col("g"), "m", replicates = 10)
      .orderBy("rep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val per = data.groupBy(_._1).map { case (g, v) =>
      (g, v.map(_._2).sum, v.size.toLong) }.toSeq
    def mult(g: Long, r: Long): Long = {
      val mixed = ((g % 1000000007L) * (r + 1) + r * 7919L) % 1000000007L
      val bkt = mixed * 2654435761L % 1000L
      if (bkt < 368) 0L else if (bkt < 736) 1L else if (bkt < 920) 2L
      else if (bkt < 981) 3L else if (bkt < 996) 4L else 5L
    }
    val model = (1L to 10L).map { r =>
      val ms = per.map { case (g, s, n) => (mult(g, r), s, n) }
      val geff = ms.map(_._1).sum
      val neff = ms.map(x => x._1 * x._3).sum
      val sum = ms.map(x => x._1 * x._2).sum
      (r, geff, neff,
        math.round(sum.toDouble / neff * 1e6) / 1e6)
    }
    assert(out.map(x => (x._1, x._2, x._3)).toSeq ==
      model.map(x => (x._1, x._2, x._3)))
    out.zip(model).foreach { case (a, b) =>
      assert(math.abs(a._4 - b._4) < 1.01e-6, s"$a vs $b") }
    // replicates actually differ (the multiplicative mix works at
    // group granularity too)
    assert(out.map(_._3).distinct.length > 1)
  }

  test("jackknifeMean matches the exact model; partitioning-invariant") {
    val rows = (0L until 200L).map(k => (k, (k % 7) + 1)).toDF("k", "m")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.jackknifeMean(d, "k", col("m"), groups = 5)
        .orderBy("grp").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
    val out = run(rows)
    // direct model: same bucket arithmetic, exact integers throughout
    def bucket(k: Long) = ((k % 1000000007L) * 2654435761L % 1000L) % 5L
    val data = (0L until 200L).map(k => (bucket(k), (k % 7) + 1))
    val byG = data.groupBy(_._1).map { case (g, v) =>
      (g, v.map(_._2).sum, v.size.toLong) }.toSeq.sortBy(_._1)
    val s = data.map(_._2).sum
    val n = data.size.toLong
    val loo = byG.map { case (g, sg, ng) =>
      (g, ng, sg, (s - sg) * 1000000L / (n - ng)) }
    assert(out.map(x => (x._1, x._2, x._3, x._4)).toSeq == loo)
    val g = loo.size
    val sx = loo.map(_._4).sum
    val sxx = loo.map(x => x._4 * x._4).sum
    val se = math.sqrt((sxx.toDouble - sx.toDouble * sx.toDouble / g) *
      (g - 1) / g) / 1000000.0
    assert(out.forall(x => math.abs(x._5 - se) < 1.01e-6))
    // the SE is one scalar: identical on every row, invariant to layout
    assert(out.map(_._5).distinct.length == 1)
    assert(run(rows.repartition(9)).toSeq == out.toSeq)
  }
}
