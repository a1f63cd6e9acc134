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

  test("planted skew: salting bounds the max/median task share the plain join concentrates") {
    // 80k rows, 64k of them on ONE hot key. A plain hash join puts the
    // whole hot key in one shuffle task; salting (factor 8) must fan it
    // out so no task carries more than a bounded multiple of the
    // median. AQE off so the partition layout is the raw hash layout
    // (its skew splitter is plan B, proven separately below).
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    // force a SHUFFLE join: a broadcast join has no shuffle to skew,
    // which is itself the first line of defense — this test is about
    // the layout when the dim does NOT fit a broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = spark.range(80000).selectExpr(
        "if(id % 5 < 4, 'hot', concat('k', id % 997)) as k", "id as v")
      val right = (Seq("hot") ++ (0 until 997).map(i => s"k$i")).toDF("k")
        .withColumn("w", length(col("k")))
      def sizes(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.rdd.mapPartitions(it => Iterator(it.size.toLong))
          .collect().toSeq.sorted
      val ps = sizes(left.join(right, "k"))
      val ss = sizes(Scale.saltedJoin(left, right, "k", saltFactor = 8))
      def ratio(s: Seq[Long]): Double = {
        val nz = s.filter(_ > 0)
        nz.max.toDouble / nz(nz.size / 2)
      }
      // plain: the 64k-row hot key rides ONE task — max/median explodes
      assert(ps.max >= 64000L, s"plain layout $ps")
      assert(ratio(ps) > 20.0, s"plain ratio ${ratio(ps)} ($ps)")
      // salted: the hot key fans out 8 ways; even with sub-key hash
      // collisions no task may hold more than 3 sub-keys' worth, and
      // the max/median ratio must collapse by at least 3× vs plain
      // (measured: 64→16 here; the residual 16 is two sub-keys
      // colliding on one of 16 partitions over a ~1k background
      // median, not hot-key concentration)
      assert(ss.max <= 3 * (64000 / 8) + 2000, s"salted layout $ss")
      assert(ratio(ss) * 3 <= ratio(ps),
        s"salted ratio ${ratio(ss)} vs plain ${ratio(ps)} ($ss)")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
    }
  }

  test("planted skew: AQE skew-join splits the hot partition when thresholds are crossed") {
    // the automatic half of the skew story: with the skew thresholds
    // scaled down to unit-test data volume, AQE must re-plan the sort
    // merge join with the hot partition split (skew=true in the final
    // plan) — at production scale the default 256 MB thresholds play
    // the same role
    val restore = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions").map(k =>
      k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try {
      val left = spark.range(80000).selectExpr(
        "if(id % 5 < 4, 'hot', concat('k', id % 997)) as k", "id as v")
      val right = (Seq("hot") ++ (0 until 997).map(i => s"k$i")).toDF("k")
        .withColumn("w", length(col("k")))
      val joined = left.join(right, "k")
      // materialize THIS frame's own execution (count() would spawn a
      // separate QueryExecution and leave joined's AQE plan unfinalized)
      assert(joined.collect().length == 80000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("skew report surfaces the hot key with its ratio") {
    val df = (Seq.fill(90)("hot") ++ (1 to 10).map(i => s"k$i")).toDF("k")
    val top = Scale.skewReport(df, "k", topN = 3).head()
    assert(top.getString(0) == "hot")
    assert(top.getLong(1) == 90L)
    assert(top.getDouble(2) > 5.0)
  }

  test("degenerate corpus: jaccard pairs stay bounded, no array_pairs throw") {
    // every doc shares one boilerplate shingle ("copyright header footer");
    // pairs via that shingle alone would be quadratic — the df-prune cap
    // must drop it and still find the genuine near-dup pair (40/41)
    val docs = (1 to 40).map { i =>
      (i.toLong, s"copyright header footer unique$i body$i text$i")
    } :+ (41L, "copyright header footer unique40 body40 text40 extra")
    val df = docs.toDF("doc_id", "text")
    val pairs = graft.ext.TextDedup.ngramJaccardPairs(
      df, "text", "doc_id", shingleN = 3, threshold = 0.3, maxPostings = 10)
      .collect()
    // the boilerplate shingle (df=41 > 10) is pruned, so no quadratic
    // 41×40/2 pair set; only genuinely-similar pairs remain
    assert(pairs.length < 50, s"expected bounded pairs, got ${pairs.length}")
    assert(pairs.exists(r => r.getLong(0) == 40L && r.getLong(1) == 41L),
      "near-dup pair 40/41 must survive pruning")
    // audit twin reports exactly the dropped shingle
    val dropped = graft.ext.TextDedup.overCapShingles(
      df, "text", "doc_id", shingleN = 3, maxPostings = 10).collect()
    assert(dropped.length == 1 && dropped.head.getLong(1) == 41L, dropped.toSeq)
  }

  test("cross-probe prune parity under an ENGAGED cap: text, postings, and df-summary forms agree") {
    import graft.ext.TextDedup
    // corpus of 20 docs sharing a boilerplate header (df=20 > cap 10);
    // the batch doc overlaps doc 20 genuinely and every other doc only
    // via the boilerplate — all three probe forms must report exactly
    // the genuine pair, and the summary's SUMMED deltas (two folds'
    // worth) must drive the same prune as the window count
    val corpus = (1 to 20).map { i =>
      (i.toLong, s"copyright header footer unique$i body$i text$i")
    }.toDF("doc_id", "text")
    val batch = Seq(
      (100L, "copyright header footer unique20 body20 text20 extra"))
      .toDF("doc_id", "text")
    val viaText = TextDedup.crossNearDups(batch, corpus, "text", "doc_id",
      shingleN = 3, threshold = 0.3, maxPostings = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val postings = TextDedup.docShingles(corpus, "text", "doc_id", 3)
      .select(col("doc"), explode(col("sh")).as("sh"))
    val viaPostings = TextDedup.crossNearDupsFromPostings(batch, postings,
      "text", "doc_id", shingleN = 3, threshold = 0.3, maxPostings = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // df summary as TWO per-fold delta sets (docs 1-10 then 11-20) —
    // only the SUM crosses the cap, which is exactly what a
    // multi-batch incremental index stores
    val dfCounts = postings
      .withColumn("fold", (col("doc") <= 10).cast("int"))
      .groupBy("sh", "fold").agg(count(lit(1)).as("df_delta"))
      .groupBy("sh").agg(sum("df_delta").as("df"))
    val viaDf = TextDedup.crossNearDupsWithDf(batch, postings, dfCounts,
      "text", "doc_id", shingleN = 3, threshold = 0.3, maxPostings = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // hashed form: postings carry 8-byte codes, the summary keeps the
    // per-fold string deltas — same answer through the code-space math
    val hashedPostings = postings.select(col("doc"),
      xxhash64(col("sh")).as("shc"))
    val dfSummary = postings
      .withColumn("fold", (col("doc") <= 10).cast("int"))
      .groupBy("sh", "fold").agg(count(lit(1)).as("df_delta"))
      .select(xxhash64(col("sh")).as("shc"), col("sh"), col("df_delta"))
    val viaHashed = TextDedup.crossNearDupsHashed(batch, hashedPostings,
      dfSummary, "text", "doc_id", shingleN = 3, threshold = 0.3,
      maxPostings = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaText == Set((100L, 20L)), viaText)
    assert(viaPostings == viaText)
    assert(viaDf == viaText)
    assert(viaHashed == viaText)
    // the injectivity audit is LOUD: a stored summary string that
    // disagrees with the batch's string for the same code (a planted
    // 64-bit cross collision) kills the probe before any pair math —
    // the shingle is one the batch provably shares with the corpus
    val collided = dfSummary.unionByName(dfSummary
      .filter(col("sh") === "copyright header footer").limit(1)
      .withColumn("sh", concat(col("sh"), lit(" forged-collision"))))
    val e = intercept[IllegalArgumentException] {
      TextDedup.crossNearDupsHashed(batch, hashedPostings, collided,
        "text", "doc_id", shingleN = 3, threshold = 0.3, maxPostings = 10)
        .count()
    }
    assert(e.getMessage.contains("collision"))
    // corpus-INTERNAL clashes are the fold-maintained invariant, no
    // longer re-proved per probe (x25: that re-proof was the probe's
    // largest fixed cost); the maintenance audit finds them instead
    val audited = TextDedup.auditPostingCodes(collided).collect()
    assert(audited.length == 1 &&
      audited.head.getString(2).endsWith("forged-collision"), audited.toSeq)
    assert(TextDedup.auditPostingCodes(dfSummary).isEmpty)
    // sanity: without the cap the boilerplate would pair everything
    val uncapped = TextDedup.crossNearDupsWithDf(batch, postings, dfCounts,
      "text", "doc_id", shingleN = 3, threshold = 0.01, maxPostings = 5000)
      .count()
    assert(uncapped == 20L)
  }

  test("minhash dropped-bucket audit reports over-cap buckets") {
    // 30 identical docs all collide into the same buckets in every band
    val df = ((1 to 30).map(i => (i.toLong, "same text in every document here"))
      :+ (31L, "completely different content nothing shared at all"))
      .toDF("doc_id", "text")
    val dropped = graft.ext.TextDedup.minhashDroppedBuckets(
      df, "text", "doc_id", maxBucket = 10).collect()
    assert(dropped.nonEmpty)
    assert(dropped.forall(_.getLong(2) == 30L), dropped.toSeq)
  }

  test("sizedForWrite coalesces many small partitions down to the size target") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet").repartition(16)
    // tiny table, generous target -> one output partition, via coalesce
    val sized = Scale.sizedForWrite(df, targetBytes = 1L << 30)
    assert(sized.rdd.getNumPartitions == 1)
    assert(sized.count() == df.count())
    // small target -> more than one file
    val many = Scale.sizedForWrite(df, targetBytes = 64L << 10)
    assert(many.rdd.getNumPartitions > 1)
  }

  test("global row numbers: contiguous 1..N in sort order, any partition count") {
    // id*7 % 1000 is a permutation of 0..999 (gcd(7,1000)=1): unique keys
    val df = spark.range(1000).selectExpr("id * 7 % 1000 AS k")
    val out = Scale.globalRowNumbers(df, Seq("k"), numPartitions = 7)
      .orderBy("k").select("k", "row_id").as[(Long, Long)].collect()
    assert(out.map(_._2).toSeq == (1L to 1000L))
    assert(out.map(_._1).toSeq == out.map(_._1).sorted.toSeq)
    // numbering is partition-count independent
    val again = Scale.globalRowNumbers(df, Seq("k"), numPartitions = 13)
      .orderBy("k").select("k", "row_id").as[(Long, Long)].collect()
    assert(again.toSeq == out.toSeq)
  }

  test("shuffle order: a real permutation, deterministic, partition-stable") {
    val df = spark.range(500).selectExpr("id AS k")
    val out = Scale.shuffleOrder(df, "k", numPartitions = 7)
      .select("k", "shuffle_pos").as[(Long, Long)].collect().sortBy(_._1)
    // contiguous 1..N: a permutation, nothing dropped or duplicated
    assert(out.map(_._2).sorted.toSeq == (1L to 500L))
    // actually shuffled: the permutation must not be (close to) the
    // identity or any monotone map of the key order
    val monotonePairs = out.map(_._2).sliding(2)
      .count { case Array(a, b) => a < b; case _ => false }
    assert(monotonePairs < 400, s"suspiciously ordered: $monotonePairs")
    // rerun- and partition-count-stable
    val again = Scale.shuffleOrder(df.repartition(9), "k", numPartitions = 13)
      .select("k", "shuffle_pos").as[(Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq == out.toSeq)
    // collision-safe temp name: caller column _shk0 survives
    val withTmp = df.withColumnRenamed("k", "_shk0")
    val ok = Scale.shuffleOrder(withTmp, "_shk0", numPartitions = 3)
    assert(ok.columns.toSeq.contains("_shk0") &&
      ok.count() == 500)
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
