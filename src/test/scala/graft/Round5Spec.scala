package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode
import graft.ext.{Sampling, TextAnalysis}
import graft.op.{Graph, Stats}

/** Round-5 operators: PageRank, exact-k sampling, chunking, vocabulary,
  * bigrams, lexical diversity, and the decimal-exact statistics family
  * (corr/rolling/histogram).
  */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  // ---- Graph.pageRank ----

  test("pageRank: 3-cycle stays uniform and follows the scalar recurrence") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val iters = 4
    val got = Graph.pageRank(edges, "src", "dst", iterations = iters)
      .as[(Long, Long)].collect().toMap
    // every node has in/out degree 1, so all ranks follow the scalar
    // fixed-point recurrence r' = base + (r * 85) div 100 exactly
    val scale = 1000000000000L
    val init = scale / 3
    val base = (init * 15) / 100
    var r = init
    for (_ <- 1 to iters) r = base + (r * 85) / 100
    assert(got == Map(1L -> r, 2L -> r, 3L -> r))
  }

  test("pageRank: symmetrized star ranks the hub above the leaves") {
    val spokes = (1L to 4L).map(l => (100L, l))
    val edges = (spokes ++ spokes.map(_.swap)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, "src", "dst").as[(Long, Long)]
      .collect().toMap
    val leafRanks = (1L to 4L).map(ranks)
    assert(leafRanks.toSet.size == 1, "leaves must tie exactly")
    // converged ratio is ~3.6; after the default 4 iterations from a
    // uniform start it has reached ~2 — assert a conservative margin
    assert(ranks(100L) > leafRanks.head * 3 / 2, "hub must dominate")
    // total mass is conserved up to integer-division dust
    val total = ranks.values.sum
    assert(total <= 1000000000000L && total > 999000000000L, total.toString)
  }

  test("pageRank rejects an empty edge list with a clear error") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val e = intercept[IllegalArgumentException](
      Graph.pageRank(empty, "src", "dst"))
    assert(e.getMessage.contains("non-empty"), e.getMessage)
  }

  // ---- Sampling.sampleExactK ----

  test("sampleExactK: exactly min(k, stratum size) rows, partition-count independent") {
    val df = spark.range(1, 301)
      .selectExpr("id AS k", "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' ELSE 'c' END AS g")
    val a = Sampling.sampleExactK(df.repartition(3), "g", "k", k = 10)
      .select($"g", $"k").as[(String, Long)].collect().toSet
    val b = Sampling.sampleExactK(df.repartition(17), "g", "k", k = 10)
      .select($"g", $"k").as[(String, Long)].collect().toSet
    assert(a == b, "sample must be independent of physical layout")
    assert(a.groupBy(_._1).view.mapValues(_.size).toMap ==
      Map("a" -> 10, "b" -> 10, "c" -> 10))
    // undersized stratum: keeps everything
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("k", "g")
    assert(Sampling.sampleExactK(tiny, "g", "k", k = 10).count() == 2)
  }

  test("sampleExactK rejects a string key at call time") {
    val df = Seq(("k1", "g")).toDF("k", "g")
    val e = intercept[IllegalArgumentException](
      Sampling.sampleExactK(df, "g", "k", k = 1))
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("sampleExactK plans WindowGroupLimit (map-side top-k pre-prune)") {
    // a non-constant stratum: a literal one constant-folds the window's
    // partitionBy away and Spark plans TakeOrderedAndProject instead
    val df = spark.range(1, 1001)
      .selectExpr("id AS k", "CAST(id % 3 AS STRING) AS g")
    val p = Sampling.sampleExactK(df, "g", "k", k = 5)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("WindowGroupLimit"), p)
  }

  // ---- TextAnalysis.chunkDocs / buildVocab ----

  test("chunkDocs: stride windows with short tail, full coverage") {
    val doc = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocs(doc, "text", "doc_id",
        chunkTokens = 4, stride = 3)
      .select($"chunk_id", $"chunk", $"n_chunk_tokens")
      .as[(Int, String, Int)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(got(0)._2 == "w1 w2 w3 w4")
    assert(got(1)._2 == "w4 w5 w6 w7")
    assert(got(2)._2 == "w7 w8 w9 w10")
    assert(got(3)._2 == "w10") // tail chunk is short, never dropped
    assert(got.map(_._3).toSeq == Seq(4, 4, 4, 1))
  }

  test("chunkDocs: single short doc yields exactly one whole-doc chunk") {
    val doc = Seq((7L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocs(doc, "text", "doc_id",
        chunkTokens = 32, stride = 24)
      .select($"doc", $"chunk_id", $"chunk").as[(Long, Int, String)].collect()
    assert(got.toSeq == Seq((7L, 0, "a b")))
  }

  test("buildVocab: ids follow (count desc, token asc); minCount prunes") {
    val docs = Seq((1L, "b b a"), (2L, "b a c")).toDF("doc_id", "text")
    val all = TextAnalysis.buildVocab(docs, "text")
      .select($"token", $"n", $"vocab_id").as[(String, Long, Long)]
      .collect().sortBy(_._3)
    // b:3, a:2, c:1 → ids 1, 2, 3
    assert(all.toSeq == Seq(("b", 3L, 1L), ("a", 2L, 2L), ("c", 1L, 3L)))
    val pruned = TextAnalysis.buildVocab(docs, "text", minCount = 2)
      .select($"token").as[String].collect().toSet
    assert(pruned == Set("a", "b"))
  }

  test("buildVocab: count ties break by token ascending") {
    val docs = Seq((1L, "z q z q m")).toDF("doc_id", "text")
    val got = TextAnalysis.buildVocab(docs, "text")
      .select($"token", $"vocab_id").as[(String, Long)].collect().toMap
    assert(got == Map("q" -> 1L, "z" -> 2L, "m" -> 3L))
  }

  // ---- bigrams / lexical diversity ----

  test("topBigrams counts adjacent pairs; single-token docs contribute none") {
    val docs = Seq((1L, "to be or not to be"), (2L, "be"), (3L, "to be"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.topBigrams(docs, "text", 10)
      .as[(String, Long)].collect().toMap
    assert(got("to be") == 3L && got("be or") == 1L && got("not to") == 1L)
    assert(got.values.sum == 6L) // 5 slots from doc 1, 0 from doc 2, 1 from doc 3
  }

  test("typeTokenStats: exact token/type/hapax/ttr") {
    val docs = Seq((1L, "the cat the dog")).toDF("doc_id", "text")
    val r = TextAnalysis.typeTokenStats(docs, "text", "doc_id")
      .select($"n_tokens", $"n_types", $"n_hapax", $"ttr")
      .as[(Long, Long, Long, Double)].head()
    assert(r == ((4L, 3L, 2L, 0.75)))
  }

  // ---- Stats ----

  test("corrStats: exact +1 correlation and line recovery on y = 2x + 1") {
    val df = (1 to 100).map(i => ("g", i.toDouble, 2.0 * i + 1.0))
      .toDF("g", "x", "y")
    val r = Stats.corrStats(df, "g", "x", "y")
      .select($"n", $"corr", $"slope", $"intercept")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 == 100L)
    assert(math.abs(r._2 - 1.0) < 1e-9, s"corr=${r._2}")
    assert(math.abs(r._3 - 2.0) < 1e-9, s"slope=${r._3}")
    assert(math.abs(r._4 - 1.0) < 1e-9, s"intercept=${r._4}")
  }

  test("corrStats: anticorrelated pair hits -1") {
    val df = (1 to 50).map(i => ("g", i.toDouble, -3.0 * i))
      .toDF("g", "x", "y")
    val r = Stats.corrStats(df, "g", "x", "y").select($"corr").as[Double].head()
    assert(math.abs(r + 1.0) < 1e-9, s"corr=$r")
  }

  test("rollingAgg: trailing window sums with partial head frames") {
    val df = Seq(("u", 1L, 1.0), ("u", 2L, 2.0), ("u", 3L, 4.0), ("u", 4L, 8.0))
      .toDF("g", "seq", "v")
    val got = Stats.rollingAgg(df, Seq("g"), Seq("seq"), "v", window = 3)
      .select($"seq", $"roll_sum", $"roll_n", $"roll_avg")
      .as[(Long, Double, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1.0, 1L, 1.0), (2L, 3.0, 2L, 1.5),
      (3L, 7.0, 3L, round6(7.0 / 3)), (4L, 14.0, 3L, round6(14.0 / 3))))
  }

  test("labelCentroids: exact scaled-integer means in long form") {
    val df = Seq(
      (0, Seq(1.0f, -2.0f)), (0, Seq(3.0f, 4.0f)), (1, Seq(0.5f, 0.25f)))
      .toDF("label", "embedding")
    val got = graft.ext.VectorSearch.labelCentroids(df, "label", "embedding")
      .select($"label", $"dim", $"n", $"centroid")
      .as[(Int, Int, Long, Double)].collect().toSet
    assert(got == Set((0, 0, 2L, 2.0), (0, 1, 2L, 1.0),
      (1, 0, 1L, 0.5), (1, 1, 1L, 0.25)))
  }

  test("clusterSurvivors keeps the longest doc, ties to smallest id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc", "cluster")
    val docs = Seq((1L, 10L), (2L, 50L), (3L, 50L), (7L, 5L), (8L, 5L))
      .toDF("doc_id", "n_chars")
    val got = graft.ext.TextDedup
      .clusterSurvivors(clusters, docs, "doc_id", "n_chars")
      .select($"cluster", $"survivor", $"n_chars", $"n_members")
      .as[(Long, Long, Long, Long)].collect().toSet
    // cluster 1: docs 2 and 3 tie at 50 chars -> smallest id 2 wins
    assert(got == Set((1L, 2L, 50L, 3L), (7L, 7L, 5L, 2L)))
  }

  test("zscores: mean 0 / unit std on a known group") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0)).toDF("g", "x")
    val got = Stats.zscores(df, "g", "x").select($"x", $"z")
      .as[(Double, Double)].collect().toMap
    assert(got == Map(1.0 -> -1.0, 2.0 -> 0.0, 3.0 -> 1.0))
  }

  test("winsorize clamps to the interpolated group quantiles") {
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("g", "x")
    val got = Stats.winsorize(df, "g", "x", lo = 0.05, hi = 0.95, out = "w")
      .select($"x", $"w").as[(Double, Double)].collect().toMap
    // percentile interpolates at rank p*(n-1): p05 = 1.45, p95 = 9.55
    assert(got(1.0) == 1.45 && got(10.0) == 9.55)
    assert((2 to 9).forall(i => got(i.toDouble) == i.toDouble))
  }

  test("fixedWidthHistogram: floor buckets with exact bounds") {
    val df = Seq(0.0, 9.99, 10.0, 19.5, 25.0).toDF("v")
    val got = Stats.fixedWidthHistogram(df, "v", 10.0)
      .select($"bucket", $"n", $"lo", $"hi")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 2L, 0.0, 9.99), (1L, 2L, 10.0, 19.5),
      (2L, 1L, 25.0, 25.0)))
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- degenerate inputs: behavior is pinned, not accidental ----

  test("corrStats: constant x yields NaN (0/0), never a crash or a fake 0") {
    val df = Seq(("g", 5.0, 1.0), ("g", 5.0, 2.0)).toDF("g", "x", "y")
    val r = Stats.corrStats(df, "g", "x", "y")
      .select($"corr", $"slope").as[(Double, Double)].head()
    assert(r._1.isNaN && r._2.isNaN)
  }

  test("zscores: single-row group yields NaN (sample std undefined)") {
    val df = Seq(("g", 3.0)).toDF("g", "x")
    val z = Stats.zscores(df, "g", "x").select($"z").as[Double].head()
    assert(z.isNaN)
  }

  test("zscores: constant-x group yields NaN (zero variance), not a crash") {
    val df = Seq(("g", 3.0), ("g", 3.0), ("g", 3.0)).toDF("g", "x")
    val zs = Stats.zscores(df, "g", "x").select($"z").as[Double].collect()
    assert(zs.length == 3 && zs.forall(_.isNaN))
  }

  test("winsorize: single-row group clamps to itself (p05 = p95 = x)") {
    val df = Seq(("g", 7.0)).toDF("g", "x")
    val w = Stats.winsorize(df, "g", "x", out = "w")
      .select($"w").as[Double].head()
    assert(w == 7.0)
  }

  test("rollingAgg: window of 1 degenerates to the row itself") {
    val df = Seq(("u", 1L, 2.5), ("u", 2L, 3.5)).toDF("g", "seq", "v")
    val got = Stats.rollingAgg(df, Seq("g"), Seq("seq"), "v", window = 1)
      .select($"seq", $"roll_sum", $"roll_n").as[(Long, Double, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2.5, 1L), (2L, 3.5, 1L)))
  }

  test("nearestCentroid recovers planted classes and breaks ties low") {
    import graft.ext.VectorSearch
    // two well-separated classes on orthogonal axes plus one diagonal
    // member of class 7 — it drags the class-7 centroid toward the
    // diagonal, so it must classify back into its own class
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 7), (2L, Seq(0.9f, 0.1f), 7),
      (3L, Seq(0.0f, 1.0f), 9), (4L, Seq(0.1f, 0.9f), 9),
      (5L, Seq(0.5f, 0.5f), 7)
    ).toDF("vec_id", "embedding", "label")
    val got = VectorSearch.nearestCentroid(df, "vec_id", "label", "embedding")
      .select($"vec_id", $"pred_label").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 7, 2L -> 7, 3L -> 9, 4L -> 9, 5L -> 7))
  }

  test("quantizeInt8: extremes hit ±127, zero vector quantizes clean, " +
    "round-trip error ≤ scale/2") {
    import graft.ext.VectorSearch
    val df = Seq(
      (1L, Seq(0.5f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = VectorSearch.quantizeInt8(df, "vec_id", "embedding")
      .select($"vec_id", $"dim", $"q".cast("int"), $"qscale")
      .as[(Long, Int, Int, Double)].collect()
    val v1 = q.filter(_._1 == 1L).sortBy(_._2)
    assert(v1.map(_._3).toSeq == Seq(127, -127, 64, 0)) // 63.5 rounds up
    // dequantization error bound: |q·scale − v| ≤ scale/2
    val scale1 = v1.head._4
    val orig = Seq(0.5, -0.5, 0.25, 0.0)
    v1.foreach { case (_, d, qi, s) =>
      assert(math.abs(qi * s - orig(d)) <= s / 2 + 1e-9) }
    val v2 = q.filter(_._1 == 2L)
    assert(v2.forall(r => r._3 == 0 && r._4 == 0.0))
    assert(scale1 > 0)
  }

  test("trainValTestSplit: total cover, no migration when the corpus grows") {
    import graft.ext.Sampling
    val small = spark.range(1000).toDF("k")
    val big = spark.range(5000).toDF("k")
    val s1 = Sampling.trainValTestSplit(small, "k")
      .select($"k", $"split").as[(Long, String)].collect().toMap
    val s2 = Sampling.trainValTestSplit(big, "k")
      .select($"k", $"split").as[(Long, String)].collect().toMap
    // every row labeled; growing the corpus never moves an existing key
    assert(s1.keySet == (0L until 1000L).toSet)
    assert(s1.forall { case (k, v) => s2(k) == v })
    // rough 90/5/5 proportions at n=5000
    val frac = s2.values.groupBy(identity).view.mapValues(_.size / 5000.0)
    assert(math.abs(frac("train") - 0.9) < 0.03, frac.toMap)
    assert(math.abs(frac("val") - 0.05) < 0.02 &&
      math.abs(frac("test") - 0.05) < 0.02, frac.toMap)
  }

  test("search over int8-quantized vectors: recall@10 >= 0.9 vs exact") {
    import graft.ext.VectorSearch
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 20)
    val exact = VectorSearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val q = VectorSearch.quantizeInt8Vectors(emb, "vec_id", "embedding")
      .withColumnRenamed("qvec", "embedding")
    val qq = q.filter($"vec_id" < 20)
    val approx = VectorSearch.bruteForceTopK(q, qq, "vec_id", "embedding", 10)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"quantized recall $recall")
  }

  test("labelCentroids on an empty frame returns an empty frame") {
    val df = Seq.empty[(Int, Seq[Float])].toDF("label", "embedding")
    assert(graft.ext.VectorSearch.labelCentroids(df, "label", "embedding")
      .count() == 0)
  }

  test("topBigrams/typeTokenStats on empty corpus: empty, no throw") {
    val df = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.topBigrams(df, "text", 5).count() == 0)
    assert(TextAnalysis.typeTokenStats(df, "text", "doc_id").count() == 0)
  }
}
