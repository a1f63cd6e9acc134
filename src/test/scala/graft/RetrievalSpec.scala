package graft

import org.apache.spark.sql.functions._
import graft.ext.{Bm25, TextAnalysis, TextDedup}

/** Retrieval family (round 5, continued): portable BM25, keyword
  * extraction, containment near-dups, and RRF fusion arithmetic.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the the the the the the the the the the the the the the the quick"),
    (3L, "zebra runs far"),
    (4L, "the quick dog sleeps"),
    (5L, "a plain sentence with nothing special inside it at all")
  ).toDF("doc_id", "text")

  // ---- BM25 ----

  test("bm25: rare-term doc outranks common-term doc") {
    // "zebra" appears in exactly one doc; "the" in four — the rational
    // idf must put doc 3 above any doc matched only through "the"
    val top = TextAnalysis.bm25TopK(corpus, "text", "doc_id",
      Seq("zebra", "the"), k = 5)
      .select("rank", "doc").as[(Int, Long)].collect()
    assert(top.head == (1, 3L))
    assert(top.map(_._2).toSet == Set(1L, 2L, 3L, 4L))
  }

  test("bm25: document-length normalization dampens repeated terms") {
    // doc 2 has tf("the") = 15 but is long; the saturating tf part
    // (k1 = 1.2) must keep its score below 15x a single occurrence
    val scores = TextAnalysis.bm25Scores(corpus, "text", "doc_id", Seq("the"))
      .select("doc", "score_pts").as[(Long, Long)].collect().toMap
    assert(scores(2L) < 15L * scores(4L))
    assert(scores(2L) > scores(4L)) // but more evidence still scores higher
  }

  test("bm25: score is invariant under input partitioning") {
    val a = TextAnalysis.bm25Scores(corpus.repartition(7), "text", "doc_id",
      Seq("quick", "dog")).orderBy("doc").collect()
    val b = TextAnalysis.bm25Scores(corpus.coalesce(1), "text", "doc_id",
      Seq("quick", "dog")).orderBy("doc").collect()
    assert(a.sameElements(b))
  }

  test("bm25TopK: k bounds the output and ranks are contiguous") {
    val top = TextAnalysis.bm25TopK(corpus, "text", "doc_id",
      Seq("the"), k = 2).select("rank").as[Int].collect()
    assert(top.toSeq == Seq(1, 2))
  }

  test("incremental BM25 fold converges to the one-shot retrieval; probe prunes to term partitions; replays idempotent") {
    import graft.ext.IncrementalBm25
    val dir = java.nio.file.Files.createTempDirectory("bm25inc")
      .toString + "/idx"
    val b1 = corpus.filter(col("doc_id") <= 2)
    val b2 = corpus.filter(col("doc_id") > 2)
    IncrementalBm25.fold(spark, dir, b1, "text", "doc_id", batchNo = 1L)
    IncrementalBm25.fold(spark, dir, b2, "text", "doc_id", batchNo = 2L)
    val terms = Seq("quick", "zebra")
    def probe() = IncrementalBm25.topK(spark, dir, terms, k = 5)
      .collect().map(_.toSeq).toSeq
    val oneShot = TextAnalysis.bm25TopK(corpus, "text", "doc_id",
      terms, k = 5).collect().map(_.toSeq).toSeq
    // the folded index scores EXACTLY the one-shot retrieval — the
    // convergence gate the registered query's shared oracle enforces
    assert(probe() == oneShot)
    assert(oneShot.nonEmpty)
    // replaying batch 2 re-merges postings AND stats idempotently (an
    // additive stats table would double n_docs exactly here)
    IncrementalBm25.fold(spark, dir, b2, "text", "doc_id", batchNo = 2L)
    assert(probe() == oneShot)
    val st = spark.read.parquet(dir + IncrementalBm25.StatsSuffix)
      .agg(sum("n_docs_delta")).head().getLong(0)
    assert(st == 5L)
    // partition pruning: the probe's posting read touches ONLY the
    // query terms' hash partitions (directory-level prune on `part` —
    // asserted from the EXECUTED scan's partition metric, since
    // inputFiles reports the unpruned relation)
    val parts = terms.toDF("term")
      .select(pmod(xxhash64(col("term")),
        lit(IncrementalBm25.StateParts.toLong)))
      .collect().map(_.getLong(0)).distinct.toSeq
    val prunedDf = spark.read.parquet(dir)
      .filter(col("part").isin(parts: _*))
    prunedDf.collect()
    val scan = prunedDf.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val partsRead = scan.metrics("numPartitions").value
    val partsTotal = spark.read.parquet(dir).select("part")
      .distinct().count()
    assert(partsRead <= parts.size.toLong, s"read $partsRead partitions")
    assert(partsTotal > parts.size.toLong,
      s"table only spans $partsTotal partitions — prune untestable")

    // STREAMING face: the same two batches as a file stream converge
    // to the identical probe, and a checkpointed restart with no new
    // files replays nothing
    val sroot = java.nio.file.Files.createTempDirectory("bm25incS").toString
    val sDir = sroot + "/idx"
    val ckp = sroot + "/ckp"
    b1.coalesce(1).write.parquet(sroot + "/f1")
    Thread.sleep(1100) // distinct mod times -> deterministic batch order
    b2.coalesce(1).write.parquet(sroot + "/f2")
    def runStream(): Unit = {
      val st = spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1").parquet(sroot + "/f*")
      IncrementalBm25.foldStream(st, sDir, "text", "doc_id", ckp)
        .awaitTermination(180000)
    }
    runStream()
    def sProbe() = IncrementalBm25.topK(spark, sDir, terms, k = 5)
      .collect().map(_.toSeq).toSeq
    assert(sProbe() == oneShot)
    runStream() // checkpointed restart: no new files, no replay
    assert(sProbe() == oneShot)
  }

  test("folded BM25 postings double as the exact tf-idf matrix") {
    import graft.ext.IncrementalBm25
    val dir = java.nio.file.Files.createTempDirectory("bm25tfidf")
      .toString + "/idx"
    val b1 = corpus.filter(col("doc_id") <= 2)
    val b2 = corpus.filter(col("doc_id") > 2)
    IncrementalBm25.fold(spark, dir, b1, "text", "doc_id", batchNo = 1L)
    IncrementalBm25.fold(spark, dir, b2, "text", "doc_id", batchNo = 2L)
    def probe() = IncrementalBm25.tfidfStats(spark, dir)
      .orderBy("doc", "term")
      .as[(Long, String, Long, Long)].collect().toSeq
    val oneShot = TextAnalysis.tfidf(corpus, "text", "doc_id")
      .select(col("doc"), col("term"), col("tf"), col("df"))
      .orderBy("doc", "term")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(probe() == oneShot && oneShot.nonEmpty)
    // replay leaves the matrix unchanged (LWW on doc:term)
    IncrementalBm25.fold(spark, dir, b2, "text", "doc_id", batchNo = 2L)
    assert(probe() == oneShot)
  }

  // ---- keywords ----

  test("keywords: rare high-tf term wins over ubiquitous term") {
    val kw = TextAnalysis.keywords(corpus, "text", "doc_id", k = 1)
      .select("doc", "term").as[(Long, String)].collect().toMap
    // doc 2: "the" has tf 15 but df 4; "quick" tf 1 df 3 — exact
    // integer scoring must still favor the massive tf here
    assert(kw(2L) == "the")
    // doc 3: all terms unique (df 1) — ties break on term text
    assert(kw(3L) == "far")
  }

  test("keywords: per-doc top-k respects score-then-term order") {
    val kw = TextAnalysis.keywords(corpus, "text", "doc_id", k = 3)
      .filter(col("doc") === 3L).orderBy("rk")
      .select("term").as[String].collect()
    assert(kw.toSeq == Seq("far", "runs", "zebra")) // equal scores, term order
  }

  // ---- containment ----

  test("containment catches a quoted subset that jaccard misses") {
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon"),
      // doc 10's full text quoted inside a much longer document
      (20L, "intro words first alpha beta gamma delta epsilon then many " +
        "unrelated trailing tokens pad this out to a much longer body")
    ).toDF("doc_id", "text")
    val cont = TextDedup.containmentPairs(docs, "text", "doc_id",
      threshold = 0.9)
      .select("id_a", "id_b", "cont_a", "cont_b")
      .as[(Long, Long, Double, Double)].collect()
    assert(cont.length == 1)
    val (a, b, ca, cb) = cont.head
    assert((a, b) == (10L, 20L))
    assert(ca == 1.0) // every shingle of the short doc appears in the long one
    assert(cb < 0.5)
    // the symmetric detector must NOT fire at the same strength
    val jac = TextDedup.ngramJaccardPairs(docs, "text", "doc_id",
      threshold = 0.9).count()
    assert(jac == 0L)
  }

  test("containment: no pair without a shared surviving shingle") {
    val docs = Seq((1L, "aa bb cc dd"), (2L, "ee ff gg hh"))
      .toDF("doc_id", "text")
    assert(TextDedup.containmentPairs(docs, "text", "doc_id",
      threshold = 0.01).count() == 0L)
  }

  test("bm25/keywords argument contracts fail loudly; no-hit query is empty") {
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25Scores(corpus, "text", "doc_id", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25TopK(corpus, "text", "doc_id", Seq("the"), k = 0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.keywords(corpus, "text", "doc_id", k = 0)
    }
    assert(TextAnalysis.bm25Scores(corpus, "text", "doc_id",
      Seq("xyzzy")).count() == 0L)
  }

  // ---- bigram LM scoring ----

  test("lmScore matches hand-computed bigram probabilities") {
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    // corpus bigrams: (a,b)x2 (b,a)x1 (a,c)x1; contexts: a->3, b->1
    // p(a,b)=2/3 -> 666667 pts; p(b,a)=1/1 -> 1000000; p(a,c)=1/3 -> 333333
    val byDoc = TextAnalysis.lmScore(docs, "text", "doc_id")
      .select("doc", "lm_pts", "n_bigrams").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byDoc(1L) == ((666667L * 2 + 1000000L, 3L)))
    assert(byDoc(2L) == ((333333L, 1L)))
  }

  test("lmScore: deterministic text scores p=1 everywhere; short docs drop") {
    val docs = Seq((1L, "x x x x"), (2L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(docs, "text", "doc_id")
      .select("doc", "avg_p_micro").as[(Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 1000000.0))) // doc 2 has no bigrams
  }

  test("releaseArtifacts drops per-dir caches; consumers rebuild cleanly") {
    val before = SparkEntry.queries("ns_containment")(spark, sf).count()
    SparkEntry.releaseArtifacts(spark, sf)
    // next consumer rebuilds the artifact from scratch, same result
    assert(SparkEntry.queries("ns_containment")(spark, sf).count() == before)
    assert(before > 0)
  }

  // ---- corpus drift ----

  test("corpusDrift reports deltas, new groups (null rel), vanished groups") {
    val before = Seq((1L, "a b c", "en"), (2L, "d e", "en"), (3L, "x y", "de"))
      .toDF("doc_id", "text", "lang")
    val after = Seq((4L, "a b", "en"), (5L, "p q r s", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.corpusDrift(before, after, "lang", "text")
      .orderBy("lang")
      .select("lang", "n_docs_before", "n_docs_after", "n_tokens_before",
        "n_tokens_after", "docs_delta", "docs_rel")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          Option(r.get(6)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got("en") == ((2L, 1L, 5L, 2L, -1L, Some(-0.5))))
    assert(got("de") == ((1L, 0L, 2L, 0L, -1L, Some(-1.0)))) // vanished
    assert(got("fr") == ((0L, 1L, 0L, 4L, 1L, None)))        // new: no baseline
  }

  // ---- RRF arithmetic ----

  test("rrf points match the closed form and ignore a missing side") {
    val df = Seq((1, 1), (2, 40)).toDF("r_txt", "r_vec")
      .withColumn("pts",
        coalesce(expr(Bm25.rrfPtsSql("r_txt")), lit(0L)) +
          coalesce(expr(Bm25.rrfPtsSql("r_vec")), lit(0L)))
    val got = df.select("pts").as[Long].collect().toSeq
    assert(got == Seq(
      math.round(1e9 / 61) + math.round(1e9 / 61),
      math.round(1e9 / 62) + math.round(1e9 / 100)))
    val one = Seq((Some(3), Option.empty[Int])).toDF("r_txt", "r_vec")
      .withColumn("pts",
        coalesce(expr(Bm25.rrfPtsSql("r_txt")), lit(0L)) +
          coalesce(expr(Bm25.rrfPtsSql("r_vec")), lit(0L)))
      .select("pts").as[Long].head()
    assert(one == math.round(1e9 / 63))
  }

  // ---- ANN recall floors ----

  test("registered ANN tiers hold their recall floors (0.85 cheap tiers, 0.9 ivfpq)") {
    // Locks the REGISTERED queries' parameters (bits/nprobe/shortlist as
    // shipped in SparkEntry), not a re-specified config: the bench recall
    // sidecar reports these tiers against exact top-k — a parameter
    // "tuning" that silently degrades recall must fail here.
    // Deterministic: fixed seeds, fixed corpus. All tiers hold 0.85
    // after the round-11 retune (sf0.1 measured 0.94 lsh / 0.90
    // multitable / 0.90 ivf / 0.92 pq; sf0.001 — this spec's corpus —
    // 0.98 / 0.94 / 0.96 / 1.00); ns_ivfpq_topk is the PRODUCTION
    // retrieval tier and holds 0.9 — the round-10 joint (nprobe=7,
    // shortlist=32, kCent=64) frontier, 0.92 at sf0.1 (TUNING.md
    // round-10/11 ANN recall tables).
    val exact = SparkEntry.queries("ns_topk_similarity")(spark, sf)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val floors = Seq("ns_ann_lsh" -> 0.85, "ns_ann_multitable" -> 0.85,
      "ns_ivf_topk" -> 0.85, "ns_pq_topk" -> 0.85, "ns_ivfpq_topk" -> 0.9)
    val recalls = floors.map { case (n, floor) =>
      val approx = SparkEntry.queries(n)(spark, sf)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      (n, floor, (exact & approx).size.toDouble / exact.size)
    }
    recalls.foreach { case (n, floor, r) =>
      assert(r >= floor, s"$n recall $r below its $floor floor ($recalls)")
    }
    SparkEntry.releaseArtifacts(spark, sf)
  }

  test("hardNegatives excludes same-label rows and ranks the boundary negative first") {
    import graft.ext.VectorSearch
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),  // query, label 0
      (1L, Array(0.99f, 0.1f), 0), // same label — must never appear
      (2L, Array(0.9f, 0.2f), 1),  // nearest wrong label
      (3L, Array(0.0f, 1.0f), 1),  // orthogonal wrong label
      (4L, Array(-1.0f, 0.0f), 2)  // opposite wrong label
    ).toDF("vec_id", "embedding", "label")
    val got = VectorSearch.hardNegatives(emb, emb.filter($"vec_id" === 0L),
      "vec_id", "embedding", "label", k = 3)
      .orderBy("rank")
      .select("vec_id", "neg_label").as[(Long, Int)].collect().toSeq
    assert(got == Seq((2L, 1), (3L, 1), (4L, 2)), got)
  }
}
