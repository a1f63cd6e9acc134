package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import graft.ext.VectorSearch

/** Golden plan-property assertions: the scale behaviors the design
  * depends on, locked in so a refactor that silently loses pushdown or
  * a broadcast shows up as a test failure, not a production regression.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(FormattedMode)

  test("S5: single-column scan reads only the key column") {
    val p = planOf("s5_projection_scan")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint>"), p)
  }

  test("S6: point lookup pushes the equality filter into parquet") {
    val p = planOf("s6_point_lookup")
    assert(p.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,42)]"), p)
  }

  test("T5: anti-join broadcasts the existing-keys side") {
    val p = planOf("t5_anti_join")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    // and the lineitem side reads ONLY the join key
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint>"), p)
  }

  test("T5 auto: anti-join broadcasts a small existing side, shuffles a large one") {
    val batch = spark.range(100).selectExpr("id AS location_id")
    val small = spark.range(10).selectExpr("id AS location_id")
    val pSmall = graft.op.Dedup.newKeysOnlyAuto(batch, small, "location_id")
      .queryExecution.explainString(FormattedMode)
    assert(pSmall.contains("BroadcastHashJoin") && pSmall.contains("LeftAnti"), pSmall)
    // ~80 MB size estimate — over the 10 MB broadcast threshold, and the
    // anti-join's build side can't be the batch, so it must shuffle
    val big = spark.range(10L * 1000 * 1000).selectExpr("id AS location_id")
    val pBig = graft.op.Dedup.newKeysOnlyAuto(batch, big, "location_id")
      .queryExecution.explainString(FormattedMode)
    assert(!pBig.contains("BroadcastHashJoin"), pBig)
    assert(pBig.contains("SortMergeJoin") || pBig.contains("ShuffledHashJoin"), pBig)
  }

  test("T8/T9: literal fuel side broadcasts for the cross join") {
    val p = planOf("t9_price_formula")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("ReadSchema: struct<s_suppkey:bigint>"), p)
  }

  test("T6: row_number()=1 dedup compiles to WindowGroupLimit") {
    val p = planOf("t6_first_seen_dedup")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("multimodal join broadcasts the embedding side and prunes columns") {
    val p = planOf("ns_multimodal_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string,source:string,n_chars:bigint>"), p)
  }

  test("date-partitioned sink: a date filter prunes to one partition") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prunesink").toString
    val prices = graft.op.PriceGen.generate(
      spark.read.parquet(s"$sf/supplier.parquet"), "s_suppkey",
      graft.source.Tables.fuelTypes(spark), to_date(lit("2024-06-01")))
      .union(graft.op.PriceGen.generate(
        spark.read.parquet(s"$sf/supplier.parquet"), "s_suppkey",
        graft.source.Tables.fuelTypes(spark), to_date(lit("2024-06-02"))))
    graft.sink.Sinks.parquetByDate(prices, dir)
    val q = spark.read.parquet(dir)
      .filter(col("date") === to_date(lit("2024-06-02")))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(date"), plan)
    // only the filtered day's files are scanned
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned.contains(1), s"expected 1 selected partition, got $scanned")
    assert(q.count() > 0)
  }

  test("IVF top-k recall vs brute force") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val exact = VectorSearch.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = VectorSearch.ivfTopK(emb, q, "vec_id", "embedding", 10,
      nLists = 8, nprobe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall > 0.3, s"IVF recall $recall")
    // deterministic across runs (fixed seed)
    val again = VectorSearch.ivfTopK(emb, q, "vec_id", "embedding", 10,
      nLists = 8, nprobe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(ivf == again)
    // a prebuilt index probes to the same result: the build/probe split
    // changes where training cost is paid, never the answer
    val idx = VectorSearch.ivfBuild(emb, "vec_id", "embedding", nLists = 8)
    val viaIndex = VectorSearch.ivfTopK(idx, q, k = 10, nprobe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(viaIndex == ivf)
  }

  test("no registered query plans a CartesianProduct") {
    // a cartesian of two full tables is the one join shape that cannot
    // survive a 100× scale-up; every pairwise operator must instead
    // broadcast a bounded side or equi-join on a bucket/band key.
    // Building a plan is enough (no execution) — some queries train or
    // iterate eagerly at construction, which sf0.001 keeps cheap.
    for ((name, q) <- SparkEntry.queries) {
      val plan = q(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian:\n$plan")
    }
  }

  test("persisted LSH probe: query keys broadcast, bucket table column-pruned, vectors candidate-bounded") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").filter(col("vec_id") <= 200)
    val dir = java.nio.file.Files.createTempDirectory("lshplan")
      .toString + "/lsh"
    graft.ext.IncrementalLsh.fold(spark, dir, emb, "vec_id", "embedding",
      batchNo = 1L)
    val p = graft.ext.IncrementalLsh.topK(spark, dir,
        emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5)
      .queryExecution.explainString(FormattedMode)
    // the O(queries·tables·(1+bits)) key side broadcasts into the
    // stored-table scan — the corpus-sized bucket table never shuffles
    // for candidate generation
    assert(p.contains("BroadcastHashJoin"), p)
    // the bucket-table scan reads ONLY the join columns (vec stays in
    // the sidecar until a candidate needs it)
    assert(p.contains("ReadSchema: struct<vec_id:bigint,key:bigint>") ||
      p.contains("ReadSchema: struct<key:bigint,vec_id:bigint>"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dsir: the λ model broadcasts into per-doc scoring; selection " +
    "is TakeOrdered, never a global sort") {
    val p = SparkEntry.queries("ns_dsir_select")(spark, sf)
      .queryExecution.executedPlan.toString
    // the ≤ m-row λ table reaches the (doc, bucket) counts as a
    // broadcast — the corpus-sized gram side never shuffles to meet it
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("decontamination broadcasts the benchmark shingle side") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.ext.TextDedup.contaminated(
      docs.filter($"doc_id" % 17 =!= 0), "text", "doc_id",
      docs.filter($"doc_id" % 17 === 0), "text")
      .queryExecution.executedPlan.toString
    // the corpus must never shuffle on the shingle: the benchmark set
    // is the dimension side of a broadcast hash join
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("decontamination XL variant shuffles instead of broadcasting") {
    // same rows as ns_decontaminate (shared oracle); the physical plan
    // must NOT hinge on the benchmark fitting in a broadcast — that is
    // the whole point of the variant
    val p = planOf("ns_decontaminate_xl")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("sequence packing never plans a single-partition exchange") {
    // the naive form — sum() OVER (ORDER BY ...) — funnels the corpus
    // through ONE task; the two-pass prefix sum must not
    val p = planOf("ns_seq_pack")
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("top-k per group plans WindowGroupLimit, not a full sort") {
    val p = planOf("t_topk_per_group")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("curation pipeline removes quality failures, exact dups, and near-dups") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat and it was a good day for all of us here"),
      (2L, "THE CAT SAT ON THE MAT AND IT WAS A GOOD DAY FOR ALL OF US HERE"),
      (3L, "the cat sat on the mat and it was a good day for all of us there"),
      (4L, "zz qq xx")).toDF("doc_id", "text")
    val out = graft.pipeline.Curation.curate(docs, "text", "doc_id", 0.7, 0.3)
      .select("doc_id").as[Long].collect().toSet
    // 2 is an exact normalized dup of 1; 3 is a near-dup of 1; 4 fails quality
    assert(out == Set(1L))
  }

  test("full curation chain: scrub, repetition gate, and decontamination compose") {
    import spark.implicits._
    val bench = Seq((100L, "the secret benchmark question about spark internals"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the cat sat on the mat and it was a fine day for all of us"),
      // leaks benchmark trigrams -> decontaminated away
      (2L, "we discuss the secret benchmark question about spark internals on a fine day"),
      // passes quality (stopword-rich, right length) but loops -> repetition gate
      (3L, "the spam the spam the spam the spam the spam the spam"),
      // 4/5 differ ONLY in their email: scrub makes them identical, dedup keeps 4
      (4L, "contact a@x.com for the dog ran over the hill and it was a long day for everyone"),
      (5L, "contact b@y.org for the dog ran over the hill and it was a long day for everyone"))
      .toDF("doc_id", "text")
    val out = graft.pipeline.Curation.curate(docs, "text", "doc_id",
      minQuality = 0.7, jaccardThreshold = 0.9, scrubPii = true,
      maxRepetition = Some(0.5), benchmark = Some(bench))
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 4L), out.toString)
    // defaults-off call is unchanged by the new stages (oracle contract)
    val base = graft.pipeline.Curation.curate(docs, "text", "doc_id",
      minQuality = 0.7, jaccardThreshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(base == Set(1L, 2L, 3L, 4L, 5L), base.toString)
  }

  // ---- round-5 operators ----

  test("corr stats: six moments ride ONE aggregation exchange") {
    val p = planOf("t_corr_stats")
    // one partial->final HashAggregate pair = exactly one hash shuffle
    // (the only other exchange is the final ORDER BY's range partition)
    val exchanges = "hashpartitioning\\(".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$p")
  }

  test("chunking is pure map-side: no exchange anywhere in the plan") {
    // the raw operator (without the registered query's display ORDER BY)
    val physical = graft.ext.TextAnalysis.chunkDocs(
      graft.source.Tables.table(spark, sf, "documents"), "text", "doc_id")
      .queryExecution.explainString(FormattedMode)
    assert(!physical.contains("Exchange"), physical)
  }

  test("bigram counts never self-join; top-k is TakeOrdered, not a global sort") {
    val p = planOf("ns_bigrams")
    assert(!p.contains("Join"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("semi-join broadcasts the filtered key side") {
    val p = planOf("t_semi_join")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("star join: three broadcast dims, fact never shuffles pre-aggregate") {
    val p = planOf("t_star_join")
    // tree lines only — FormattedMode repeats each node in the detail list
    assert("BroadcastHashJoin Inner BuildRight \\(\\d+\\)".r.findAllIn(p).size == 3, p)
    // the only hash exchange is the final (brand, nation) aggregate
    assert("hashpartitioning\\(".r.findAllIn(p).size == 1, p)
  }

  test("label centroids partial-aggregate before the one exchange") {
    val p = SparkEntry.queries("ns_embed_centroids")(spark, sf)
      .queryExecution.explainString(FormattedMode)
    // map-side combine: a partial HashAggregate below the one exchange
    assert("hashpartitioning\\(".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_count"), p)
  }

  test("nearest centroid broadcasts the prototype matrix; argmax is partial") {
    val p = planOf("ns_nearest_centroid")
    // the labels×dims centroid side is broadcast — the corpus is never
    // replicated into an exchange to be scored
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // and the per-vector argmax partial-aggregates map-side, so the
    // post-score exchange carries one row per vector, not one per
    // (vector, label)
    assert(p.contains("partial_min"), p)
  }

  test("bm25: df and corpus stats broadcast; top-k is TakeOrdered") {
    // audit the SCORING plan (everything up to the sorted limit):
    // bm25TopK's final rank derives from the sorted take via
    // zipWithIndex (Bm25.rankOrdered — window-free by design, r14), so
    // the registered query's visible plan ends at an ExistingRDD scan
    // and the scale-bearing operators live in the subplan below it
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val scored = graft.ext.TextAnalysis.bm25Scores(docs, "text", "doc_id",
        Seq("data", "pipeline", "quality"))
      .orderBy(col("score_pts").desc, col("doc")).limit(10)
    val p = scored.queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastHashJoin"), p)   // per-term df side
    assert(p.contains("BroadcastNestedLoopJoin"), p) // one-row stats
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("keywords: per-doc top-k compiles to WindowGroupLimit") {
    val p = planOf("ns_keywords")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("bm25 route: model joins as broadcast; argmax is WindowGroupLimit") {
    val p = planOf("ns_bm25_route")
    // the frozen (route, term, dfq) model is a broadcast dimension
    // table — a shuffled model join would shuffle the corpus tokens
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // best-route pick: rank-filter compiles to the map-side group limit
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("source cap: registered query plans the map-side group limit") {
    val p = planOf("ns_source_cap")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("pricing summary: date filter pushed to the scan, partial agg") {
    val p = planOf("sql_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "LessThanOrEqual(l_shipdate"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("containment probe is one exchange over the pair artifact") {
    // warm the artifact, then assert the PROBE plan: the posting-list
    // build must not reappear per consumer
    SparkEntry.queries("ns_containment")(spark, sf).collect()
    val p = planOf("ns_containment")
    assert("(hash|range)partitioning\\(".r.findAllIn(p).size == 1, p)
    assert(!p.contains("WordShingles") && !p.contains("word_shingles"), p)
  }

  test("boilerplate strip: the frequent-line set joins as broadcast") {
    val p = planOf("ns_boilerplate_lines")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("phrase search: postings filter map-side — only the slot agg, the " +
    "doc rollup, and the output sort exchange") {
    val p = planOf("ns_phrase_search")
    assert("(hash|range)partitioning\\(".r.findAllIn(p).size <= 3, p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("ppjoin: corpus-side verify joins honor the shuffle_hash hint " +
    "(never a broadcast of corpus-cardinality shingle arrays)") {
    val p = planOf("ns_ppjoin")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("zorderBy plans a range exchange + in-partition sort, no global sort") {
    val grid = spark.range(1000)
      .selectExpr("id % 32 AS x", "id / 32 AS y")
    val p = graft.op.Scale.zorderBy(grid, "x", "y", bits = 5,
      numPartitions = 8).queryExecution.explainString(FormattedMode)
    assert(p.contains("rangepartitioning"), p)
    // formatted mode prints a Sort's global flag on its Arguments line:
    // "Arguments: [_zv#.. ASC NULLS FIRST], false, 0" — the in-partition
    // sort must be there and NO Sort may be global (", true, 0" would
    // mean zorderBy degraded to a full global sort)
    assert("ASC NULLS FIRST\\], false, 0".r.findAllIn(p).nonEmpty, p)
    assert(!p.contains("], true, 0"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("lm score: map-side bigrams, vocab-bounded joins, no cartesian") {
    val p = planOf("ns_lm_score")
    assert(!p.contains("CartesianProduct"), p)
    // tiny test-scale model sides broadcast; at real scale AQE decides
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("weighted sample filters map-side: only the output sort exchanges") {
    val p = planOf("ns_weighted_sample")
    assert("(hash|range)partitioning\\(".r.findAllIn(p).size == 1, p)
  }

  test("quality model scores map-side: only the output sort exchanges") {
    val p = planOf("ns_quality_model")
    assert("(hash|range)partitioning\\(".r.findAllIn(p).size == 1, p)
    // and the scan reads only the two columns the features need
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("temperature mix: group cuts broadcast back onto the corpus") {
    val p = planOf("ns_temperature_mix")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("collocations: top-k is TakeOrdered, never a global sort") {
    val p = planOf("ns_collocations")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("token mix: shares broadcast; one window shuffle fills the budget") {
    val p = planOf("ns_token_mix")
    assert(p.contains("BroadcastHashJoin"), p)
    // corpus-path exchanges: ONE window partitioning + the output
    // sort; the two extra hash exchanges live on the broadcast
    // (dimension-sized) share-computation side
    assert("(hash|range)partitioning\\(".r.findAllIn(p).size <= 4, p)
  }

  test("source overlap: one shingle shuffle feeds sizes and pairs") {
    val p = planOf("ns_source_overlap")
    // sizes join onto the pair aggregate must be broadcast (group-
    // cardinality side), not a corpus shuffle
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("simhash pairs: pair dedup is a filter, not an aggregate shuffle") {
    // the first-agreeing-chunk filter replaced distinct(): the ONLY
    // aggregates allowed in the plan are none at all — a HashAggregate
    // over (id_a, id_b, hamming) would mean the candidate volume pays
    // a dedup exchange again
    for (q <- Seq("ns_dedup_simhash", "ns_dedup_simhash_portable")) {
      val p = planOf(q)
      val body = p.split("TakeOrderedAndProject|Sort ").head // output sort is fine
      assert(!body.contains("HashAggregate"), s"$q:\n$p")
      assert(!body.contains("ObjectHashAggregate"), s"$q:\n$p")
    }
  }

  test("simhash guard: stream-safe shape — no aggregate, join on chunk key") {
    val p = planOf("ns_simhash_guard")
    assert(!p.split("TakeOrderedAndProject|Sort ").head.contains("HashAggregate"), p)
    // candidate join is an equi-join on (chunk, piece) — never a
    // cartesian / broadcast nested loop
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bloom dedup: map-side might_contain prefilter ahead of the verify join") {
    val p = planOf("ns_bloom_dedup")
    // the sketch probe must survive into the physical plan (a miss
    // bypasses the anti-join entirely) and the verify join must be the
    // shuffled anti-join on the normalized key — the corpus-keys side
    // is the 100 TB side and may never be planner-broadcast
    assert(p.contains("might_contain"), p)
    assert(p.contains("ShuffledHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("semdedup: within-cell equi-join, both sides shuffled, no cartesian") {
    val p = planOf("ns_semdedup")
    // the dominance pairing is an equi-join on the sign cell — a
    // cartesian here would mean the quantizer fell out of the plan
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sparse cosine: pairs expand in-row from posting lists, no cartesian") {
    // r15 restructure: the old term-keyed shuffle-hash SELF-join was
    // replaced by a window df-prune + per-term posting lists expanded
    // in-row via array_pairs (one corpus exchange instead of three, no
    // second tokenize pass). The plan must show the in-row expansion
    // (a Generate over array_pairs) and never a cartesian or a posting
    // self-join.
    val p = planOf("ns_sparse_cosine")
    assert(p.contains("array_pairs"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("pair kernels: the amplifying key exchange is pinned, never AQE-coalesced") {
    // r16 (util.PinExchange): the posting-list pair kernels' single key
    // exchange — the one the df-prune window, the posting collect and
    // the in-row array_pairs explosion all run above — must be a
    // user-pinned REPARTITION_BY_NUM. AQE coalesces post-shuffle
    // partitions by INPUT bytes, which undercounts a pair-exploding
    // stage's work by the quadratic amplification factor; on the
    // shipped corpora that serialized these kernels onto 1–2 cores.
    // The pin must not ADD an exchange (the window/groupBy reuse its
    // partitioning) — plans/r16 before/after dumps carry the
    // equal-exchange-count evidence; here we pin the origin marker so
    // a refactor that drops the pin (or re-keys it so a second
    // exchange appears) fails a test.
    for (q <- Seq("ns_sparse_cosine", "ns_winnow_matches",
        "ns_dedup_ngram_jaccard")) {
      val p = planOf(q)
      assert(p.contains("REPARTITION_BY_NUM"), s"$q\n$p")
    }
  }

  test("rfm: quartile ranks ride range exchanges; windows are _pid-partitioned") {
    val p = planOf("t_rfm")
    // the globalRowNumbers two-pass numbering shows up as range
    // partitioning feeding _pid-partitioned windows — a global-ORDER
    // window over one partition would be the 100 TB anti-pattern. (The
    // plan's SinglePartition exchange is the 1-row global max/count
    // aggregate, which is legitimate.)
    assert(p.toLowerCase.contains("rangepartitioning"), p)
    assert(p.contains("_pid"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("event transitions / outliers: user-keyed exchanges only, no cartesian") {
    for (q <- Seq("t_event_transitions", "t_outlier_events")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"$q\n$p")
    }
  }
}
