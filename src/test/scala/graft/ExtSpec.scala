package graft

import org.apache.spark.sql.functions._
import graft.ext.{TextAnalysis, TextDedup, VectorSearch}

/** Specs for the LLM-pipeline extension operators (SURVEY §7.4). */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 1
    (3L, "completely different content about spark query engines and planning"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank")) // exact dup of 1
    .toDF("doc_id", "text")

  test("exact dedup keeps smallest id per identical text") {
    val out = TextDedup.exact(docs, "text", "doc_id")
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("minhash LSH surfaces the planted near-duplicate pair") {
    val pairs = TextDedup.minhashLsh(docs, "text", "doc_id",
      threshold = 0.3, bands = 32)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L))) // exact dup always collides
    assert(!pairs.contains((1L, 3L)))
  }

  test("exact n-gram jaccard: identical docs = 1.0, near-dup high, distinct low") {
    val j = TextDedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 4L)) == 1.0)
    assert(j((1L, 2L)) > 0.6)
    assert(!j.contains((1L, 3L))) // no shared shingle at all
  }

  test("r15 shared-shingle entry points equal their re-tokenizing forms") {
    // the fold shingles its batch ONCE and feeds the intra-pair pass
    // and the cross probe the same (doc, sh) frame — pin the equality
    // that makes that pure optimization, row for row
    val shB = TextDedup.docShingles(docs, "text", "doc_id", 3)
      .select(col("doc"), explode(col("sh")).as("sh"))
    val a = TextDedup.ngramJaccardPairs(docs, "text", "doc_id",
      threshold = 0.0).collect().map(_.toSeq).toSet
    val b = TextDedup.ngramJaccardPairsFromShingles(shB, threshold = 0.0)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    val corpus = Seq((10L,
      "the quick brown fox jumps over the lazy dog near the river delta"))
      .toDF("doc_id", "text")
    val c = TextDedup.crossNearDups(docs, corpus, "text", "doc_id",
      threshold = 0.1).collect().map(_.toSeq).toSet
    val d = TextDedup.crossNearDupsFromNewShingles(
      shB.select(col("doc").as("id_new"), col("sh")), corpus,
      "text", "doc_id", threshold = 0.1).collect().map(_.toSeq).toSet
    assert(c == d && c.nonEmpty)
  }

  test("near-dup clusters: connected components labeled by min id") {
    // components: {1,2,3,9} via chain 1-2, 2-3, 3-9; {5,7}; {10,11,12} star
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 7L),
      (10L, 11L), (10L, 12L)).toDF("id_a", "id_b")
    val out = TextDedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 7L -> 5L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
    // keep-one-per-cluster = filter doc === cluster
    assert(out.count { case (d, c) => d == c } == 3)
  }

  test("near-dup clusters: empty pair graph returns empty, no iteration") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(TextDedup.nearDupClusters(empty).count() == 0)
  }

  test("star contraction: O(log n) rounds on a planted chain, same labels as propagation") {
    // a 64-node chain is the adversarial case: diameter 63, so min-label
    // propagation needs ~63 rounds while star contraction needs O(log n)
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (starLabels, starRounds) = TextDedup.starContract(chain)
    val star = starLabels.as[(Long, Long)].collect().toMap
    assert(star == (0L to 63L).map(_ -> 0L).toMap)
    assert(starRounds <= 10, s"star took $starRounds rounds on a 64-chain")
    val (propLabels, propRounds) = TextDedup.propagateLabels(chain, maxIterations = 100)
    assert(propLabels.as[(Long, Long)].collect().toMap == star)
    assert(propRounds > 2 * starRounds,
      s"propagation ($propRounds) should need far more rounds than star ($starRounds)")
  }

  test("minhash verified pairs equal the exact jaccard pair set (sf0.001)") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val exact = TextDedup.ngramJaccardPairs(corpus, "text", "doc_id",
      shingleN = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val verified = TextDedup.minhashVerifiedPairs(corpus, "text", "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // r=2/b=32 banding has ~0.9999 recall at j>=0.5; on this corpus the
    // candidate set must cover every exact pair (the oracle relies on it)
    assert(verified == exact, s"missed: ${exact -- verified}")
    assert(exact.nonEmpty)
  }

  test("decontamination flags benchmark-overlapping docs, filter removes them") {
    val bench = Seq((100L, "the capital of france is paris obviously")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "we know the capital of france is paris and it is lovely"), // leaks 4 bench trigrams
      (2L, "completely unrelated prose about spark physical planning"),
      (3L, "paris obviously has great food")) // shares no full trigram? "paris obviously has" no; bench has "is paris obviously"
      .toDF("doc_id", "text")
    val hits = TextDedup.contaminated(corpus, "text", "doc_id", bench, "text")
      .as[(Long, Long)].collect().toMap
    // doc 1 contains "the capital of", "capital of france", "of france is",
    // "france is paris" — 4 distinct shared trigrams
    assert(hits(1L) == 4L, hits.toString)
    assert(!hits.contains(2L) && !hits.contains(3L), hits.toString)
    val clean = TextDedup.decontaminate(corpus, "text", "doc_id", bench, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L, 3L))
    // threshold: requiring >= 5 overlaps clears doc 1 too
    val lax = TextDedup.decontaminate(corpus, "text", "doc_id", bench, "text",
      minOverlap = 5).select("doc_id").as[Long].collect().toSet
    assert(lax == Set(1L, 2L, 3L))
  }

  test("quality filter keeps the at-or-above-quantile docs, no collect") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val kept = TextAnalysis.qualityFilter(corpus, "text", 0.5)
    val total = corpus.count()
    val n = kept.count()
    // at least half survive (>= threshold includes the tied mass at it)
    assert(n >= total / 2 && n <= total, s"$n of $total")
    // every survivor's score >= every dropped doc's score
    val minKept = kept.agg(min($"quality_score")).head().getDouble(0)
    val dropped = TextAnalysis.qualityScore(corpus, "text")
      .join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    if (dropped.count() > 0)
      assert(dropped.agg(max($"quality_score")).head().getDouble(0) < minKept)
    // quantile 0 keeps everything
    assert(TextAnalysis.qualityFilter(corpus, "text", 0.0).count() == total)
  }

  test("scrub redacts emails, urls, and long digit runs; prose untouched") {
    val out = Seq(
      (1L, "mail a.b+c@sub.example.org now"),
      (2L, "see https://ex.com/a?b=1 and http://plain.io end"),
      (3L, "call 12345678 but keep 123456 and the year 2024"),
      (4L, "plain prose stays exactly as written"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.scrub($"text").as("clean"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "mail <EMAIL> now")
    assert(out(2L) == "see <URL> and <URL> end")
    assert(out(3L) == "call <NUM> but keep 123456 and the year 2024")
    assert(out(4L) == "plain prose stays exactly as written")
  }

  test("repetition ratio: looping doc high, varied doc zero, short doc zero") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam"), // 6 trigram slots, 1 distinct
      (2L, "eight distinct words make a varied document here"),
      (3L, "too short")) // < n words -> whole-text shingle, ratio 0
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionRatio(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((6L, 1L, 0.833333)))
    assert(out(2L) == ((6L, 6L, 0.0)))
    assert(out(3L) == ((1L, 1L, 0.0)))
  }

  test("simhash maxHamming=0 finds exact signature matches without blowup") {
    val pairs = TextDedup.simhashPairs(docs, "text", "doc_id", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup: identical signature
    assert(!pairs.contains((1L, 3L)))
  }

  test("simhash: identical docs at hamming 0; near-dups within small distance") {
    val pairs = TextDedup.simhashPairs(docs, "text", "doc_id", maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 4L)) == 0)
    assert(pairs.get((1L, 2L)).exists(_ <= 16))
  }

  test("portable simhash: identical docs at hamming 0; sig is 32-bit") {
    val sigs = docs
      .select($"doc_id", TextDedup.tokens($"text").as("toks"))
      .select($"doc_id", TextDedup.portableSimhashSig("toks").as("sim"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(4L))                  // exact dup: identical sig
    assert(sigs.values.forall(s => s >= 0L && s < (1L << 32)))
    // the bits must not collapse to one value (the weak-multiplier
    // failure mode documented in the scaladoc)
    assert(sigs.values.exists(s => s != 0L && s != (1L << 32) - 1))
  }

  test("portable simhash pigeonhole pairs equal the brute-force pair set") {
    val maxH = 3
    val viaChunks = TextDedup.simhashPairsPortable(docs, "text", "doc_id", maxH)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sigs = docs
      .select($"doc_id", TextDedup.tokens($"text").as("toks"))
      .select($"doc_id", TextDedup.portableSimhashSig("toks").as("sim"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= maxH
    } yield (ia, ib)).toSet
    assert(viaChunks == brute)
    assert(brute.contains((1L, 4L)))
  }

  test("portable simhash kernel == SQL higher-order form, token edges included") {
    // the native kernel must reproduce the SQL arithmetic the DuckDB
    // twin mirrors — including the ascii()-truncates-to-a-byte edge
    // (chr(233) -> 233, chr(256) -> 0) and the empty token (code 0)
    val fixtures = Seq(
      (1L, "the quick brown fox"),
      (2L, ""),                                  // empty text -> one empty token
      (3L, "a bb ccc dddd eeeee"),
      (4L, "caf" + 233.toChar + " " + 256.toChar + "x tail"),
      (5L, "x " + 233.toChar))
      .toDF("doc_id", "text")
      .select($"doc_id", TextDedup.tokens($"text").as("toks"))
    val native = fixtures
      .select($"doc_id", TextDedup.portableSimhashSig("toks").as("sim"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val sql = fixtures
      .select($"doc_id", TextDedup.portableSimhashSigSql("toks").as("sim"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(native == sql)
  }

  test("eq_count kernel == zip_with SQL form, length/null edges included") {
    val rows = Seq(
      (1L, Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](1L, 9L, 3L)),
      (2L, Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L, 2L, 3L, 4L)),
      (3L, Seq[java.lang.Long](), Seq[java.lang.Long](5L)),
      (4L, Seq[java.lang.Long](7L, null, 8L), Seq[java.lang.Long](7L, null, 8L)))
      .toDF("id", "a", "b")
    val native = rows.select($"id",
      graft.functions.VectorExpressions.eq_count($"a", $"b").as("c"))
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    val sql = rows.select($"id",
      expr("size(filter(zip_with(a, b, (x, y) -> x = y), v -> v))").as("c"))
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(native == sql)
    assert(native == Seq((1L, 2), (2L, 2), (3L, 0), (4L, 2)))
  }

  test("portable simhash cross guard: brute-force parity, one row per pair") {
    val maxH = 3
    val probe = docs.filter($"doc_id" <= 2)   // 1 (clone of 4), 2 (near-dup)
    val corpus = docs.filter($"doc_id" >= 3)  // 3 (far), 4
    val got = TextDedup.simhashCrossPortable(probe, corpus, "text", "doc_id", maxH)
      .as[(Long, Long, Long)].collect()
    // exactly once per qualifying pair (the first-agreeing-chunk dedup)
    assert(got.map(r => (r._1, r._2)).distinct.length == got.length)
    def sig(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", TextDedup.tokens($"text").as("toks"))
      .select($"doc_id", TextDedup.portableSimhashSig("toks").as("sim"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (ia, sa) <- sig(probe); (ib, sb) <- sig(corpus)
      h = java.lang.Long.bitCount(sa ^ sb) if h <= maxH
    } yield (ia, ib, h.toLong)).toSet
    assert(got.toSet == brute)
    assert(got.exists(r => r._1 == 1L && r._2 == 4L && r._3 == 0L))
  }

  test("cosine codegen path is exercised and bit-identical to interpreted eval") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
      val viaPlan = emb.crossJoin(q)
        .select($"vec_id",
          graft.ext.VectorSearch.cosine($"embedding", $"qv").as("sim"))
        .orderBy("vec_id").limit(50).as[(Long, Double)].collect()
      // NO_CODEGEN alone only gates projection factories; whole-stage
      // codegen must also be off or this arm re-runs the generated code
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interpreted = emb.crossJoin(q)
        .select($"vec_id",
          graft.ext.VectorSearch.cosine($"embedding", $"qv").as("sim"))
        .orderBy("vec_id").limit(50).as[(Long, Double)].collect()
      assert(viaPlan.length == 50)
      viaPlan.zip(interpreted).foreach { case ((id1, s1), (id2, s2)) =>
        assert(id1 == id2)
        assert(java.lang.Double.doubleToLongBits(s1) ==
          java.lang.Double.doubleToLongBits(s2), s"vec $id1: $s1 != $s2")
      }
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  test("jaccard-family expressions: codegen arm bit-identical to interpreted") {
    import graft.functions.VectorExpressions._
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    // one projection exercising every formerly-CodegenFallback kernel;
    // array_pairs gets a tiny deterministic long array per row
    def run(): Array[org.apache.spark.sql.Row] = corpus
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"),
        simhash64(col("toks")).as("sim"),
        minhash_sig(word_shingles(col("toks"), 3), 64).as("sig"),
        word_shingles(col("toks"), 3).as("sh"),
        lsh_bucket(transform(col("toks"),
          t => hash(t).cast("double")).as("v"), 8).as("bkt"),
        array_pairs(array(col("doc_id"), col("doc_id") + 1,
          col("doc_id") * 7 % 100)).as("pairs"))
      .orderBy("doc_id").limit(200).collect()
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val gen = run()
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = run()
      assert(gen.length == 200)
      assert(gen.sameElements(interp))
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  test("dedup hot path stays inside whole-stage codegen (no fallback expressions)") {
    // the signature projection of the minhash pipeline must be fused:
    // a single CodegenFallback expression would un-fuse the whole stage
    // shingleN=5 so the plan fragment can't cache-match a frame some
    // earlier test persisted (an InMemoryTableScan would un-fuse the top)
    val plan = TextDedup.docShingles(
        spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id", n = 5)
      .select(col("doc"), TextDedup.minhashSignature(64).as("sig"),
        graft.functions.VectorExpressions.simhash64(
          split(lit("a b c"), " ")).as("sim"))
      .queryExecution.executedPlan
    val fused = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
    assert(fused.nonEmpty, plan.toString)
    // every Project line is starred (inside a codegen span) — with the
    // old CodegenFallback expressions the signature projection printed
    // as a bare `Project`, un-fused from the scan
    val projectLines = plan.toString.linesIterator
      .map(_.trim.stripPrefix("+- ")).filter(_.startsWith("Project")).toList
    assert(projectLines.isEmpty, plan.toString)
  }

  test("probe near-dups equal the exact kernel restricted to min(id) in probe") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val exact = TextDedup.embeddingNearDups(emb, "vec_id", "embedding", 0.45)
      .filter($"id_a" < 200)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val probed = TextDedup.embeddingNearDupsProbe(
        emb, emb.filter($"vec_id" < 200), "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(probed == exact)
    assert(probed.nonEmpty)
    // and the probe side broadcasts: one corpus pass, no cartesian
    val plan = TextDedup.embeddingNearDupsProbe(
        emb, emb.filter($"vec_id" < 200), "vec_id", "embedding", 0.45)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("cosine: self-similarity 1.0, orthogonal 0.0") {
    val df = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 2.0f)),
      (3L, Array(2.0f, 0.0f))).toDF("vec_id", "embedding")
    val sims = TextDedup.embeddingNearDups(df, "vec_id", "embedding", -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(sims((1L, 3L)) - 1.0) < 1e-12)
    assert(math.abs(sims((1L, 2L))) < 1e-12)
  }

  test("brute-force top-k returns k ranked neighbors, self excluded") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = VectorSearch.bruteForceTopK(emb, emb.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 5).collect()
    assert(out.length == 5)
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
    assert(!out.map(_.getAs[Long]("vec_id")).contains(0L))
    val sims = out.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("LSH ANN with multi-probe achieves reasonable recall vs brute force") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter($"vec_id" < 10)
    val exact = VectorSearch.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recallAt(depth: Int): Double = {
      val approx = VectorSearch.annTopK(emb, q, "vec_id", "embedding", 10,
        bits = 4, probeNeighbors = depth)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      assert(approx.size <= exact.size) // candidate set shrank vs brute force
      (exact & approx).size.toDouble / exact.size
    }
    val r = (0 to 2).map(recallAt)
    assert(r(1) > 0.3, s"recall ${r(1)} too low")
    // deeper probe neighborhoods only add buckets: recall is monotone
    assert(r(0) <= r(1) && r(1) <= r(2), r.toString)
  }

  test("multi-table LSH: more tables never lose recall; pairs dedup") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter($"vec_id" < 10)
    val exact = VectorSearch.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recallAt(tables: Int): Double = {
      val out = VectorSearch.annTopKMultiTable(emb, q, "vec_id", "embedding",
        10, bits = 6, tables = tables, probeNeighbors = 1)
      val rows = out.select("query_id", "vec_id").as[(Long, Long)].collect()
      // union-of-tables candidates are deduped before scoring: no pair twice
      assert(rows.length == rows.toSet.size)
      (exact & rows.toSet).size.toDouble / exact.size
    }
    // table t is the bit-slice [t·bits, (t+1)·bits) of one wider bucket,
    // so L tables' candidate set contains L-1 tables' — recall monotone
    val r = Seq(1, 2, 4).map(recallAt)
    assert(r(0) <= r(1) + 1e-9 && r(1) <= r(2) + 1e-9, r.toString)
    assert(r(2) > 0.3, s"multi-table recall ${r(2)} too low (sweep $r)")
    // one table at depth 0 must equal the single-table annTopK — same
    // planes, same bucket, same scoring
    val one = VectorSearch.annTopKMultiTable(emb, q, "vec_id", "embedding",
      10, bits = 6, tables = 1, probeNeighbors = 0)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val single = VectorSearch.annTopK(emb, q, "vec_id", "embedding",
      10, bits = 6, probeNeighbors = 0)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(one == single)
    intercept[IllegalArgumentException] {
      VectorSearch.annTopKMultiTable(emb, q, "vec_id", "embedding", 10,
        bits = 8, tables = 8) // 64 bits > 63
    }
  }

  test("PQ: codes are m small ints; ADC top-k recalls well vs brute force") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter($"vec_id" < 10)
    val idx = VectorSearch.pqBuild(emb, "vec_id", "embedding",
      m = 8, kCent = 16)
    try {
      // code shape: every vector compressed to m indices in [0, kCent)
      val codes = idx.codes.select("codes").as[Seq[Int]].collect()
      assert(codes.forall(c => c.length == 8 && c.forall(j => j >= 0 && j < 16)))
      // ADC-only ranking is lossy on this clusterless random corpus —
      // it exists to SHORTLIST; exact re-rank recovers the recall. The
      // shortlist sweep must be monotone: more candidates, more of the
      // true top-k re-ranked in.
      val exact = VectorSearch.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      def recallAt(shortlist: Int): Double = {
        val approx = VectorSearch
          .pqTopKRefined(idx, emb, q, k = 10, shortlist = shortlist)
          .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
        (exact & approx).size.toDouble / exact.size
      }
      val r = Seq(1, 2, 4).map(recallAt)
      assert(r(2) > 0.6, s"PQ refined recall ${r(2)} too low (sweep $r)")
      assert(r(0) <= r(1) + 1e-9 && r(1) <= r(2) + 1e-9, r.toString)
      // deterministic: a rebuilt index encodes identically and the
      // probe is invariant to query partitioning
      val idx2 = VectorSearch.pqBuild(emb, "vec_id", "embedding",
        m = 8, kCent = 16)
      try {
        val a = VectorSearch.pqTopKRefined(idx2, emb, q.repartition(7),
          k = 10, shortlist = 4)
          .orderBy("query_id", "rank").collect().map(_.toSeq)
        val b = VectorSearch.pqTopKRefined(idx, emb, q, k = 10,
          shortlist = 4)
          .orderBy("query_id", "rank").collect().map(_.toSeq)
        assert(a.toSeq == b.toSeq)
      } finally idx2.close()
    } finally idx.close()
  }

  test("IVF-PQ composition recalls well and candidates shrink with nprobe") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter($"vec_id" < 10)
    val ivf = VectorSearch.ivfBuild(emb, "vec_id", "embedding", nLists = 8)
    val pq = VectorSearch.pqBuild(emb, "vec_id", "embedding",
      m = 8, kCent = 16)
    try {
      val exact = VectorSearch.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      def recallAt(nprobe: Int, shortlist: Int): Double = {
        val approx = VectorSearch.ivfPqTopK(ivf, pq, emb, q, k = 10,
          nprobe = nprobe, shortlist = shortlist)
          .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
        (exact & approx).size.toDouble / exact.size
      }
      // production shape (nprobe=4 of 8, shortlist=4): floor recall
      assert(recallAt(4, 4) > 0.4, "IVF-PQ production recall too low")
      // monotone-in-nprobe holds only when the shortlist cut is a
      // no-op (shortlist·k >= every probed candidate): with a FIXED
      // small shortlist, more probed lists can push true neighbors
      // off the ADC shortlist — that non-monotonicity is real, so the
      // principled sweep uses an uncut shortlist
      val r = Seq(2, 4, 8).map(recallAt(_, 1000))
      assert(r(2) > 0.6, s"IVF-PQ uncut full-probe recall ${r(2)} (sweep $r)")
      assert(r(0) <= r(1) + 1e-9 && r(1) <= r(2) + 1e-9, r.toString)
      // full probe + uncut shortlist degenerates to PQ-refined search
      // over the whole corpus: recall must match it exactly
      val pqAll = VectorSearch.pqTopKRefined(pq, emb, q, k = 10,
        shortlist = 1000)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      val ivfpqAll = VectorSearch.ivfPqTopK(ivf, pq, emb, q, k = 10,
        nprobe = 8, shortlist = 1000)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      assert(ivfpqAll == pqAll)
    } finally { ivf.close(); pq.close() }
  }

  test("PQ build rejects a dimension not divisible by m") {
    val bad = Seq((1L, Array.fill(6)(0.5f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      VectorSearch.pqBuild(bad, "vec_id", "embedding", m = 4, kCent = 2)
    }
  }

  test("quality score rewards stopword-bearing prose, penalizes fragments") {
    val df = Seq((1L, "the cat sat on the mat and it was a fine day for all of us"),
      (2L, "zzz qqq")).toDF("doc_id", "text")
    val out = TextAnalysis.qualityScore(df, "text")
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L))
    assert(out.values.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("language id picks the profile with most marker hits") {
    val df = Seq(
      (1L, "the cat is on the mat with a dog"),
      (2L, "el gato es un animal y la casa es grande"),
      (3L, "der hund und die katze sind für das haus"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.languageId(df, "text")
      .select("doc_id", "predicted_lang").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "de")
  }

  test("fingerprints: order-sensitive, stable") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "beta alpha gamma"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
      .select($"doc_id", TextDedup.tokens($"text").as("toks"))
      .select($"doc_id", TextAnalysis.portableFingerprint("toks").as("fp"))
    val fp = df.as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(3L))
    assert(fp(1L) != fp(2L))
  }

  test("normalized exact dedup collapses case/punct/whitespace variants") {
    val df = Seq(
      (1L, "The quick  brown fox!"),
      (2L, "the quick brown fox"),
      (3L, "THE QUICK BROWN FOX."),
      (4L, "a different doc")).toDF("doc_id", "text")
    val out = TextDedup.exactNormalized(df, "text", "doc_id")
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 4L))
  }

  test("normalized dedup keeps non-Latin docs and never merges empty-form texts") {
    val df = Seq(
      (1L, "第一篇文档"),
      (2L, "совсем другой текст"),
      (3L, "!!!"),
      (4L, "¿?"),
      (5L, "第一篇文档")).toDF("doc_id", "text")
    val out = TextDedup.exactNormalized(df, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    // non-Latin scripts survive normalization and dedup normally (5 dups 1);
    // all-punctuation docs normalize to "" but stay distinct from each other
    assert(out == Set(1L, 2L, 3L, 4L))
  }

  test("sketch primitives: distinct counts, quantiles, count-min bytes") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dc = graft.ext.Sketches.distinctCounts(docs, Seq("lang", "source")).head()
    assert(dc.getAs[Long]("lang_distinct") > 0 && dc.getAs[Long]("source_distinct") > 0)
    intercept[IllegalArgumentException] {
      graft.ext.Sketches.distinctCounts(docs, Seq.empty)
    }
    val q = graft.ext.Sketches.quantiles(docs, "n_chars", Seq(0.5, 0.9)).head()
      .getAs[scala.collection.Seq[Long]]("n_chars_quantiles")
    assert(q.length == 2 && q(0) <= q(1))
    val cmsBytes = graft.ext.Sketches.countMin(docs, "lang").head()
      .getAs[Array[Byte]]("lang_cms")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(cmsBytes))
    val total = docs.count()
    assert(cms.estimateCount("en") <= total && cms.totalCount() == total)
  }

  test("corpus profile sketch: sane approximate stats") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val r = graft.ext.Sketches.corpusProfile(docs).head()
    val n = r.getAs[Long]("n_docs")
    val distinct = r.getAs[Long]("approx_distinct_texts")
    assert(n == docs.count())
    assert(math.abs(distinct - n).toDouble / n < 0.1) // all texts unique
    val p50 = r.getAs[Long]("n_chars_p50")
    val p95 = r.getAs[Long]("n_chars_p95")
    assert(p50 > 0 && p50 <= p95)
  }

  test("token counts: whitespace and subword regex") {
    val df = Seq(Tuple1("hello world x42 done!")).toDF("text")
      .select(TextAnalysis.tokenCount($"text").as("w"),
        TextAnalysis.subwordTokenCount($"text").as("s"))
    val (w, s) = df.as[(Int, Int)].head()
    assert(w == 4)
    assert(s == 6) // hello, world, x, 42, done, !
  }

  test("cross-corpus dedup: finds the planted batch-vs-corpus pair only") {
    // doc 100 (new batch) is a light edit of corpus doc 1; corpus docs
    // 2 and 3 are near-dups of EACH OTHER — which cross-dedup must NOT
    // report (corpus-internal pairs are the other operator's job)
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "one two three four five six seven eight ten"),
      (4L, "totally unrelated content about something else entirely")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta iota"),
      (101L, "nothing in common with anything stored before now")
    ).toDF("doc_id", "text")
    val pairs = graft.ext.TextDedup.crossNearDups(
      batch, corpus, "text", "doc_id", shingleN = 3, threshold = 0.3)
      .select("id_new", "id_old").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 1L)), pairs)
  }

  test("cross-corpus dedup: corpus-df pruning drops boilerplate from both sides") {
    // every corpus doc shares one boilerplate trigram; with the cap
    // below its df the planted genuine pair must still surface and the
    // boilerplate-only match must not
    val corpus = (1L to 20L).map(i =>
      (i, s"standard header line unique$i filler$i content$i words$i"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, "standard header line unique7 filler7 content7 words7 tail"),
      (101L, "standard header line but otherwise fresh new material here")
    ).toDF("doc_id", "text")
    val pairs = graft.ext.TextDedup.crossNearDups(
      batch, corpus, "text", "doc_id", shingleN = 3, threshold = 0.3,
      maxPostings = 5)
      .select("id_new", "id_old").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 7L)), pairs)
  }
}
