package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._
import graft.op.{Dedup, Normalize}

/** Property-based specs (ScalaCheck framework, picked up by sbt):
  * algebraic laws the SURVEY §5 plan calls for, checked against small
  * generated inputs through the real Spark operators.
  */
object PropertySpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each case runs Spark jobs; keep it tight

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keyGen = Gen.listOfN(12, Gen.alphaLowerStr.map(_.take(3))).map(_.filter(_.nonEmpty))

  property("T5 anti-join == set difference on keys") =
    Prop.forAll(keyGen, keyGen) { (batch, existing) =>
      (batch.nonEmpty || existing.nonEmpty) ==> {
        val b = batch.zipWithIndex.toDF("k", "v")
        val e = existing.toDF("k")
        val got = Dedup.newKeysOnly(b, e, "k").select("k").as[String]
          .collect().toSet
        got == (batch.toSet -- existing.toSet)
      }
    }

  property("T10 last-write-wins: idempotent and unique per key") =
    Prop.forAll(Gen.listOfN(10, Gen.zip(Gen.choose(0, 3), Gen.choose(0, 20), Gen.choose(0.0, 9.9)))) { rows =>
      rows.nonEmpty ==> {
        val df = rows.toDF("k", "ver", "price")
        val once = Dedup.lastWriteWins(df, Seq("k"), Seq(col("ver"), col("price")))
        val twice = Dedup.lastWriteWins(once, Seq("k"), Seq(col("ver"), col("price")))
        val o = once.orderBy("k").collect().toSeq
        val t = twice.orderBy("k").collect().toSeq
        o == t && once.select("k").distinct().count() == once.count()
      }
    }

  // reference semantics model (dag_collection_data_from_z.py:55-58)
  private def modelCity(s: String): String =
    if (s == null || !s.contains(",")) "" else s.split(",").last.trim

  private val addrGen = Gen.oneOf(
    Gen.const(null: String),
    Gen.alphaNumStr.map(_.take(12)),
    Gen.zip(Gen.alphaStr.map(_.take(8)), Gen.alphaStr.map(_.take(8)))
      .map { case (a, b) => s"$a, $b" },
    Gen.zip(Gen.alphaStr.map(_.take(6)), Gen.alphaStr.map(_.take(6)), Gen.alphaStr.map(_.take(6)))
      .map { case (a, b, c) => s"$a,$b ,  $c " })

  property("T4 city-after-last-comma matches the reference model") =
    Prop.forAll(Gen.listOfN(6, addrGen)) { addrs =>
      addrs.nonEmpty ==> {
        val got = addrs.toDF("a")
          .select(Normalize.cityAfterLastComma(col("a"))).as[String].collect().toSeq
        val want = addrs.map(modelCity)
        got == want
      }
    }

  private val eventGen = Gen.listOfN(30,
    Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 40L), Gen.choose(1L, 1000L)))

  property("as-of join matches the per-key scan model (backward)") =
    Prop.forAll(eventGen, eventGen) { (ls, rs) =>
      (ls.nonEmpty && rs.nonEmpty) ==> {
        // unique ids per side; dedup right per (key, time) like production
        val left = ls.zipWithIndex.map { case ((k, t, _), i) => (k.toString, t, i.toLong) }
          .toDF("k", "t", "lid")
        val right0 = rs.zipWithIndex.map { case ((k, t, _), i) => (k.toString, t, 1000L + i) }
          .toDF("k", "rt", "rid")
        val right = Dedup.lastWriteWins(right0, Seq("k", "rt"), Seq(col("rid")))
        val got = graft.op.AsofJoin.asof(left, right, "k", "t", "rt", Seq("rid"))
          .select("k", "lid", "asof_rid").collect()
          .map(r => (r.getString(0), r.getLong(1)) ->
            (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
        val rmap = right.select("k", "rt", "rid").as[(String, Long, Long)]
          .collect().groupBy(_._1)
        left.select("k", "t", "lid").as[(String, Long, Long)].collect().forall {
          case (k, t, lid) =>
            val want = rmap.getOrElse(k, Array.empty).filter(_._2 <= t)
              .sortBy(r => (r._2, r._3)).lastOption.map(_._3).getOrElse(-1L)
            got((k, lid)) == want
        }
      }
    }

  property("range join == naive inequality join for any chunk width") =
    Prop.forAll(eventGen, eventGen, Gen.choose(1L, 64L)) { (ps, ivs, w) =>
      (ps.nonEmpty && ivs.nonEmpty) ==> {
        val points = ps.zipWithIndex.map { case ((k, t, _), i) => (k.toString, t, i.toLong) }
          .toDF("k", "t", "pid")
        val intervals = ivs.zipWithIndex.map { case ((k, s, len), i) =>
          (k.toString, s, s + len % 20, 1000L + i) }.toDF("k", "s", "e", "iid")
        val chunked = graft.op.RangeJoin.pointInInterval(
          points, intervals, "t", "s", "e", chunkWidth = w, keys = Seq("k"))
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        val naive = points.join(intervals, Seq("k"))
          .filter(col("t") >= col("s") && col("t") <= col("e"))
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        chunked == naive
      }
    }

  property("stratified sample partitions: fractions f and 1-f exactly tile the stratum") =
    Prop.forAll(Gen.choose(0.0, 1.0)) { f =>
      val docs = spark.range(500).selectExpr("id AS doc_id", "'x' AS lang")
      val kept = graft.ext.Sampling.stratifiedSample(docs, "lang", "doc_id",
        Map("x" -> f)).select("doc_id").as[Long].collect().toSet
      val cut = math.round(f * 1000)
      def bucket(k: Long): Long = ((k % 1000000007L) * 2654435761L) % 1000L
      kept == (0L until 500L).filter(bucket(_) < cut).toSet
    }

  property("minhash est_jaccard tracks exact jaccard within sampling error") =
    Prop.forAll(Gen.choose(4, 28)) { overlap =>
      // two 32-word docs sharing `overlap` words in their tail; sets
      // this small still carry estimator noise, hence the loose bound
      val shared = (0 until overlap).map(i => s"sh$i")
      val a = ((0 until (32 - overlap)).map(i => s"a$i") ++ shared).mkString(" ")
      val b = ((0 until (32 - overlap)).map(i => s"b$i") ++ shared).mkString(" ")
      val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      val exact = graft.ext.TextDedup.ngramJaccardPairs(df, "text", "doc_id", 3, 0.0)
        .select("jaccard").as[Double].collect().headOption.getOrElse(0.0)
      val est = graft.ext.TextDedup.minhashLsh(df, "text", "doc_id",
        shingleN = 3, numPerms = 64, bands = 32, threshold = 0.0)
        .select("est_jaccard").as[Double].collect().headOption.getOrElse(0.0)
      math.abs(est - exact) < 0.45 // 64 perms, small sets: ~6σ bound
    }

  private val tokGen = Gen.listOfN(10,
    Gen.oneOf(Gen.alphaLowerStr.map(_.take(6)), Gen.const(""))).map(_.take(10))

  property("portable simhash is token-order invariant and 32-bit") =
    Prop.forAll(tokGen) { toks =>
      toks.nonEmpty ==> {
        val perm = scala.util.Random.shuffle(toks)
        val sigs = Seq((1L, toks), (2L, perm)).toDF("id", "toks")
          .select($"id", graft.ext.TextDedup.portableSimhashSig("toks").as("s"))
          .as[(Long, Long)].collect().toMap
        sigs(1L) == sigs(2L) && sigs.values.forall(s => s >= 0 && s < (1L << 32))
      }
    }

  private val sigGen = Gen.listOfN(8, Gen.choose(-100L, 100L))

  property("eq_count: symmetric, bounded, reflexive on its own length") =
    Prop.forAll(sigGen, sigGen) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      import graft.functions.VectorExpressions.eq_count
      val Array(ab, ba, aa) = df.select(
        eq_count($"a", $"b"), eq_count($"b", $"a"), eq_count($"a", $"a"))
        .as[(Int, Int, Int)].collect().map(t => Array(t._1, t._2, t._3)).head
      ab == ba && ab <= math.min(a.length, b.length) && aa == a.length &&
        ab == a.zip(b).count { case (x, y) => x == y }
    }

  // texts chosen to collide after normalization (case/punct/whitespace
  // variants), plus empty-norm and unicode shapes
  private val noisyText = Gen.oneOf(
    "the fox", "The  FOX!", "spark, shuffle", "spark shuffle", ";;;", "",
    "data at scale", "DATA at scale?", "ünïcode tëxt", "one  two\tthree",
    "one two three")

  property("bloom admission == normalized set difference (no false negatives)") =
    Prop.forAll(Gen.listOfN(8, noisyText), Gen.listOfN(8, noisyText)) { (batch, corpus) =>
      batch.nonEmpty ==> {
        val b = batch.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val c = corpus.zipWithIndex.map { case (t, i) => (100L + i, t) }
          .toDF("doc_id", "text")
        val got = graft.ext.BloomGuard.newDocs(b, c, "text")
          .select("doc_id").as[Long].collect().toSet
        def norm(s: String) = s.toLowerCase
          .replaceAll("[^\\p{L}\\p{N} \\t\\n\\f\\r\\x0B]", "")
          .replaceAll("[ \\t\\n\\f\\r\\x0B]+", " ").trim
        val corpusNorms = corpus.map(norm).filter(_.nonEmpty).toSet
        val want = batch.zipWithIndex.collect {
          case (t, i) if norm(t).isEmpty || !corpusNorms.contains(norm(t)) =>
            i.toLong
        }.toSet
        got == want
      }
    }

  // dyadic components: nonzero (no NaN cosine), exact in float AND
  // double, and the reference below shares cosineFold so boundary
  // comparisons agree bit-for-bit by construction
  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(5, Gen.oneOf(-2f, -1f, -0.5f, 0.25f, 0.5f, 1f, 2f))
      .map(_.toArray)

  property("semDedup == within-cell dominance set difference") =
    Prop.forAll(Gen.listOfN(8, vecGen)) { vecs =>
      vecs.nonEmpty ==> {
        val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("vec_id", "embedding")
        val got = graft.ext.VectorSearch.semDedup(df, "vec_id", "embedding",
          signBits = 3, threshold = 0.7)
          .select("vec_id").as[Long].collect().toSet
        def cell(v: Array[Float]): Long =
          (0 until 3).map(j => if (v(j) > 0f) 1L << j else 0L).sum
        val dropped = (for {
          (x, i) <- vecs.zipWithIndex
          (y, j) <- vecs.zipWithIndex
          if j < i && cell(x) == cell(y) &&
            graft.ext.VectorSearch.cosineFold(x, y) > 0.7
        } yield i.toLong).toSet
        got == (vecs.indices.map(_.toLong).toSet -- dropped)
      }
    }

  // small vocab so random docs actually share shingles — the prefix
  // and positional filters must prove they never LOSE a pair
  private val docGen: Gen[String] =
    Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
        .map(_.mkString(" ")))

  // word_shingles semantics: distinct 3-gram strings; <3 tokens → the
  // whole text as one shingle
  private def shingleModel(text: String): Set[String] = {
    val t = text.split(" ").toSeq
    if (t.size < 3) Set(t.mkString(" "))
    else t.sliding(3).map(_.mkString(" ")).toSet
  }

  property("ppjoin == brute-force jaccard pairs (lossless candidates)") =
    Prop.forAll(Gen.listOfN(7, docGen), Gen.oneOf(300, 500, 700)) { (docs, tP) =>
      docs.nonEmpty ==> {
        val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
          .toDF("id", "txt")
        val got = graft.ext.TextDedup.prefixJaccardJoin(df, "txt", "id",
          thresholdPermille = tP)
          .select("id_a", "id_b", "inter").as[(Long, Long, Long)]
          .collect().toSet
        val sets = docs.map(shingleModel)
        val want = (for {
          a <- docs.indices; b <- docs.indices if a < b
          inter = (sets(a) & sets(b)).size.toLong
          if inter * 1000 >= tP * (sets(a).size + sets(b).size - inter)
        } yield (a.toLong, b.toLong, inter)).toSet
        got == want
      }
    }

  private val edgeGen: Gen[(Long, Long)] =
    Gen.zip(Gen.choose(0L, 7L), Gen.choose(0L, 7L))

  property("kCore == sequential-peel fixed point, always converged") =
    Prop.forAll(Gen.listOfN(10, edgeGen), Gen.oneOf(2, 3)) { (edges, k) =>
      edges.nonEmpty ==> {
        val got = graft.op.Graph.kCore(edges.toDF("s", "d"), "s", "d", k)
          .select("node", "core_deg", "converged")
          .as[(Long, Long, Boolean)].collect()
        // model: canonical undirected simple graph, peel to fixed point
        var adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .filter { case (a, b) => a != b }.distinct
          .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
        var stable = false
        while (!stable) {
          val drop = adj.collect { case (n, ns) if ns.size < k => n }.toSet
          stable = drop.isEmpty
          adj = (adj -- drop).map { case (n, ns) => n -> (ns -- drop) }
            .filter(_._2.nonEmpty)
        }
        got.forall(_._3) &&
          got.map(r => r._1 -> r._2).toMap ==
            adj.map { case (n, ns) => n -> ns.size.toLong }
      }
    }

  private val lineGen: Gen[String] =
    Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("header", "footer", "cookie", "body one",
        "body two", "tail")).map(_.mkString("\n")))

  property("stripFrequentLines == per-line df model; reassembly verbatim") =
    Prop.forAll(Gen.listOfN(6, lineGen)) { docs =>
      docs.nonEmpty ==> {
        val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
          .toDF("id", "txt")
        val got = graft.ext.TextDedup
          .stripFrequentLines(df, "txt", "id", minDocPermille = 500)
          .select("doc", "clean", "n_removed").as[(Long, String, Long)]
          .collect().map(r => r._1 -> ((r._2, r._3))).toMap
        val n = docs.size
        val lineDf = docs.flatMap(_.split("\n", -1).distinct)
          .groupBy(identity).map { case (l, o) => l -> o.size }
        val want = docs.zipWithIndex.map { case (d, i) =>
          val ls = d.split("\n", -1).toSeq
          val (bp, keep) = ls.partition(l => lineDf(l) * 1000 >= n * 500)
          i.toLong -> ((keep.mkString("\n"), bp.size.toLong))
        }.toMap
        got == want
      }
    }

  // sparse cosine: operator pair membership == the BigInt brute-force
  // model over the same shingle-set / idf-mille / integer-threshold
  // semantics (incl. the short-doc whole-text shingle rule)
  private val scDocGen: Gen[Seq[String]] =
    Gen.choose(3, 6).flatMap(nd => Gen.listOfN(nd,
      Gen.choose(0, 7).flatMap(nw => Gen.listOfN(nw,
        Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))
        .map(_.mkString(" ")))))

  property("sparseCosinePairs == BigInt brute-force membership") =
    Prop.forAll(scDocGen, Gen.oneOf(10, 30, 60)) { (docs, centi) =>
      docs.exists(_.nonEmpty) ==> {
        val maxDf = docs.size - 1 // force at least the corpus-wide terms out
        val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
          .toDF("doc_id", "text")
        val got = graft.ext.TextAnalysis
          .sparseCosinePairs(df, "text", "doc_id",
            minCosCenti = centi, maxDf = maxDf.toLong)
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
        // model
        def shingles(t: String): Set[String] = {
          val toks = t.trim.toLowerCase.split("[ \\t\\n\\u000B\\f\\r]+").toSeq
          if (toks.length < 3) Set(toks.mkString(" "))
          else toks.sliding(3).map(_.mkString(" ")).toSet
        }
        val sets = docs.zipWithIndex.map { case (d, i) => i.toLong -> shingles(d) }
        val n = docs.size
        val dfm = sets.flatMap(_._2).groupBy(identity).map { case (t, o) => t -> o.size }
          .filter(_._2 <= maxDf)
        def w(t: String): BigInt =
          BigInt(math.round(100000.0 / (dfm(t) + 1)))
        val weighted = sets.map { case (id, s) => id -> s.filter(dfm.contains) }
        val want = (for {
          (a, sa) <- weighted; (b, sb) <- weighted if a < b
          if sa.nonEmpty && sb.nonEmpty
        } yield {
          val dot = (sa & sb).toSeq.map(t => w(t) * w(t)).sum
          val na2 = sa.toSeq.map(t => w(t) * w(t)).sum
          val nb2 = sb.toSeq.map(t => w(t) * w(t)).sum
          ((a, b), dot * dot * 10000 >= BigInt(centi) * centi * na2 * nb2)
        }).filter(_._2).map(_._1).toSet
        got == want
      }
    }

  // CDC apply == the sequential fold model (argmax by the pinned
  // (ver, op, payload) chain, delete drops, snapshot pass-through)
  private val cdcChangeGen =
    Gen.listOfN(10, Gen.zip(Gen.choose(0L, 7L), Gen.choose(0L, 4L),
      Gen.oneOf("U", "D"), Gen.choose(0L, 9L)))

  property("Cdc.applyChanges == sequential-fold model") =
    Prop.forAll(cdcChangeGen) { changes =>
      val snapshot = Seq((0L, 100L), (1L, 101L), (2L, 102L), (3L, 103L))
      val snapDf = snapshot.toDF("k", "v")
      val chDf = changes.toDF("k", "ver", "op", "v")
      val got = graft.op.Cdc.applyChanges(snapDf, chDf, "k", "ver", "op")
        .as[(Long, Long)].collect().toSet
      val winning = changes.groupBy(_._1).map { case (k, cs) =>
        k -> cs.maxBy(c => (c._2, c._3, c._4))
      }
      val want = ((snapshot.map(_._1) ++ changes.map(_._1)).distinct.flatMap { k =>
        winning.get(k) match {
          case Some((_, _, "D", _)) => None
          case Some((_, _, _, v))   => Some(k -> v)
          case None => snapshot.find(_._1 == k).map(s => s._1 -> s._2)
        }
      }).toSet
      got == want
    }
}
