package graft

import org.apache.spark.sql.functions._
import graft.ext.{Bpe, PinnedBpe, Tok}
import graft.functions.BpeKernels

/** Trainable BPE subword vocabulary: the merge-learning loop, the
  * canonical greedy kernel, and the oracle-portable replace chain.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("training learns the classic merges on a toy corpus") {
    // "low" x5, "lower" x2, "newest" x6, "widest" x3 — the textbook
    // example: (e,s) 9 > others, then (es,t) 9, ...
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .map(w => Tuple1(w)).toDF("text")
    val merges = Bpe.train(corpus, "text", 4, minPairCount = 2)
    assert(merges.take(2) == Seq(("e", "s"), ("es", "t")))
    // every later merge must reference only chars or earlier outputs
    val known = scala.collection.mutable.Set[String]()
    merges.foreach { case (l, r) =>
      assert(l.length == 1 || known.contains(l))
      assert(r.length == 1 || known.contains(r))
      known += (l + r)
    }
  }

  test("scale knobs: maxTypes cap is the TakeOrdered of the type table") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // the capped train must equal trainFromCounts over exactly the
    // top-maxTypes types by (n desc, w) — proving the cap is a
    // deterministic frequency truncation, not a sample
    val cap = 20 // the sf0.001 vocabulary is 31 types, so this cap binds
    val top = docs.select(explode(Tok.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(cap)
      .as[(String, Long)].collect().toSeq
    assert(top.size == cap)
    assert(Bpe.train(docs, "text", 6, maxTypes = cap) ==
      Bpe.trainFromCounts(top, 6))
    // minWordCount prunes the tail the same way a HAVING would
    val withMin = Bpe.train(docs, "text", 6, minWordCount = 3)
    val manual = docs.select(explode(Tok.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3).as[(String, Long)].collect().toSeq
    assert(withMin == Bpe.trainFromCounts(manual, 6))
    // knob contracts reject nonsense
    intercept[IllegalArgumentException] {
      Bpe.train(docs, "text", 2, sampleFraction = 0.0)
    }
    intercept[IllegalArgumentException] {
      Bpe.train(docs, "text", 2, maxTypes = 0)
    }
  }

  test("pinned merge table IS what training on the sf0.001 corpus produces") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(Bpe.train(docs, "text", 24) == PinnedBpe.merges)
  }

  test("distributed trainer == driver trainer on a real corpus (path parity)") {
    // the scale fallback for type tables that outgrow maxTypes: the
    // pair counting rides a per-round aggregation shuffle and the
    // driver sees one argmax row per merge — the learned table must be
    // IDENTICAL to the collect-and-loop path, toy corpus and real
    // corpus both
    val toy = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .map(w => Tuple1(w)).toDF("text")
    assert(Bpe.trainDistributed(toy, "text", 6, minPairCount = 2) ==
      Bpe.train(toy, "text", 6, minPairCount = 2))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val driver = Bpe.train(docs, "text", 24)
    val dist = Bpe.trainDistributed(docs, "text", 24)
    assert(dist == driver)
    assert(dist == PinnedBpe.merges) // and both ARE the pinned table
  }

  test("tie-break collation parity on non-BMP symbols (code-point order, both trainers)") {
    // U+E000 (private use, one UTF-16 unit 0xE000) vs U+1F600 (emoji,
    // surrogate pair starting 0xD83D): Java String order puts the
    // SURROGATE first, code-point/UTF8-binary order puts U+E000 first.
    // Spark's orderBy is UTF8-binary, so a driver-side minBy on raw
    // Strings would let the two trainers diverge on exactly this tie.
    val pua = "\uE000"
    val emoji = new String(Character.toChars(0x1F600))
    assert(emoji < pua) // UTF-16 order: the trap this test pins
    assert(Bpe.codePointCompare(pua, emoji) < 0) // code-point order
    val words = Seq(s"${pua}x" -> 3L, s"${emoji}x" -> 3L)
    // tied pair counts -> the code-point-smaller left symbol must win
    assert(Bpe.trainFromCounts(words, 1, minPairCount = 2) ==
      Seq((pua, "x")))
    val df = words.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .map(Tuple1(_)).toDF("text")
    assert(Bpe.trainDistributed(df, "text", 1, minPairCount = 2) ==
      Bpe.train(df, "text", 1, minPairCount = 2))
  }

  test("kernel greedy encode: worked example through the pinned table") {
    val ranks = BpeKernels.ranksOf(PinnedBpe.merges)
    // sort: (o,r) -> s or t; (or,t) -> s ort; (s,ort) -> sort
    assert(BpeKernels.encode("sort", ranks).toSeq == Seq("sort"))
    assert(BpeKernels.encode("window", ranks).toSeq == Seq("window"))
    assert(BpeKernels.encode("sorting", ranks).toSeq == Seq("sort", "in", "g"))
    assert(BpeKernels.encode("xyz", ranks).toSeq == Seq("x", "y", "z"))
    assert(BpeKernels.encode("", ranks).isEmpty)
  }

  test("chain and kernel agree on every word type of the test corpus") {
    val vocab = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(Tok.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "").distinct()
    val both = vocab.select(col("w"),
      Bpe.countCol(col("w"), PinnedBpe.merges).as("kernel"),
      Bpe.chainCountCol(col("w"), PinnedBpe.merges).as("chain"))
    val diff = both.filter(col("kernel") =!= col("chain"))
    assert(diff.count() == 0, diff.take(5).mkString(","))
    assert(vocab.count() > 30) // the bridge is over a real vocabulary
  }

  test("known chain/kernel divergence shape: re-occurring pair inside a word") {
    // the consumed delimiter stops the chain's scan on abab-patterns;
    // this is exactly why the canonical kernel is the production form
    // and the chain is only used where an oracle must replay it
    val merges = Seq(("a", "n"))
    val ranks = BpeKernels.ranksOf(merges)
    assert(BpeKernels.encode("banana", ranks).toSeq ==
      Seq("b", "an", "an", "a")) // canonical: 4 tokens
    val chain = Seq("banana").toDF("w")
      .select(Bpe.chainCountCol(col("w"), merges)).as[Int].head()
    assert(chain == 5) // chain: b an a n a
    // ...and the test corpus vocabulary provably has no such word
    // (previous test), which is what licenses the oracled queries
  }

  test("doc token counts: bpe count bounded by chars and words") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Bpe.docTokenCounts(docs, "text", "doc_id", PinnedBpe.merges)
      .join(docs.select(col("doc_id").as("doc"), length(col("text")).as("nc")),
        Seq("doc"))
    assert(out.filter(col("n_bpe_tokens") < col("n_words")).count() == 0)
    assert(out.filter(col("n_bpe_tokens") > col("nc")).count() == 0)
  }
}
