package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable byte-pair-encoding subword vocabulary (Sennrich et al.
  * 2016 — the public BPE algorithm): learn a merge table from corpus
  * word frequencies, then count/segment subword tokens with it. This
  * replaces the fixed-regex heuristic `TextAnalysis.subwordTokenCount`
  * where token budgets should reflect what a real trained tokenizer
  * would produce.
  *
  * Scale shape of training: the corpus reduces to the WORD-TYPE
  * frequency table first (one partial-aggregated shuffle — the same
  * shape as `buildVocab`), and the merge loop runs on the driver over
  * that table. This is how production tokenizer trainers work: the
  * type table is vocabulary-bounded (≈10⁵–10⁷ rows at 100 TB), not
  * corpus-bounded, so the driver loop is the same O(types) exception
  * as the O(tasks) offset collects in `op.Scale` — never O(corpus).
  *
  * Two encode forms, one semantics:
  *  - [[countCol]] — canonical greedy via the codegen'd native kernel
  *    ([[graft.functions.BpeKernels]]): the production form.
  *  - [[chainCountCol]] — the merges applied as a rank-ordered chain of
  *    ` l r ` → ` lr ` string replacements over the space-separated
  *    character form; every engine with replace() evaluates it
  *    identically, which is what makes the BPE queries hash-checkable
  *    against DuckDB. Chain and kernel agree except on immediately
  *    re-occurring pair contexts inside one word (e.g. runs like
  *    "aaaaa", "ababab", where the consumed delimiter stops the scan) —
  *    BpeSpec proves they agree on every word type of the test corpus.
  */
object Bpe {

  /** Learn `numMerges` merges from a text column. Deterministic: ties
    * on pair frequency break toward the lexicographically smallest
    * (left, right) pair; training stops early when the best pair
    * occurs fewer than `minPairCount` times.
    *
    * SCALE CONTRACT — the driver collect is the word-TYPE table, which
    * is vocabulary-bounded, not corpus-bounded; but at 100 TB of noisy
    * web text the raw type table (hapax typos, boilerplate ids) can
    * still outgrow driver memory. The three bounding knobs, applied in
    * order, keep the collect a true dimension table:
    *  - `sampleFraction` — fit on a corpus sample (pair statistics
    *    converge long before full coverage; same contract as
    *    `VectorSearch.ivfBuild(fitSampleFraction)`).
    *  - `minWordCount` — drop types rarer than this BEFORE collecting
    *    (a type with n < minPairCount can never drive a merge on its
    *    own, so pruning the long tail is near-lossless).
    *  - `maxTypes` — hard cap: keep only the most frequent `maxTypes`
    *    types (ties toward the lexicographically smaller word), as a
    *    distributed TakeOrdered — the guarantee that the collect is
    *    O(maxTypes) regardless of corpus pathology.
    */
  def train(df: DataFrame, text: String, numMerges: Int,
            minPairCount: Long = 2, sampleFraction: Double = 1.0,
            minWordCount: Long = 1, maxTypes: Int = Int.MaxValue,
            seed: Long = 42L): Seq[(String, String)] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      "sampleFraction in (0, 1]")
    require(minWordCount >= 1, "minWordCount must be >= 1")
    require(maxTypes >= 1, "maxTypes must be >= 1")
    val base = if (sampleFraction < 1.0) df.sample(sampleFraction, seed) else df
    val counts = base
      .select(explode(Tok.tokens(col(text))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minWordCount)
    val capped =
      if (maxTypes == Int.MaxValue) counts
      else counts.orderBy(col("n").desc, col("w")).limit(maxTypes)
    val wordCounts = capped
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(wordCounts, numMerges, minPairCount)
  }

  /** Fully distributed trainer — the fallback for corpora whose word-
    * TYPE table exceeds what [[train]]'s `maxTypes` collect should
    * hold. The type table never leaves the cluster: each round is ONE
    * partial-aggregated pair-count shuffle over the persisted type
    * frequencies (words re-segmented executor-side through the
    * canonical greedy kernel with the merges learned so far), and the
    * driver sees exactly ONE row per round — the argmax pair. Driver
    * memory is O(numMerges), full stop.
    *
    * Same semantics as [[train]]/[[trainFromCounts]]: max pair count,
    * ties to the lexicographically smallest (l, r), early stop below
    * `minPairCount` ([[BpeSpec]] pins path parity on a real corpus).
    * The trade is compute for memory: round k re-encodes every type
    * through k−1 merges (O(types·numMerges²) total symbol work) where
    * the driver loop applies each merge incrementally — the standard
    * price of keeping the table distributed, amortized by
    * `minWordCount`/`sampleFraction` exactly as in [[train]].
    */
  def trainDistributed(df: DataFrame, text: String, numMerges: Int,
                       minPairCount: Long = 2, sampleFraction: Double = 1.0,
                       minWordCount: Long = 1,
                       seed: Long = 42L): Seq[(String, String)] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      "sampleFraction in (0, 1]")
    require(minWordCount >= 1, "minWordCount must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val base = if (sampleFraction < 1.0) df.sample(sampleFraction, seed) else df
    val counts = base
      .select(explode(Tok.tokens(col(text))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minWordCount)
      .as[(String, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < numMerges) {
      // greedy re-encode == sequential in-training application: a
      // merge's output symbol post-dates every earlier rank, so
      // lowest-rank-first replays training order (BpeKernels doc)
      val ranks = graft.functions.BpeKernels.ranksOf(merges.toSeq)
      val best = counts.mapPartitions { it =>
        it.flatMap { case (w, n) =>
          val parts = graft.functions.BpeKernels.encode(w, ranks)
          (0 until parts.length - 1).iterator
            .map(i => (parts(i), parts(i + 1), n))
        }
      }.toDF("l", "r", "n")
        .groupBy("l", "r").agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(2) < minPairCount)
        continue = false
      else merges += ((best.head.getString(0), best.head.getString(1)))
    }
    counts.unpersist()
    merges.toSeq
  }

  /** Driver-side merge loop over the word-type frequency table. */
  def trainFromCounts(wordCounts: Seq[(String, Long)], numMerges: Int,
                      minPairCount: Long = 2): Seq[(String, String)] = {
    var types: Array[(Array[String], Long)] = wordCounts.map { case (w, n) =>
      (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))), n)
    }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < numMerges) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      types.foreach { case (parts, n) =>
        var i = 0
        while (i < parts.length - 1) {
          val p = (parts(i), parts(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) continue = false
      else {
        // max count, ties -> lexicographically smallest pair BY CODE
        // POINT — the same collation as trainDistributed's Spark
        // orderBy (UTF8String binary order == code-point order).
        // Plain String compareTo orders by UTF-16 code unit, which
        // sorts supplementary-plane symbols (surrogates 0xD800+)
        // BEFORE U+E000..U+FFFF and would let the two trainers pick
        // different merges on tied non-BMP pairs.
        val best = pairCounts.toSeq.min(pairOrdering)
        if (best._2 < minPairCount) continue = false
        else {
          val (l, r) = best._1
          merges += ((l, r))
          types = types.map { case (parts, n) =>
            (applyMerge(parts, l, r), n)
          }
        }
      }
    }
    merges.toSeq
  }

  /** Lexicographic comparison by Unicode CODE POINT — identical to
    * UTF-8 byte order and to Spark's UTF8String binary collation, and
    * therefore to what [[trainDistributed]]'s `orderBy(l, r)` computes.
    */
  private[graft] def codePointCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Shared tie-break for the driver-side trainer: count desc, then
    * (l, r) ascending under [[codePointCompare]].
    */
  private val pairOrdering: Ordering[((String, String), Long)] =
    (x: ((String, String), Long), y: ((String, String), Long)) => {
      val (((l1, r1), n1), ((l2, r2), n2)) = (x, y)
      if (n1 != n2) java.lang.Long.compare(n2, n1)
      else {
        val cl = codePointCompare(l1, l2)
        if (cl != 0) cl else codePointCompare(r1, r2)
      }
    }

  /** One merge applied left-to-right non-overlapping (the canonical
    * in-training application).
    */
  private def applyMerge(parts: Array[String], l: String,
                         r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](parts.length)
    var j = 0
    while (j < parts.length) {
      if (j < parts.length - 1 && parts(j) == l && parts(j + 1) == r) {
        out += l + r
        j += 2
      } else {
        out += parts(j)
        j += 1
      }
    }
    out.toArray
  }

  /** Canonical greedy BPE token count of a single word column — the
    * production form (codegen'd native kernel).
    */
  def countCol(word: Column, merges: Seq[(String, String)]): Column =
    graft.functions.VectorExpressions.bpe_token_count(word, merges)

  /** Space-separated character form `" a b c "` — the symbol-delimited
    * representation the replace chain rewrites.
    */
  def spacedChars(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", "$1 "))

  /** The rank-ordered replace chain over [[spacedChars]] — the
    * engine-portable encode (see the class doc for where it can differ
    * from the canonical kernel). Returns the still-space-delimited
    * symbol string.
    */
  def chainEncodeCol(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(spacedChars(word)) { case (acc, (l, r)) =>
      replace(acc, lit(s" $l $r "), lit(s" $l$r "))
    }

  /** Token count via the replace chain — the oracle-checkable form. */
  def chainCountCol(word: Column, merges: Seq[(String, String)]): Column =
    size(split(trim(chainEncodeCol(word, merges)), " "))

  /** Per-document BPE token counts over the pinned analysis tokenizer:
    * (id, n_words, n_bpe_tokens). One partial-aggregated shuffle on the
    * id; the per-word chain runs map-side inside codegen.
    */
  def docTokenCounts(df: DataFrame, text: String, id: String,
                     merges: Seq[(String, String)]): DataFrame =
    df.select(col(id).as("doc"), explode(Tok.tokens(col(text))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("doc").agg(
        count(lit(1)).as("n_words"),
        sum(chainCountCol(col("w"), merges).cast("long"))
          .as("n_bpe_tokens"))
}

/** The 24-merge table `Bpe.train(sf0.001 documents, 24)` produces —
  * pinned so the BPE-counting queries evaluate the IDENTICAL table at
  * every scale factor (training is corpus-dependent; the oracle twin
  * is generated from this same constant). BpeSpec re-trains on the
  * sf0.001 corpus and asserts equality, so the pin provably comes from
  * the public algorithm, not hand-tuning.
  */
object PinnedBpe {
  val merges: Seq[(String, String)] = Seq(
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("d", "er"), ("or", "der"), ("or", "t"), ("s", "ort"))
}
