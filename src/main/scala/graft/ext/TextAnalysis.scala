package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation (SURVEY §7.4): language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions — embarrassingly parallel, no shuffle except the
  * explicit corpus-level aggregations.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = Tok.count(text)

  /** BPE-ish subword token count: runs of letters, runs of digits, and
    * single other non-space characters — the common pre-tokenizer
    * regex family. A cheap, deterministic proxy for an LLM tokenizer's
    * token count, used for corpus budgeting.
    */
  def subwordTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]"), lit(0)))

  /** Per-document quality features (length, word stats, punctuation /
    * digit / stopword ratios). Ratios are exact integer divisions cast
    * to double, so they are engine-portable.
    */
  def qualityFeatures(df: DataFrame, text: String): DataFrame = {
    val t = col(text)
    val words = Tok.tokens(t)
    df.withColumn("n_chars_m", length(t))
      .withColumn("n_words", size(words))
      .withColumn("avg_word_len",
        (length(t) - (size(words) - 1)).cast("double") / size(words))
      .withColumn("punct_ratio",
        size(regexp_extract_all(t, lit("[\\.,;:!\\?]"), lit(0))).cast("double") / length(t))
      .withColumn("digit_ratio",
        size(regexp_extract_all(t, lit("[0-9]"), lit(0))).cast("double") / length(t))
      .withColumn("stopword_ratio",
        size(filter(words, w => w.isin(Stopwords.en: _*))).cast("double") / size(words))
  }

  /** Composite quality score in [0,1]: the heuristics web-corpus
    * pipelines gate on (too short / too long / too few stopwords / too
    * much punctuation ⇒ low quality).
    */
  /** Weights are integer points summed exactly, then one division —
    * float literal addition is not associative-portable across engines.
    */
  def qualityScore(df: DataFrame, text: String): DataFrame =
    qualityFeatures(df, text).withColumn("quality_score",
      (when(col("n_words").between(10, 10000), 4).otherwise(0)
        + when(col("stopword_ratio") > 0.05, 3).otherwise(0)
        + when(col("punct_ratio") < 0.2, 2).otherwise(0)
        + when(col("avg_word_len").between(2.0, 12.0), 1).otherwise(0))
        / lit(10.0))

  /** Quantile quality gate: keep documents whose quality_score is at or
    * above the corpus `quantile` — "keep the best half" without a
    * hand-picked absolute threshold. The threshold is a ONE-ROW exact
    * `percentile` aggregate broadcast back over the corpus (no driver
    * collect, no extra shuffle beyond the aggregate); the map-side
    * score expressions are recomputed on the second pass, which at
    * corpus scale is cheaper than caching the whole scored table.
    */
  def qualityFilter(df: DataFrame, text: String,
                    quantile: Double = 0.5): DataFrame = {
    require(quantile >= 0.0 && quantile <= 1.0, "quantile in [0, 1]")
    val scored = qualityScore(df, text)
    val thr = scored.agg(
      expr(s"percentile(quality_score, $quantile)").as("_thr"))
    scored.crossJoin(broadcast(thr))
      .filter(col("quality_score") >= col("_thr"))
      .drop("_thr")
  }

  /** Model-scored quality filtering with a PINNED linear model — the
    * deterministic surrogate for the fastText-style quality classifier
    * big curation pipelines run (a real model's weights load the same
    * way; only the feature extraction and the score algebra matter to
    * the engine). Features are exact-BIGINT micro-ratios via INTEGER
    * division (`x·1e6 div d` — floor division is exact and portable,
    * unlike a double ratio), weights are pinned integers, so the score
    * is one overflow-safe BIGINT linear chain: reproducible on any
    * engine, any partitioning, bit-for-bit. Pure map-side (zero
    * shuffle); `keep` = score ≥ threshold.
    *
    * score_micro = 800·min(n_words, 1000) + 2·stop_m − punct_m −
    * digit_m, where stop_m/punct_m/digit_m are per-million ratios of
    * stopword tokens (per word) and punctuation/digit chars (per
    * char). Bounds: each term ≤ 2·10⁶·10⁶ — far below 2⁶³.
    */
  def qualityModel(df: DataFrame, text: String, id: String,
                   threshold: Long = 400000L): DataFrame = {
    val t = col(text)
    val words = Tok.tokens(t)
    df.select(col(id).as("doc"),
        size(words).cast("long").as("n_words"),
        greatest(length(t).cast("long"), lit(1L)).as("_n_chars"),
        size(filter(words, w => w.isin(Stopwords.en: _*)))
          .cast("long").as("_stop"),
        size(regexp_extract_all(t, lit("[\\.,;:!\\?]"), lit(0)))
          .cast("long").as("_punct"),
        size(regexp_extract_all(t, lit("[0-9]"), lit(0)))
          .cast("long").as("_digit"))
      .select(col("doc"), col("n_words"),
        expr("_stop * 1000000L div n_words").as("stop_m"),
        expr("_punct * 1000000L div _n_chars").as("punct_m"),
        expr("_digit * 1000000L div _n_chars").as("digit_m"))
      .withColumn("score_micro",
        lit(800L) * least(col("n_words"), lit(1000L))
          + lit(2L) * col("stop_m") - col("punct_m") - col("digit_m"))
      .withColumn("keep",
        (col("score_micro") >= threshold).cast("int"))
  }

  /** PII/URL scrubbing — the redaction pass training-data pipelines run
    * before anything else sees the text: emails, then URLs, then long
    * digit runs (phone numbers, IDs) are replaced by stable placeholder
    * tokens. Pure codegen'd `regexp_replace` chain (map-side, no
    * shuffle); the patterns stay inside the RE2-compatible subset so
    * the identical regex text runs on any engine (the oracle mirrors
    * them verbatim). Order matters: emails are matched before their
    * domain dots / digits can be partially eaten by the later rules.
    */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
        "https?://[^ \\t\\n]+", "<URL>"),
      "[0-9]{7,}", "<NUM>")

  /** HTML/markup → text extraction — the step upstream of every other
    * text operator when the corpus arrives as crawled pages. Pure
    * codegen'd `regexp_replace` chain (map-side, no shuffle) in the
    * RE2-compatible subset, so the oracle runs the identical pattern
    * text. Script/style bodies and comments are dropped WHOLE (their
    * content is code, not text); remaining tags become word boundaries
    * (block elements must not glue adjacent words); the entities
    * crawled pages actually carry are decoded — `&amp;` LAST, so
    * double-encoded text single-decodes and decoded entities are never
    * re-interpreted as markup; whitespace then squeezes to single
    * spaces. NULL text passes through as NULL.
    *
    * Contract note: like every regex-based extractor, any
    * `<`…`>`-delimited span is treated as markup — prose that uses
    * bare angle brackets ("a < b and c > d") loses the bracketed span.
    * Feed it crawled pages, not math notes; the behavior is pinned by
    * unit so it is a documented contract, not an accident.
    */
  def htmlToText(text: Column): Column = {
    def re(c: Column, pat: String, rep: String): Column =
      regexp_replace(c, pat, rep)
    val noBlocks = re(re(text,
      "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = re(re(noBlocks, "(?s)<!--.*?-->", " "), "<[^>]+>", " ")
    val decoded = re(re(re(re(re(re(noTags,
      "&nbsp;", " "),
      "&lt;", "<"),
      "&gt;", ">"),
      "&quot;", "\""),
      "&#39;", "'"),
      "&amp;", "&")
    trim(re(decoded, "[ \\t\\n\\f\\r\\x0B]+", " "))
  }

  /** Intra-document repetition ratio — the Gopher-style quality signal
    * for boilerplate/spam: the fraction of a doc's word n-gram
    * occurrences that are repeats of an earlier n-gram in the same doc
    * (0 = no repetition, → 1 for a looping document). Pure map-side
    * expressions: total n-gram count is arithmetic on the token count,
    * distinct count comes from the native WordShingles expression. Docs
    * shorter than n words carry one whole-text shingle → ratio 0.
    */
  def repetitionRatio(df: DataFrame, text: String, id: String,
                      n: Int = 3): DataFrame = {
    val toks = Tok.tokens(col(text))
    val total = greatest(size(toks) - lit(n - 1), lit(1))
    val distinctN = size(
      graft.functions.VectorExpressions.word_shingles(toks, n))
    df.select(col(id).as("doc"),
      total.cast("long").as("n_ngrams"),
      distinctN.cast("long").as("n_distinct"),
      round((total - distinctN).cast("double") / total, 6).as("rep_ratio"))
  }

  /** Sliding-window context chunking: each document becomes overlapping
    * `chunkTokens`-token windows advancing by `stride` tokens — the step
    * that turns curated documents into model-context-sized training /
    * retrieval examples (overlap = `chunkTokens - stride` keeps context
    * across cuts). Chunk `i` starts at token `i·stride`; windows are
    * emitted while their start lies inside the document, so the tail
    * chunk may be short. Pure map-side (split + transform + posexplode):
    * zero shuffles at any corpus size.
    */
  def chunkDocs(df: DataFrame, text: String, id: String,
                chunkTokens: Int = 32, stride: Int = 24): DataFrame = {
    require(chunkTokens >= 1 && stride >= 1 && stride <= chunkTokens,
      "need 1 <= stride <= chunkTokens")
    df.select(col(id).as("doc"), split(col(text), " ").as("_toks"))
      .withColumn("_nc",
        greatest(ceil(size(col("_toks")) / lit(stride.toDouble)), lit(1L))
          .cast("int"))
      .select(col("doc"), posexplode(expr(
        s"transform(sequence(0, _nc - 1), " +
          s"i -> concat_ws(' ', slice(_toks, i * $stride + 1, $chunkTokens)))"))
        .as(Seq("chunk_id", "chunk")))
      .withColumn("n_chunk_tokens", size(split(col("chunk"), " ")))
  }

  /** Frequency-ranked vocabulary: distinct tokens with corpus counts and
    * a contiguous `vocab_id` assigned in (count desc, token) order —
    * tokenizer-style id assignment. The ranking uses the distributed
    * two-pass numbering ([[graft.op.Scale.globalRowNumbers]]), never a
    * single-partition global window; the count aggregation is one
    * map-side-combined shuffle on the token.
    */
  def buildVocab(df: DataFrame, text: String, minCount: Long = 1): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    val counts = df
      .select(explode(Tok.tokens(col(text))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    graft.op.Scale.globalRowNumbers(
        counts.withColumn("_neg_n", -col("n")), Seq("_neg_n", "token"),
        idCol = "vocab_id")
      .drop("_neg_n")
  }

  /** Corpus-wide top-k bigram (adjacent word pair) counts — the
    * collocation profile quality teams eyeball for boilerplate. Tokens
    * are the pinned analysis tokenizer ([[Tok]]). Bigrams are generated
    * map-side (transform over the token array, no self-join); the count
    * is one partial-aggregated shuffle on the bigram; top-k is a
    * TakeOrdered, never a global sort.
    */
  def topBigrams(df: DataFrame, text: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    df.select(Tok.tokens(col(text)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram")).limit(k)
  }

  /** Corpus collocation mining: adjacent word pairs ranked by LIFT —
    * observed pair count over the count expected under independence,
    * `n_pair · N / (c(w1) · c(w2))` — with a minimum-count floor so
    * hapax noise can't dominate. Lift is a strictly monotone transform
    * of PMI (PMI = log2(lift · N_pairs/N)), so the ranking equals the
    * PMI ranking while staying oracle-matchable: the score is two
    * IEEE multiplies and one divide over exact-BIGINT-derived doubles
    * (every count < 2^53), identical on any engine — a log-based PMI
    * could never hash-match (`ln` is not correctly rounded).
    *
    * Scale shape: pairs are generated map-side within each document
    * (no self-join), counted through one partial-agg shuffle; the
    * unigram table is vocab-cardinality and joined twice AFTER the
    * min-count floor has shrunk the pair table; the corpus total is a
    * one-row broadcast; top-k is TakeOrdered. No corpus-sized state.
    */
  def collocations(df: DataFrame, text: String, k: Int = 30,
                   minCount: Long = 5): DataFrame = {
    require(k >= 1 && minCount >= 1, "k and minCount must be >= 1")
    val toks = df.select(Tok.tokens(col(text)).as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum(col("c")).cast("long").as("n_tok"))
    val pairs = toks.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> named_struct('w1', element_at(t, i), " +
          "'w2', element_at(t, i + 1)))")).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    pairs
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .withColumn("lift",
        col("n_pair").cast("double") * col("n_tok").cast("double")
          / (col("c1").cast("double") * col("c2").cast("double")))
      .select(col("w1"), col("w2"), col("n_pair"), col("c1"), col("c2"),
        col("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2")).limit(k)
  }

  /** Per-document lexical diversity: token count, distinct-type count,
    * hapax (frequency-1) count, and type-token ratio. All counts are
    * exact integers; the ratio is one integer-derived division rounded
    * once — engine-portable. Two partial-aggregated shuffles, both keyed
    * on the doc id (the second reuses the first's partitioning).
    */
  def typeTokenStats(df: DataFrame, text: String, id: String): DataFrame = {
    val counts = df.select(col(id).as("doc"),
        explode(Tok.tokens(col(text))).as("token"))
      .groupBy("doc", "token").agg(count(lit(1)).as("c"))
    counts.groupBy("doc").agg(
        sum("c").cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr",
        round(col("n_types").cast("double") / col("n_tokens"), 6))
  }

  /** Per-document Simpson diversity index — the EXACT-arithmetic
    * lexical-concentration signal (entropy's rational cousin: entropy
    * needs log and can never hash-match; Simpson is pure integer
    * algebra). diversity = 1 − Σ c_i(c_i−1) / (n(n−1)) = the
    * probability two tokens drawn without replacement differ: 1e6
    * micro-units for a fully diverse doc, → 0 for a one-token loop.
    * A boilerplate/spam gate that, unlike [[repetitionRatio]]'s
    * n-gram view, sees pure token-distribution concentration.
    *
    * Emitted as exact micro-units via integer division; docs with
    * n < 2 tokens have no pair to draw and get NULL (pinned, mirrored
    * by the oracle). Magnitude: Σc(c−1)·1e6 < 2^63 holds for docs up
    * to ~3M tokens. Two partial-agg shuffles, both keyed on the doc
    * (same shape as [[typeTokenStats]]).
    */
  def simpsonDiversity(df: DataFrame, text: String, id: String): DataFrame =
    df.select(col(id).as("doc"), explode(Tok.tokens(col(text))).as("token"))
      .groupBy("doc", "token").agg(count(lit(1)).as("c"))
      .groupBy("doc").agg(
        sum(col("c")).cast("long").as("n_tokens"),
        sum(col("c") * (col("c") - 1)).cast("long").as("_rep"))
      .select(col("doc"), col("n_tokens"),
        expr("CASE WHEN n_tokens >= 2 THEN " +
          "1000000L - _rep * 1000000L div (n_tokens * (n_tokens - 1)) " +
          "ELSE NULL END").as("diversity_m"))

  /** Corpus token frequency: the global top-k tokens. Partial (map-side)
    * aggregation makes this a single light shuffle even at corpus scale.
    */
  def topTokens(df: DataFrame, text: String, k: Int): DataFrame =
    df.select(explode(Tok.tokens(col(text))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(k)

  /** Exact-phrase occurrence counts via a positional posting join — the
    * inverted-index idiom, not a substring scan. Tokens come from the
    * pinned analysis tokenizer ([[Tok.tokens]]), so "phrase" means a
    * run of consecutive WORDS (case-folded, whitespace-normalized), and
    * overlapping occurrences each count.
    *
    * Scale shape — why this beats `contains()` at 100 TB: the token
    * stream is filtered to the phrase's terms MAP-SIDE, before any
    * exchange, so the one shuffle carries only postings of the handful
    * of query terms (each tagged with its slot offset), not the corpus.
    * Phrase hits are then a single aggregation: slot s of the phrase at
    * token position p proposes start `p - s`, and a (doc, start) cell
    * covering all `phrase.length` distinct slots is an occurrence —
    * which handles repeated words in the phrase (each slot is counted
    * distinctly) with no per-slot self-joins. A second tiny aggregation
    * rolls occurrences up per document. Cost is linear in the phrase
    * terms' posting lists; a `contains()` scan re-reads every byte of
    * the corpus per query and can't batch multiple phrases.
    *
    * Output: (doc, n_matches) for documents with ≥ 1 occurrence.
    */
  def phraseMatches(df: DataFrame, text: String, id: String,
                    phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    val toks = df.select(col(id).as("doc"),
      posexplode(Tok.tokens(col(text))).as(Seq("pos", "tok")))
    val slots = phrase.zipWithIndex.map { case (w, s) =>
      toks.filter(col("tok") === lit(w))
        .select(col("doc"), (col("pos") - lit(s)).as("start"), lit(s).as("slot"))
    }
    // plain count(*) IS the distinct-slot count: token positions are
    // unique within a doc, so each slot branch contributes at most ONE
    // row per (doc, start) cell, and the branches carry distinct slot
    // tags by construction. count_distinct would plan a second
    // aggregation exchange for a distinctness the union already
    // guarantees. (The slot tag itself is retained for this proof, not
    // for the arithmetic.)
    slots.reduce(_ unionAll _)
      .groupBy("doc", "start")
      .agg(count(lit(1)).as("_hits"))
      .filter(col("_hits") === lit(phrase.length.toLong))
      .groupBy("doc").agg(count(lit(1)).as("n_matches"))
  }

  /** Per-(doc, term) TF-IDF over whitespace tokens: tf = in-document
    * term count, df = number of documents containing the term,
    * tfidf = tf · (ln((N+1)/(df+1)) + 1) (smoothed). Two partial-agg
    * shuffles (per-doc term counts, then per-term doc frequency) plus a
    * broadcast of the single-row corpus count — at 100 TB the df table
    * is the only corpus-wide state and it is one row per distinct term.
    * tf/df are exact integers (the oracle checks those); the tfidf
    * double carries engine-local ln().
    */
  def tfidf(df: DataFrame, text: String, id: String): DataFrame = {
    val toks = df.select(col(id).as("doc"),
      explode(Tok.tokens(col(text))).as("term"))
    val tf = toks.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf") *
        (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1))
      .select(col("doc"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Sparse TF-IDF cosine document similarity through the inverted
    * index — the classic term-at-a-time sparse dot product: documents
    * become integer idf-weighted shingle-set vectors, the posting
    * self-join generates
    * exactly the pairs sharing ≥ 1 term, and Σ w_a·w_b over shared
    * terms IS the dot product (terms unique to one doc contribute 0).
    * Complements the embedding-cosine family: this is LEXICAL
    * similarity with no model, the "same words, any order" signal used
    * for topical near-dup triage and weak supervision.
    *
    * Exactness contract: weights are N-INDEPENDENT integer rarity
    * points ([[Bm25.idfMillePtsSql]], round(1e5/(df+1)) — bounded by
    * 50,000 at any corpus size, which is what keeps the exact test
    * inside DECIMAL(38,0) at 100 TB; the x25 stress proved the
    * N-carrying form leaves the regime at 125k docs); dot and norms
    * accumulate in
    * DECIMAL(38,0) (DuckDB: HUGEINT — both exact), and the threshold
    * decision is the divisions-and-sqrt-cleared integer test
    * `dot² · 10⁴ ≥ t_centi² · ‖a‖²·‖b‖²`, so pair membership cannot
    * drift by an ulp. Only the REPORTED cosine is double (one cast of
    * each exact integer, then correctly-rounded · / sqrt — identical
    * chains both engines).
    *
    * Scale shape: terms with df > `maxDf` are stop-listed — that is
    * part of the operator's semantics (standard stop-wording), and it
    * is what bounds the posting join: pair volume is Σ_term C(df,2) ≤
    * maxDf · Σ df. df=1 terms are pruned from the join (a term in one
    * doc can't pair — lossless) but still count toward norms. One
    * token shuffle, one term-keyed posting self-join behind
    * shuffle_hash hints (posting frames are corpus-sized — the
    * TextDedup discipline), one pair aggregation, two |docs|-row
    * norm joins.
    *
    * API bound (r15, breaking vs the pre-r15 self-join form): `maxDf`
    * must be ≤ 10,000 — posting lists expand in-row through
    * `array_pairs`, whose hard input bound that is. The old self-join
    * accepted any maxDf ≥ 2; callers needing a hub-term regime beyond
    * 10k should pre-filter terms and use the pair-graph family
    * ([[graft.ext.TextDedup.candidatePairCounts]]) instead — a df that
    * high is no longer a "rarity weight" in any meaningful sense.
    */
  def sparseCosinePairs(df: DataFrame, text: String, id: String,
                        minCosCenti: Int = 30,
                        maxDf: Long = 100L, shingleN: Int = 3,
                        normSqBound: java.math.BigDecimal =
                          new java.math.BigDecimal("1000000000000000")): DataFrame = {
    require(minCosCenti >= 0 && minCosCenti <= 100, "minCosCenti in [0,100]")
    require(maxDf >= 2 && maxDf <= 10000,
      "maxDf must be in [2, 10000] (array_pairs bound)")
    require(shingleN >= 1, "shingleN must be >= 1")
    require(normSqBound.compareTo(
      new java.math.BigDecimal("1000000000000000")) <= 0,
      "normSqBound above 1e15 would let the exact test overflow DECIMAL(38,0)")
    // terms are word n-SHINGLES, not words: a natural-language corpus
    // has a hub-free shingle df distribution where single words are
    // nearly all stopword-frequent (the jaccard family's term space —
    // same codegen'd kernel, same parity rules). The kernel dedups
    // shingles WITHIN a doc and gives a doc shorter than shingleN
    // tokens its whole text as one shingle, so this is SET cosine:
    // every present term weighs idf once (tf ≡ 1 by construction).
    val terms = df.select(col(id).as("doc"),
      explode(graft.functions.VectorExpressions.word_shingles(
        Tok.tokens(col(text)), shingleN)).as("term"))
    // r15 restructure (guide §2.3/§2.4): tf ≡ 1 makes the weight a pure
    // function of the term's df, so the whole similarity derives from
    // ONE pass over the posting lists — window df-prune (hub terms are
    // dropped BEFORE any list builds, the candidatePairCounts memory
    // discipline), group each surviving term's postings, and expand the
    // pairs IN-ROW via array_pairs (canonical a<b) instead of the old
    // shuffle-hash self-join. This removes the second tokenize pass
    // (terms fed both dfreq and the join before), the dfreq join, and
    // both self-join exchanges of the posting table; the groupBy reuses
    // the window's term-partitioning, so the corpus crosses the network
    // once. Arithmetic is unchanged: dot = Σ_shared w_t², norm² = Σ w_t²
    // over exact DECIMAL(38,0) sums (associative), so membership and
    // cos_r are bit-identical to the self-join form.
    // r16: pin the term exchange (util.PinExchange) — the df-prune
    // window, posting collect and in-row pair explosion are fused above
    // this one shuffle; AQE's byte-based coalescing serialized them.
    val counted = graft.util.PinExchange(terms, col("term"))
      .withColumn("_pf",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("term")))
    val grouped = counted.filter(col("_pf") <= maxDf)
      .groupBy("term")
      .agg(collect_list(col("doc")).as("docs"), max(col("_pf")).as("df"))
      .withColumn("w", expr(Bm25.idfMillePtsSql))
      .select("docs", "df", "w")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // norm2 (|docs| rows) and dots (posting-bounded pairs) are the
    // only consumers of the cached posting frame — materialize them
    // eagerly into their own (much smaller, clearCache-evictable)
    // persists and release the corpus-sized cache HERE, so a
    // long-lived session/bench loop doesn't leak it. Deliberately
    // persist, NOT localCheckpoint: clearCache() cannot evict
    // localCheckpoint blocks, which would be the worse leak.
    val w2 = (col("w").cast("decimal(38,0)") * col("w")).as("w2")
    val norm2 = grouped.select(explode(col("docs")).as("doc"), w2)
      .groupBy("doc").agg(sum(col("w2")).as("n2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dots = grouped.filter(col("df") >= 2)
      .select(explode(
        graft.functions.VectorExpressions.array_pairs(col("docs"))).as("p"),
        w2)
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(sum(col("w2")).as("dot"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    norm2.count(); dots.count()
    grouped.unpersist()
    val tC = lit(minCosCenti.toLong)
    // Overflow guard — LOUD, not silent. Under Spark's default
    // (non-ANSI) decimal ops a DECIMAL(38,0) product past 38 digits
    // yields NULL, so the threshold filter would silently DROP the
    // pair while the DuckDB HUGEINT oracle keeps it ("membership
    // cannot drift" would break exactly at scale). Bounding both
    // norms < 1e15 bounds every product below within 38 digits:
    // t² · na² · nb² ≤ 10⁴·10¹⁵·10¹⁵ = 10³⁴, and by Cauchy-Schwarz
    // dot ≤ √(na²·nb²) ≤ 10¹⁵ so dot²·10⁴ ≤ 10³⁴ (all w ≥ 0, so the
    // partial aggregation sums are bounded by their totals too). A
    // norm past the bound — or NULLed by its own aggregation overflow
    // — raises here instead of corrupting membership. assert_true
    // lives in a FILTER: projected-column checks get pruned away.
    val n2Bound = lit(normSqBound)
    dots
      .join(norm2.select(col("doc").as("doc_a"), col("n2").as("na2")),
        Seq("doc_a"))
      .join(norm2.select(col("doc").as("doc_b"), col("n2").as("nb2")),
        Seq("doc_b"))
      .filter(assert_true(col("na2") < n2Bound && col("nb2") < n2Bound,
        lit("sparseCosinePairs: norm² >= 1e15 leaves the exact " +
          "DECIMAL(38,0) regime (overflow would NULL-drop pairs); " +
          "raise weight scaling down or shrink idf magnitude")).isNull)
      .filter(col("dot") * col("dot") * lit(10000L) >=
        tC * tC * col("na2") * col("nb2"))
      .select(col("doc_a"), col("doc_b"),
        round(col("dot").cast("double") /
          sqrt((col("na2") * col("nb2")).cast("double")), 6).as("cos_r"))
  }

  /** BM25 document scoring for a fixed query-term set — the retrieval
    * scorer a training-data pipeline uses for topic mining, hard-negative
    * selection, and retrieval-augmented filtering.
    *
    * This is the BM25 family with the RATIONAL idf
    * `(N − df + 0.5) / (df + 0.5)` — the odds ratio the classic log-idf
    * wraps. `ln`/`exp` are not correctly-rounded IEEE ops (libm
    * implementations differ by ulps across engines — the reason
    * `t_math_funcs` excludes them), so a log-based score can never
    * hash-match an independent engine; `+ − * /` ARE correctly rounded,
    * so the identical expression tree (shared verbatim with the oracle
    * via [[Bm25]]) is bit-equal anywhere. Per-term contributions are
    * scaled to integer micro-points and summed as BIGINT — associative,
    * so partition/reduction order cannot perturb totals.
    *
    * Scale shape: the query-term filter runs map-side BEFORE any
    * shuffle (only matching tokens survive), corpus stats and per-term
    * df are one-row / |q|-row broadcasts, and the per-doc sum is one
    * partial-agg shuffle over ≤|q| rows per matching doc. Tokenization
    * is the pinned analysis rule ([[Tok]]).
    */
  def bm25Scores(df: DataFrame, text: String, id: String,
                 queryTerms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val base = df.select(col(id).as("doc"),
      Tok.tokens(col(text)).as("_toks"))
      .withColumn("dl", size(col("_toks")).cast("long"))
    val stats = base.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val tf = base.select(col("doc"), col("dl"), explode(col("_toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfq"))
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", expr(Bm25.avgdlSql))
      .withColumn("_pts", expr(Bm25.pointsSql(k1, b)))
      .groupBy("doc")
      .agg(sum("_pts").as("score_pts"), count(lit(1)).as("n_terms"))
  }

  /** Top-k BM25 retrieval: `bm25Scores` → distributed TakeOrdered on
    * (score desc, doc) → rank. The rank window runs over the k
    * surviving rows only (bounded by k, never corpus-sized).
    */
  def bm25TopK(df: DataFrame, text: String, id: String,
               queryTerms: Seq[String], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, "k must be >= 1")
    Bm25.rankOrdered(bm25Scores(df, text, id, queryTerms, k1, b)
      .orderBy(col("score_pts").desc, col("doc")).limit(k),
      Seq(col("score_pts").desc, col("doc")))
      .select(col("rank"), col("doc"), col("score_pts"), col("n_terms"))
  }

  /** Frozen BM25 routing model: corpus statistics snapshotted ONCE
    * from a reference corpus, so scoring new documents needs no pass
    * over that corpus. `termDf` holds document frequencies for the
    * union of all route terms only — vocab-bounded (routes × terms),
    * never corpus-bounded, which is what makes the model broadcastable
    * and the scoring map-side at any corpus size. Staleness is the
    * caller's contract: scores drift as the live corpus diverges from
    * the snapshot; re-snapshot on a cadence.
    */
  case class Bm25Snapshot(nDocs: Long, sumDl: Long,
                          termDf: Map[String, Long],
                          routes: Map[String, Seq[String]])

  /** Build a [[Bm25Snapshot]] from a static corpus: one aggregation
    * for (n_docs, sum_dl), one vocab-bounded df aggregation filtered
    * to the route terms. The collect is |∪ route terms| rows — the
    * dimension-table contract, not a corpus collect.
    */
  def bm25Snapshot(corpus: DataFrame, text: String, id: String,
                   routes: Map[String, Seq[String]]): Bm25Snapshot = {
    require(routes.nonEmpty && routes.values.forall(_.nonEmpty),
      "routes must be non-empty with non-empty term lists")
    val allTerms = routes.values.flatten.toSeq.distinct
    // r15: persist — (n, sum_dl) and the df aggregation both consume
    // the tokenized frame; without materialization the corpus
    // tokenizes twice per snapshot build
    val base = corpus.select(col(id).as("doc"),
      Tok.tokens(col(text)).as("_toks"))
      .withColumn("dl", size(col("_toks")).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val Array(n, sdl) = base.agg(count(lit(1)), sum("dl"))
      .head().toSeq.map(v => Option(v).fold(0L)(_.asInstanceOf[Long])).toArray
    require(n > 0, "bm25Snapshot needs a non-empty reference corpus " +
      "(avgdl is undefined on an empty one)")
    val dfs = base.select(col("doc"), explode(col("_toks")).as("term"))
      .filter(col("term").isin(allTerms: _*))
      .groupBy("doc", "term").agg(count(lit(1)))
      .groupBy("term").agg(count(lit(1)).as("dfq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    base.unpersist()
    Bm25Snapshot(n, sdl, dfs, routes)
  }

  /** Score documents against a frozen [[Bm25Snapshot]] and keep each
    * document's best route (ties break on route name): the model-
    * scoring kernel shared verbatim by the batch operator and the
    * streaming twin (`EventStream.bm25RouteStream` runs THIS kernel
    * per micro-batch, so stream/batch bit-equality is structural, not
    * coincidental). Documents matching no route term emit nothing.
    *
    * Tokens are filtered against the ROUTE-TERM UNION, not the model's
    * observed-df vocabulary: a route term the snapshot corpus never
    * contained (dfq = 0) still scores on new/streamed documents, at the
    * maximum idf `(n+0.5)/0.5` — the natural BM25 limit for an unseen
    * term. (Filtering on `termDf.keys` instead silently dropped exactly
    * the highest-idf terms in the frozen-model deployment; on the
    * registered query the two filters coincide because the snapshot
    * corpus IS the scored corpus, so a df=0 term matches no token.)
    *
    * Scale shape: the model joins in as a broadcast (route, term, dfq)
    * dimension table; the token filter runs map-side before any
    * shuffle; per-(doc, route) sums partial-aggregate; the best-route
    * pick is a WindowGroupLimit. Nothing corpus-sized shuffles beyond
    * the matching tokens themselves.
    */
  def bm25Route(df: DataFrame, text: String, id: String,
                model: Bm25Snapshot,
                k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val modelRows = model.routes.toSeq.flatMap { case (r, terms) =>
      terms.distinct.map(t => (r, t, model.termDf.getOrElse(t, 0L)))
    }.toDF("route", "term", "dfq")
    val base = df.select(col(id).as("doc"),
      Tok.tokens(col(text)).as("_toks"))
      .withColumn("dl", size(col("_toks")).cast("long"))
    val tf = base.select(col("doc"), col("dl"),
      explode(col("_toks")).as("term"))
      .filter(col("term").isin(model.routes.values.flatten.toSeq.distinct: _*))
      .groupBy("doc", "dl", "term").agg(count(lit(1)).as("tf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy(col("score_pts").desc, col("route"))
    tf.join(broadcast(modelRows), Seq("term"))
      .withColumn("n_docs", lit(model.nDocs))
      .withColumn("sum_dl", lit(model.sumDl))
      .withColumn("avgdl", expr(Bm25.avgdlSql))
      .withColumn("_pts", expr(Bm25.pointsSql(k1, b)))
      .groupBy("doc", "route")
      .agg(sum("_pts").as("score_pts"), count(lit(1)).as("n_terms"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Per-document keyword extraction: top-k terms by tf·idf with the
    * rational idf `(N+1)/(df+1)` pre-scaled to integer micro-points, so
    * the score is EXACT BIGINT arithmetic (`tf · round(1e6·(N+1)/(df+1))`)
    * — portable across engines where the classic log-idf is not (see
    * [[bm25Scores]]). Ties break on term text; same two-shuffle shape
    * as [[tfidf]] plus a WindowGroupLimit-able per-doc top-k.
    */
  def keywords(df: DataFrame, text: String, id: String,
               k: Int = 3): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val toks = df.select(col(id).as("doc"),
      explode(Tok.tokens(col(text))).as("term"))
    val tf = toks.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy(col("score_pts").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_pts", expr(Bm25.keywordIdfPtsSql))
      .withColumn("score_pts", col("tf") * col("idf_pts"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
      .select(col("doc"), col("rk"), col("term"), col("tf"), col("df"),
        col("score_pts"))
  }

  /** SQL-portable bigram-probability micro-points — shared verbatim
    * with the DuckDB oracle (expects columns c2, c1); see [[Bm25]] for
    * the literal-pinning rationale.
    */
  val lmPointsSql: String =
    "CAST(round(CAST(1000000.0 AS DOUBLE) * CAST(c2 AS DOUBLE) / " +
      "CAST(c1 AS DOUBLE)) AS BIGINT)"

  /** Corpus-trained bigram language-model scoring — the
    * perplexity-PROXY quality signal (KenLM-style filtering) in an
    * engine-portable form: each in-document bigram (w1, w2) scores the
    * conditional probability c(w1,w2)/c(w1) estimated from the corpus
    * itself, scaled to integer micro-points (one correctly-rounded
    * double division — exact and order-independent under the BIGINT
    * sum), and a document's score is the mean over its bigrams. True
    * log-perplexity needs `ln`, which is not correctly rounded and can
    * never hash-match across engines (see [[Bm25]]); the mean raw
    * probability ranks fluent-vs-gibberish the same direction and IS
    * exact. Low avg ⇒ improbable token transitions ⇒ gibberish/noise.
    *
    * Scale shape: bigram generation is pure map-side; the model is two
    * partial-agg shuffles over bigram/unigram TYPES (vocab-bounded, not
    * corpus-bounded); scoring is one join on (w1, w2) co-partitioned
    * with the type table plus the final per-doc partial-agg sum. Docs
    * with fewer than two tokens have no bigrams and are excluded.
    *
    * CACHE obligation (r16, advisor note): the corpus-sized bigram
    * frame is persisted for the duration of the returned plan's
    * actions and is NOT eagerly released here (the three consumers
    * evaluate lazily, possibly across several caller actions). A
    * long-lived session embedding this must call
    * `spark.catalog.clearCache()` (or unpersist via its own lifecycle)
    * once the result is consumed — the same obligation the bench's
    * per-query clearCache discharges.
    */
  def lmScore(df: DataFrame, text: String, id: String): DataFrame = {
    val base = df.select(col(id).as("doc"),
      Tok.tokens(col(text)).as("_tk"))
    // guard < 2 tokens BEFORE sequence(): Spark's sequence(0, -1)
    // descends rather than producing an empty array
    val bg = base.filter(size(col("_tk")) >= 2)
      .select(col("doc"), explode(expr(
        "transform(sequence(0, size(_tk) - 2), " +
          "i -> struct(_tk[i] AS w1, _tk[i + 1] AS w2))")).as("b"))
      .select(col("doc"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      // r15: bg feeds THREE consumers (bigram counts, unigram counts,
      // the scoring join) — without materialization the tokenize +
      // bigram-explode pass over the corpus runs three times. persist,
      // not localCheckpoint (clearCache must be able to evict it).
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val p = c2.join(c1, Seq("w1")).withColumn("p_pts", expr(lmPointsSql))
    bg.join(p, Seq("w1", "w2"))
      .groupBy("doc")
      .agg(sum("p_pts").as("lm_pts"), count(lit(1)).as("n_bigrams"))
      .withColumn("avg_p_micro",
        round(col("lm_pts").cast("double") / col("n_bigrams"), 6))
  }

  /** Corpus drift report: per-group (language, source, …) profile of
    * two corpus snapshots side by side with absolute and relative
    * deltas — the monitoring table a production pipeline materializes
    * on every ingest to catch composition shifts (a language
    * collapsing, a source ballooning) before they reach training.
    * Counts are exact integers; the relative delta is one
    * correctly-rounded division (NULL when the group is new — no
    * baseline to compare against). Two partial-agg shuffles (one per
    * snapshot, each output is |groups| rows) + a tiny full-outer join.
    */
  def corpusDrift(before: DataFrame, after: DataFrame, group: String,
                  text: String): DataFrame = {
    def profile(df: DataFrame, suffix: String): DataFrame =
      df.groupBy(group).agg(
        count(lit(1)).as(s"n_docs_$suffix"),
        sum(Tok.count(col(text)).cast("long"))
          .as(s"n_tokens_$suffix"))
    profile(before, "before").join(profile(after, "after"),
        Seq(group), "full_outer")
      .na.fill(0L, Seq("n_docs_before", "n_tokens_before",
        "n_docs_after", "n_tokens_after"))
      .withColumn("docs_delta", col("n_docs_after") - col("n_docs_before"))
      .withColumn("docs_rel",
        round(col("docs_delta").cast("double") /
          nullif(col("n_docs_before"), lit(0L)), 6))
  }

  /** Language ID, n-gram/stopword-profile heuristic: score each language
    * by the fraction of tokens hitting its marker list; argmax wins,
    * 'und' (undetermined) when nothing scores. Profiles are tiny and
    * inlined into the expression — no join, no model, map-side only.
    */
  def languageId(df: DataFrame, text: String): DataFrame = {
    val words = Tok.tokens(col(text))
    val scored = Stopwords.profiles.map { case (lang, markers) =>
      struct(
        (size(filter(words, w => w.isin(markers: _*))).cast("double") / size(words)).as("score"),
        lit(lang).as("lang"))
    }
    df.withColumn("_best", greatest(scored: _*))
      .withColumn("predicted_lang",
        when(col("_best.score") > 0.0, col("_best.lang")).otherwise(lit("und")))
      .withColumn("lang_score", col("_best.score"))
      .drop("_best")
  }

  /** Rolling-hash document fingerprint (content-defined, order
    * sensitive): fold reduced xxhash64 token hashes through a modular
    * polynomial. All intermediates stay far below Long range, so the
    * fold is safe under Spark's default ANSI overflow checking.
    * Production variant — not oracle-portable (xxhash64 is Spark's).
    */
  def fingerprint(text: Column): Column =
    aggregate(Tok.tokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(31L) + pmod(xxhash64(t), lit(1000000007L)),
        lit(1000000007L)))

  /** Engine-portable fingerprint: position-weighted sum over
    * (first-char codepoint, token length) mod 1e6+3. Order-sensitive
    * through the position weight, and any ANSI engine with
    * ascii()/length() computes the identical value — this is the
    * variant the DuckDB oracle checks.
    */
  def portableFingerprint(tokensCol: String): Column =
    expr(s"pmod(aggregate(zip_with($tokensCol, sequence(1, size($tokensCol)), " +
      "(t, i) -> cast(i as bigint) * (ascii(substring(t, 1, 1)) * 131 + length(t))), " +
      "0L, (acc, v) -> acc + v), 1000003)")
}

/** SQL-portable BM25 expression texts, shared VERBATIM between the
  * Spark operator (via `expr`) and the DuckDB oracle (`OracleSql`) so
  * both engines evaluate the same parse tree. Every numeric literal is
  * wrapped in `CAST(... AS DOUBLE)` — bare decimal literals are DECIMAL
  * in both SQL dialects and their propagation rules differ; the casts
  * pin every operation to correctly-rounded IEEE double arithmetic,
  * which is what makes the scores bit-identical across engines.
  * Expected column names: tf, dfq, dl, n_docs, sum_dl, avgdl.
  */
object Bm25 {

  /** `row_number()` over an ALREADY totally-ordered, `limit(k)`-bounded
    * frame, without a WindowExec: a global sort + limit leaves the k
    * rows in one ordered partition, and `zipWithIndex` preserves both
    * partition order and within-partition order, so index + 1 IS the
    * row number. An empty-partition window here would be semantically
    * identical but logs WindowExec's "No Partition Defined" scale
    * warning on every run (and partitionBy(lit) doesn't help — the
    * optimizer folds literal partition keys away); on k rows the
    * warning is noise, and it drowned real signal in the driver bench
    * tail (round-13 verdict #3). The RDD hop costs one k-row pass.
    *
    * The caller passes `order` — the frame's own sort keys — because
    * "sort + limit yields one ordered partition" is a PHYSICAL-plan
    * artifact (TakeOrderedAndProject), not a Dataset API guarantee: a
    * planner fallback to Sort + GlobalLimit (large k, AQE, the
    * topKSortFallbackThreshold conf) could hand this function rows in
    * a different partitioning. `coalesce(1)` pins one partition and
    * `sortWithinPartitions(order)` re-establishes the order there —
    * both O(k) on the limited frame, so the guarantee costs nothing
    * while the plan happens to be TakeOrderedAndProject (which
    * PlanSpec still pins as the scale tripwire).
    */
  def rankOrdered(df: org.apache.spark.sql.DataFrame,
                  order: Seq[org.apache.spark.sql.Column],
                  rankCol: String = "rank")
  : org.apache.spark.sql.DataFrame = {
    require(order.nonEmpty, "rankOrdered needs the frame's sort keys")
    val one = df.coalesce(1).sortWithinPartitions(order: _*)
    val schema = org.apache.spark.sql.types.StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField(rankCol,
        org.apache.spark.sql.types.IntegerType, nullable = false))
    val rdd = one.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L).toInt)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  val avgdlSql: String = "CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)"

  def idfSql: String =
    "(CAST(n_docs - dfq AS DOUBLE) + CAST(0.5 AS DOUBLE)) / " +
      "(CAST(dfq AS DOUBLE) + CAST(0.5 AS DOUBLE))"

  def tfPartSql(k1: Double, b: Double): String =
    s"CAST(tf AS DOUBLE) * CAST($k1 + 1.0 AS DOUBLE) / " +
      s"(CAST(tf AS DOUBLE) + CAST($k1 AS DOUBLE) * " +
      s"(CAST(1.0 - $b AS DOUBLE) + CAST($b AS DOUBLE) * " +
      s"CAST(dl AS DOUBLE) / avgdl))"

  /** Per-(doc, term) contribution in integer micro-points. */
  def pointsSql(k1: Double, b: Double): String =
    s"CAST(round(($idfSql) * (${tfPartSql(k1, b)}) * " +
      "CAST(1000000.0 AS DOUBLE)) AS BIGINT)"

  /** Rational-idf micro-points for keyword extraction: round(1e6·(N+1)/(df+1)). */
  val keywordIdfPtsSql: String =
    "CAST(round(CAST(1000000.0 AS DOUBLE) * CAST(n_docs + 1 AS DOUBLE) / " +
      "CAST(df + 1 AS DOUBLE)) AS BIGINT)"

  /** Sparse-cosine term weight: round(1e5 / (df+1)) — the rarity
    * weighting with the corpus size DIVIDED OUT. Cosine is scale-
    * invariant, so (N+1)/(df+1) and 1/(df+1) weightings are the same
    * similarity up to rounding — but the N-carrying form grows
    * linearly with corpus size and left the exact DECIMAL(38,0)
    * regime at 125k docs (the x25 stress fired sparseCosinePairs'
    * overflow guard: a single df=1 term weighed 1e8 mille-points,
    * w² ≈ 7e15 > the norm bound on its own). This form is
    * N-INDEPENDENT: w ≤ 50,000 at any corpus size, so norm² ≤
    * 2.5e9 · shingles-per-doc and the exact test holds to ~400k
    * shingles per document at 100 TB as at 100 MB. The 1e5 scale
    * keeps full resolution across the df ≤ maxDf stop-listed range
    * (df=100 → 990 points). idfMillePtsSql until round 10.
    */
  val idfMillePtsSql: String =
    "CAST(round(CAST(100000.0 AS DOUBLE) / " +
      "CAST(df + 1 AS DOUBLE)) AS BIGINT)"

  /** Reciprocal-rank-fusion contribution in integer nano-points:
    * round(1e9 / (60 + rank)) for the given rank column.
    */
  def rrfPtsSql(rankCol: String): String =
    s"CAST(round(CAST(1000000000.0 AS DOUBLE) / " +
      s"CAST(60 + $rankCol AS DOUBLE)) AS BIGINT)"
}

/** Tiny inline stopword / marker-word profiles. Real deployments load
  * fuller lists; the operator shape (filter-ratio scoring) is identical.
  */
object Stopwords {
  val en: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "are", "was", "for", "on", "with", "as", "by", "at", "it")
  val de: Seq[String] = Seq("der", "die", "das", "und", "oder", "von",
    "zu", "ist", "sind", "für", "auf", "mit", "als", "bei", "ein", "eine")
  val es: Seq[String] = Seq("el", "la", "los", "las", "y", "o", "de",
    "a", "en", "es", "son", "para", "con", "como", "por", "un", "una")
  val fr: Seq[String] = Seq("le", "la", "les", "et", "ou", "de", "à",
    "en", "est", "sont", "pour", "avec", "comme", "par", "un", "une")
  val profiles: Seq[(String, Seq[String])] =
    Seq("en" -> en, "de" -> de, "es" -> es, "fr" -> fr)
}
