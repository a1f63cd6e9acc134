package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * public paper): select raw-corpus documents whose hashed-n-gram
  * distribution looks like a TARGET corpus, by the log-likelihood
  * ratio of two bag-of-buckets multinomials. The canonical
  * "make 100 TB of crawl look like Wikipedia" pretraining move.
  *
  * Reference behavior: the reference pipeline has no selection stage
  * (rows pass through normalization untouched,
  * `/root/reference/dags/dag_collection_data_from_bp.py:24-38`);
  * this is extension surface for the training-data use case.
  *
  * Features are hashed unigram + bigram token codes — the engine-
  * portable code chain of the sketch family ([[Sketches.tokCodeSql]]:
  * `ascii(first char)·131 + length`, bigrams paired with a 131071
  * multiplier, both Knuth-mixed mod 1000003 mod `m`), so an
  * independent engine recomputes every bucket bit-for-bit.
  *
  * Float discipline (the NOTES.md parity rules): the ONLY
  * transcendental sits on the m-row model table — each bucket's
  * log-ratio is quantized ONCE to integer milli-nats
  * (`round(1000·(ln(nT+1) − ln(TT+m) − ln(nR+1) + ln(TR+m)))`, all
  * ln arguments exact-integer doubles). Per-document scores are then
  * pure BIGINT sums `Σ c_b·λ_b` — associative, order-independent,
  * exact in any engine — so weights and selections carry full hash
  * oracles, not rows-only checks. (A raw double log-sum would be
  * summation-order-dependent and could never hash-match.)
  *
  * Scale shape (the paper's own): both models are map-side-combined
  * aggregations to ≤ m rows; the λ table broadcasts; per-doc scoring
  * is one (doc, bucket) aggregation — the only corpus-sized shuffle —
  * and selection is TakeOrdered(k), never a full sort. Nothing here
  * is all-pairs and nothing collects beyond the m-row model.
  */
object Dsir {

  /** Default bucket count (the paper uses 10⁴; 4096 keeps the model
    * table trivially broadcastable while leaving bucket collisions
    * visible at test scale).
    */
  val DefaultBuckets = 4096

  /** Milli-nat quantization scale for the per-bucket log-ratio. */
  val LambdaScale = 1000

  /** Per-token portable code array over token array column `toks`. */
  private def codesSql(toks: String): String =
    s"transform($toks, t -> CAST(ascii(substring(t, 1, 1)) * 131 " +
      s"+ length(t) AS BIGINT))"

  /** Hashed unigram+bigram bucket array over code array column. All
    * arithmetic is bounded BEFORE each multiply (codes ≤ ~1.5e8, so
    * code·131071 ≤ 2e13 and the mod-1000003 residue times the Knuth
    * multiplier ≤ 2.7e15 — no ANSI overflow, NOTES rule 8).
    */
  private def bucketsSql(codes: String, m: Int): String = {
    val uni = s"transform($codes, c -> (c * 2654435761) % 1000003 % $m)"
    val bi = s"transform(sequence(0, size($codes) - 2), i -> " +
      s"((($codes[i] * 131071 + $codes[i + 1]) % 1000003) " +
      s"* 2654435761) % 1000003 % $m)"
    s"concat($uni, CASE WHEN size($codes) >= 2 THEN $bi " +
      s"ELSE array() END)"
  }

  /** (doc, bucket, c) gram-bucket counts with multiplicity — the
    * sufficient statistics of everything below. One explode + one
    * map-side-combined aggregation.
    */
  def gramBuckets(docs: DataFrame, text: String, id: String,
                  m: Int = DefaultBuckets): DataFrame = {
    require(m >= 2, "bucket count must be >= 2")
    docs
      .select(col(id).as("doc"), Tok.tokens(col(text)).as("toks"))
      .select(col("doc"), expr(codesSql("toks")).as("codes"))
      .select(col("doc"), explode(expr(bucketsSql("codes", m))).as("bucket"))
      .groupBy("doc", "bucket").agg(count(lit(1)).as("c"))
  }

  /** The two hashed-gram multinomials side by side — per bucket, the
    * raw-corpus count and the target-subset count (target = rows
    * satisfying `targetPred`). ONE gram pass aggregates both measures
    * (never two corpus scans). ≤ m rows, BIGINT-exact.
    */
  def modelCounts(docs: DataFrame, text: String, id: String,
                  targetPred: Column,
                  m: Int = DefaultBuckets): DataFrame = {
    require(m >= 2, "bucket count must be >= 2")
    docs
      .select(targetPred.cast("int").as("is_t"),
        Tok.tokens(col(text)).as("toks"))
      .select(col("is_t"), expr(codesSql("toks")).as("codes"))
      .select(col("is_t"), explode(expr(bucketsSql("codes", m))).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_raw"),
        sum(col("is_t")).cast("long").as("n_target"))
  }

  /** The broadcastable λ table: per bucket, the milli-nat quantized
    * log-likelihood ratio of target vs raw under add-one smoothing.
    * Buckets never seen in the raw corpus are absent — a scored doc's
    * buckets are by construction a subset of the raw model's. The ln
    * calls and their combination order are spelled identically in the
    * DuckDB oracle, so the quantized integers agree across engines.
    */
  def lambdaTable(docs: DataFrame, text: String, id: String,
                  targetPred: Column,
                  m: Int = DefaultBuckets): DataFrame =
    lambdaFromCounts(modelCounts(docs, text, id, targetPred, m), m)

  /** λ from an already-materialized (bucket, n_raw, n_target) model —
    * the seam [[IncrementalDsir]] probes through: a maintained model
    * and a one-shot model produce the identical λ table because the
    * counts are identical integers.
    */
  def lambdaFromCounts(counts: DataFrame,
                       m: Int = DefaultBuckets): DataFrame = {
    val totals = counts.agg(sum("n_raw").as("tr"), sum("n_target").as("tt"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_raw"), col("n_target"),
        expr(s"CAST(round($LambdaScale * (ln(n_target + 1) - ln(tt + $m) " +
          s"- ln(n_raw + 1) + ln(tr + $m))) AS BIGINT)").as("lam"))
  }

  /** Score a document frame against a GIVEN λ table (broadcast,
    * one (doc, bucket) aggregation) — the shared tail of
    * [[logWeights]] and the incremental probe. Grams hashing to
    * buckets ABSENT from the model (possible when scoring docs the
    * model never folded) take `unseenLam` — pass
    * [[unseenLambda]](tr, tt, m) for the smoothed both-counts-zero
    * log-ratio; the default 0 is exact whenever the scored docs are a
    * subset of the modeled corpus (every bucket then exists).
    */
  def scoreAgainst(lam: DataFrame, docs: DataFrame, text: String,
                   id: String, m: Int = DefaultBuckets,
                   unseenLam: Column = lit(0L)): DataFrame =
    gramBuckets(docs, text, id, m)
      .join(broadcast(lam.select("bucket", "lam")), Seq("bucket"), "left")
      .withColumn("lam_eff", coalesce(col("lam"), unseenLam))
      .groupBy("doc")
      .agg(sum("c").as("gram_n"),
        sum(col("c") * col("lam_eff")).as("score_mn"))
      .select(col("doc").as(id), col("gram_n"), col("score_mn"))

  /** The λ of a bucket with zero target AND zero raw count —
    * `round(S·(ln(tr+m) − ln(tt+m)))` — the smoothed default for
    * scoring unseen grams through [[scoreAgainst]].
    */
  def unseenLambda(tr: Long, tt: Long, m: Int = DefaultBuckets): Long =
    math.round(LambdaScale * (math.log(tr.toDouble + m) -
      math.log(tt.toDouble + m)))

  /** Per-document importance weights in milli-nats:
    * `score_mn = Σ_b c_b·λ_b` plus the gram count. BIGINT-exact end
    * to end (see the object doc) — the full-hash-oracle face of DSIR.
    */
  def logWeights(docs: DataFrame, text: String, id: String,
                 targetPred: Column,
                 m: Int = DefaultBuckets): DataFrame =
    scoreAgainst(lambdaTable(docs, text, id, targetPred, m),
      docs, text, id, m)

  /** Deterministic top-k selection by importance weight (score desc,
    * id asc — the tie-break makes the cut reproducible and
    * oracle-checkable). TakeOrdered, never a global sort.
    */
  def select(docs: DataFrame, text: String, id: String,
             targetPred: Column, k: Int,
             m: Int = DefaultBuckets): DataFrame = {
    require(k >= 1, "k must be >= 1")
    logWeights(docs, text, id, targetPred, m)
      .orderBy(desc("score_mn"), col(id)).limit(k)
  }

  /** The paper-faithful GUMBEL top-k resample: add `g_i = −ln(−ln u_i)`
    * to each weight (in nats) with `u_i` a seeded per-doc hash uniform,
    * then take the k largest — sampling WITHOUT replacement
    * proportional to the softmax of the weights. Deterministic given
    * `seed`, but float-ordered (hash-uniform → double logs), so this
    * face is unit-pinned rather than oracle-hashed; [[select]] is the
    * oracle-exact deterministic variant.
    */
  def gumbelSelect(docs: DataFrame, text: String, id: String,
                   targetPred: Column, k: Int, seed: Long,
                   m: Int = DefaultBuckets): DataFrame = {
    require(k >= 1, "k must be >= 1")
    logWeights(docs, text, id, targetPred, m)
      // 53-bit hash mantissa → u in (0, 1): (h >>> 11 + 0.5) / 2^53
      .withColumn("u", expr(
        s"(CAST(shiftrightunsigned(xxhash64($id, ${seed}L), 11) AS DOUBLE) " +
          s"+ 0.5) / 9007199254740992.0D"))
      .withColumn("gumbel_key",
        col("score_mn") / lit(LambdaScale.toDouble) - log(-log(col("u"))))
      .orderBy(desc("gumbel_key"), col(id)).limit(k)
      .drop("u")
  }
}
