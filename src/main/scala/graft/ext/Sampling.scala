package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and mixture weighting for training-data
  * assembly.
  *
  * Both operators are pure map-side column expressions — zero shuffles,
  * zero RNG state — because the keep/repeat decision is a deterministic
  * function of the row's key: the identical sample comes out of every
  * run, every engine, every partition layout. That is what makes a
  * 100 TB corpus sample reproducible (and oracle-checkable), where
  * `df.sample()` / `rand()` is not.
  */
object Sampling {

  /** Key hash → bucket in [0, 1000): Knuth multiplicative hash on the
    * numeric key — the same engine-portable integer arithmetic family
    * as PriceGen (any ANSI engine computes the identical bucket).
    * The key is reduced mod 1e9+7 BEFORE the multiply so the product
    * stays below 2^63 for 64-bit ids — an unreduced multiply overflows
    * at keys ≥ ~3.5e9, which ANSI mode turns into a runtime crash.
    * String business keys: map through a numeric surrogate first
    * (`PriceGen.keyAsNumeric`). Keys are assumed non-negative (SQL `%`
    * of a negative differs from pmod across engines).
    */
  def bucket1000(key: Column): Column =
    pmod(pmod(key, lit(1000000007L)) * lit(2654435761L), lit(1000L))

  /** Stratified deterministic sampling: keep `fractions(stratum)` of
    * each stratum (thousandth resolution), decided per row by the key
    * bucket. Strata absent from the map keep `defaultFraction`.
    */
  def stratifiedSample(df: DataFrame, stratum: String, key: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 1.0): DataFrame = {
    require((fractions.values.toSeq :+ defaultFraction)
      .forall(f => f >= 0.0 && f <= 1.0), "fractions in [0, 1]")
    // integer thresholds: frac * 1000.0 in double drifts (0.07 * 1000 =
    // 70.000…01 keeps one extra bucket); round once on the driver and
    // compare long-to-long, which any engine reproduces exactly
    val cut = fractions.foldLeft(lit(math.round(defaultFraction * 1000))) {
      case (acc, (s, f)) =>
        when(col(stratum) === s, lit(math.round(f * 1000))).otherwise(acc)
    }
    df.filter(bucket1000(col(key)) < cut)
  }

  /** Deterministic Poisson bootstrap: `replicates` resamples of the
    * corpus where each row's multiplicity in replicate r is drawn from
    * Poisson(1) quantized to thousandths — P(k)=368,368,184,61,15,4 for
    * k=0..5 — selected by the (key, replicate) hash bucket instead of
    * rand(), so every engine and every rerun produces the identical
    * resample. Emits one row per replicate: effective row count and
    * the replicate mean of `metric` (exact integer sum, one division,
    * rounded) — the spread across replicates IS the uncertainty of the
    * corpus statistic, computed without any driver-side loop.
    *
    * Scale shape: the replicate fan-out is a map-side
    * explode(sequence), and the per-replicate aggregate partial-
    * aggregates, so the exchange carries `replicates` rows per map
    * task. `metric` must be integer-valued (exact sums); keys
    * non-negative integral ([[bucket1000]] contract).
    */
  def poissonBootstrap(df: DataFrame, key: String, metric: String,
                       replicates: Int = 20): DataFrame = {
    require(replicates >= 1 && replicates <= 1000, "replicates in [1, 1000]")
    // multiplicative replicate mixing: an ADDITIVE offset (key' + c·r)
    // collapses to one constant bucket shift per replicate — on a
    // key set that fills buckets evenly every replicate then draws the
    // identical n_eff (caught by the spec); scaling by (r + 1) gives
    // each replicate a different affine map over the key space
    val mixed = pmod(
      pmod(col(key), lit(1000000007L)) * (col("rep") + lit(1))
        + col("rep") * lit(7919L), lit(1000000007L))
    val bkt = bucket1000(mixed)
    // cumulative thousandths of the Poisson(1) pmf, k = 0..5
    val mult = when(bkt < 368, 0L).when(bkt < 736, 1L).when(bkt < 920, 2L)
      .when(bkt < 981, 3L).when(bkt < 996, 4L).otherwise(5L)
    df.select(col(key), col(metric).cast("long").as("_m"),
        explode(expr(s"sequence(1, $replicates)")).as("rep"))
      .withColumn("_mult", mult)
      .groupBy("rep")
      .agg(sum(col("_mult")).as("n_eff"),
        sum(col("_mult") * col("_m")).as("_sum"))
      .withColumn("mean_metric",
        round(col("_sum").cast("double") / col("n_eff"), 6))
      // rep is INT from sequence(); emit BIGINT to match any engine's
      // generate_series
      .select(col("rep").cast("long").as("rep"), col("n_eff"),
        col("mean_metric"))
  }

  /** Grouped (block/cluster) bootstrap: resample GROUPS, not rows —
    * the honest uncertainty estimate when rows within a group are
    * correlated (documents within a domain, events within a user).
    * Row-level resampling ([[poissonBootstrap]]) treats correlated
    * rows as independent and understates the variance; here each
    * replicate draws a Poisson(1) multiplicity PER GROUP (same
    * quantized pmf and multiplicative replicate mixing as
    * poissonBootstrap — the additive-mix collapse lesson applies
    * identically) and weights the group's exact sums by it.
    *
    * Scale shape: group sums aggregate once (one partial-agg shuffle,
    * exact BIGINT); the replicate fan-out then explodes the G-row
    * group frame — G·replicates rows, NOT rows·replicates, so this is
    * CHEAPER than the row bootstrap at any corpus size. `groupKey`
    * must be a non-negative integral expression (string groups map
    * through a numeric surrogate — the [[bucket1000]] contract);
    * `metric` integer-valued. A replicate that draws zero groups
    * yields NaN mean (0/0 in double — pinned IEEE semantics both
    * engines); with G ≥ 20 groups that is a ~1e-9 event.
    */
  def groupedBootstrap(df: DataFrame, groupKey: Column, metric: String,
                       replicates: Int = 20): DataFrame = {
    require(replicates >= 1 && replicates <= 1000, "replicates in [1, 1000]")
    val per = df.groupBy(groupKey.as("grp"))
      .agg(sum(col(metric).cast("long")).as("_s"), count(lit(1)).as("_n"))
    val mixed = pmod(
      pmod(col("grp"), lit(1000000007L)) * (col("rep") + lit(1))
        + col("rep") * lit(7919L), lit(1000000007L))
    val bkt = bucket1000(mixed)
    val mult = when(bkt < 368, 0L).when(bkt < 736, 1L).when(bkt < 920, 2L)
      .when(bkt < 981, 3L).when(bkt < 996, 4L).otherwise(5L)
    per.select(col("grp"), col("_s"), col("_n"),
        explode(expr(s"sequence(1, $replicates)")).as("rep"))
      .withColumn("_mult", mult)
      .groupBy("rep")
      .agg(sum(col("_mult")).as("g_eff"),
        sum(col("_mult") * col("_n")).as("n_eff"),
        sum(col("_mult") * col("_s")).as("_sum"))
      .withColumn("mean_metric",
        round(col("_sum").cast("double") / col("n_eff"), 6))
      .select(col("rep").cast("long").as("rep"), col("g_eff"),
        col("n_eff"), col("mean_metric"))
  }

  /** Continuous-weight deterministic Bernoulli sampling — the
    * importance-sampling primitive behind quality-weighted data mixing:
    * keep each row with probability `weight` (a per-row column in
    * [0, 1]), decided by the row's own key bucket, never by rand().
    * The weight is converted to a permille threshold by ONE
    * round-half-up per row (exact on any ANSI engine — callers mirror
    * the same expression text in an oracle), so keep decisions are
    * integer comparisons: rerun-, partitioning- and engine-stable,
    * zero shuffle. The fixed-rate-per-stratum special case is
    * [[stratifiedSample]]; keys must be non-negative integral
    * ([[bucket1000]] contract).
    *
    * NULL-weight contract: a NULL weight makes the `<` comparison
    * NULL, which `filter` treats as false — the row is DROPPED. This
    * is deliberate (identical to SQL `WHERE` semantics, so the DuckDB
    * twin agrees), but it means NULL weights vanish silently; callers
    * who want a loud failure should `coalesce` or `assert_true` the
    * weight expression before passing it in.
    */
  def weightedSample(df: DataFrame, key: String, weight: Column): DataFrame =
    df.filter(bucket1000(col(key)) <
      round(weight * lit(1000.0)).cast("long"))

  /** Inverse-sqrt temperature mixing (the standard α = 0.5 rule from
    * multilingual/multi-corpus training recipes): each group g is kept
    * at rate sqrt(n_min / n_g), where n_min is the smallest group's
    * row count — the smallest group survives whole, a group 4× its
    * size is halved, 100× its size keeps one row in ten. This flattens
    * group imbalance toward (but not all the way to) uniform, which is
    * exactly what α = 0.5 temperature sampling does to the multinomial
    * source weights. α is pinned at 0.5 because sqrt is a
    * correctly-rounded IEEE primitive on every engine — the general
    * pow(x, α−1) is NOT, so only this exponent yields an
    * oracle-matchable (and engine-portable) threshold.
    *
    * The keep decision is [[bucket1000]] of the row's own key vs the
    * group's permille cut — map-side, rerun- and partition-stable; the
    * cut chain (exact-BIGINT division → sqrt → ×1000 → floor) is one
    * correctly-rounded double expression any engine reproduces bit-
    * identically. Returns kept rows plus the group's `rate_permille`.
    *
    * Scale shape: one partial-agg shuffle for the group counts, a
    * one-row min, then a BROADCAST of the group→cut table back onto
    * the corpus — the dimension-table contract: group cardinality must
    * be dimension-sized (languages, sources, domains up to ~millions),
    * never row-unique. Keys non-negative integral ([[bucket1000]]).
    *
    * NULL-group contract (the [[weightedSample]] discipline): rows
    * with a NULL group never match the equi-join back onto the cut
    * table (SQL NULL ≠ NULL) and are DROPPED — identical semantics on
    * any engine. Callers who want unlabeled rows kept should coalesce
    * the group to a sentinel first; the sentinel then competes as its
    * own group, which is usually what "unknown source" should mean.
    * (A NULL group does still count toward n_min — a tiny unlabeled
    * group would raise every rate; coalesce first if that matters.)
    */
  def temperatureSample(df: DataFrame, group: String,
                        key: String): DataFrame = {
    val counts = df.groupBy(col(group)).agg(count(lit(1)).as("_n"))
    val nmin = counts.agg(min(col("_n")).as("_nmin"))
    val cuts = counts.crossJoin(broadcast(nmin))
      .withColumn("rate_permille",
        floor(sqrt(col("_nmin").cast("double") / col("_n").cast("double"))
          * lit(1000.0)).cast("long"))
      .select(col(group), col("rate_permille"))
    df.join(broadcast(cuts), Seq(group))
      .filter(bucket1000(col(key)) < col("rate_permille"))
  }

  /** Deterministic train/val/test assignment — the split column every
    * training pipeline stamps before anything else. Decided per row by
    * the [[bucket1000]] of `key`: bucket < testPermille → "test", next
    * valPermille buckets → "val", rest → "train". A pure function of
    * the key: map-side, zero shuffle, stable under re-partitioning,
    * re-runs, and engine changes — a document can never migrate between
    * splits when the corpus grows, because membership depends only on
    * its own key. Keys must be non-negative (see [[bucket1000]]).
    */
  def trainValTestSplit(df: DataFrame, key: String,
                        valPermille: Int = 50, testPermille: Int = 50,
                        out: String = "split"): DataFrame = {
    require(valPermille >= 0 && testPermille >= 0 &&
      valPermille + testPermille <= 1000, "permilles in [0, 1000]")
    val b = bucket1000(col(key))
    df.withColumn(out,
      when(b < testPermille, lit("test"))
        .when(b < testPermille + valPermille, lit("val"))
        .otherwise(lit("train")))
  }

  /** Exact-k deterministic sample per stratum: within each stratum keep
    * the `k` rows that sort first by (key-hash, key) — a fixed-SIZE
    * counterpart to [[stratifiedSample]]'s fixed-RATE keep, for "give me
    * exactly 10k eval docs per language" requests. The hash order is a
    * uniform pseudo-random permutation, but a deterministic one: the
    * same k rows come out of every run and every engine.
    *
    * Scale shape: one rank window per stratum, planned as
    * WindowGroupLimit — each map task pre-prunes to its local top-k
    * before the shuffle, so the exchange carries O(partitions × k) rows
    * per stratum, not the corpus.
    *
    * The key MUST be a non-negative integral column (the [[bucket1000]]
    * contract: the permutation is pmod arithmetic on the key). String
    * business keys go through a numeric surrogate first
    * (`PriceGen.keyAsNumeric`) — enforced here so the misuse fails at
    * call time with a clear message, not at analysis time.
    */
  def sampleExactK(df: DataFrame, stratum: String, key: String,
                   k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val kt = df.schema(key).dataType
    require(Seq("byte", "short", "int", "long", "integer", "bigint")
      .contains(kt.simpleString),
      s"sampleExactK key '$key' must be integral (got ${kt.simpleString}); " +
        "map string keys through a numeric surrogate (PriceGen.keyAsNumeric)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratum))
      .orderBy(pmod(pmod(col(key), lit(1000000007L)) * lit(2654435761L),
        lit(1000000007L)), col(key))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k).drop("_rk")
  }

  /** Per-group quota cap — "at most k documents per source/domain",
    * the standard anti-domination lever in web-corpus curation: without
    * it a handful of boilerplate-heavy domains swallow the token
    * budget. Unlike [[sampleExactK]] (unbiased hash-ordered pick) the
    * survivors here are the k BEST rows of each group under the
    * caller's `priority` ordering (quality score, length, recency...);
    * `key` breaks ties for a total order, so the survivor set is
    * deterministic under reruns and repartitioning.
    *
    * Scale shape: the rank-filter compiles to WindowGroupLimit, which
    * Spark applies on the MAP side before the shuffle — the exchange
    * carries at most k rows per group per input task, never the full
    * group, so a million-doc domain costs what a (k·tasks)-doc domain
    * costs. Asserted in PlanSpec.
    */
  def capPerGroup(df: DataFrame, group: String, k: Int,
                  priority: Seq[Column], key: String): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val tmp = Iterator.from(0).map(i => s"_qrn$i")
      .find(n => !df.columns.contains(n)).get
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group))
      .orderBy(priority :+ col(key).asc: _*)
    df.withColumn(tmp, row_number().over(w))
      .filter(col(tmp) <= k).drop(tmp)
  }

  /** Assemble a training mix under a GLOBAL token budget: split
    * `totalBudget` tokens across groups by inverse-sqrt temperature
    * weights, then fill each group's share with its documents in a
    * deterministic hash order. The "give me a 1B-token mix that
    * doesn't just mirror corpus imbalance" operator.
    *
    * Exactness chain (every step engine-portable):
    *   w_g   = floor(sqrt(T_g))        — one correctly-rounded sqrt of
    *           an exact BIGINT token total, floored back to BIGINT, so
    *           the cross-group SUM is associative integer math (a sum
    *           of raw double weights would be reduction-order
    *           dependent and could never hash-match);
    *   share_g = totalBudget·w_g div Σw — exact integer proration;
    *   fill  = hash-ordered cumulative token sum per group, keep while
    *           cum ≤ share_g (a doc larger than the remaining share is
    *           skipped with everything after it — the simple prefix
    *           rule, not best-fit, so the oracle is one window).
    *
    * sqrt(T) weighting is the α = 0.5 temperature rule applied to
    * token mass: a source with 100× the tokens gets 10× the budget,
    * not 100×. Returns kept docs with (group, key, tokens, cum_tokens,
    * share). Scale shape: one partial-agg shuffle to group totals
    * (dimension-sized, broadcast back), one window shuffle on the
    * group for the prefix fill — same shape as sequence packing.
    * Keys non-negative integral ([[bucket1000]]); token counts must
    * be exact integers. Magnitude contract (ANSI crashes loudly if
    * violated): totalBudget · floor(sqrt(max T_g)) must fit a long —
    * at 100 TB (T_g ≈ 2.5e13 tokens, w_g ≈ 5e6) budgets up to ~1.8
    * TRILLION tokens are safe.
    */
  def allocateTokenBudget(df: DataFrame, group: String, key: String,
                          tokens: String, totalBudget: Long): DataFrame = {
    require(totalBudget >= 0, "totalBudget must be >= 0")
    val totals = df.groupBy(col(group))
      .agg(sum(col(tokens)).cast("long").as("_tg"))
      .withColumn("_wg", floor(sqrt(col("_tg").cast("double"))).cast("long"))
    val wsum = totals.agg(sum(col("_wg")).cast("long").as("_wsum"))
    val shares = totals.crossJoin(broadcast(wsum))
      .withColumn("share",
        when(col("_wsum") > 0,
          expr(s"$totalBudget * _wg div _wsum")).otherwise(lit(0L)))
      .select(col(group), col("share"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group))
      .orderBy(bucket1000(col(key)), col(key))
    df.join(broadcast(shares), Seq(group))
      .withColumn("cum_tokens",
        sum(col(tokens).cast("long")).over(w))
      .filter(col("cum_tokens") <= col("share"))
  }

  /** Keep each group's top `permille`‰ of rows by the given ordering —
    * the RELATIVE per-group gate ("keep the best 60% of every source
    * by quality") that complements [[capPerGroup]]'s absolute count
    * cap: sources keep their best content proportionally, so a giant
    * source can't dominate the survivor pool just by having more rows
    * above a global threshold. The keep test is exact integer
    * arithmetic (rank·1000 ≤ permille·n_group) — no double ratio, no
    * engine divergence. The kept count is floor(permille·n/1000): a
    * singleton group at permille < 1000 keeps NOTHING (0.6 of one row
    * floors to zero) — callers who want small groups to survive whole
    * should cap with [[capPerGroup]] instead, or first route tiny
    * groups around the gate. Callers must pass a TOTAL ordering
    * (tie-break on a unique key) or survivors are partition-dependent.
    *
    * Scale shape: ONE window shuffle on the group; rank and group
    * count ride the same sorted partition (no WindowGroupLimit — the
    * cutoff depends on n_group, so every row must be seen; the
    * exchange carries the corpus once, same as any per-group rank).
    */
  def topFractionPerGroup(df: DataFrame, group: String, permille: Int,
                          order: Seq[Column]): DataFrame = {
    require(permille >= 0 && permille <= 1000, "permille in [0, 1000]")
    require(order.nonEmpty, "ordering required")
    val tmp = Iterator.from(0).map(i => s"_tfr$i")
      .find(n => !df.columns.contains(n) && !df.columns.contains(n + "c"))
      .get
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group)).orderBy(order: _*)
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group))
    df.withColumn(tmp, row_number().over(w))
      .withColumn(tmp + "c", count(lit(1)).over(wc))
      .filter(col(tmp) * lit(1000L) <= lit(permille.toLong) * col(tmp + "c"))
      .drop(tmp, tmp + "c")
  }

  /** Delete-one-group jackknife for a corpus mean — the one-pass
    * uncertainty estimate that complements [[poissonBootstrap]]: no
    * replicate fan-out, just `groups` deterministic key-hash buckets
    * (drop bucket g, how does the mean move?). Emits one row per
    * group: its exact BIGINT sum/count, the leave-one-out mean in
    * integer micro-units, and the jackknife standard error of the
    * corpus mean (same scalar on every row).
    *
    * Exactness contract (what makes this oracle-checkable where a
    * textbook double implementation is not): group sums are exact
    * BIGINT; the leave-one-out mean is ONE integer division to
    * micro-units (`(S−s_g)·1e6 div (N−n_g)`); the SE is computed from
    * exact BIGINT Σx/Σx² of those micro-means by a fixed chain of
    * correctly-rounded IEEE ops — every engine reproduces it bit-for-
    * bit. `metric` must be integer-valued (exact sums; same contract
    * as poissonBootstrap); keys non-negative ([[bucket1000]]).
    * Magnitude bound: `(S−s_g)·1e6` must fit a long ⇒ Σmetric < ~9e12.
    *
    * Scale shape: one partial-agg shuffle down to `groups` rows; the
    * totals and SE attach by broadcast-one-row joins. Nothing after
    * the first aggregate is corpus-sized.
    */
  def jackknifeMean(df: DataFrame, key: String, metric: Column,
                    groups: Int = 10): DataFrame = {
    require(groups >= 2, "jackknife needs >= 2 groups")
    val per = df
      .groupBy(pmod(bucket1000(col(key)), lit(groups.toLong)).as("grp"))
      .agg(sum(metric.cast("long")).as("s_g"), count(lit(1)).as("n_g"))
    val tot = per.agg(sum("s_g").as("s"), sum("n_g").as("n"))
    val loo = per.crossJoin(broadcast(tot))
      .withColumn("loo_mean_micro",
        expr("((s - s_g) * 1000000L) div (n - n_g)"))
    val sq = loo.agg(sum("loo_mean_micro").as("sx"),
      sum(expr("loo_mean_micro * loo_mean_micro")).as("sxx"),
      count(lit(1)).as("g"))
    loo.crossJoin(broadcast(sq))
      .withColumn("jk_se",
        round(sqrt((col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") / col("g")) *
            (col("g") - lit(1)) / col("g")) / lit(1000000.0), 6))
      .select("grp", "n_g", "s_g", "loo_mean_micro", "jk_se")
  }

  /** Integer-weighted corpus mixing — the deterministic upsampling step
    * of a training mixture: each row is repeated `weights(stratum)`
    * times (0 drops the stratum), with a `copy` ordinal so downstream
    * exact-dedup stages can tell intentional repetition from accidental
    * duplication. Explode of a generated sequence: map-side, no join.
    */
  def mixCorpus(df: DataFrame, stratum: String, weights: Map[String, Int],
                defaultWeight: Int = 1): DataFrame = {
    require((weights.values.toSeq :+ defaultWeight).forall(_ >= 0),
      "weights must be non-negative")
    val w = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (s, n)) => when(col(stratum) === s, lit(n)).otherwise(acc)
    }
    // sequence(1, 0) would infer step -1 and emit [1, 0] — guard the
    // zero-weight case to an empty array so those rows drop
    df.withColumn("copy",
      explode(when(w >= 1, sequence(lit(1), w))
        .otherwise(array().cast("array<integer>"))))
  }
}
