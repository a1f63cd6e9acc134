package graft.op

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed descriptive statistics built for oracle-exact
  * cross-engine parity: every aggregate that feeds a float result is
  * first accumulated as an exact DECIMAL sum (associative, order
  * independent), and the float arithmetic happens once, on the driver's
  * fixed expression tree, after aggregation. `corr()`/`covar_samp()`
  * built-ins are NOT used on purpose — their double accumulators are
  * reduction-order dependent, so two runs (or two engines) can disagree
  * in the last bits; the moment-sum formulation is bit-reproducible.
  */
object Stats {

  /** Grouped Pearson correlation + OLS slope/intercept of `y` on `x`
    * from decimal-exact moment sums (n, Σx, Σy, Σxy, Σx², Σy²).
    *
    * Scale shape: ONE partial-aggregated shuffle on the group key — the
    * six moments ride the same aggregation, so cost is identical to a
    * plain groupBy/sum no matter how many statistics are derived.
    * Inputs are cast to DECIMAL(18,2) (exact for currency-style data);
    * products are DECIMAL(37,4) and their sums stay within DECIMAL(38,4)
    * up to ~10^18 of accumulated product mass — overflow fails loudly
    * under ANSI rather than silently losing precision.
    */
  def corrStats(df: DataFrame, group: String, x: String, y: String): DataFrame = {
    val dx = col(x).cast("decimal(18,2)")
    val dy = col(y).cast("decimal(18,2)")
    val m = df.groupBy(group).agg(
      count(lit(1)).as("n"),
      sum(dx).as("_sx"), sum(dy).as("_sy"),
      sum(dx * dy).as("_sxy"), sum(dx * dx).as("_sxx"), sum(dy * dy).as("_syy"))
    // all-double from here: the decimal→double casts and this exact
    // expression tree are mirrored verbatim by the DuckDB oracle, so
    // the doubles are bit-identical across engines
    val nD = col("n").cast("double")
    val sx = col("_sx").cast("double"); val sy = col("_sy").cast("double")
    val sxy = col("_sxy").cast("double"); val sxx = col("_sxx").cast("double")
    val syy = col("_syy").cast("double")
    val covN = nD * sxy - sx * sy // n² · cov(x,y)
    val varXN = nD * sxx - sx * sx // n² · var(x)
    val varYN = nD * syy - sy * sy
    // ANSI mode turns double 0/0 into a runtime error, so the IEEE
    // "degenerate group → NaN" contract needs an explicit branch: a
    // constant x (or y) zeroes the variance term and the statistic is
    // undefined, never a crash and never a fake 0.
    val nan = lit(Double.NaN)
    val slope = when(varXN === 0d, nan).otherwise(covN / varXN)
    m.select(col(group), col("n"),
      round(when(varXN * varYN === 0d, nan)
        .otherwise(covN / sqrt(varXN * varYN)), 6).as("corr"),
      round(slope, 6).as("slope"),
      round((sy - slope * sx) / nD, 6).as("intercept"))
  }

  /** Fixed-width histogram of `valueCol`: bucket i covers
    * [i·width, (i+1)·width). One partial-aggregated shuffle keyed on the
    * bucket — the output is O(buckets) rows regardless of input size.
    * The bucket id is floor(value / width) in double arithmetic, which
    * every IEEE engine computes identically.
    */
  def fixedWidthHistogram(df: DataFrame, valueCol: String,
                          width: Double): DataFrame = {
    require(width > 0, "width must be positive")
    df.groupBy(floor(col(valueCol) / lit(width)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }

  /** Per-row z-score standardization within each group — the feature
    * normalization step of a training pipeline. Group mean/std come
    * from the same decimal-exact moment sums as [[corrStats]] (sample
    * variance, n−1); the per-group moment table is tiny and BROADCAST
    * back onto the rows, so the corpus pays one aggregation shuffle and
    * one map-side join — it never re-shuffles on the group key.
    * Degenerate groups (n = 1 or constant x) produce NaN, matching
    * IEEE semantics in any engine.
    */
  def zscores(df: DataFrame, group: String, x: String,
              out: String = "z"): DataFrame = {
    val dx = col(x).cast("decimal(18,2)")
    val m = df.groupBy(group).agg(
      count(lit(1)).as("_n"), sum(dx).as("_sx"), sum(dx * dx).as("_sxx"))
    val mm = m.select(col(group), col("_n").cast("double").as("_nd"),
      col("_sx").cast("double").as("_sxd"),
      col("_sxx").cast("double").as("_sxxd"))
    // n² · var(x); zero for single-row and constant-x groups. ANSI mode
    // errors on double 0/0, so the NaN contract is an explicit branch.
    val varN = col("_nd") * col("_sxxd") - col("_sxd") * col("_sxd")
    df.join(broadcast(mm), Seq(group))
      .withColumn(out, round(
        when(col("_nd") <= 1d || varN === 0d, lit(Double.NaN)).otherwise(
          (col(x) - col("_sxd") / col("_nd")) /
            sqrt(varN / (col("_nd") * (col("_nd") - 1)))), 6))
      .drop("_nd", "_sxd", "_sxxd")
  }

  /** Winsorization: clamp `x` to its group's [lo, hi] quantiles — the
    * outlier-capping cleaner that keeps heavy tails from dominating
    * downstream statistics. Thresholds are ONE exact-percentile
    * aggregate (rounded to 6 dp so both engines pin identical clamp
    * values) broadcast back over the rows — same one-shuffle shape as
    * [[zscores]] and TextAnalysis.qualityFilter.
    */
  def winsorize(df: DataFrame, group: String, x: String,
                lo: Double = 0.05, hi: Double = 0.95,
                out: String = "winsorized"): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "need 0 <= lo < hi <= 1")
    val thr = df.groupBy(group).agg(
      round(expr(s"percentile($x, ${lo}D)"), 6).as("_plo"),
      round(expr(s"percentile($x, ${hi}D)"), 6).as("_phi"))
    df.join(broadcast(thr), Seq(group))
      .withColumn(out, least(greatest(col(x), col("_plo")), col("_phi")))
      .drop("_plo", "_phi")
  }

  /** Rolling window aggregate: per partition-key group, ordered by
    * `order` (which must be a total order within the group), the sum /
    * count / mean of `valueCol` over the trailing `window` rows. The sum
    * accumulates as DECIMAL(18,2) — exact and frame-order independent —
    * and only the final mean divides in double.
    *
    * Scale shape: one hash shuffle on the partition keys, then a local
    * sort per partition — never a global sort, never a single-partition
    * window.
    */
  def rollingAgg(df: DataFrame, part: Seq[String], order: Seq[String],
                 valueCol: String, window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(part.nonEmpty, "rollingAgg needs partition keys — an empty " +
      "partitionBy funnels the whole input through one task")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(part.map(col): _*).orderBy(order.map(col): _*)
      .rowsBetween(-(window - 1), 0)
    df.withColumn("roll_sum",
        sum(col(valueCol).cast("decimal(18,2)")).over(w).cast("double"))
      .withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_avg", round(col("roll_sum") / col("roll_n"), 6))
  }
}
