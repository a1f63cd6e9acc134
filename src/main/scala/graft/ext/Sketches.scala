package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates for corpus-scale profiling —
  * one pass, bounded memory, mergeable across partitions (all are
  * Spark-built-in sketch aggregates: HLL++, Greenwald-Khanna quantiles,
  * count-min). At 100 TB these replace exact distinct/percentile jobs
  * whose shuffles would dominate; relative error is a parameter.
  */
object Sketches {

  /** Per-column approximate distinct counts (HyperLogLog++). */
  def distinctCounts(df: DataFrame, cols: Seq[String],
                     rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "distinctCounts needs at least one column")
    df.agg(
      approx_count_distinct(col(cols.head), rsd).as(s"${cols.head}_distinct"),
      cols.tail.map(c => approx_count_distinct(col(c), rsd).as(s"${c}_distinct")): _*)
  }

  /** Approximate quantiles of a numeric column (GK sketch). */
  def quantiles(df: DataFrame, c: String,
                probs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95, 0.99),
                accuracy: Int = 10000): DataFrame =
    df.agg(percentile_approx(col(c),
      array(probs.map(lit): _*), lit(accuracy)).as(s"${c}_quantiles"))

  /** Count-min sketch of a column, returned as its binary encoding —
    * mergeable across corpus shards; query point frequencies with the
    * CountMinSketch API after `CountMinSketch.readFrom(bytes)`.
    */
  def countMin(df: DataFrame, c: String, eps: Double = 0.001,
               confidence: Double = 0.99, seed: Int = 42): DataFrame =
    df.agg(count_min_sketch(col(c), lit(eps), lit(confidence), lit(seed))
      .as(s"${c}_cms"))

  /** The engine-portable token code shared with the portable simhash
    * family (`ascii(first char) · 131 + length` — every operation has
    * identical semantics in DuckDB), as a SQL fragment over token
    * column `t`. Weak by design: a VERIFICATION hash that an
    * independent engine can recompute; production sketches use the
    * built-in xxhash64/CMS forms above.
    */
  val tokCodeSql: String =
    "CAST(ascii(substring(t, 1, 1)) * 131 + length(t) AS BIGINT)"

  /** Row-d CMS bucket for token code `c`: the simhash multiplier
    * family `(c · ((2d+3)·65537)) % 1000003 % width`. */
  def cmsBucketSql(d: String, width: Int): String =
    s"(c * ((2 * $d + 3) * 65537)) % 1000003 % $width"

  /** Explicit-cell count-min sketch with an EXACT oracle: token
    * frequencies estimated from a depth × width integer cell matrix
    * built with the portable hash family, reported next to the exact
    * counts for the top-k terms. est ≥ true always (CMS never
    * underestimates); the overestimate column makes hash collisions
    * visible instead of silently absorbed — the audit discipline the
    * binary `count_min_sketch` aggregate can't offer an oracle for.
    *
    * Scale shape: one map-side explode to (d, bucket) cells (depth
    * rows per token), one aggregation to depth·width cells — O(1)
    * output — then the probe side joins the broadcast cell matrix.
    * Everything is associative integer arithmetic: any partitioning
    * yields identical cells.
    */
  def cmsTermCounts(docs: DataFrame, text: String, depth: Int = 4,
                    width: Int = 64, topK: Int = 50): DataFrame = {
    require(depth >= 1 && width >= 1 && topK >= 1)
    // toks feeds BOTH the cell matrix and the true-count top-k —
    // persist or the corpus tokenizes twice (the sparseCosinePairs
    // shared-frame discipline)
    val toks = docs.select(explode(Tok.tokens(col(text))).as("t"))
      .withColumn("c", expr(tokCodeSql))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Both consumers are tiny (depth·width cells; topK rows) —
    // materialize them eagerly into their own (clearCache-evictable)
    // persists and release the corpus-sized token cache HERE, so a
    // long-lived session/bench loop doesn't leak it. persist, NOT
    // localCheckpoint: clearCache() cannot evict checkpoint blocks.
    val cells = toks
      .select(explode(expr(s"transform(sequence(0, ${depth - 1}), d -> " +
        s"struct(d AS d, ${cmsBucketSql("d", width)} AS b))")).as("db"))
      .groupBy(col("db.d").as("d"), col("db.b").as("b"))
      .agg(count(lit(1)).as("cell_n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val top = toks.groupBy("t").agg(count(lit(1)).as("true_n"))
      .orderBy(desc("true_n"), col("t")).limit(topK)
      .withColumn("c", expr(tokCodeSql))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cells.count(); top.count()
    toks.unpersist()
    top
      .select(col("t").as("term"), col("true_n"),
        explode(expr(s"transform(sequence(0, ${depth - 1}), d -> " +
          s"struct(d AS d, ${cmsBucketSql("d", width)} AS b))")).as("db"))
      .join(broadcast(cells),
        col("db.d") === col("d") && col("db.b") === col("b"))
      .groupBy("term", "true_n")
      .agg(min(col("cell_n")).as("est_n"))
      .withColumn("over_n", col("est_n") - col("true_n"))
  }

  /** Feature hashing (the hashing trick): each document becomes a
    * sparse integer vector of `width` buckets — the fixed-dimension,
    * vocabulary-free text featurization linear models train on. The
    * bucket map rides the same portable code (mixed by the Knuth
    * multiplier so adjacent codes spread), so the oracle recomputes
    * features bit-for-bit. Pure map-side + one (doc, bucket)
    * aggregation.
    */
  def featureHash(docs: DataFrame, text: String, id: String,
                  width: Int = 64): DataFrame = {
    require(width >= 1)
    docs.select(col(id).as("doc"), explode(Tok.tokens(col(text))).as("t"))
      .withColumn("c", expr(tokCodeSql))
      .withColumn("bucket", expr(s"(c * 2654435761) % 1000003 % $width"))
      .groupBy("doc", "bucket").agg(count(lit(1)).as("n"))
  }

  /** Fixed-grid EXACT quantiles — the oracle-verifiable sibling of the
    * approximate percentile profile (the CMS move applied to
    * quantiles): values quantize to `grid`-sized cells, one bounded
    * cell-count aggregation + a per-group cumulative pass, and the
    * q-quantile is the first cell whose cumulative count covers
    * ⌈n·q/100⌉ — reported as the cell's lower bound. Grid-rounded by
    * construction (resolution = `grid`), but every arithmetic step is
    * associative integer math an independent engine recomputes
    * bit-identically, which the GK/percentile_approx sketches can
    * never offer.
    *
    * Scale shape: the heavy pass is ONE partial-aggregated groupBy to
    * O(groups · cells) rows — map-side combine does the compression,
    * nothing corpus-sized shuffles; the window runs over the tiny cell
    * frame. The coverage test `100·cum ≥ n·q` stays in BIGINT (no
    * ceil, no division), exact for any n up to 2⁶³/100.
    */
  def gridQuantiles(docs: DataFrame, valueCol: String, groupCol: String,
                    grid: Long = 64L,
                    qs: Seq[Int] = Seq(50, 90, 95, 99)): DataFrame = {
    require(grid >= 1, "grid must be >= 1")
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100),
      "quantiles are integer percents in [1,100]")
    // FLOOR division in exact integer arithmetic (DIV truncates toward
    // zero; subtracting the non-negative pmod first makes it floor —
    // never `/`, which is double division and corrupts large longs)
    val cells = docs
      .select(col(groupCol).as("grp"),
        expr(s"(CAST($valueCol AS BIGINT) - " +
          s"pmod(CAST($valueCol AS BIGINT), ${grid}L)) DIV ${grid}L")
          .as("cell"))
      .groupBy("grp", "cell").agg(count(lit(1)).as("cell_n"))
    val cum = cells.withColumn("cum",
      sum(col("cell_n")).over(org.apache.spark.sql.expressions.Window
        .partitionBy("grp").orderBy("cell")))
      .withColumn("n",
        sum(col("cell_n")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("grp")))
    cum.groupBy("grp")
      .agg(max(col("n")).as("n"),
        qs.map(q => min(when(col("cum") * 100 >= col("n") * q,
          col("cell") * grid)).as(s"p${q}_lo")): _*)
      .select(col("grp").as(groupCol) +: col("n") +:
        qs.map(q => col(s"p${q}_lo")): _*)
  }

  /** One-call corpus profile: row count, distinct docs/langs/sources,
    * char-length quantiles — the summary a curation run logs per shard.
    * Quantiles come back as scalar columns (p50/p95), not an array, so
    * the result is flat and sortable by any downstream consumer.
    */
  def corpusProfile(docs: DataFrame): DataFrame = {
    val qs = percentile_approx(col("n_chars"), array(lit(0.5), lit(0.95)),
      lit(10000))
    docs.agg(
      count(lit(1)).as("n_docs"),
      approx_count_distinct(col("text"), 0.02).as("approx_distinct_texts"),
      approx_count_distinct(col("lang"), 0.02).as("approx_langs"),
      approx_count_distinct(col("source"), 0.02).as("approx_sources"),
      qs.getItem(0).as("n_chars_p50"),
      qs.getItem(1).as("n_chars_p95"))
  }

  /** Sketch-drift audit: per group, the HLL++ estimate of
    * `COUNT(DISTINCT valueCol)` is checked against the exact count in
    * ONE pass (both aggregates partial — no second scan), and the
    * verdict `within_bound` = |approx − exact| ≤ boundRsd·exact is
    * emitted next to the exact count. The estimate itself is engine-
    * specific and deliberately NOT in the output: an oracle recomputes
    * the exact count and asserts the verdict is uniformly TRUE, which
    * pins the sketch's error envelope without demanding bit-parity of
    * the sketch. HLL++ is deterministic for fixed input (hash-based,
    * no RNG), so the verdict is stable run-to-run; `boundRsd` defaults
    * to 3× the requested rsd — a ≥3σ envelope a healthy implementation
    * never leaves.
    */
  def distinctErrorAudit(df: DataFrame, valueCol: String, groupCol: String,
                         rsd: Double = 0.05,
                         boundRsd: Double = 0.15): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count_distinct(col(valueCol)).as("exact_distinct"),
        approx_count_distinct(col(valueCol), rsd).as("_approx"))
      .select(col(groupCol),
        col("exact_distinct"),
        (abs(col("_approx") - col("exact_distinct"))
          <= lit(boundRsd) * col("exact_distinct")).as("within_bound"))
}
