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
}
