package graft.op

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale utilities: the shuffle-shaping tools a 100 TB deployment needs
  * around the core operators — skew-salted joins and bucketed tables for
  * co-located (shuffle-free) repeat joins.
  */
object Scale {

  /** Salted inner equi-join for skewed keys.
    *
    * When a handful of hot keys dominate (`left` skewed), a plain hash
    * join puts an entire hot key in one task. Salting splits each left
    * row into one of `saltFactor` sub-keys and replicates the right side
    * across all of them, so a hot key fans out over `saltFactor` tasks.
    * AQE's skew-join handles moderate skew automatically; explicit
    * salting is for the pathological keys AQE can't split (e.g. a single
    * key bigger than an executor).
    *
    * Use for the skewed-fact ⋈ dimension shape; `right` is replicated
    * `saltFactor`× (keep it the smaller side).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 1)
    val salted = left.withColumn("_salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltFactor)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Key-distribution probe: rows per key for the top-n keys plus the
    * skew ratio (max / mean). Cheap (one aggregation) — run it before
    * choosing between plain, AQE, and salted joins.
    */
  def skewReport(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(key).agg(count(lit(1)).as("rows"))
    val stats = counts.agg(avg("rows").as("mean_rows")).crossJoin(
      counts.orderBy(col("rows").desc).limit(topN))
    stats.withColumn("skew_ratio", col("rows") / col("mean_rows"))
      .select(col(key), col("rows"), round(col("skew_ratio"), 2).as("skew_ratio"))
      .orderBy(col("rows").desc)
  }

  /** Write a bucketed + sorted managed table. Two tables bucketed the
    * same way on the join key co-locate: repeated joins between them are
    * planned with zero shuffle (SortMergeJoin over pre-bucketed scans).
    * This is the storage-level answer for the fact tables the price/
    * merge pipelines re-join every day.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Repartition by key with an explicit partition count — reuse one
    * partitioning across several stages (aggregate + join on the same
    * key) instead of letting each stage shuffle independently.
    */
  def partitionByKey(df: DataFrame, key: String, partitions: Int): DataFrame =
    df.repartition(partitions, col(key))
}
