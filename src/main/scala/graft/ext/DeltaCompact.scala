package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Baseline compaction for the ASSOCIATIVE delta-state tables
  * ([[IncrementalSketch]] cells/vocab, [[IncrementalStats]] profiles):
  * a fold appends one LWW delta row per (key, batch), so state grows
  * O(keys · batches) — at a batch per hour that is the table's real
  * 100 TB failure mode, not row width. Compaction folds the whole
  * history into ONE baseline row per key (the sums are associative —
  * that is the fold family's admission test) and records a replay
  * WATERMARK so the delta/replay contract survives:
  *
  *  - baseline rows take `pk = "base:" + key` — disjoint from every
  *    live delta pk (both layouts lead with a numeric batchNo or a
  *    numeric key where "base" cannot appear), so a later fold's LWW
  *    merge never collides with the baseline.
  *  - the watermark (max folded `ver` at compaction time, stored as a
  *    one-row parquet at `dir + "_wm"`) turns a REPLAY of a compacted
  *    batch into a documented no-op in the folds: the batch's delta
  *    row no longer exists to be rewritten, so re-adding it would
  *    double-count — exactly the divergence the pk-per-batch LWW rule
  *    otherwise prevents. Batches at `ver <= watermark` are already
  *    inside the baseline by construction (checkpointed streams only
  *    redeliver the LAST committed batch, which the fold-then-compact
  *    ordering has already folded).
  *
  * Scale shape: one partial-aggregated groupBy over the (small) delta
  * table + a full-table overwrite of O(keys) rows; the corpus is
  * never touched.
  */
object DeltaCompact {

  val WatermarkSuffix = "_wm"

  private def exists(spark: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).exists(hp)
  }

  /** The replay watermark of a compacted table; None if never
    * compacted. Folds skip (no-op) any `batchNo <= watermark`.
    */
  def watermark(spark: SparkSession, dir: String): Option[Long] =
    if (exists(spark, dir + WatermarkSuffix))
      Some(spark.read.parquet(dir + WatermarkSuffix)
        .agg(max("wm")).head().getLong(0))
    else None

  /** Compact the delta table at `dir` to one baseline row per key.
    * `keyCols`/`sumCols` name the table's key and associative-sum
    * columns; `partExpr` recomputes the table's own partition column
    * from the key (each fold module passes its layout's expression).
    * Returns the recorded watermark.
    */
  def compact(spark: SparkSession, dir: String, keyCols: Seq[String],
              sumCols: Seq[String], partExpr: Column): Long = {
    require(keyCols.nonEmpty && sumCols.nonEmpty)
    val cur = spark.read.parquet(dir)
    val wm = cur.agg(max("ver")).head().getLong(0)
    val aggs = sumCols.map(c => sum(col(c)).as(c))
    val base = cur.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("part", partExpr)
      .withColumn("pk",
        concat_ws(":", lit("base") +: keyCols.map(col): _*))
      .withColumn("ver", lit(wm))
      .select((Seq("part", "pk", "ver") ++ keyCols ++ sumCols).map(col): _*)
      // materialize BEFORE the overwrite of the table it reads
      .localCheckpoint(true)
    base.write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("part").parquet(dir)
    spark.range(1).select(lit(wm).as("wm"))
      .write.mode("overwrite").parquet(dir + WatermarkSuffix)
    wm
  }
}
