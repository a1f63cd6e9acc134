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
  *  - the watermark (max folded `ver` OVER FOLD ROWS ONLY at
  *    compaction time, stored as a one-row parquet at `dir + "_wm"`)
  *    turns a REPLAY of a compacted batch into a documented no-op in
  *    the folds: the batch's delta row no longer exists to be
  *    rewritten, so re-adding it would double-count — exactly the
  *    divergence the pk-per-batch LWW rule otherwise prevents.
  *    Batches at `ver <= watermark` are already inside the baseline
  *    by construction (checkpointed streams only redeliver the LAST
  *    committed batch, which the fold-then-compact ordering has
  *    already folded). RETRACTION deltas (`r`-tagged pks) are
  *    EXCLUDED from the watermark via the caller's `foldRow`
  *    predicate: a retraction's `retractVer` exceeds every folded
  *    batch by contract, so including it would pin the watermark
  *    above all future batchNos and every later fold would silently
  *    no-op — new data dropped with no error.
  *  - the BASELINE VERSION (max `ver` over ALL compacted rows,
  *    including retraction deltas; second column of the watermark
  *    file) stamps the baseline rows and is the floor for both as-of
  *    probes (earlier states were folded away) and retraction
  *    versions (a retraction at or below it was already folded into
  *    the baseline — re-issuing it would double-subtract, so the
  *    retract faces reject it loudly).
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

  /** The baseline version of a compacted table (max `ver` over
    * everything folded into the baseline, retraction deltas
    * included); None if never compacted. The floor for as-of probes
    * and for new retraction versions.
    */
  def baselineVer(spark: SparkSession, dir: String): Option[Long] =
    if (exists(spark, dir + WatermarkSuffix))
      Some(spark.read.parquet(dir + WatermarkSuffix)
        .agg(max("base_ver")).head().getLong(0))
    else None

  /** Compact the delta table at `dir` to one baseline row per key.
    * `keyCols`/`sumCols` name the table's key and associative-sum
    * columns; `partExpr` recomputes the table's own partition column
    * from the key; `foldRow` selects FOLD delta rows (true) vs
    * retraction rows (false) — each fold module passes its own pk
    * layout's expressions. Returns the recorded replay watermark
    * (max ver over fold rows).
    */
  def compact(spark: SparkSession, dir: String, keyCols: Seq[String],
              sumCols: Seq[String], partExpr: Column,
              foldRow: Column = lit(true)): Long = {
    require(keyCols.nonEmpty && sumCols.nonEmpty)
    val cur = spark.read.parquet(dir)
    // replay watermark over FOLD rows only — a retraction's ver is
    // above every batchNo by contract and would otherwise no-op all
    // future folds (see the class doc)
    val wmRow = cur.filter(foldRow).agg(max("ver")).head()
    val wm = if (wmRow.isNullAt(0)) 0L else wmRow.getLong(0)
    val baseVer = cur.agg(max("ver")).head().getLong(0)
    val aggs = sumCols.map(c => sum(col(c)).as(c))
    val base = cur.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("part", partExpr)
      .withColumn("pk",
        concat_ws(":", lit("base") +: keyCols.map(col): _*))
      // baseline rows carry the baseline version (not the fold
      // watermark): they contain every compacted retraction, so an
      // as-of probe below baseVer must not see them — and cannot,
      // that history no longer exists
      .withColumn("ver", lit(baseVer))
      .select((Seq("part", "pk", "ver") ++ keyCols ++ sumCols).map(col): _*)
      // materialize BEFORE the overwrite of the table it reads
      .localCheckpoint(true)
    base.write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("part").parquet(dir)
    spark.range(1).select(lit(wm).as("wm"), lit(baseVer).as("base_ver"))
      .write.mode("overwrite").parquet(dir + WatermarkSuffix)
    wm
  }

  /** The loud guard every retract face runs: a retraction at or below
    * the compacted baseline version was already folded into the
    * baseline — re-issuing it would double-subtract (its own delta
    * rows no longer exist to LWW-rewrite).
    */
  def requireRetractAboveBaseline(spark: SparkSession, dir: String,
                                  retractVer: Long): Unit =
    baselineVer(spark, dir).foreach { bv =>
      require(retractVer > bv,
        s"retractVer $retractVer is at or below the compacted baseline " +
          s"version $bv — any deltas at that version were folded into " +
          "the baseline, so re-issuing would double-subtract; use a " +
          s"fresh retractVer above $bv")
    }
}
