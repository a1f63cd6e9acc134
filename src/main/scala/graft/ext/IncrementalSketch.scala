package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sink.ParquetMerge

/** Incrementally-maintained count-min sketch — the state-fold pattern
  * applied to the sketch family: a new document batch's token counts
  * fold into a persisted CMS cell matrix by plain integer addition
  * (CMS cells are associative, the textbook mergeable-summary
  * property), so the folded matrix is EXACTLY the one-shot matrix
  * over the merged corpus — bit-equal, not approximately equal. The
  * probe then shares the one-shot `ns_cms_counts` oracle verbatim:
  * the hash gate proves fold ≡ rebuild for the whole estimate path
  * (cells, top-k selection, min-over-rows estimate, overestimate
  * audit).
  *
  * State layout:
  *  - cell deltas at `dir`: `(part=0, pk = d:b:batchNo, ver, d, b,
  *    cell_n)` — one delta row per touched cell per batch, LWW-keyed
  *    on (cell, batch) so a replay REWRITES its own delta instead of
  *    double-counting. Read-time cells = sum of deltas. Total state
  *    is O(depth · width · batches); a compaction pass could fold
  *    old deltas into one baseline row, same LWW table.
  *  - vocab audit at `dir + VocabSuffix`: per-(term, batch) true-count
  *    deltas. This is the AUDIT sidecar (the `true_n`/`over_n`
  *    columns of the registered query) — a production deployment
  *    keeps only the O(depth·width) cell state and drops this
  *    vocabulary-sized table; the sketch estimate path never reads it
  *    except to select/verify the top-k.
  *
  * Scale shape per fold: one map-side tokenize + two partial-agg
  * shuffles bounded by O(depth·width) and O(batch vocab); the corpus
  * is never re-read.
  */
object IncrementalSketch {

  val VocabSuffix = "_vocab"

  /** Fold one document batch's token counts into the stored cell
    * matrix + vocab audit. Replay-idempotent via the (key, batchNo)
    * LWW delta rows.
    */
  def cmsFold(spark: SparkSession, dir: String, docs: DataFrame,
              text: String, batchNo: Long, depth: Int = 4,
              width: Int = 64): Unit = {
    // a replay of a batch that [[compact]] already folded into the
    // baseline is a no-op — re-adding its delta would double-count
    // (the DeltaCompact watermark contract; cells and vocab are
    // always compacted together, so the cell watermark governs both)
    if (DeltaCompact.watermark(spark, dir).exists(batchNo <= _)) return
    cmsDelta(spark, dir, docs, text, batchNo, depth, width,
      sign = 1L, tag = "")
  }

  /** RETRACT a doc set's token counts from the CMS + vocab state: the
    * cells are EXACT per-(d, b) counts here, so subtraction is sound —
    * one NEGATIVE delta row per touched cell/term, keyed with an `r`
    * tag so it can never collide with a fold's delta (and a retried
    * retraction at the same `retractVer` LWW-rewrites its own rows,
    * idempotent). Valid before or after compaction — with one loud
    * boundary: a `retractVer` at or below the compacted BASELINE
    * version is rejected (its deltas were folded into the baseline;
    * re-issuing would double-subtract).
    */
  def cmsRetract(spark: SparkSession, dir: String, docs: DataFrame,
                 text: String, retractVer: Long, depth: Int = 4,
                 width: Int = 64): Unit = {
    DeltaCompact.requireRetractAboveBaseline(spark, dir, retractVer)
    cmsDelta(spark, dir, docs, text, retractVer, depth, width,
      sign = -1L, tag = "r")
  }

  private def cmsDelta(spark: SparkSession, dir: String, docs: DataFrame,
                       text: String, batchNo: Long, depth: Int,
                       width: Int, sign: Long, tag: String): Unit = {
    require(depth >= 1 && width >= 1)
    val toks = docs.select(explode(Tok.tokens(col(text))).as("t"))
      .withColumn("c", expr(Sketches.tokCodeSql))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cellRows = toks
      .select(explode(expr(s"transform(sequence(0, ${depth - 1}), d -> " +
        s"struct(d AS d, ${Sketches.cmsBucketSql("d", width)} AS b))")).as("db"))
      .groupBy(col("db.d").as("d"), col("db.b").as("b"))
      .agg((count(lit(1)) * sign).as("cell_n"))
      .withColumn("part", lit(0L))
      .withColumn("pk", concat_ws(":", col("d"), col("b"),
        lit(s"$batchNo$tag")))
      .withColumn("ver", lit(batchNo))
      .select("part", "pk", "ver", "d", "b", "cell_n")
    ParquetMerge.upsertPartitions(spark, dir, cellRows, "part", "pk", "ver")
    // batchNo prefixes the pk (colon-free), so pk is injective per
    // (batch, term) whatever characters the term carries
    val vocabRows = toks.groupBy("t")
      .agg((count(lit(1)) * sign).as("n_delta"))
      .withColumn("c", expr(Sketches.tokCodeSql))
      .withColumn("part", pmod(col("c"), lit(8L)))
      .withColumn("pk", concat(lit(s"$batchNo$tag"), lit(":"), col("t")))
      .withColumn("ver", lit(batchNo))
      .select("part", "pk", "ver", "t", "n_delta")
    ParquetMerge.upsertPartitions(spark, dir + VocabSuffix, vocabRows,
      "part", "pk", "ver")
    toks.unpersist()
  }

  /** Streaming face: each micro-batch folds through the same
    * idempotent LWW delta merge (checkpoint + LWW = effective
    * exactly-once, the fold-family contract).
    */
  def cmsFoldStream(docs: DataFrame, dir: String, text: String,
                    checkpoint: String, depth: Int = 4, width: Int = 64)
  : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          cmsFold(b.sparkSession, dir, b.toDF(), text,
            batchNo = batchId + 1L, depth = depth, width = width)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Compact both delta tables to one baseline row per key and record
    * the replay watermark — bounds state at O(depth·width + vocab)
    * regardless of batch count. Probe output is unchanged (the sums
    * are associative; [[DeltaCompact]]).
    */
  def cmsCompact(spark: SparkSession, dir: String): Long = {
    // fold rows vs retraction rows by pk layout: cell pks END with the
    // batch tag (`d:b:<ver><tag>` — a fold's ends in a digit), vocab
    // pks LEAD with it (`<ver><tag>:t` — anchored, so a term carrying
    // "r" can never match)
    val wm = DeltaCompact.compact(spark, dir, Seq("d", "b"),
      Seq("cell_n"), lit(0L), foldRow = !col("pk").endsWith("r"))
    DeltaCompact.compact(spark, dir + VocabSuffix, Seq("t"),
      Seq("n_delta"), pmod(expr(Sketches.tokCodeSql), lit(8L)),
      foldRow = !col("pk").rlike("^\\d+r:"))
    wm
  }

  /** Frequency-ranked vocabulary derived from the MAINTAINED vocab
    * audit table — one fold, many probes: the per-(term, batch)
    * exact-count deltas that audit the CMS estimates double as the
    * corpus vocabulary, so the ranked contiguous-id vocab (the
    * [[TextAnalysis.buildVocab]] shape) probes straight out of
    * already-folded state with no corpus re-scan. Counts re-sum
    * associatively and the ranking is the two-pass distributed
    * numbering, so fold ≡ rebuild exactly — the probe shares
    * `ns_vocab`'s oracle SQL verbatim.
    */
  def vocabProbe(spark: SparkSession, dir: String,
                 minCount: Long = 1): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    val counts = spark.read.parquet(dir + VocabSuffix)
      .groupBy("t").agg(sum("n_delta").as("n"))
      .filter(col("n") >= minCount)
      .withColumnRenamed("t", "token")
    graft.op.Scale.globalRowNumbers(
        counts.withColumn("_neg_n", -col("n")), Seq("_neg_n", "token"),
        idCol = "vocab_id")
      .drop("_neg_n")
      .select("token", "n", "vocab_id")
  }

  val GridSuffix = "_grid"

  /** Fold one batch's fixed-grid cell counts (the
    * [[Sketches.gridQuantiles]] state) into a persisted delta table —
    * same associative-cells argument as the CMS: the folded cell sums
    * are bit-equal to a one-shot count over the merged corpus, so the
    * quantile probe shares `ns_quantile_grid`'s oracle verbatim.
    * State is O(groups · occupied cells · batches) until
    * [[gridCompact]] folds it to one baseline row per (group, cell).
    */
  def gridFold(spark: SparkSession, dir: String, docs: DataFrame,
               valueCol: String, groupCol: String, batchNo: Long,
               grid: Long = 64L): Unit = {
    if (DeltaCompact.watermark(spark, dir + GridSuffix)
      .exists(batchNo <= _)) return
    gridDelta(spark, dir, docs, valueCol, groupCol, batchNo, grid,
      sign = 1L, tag = "")
  }

  /** RETRACT a doc set's cells from the grid state — exact counts, so
    * subtraction is sound; same `r`-tagged negative-delta contract as
    * [[cmsRetract]].
    */
  def gridRetract(spark: SparkSession, dir: String, docs: DataFrame,
                  valueCol: String, groupCol: String, retractVer: Long,
                  grid: Long = 64L): Unit = {
    DeltaCompact.requireRetractAboveBaseline(spark, dir + GridSuffix,
      retractVer)
    gridDelta(spark, dir, docs, valueCol, groupCol, retractVer, grid,
      sign = -1L, tag = "r")
  }

  private def gridDelta(spark: SparkSession, dir: String, docs: DataFrame,
                        valueCol: String, groupCol: String, batchNo: Long,
                        grid: Long, sign: Long, tag: String): Unit = {
    require(grid >= 1)
    val d = dir + GridSuffix
    // cell math copied verbatim from Sketches.gridQuantiles (integer
    // DIV with the pmod floor trick — exact for negatives too)
    val rows = docs
      .select(col(groupCol).as("grp"),
        expr(s"(CAST($valueCol AS BIGINT) - " +
          s"pmod(CAST($valueCol AS BIGINT), ${grid}L)) DIV ${grid}L")
          .as("cell"))
      .groupBy("grp", "cell").agg((count(lit(1)) * sign).as("cell_n"))
      .withColumn("part", pmod(xxhash64(col("grp")), lit(4L)))
      .withColumn("pk", concat(lit(s"$batchNo$tag"), lit(":"), col("grp"),
        lit(":"), col("cell")))
      .withColumn("ver", lit(batchNo))
      .select("part", "pk", "ver", "grp", "cell", "cell_n")
    ParquetMerge.upsertPartitions(spark, d, rows, "part", "pk", "ver")
  }

  /** Per-group quantiles over the folded cells — the same output shape
    * as [[Sketches.gridQuantiles]] (n, p50_lo/p90_lo/p95_lo/p99_lo as
    * cell lower bounds), recomputed from exact folded sums.
    */
  def gridProbe(spark: SparkSession, dir: String, groupCol: String,
                grid: Long = 64L,
                qs: Seq[Int] = Seq(50, 90, 95, 99)): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("cell")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("grp")
    val cum = spark.read.parquet(dir + GridSuffix)
      .groupBy("grp", "cell").agg(sum("cell_n").as("cell_n"))
      .withColumn("cum", sum("cell_n").over(w))
      .withColumn("n", sum("cell_n").over(wAll))
    val qCols = qs.map(q =>
      min(when(col("cum") * lit(100L) >= col("n") * lit(q.toLong),
        col("cell") * lit(grid))).as(s"p${q}_lo"))
    cum.groupBy("grp")
      .agg(max("n").as("n"), qCols: _*)
      // a group fully emptied by retraction must vanish, not emit n=0
      .filter(col("n") > 0L)
      .withColumnRenamed("grp", groupCol)
      .select((Seq(groupCol, "n") ++ qs.map(q => s"p${q}_lo")).map(col): _*)
  }

  /** Compact the grid delta table ([[DeltaCompact]]). */
  def gridCompact(spark: SparkSession, dir: String): Long =
    DeltaCompact.compact(spark, dir + GridSuffix, Seq("grp", "cell"),
      Seq("cell_n"), pmod(xxhash64(col("grp")), lit(4L)),
      // grid pks lead with the batch tag (`<ver><tag>:grp:cell`) —
      // the anchor keeps a group name carrying "r"/":" from matching
      foldRow = !col("pk").rlike("^\\d+r:"))

  /** Top-k estimate-vs-true audit over the folded state — the same
    * `(term, true_n, est_n, over_n)` shape [[Sketches.cmsTermCounts]]
    * returns over a one-shot corpus, which is what lets the two share
    * one oracle. Cells and true counts both re-aggregate by plain
    * sums (associative), so every value is bit-equal to the one-shot.
    */
  def cmsProbe(spark: SparkSession, dir: String, depth: Int = 4,
               width: Int = 64, topK: Int = 50): DataFrame = {
    val cells = spark.read.parquet(dir)
      .groupBy("d", "b").agg(sum("cell_n").as("cell_n"))
    val top = spark.read.parquet(dir + VocabSuffix)
      .groupBy("t").agg(sum("n_delta").as("true_n"))
      // terms fully retracted must vanish, not rank at 0
      .filter(col("true_n") > 0L)
      .orderBy(desc("true_n"), col("t")).limit(topK)
      .withColumn("c", expr(Sketches.tokCodeSql))
    top
      .select(col("t").as("term"), col("true_n"),
        explode(expr(s"transform(sequence(0, ${depth - 1}), d -> " +
          s"struct(d AS d, ${Sketches.cmsBucketSql("d", width)} AS b))")).as("db"))
      .join(broadcast(cells),
        col("db.d") === col("d") && col("db.b") === col("b"))
      .groupBy("term", "true_n")
      .agg(min(col("cell_n")).as("est_n"))
      .withColumn("over_n", col("est_n") - col("true_n"))
  }
}
