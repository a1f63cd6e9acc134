package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-level parquet MERGE — the lakehouse write pattern behind
  * the reference's daily refresh jobs, done the way a 100 TB table
  * demands: fold a delta into ONLY the partitions it touches and
  * rewrite those, never the table. (Rewriting a petabyte table for a
  * 0.1% daily delta is the canonical lake anti-pattern; Spark's
  * dynamic partition-overwrite mode is the built-in primitive that
  * makes the per-partition rewrite atomic per partition.)
  */
object ParquetMerge {

  /** Upsert `updates` into the partitioned parquet table at `dir`.
    *
    * Semantics per (partition, key) within a touched partition:
    * last-write-wins by `ver` (ties: the max over the full row
    * struct — deterministic, order-independent). Rows in untouched
    * partitions are NOT read, NOT rewritten, and their files stay
    * byte-identical on disk.
    *
    * THE MERGE SCOPE IS THE PARTITION — deliberately, because that is
    * all a partition-local rewrite can guarantee: a key living in an
    * untouched partition is invisible to this call, so a key that
    * MIGRATES partitions (same k, new day) yields one row per
    * partition until the old partition receives a delete/compaction
    * delta. Keys that are functions of their partition value (the
    * normal fact-table layout: the partition column is part of the
    * key) never hit this. An earlier draft deduped by key GLOBALLY,
    * which silently dropped the losing partition's row whenever both
    * partitions were touched — worse than the documented scope.
    *
    * Mechanics: the touched partition values (a delta is small by
    * contract — O(days), not O(rows)) are collected, the current table
    * is read WITH a partition-pruning isin filter (only touched
    * partitions' files are scanned), merged, and written back in
    * `partitionOverwriteMode=dynamic` overwrite — which replaces
    * exactly the partitions present in the merged frame. Existence is
    * checked through the Hadoop FileSystem of the path (java.io.File
    * is ALWAYS false on hdfs:///s3a:// — it would have turned merge
    * into partition replace); a missing table is simply an empty
    * current side, so the first batch still collapses to one row per
    * (partition, key).
    */
  def upsertPartitions(spark: SparkSession, dir: String, updates: DataFrame,
                       partCol: String, key: String, ver: String): Unit = {
    // Touched values are collected through Spark's OWN string cast —
    // the same rendering the partition directories were written with —
    // so the prune below is a string-to-string match.
    val touched = updates.select(col(partCol).cast("string"))
      .distinct().collect().map(_.getString(0))
    if (touched.isEmpty) return
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    // Read-back partition-column TYPE INFERENCE is defeated with an
    // EXPLICIT read schema that declares partCol as STRING: directory
    // values that merely look like dates/ints would otherwise come
    // back DATE/INT while updates' partCol is (say) STRING — the isin
    // prune then matches nothing, cur is empty, and the "merge"
    // silently degrades to partition REPLACE, dropping every existing
    // row in the touched partitions. A user-specified schema pins the
    // partition column to STRING for THIS read only (earlier drafts
    // toggled the session-wide inference conf, which leaked string
    // partition columns into any concurrent query on the session);
    // the column is pruned by the string values above, then cast back
    // to updates' declared type so the union lines up.
    val readSchema = org.apache.spark.sql.types.StructType(
      updates.schema.fields.map(f =>
        if (f.name == partCol)
          f.copy(dataType = org.apache.spark.sql.types.StringType)
        else f))
    val cur =
      if (!fs.exists(hPath)) updates.limit(0)
      else spark.read.schema(readSchema).parquet(dir)
        .filter(col(partCol).isin(touched: _*))
        .withColumn(partCol,
          col(partCol).cast(updates.schema(partCol).dataType))
        .select(updates.columns.map(col): _*) // align column order
    val all = cur.union(updates)
    // LWW: one partial-aggregated max(struct) per (partition, key) —
    // ver leads, the remaining payload breaks exact-version ties
    val rest = updates.columns.filterNot(c => c == key || c == partCol).toSeq
    val merged = all.groupBy(col(partCol), col(key))
      .agg(max(struct((Seq(ver) ++ rest.filterNot(_ == ver)).map(col): _*)).as("m"))
      .select(col(partCol) +: col(key) +: rest.map(c => col(s"m.$c").as(c)): _*)
      .select(updates.columns.map(col): _*)
    // dynamic partition-overwrite scoped to THIS write via the writer
    // option (takes precedence over the session conf) — mutating the
    // session conf opened a window where any concurrent writer on the
    // SparkSession silently inherited dynamic-overwrite semantics
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol).parquet(dir)
  }

  /** Partition-scoped DELETE + rewrite — the retraction write.
    * [[upsertPartitions]] cannot remove a row (LWW always keeps one
    * winner per key) and bumping `ver` to "overwrite" would reassign
    * fold history, so retraction needs its own primitive: within the
    * touched partitions, drop every `deleteKeys` row, replace every
    * row whose key appears in `updates` (at the UPDATE's version —
    * callers rewriting fate flips keep the row's original `ver`), and
    * leave everything else byte-identical. Untouched partitions are
    * never read.
    *
    * `deleteKeys` must carry (`partCol`, `key`) — the caller derives
    * the partition from the key (state layouts make partCol a pure
    * function of the key precisely so this is possible).
    *
    * A partition whose every row is deleted is removed from DISK
    * explicitly: dynamic partition overwrite only replaces partitions
    * PRESENT in the written frame, so an emptied partition would
    * otherwise silently keep its old files — the retracted rows
    * would come back on the next read.
    */
  def deleteAndUpsertPartitions(spark: SparkSession, dir: String,
                                deleteKeys: DataFrame, updates: DataFrame,
                                partCol: String, key: String,
                                ver: String): Unit = {
    val touched = deleteKeys.select(col(partCol).cast("string"))
      .union(updates.select(col(partCol).cast("string")))
      .distinct().collect().map(_.getString(0))
    if (touched.isEmpty) return
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(hPath)) return
    val readSchema = org.apache.spark.sql.types.StructType(
      updates.schema.fields.map(f =>
        if (f.name == partCol)
          f.copy(dataType = org.apache.spark.sql.types.StringType)
        else f))
    val cur = spark.read.schema(readSchema).parquet(dir)
      .filter(col(partCol).isin(touched: _*))
      .withColumn(partCol,
        col(partCol).cast(updates.schema(partCol).dataType))
      .select(updates.columns.map(col): _*)
    val gone = deleteKeys.select(col(key))
      .union(updates.select(col(key))).distinct()
    val merged = cur.join(gone, Seq(key), "left_anti")
      .unionByName(updates)
      // materialize BEFORE overwriting the files it reads
      .localCheckpoint(true)
    val written = merged.select(col(partCol).cast("string"))
      .distinct().collect().map(_.getString(0)).toSet
    if (written.nonEmpty)
      merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol).parquet(dir)
    // partitions emptied by the delete: remove their directories
    touched.filterNot(written).foreach { p =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, s"$partCol=$p"), true)
    }
    // a table emptied ENTIRELY becomes an ABSENT table (readers treat
    // existence as "has rows"; a directory holding only _SUCCESS fails
    // schema inference on the next read)
    val anyLeft = fs.listStatus(hPath).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith(s"$partCol="))
    if (!anyLeft) fs.delete(hPath, true)
    // the manual directory deletes above bypass Spark's write-path
    // cache invalidation — drop the stale file listing or the next
    // read of this path serves FileNotFound from the cached index
    spark.catalog.refreshByPath(dir)
  }

  /** One partition's compaction decision, returned for auditability:
    * how many files it had, how many it was rewritten to (0 = left
    * untouched). */
  final case class CompactionReport(partition: String, filesBefore: Int,
                                    bytes: Long, filesAfter: Int)

  /** Small-file compaction — the other half of the lakehouse
    * maintenance story next to [[upsertPartitions]]: a daily
    * incremental merge leaves each touched partition with one more
    * file generation per day, and at 100 TB the accumulated small
    * files dominate planning/open cost long before data size does.
    * This rewrites each partition whose file count exceeds what its
    * BYTES justify into `ceil(bytes / targetFileBytes)` files, and
    * leaves well-laid-out partitions byte-identical on disk (no
    * gratuitous rewrite, no mtime churn — readers' file-listing caches
    * stay valid).
    *
    * Scope and scale shape: the partition list is O(partitions) driver
    * work (the same "a lake table's partition count is a dimension,
    * not a fact" contract as `upsertPartitions`'s touched collect);
    * each rewrite reads ONE partition with partition-pruned input and
    * writes it back `coalesce(n)` — no shuffle, map-side re-bucketing
    * only. Rewrites go partition-by-partition through dynamic
    * partition overwrite, so a crash mid-compaction leaves every
    * partition either old-complete or new-complete, never mixed.
    * Restrict to `onlyPartitions` to compact the partitions a merge
    * just touched (the steady-state nightly call).
    */
  def compactPartitions(spark: SparkSession, dir: String, partCol: String,
                        targetFileBytes: Long = 128L * 1024 * 1024,
                        onlyPartitions: Option[Seq[String]] = None,
                        minFiles: Int = 2)
  : Seq[CompactionReport] = {
    require(targetFileBytes > 0, "targetFileBytes must be > 0")
    require(minFiles >= 2, "minFiles must be >= 2")
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(hPath)) return Seq.empty
    val prefix = partCol + "="
    // directory names carry Hive-ESCAPED partition values (space →
    // %20, colon → %3A, …); compare and write back the UNESCAPED
    // value, or a rewrite would double-escape into a new directory
    def unescape(v: String): String =
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(v)
    val parts = fs.listStatus(hPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(_.getPath)
      .filter(p => onlyPartitions.forall(
        _.contains(unescape(p.getName.stripPrefix(prefix)))))
    parts.map { p =>
      val value = unescape(p.getName.stripPrefix(prefix))
      val files = fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      val bytes = files.map(_.getLen).sum
      val want = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
        .toInt
      // `minFiles` amortizes rewrite FREQUENCY: a rewrite costs the
      // whole partition's bytes (which grow with accumulated state),
      // so rewriting at every extra file makes a nightly sweep's cost
      // creep linearly. Letting a partition carry up to minFiles-1
      // extra delta files divides the rewrite rate — file count stays
      // bounded at O(partitions·minFiles) while the per-night rewrite
      // volume drops by the same factor (measured: TUNING.md x25
      // steady state).
      if (files.size <= want || files.size < minFiles)
        CompactionReport(value, files.size, bytes, 0)
      else {
        // read THIS partition only — a directory-scoped read below the
        // partition level sees no `part=` directories, so partition
        // discovery (and its type inference) never runs; the partition
        // column is re-attached as a string literal (compaction must
        // not re-type what the layout already encodes). The dynamic
        // overwrite mode is scoped to THIS write via the writer option
        // — no session-conf mutation, no window where a concurrent
        // writer inherits dynamic-overwrite semantics.
        val cur = spark.read.parquet(p.toString)
          .withColumn(partCol, org.apache.spark.sql.functions.lit(value))
        cur.coalesce(want)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(partCol).parquet(dir)
        CompactionReport(value, files.size, bytes, want)
      }
    }
  }
}
