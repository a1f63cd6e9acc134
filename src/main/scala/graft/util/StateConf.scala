package graft.util

import org.apache.spark.sql.SparkSession

/** Deployment/measurement override for the maintained-state partition
  * counts (`SPARK_GRAFT_STATE_PARTS`): every `Incremental*` module's
  * `StateParts` resolves through [[parts]], so one env var re-lays the
  * whole state family at 64/128/256 partitions for the bucket-count
  * scaling sweeps (TUNING.md) or for a large-corpus deployment.
  *
  * PER-JVM CONSTANT, read once at class load. The `part` column is a
  * pure function of the row key AND of this count, derived identically
  * at write and read time — a state root must therefore live its whole
  * life under ONE value. Changing the env var only affects state roots
  * created after the new JVM starts; pointing a differently-configured
  * JVM at an existing root would mis-prune (reads miss rows, merges
  * strand them, partition-pruned retractions silently skip the rows
  * they were asked to forget). That hazard is ENFORCED, not just
  * documented: every fold/retract/pruned-probe entry point [[bind]]s
  * the root — the first fold records the effective count in a
  * `_`-prefixed marker file inside the state table (invisible to
  * parquet reads, copied along with the directory), and every later
  * open fails loudly on mismatch instead of silently mis-pruning.
  * The test/bench defaults (unset ⇒ each module's own default) are
  * sized for the shipped test scales, not 100 TB.
  *
  * SIZING RULE (measured, TUNING.md round-14 StateParts rows): fold
  * cost tracks TOUCHED partitions — ~4-5× pure overhead at 64 parts
  * on a toy corpus vs 8, and identical-batch folds cost 1/64 of the
  * all-partitions cost when they touch 1 of 64 — so the partition
  * count must follow PER-PARTITION BYTES, never "more parts = more
  * parallel". [[partsForBytes]] codifies it: enough partitions that
  * each holds ~`targetBytes` (default 256 MiB — a partition is one
  * merge-rewrite unit, so it should be a healthy parquet rewrite
  * size), floored at 1, capped only by keeping per-partition bytes
  * above [[MinPartitionBytes]].
  */
object StateConf {
  /** The override, when set and sane ( ≥ 1); resolved once. */
  val overrideParts: Option[Int] =
    sys.env.get("SPARK_GRAFT_STATE_PARTS")
      .flatMap(_.toIntOption).filter(_ >= 1)

  /** A module's effective partition count. */
  def parts(default: Int): Int = overrideParts.getOrElse(default)

  /** Marker file recording the partition count a state root was laid
    * out with. `_`-prefixed so Spark/Hadoop data readers skip it, and
    * INSIDE the table directory so directory copies and backups carry
    * it along.
    */
  val MarkerFile = "_graft_state_parts"

  /** Per-partition bytes below this are pure file/planning overhead at
    * fold time (measured: the r14 x25@64 sweep's 4-5× floor creep);
    * [[partsForBytes]] never returns a layout below it.
    */
  val MinPartitionBytes: Long = 16L * 1024 * 1024

  /** The partition count a corpus of `totalBytes` should be laid out
    * at: `ceil(totalBytes / targetBytes)`, floored so no partition
    * falls under [[MinPartitionBytes]], minimum 1. At 100 TB /
    * 256 MiB-target this is ~400k partitions of one rewrite unit
    * each; at test scale (MBs) it is 1 — which is the point: the
    * partition count is a function of DATA, not of cluster size.
    */
  def partsForBytes(totalBytes: Long,
                    targetBytes: Long = 256L * 1024 * 1024): Int = {
    require(targetBytes >= MinPartitionBytes,
      s"targetBytes must be >= MinPartitionBytes ($MinPartitionBytes)")
    if (totalBytes <= 0L) 1
    else {
      val byTarget = (totalBytes + targetBytes - 1) / targetBytes
      val byFloor = math.max(1L, totalBytes / MinPartitionBytes)
      math.min(byTarget, byFloor).min(Int.MaxValue.toLong).toInt.max(1)
    }
  }

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Check-or-create the root's partition-count marker — called by
    * every state module at fold/retract/pruned-probe entry (and again
    * at fold exit, so the FIRST fold of a fresh root records its
    * layout). Semantics:
    *  - root absent: no-op (nothing to validate; the fold's write
    *    creates the data, then the exit-side bind records the marker);
    *  - root present, no marker: adopt — record `parts` (pre-marker
    *    states created by earlier rounds bind to the first JVM that
    *    touches them);
    *  - root present, marker present: REQUIRE equality. A JVM whose
    *    `SPARK_GRAFT_STATE_PARTS` resolves differently fails here,
    *    loudly, before any partition-pruned read or merge can
    *    silently miss rows.
    */
  def bind(spark: SparkSession, dir: String, parts: Int): Unit = {
    require(parts >= 1, "parts must be >= 1")
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return
    val marker = new org.apache.hadoop.fs.Path(root, MarkerFile)
    if (fs.exists(marker)) {
      val stored = readMarker(fs, marker)
      require(stored == parts,
        s"state root $dir was laid out with $stored partitions; this " +
          s"JVM resolves SPARK_GRAFT_STATE_PARTS to $parts — a " +
          "partition-pruned read/merge under the wrong count silently " +
          "misses rows. Re-run with the matching env var, or re-lay " +
          "the root (rebucket/rebuild) to change its partition count.")
    } else writeMarker(fs, marker, parts)
  }

  /** Force-write the marker — the re-lay path ([[bind]] would refuse
    * the new count): callers that REWRITE the whole root under a new
    * partition count (IncrementalClusters.rebucket) record it here.
    */
  def rebind(spark: SparkSession, dir: String, parts: Int): Unit = {
    require(parts >= 1, "parts must be >= 1")
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return
    writeMarker(fs, new org.apache.hadoop.fs.Path(root, MarkerFile), parts)
  }

  private def readMarker(fs: org.apache.hadoop.fs.FileSystem,
                         p: org.apache.hadoop.fs.Path): Int = {
    val in = fs.open(p)
    try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).trim.toInt
    finally in.close()
  }

  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem,
                          p: org.apache.hadoop.fs.Path,
                          parts: Int): Unit = {
    val out = fs.create(p, true)
    try out.write(parts.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
