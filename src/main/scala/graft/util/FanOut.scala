package graft.util

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan fan-out (r15 optimization, guide §2.2/§6.1).
  *
  * The test corpora are single-file, single-row-group parquet, so a
  * scan plans as ONE input partition — and Spark fuses every map-side
  * expression above the scan into that stage, which serializes the
  * expensive per-document work (fingerprint selection, signature
  * hashing, shingling) onto one core until the first exchange.
  * `spark.sql.files.minPartitionNum` cannot help: a row group is the
  * unit of parquet parallelism, so extra splits of a one-row-group
  * file are empty tasks.
  *
  * `apply` inserts a round-robin repartition to the session's
  * default parallelism ONLY when the frame's planned partition count
  * is far below the core count (parts·4 ≤ cores). On a real cluster
  * corpus (thousands of splits) the condition is false and the frame
  * passes through untouched — this is a floor on map parallelism,
  * not a local[32] tuning constant. The extra exchange moves only the
  * raw input rows (pre-explode, pre-expression), which is exactly the
  * cheap side of the kernels it guards.
  *
  * Callers are the HEAVY per-row kernels only (winnowing fingerprint
  * selection, simhash/minhash signatures, shingle pair kernels) — the
  * deliberately map-side-only operators (chunking, quality model,
  * scrub) keep their zero-exchange plans, which PlanSpec pins.
  *
  * CALLER contract (r16, advisor note): pass SCAN-ADJACENT frames
  * only. The partition-count probe goes through `df.rdd`, which plans
  * the frame physically — cheap for a scan (the covered call sites),
  * but on a frame with shuffles/AQE stages beneath it the probe would
  * EXECUTE those stages once before the real action does (an AQE plan
  * materializes its query stages on RDD access). If a future caller
  * needs a post-shuffle fan-out, that is [[PinExchange]]'s job, not
  * this one's.
  */
object FanOut {
  def apply(df: DataFrame): DataFrame = {
    // streaming frames pass through untouched: `.rdd` is illegal on a
    // streaming plan, and the micro-batch executor already controls
    // partitioning (the shared-kernel streaming twins hit this path)
    if (df.isStreaming) return df
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val parts = df.rdd.getNumPartitions
    if (parts * 4 <= cores) df.repartition(cores) else df
  }
}
