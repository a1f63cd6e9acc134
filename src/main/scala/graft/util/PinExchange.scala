package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Pin the key exchange feeding a compute-AMPLIFYING reducer at the
  * session's configured shuffle parallelism (r16 optimization, guide
  * §2.2/§2.5).
  *
  * The posting-list pair kernels ([[graft.ext.TextDedup.candidatePairCountsFromShingles]],
  * [[graft.ext.TextDedup.winnowingMatchesFromFps]],
  * [[graft.ext.TextAnalysis.sparseCosinePairs]]) shuffle small
  * (doc, key) rows once on the key, then run the df-prune window, the
  * posting-list collect and the in-row `array_pairs` expansion all
  * INSIDE that one post-shuffle stage — the r15 restructure that
  * removed the posting self-joins. The stage's WORK is quadratic in
  * posting-list length, but its input BYTES are tiny, and AQE's
  * partition coalescing sizes post-shuffle partitions by input bytes
  * (`spark.sql.adaptive.advisoryPartitionSizeInBytes`): on a corpus
  * whose (doc, key) shuffle is a few MB the entire pair explosion is
  * coalesced onto 1–2 cores while the other 30 idle (measured r16,
  * OPTIMIZATION_r16.md — the winnow match kernel spent ~2.8 of its
  * 3.9 s in a one-task explode+aggregate).
  *
  * The fix is an explicit `repartition(numShufflePartitions, key)`
  * BELOW the kernel's first key-clustered operator:
  *
  *  - it produces the exact exchange the kernel would get without AQE
  *    coalescing (same hash family, same partition count as the
  *    `ENSURE_REQUIREMENTS` exchange it replaces);
  *  - a `REPARTITION_BY_NUM` shuffle is never AQE-coalesced — Spark
  *    respects a user-specified partition count;
  *  - every downstream window/groupBy clustered on the same key reuses
  *    the partitioning (`ClusteredDistribution` is satisfied), so the
  *    plan's exchange COUNT is unchanged at any scale: this is a
  *    parallelism floor on the amplifying stage, not an extra pass.
  *
  * On a cluster the pinned count is the deployment's own
  * `spark.sql.shuffle.partitions` — the knob operators already size to
  * their shuffle volume (guide §2.2) — so nothing here is local-mode
  * tuning. The only behavior given up is AQE shrinking that one
  * exchange, which is precisely the behavior that serializes pair
  * explosion: a stage whose output is quadratic in its input must
  * never be sized by its input bytes.
  */
object PinExchange {
  def apply(df: DataFrame, key: Column): DataFrame = {
    // streaming plans pass through untouched (the micro-batch executor
    // controls partitioning; parity with FanOut's guard)
    if (df.isStreaming) return df
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartition(n, key)
  }
}
