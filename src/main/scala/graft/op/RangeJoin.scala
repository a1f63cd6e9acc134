package graft.op

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the second join Spark's planner has
  * no native strategy for: `points.join(intervals, t BETWEEN start AND
  * end)` plans as a nested-loop join, quadratic per key pair.
  *
  * Scalable formulation: chunk the time axis with a fixed width, every
  * interval registers in each chunk it covers (explode), every point
  * probes exactly its own chunk — the range predicate becomes an
  * EQUI-join on (keys..., chunk) that Catalyst plans as a hash join,
  * followed by the exact bound check on the (now small) candidate set.
  *
  * Pick `chunkWidth` near the median interval length: the interval-side
  * fan-out is ceil(len/width)+1 ≈ 2 rows, and a chunk's candidate count
  * stays proportional to the local overlap density, not the table size.
  * A degenerate interval spanning more than `maxChunks` chunks fails
  * loudly (like the posting-list caps) instead of silently exploding
  * the build side.
  */
object RangeJoin {

  /** Exact floor-division chunk id — integer arithmetic, no double
    * rounding at 1e15-µs epoch magnitudes, correct for negatives too.
    */
  private def chunkOf(t: Column, width: Long): Column =
    ((t - pmod(t, lit(width))) / lit(width)).cast("long")

  /** @param pointTime/start/end  numeric (e.g. epoch-micros long) columns
    * @param keys        additional equi-join keys (e.g. user_id)
    * @param chunkWidth  time-axis chunk width, same unit as the columns
    * @param maxChunks   fail-loudly cap on per-interval chunk fan-out
    * Inner-join semantics; both sides' columns kept (names must not
    * clash apart from `keys`).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTime: String, start: String, end: String,
                      chunkWidth: Long, keys: Seq[String] = Nil,
                      maxChunks: Int = 1000): DataFrame = {
    require(chunkWidth > 0, "chunkWidth must be positive")
    val c0 = chunkOf(col(start), chunkWidth)
    val c1 = chunkOf(col(end), chunkWidth)
    val iv = intervals
      .filter(col(end) >= col(start))
      .withColumn("_chunk", explode(
        when(c1 - c0 < lit(maxChunks.toLong), sequence(c0, c1))
          .otherwise(raise_error(concat(
            lit(s"range join: interval spans >= $maxChunks chunks of $chunkWidth — "),
            lit("widen chunkWidth or split the interval"))))))
    val pt = points.withColumn("_chunk", chunkOf(col(pointTime), chunkWidth))
    pt.join(iv, (keys :+ "_chunk").toSeq)
      .filter(col(pointTime) >= col(start) && col(pointTime) <= col(end))
      .drop("_chunk")
  }
}
