package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Partial-aggregation state / result of [[VecSumAgg]]: row count and
  * per-dimension micro-point sums.
  */
case class VecSumState(n: Long, sums: Array[Long])

/** Element-wise vector-sum AGGREGATOR (the UDAF rubric category,
  * SURVEY §2.4): accumulates `array<float>` rows into one dims-sized
  * state of exact scaled-integer (micro-point) sums.
  *
  * Why this exists next to `VectorSearch.labelCentroids`: the explode
  * form shuffles one row per (vector, dimension) — at 100 TB that is a
  * dims× blow-up of the exchange. An Aggregator's merge is associative,
  * so Catalyst plans it as ObjectHashAggregate WITH partial
  * aggregation: each map task emits one (label → state) row and the
  * exchange carries O(labels × tasks) states, never the exploded
  * stream. Downstream does the exact division (see
  * `ns_embed_centroids_agg`), so results are bit-identical to the
  * explode form and share its oracle.
  *
  * Per-element rounding matches Spark's `round()` (BigDecimal HALF_UP
  * — NOT `math.round`, which rounds negative halves toward +∞ and
  * would diverge on exact-half micro-points like −0.0078125f·1e6).
  * Null vectors are skipped; ragged dimensions fail loudly.
  */
object VecSumAgg extends Aggregator[Array[Float], VecSumState, VecSumState] {
  private def micro(v: Float): Long =
    BigDecimal(v.toDouble * 1000000.0)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  def zero: VecSumState = VecSumState(0L, Array.emptyLongArray)

  def reduce(b: VecSumState, v: Array[Float]): VecSumState = {
    if (v == null) b
    else {
      val s = if (b.n == 0L && b.sums.isEmpty) new Array[Long](v.length)
              else b.sums
      require(s.length == v.length,
        s"ragged vectors: ${s.length} vs ${v.length} dims")
      var i = 0
      while (i < v.length) { s(i) += micro(v(i)); i += 1 }
      VecSumState(b.n + 1, s)
    }
  }

  def merge(a: VecSumState, b: VecSumState): VecSumState =
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      require(a.sums.length == b.sums.length,
        s"ragged vectors: ${a.sums.length} vs ${b.sums.length} dims")
      val s = a.sums.clone()
      var i = 0
      while (i < s.length) { s(i) += b.sums(i); i += 1 }
      VecSumState(a.n + b.n, s)
    }

  def finish(b: VecSumState): VecSumState = b
  def bufferEncoder: Encoder[VecSumState] = Encoders.product[VecSumState]
  def outputEncoder: Encoder[VecSumState] = Encoders.product[VecSumState]
}
