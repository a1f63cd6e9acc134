package graft.op

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Touch→conversion attribution over an events table — the behavioral
  * operator behind "which click gets credit for this purchase". The
  * reference's event payloads model exactly this kind of typed event
  * feed (SURVEY.md §1.2); attribution is its standard downstream.
  *
  * Scale shape: one user-keyed equi-join with the time band as a
  * post-join filter — per-user event counts bound the join fan-out, a
  * skewed power-user key is AQE's skew-join case, and nothing here
  * widens beyond (touches × qualifying conversions). The argmax is an
  * order-independent `max(struct(ts, id))` aggregate, not a window, so
  * the plan stays one shuffle on the user key plus one on the
  * conversion id.
  */
object Attribution {

  /** Last-touch attribution: each conversion is credited to the most
    * recent touch of the same user at-or-before it and within
    * `horizonNs` (long nanos, matching the events table's `ts`
    * contract). Ties on touch time break to the LARGEST touch id (the
    * latest-written row of that instant). Conversions with no
    * qualifying touch are dropped (inner semantics — the unattributed
    * set is the anti-join, a one-line variant).
    *
    * Output: (user, convId, conv_ts, touchId, touch_ts, n_touches)
    * where n_touches counts every qualifying candidate.
    */
  def lastTouch(touches: DataFrame, conversions: DataFrame, user: String,
                ts: String, id: String, horizonNs: Long): DataFrame = {
    require(horizonNs >= 0)
    val tch = touches.select(col(user).as("_u"), col(ts).as("_tts"),
      col(id).as("_tid"))
    val cnv = conversions.select(col(user).as("_u"), col(ts).as("_cts"),
      col(id).as("_cid"))
    cnv.join(tch, Seq("_u"))
      .filter(col("_tts") <= col("_cts") &&
        col("_cts") - col("_tts") <= horizonNs)
      .groupBy(col("_u").as(user), col("_cid"), col("_cts"))
      .agg(max(struct(col("_tts").as("t"), col("_tid").as("i"))).as("_best"),
        count(lit(1)).as("n_touches"))
      .select(col(user), col("_cid").as(s"conv_$id"),
        col("_cts").as(s"conv_$ts"), col("_best.i").as(s"touch_$id"),
        col("_best.t").as(s"touch_$ts"), col("n_touches"))
  }
}
