package graft.op

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture application — the lakehouse MERGE primitive:
  * fold a change log of upserts and deletes into a keyed snapshot. The
  * batch dual of the reference's ON CONFLICT upsert (SURVEY §2.1 S8 /
  * §2.2 T10) extended with delete semantics, which LWW alone cannot
  * express.
  */
object Cdc {

  /** Apply a change log to a snapshot.
    *
    * `snapshot`: one row per `key` (the current table). `changes`:
    * (key, ver, op, payload...) where op ∈ {U, D} — upsert with the
    * row's payload, or delete. Per key the WINNING change is the
    * argmax of (ver, op, payload...) as one struct comparison — an
    * order-independent `max` aggregate, never a window over arrival
    * order, so the fold is deterministic under any partitioning even
    * when `ver` ties (the documented tiebreak: op 'U' > 'D' at equal
    * version, then payload order).
    *
    * Result: keys whose winning op is D disappear; keys with a winning
    * U carry the change payload; snapshot keys never touched by the
    * log pass through. A delete for an absent key is a no-op.
    *
    * Scale shape: one partial-aggregated shuffle of the change log
    * (the max(struct) combines map-side — a key's 10⁶-row history
    * crosses the wire as one struct per map task) + one key-equi
    * full-outer join against the snapshot. Both sides key-partitioned;
    * at 100 TB pre-bucket the snapshot on the key and the join is
    * co-located.
    *
    * Column contract: payload columns are `changes` minus (key, ver,
    * op) and must equal `snapshot` minus key, in the same order.
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, key: String,
                   ver: String, opCol: String): DataFrame = {
    val payload = changes.columns.filterNot(Set(key, ver, opCol)).toSeq
    require(snapshot.columns.filterNot(_ == key).toSeq == payload,
      s"snapshot payload ${snapshot.columns.toSeq} must match changes payload $payload")
    require(payload.nonEmpty, "changes must carry at least one payload column")
    // The merge reserves internal names `_op` and `_c_<payload>`; an
    // input column occupying one of them would pass the equality check
    // above and then resolve ambiguously in the merge select — reject
    // loudly instead of mis-merging.
    val reserved = Set("_op") ++ payload.map(c => s"_c_$c")
    val clash = (snapshot.columns ++ changes.columns).toSeq.distinct
      .filter(reserved)
    require(clash.isEmpty,
      s"column name(s) $clash collide with Cdc's reserved internals " +
        "(`_op`, `_c_<payload>`); rename them before applyChanges")
    val winning = changes
      .groupBy(col(key))
      .agg(max(struct((Seq(ver, opCol) ++ payload).map(col): _*)).as("w"))
      .select(col(key) +: (col(s"w.$opCol").as("_op") +:
        payload.map(c => col(s"w.$c").as(s"_c_$c"))): _*)
    snapshot.join(winning, Seq(key), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(col(key) +: payload.map(c =>
        when(col("_op").isNotNull, col(s"_c_$c"))
          .otherwise(col(c)).as(c)): _*)
  }
}
