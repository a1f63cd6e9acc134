package graft.op

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-event) join — an operator Spark's join zoo lacks.
  *
  * `asof(left, right)` matches each left row with the single latest
  * right row whose time is ≤ the left row's time (backward; forward =
  * earliest ≥), per key. The naive formulation — range join + window —
  * explodes quadratically per key before pruning, which is exactly what
  * a 100 TB event table cannot afford.
  *
  * This is the scalable formulation: union both sides tagged, ONE
  * shuffle on the key, one ordered window pass carrying the last-seen
  * right row forward as a struct (atomic: all right columns come from
  * the SAME matched row, never mixed across rows). Linear work,
  * partitioned by key — the same shape DuckDB/kdb implement natively,
  * expressed in Catalyst operators so whole-stage codegen applies.
  *
  * Ties: right rows sort before left rows at equal time, so a
  * same-timestamp right row IS matched (inclusive bound, matching
  * DuckDB ASOF `>=` semantics). If several right rows share (key,
  * time), pass `rightTiebreak` to make the survivor deterministic
  * (highest tiebreak wins) — without it the winner is shuffle-order
  * dependent, like any under-specified ORDER BY.
  */
object AsofJoin {

  /** @param rightCols  right columns to carry onto matched left rows
    *                   (emitted as `asof_<name>`, plus `asof_time`);
    *                   must not clash with left column names
    * @param direction  "backward" (latest right ≤ left time) or
    *                   "forward" (earliest right ≥ left time)
    * Left rows with no match keep null `asof_*` columns (left-join
    * semantics).
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           rightCols: Seq[String],
           rightTiebreak: Option[String] = None,
           direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    require(rightCols.forall(c => !leftCols.contains(c)),
      "rightCols must not clash with left column names")
    val tb = rightTiebreak.map(c => col(c).cast("long")).getOrElse(lit(0L))
    // one struct per right row: time + carried values + tiebreak — the
    // window carries it atomically
    val rPayload = struct(
      (col(rightTime).as("_rt") +: tb.as("_tb") +:
        rightCols.map(c => col(c).as(c))): _*)
    val rSide = right
      .select((col(key) +: col(rightTime).as("_t") +: lit(0).as("_side") +:
        tb.as("_tb") +: rPayload.as("_rrow") +:
        leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val lSide = left
      .select((col(key) +: col(leftTime).as("_t") +: lit(1).as("_side") +:
        lit(Long.MaxValue).as("_tb") +:
        lit(null).cast(rSide.schema("_rrow").dataType).as("_rrow") +:
        leftCols.filterNot(_ == key).map(col)): _*)
    val all = lSide.unionByName(rSide.select(lSide.columns.map(col): _*))
    // backward: scan ascending, right(0) before left(1) at equal time so
    // the inclusive bound holds; among equal-time right rows the higher
    // tiebreak is nearer the left row in scan order → last() wins.
    // forward: scan descending; right rows must still precede the left
    // rows they can match, and the LOWER tiebreak must win (= "first"
    // right row), hence _tb descending in the scan so last() = lowest.
    val ordering =
      if (direction == "backward") Seq(col("_t").asc, col("_side").asc, col("_tb").asc)
      else Seq(col("_t").desc, col("_side").asc, col("_tb").desc)
    val w = Window.partitionBy(key).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = all.withColumn("_asof", last(col("_rrow"), ignoreNulls = true).over(w))
    matched.filter(col("_side") === 1)
      .select((leftCols.map(col) :+ col("_asof._rt").as("asof_time")) ++
        rightCols.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }
}
