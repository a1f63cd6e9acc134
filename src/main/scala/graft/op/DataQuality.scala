package graft.op

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rules-driven data-quality audit — the validation pass an ingestion
  * pipeline runs before publishing a batch (the reference enforces its
  * version of this ad hoc: KeyError on missing fields, filtered
  * malformed rows; here it is a declarative, one-pass report).
  *
  * All row-level rules are evaluated in a SINGLE aggregation over one
  * scan — each rule is a conditional-sum column, so 10 rules cost the
  * same shuffle as one (map-side partial aggregation of a 1-row
  * frame). Cross-table rules (referential integrity) are anti-join
  * counts, one per foreign key. Output is long-form `(rule,
  * n_violations)` so downstream alerting can threshold per rule.
  */
object DataQuality {

  /** One-pass audit: `rules` maps rule name → VIOLATION predicate.
    * Output: (rule, n_violations), one row per rule.
    */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty)
    val agg = df.agg(
      sum(when(rules.head._2, 1L).otherwise(0L)).as(rules.head._1),
      rules.tail.map { case (n, p) =>
        sum(when(p, 1L).otherwise(0L)).as(n) }: _*)
    // unpivot the 1-row wide frame to long form (stack is one
    // projection — no extra pass)
    val stackArgs = rules.map { case (n, _) => s"'$n', coalesce(`$n`, 0L)" }
      .mkString(", ")
    agg.select(expr(
      s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)"))
  }

  /** Referential-integrity violation count: rows of `child` whose
    * `childKey` has no match in `parent.parentKey` (NULL child keys are
    * orphans too — a null FK can't reference anything). Anti-join,
    * broadcast-eligible when the parent key set is small.
    */
  def orphanCount(child: DataFrame, childKey: String, parent: DataFrame,
                  parentKey: String, rule: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(rule).as("rule"), col("n_violations"))

  /** Duplicate-key count: rows beyond the first per `key` value. */
  def duplicateKeyCount(df: DataFrame, key: String, rule: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("_n"))
      .agg(coalesce(sum(col("_n") - 1L), lit(0L)).as("n_violations"))
      .select(lit(rule).as("rule"), col("n_violations"))
}
