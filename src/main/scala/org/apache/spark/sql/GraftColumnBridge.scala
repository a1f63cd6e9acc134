package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the Column ↔ Expression converters, which are
  * `private[sql]` in Spark 4.x (the classic Column is backed by
  * ColumnNodes). Standard shim for libraries that ship custom Catalyst
  * expressions; no Spark internals are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
