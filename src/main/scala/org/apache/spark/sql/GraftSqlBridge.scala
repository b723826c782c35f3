package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression converters for graft's native expressions.
  *
  * Spark 4 moved these behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so third-party
  * expression libraries use the standard technique of a one-file shim in
  * the `org.apache.spark.sql` package — the same accessor surface
  * `Column(expr)` exposed publicly in Spark 3.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
