package org.apache.spark.sql

import org.apache.spark.rdd.RDD
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

  /** The checkpointed internal RDD behind a `Dataset.checkpoint`/
    * `localCheckpoint` result — the handle `Dedup.retire` needs to free
    * the blocks deterministically. `Dataset.(local)Checkpoint` is the
    * ONLY materialization that preserves outputPartitioning and
    * outputOrdering across the cut (its `LogicalRDD` carries both; the
    * `df.rdd`-then-`createDataFrame` route erases them), so iterative
    * loops that pre-shuffle a static frame once must go through it —
    * and then need this accessor to keep the owned-RDD discipline. */
  def internalRddOf(ds: Dataset[Row]): RDD[_] =
    ds.asInstanceOf[classic.Dataset[Row]].queryExecution.logical match {
      case lr: execution.LogicalRDD => lr.rdd
      case other => throw new IllegalStateException(
        s"expected a (local)checkpointed Dataset (LogicalRDD), got: ${other.nodeName}")
    }

}
