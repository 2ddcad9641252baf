package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 moved `Column` to a backend-neutral API holding a
  * `ColumnNode`; the classic converter (`ExpressionUtils`) is
  * `private[sql]`, so the one place graft needs it — wrapping a custom
  * `Expression` that carries non-literal state (e.g. a bloom filter's
  * word array) into a `Column` — goes through this package-local shim.
  * Everything else in graft uses the public functions API.
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a hand-built logical plan — the entry point a
    * custom LogicalPlan node (graft.plans.GroupedTopKPlan) needs;
    * `Dataset.ofRows` is `private[sql]` in the classic backend. */
  def ofRows(spark: SparkSession,
    plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
    : DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
