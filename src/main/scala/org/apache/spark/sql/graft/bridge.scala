package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column / plan constructors for custom Catalyst surface.
  *
  * Spark 4 made `Column(expr)` and `Dataset.ofRows` private[sql]; the
  * supported extension points are SparkSessionExtensions
  * (session-scoped) or this package-bridge (session-independent). We
  * need session-independence: the driver contract may call
  * [[graft.SparkEntry.entry]] with a session we did not build, where
  * injected functions would not exist.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame — the constructor for
    * custom logical operators like [[graft.plans.AsOfJoin]].
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
