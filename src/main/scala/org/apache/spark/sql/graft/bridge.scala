package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column constructor for custom Catalyst expressions.
  *
  * Spark 4 made `Column(expr)` private[sql]; the supported extension
  * points are SparkSessionExtensions (session-scoped) or this
  * package-bridge (session-independent). We need session-independence:
  * the driver contract may call [[graft.SparkEntry.entry]] with a session
  * we did not build, where injected functions would not exist.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
