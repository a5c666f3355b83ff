package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column representation-agnostic; the Expression<->Column
  * bridge (`classic.ExpressionUtils`) is private[sql]. This shim lives in
  * an org.apache.spark.sql subpackage to expose exactly that bridge to
  * graft's custom Catalyst expressions — the same pattern Spark-extension
  * libraries use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
