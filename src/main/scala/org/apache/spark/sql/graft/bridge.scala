package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ⇄ Column bridge. Spark 4 made Column expression-agnostic
  * (ColumnNode); the conversion helpers live in the private[sql]
  * `classic.ExpressionUtils`, so extension libraries shipping custom
  * Catalyst expressions expose them via a shim in the sql package —
  * the same technique Spark-native extension projects use.
  */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
