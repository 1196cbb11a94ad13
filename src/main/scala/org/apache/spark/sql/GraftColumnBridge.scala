package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Column ↔ Expression conversions of Spark 4
  * (org.apache.spark.sql.classic.ExpressionUtils is private[sql]); the
  * engine's custom Catalyst expressions need both directions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
