package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface: Column ↔ Catalyst Expression
  * conversion for our custom native expressions (Spark 4 removed the
  * public `new Column(expr)` constructor; `classic.ExpressionUtils` is the
  * blessed internal path). */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
