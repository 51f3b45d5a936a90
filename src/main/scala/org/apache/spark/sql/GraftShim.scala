package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` classic Column<->Expression converters
  * (Spark 4 unified-Column API). Lives in the org.apache.spark.sql
  * namespace solely to satisfy the access modifier — the standard
  * pattern for third-party Catalyst expressions on Spark 4.
  */
object GraftShim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
