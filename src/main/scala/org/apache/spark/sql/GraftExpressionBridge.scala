package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic Column↔Expression converters, which are
  * `private[sql]` in Spark 4. Placing this shim inside the
  * `org.apache.spark.sql` package is the established pattern for Spark
  * extension libraries that expose custom Catalyst expressions as typed
  * `Column`s without a SQL-parser round trip.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
