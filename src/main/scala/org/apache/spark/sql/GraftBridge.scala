package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made the Column <-> Expression conversions `private[sql]`
  * (columnNodeSupport.scala). Extension libraries that define native
  * Catalyst expressions need exactly these two calls, so this bridge
  * re-exports them from inside the sql package — no Spark internals are
  * modified or shadowed. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
