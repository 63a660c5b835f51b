package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic Column↔Expression converters, which are
  * `private[sql]` in Spark 4. This is the supported pattern for
  * libraries that define custom Catalyst expressions and expose them as
  * `Column`s.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
