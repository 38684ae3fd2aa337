package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters (Spark 4
  * made Column a ColumnNode wrapper; `classic.ExpressionUtils` is the
  * supported internal accessor). Lives in the sql package solely to
  * satisfy the access modifier — keep it to these two calls. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
