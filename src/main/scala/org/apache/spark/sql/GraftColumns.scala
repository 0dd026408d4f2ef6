package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Same-package shim over the classic Column↔Expression converters —
  * the one documented way for a Spark-4 library to place a custom
  * Catalyst [[Expression]] that carries NON-child state (here: a
  * Broadcast handle, [[graft.functions.CosineAll]]) into a DataFrame:
  * such state cannot travel through `call_function`'s child-only
  * builder, so FunctionRegistry registration is not an option and the
  * expression must be wrapped into a [[Column]] directly. Only public
  * Spark-jar API is touched; the shim exists because the converter is
  * `private[sql]`.
  */
object GraftColumns {
  def of(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
