package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between custom Catalyst [[Expression]]s and the public
  * [[Column]] API. Spark 4 made `Column(Expression)` private[sql]
  * (columns wrap `ColumnNode`s now), so engine code living outside
  * `org.apache.spark.sql` goes through this one-file shim, which is
  * allowed to call `classic.ExpressionUtils`.
  */
object GraftColumn {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def apply(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column back into its Catalyst expression. */
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
