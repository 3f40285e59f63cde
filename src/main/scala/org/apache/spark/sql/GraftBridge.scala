package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard seam for libraries that contribute native Catalyst
  * expressions (Spark 4 moved Column onto ColumnNode; `classic.
  * ExpressionUtils` is the supported classic-session conversion). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
