package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression conversion (Spark 4
  * moved Column onto ColumnNode; classic conversions live in
  * org.apache.spark.sql.classic.ExpressionUtils). Sole escape hatch used
  * by graft's custom Catalyst expressions (graft.functions.TextExprs) —
  * kept to one file so the package-private surface area is auditable.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
