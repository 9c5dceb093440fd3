package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed `Column.expr`/`new Column(expr)` from the public
  * (Connect-compatible) API; the classic bridge is `private[sql]`.
  * This shim — in a subpackage of org.apache.spark.sql, the sanctioned
  * extension-library pattern — re-exposes the two conversions the graft
  * custom expressions need. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
