package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from custom Catalyst [[Expression]]s to the public
  * [[Column]] API. Spark 4 made `Column(expr)` private[sql]; placing
  * this one-liner inside the `org.apache.spark.sql` package is the
  * standard extension-library technique (same pattern as
  * spark connectors that ship custom expressions).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
