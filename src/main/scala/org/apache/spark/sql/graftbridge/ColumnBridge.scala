package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the Column↔Expression conversion, which is private[sql] in
  * Spark 4 (org.apache.spark.sql.classic.ExpressionUtils). Living under
  * org.apache.spark.sql makes the accessor visible; this is the standard
  * extension-library technique for exposing custom Catalyst expressions as
  * Columns without per-session function registration.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
