package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ↔ Expression converters so custom
  * Catalyst expressions (graft.functions._) can be exposed through the
  * public Column API. Lives under org.apache.spark.sql to satisfy the
  * package-private access — the usual pattern for Spark extension
  * libraries built on the classic (non-Connect) API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
