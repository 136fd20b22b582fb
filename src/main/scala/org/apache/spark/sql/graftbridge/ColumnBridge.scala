package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal Column↔Expression bridge: Spark 4's Column wraps a ColumnNode
  * (Connect refactor) and the classic converters are private[sql], so
  * custom Expressions need this one-hop package-private access — the
  * standard pattern for third-party Catalyst extensions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
