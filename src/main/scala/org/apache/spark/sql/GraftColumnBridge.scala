package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge: `classic.ExpressionUtils` is
  * `private[sql]` in Spark 4.x, so third-party Catalyst expressions need
  * this one-hop accessor to surface as `Column`s. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
