package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column` implementation-agnostic; converting between a
  * `Column` and its Catalyst `Expression` goes through the sql-private
  * `classic.ExpressionUtils`. This shim (inside the `org.apache.spark.sql`
  * package so the `private[sql]` member is visible) is the single access
  * point our custom expressions use. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
