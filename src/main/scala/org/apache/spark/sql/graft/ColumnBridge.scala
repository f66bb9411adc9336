package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * Spark 4 removed the public `Column.expr`, so extension libraries that
  * define native Catalyst expressions reach the classic converters from
  * inside the `org.apache.spark.sql` package hierarchy (the standard
  * technique used by Spark connector/extension projects).
  */
object ColumnBridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
