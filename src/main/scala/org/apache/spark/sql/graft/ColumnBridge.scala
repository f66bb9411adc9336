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

/** Bridge for constructing DataFrames from custom logical plans
  * (`Dataset.ofRows` is private[sql]).
  */
object PlanBridge {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset, SparkSession => CSparkSession}
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
  def logical(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.asInstanceOf[CDataFrame].queryExecution.analyzed
}
