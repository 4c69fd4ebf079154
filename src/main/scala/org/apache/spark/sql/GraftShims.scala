package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * Minimal bridge into Spark's `private[sql]` surface, used by graft.plans:
 * building a DataFrame from a custom LogicalPlan (`Dataset.ofRows`) and
 * reading a DataFrame's analyzed plan. This is the standard pattern for
 * Spark extension libraries that add custom operators (the same access the
 * built-in connectors use); no Spark internals are modified.
 */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
