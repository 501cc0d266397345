package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's `private[sql]` Column ↔ Expression conversions —
  * the supported pattern for libraries shipping custom Catalyst expressions
  * (Spark 4 wraps Column around ColumnNode instead of Expression). */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a custom LogicalPlan as a DataFrame (Dataset.ofRows is
    * private[sql]) — needed by whole-operator extensions like
    * [[graft.plans.TopKPerGroup]]. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** EAGER Column → Expression conversion (the default bridge wraps the
    * ColumnNode lazily in a `ColumnNodeExpression`, which standard Dataset
    * entry points convert during plan construction — a custom LogicalPlan
    * built directly must convert up front, or the non-serializable wrapper
    * survives into the physical plan's task closures). */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan
}
