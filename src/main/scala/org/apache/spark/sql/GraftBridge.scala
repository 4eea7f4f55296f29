package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Thin bridge into Spark's classic (non-Connect) internals, needed because
  * Spark 4 made the Column(Expression) constructor and Dataset.ofRows
  * private[sql]. Everything here is a one-line delegation to public Spark
  * source (sql/core: columnNodeSupport.scala, classic/Dataset.scala).
  */
object GraftBridge {
  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def col(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column back to its Catalyst expression. */
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Execute an already-built logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def plan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
