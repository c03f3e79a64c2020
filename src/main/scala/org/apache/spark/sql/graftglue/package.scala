package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 split the public `Column` from Catalyst `Expression`
  * (Spark Connect); the classic bridge lives behind `private[sql]`.
  * This tiny glue package — the standard extension-library idiom —
  * re-exposes Expression↔Column conversion to the graft library so
  * custom Catalyst expressions can be used as first-class `Column`s
  * without a session-scoped function registry.
  */
package object graftglue {
  def exprToColumn(e: Expression): Column = ExpressionUtils.column(e)
  def columnToExpr(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a raw logical plan (analyzed eagerly) — the bridge a
    * custom LogicalPlan operator needs to surface as a user DataFrame.
    */
  def dfFromPlan(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (resolved attributes). */
  def analyzedPlanOf(df: DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
