package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{classic, DataFrame, Dataset, SparkSession}

/** Bridge into `private[sql]` Spark internals the public API doesn't expose:
  * building a DataFrame from a hand-constructed Catalyst [[LogicalPlan]] and
  * reading a Dataset's analyzed plan. Lives under `org.apache.spark.sql` so
  * the `private[sql]` members resolve (standard public-code idiom for
  * Catalyst extension libraries).
  */
object GraftSql {

  /** Wrap a (possibly partially unresolved) logical plan as a DataFrame.
    * The session's analyzer re-runs on the plan, so unresolved attributes /
    * type coercions introduced by plan surgery are resolved here.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed (resolved, pre-optimization) plan of a Dataset. */
  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** The optimized plan (post-Catalyst-optimizer) — used in plan assertions. */
  def optimized(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.optimizedPlan

  /** Wrap a (resolved) Catalyst expression as a user-facing Column. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** The Catalyst expression behind a user-facing Column (possibly
    * unresolved — the analyzer resolves it when the plan is analyzed).
    */
  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
