package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into spark-sql's `private[sql]` classic helpers, for graft's
  * DML resolution rule (graft.sources.GraftDmlRule): turning a resolved
  * LogicalPlan back into a DataFrame and a Catalyst Expression into a
  * Column. These are the same entry points Spark's own commands use;
  * they are package-private only because the classic/connect split made
  * them implementation details — no behavior is forked here. */
object GraftSqlBridge {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
