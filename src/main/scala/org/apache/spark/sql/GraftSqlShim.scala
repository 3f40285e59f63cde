package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal bridge into two `private[sql]` seams third-party engines
  * need (the standard technique Spark libraries use — same package,
  * public surface kept to exactly what the library requires):
  *
  *   - turning a hand-built resolved [[LogicalPlan]] into a DataFrame
  *     (`Dataset.ofRows`), the entry point for custom logical
  *     operators;
  *   - idempotently appending a planner [[SparkStrategy]] to the live
  *     session (the in-process twin of
  *     `SparkSessionExtensions.injectPlannerStrategy`, which only
  *     helps sessions built AFTER registration).
  */
object GraftSqlShim {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }
}
