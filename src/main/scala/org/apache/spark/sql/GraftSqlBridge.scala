package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into package-private Spark factory methods, the standard
  * pattern for extension libraries that introduce custom logical plans
  * (a DataFrame can only be built from a LogicalPlan via
  * `Dataset.ofRows`, which is `private[sql]`).
  */
object GraftSqlBridge {

  /** Build a DataFrame from a custom logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
