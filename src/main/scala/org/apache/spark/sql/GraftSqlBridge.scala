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

  /** Test aid: block until the listener bus has delivered every queued
    * event, so a spec can assert on listener-observed job counts. */
  def flushListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(30000L)

  /** Column → Catalyst expression (for SQL function registration).
    * Uses the full ColumnNode converter — ExpressionUtils.expression
    * wraps the node in a lazy ColumnNodeExpression that the analyzer
    * won't descend into when returned from a FunctionBuilder, leaving
    * inner UnresolvedFunctions unresolved at execution. */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Catalyst expression → Column (inverse of [[expression]]). */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** `bloom_filter_agg(xxhash64(c), numItems, numBits)` as a Column.
    * The aggregate exists in Catalyst (it backs the optimizer's
    * runtime join filters) but has no SQL registration in Spark 4, so
    * library code builds the expression directly. */
  def bloomFilterAgg(c: Column, numItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    classic.ExpressionUtils.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(classic.ExpressionUtils.expression(c))),
        Literal(numItems), Literal(numBits)).toAggregateExpression())
  }

  /** `might_contain(<scalar-subquery>, xxhash64(c))` as a Column.
    * `might_contain` requires its bloom argument to be a constant or
    * scalar subquery (not a join-produced attribute) — the same shape
    * Spark's runtime-filter optimizer injects: the one-row aggregate
    * in `bloomDf` executes once and its value ships to every task. */
  def bloomMightContain(bloomDf: Dataset[_], c: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
    classic.ExpressionUtils.column(
      BloomFilterMightContain(
        ScalarSubquery(analyzed(bloomDf)),
        new XxHash64(Seq(classic.ExpressionUtils.expression(c)))))
  }
}
