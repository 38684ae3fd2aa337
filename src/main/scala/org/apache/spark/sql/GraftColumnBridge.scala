package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Column↔Expression converters (Spark 4
  * made Column a ColumnNode wrapper; `classic.ExpressionUtils` is the
  * supported internal accessor) plus the Dataset-from-LogicalPlan
  * constructor a custom logical operator needs. Lives in the sql
  * package solely to satisfy the access modifiers — keep it to these
  * three calls. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  /** Test hook: are any DataFrames currently cached? Used by the cache-
    * hygiene spec to assert anchor-device queries release their persists. */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
