package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** LogicalPlan ⇄ DataFrame bridge. Spark 4 scoped `Dataset.ofRows` to
  * `private[sql]`, so libraries that introduce their own logical operators
  * (the graft as-of join) wrap plans into DataFrames through this shim —
  * the same subpackage pattern as [[ColumnBridge]].
  */
object PlanBridge {

  /** Wrap an (already resolved) logical plan into a DataFrame on `spark`. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan backing `df` — resolved attributes included. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
