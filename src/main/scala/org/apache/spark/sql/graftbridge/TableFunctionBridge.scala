package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Table-function registration bridge. Spark's SQL table-valued functions
  * (`SELECT ... FROM fn(args)`) resolve through the session's
  * `TableFunctionRegistry`, which — like the scalar registry
  * ([[ColumnBridge.registerFunction]]) — sits behind `private[sql]`
  * session state. This shim lets the library register whole-operator
  * entry points (the graft native as-of join) as SQL-callable table
  * functions on a LIVE session.
  */
object TableFunctionBridge {

  /** Register `name` as a table-valued function on `spark`. The builder
    * receives the parsed argument expressions and must return a RESOLVED
    * logical plan (the analyzer treats the returned plan as a leaf
    * relation). Re-registration replaces the previous builder, so calls
    * are idempotent.
    */
  def register(
      spark: SparkSession,
      name: String,
      usage: String,
      builder: Seq[Expression] => LogicalPlan): Unit = {
    val info = new ExpressionInfo(
      "graft", null, name, usage, "", "", "", "table_funcs", "4.0.0", "", "built-in")
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
  }
}
