package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made `Column` wrap a ColumnNode and
  * scoped the converters `private[sql]`, so third-party native expressions
  * use a shim in an `org.apache.spark.sql` subpackage — the same pattern
  * Spark-ecosystem libraries use for custom Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native function on a LIVE session (the extensions path,
    * `SparkSession.builder().withExtensions(new GraftExtensions)`, only
    * applies at session build — this covers sessions that already exist,
    * e.g. shared test/notebook sessions).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      reg: (org.apache.spark.sql.catalyst.FunctionIdentifier,
            org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
            Seq[Expression] => Expression)): Unit =
    spark.sessionState.functionRegistry.registerFunction(reg._1, reg._2, reg._3)
}
