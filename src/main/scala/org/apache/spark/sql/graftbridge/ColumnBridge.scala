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
}
