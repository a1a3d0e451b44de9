package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 moved `Column` onto ColumnNode and made the converters
  * `private[sql]`; an extension library that ships native expressions needs
  * this two-line bridge inside the `org.apache.spark.sql` package hierarchy
  * (the standard pattern for Spark-native libraries). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
