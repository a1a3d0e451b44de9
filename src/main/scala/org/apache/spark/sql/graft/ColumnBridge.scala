package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 moved `Column` onto ColumnNode and made the converters
  * `private[sql]`; an extension library that ships native expressions needs
  * this two-line bridge inside the `org.apache.spark.sql` package hierarchy
  * (the standard pattern for Spark-native libraries).
  *
  * `expression` converts the node tree EAGERLY (not the lazy
  * ColumnNodeExpression wrapper): a wrapper injected through the function
  * registry survives analysis unconverted and dies at codegen, while the
  * converted tree's UnresolvedFunctions resolve normally. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
}
