package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column.expr` / `new Column(expr)` bridge;
  * the supported path for libraries shipping custom Catalyst expressions is
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]` —
  * hence this one shim object inside the `org.apache.spark.sql` namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
