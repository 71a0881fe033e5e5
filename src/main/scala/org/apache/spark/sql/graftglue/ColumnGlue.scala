package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column↔Expression converters — the
  * supported way for extension libraries to lift a custom Catalyst
  * `Expression` into the public `Column` API on Spark 4 (where
  * `new Column(expr)` no longer exists). Lives in the sql package tree
  * solely to satisfy the access qualifier; no Spark internals are modified. */
object ColumnGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
