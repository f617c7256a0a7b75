package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column <-> catalyst Expression converters
  * (Spark 4 moved Column onto ColumnNode; library-defined expressions that
  * take NON-expression constructor parameters — e.g. a Broadcast centroid
  * matrix — cannot go through the FunctionRegistry's `Seq[Expression] =>
  * Expression` builders without a registry round-trip per distinct
  * parameter value, so they are wrapped directly). The package placement is
  * the standard extension idiom for reaching `private[sql]` API surface. */
object ColumnBridge {
  /** Wrap a catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the catalyst expression behind a Column (pre-analysis:
    * attribute references stay unresolved until the plan analyzes). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
