package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4.x moved the `Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils` (private[sql]); this
  * object lives in a subpackage of `org.apache.spark.sql` purely to
  * re-export it for graft's custom expressions.
  */
object shim {
  def col(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def agg(f: AggregateFunction): Column =
    ExpressionUtils.column(f.toAggregateExpression())
}
