package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access bridge: Spark 4 made Column⇄Expression conversion
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils), so the
  * graft engine exposes it from inside the sql package namespace — the
  * standard pattern for Catalyst-extending libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
