package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column↔Expression converters
  * (Spark 4 removed the public `Column(expr)` constructor). Lives in an
  * org.apache.spark.sql subpackage purely for access; everything else
  * in this repo stays on the public API. */
object ExprBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
