package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal shim into Spark's `private[sql]` Column↔Expression converters so
  * graft's native Catalyst expressions can be exposed as `Column`s (the
  * standard extension-library pattern; no Spark internals are modified).
  */
object GraftColumns {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
