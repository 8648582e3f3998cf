package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Thin bridge to the classic Column↔Expression converters, which
  * are `private[sql]` at the Scala level (public in bytecode). This
  * is the standard extension-library pattern for exposing custom
  * Catalyst expressions as Columns without a per-session function
  * registry round-trip.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
