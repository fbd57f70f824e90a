package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ShiftLeft, ShiftRight}
import org.apache.spark.sql.graftshim.ColumnBridge

/** Column-shift bit operations. Catalyst's ShiftLeft/ShiftRight expressions
  * accept an arbitrary shift-amount *expression* (SQL `shiftright(x, y)`
  * works with a column y), but the Scala `functions` API only exposes
  * `Int` shift amounts — these wrappers lift the full expression form into
  * Columns so higher-order-function lambdas can shift by a lambda variable.
  * Both expressions are codegen'd (no fallback).
  */
object BitOps {
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  def shiftRight(x: Column, bits: Column): Column =
    col(ShiftRight(expr(x), expr(bits)))

  def shiftLeft(x: Column, bits: Column): Column =
    col(ShiftLeft(expr(x), expr(bits)))
}
