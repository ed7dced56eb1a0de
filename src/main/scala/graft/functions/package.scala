package graft

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column-facing wrappers for the engine's native Catalyst expressions.
  * (Spark 4 moved Column↔Expression bridging to classic.ExpressionUtils,
  * reached via GraftColumnBridge.) */
package object functions {

  private def toExpr(c: Column): Expression = GraftColumnBridge.expression(c)
  private def toColumn(e: Expression): Column = GraftColumnBridge.column(e)

  /** 64-bit SimHash of a token-array column (see [[SimHash64]]). */
  def simhash64(tokens: Column): Column =
    toColumn(SimHash64(toExpr(tokens)))
}
