package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils, Spark 4.x). Lives in
  * the spark.sql package solely to satisfy the access modifier; the
  * engine's own code goes through graft.functions. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
