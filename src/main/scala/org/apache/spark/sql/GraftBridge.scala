package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column <-> Expression conversion
  * (Spark 4 moved it behind classic.ExpressionUtils). Lives in the
  * org.apache.spark.sql package solely to satisfy the access
  * modifier; the engine's own code stays in graft.*.
  */
object GraftBridge {
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
