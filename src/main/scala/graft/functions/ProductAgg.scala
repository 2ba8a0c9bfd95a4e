package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact product aggregate as a typed Aggregator[IN, BUF, OUT] —
  * the grouped-aggregation counterpart of the windowed log-sum
  * product (SURVEY §4.2's "small custom aggregate" for products over
  * zeros/negatives, computed by direct multiplication instead of the
  * exp/ln round trip).
  */
object ProductAgg extends Aggregator[Double, Double, Double] {
  override def zero: Double = 1.0
  override def reduce(b: Double, a: Double): Double = b * a
  override def merge(b1: Double, b2: Double): Double = b1 * b2
  override def finish(r: Double): Double = r
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form usable in groupBy(...).agg(product(col)). */
  val product: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(ProductAgg)

  def apply(c: Column): Column = product(c)
}
