package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2b q_udaf_typed): weighted arithmetic mean.
  *
  * Input is (value, weight); the buffer carries (Σ v·w, Σ w). Merge is
  * associative/commutative, so partial aggregation (map-side combine)
  * applies — the same two-phase plan Spark uses for built-in aggregates.
  */
case class WeightedMeanBuf(var sumVW: Double, var sumW: Double)

object WeightedMean extends Aggregator[(Double, Double), WeightedMeanBuf, Double] {
  override def zero: WeightedMeanBuf = WeightedMeanBuf(0.0, 0.0)
  override def reduce(b: WeightedMeanBuf, in: (Double, Double)): WeightedMeanBuf = {
    b.sumVW += in._1 * in._2; b.sumW += in._2; b
  }
  override def merge(a: WeightedMeanBuf, b: WeightedMeanBuf): WeightedMeanBuf = {
    a.sumVW += b.sumVW; a.sumW += b.sumW; a
  }
  override def finish(b: WeightedMeanBuf): Double =
    if (b.sumW == 0.0) 0.0 else b.sumVW / b.sumW
  override def bufferEncoder: Encoder[WeightedMeanBuf] = Encoders.product[WeightedMeanBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
