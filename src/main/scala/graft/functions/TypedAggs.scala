package graft.functions

import graft.Schemas.Event
import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed-Dataset aggregators (SURVEY.md §1.3): full Aggregator surface —
  * partial aggregation (map-side combine) applies, same two-phase plan
  * as built-in aggregates.
  */
object TypedAggs {

  /** Mean of Event.value as a TypedColumn for KeyValueGroupedDataset.agg. */
  val avgValue: TypedColumn[Event, Double] =
    new Aggregator[Event, (Double, Long), Double] {
      override def zero: (Double, Long) = (0.0, 0L)
      override def reduce(b: (Double, Long), e: Event): (Double, Long) =
        (b._1 + e.value, b._2 + 1)
      override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
        (a._1 + b._1, a._2 + b._2)
      override def finish(b: (Double, Long)): Double =
        if (b._2 == 0) 0.0 else b._1 / b._2
      override def bufferEncoder: Encoder[(Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }.toColumn
}
