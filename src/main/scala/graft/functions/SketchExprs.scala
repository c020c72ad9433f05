package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Column API over Catalyst's bloom-filter expressions (the machinery
  * behind Spark's runtime row filtering, which the SQL registry does not
  * expose). Keys are xxhash64-hashed on both the build and probe side,
  * matching InjectRuntimeFilter's own usage.
  */
object SketchExprs {

  /** Aggregate a bloom filter over `key` (sized for `expectedItems`).
    * Returns the serialized filter as binary — bytes on the driver,
    * never data.
    */
  def bloomFilterAgg(key: Column, expectedItems: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(key))), expectedItems)
      .toAggregateExpression())

  /** Probe a serialized bloom filter: false ⇒ definitely absent,
    * true ⇒ probably present (no false negatives).
    */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(key)))))
}
