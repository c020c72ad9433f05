package graft

import java.sql.Timestamp

/** Case classes for the typed Dataset surface (SURVEY.md §1.3: Dataset[T]
  * where typed transformations pay off — typed aggregation, stateful
  * streaming). Field names/types match Tables' declared columns after
  * timestamp normalization.
  */
object Schemas {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class Document(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  final case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: Timestamp)

  final case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

  /** Output of the stateful per-user stream aggregation. */
  final case class UserStats(user_id: Long, n: Long, mean: Double, max: Double)
}
