package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving heavy-hitter sketch (Metwally–Agrawal–El Abbadi 2005),
  * the bounded-memory "top-k frequent items" summary that completes the
  * sketch family: CMS answers point-frequency queries, HLL/KMV answer
  * distinct counts, SpaceSaving answers WHICH items are frequent — the
  * vocabulary/boilerplate probe that at 100 TB replaces an unbounded
  * exact word count when only the head of the distribution matters.
  *
  * M counters; a hit increments, a miss over a full sketch evicts the
  * minimum counter and inherits its count + 1 (the classic overcount:
  * est(t) ≥ true(t) always, est(t) ≤ true(t) + n/M). Merge (Agarwal et
  * al., Mergeable Summaries 2013 shape): an item absent from a full
  * sketch has true count ≤ that sketch's minimum counter, so the merged
  * estimate sums per-side counts with the side's FLOOR (min counter if
  * full, else 0) standing in for absence, then keeps the top M — both
  * guarantees survive with error n_A/M + n_B/M ⇒ Spark runs it with
  * map-side partial aggregation like any built-in agg.
  *
  * Counter VALUES depend on partition merge order (unlike KMV's set
  * property), so the declared query reports only the top-of-head slice
  * whose membership the fixture's zipfy vocabulary makes stable;
  * SketchTopKSpec asserts the distribution-free guarantees (overcount,
  * n/M band, heavy-hitter recall) rather than exact values.
  */
final case class SsBuf(var toks: Array[String], var cnts: Array[Long])

object SpaceSaving extends Aggregator[String, SsBuf, Map[String, Long]] {

  val M = 64

  override def zero: SsBuf = SsBuf(Array.empty, Array.emptyLongArray)

  /** Min counter if saturated — the upper bound on any absent item. */
  private def floor(b: SsBuf): Long =
    if (b.toks.length < M) 0L else b.cnts.min

  override def reduce(b: SsBuf, tok: String): SsBuf = {
    val i = b.toks.indexOf(tok)
    if (i >= 0) { b.cnts(i) += 1; return b }
    if (b.toks.length < M) {
      b.toks = b.toks :+ tok
      b.cnts = b.cnts :+ 1L
      return b
    }
    var min = 0
    var j = 1
    while (j < b.cnts.length) { if (b.cnts(j) < b.cnts(min)) min = j; j += 1 }
    val inherited = b.cnts(min)
    b.toks(min) = tok
    b.cnts(min) = inherited + 1
    b
  }

  override def merge(a: SsBuf, b: SsBuf): SsBuf = {
    if (b.toks.isEmpty) return a
    if (a.toks.isEmpty) { a.toks = b.toks; a.cnts = b.cnts; return a }
    val fA = floor(a)
    val fB = floor(b)
    val mA = a.toks.iterator.zip(a.cnts.iterator).toMap
    val mB = b.toks.iterator.zip(b.cnts.iterator).toMap
    val merged = (mA.keySet ++ mB.keySet).toArray
      .map(t => t -> (mA.getOrElse(t, fA) + mB.getOrElse(t, fB)))
      // count desc, token asc: a deterministic cut when counts tie
      .sortBy { case (t, c) => (-c, t) }
      .take(M)
    a.toks = merged.map(_._1)
    a.cnts = merged.map(_._2)
    a
  }

  override def finish(b: SsBuf): Map[String, Long] =
    b.toks.iterator.zip(b.cnts.iterator).toMap

  override def bufferEncoder: Encoder[SsBuf] = Encoders.product[SsBuf]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
