package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KLL streaming quantile sketch (Karnin–Lang–Liberty, FOCS 2016,
  * simplified to fixed-capacity buffers) — the quantile member of the
  * engine's mergeable-sketch family: CMS (point frequency), SpaceSaving
  * (heavy hitters), HLL/KMV (distinct + set algebra), Bloom
  * (membership). `approx_percentile` answers the same question
  * single-shot; the sketch is the form a 100-TB pipeline PERSISTS —
  * per-shard/per-day sketches merge associatively into rollups without
  * re-reading data, exactly like the IVF/PQ index and the KMV store.
  *
  * Structure: level h holds items of weight 2^h in a ≤ Cap buffer.
  * A full buffer compacts: sort, keep every 2nd item (the survivor
  * parity is a DERANDOMIZED coin — xxhash of (level, length, first
  * item bits) — so the sketch is a pure function of its input stream
  * order rather than of a global RNG; KLL's ε guarantee assumes random
  * coins, so like every merge-order-dependent sketch here the bound is
  * ASSERTED EMPIRICALLY in KllSpec across distributions and
  * partitionings, the SpaceSaving convention), survivors push into
  * level h+1, cascading while any buffer overflows. With Cap = 256 the
  * observed rank error on the fixture distributions stays well under
  * the ~2/Cap ≈ 0.8% classical estimate's 3× safety margin KllSpec
  * asserts.
  *
  * Exactness floor: until level 0 first compacts (n ≤ Cap) the sketch
  * IS the data and every quantile is exact — KllSpec pins that too.
  */
final case class KllBuf(var levels: Array[Array[Double]], var n: Long)

object Kll extends Aggregator[Double, KllBuf, Array[Double]] {

  val Cap = 256

  override def zero: KllBuf = KllBuf(Array(Array.emptyDoubleArray), 0L)

  /** Deterministic compaction coin: which parity survives. */
  private def coin(level: Int, a: Array[Double]): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
      java.lang.Double.doubleToLongBits(a(0)) ^ (a.length.toLong << 32),
      level.toLong)
    (h & 1L).toInt
  }

  private def compactAll(b: KllBuf): Unit = {
    var h = 0
    while (h < b.levels.length) {
      if (b.levels(h).length > Cap) {
        val a = b.levels(h)
        java.util.Arrays.sort(a)
        val off = coin(h, a)
        val kept = Array.tabulate((a.length - off + 1) / 2)(i => a(off + 2 * i))
        b.levels(h) = Array.emptyDoubleArray
        if (h + 1 >= b.levels.length)
          b.levels = b.levels :+ Array.emptyDoubleArray
        b.levels(h + 1) = b.levels(h + 1) ++ kept
      }
      h += 1
    }
  }

  override def reduce(b: KllBuf, v: Double): KllBuf = {
    b.levels(0) = b.levels(0) :+ v
    b.n += 1
    if (b.levels(0).length > Cap) compactAll(b)
    b
  }

  override def merge(a: KllBuf, b: KllBuf): KllBuf = {
    if (b.n == 0) return a
    if (a.n == 0) return b
    val depth = math.max(a.levels.length, b.levels.length)
    val out = Array.tabulate(depth) { h =>
      val x = if (h < a.levels.length) a.levels(h) else Array.emptyDoubleArray
      val y = if (h < b.levels.length) b.levels(h) else Array.emptyDoubleArray
      x ++ y
    }
    a.levels = out
    a.n += b.n
    compactAll(a)
    a
  }

  /** Serialized sketch: [n, level, count, items..., level, ...] packed
    * flat so the output encoder stays a primitive array.
    */
  override def finish(b: KllBuf): Array[Double] = {
    val parts = b.levels.zipWithIndex.filter(_._1.nonEmpty)
    val size = 1 + parts.map(2 + _._1.length).sum
    val out = new Array[Double](size)
    out(0) = b.n.toDouble
    var i = 1
    parts.foreach { case (items, h) =>
      out(i) = h.toDouble; out(i + 1) = items.length.toDouble; i += 2
      System.arraycopy(items, 0, out, i, items.length)
      i += items.length
    }
    out
  }

  override def bufferEncoder: Encoder[KllBuf] = Encoders.product[KllBuf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  /** Quantile estimate from a serialized sketch: smallest item whose
    * cumulative weight reaches p·n under the (value asc, weight) sort.
    */
  def quantile(sk: Array[Double], p: Double): Double = {
    val n = sk(0)
    // An empty sketch (n=0, serialized as [0.0] — e.g. the merge/finish
    // of two zero buffers) has no items: falling through to sorted.last
    // would throw NoSuchElementException deep in an executor. A quantile
    // of nothing is NaN, same convention as percentile() over 0 rows.
    if (n <= 0 || sk.length <= 1) return Double.NaN
    val items = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 1
    while (i < sk.length) {
      val h = sk(i).toInt; val cnt = sk(i + 1).toInt; i += 2
      val w = 1L << h
      var j = 0
      while (j < cnt) { items += ((sk(i + j), w)); j += 1 }
      i += cnt
    }
    val sorted = items.sortBy(_._1)
    val target = math.max(1.0, math.ceil(p * n))
    var cum = 0L
    var k = 0
    while (k < sorted.length) {
      cum += sorted(k)._2
      if (cum >= target) return sorted(k)._1
      k += 1
    }
    sorted.last._1
  }
}
