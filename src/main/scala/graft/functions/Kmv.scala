package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values / bottom-k theta) distinct sketch.
  *
  * Keeps the k smallest distinct 64-bit hash values seen; the k-th
  * minimum estimates distinct cardinality as (k-1)/u_k with u_k the
  * k-th minimum mapped to the unit interval. Unlike HLL, two KMV
  * sketches support SET ALGEBRA beyond union: the bottom-k of the
  * union is a uniform sample of the combined key space, so the
  * fraction of it present in BOTH inputs estimates |A ∩ B| — the
  * overlap measurement (train-corpus vs benchmark, domain vs domain)
  * that q_profile_approx's HLL columns cannot express.
  *
  * Mergeable (merge = combine minima, take k) ⇒ Spark runs it with
  * map-side partial aggregation like any built-in agg; the sketch is
  * value-deterministic (minima are a set property), so results never
  * depend on partitioning — KmvSpec asserts that. Std error ~ 1/√k
  * (k = 256 → ~6%).
  *
  * Buffer is a sorted Array[Long] of SIGN-FLIPPED hashes (h ^
  * Long.MinValue) so the natural signed order equals unsigned hash
  * order; the array is bounded at k, and once saturated each row costs
  * one branch unless it beats the current k-th minimum (expected
  * inserts per partition ≈ k·ln n — vanishing at scale).
  */
final case class KmvBuf(var vs: Array[Long])

object Kmv extends Aggregator[Long, KmvBuf, Array[Long]] {

  val K = 256

  /** Signed ⇒ unsigned-order domain. */
  @inline def flip(h: Long): Long = h ^ Long.MinValue

  override def zero: KmvBuf = KmvBuf(Array.emptyLongArray)

  override def reduce(b: KmvBuf, hash: Long): KmvBuf = {
    val x = flip(hash)
    val a = b.vs
    if (a.length >= K && x >= a(a.length - 1)) return b
    val pos = java.util.Arrays.binarySearch(a, x)
    if (pos >= 0) return b // already present
    val ins = -pos - 1
    val grown = if (a.length < K) a.length + 1 else K
    val out = new Array[Long](grown)
    System.arraycopy(a, 0, out, 0, ins)
    out(ins) = x
    System.arraycopy(a, ins, out, ins + 1, grown - ins - 1)
    b.vs = out
    b
  }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
    if (b.vs.isEmpty) return a
    if (a.vs.isEmpty) { a.vs = b.vs; return a }
    val merged = (a.vs ++ b.vs).distinct
    java.util.Arrays.sort(merged)
    a.vs = merged.take(K)
    a
  }

  override def finish(b: KmvBuf): Array[Long] = b.vs

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** k-th minimum as a fraction of the unsigned 64-bit space. */
  private def unit(x: Long): Double =
    (x.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)

  /** Distinct-count estimate: exact below k, (k-1)/u_k beyond. */
  def estimate(sk: Array[Long]): Double =
    if (sk.length < K) sk.length.toDouble
    else (K - 1).toDouble / unit(sk(K - 1))

  /** (|A∪B| estimate, |A∩B| estimate): bottom-k of the union is a
    * uniform sample of A∪B; the fraction of it present in both sketches
    * scales the union estimate down to the intersection.
    */
  def overlap(a: Array[Long], b: Array[Long]): (Double, Double) = {
    val union = (a ++ b).distinct
    java.util.Arrays.sort(union)
    val bk = union.take(K)
    val estU =
      if (bk.length < K) bk.length.toDouble else (K - 1).toDouble / unit(bk(K - 1))
    val inA = a.toSet
    val inB = b.toSet
    val common = bk.count(v => inA.contains(v) && inB.contains(v))
    (estU, estU * common / bk.length.max(1))
  }
}
