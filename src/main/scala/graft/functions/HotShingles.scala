package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Driver-built hot-shingle membership for the df-capped MinHash signing
  * ([[KeepCold]] / queries.Similarity.cappedSigsOf) — the round-14 form
  * of what was a bare `java.util.HashSet` riding in the expression:
  *
  *  - '''identity-stable equality''': `equals`/`hashCode` compare a
  *    precomputed 64-bit content fingerprint, never the payload.
  *    Catalyst canonicalization and plan comparison call expression
  *    equality freely; the case-class HashSet field made every such
  *    call O(|set|) (and a transform pass O(plan × set) — the round-13
  *    ADVICE finding). Two plans built from the same hot set still
  *    canonicalize equal, because the fingerprint is content-derived.
  *  - '''broadcast payload''': the set/filter ships as a
  *    TorrentBroadcast — one copy per executor fetched on first use —
  *    instead of serializing into the task binary of every stage whose
  *    plan embeds the expression. The holder itself serializes as the
  *    broadcast HANDLE (a few bytes).
  *  - '''two representations''': an exact `HashSet` up to
  *    `Similarity.HotSetMaxEntries` entries, and above that a Bloom
  *    filter over the hot shingles (the fallback the round-13 hard
  *    `require` only documented). Bloom false positives drop a few
  *    extra COLD shingles — symmetrically for every document (the
  *    filter is fixed corpus-wide), so the estimator still signs one
  *    consistent universe; fpp is chosen small enough that the drift
  *    from the exact twins' df universe is negligible
  *    (HotBucketSpec pins pair parity with the Bloom path forced on).
  */
sealed trait HotShingles extends Serializable {
  /** Content-derived 64-bit fingerprint — the identity used by
    * expression equality and plan canonicalization.
    */
  def fingerprint: Long

  /** True only for an exact EMPTY set (keepCold is then the identity —
    * the kernel returns its input without copying).
    */
  def isEmpty: Boolean

  def contains(s: UTF8String): Boolean

  /** Release the broadcast payload (cache eviction — see the hot-set
    * LRU in queries.Similarity). Non-blocking; the holder is unusable
    * afterwards.
    */
  private[graft] def destroyBroadcast(): Unit

  override final def hashCode(): Int = java.lang.Long.hashCode(fingerprint)
  override final def equals(o: Any): Boolean = o match {
    case h: HotShingles => h.getClass == getClass && h.fingerprint == fingerprint
    case _ => false
  }
}

/** Exact membership — a broadcast `HashSet[UTF8String]`. */
final class ExactHotShingles private[functions] (
    bc: Broadcast[java.util.HashSet[UTF8String]],
    val fingerprint: Long, val size: Int) extends HotShingles {
  // lazy so the driver-side holder never forces a fetch; after first
  // use reads are a plain field access (Scala lazy val bitmap check)
  @transient private lazy val set: java.util.HashSet[UTF8String] = bc.value
  override def isEmpty: Boolean = size == 0
  override def contains(s: UTF8String): Boolean = set.contains(s)
  override private[graft] def destroyBroadcast(): Unit = bc.destroy()
  override def toString: String = s"ExactHotShingles(n=$size, fp=$fingerprint)"
}

/** Approximate membership — a broadcast Bloom filter over the hot
  * shingles' UTF-8 bytes (`putString` and `mightContainBinary(getBytes)`
  * hash the identical byte stream).
  */
final class BloomHotShingles private[functions] (
    bc: Broadcast[org.apache.spark.util.sketch.BloomFilter],
    val fingerprint: Long, val expectedItems: Long) extends HotShingles {
  @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter = bc.value
  override def isEmpty: Boolean = false
  override def contains(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)
  override private[graft] def destroyBroadcast(): Unit = bc.destroy()
  override def toString: String = s"BloomHotShingles(n~$expectedItems, fp=$fingerprint)"
}

object HotShingles {

  /** 64-bit content fingerprint of one shingle — XXH64 of its UTF-8
    * bytes, seed 0. XOR-folded over a set it is order-independent;
    * since round 15 BOTH representations fold exactly this hash (the
    * Bloom path's treeAggregate uses it per element — the two kinds
    * still never compare equal: equality is class-gated).
    */
  def fingerprintOf(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)

  /** Exact holder from driver-collected shingles. */
  def exact(spark: SparkSession,
      shingles: Iterable[UTF8String]): HotShingles = {
    val set = new java.util.HashSet[UTF8String](
      math.max(16, shingles.size * 2))
    var fp = 0L
    shingles.foreach { s =>
      // fingerprint only NEW members: duplicates in the input must not
      // cancel pairwise (the multiplicity lesson from BatchFingerprint)
      if (set.add(s)) fp ^= fingerprintOf(s)
    }
    new ExactHotShingles(spark.sparkContext.broadcast(set), fp, set.size)
  }

  /** Bloom holder from a pre-built filter + the xor-folded
    * [[fingerprintOf]] of the same shingle set.
    */
  def bloom(spark: SparkSession,
      filter: org.apache.spark.util.sketch.BloomFilter,
      fingerprint: Long, expectedItems: Long): HotShingles =
    new BloomHotShingles(spark.sparkContext.broadcast(filter),
      fingerprint, expectedItems)
}
