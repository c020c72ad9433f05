package graft

import graft.queries.{Similarity, TextOps}
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-corpus proof that candidate generation in the dedup joins
  * stays sub-quadratic: N copies of one document must yield O(N·cap)
  * (here O(cap²), constant in N) candidate pairs, not O(N²). This is the
  * 100-TB survival property — one viral boilerplate cluster must not
  * dominate the whole job.
  */
class HotBucketSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val N = 300 // adversarial cluster size, well above both caps

  private def identicalDocs =
    (0L until N.toLong).map(i => (i, "the same boilerplate sentence repeated in every single document"))
      .toDF("doc_id", "text")

  test("minhash LSH on N identical docs: df cap drops the hot cluster entirely; band cap bounds sub-df-cap clusters") {
    // Round 13 (df-capped signing): every shingle of a 300-doc identical
    // cluster has df = 300 > MaxShingleDf, so the kept sets are EMPTY
    // and the cluster never bands — zero pairs, mirroring the exact
    // twin's "zero join work" behavior below (identical docs are
    // q_dedup_exact's job, not the near-dup path's).
    assert(N > TextOps.MaxShingleDf)
    val hot = Similarity.minhashPairsOf(identicalDocs, 0.5).count()
    assert(hot == 0L, s"df-hot cluster must not band: $hot pairs")
    // The band-bucket cap is the SECOND bound, still load-bearing for
    // clusters under the df cap: 100 identical docs (df = 100 ≤ 128)
    // sign identically, collide in every band, and the bucket cap
    // bounds the pair blow-up at cap², constant in cluster size.
    val c = Similarity.MaxBandBucket
    val sub = (0L until 100L)
      .map(i => (i, "the same boilerplate sentence repeated in every single document"))
      .toDF("doc_id", "text")
    val pairs = Similarity.minhashPairsOf(sub, 0.5).count()
    // == cap(cap−1)/2, CONSTANT in cluster size — the anti-quadratic
    // property (no N-margin assert here: the df cap itself limits an
    // identical cluster to ≤ 128 docs, too close to cap=64 for one)
    assert(pairs == c.toLong * (c - 1) / 2,
      s"expected cap-bounded ${c * (c - 1) / 2} pairs, got $pairs")
  }

  test("simhash band pairs on N identical docs are bounded by the band-bucket cap") {
    val c = Similarity.MaxBandBucket
    val pairs = Similarity.simhashPairsOf(identicalDocs, 3).count()
    assert(pairs == c.toLong * (c - 1) / 2,
      s"expected cap-bounded ${c * (c - 1) / 2} pairs, got $pairs")
  }

  test("exact n-gram join drops hot shingles: N identical docs produce zero join work") {
    // Every shingle of the cluster has df = N > MaxShingleDf, so the
    // self-join sees none of them. (Identical docs are the exact-dup
    // path's job — q_dedup_exact collapses them without any pair join.)
    assert(N > TextOps.MaxShingleDf)
    val pairs = TextOps.jaccardPairsOf(identicalDocs).count()
    assert(pairs == 0L, s"hot shingles leaked into the self-join: $pairs pairs")
  }

  test("cosine dedup on N identical vectors is bounded by the band-bucket cap") {
    import org.apache.spark.sql.functions._
    val c = Similarity.MaxBandBucket
    val one = Array.fill(64)(0.5f)
    val vecs = (0L until N.toLong).map(i => (i, one, 0))
      .toDF("vec_id", "embedding", "label")
    val pairs = Similarity.cosineDupPairsOf(vecs.withColumn("embedding",
      col("embedding").cast("array<float>")), 0.95).count()
    assert(pairs == c.toLong * (c - 1) / 2,
      s"expected cap-bounded ${c * (c - 1) / 2} pairs, got $pairs")
  }

  test("df cap keeps genuine near-dup pairs while suppressing boilerplate") {
    val boiler = (0L until 200L).map(i =>
      (i, s"common boiler plate filler$i unique$i token$i"))
    val genuine = Seq(
      (1000L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1001L, "alpha beta gamma delta epsilon zeta eta theta iota"))
    val docs = (boiler ++ genuine).toDF("doc_id", "text")
    val rows = TextOps.jaccardPairsOf(docs).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1000L, 1001L)),
      s"expected exactly the genuine pair, got ${rows.mkString(",")}")
    // 6 shared shingles of 7 union — unaffected by dropping the one hot
    // "common boiler plate" shingle (df=200), which belongs to neither.
    assert(math.abs(rows.head.getDouble(2) - 0.8571) < 1e-9)
  }

  test("Bloom hot-set fallback: char-family pairs match the exact-set path with HotSetMaxEntries forced to 0 (round 14)") {
    // The char-shingle family DOES go hot at fixture scale (cross-word
    // 8-grams), so forcing exactMax = 0 makes EVERY hot shingle route
    // through the distributed Bloom build instead of the driver set.
    // FP-tolerant: a Bloom false positive demotes one cold shingle
    // corpus-wide (symmetrically for every doc), so at fpp 1e-4 the
    // pair set may differ from the exact-set path by at most a few
    // borderline pairs — never wholesale.
    val docs = Tables.documents(spark, sf)
    def pairSet(exactMax: Int) =
      Similarity.charMinhashPairsOf(docs, 0.5, exactMax = exactMax)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaExact = pairSet(Similarity.HotSetMaxEntries)
    val viaBloom = pairSet(0)
    assert(viaExact.nonEmpty, "fixture must contain char near-dup pairs")
    val diff = (viaExact diff viaBloom) ++ (viaBloom diff viaExact)
    assert(diff.size <= math.max(1, viaExact.size / 20),
      s"Bloom path drifted beyond FP tolerance: |exact|=${viaExact.size} " +
        s"|bloom|=${viaBloom.size} diff=${diff.take(5)}")
  }

  test("Bloom hot-set fallback still suppresses boilerplate and keeps genuine near-dups") {
    // The semantic contract of the df cap, exercised THROUGH the Bloom
    // representation: a 200-doc boilerplate cluster (every shingle
    // df = 200 > MaxShingleDf → all hot → kept sets empty) must emit
    // zero pairs, while a genuine cold near-dup pair survives.
    val boiler = (0L until 200L).map(i =>
      (i, "the same boilerplate sentence repeated in every single document"))
    val genuine = Seq(
      (1000L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1001L, "alpha beta gamma delta epsilon zeta eta theta iota"))
    import spark.implicits._
    val docs = (boiler ++ genuine).toDF("doc_id", "text")
    val rows = Similarity.minhashPairsOf(docs, 0.5, exactMax = 0).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1000L, 1001L)),
      s"expected exactly the genuine pair via the Bloom path, got ${rows.mkString(",")}")
  }

  test("hot-set cache: a keyed invocation reuses the membership, an unkeyed one never caches") {
    // Same tag + same parameters → the SAME HotShingles instance (the
    // df pass ran once); no tag → fresh instances. Fingerprint equality
    // additionally holds between cached and fresh builds of the same
    // input (the canonicalization identity KeepCold relies on).
    val docs = Tables.documents(spark, sf)
    val arrays = Similarity.shingleArraysOf(docs)
    val tag = s"spec|tok3|$sf"
    val a = Similarity.hotSetOf(arrays, 2)
    val b = Similarity.hotSetOf(arrays, 2)
    assert(!(a eq b) && a == b, "unkeyed builds are fresh but fingerprint-equal")
    import org.apache.spark.sql.functions.col
    // two keyed queries over the same input share one membership: the
    // plans' keep_cold expressions compare EQUAL (fingerprint identity)
    val s1 = Similarity.cappedSigsOf(arrays, maxDf = 2, cacheKey = Some(tag))
    val s2 = Similarity.cappedSigsOf(arrays, maxDf = 2, cacheKey = Some(tag))
    def holderOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect {
        case p => p.expressions.flatMap(_.collect {
          case k: graft.functions.KeepCold => k.hot
        })
      }.flatten.head
    assert(holderOf(s1) eq holderOf(s2), "keyed builds must reuse the cached membership")
    assert(s1.select(col("doc_id")).count() == s2.select(col("doc_id")).count())
  }

  test("relaxed-fpp Bloom path (round 15): zero false negatives, FP rate within the 1e-3 bound") {
    // relaxAt = 0 forces every Bloom build onto the relaxed rate — the
    // auto-degrade a 10⁸-hot-shingle crawl takes to keep the filter
    // broadcast bounded (SCALING.md §bloom-hot-set). Membership
    // contract: every true hot shingle still contains() (Bloom has no
    // false negatives), absent probes false-positive at ≲ fpp.
    val docs = Tables.documents(spark, sf)
    val arrays = Similarity.shingleArraysOf(docs)
    val exact = Similarity.hotSetOf(arrays, maxDf = 2)
    val relaxed = Similarity.hotSetOf(arrays, maxDf = 2, exactMax = 0, relaxAt = 0)
    assert(relaxed.isInstanceOf[graft.functions.BloomHotShingles],
      s"relaxAt=0 with exactMax=0 must build the Bloom form, got $relaxed")
    val hot = arrays.select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("shingles")).as("s"))
      .groupBy("s").count().filter(org.apache.spark.sql.functions.col("count") > 2)
      .collect().map(_.getString(0))
    assert(hot.nonEmpty, "fixture must have hot shingles at maxDf=2")
    import org.apache.spark.unsafe.types.UTF8String
    hot.foreach { s =>
      assert(relaxed.contains(UTF8String.fromString(s)),
        s"false negative on hot shingle '$s'")
      assert(exact.contains(UTF8String.fromString(s)))
    }
    val absent = (0 until 5000).map(i => s"graft-absent-probe-$i")
    val fps = absent.count(s => relaxed.contains(UTF8String.fromString(s)))
    // nominal fpp 1e-3 → expect ~5 of 5000; bound generously at 1%
    assert(fps <= 50, s"FP rate ${fps / 5000.0} breaches the relaxed bound")
  }

  test("evicted hot-set cache entries destroy their broadcast payload (round 15)") {
    import spark.implicits._
    def tinyArrays(tag: Int) = Similarity.shingleArraysOf(
      (0L until 6L).map(i => (i, s"alpha$tag beta$tag gamma$tag delta$tag " +
        s"epsilon$tag zeta$tag eta$tag theta$tag")).toDF("doc_id", "text"))
    // maxDf=1: every shingle is hot (df=6) → a non-empty exact holder.
    // Deliberately NOT probed yet: contains() latches the broadcast
    // value driver-side, and a latched copy would keep answering after
    // destroy — the assertion needs the first payload FETCH to happen
    // post-eviction.
    val first = Similarity.hotSetCached(tinyArrays(0), 1,
      Similarity.HotSetMaxEntries, Some("evict-spec|0"))
    assert(!first.isEmpty, "holder must be built (size is payload-free)")
    // flood the LRU (capacity 8) with 8 more keys → the first evicts,
    // and eviction destroys its broadcast
    (1 to 8).foreach { t =>
      Similarity.hotSetCached(tinyArrays(t), 1,
        Similarity.HotSetMaxEntries, Some(s"evict-spec|$t"))
    }
    val ex = intercept[org.apache.spark.SparkException] {
      first.contains(org.apache.spark.unsafe.types.UTF8String
        .fromString("alpha0 beta0"))
    }
    assert(ex.getMessage.toLowerCase.contains("destroy"), ex.getMessage)
    // non-evicted entries keep working
    val kept = Similarity.hotSetCached(tinyArrays(8), 1,
      Similarity.HotSetMaxEntries, Some("evict-spec|8"))
    assert(!kept.isEmpty && kept.contains(org.apache.spark.unsafe.types
      .UTF8String.fromString("alpha8 beta8 gamma8")))
  }

  test("in-place fixture regeneration (same file names) misses the hot-set cache (round 15)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hot_token").toString
    (0L until 8L).map(i => (i, s"one two three four five$i")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/docs")
    def arrays = Similarity.shingleArraysOf(spark.read.parquet(s"$dir/docs"))
    val t1 = Similarity.inputToken(arrays)
    assert(t1 == Similarity.inputToken(arrays), "token must be stable")
    // simulate a non-Spark in-place regeneration: same names, new mtime
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/docs"))
      .map(_.getPath).find(_.getName.startsWith("part-")).get
    fs.setTimes(part, System.currentTimeMillis() + 5000, -1)
    val t2 = Similarity.inputToken(arrays)
    assert(t2 != t1, "an in-place rewrite (same names) must change the token " +
      "— the 32-bit path-only token served stale hot sets here")
  }

  test("df cap is a no-op at fixture scale (max df 25 << 128)") {
    val docs = Tables.documents(spark, sf)
    val capped = TextOps.jaccardPairsOf(docs).collect().toSeq
    val uncapped = TextOps.jaccardPairsOf(docs, maxDf = Int.MaxValue).collect().toSeq
    assert(capped == uncapped)
  }
}
