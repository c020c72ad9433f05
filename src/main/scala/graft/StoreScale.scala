package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Store-growth harness for the streaming near-dedup band store
  * (round 14): measures per-micro-batch commit time as the ACCUMULATED
  * store grows, A/B'ing the pruned two-tier read (the shipped path)
  * against the legacy full-store read (`prune = false`). This is the
  * measurement the round-13 VERDICT asked for: "per-batch time flat as
  * store size grows 10×" — and it is also the harness that CAUGHT the
  * first formulation (per-batch sb partitioning → 2500 tiny files by
  * batch 10 → 3× slower than no pruning; the shipped design moved
  * bucketing into the compaction tier).
  *
  * Corpus: the Heaps-vocabulary generator (ScaleSlope.genDocumentsHeaps)
  * — bounded per-shingle df, the regime a real crawl is in; the 30-word
  * saturated fixture would make every batch collide with all of history
  * and measure the fixture, not the layout.
  *
  * Two regimes are priced:
  *  - '''ingest''': 10 equal 5k-doc batches streamed into one store —
  *    per-batch commit time as history grows from 0 to 45k docs. A 5k
  *    batch's ~40k band hashes exceed the pushdown probe, so here the
  *    broadcast left-semi join does the pruning (shuffle/join input
  *    stays proportional to true candidates, not history).
  *  - '''probe''': a FIXED 8-doc batch committed against the 1-batch
  *    store and the 10-batch store, each COMPACTED first — 64 band
  *    hashes touch ≤ 64 of the 256 buckets (directory pruning) and the
  *    OR-of-equals predicates push into the sorted bucket files
  *    (row-group skipping). Flat probe time across the 10× store
  *    growth is the headline number; the uncompacted-pruned and
  *    full-read probes are reported for contrast.
  *
  * Usage: runMain graft.StoreScale [baseDir]   (one JSON line on stdout)
  */
object StoreScale {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_storescale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val batchDocs = 5000L
    val nBatches = 10
    val docsDir = s"$base/docs.parquet"
    if (!new java.io.File(s"$docsDir/_SUCCESS").exists())
      ScaleSlope.genDocumentsHeaps(spark, batchDocs * (nBatches + 1))
        .write.mode("overwrite").parquet(docsDir)
    // plain parquet read (NOT localCheckpoint'd): the between-commit
    // drainStorage() would evict a checkpoint's blocks mid-run
    val docs = spark.read.parquet(docsDir)
    def slice(i: Int): DataFrame =
      docs.filter(col("doc_id") >= i * batchDocs && col("doc_id") < (i + 1) * batchDocs)
    val probeBatch = docs.filter(
      col("doc_id") >= nBatches * batchDocs && col("doc_id") < nBatches * batchDocs + 8)

    def drainStorage(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))

    // fresh state every run — the measurement is the growth curve, so
    // stale batches from a previous invocation would flatten nothing
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Seq("pruned", "full", "warm").foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/$v"), true)
    }
    // untimed warm-up: codegen + parquet reader caches land outside the
    // timed commits (the Bench pass-0 discipline)
    streaming.StreamingDedup.commitBatch(slice(0).limit(200), 0L,
      s"$base/warm/store", s"$base/warm/pairs", 0.5)
    streaming.StreamingDedup.compactStore(spark, s"$base/warm/store", 0L)
    streaming.StreamingDedup.commitBatch(slice(0).limit(8), 1L,
      s"$base/warm/store", s"$base/warm/pairs", 0.5)
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/warm"), true)
    drainStorage()

    def ingest(prune: Boolean, name: String): Seq[Double] = {
      val store = s"$base/$name/store"
      val pairs = s"$base/$name/pairs"
      (0 until nBatches).map { i =>
        val dt = time(streaming.StreamingDedup.commitBatch(
          slice(i), i.toLong, store, pairs, 0.5, prune = prune))
        drainStorage()
        dt
      }
    }
    def probeOnce(store: String, pairs: String, prune: Boolean,
        id: Long): Double = {
      val dt = time(streaming.StreamingDedup.commitBatch(
        probeBatch, id, store, pairs, 0.5, prune = prune))
      drainStorage()
      dt
    }

    val ingestP = ingest(prune = true, "pruned")
    val ingestF = ingest(prune = false, "full")
    // 1-batch stores for the x1 probe points
    streaming.StreamingDedup.commitBatch(slice(0), 0L,
      s"$base/pruned/store1", s"$base/pruned/pairs1", 0.5)
    streaming.StreamingDedup.commitBatch(slice(0), 0L,
      s"$base/full/store1", s"$base/full/pairs1", 0.5, prune = false)
    drainStorage()
    // uncompacted probes (append-tier row pruning only vs full read)
    val probeApp1 = probeOnce(s"$base/pruned/store1", s"$base/pruned/pairs1", true, 1000L)
    val probeApp10 = probeOnce(s"$base/pruned/store", s"$base/pruned/pairs", true, 1000L)
    val probeFull1 = probeOnce(s"$base/full/store1", s"$base/full/pairs1", false, 1000L)
    val probeFull10 = probeOnce(s"$base/full/store", s"$base/full/pairs", false, 1000L)
    // compact both pruned stores, then the headline bucketed probes
    streaming.StreamingDedup.compactStore(spark, s"$base/pruned/store1", 1000L)
    streaming.StreamingDedup.compactStore(spark, s"$base/pruned/store", 1000L)
    drainStorage()
    val probeCmp1 = probeOnce(s"$base/pruned/store1", s"$base/pruned/pairs1", true, 1001L)
    val probeCmp10 = probeOnce(s"$base/pruned/store", s"$base/pruned/pairs", true, 1001L)

    def fmt(v: Double): String = f"$v%.3f"
    def arr(xs: Seq[Double]): String = xs.map(fmt).mkString("[", ",", "]")
    def pt(x1: Double, x10: Double): String =
      s"""{"store_x1":${fmt(x1)},"store_x10":${fmt(x10)},"slope":${fmt(x10 / math.max(x1, 1e-9))}}"""
    println(s"""{"metric":"store_growth","batch_docs":$batchDocs,"batches":$nBatches,""" +
      s""""ingest_sec":{"pruned":${arr(ingestP)},"full":${arr(ingestF)}},""" +
      s""""probe8_sec":{"compacted_pruned":${pt(probeCmp1, probeCmp10)},""" +
      s""""append_pruned":${pt(probeApp1, probeApp10)},""" +
      s""""full":${pt(probeFull1, probeFull10)}}}""")
    spark.stop()
  }
}
