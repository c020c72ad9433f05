package graft.streaming

import graft.queries.{Corpus, CorpusPipeline}
import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus build: the composed q_corpus_build pipeline
  * (quality gate → exact dedup → near-dup cluster dedup →
  * decontamination → split) maintained continuously — a new micro-batch
  * of documents updates the train-ready corpus WITHOUT re-shingling,
  * re-signing, or re-screening the documents already ingested.
  *
  * What is (and is not) recomputed per batch, and why it matches the
  * one-shot batch `CorpusPipeline.buildFrame` over the union of batches
  * (IncrementalCorpusSpec asserts exact equality, any batch split):
  *
  *  - '''signatures/shingles''': computed for ARRIVING docs only
  *    ([[StreamingDedup.commitBatch]] — map-only kernels + band join
  *    against the accumulated store).
  *  - '''dedup survivors''': the batch pipeline keeps, per connected
  *    component of (exact ∪ near-dup) relations, the minimum doc_id.
  *    Incrementally, the same survivor set falls out of connected
  *    components over the ACCUMULATED edge list: MinHash candidate
  *    pairs (near-dups; byte-identical dups collide in every band and
  *    pair at est 1.0) plus per-digest star edges (normalization-variant
  *    exact dups whose raw-text signatures differ). Components are
  *    recomputed per snapshot — but over ids only, never documents;
  *    the edge list is the thing that grows incrementally.
  *  - '''contamination flags''': each (corpus doc, bench doc) overlap
  *    score is pairwise (common shingles / doc's shingles), so the flag
  *    set accumulates from two bounded per-batch screens: new docs vs
  *    the benchmark set so far, and previously-ingested docs vs the
  *    batch's NEW benchmark docs. No pair is ever re-scored.
  *  - '''split tags''': derived (md5 of doc_id), map-only at snapshot.
  *
  * Every per-batch write is keyed on the micro-batch id via dynamic
  * partition overwrite ([[StreamingDedup.writeBatchPartition]]) and
  * every per-batch read is restricted to strictly-earlier batches, so
  * replaying a batch (foreachBatch is at-least-once) recomputes and
  * rewrites identical partitions — a no-op, same contract as
  * [[StreamingDedup]].
  *
  * State layout under `base`:
  * {{{
  *   raw/     quality-pass docs + digest   (batch-partitioned)
  *   bench/   benchmark docs (doc_id%10==0, the q_corpus_build convention)
  *   benchsh/ benchmark (bench_id, shingle) rows (batch-partitioned) —
  *            the accumulated decontam join side. Persisting shingles
  *            keeps per-batch decontam cost proportional to the BATCH:
  *            without it every micro-batch re-shingled the whole
  *            benchmark-so-far from text, and the benchmark grows with
  *            the corpus (10% of docs), i.e. per-batch work growing
  *            linearly with everything ever ingested. Raw shingle
  *            STRINGS are stored (≈3× bench text) so results match the
  *            one-shot batch build exactly; a deployment trading exact
  *            parity for state size would store xxhash64(shingle).
  *   store/   MinHash band store           (StreamingDedup)
  *   pairs/   near-dup candidate pairs     (StreamingDedup)
  *   dedges/  per-digest star edges        (batch-partitioned)
  *   hubs/    (digest, hub) at first sight — a [[TieredStore]] append
  *            tier; hubs_bucketed/ is its compacted tier (round 15)
  *   flags/   contaminated doc_ids         (batch-partitioned)
  * }}}
  *
  * Per-batch-vs-history growth audit (round 14, the StreamingDedup
  * bucketing round):
  *
  *  - '''store/''' inherits the (batch_id, sb)-bucketed layout and the
  *    pruned per-batch read through [[StreamingDedup.commitBatch]] —
  *    the one state whose PER-BATCH read previously scanned all of
  *    history.
  *  - '''pairs/ dedges/ flags/ bench/''' are written per batch but read
  *    in FULL only by [[snapshot]] — corpus-wide by definition
  *    (connected components need the complete edge list; the output is
  *    the whole surviving corpus), the cost of ASKING for a snapshot,
  *    not a per-batch term.
  *  - '''hubs/''' (round 14) replaced the per-batch
  *    groupBy(digest).min over ALL of raw/ — that recomputation
  *    shuffled the whole ingested history per micro-batch. Round 15:
  *    the store is a digest-bucketed [[TieredStore]] with the same
  *    automatic compaction cadence as the band store, so the lookup's
  *    READ also prunes to the batch's own digests (touched sb
  *    directories + pushed digest predicates / broadcast semi-join) —
  *    per-batch hub cost is batch-proportional, not history-
  *    proportional (StoreScale's hubs_probe row measures it flat
  *    across 10× digest-history growth). raw/ itself is read only on
  *    the rare new-bench-docs rescreen path.
  *  - '''benchsh/''' is read per batch, but the benchmark it holds is
  *    FIXED in production (`benchMaxId` — a pinned eval suite), making
  *    the read bounded; only the fixture convention lets it grow with
  *    the corpus (the documented q_decontam fixture-quadratic).
  */
object IncrementalCorpus {

  /** Bucket count of the hubs store's compacted tier. The hubs row is
    * tiny (two strings/longs), so 64 directories bound listing cost
    * while a batch's distinct digests prune to the buckets they hash
    * into; row-level digest pruning does the fine selectivity.
    */
  val HubBuckets: Int = 64

  /** The (digest, hub) first-sight store as a [[TieredStore]] (round
    * 15 — the round-14 hubs/ store removed the per-batch history
    * SHUFFLE but still scanned every deduped (digest, hub) row ever
    * written per batch; the two-tier layout + digest-pruned read makes
    * the lookup proportional to the batch, the same mechanism —
    * literally the same module — as the band store). The append tier
    * is byte-compatible with the round-14 flat batch_id layout, so
    * existing state dirs resume without migration.
    */
  private[graft] def hubStoreOf(base: String): TieredStore =
    TieredStore.stringKeyed(s"$base/hubs", Seq("digest", "hub"), "digest",
      HubBuckets, label = "hubs-store")

  /** Batch-store read resolving the maintenance crash window (a
    * [[graft.sources.Maintenance.compactBatchStore]] that died between
    * its publish renames leaves the last good tree at `__prev`).
    */
  private def readOr(spark: SparkSession, dir: String): Option[DataFrame] =
    graft.sources.Maintenance.readBatchStoreOr(spark, dir)

  /** Batch-partitioned read restricted to batches strictly before
    * `beforeBatch` (replay safety), minus the partition column.
    */
  private def readBefore(spark: SparkSession, dir: String,
      beforeBatch: Long): Option[DataFrame] =
    readOr(spark, dir).map(_.filter(col("batch_id") < beforeBatch).drop("batch_id"))

  /** Ingest one micro-batch (the foreachBatch body; idempotent under
    * replay). `threshold` is the near-dup dedup threshold, `minOverlap`
    * the decontamination bar — both matching CorpusPipeline's defaults.
    * `benchMaxId` bounds benchmark MEMBERSHIP (doc_id % 10 == 0 AND
    * doc_id < benchMaxId): the default admits every %10 doc (the
    * q_corpus_inc fixture convention, where the benchmark grows with
    * the corpus); a finite bound is the PRODUCTION shape — a fixed
    * eval/canary suite that new corpus batches are screened against
    * but never enlarge (ScaleSlope's fixedref tier uses this to price
    * the incremental machinery, not the growing-bench fixture).
    */
  /** Phase-attribution hook (round 16, VERDICT item 3): with
    * SPARK_GRAFT_INC_PROFILE=1, each [[ingestBatch]] phase prints its
    * wall seconds to stderr so the per-batch budget can be NAMED
    * instead of guessed. Off by default — a no-op closure, zero cost
    * in the bench path.
    */
  private val profileOn: Boolean =
    sys.env.get("SPARK_GRAFT_INC_PROFILE").contains("1")

  private def profile[A](phase: String, batchId: Long)(body: => A): A =
    if (!profileOn) body
    else {
      val t0 = System.nanoTime()
      val out = body
      System.err.println(
        f"[inc-profile] batch=$batchId $phase%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      out
    }

  def ingestBatch(batch: DataFrame, batchId: Long, base: String,
      threshold: Double = 0.5, minOverlap: Double = 0.3,
      benchMaxId: Long = Long.MaxValue,
      compactEvery: Int = StreamingDedup.DefaultCompactEvery): Unit = {
    val spark = batch.sparkSession
    val hubStore = hubStoreOf(base)
    // State-layout compatibility guards, BEFORE any state mutation.
    // Round 15: the healthy path is decided by FILESYSTEM existence
    // probes (a legacy dir is one whose store DIRECTORY is absent) —
    // the previous formulation set up several spark.read's of pure
    // driver latency on EVERY micro-batch to answer a question one
    // `exists` answers; the expensive spark-side probes now run only
    // when the directory really is missing (the fail-fast path).
    val gfs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def dirPresent(p: String): Boolean =
      gfs.exists(new org.apache.hadoop.fs.Path(p)) ||
        gfs.exists(new org.apache.hadoop.fs.Path(p + "__prev"))
    // "present" alone is too weak for the layout guards (round 16,
    // ADVICE): a store dir that exists but holds no committed batch_id=
    // children (partial crash debris, a manual restore) would silently
    // pass the fail-fast guard whose whole purpose is preventing silent
    // missed contamination/dedup. A dir only counts as healthy when a
    // committed batch child is visible; otherwise the original
    // spark-side readBefore probe decides (cheap — it only runs on the
    // rare empty-dir case).
    def hasCommittedBatch(p: String): Boolean = {
      def childOk(dir: String): Boolean = {
        val dp = new org.apache.hadoop.fs.Path(dir)
        gfs.exists(dp) && gfs.listStatus(dp)
          .exists(_.getPath.getName.startsWith("batch_id="))
      }
      childOk(p) || childOk(p + "__prev")
    }
    // a dir written before the benchsh/ store existed has earlier
    // bench/ batches but no benchsh/ directory — continuing would
    // silently screen new docs against only this batch's shingle
    // delta (missed contamination flags, no error). Fail fast and
    // name the remedy. The bench/ probe only runs when benchsh/ is
    // absent (fresh dirs pass trivially; replay passes: the two are
    // written together).
    if (!hasCommittedBatch(s"$base/benchsh")) {
      val legacyBench = readBefore(spark, s"$base/bench", batchId)
      require(legacyBench.forall(_.isEmpty),
        s"$base: bench/ has batches before $batchId but benchsh/ is missing — " +
          "pre-benchsh state layout. Discard the state dir (or backfill " +
          "benchsh/ by shingling the persisted bench/ docs) before resuming.")
    }
    // same guard for the round-14 hubs/ store: continuing a pre-hubs
    // state dir would silently treat every batch digest as new (missed
    // cross-batch exact-dup edges, no error). Two-tier aware: a fully
    // compacted hubs store has no append-tier batches but is not legacy.
    if (!hasCommittedBatch(s"$base/hubs") && !dirPresent(hubStore.bucketedDir)) {
      val legacyRaw = readBefore(spark, s"$base/raw", batchId)
      require(legacyRaw.forall(_.isEmpty),
        s"$base: raw/ has batches before $batchId but hubs/ is missing — " +
          "pre-hubs state layout. Discard the state dir (or backfill hubs/ " +
          "as raw/'s per-digest (min doc_id, first batch) rows) before resuming.")
    }
    // one materialization of the arriving docs: feeds the bench split,
    // the quality gate, and (via commitBatch) signature generation
    val b = profile("batch_ckpt", batchId)(batch.localCheckpoint(true))
    val benchDelta = b.filter(col("doc_id") % 10 === 0 &&
        col("doc_id") < benchMaxId)
      .select(col("doc_id"), col("text"))
    val q = profile("quality_ckpt", batchId)(CorpusPipeline.qualityFilter(b)
      .withColumn("digest", sha2(lower(trim(col("text"))), 256))
      .localCheckpoint(true))

    // near-dup candidate pairs + band store, batch-keyed (train-once
    // signatures; the band join prunes to buckets the batch touches)
    profile("near_dedup", batchId)(
      StreamingDedup.commitBatch(q.drop("digest"), batchId,
        s"$base/store", s"$base/pairs", threshold, compactEvery = compactEvery))

    // exact-dup connectivity: one star edge per new doc sharing a digest
    // with an earlier doc or with a batch-mate — linear, ids only.
    // Round 14: the earlier-doc hub comes from the incremental hubs/
    // store (one (digest, hub) row per distinct digest, recorded at the
    // digest's FIRST appearance) instead of a per-batch
    // groupBy(digest).min over ALL of raw/ — that recomputation
    // shuffled the entire ingested history through an exchange every
    // micro-batch. Round 15: the hubs store is a [[TieredStore]]
    // (digest-bucketed + compacted, the band store's mechanism — the
    // remedy round 14 only named), so the lookup's READ is also
    // batch-proportional: the probe of the batch's own digests prunes
    // the compacted tier to touched sb directories and both tiers to
    // matching digest rows (pushed predicates or broadcast semi-join;
    // the batch is the small side BY DEFINITION) — the last
    // linear-in-history per-batch term gone. A FROZEN first-seen hub
    // is connectivity-equivalent to the old running-minimum hub:
    // every same-digest doc stars to the same representative, so
    // components — and with them the min-id survivors — are identical
    // (IncrementalCorpusSpec's displacement + parity cases pin it).
    // materialized ONCE: the batch's (digest → min doc_id) rows feed
    // the pruned read's probe, the hub lookup join, and the delta —
    // bounded by the batch's own distinct-digest count
    val bmin = profile("hub_bmin", batchId)(
      q.groupBy("digest").agg(min(col("doc_id")).as("bmin"))
        .localCheckpoint(true))
    // hubs delta = digests this batch INTRODUCES, hubbed at their
    // batch minimum — replay-idempotent like every other per-batch
    // write. batchHubs (the restricted earlier-hub rows the pruned
    // read returns) is checkpointed because both the lookup join and
    // the delta anti-join read it; the result is bounded by the
    // batch's own digest count. The first batch (no hubs yet) skips
    // the whole lookup machinery: every digest is new.
    val (withHub, hubsDelta) = profile("hub_lookup", batchId)(
      hubStore.readPruned(spark, batchId, bmin.select(col("digest"))) match {
        case None =>
          (q.select(col("doc_id"), col("digest")).join(bmin, "digest")
            .withColumn("hub", col("bmin")),
            bmin.select(col("digest"), col("bmin").as("hub")))
        case Some(restricted) =>
          val batchHubs = restricted.localCheckpoint(true)
          (q.select(col("doc_id"), col("digest"))
            .join(bmin, "digest")
            .join(broadcast(batchHubs), Seq("digest"), "left")
            .withColumn("hub", coalesce(col("hub"), col("bmin"))),
            bmin.select(col("digest"), col("bmin").as("hub"))
              .join(broadcast(batchHubs.select(col("digest"))),
                Seq("digest"), "left_anti"))
      })
    val dedges = withHub.filter(col("doc_id") =!= col("hub"))
      .select(col("hub").as("src"), col("doc_id").as("dst"))
    profile("hub_dedges", batchId)(
      StreamingDedup.writeBatchPartition(dedges, batchId, s"$base/dedges"))
    // digest-sorted append + the same automatic compaction cadence as
    // the band store — post-commit, replay- and crash-safe
    profile("hub_append", batchId) {
      hubStore.append(hubsDelta, batchId)
      if (compactEvery > 0) hubStore.maybeCompact(spark, compactEvery)
    }

    // contamination: new docs vs all benchmark docs so far, and already-
    // ingested docs vs the batch's new benchmark docs — each a bounded
    // broadcast-bench shingle join; no (doc, bench) pair scored twice.
    // The bench side joins as the PERSISTED shingle store (see the state
    // layout note): only the delta is shingled from text here.
    val benchShDelta = graft.queries.Similarity.shinglesOf(benchDelta)
      .select(col("doc_id").as("bench_id"), col("shingle"))
    val benchShOld = readBefore(spark, s"$base/benchsh", batchId)
    val benchShSoFar = benchShOld match {
      case Some(old) => old.unionByName(benchShDelta)
      case None      => benchShDelta
    }
    val newVsAll = Corpus.decontamAgainstShingles(q.drop("digest"),
        benchShSoFar, minOverlap)
      .select(col("doc_id"))
    // the old-corpus rescreen is only owed when this batch actually adds
    // benchmark docs — without the guard every batch would re-shingle the
    // ENTIRE previously-ingested corpus (a full-corpus pass per batch at
    // 100 TB) to join against an empty benchmark delta. The isEmpty probe
    // is a limit-1 action on the already-checkpointed batch slice.
    // (raw/ is read ONLY on this rare new-bench-docs path since round 14
    // — the per-batch exact-dup lookup reads hubs/ instead.)
    val rawOld = readBefore(spark, s"$base/raw", batchId)
    val oldVsNew = profile("rescreen_probe", batchId)(rawOld match {
      case Some(old) if !benchDelta.isEmpty =>
        Corpus.decontamAgainst(old.drop("digest"), benchDelta, minOverlap)
          .select(col("doc_id"))
      case _ => newVsAll.limit(0)
    })
    val flags = newVsAll.unionByName(oldVsNew).distinct()
    profile("decontam", batchId)(
      StreamingDedup.writeBatchPartition(flags, batchId, s"$base/flags"))
    profile("state_writes", batchId) {
      StreamingDedup.writeBatchPartition(benchDelta, batchId, s"$base/bench")
      StreamingDedup.writeBatchPartition(benchShDelta, batchId, s"$base/benchsh")
      StreamingDedup.writeBatchPartition(q, batchId, s"$base/raw")
    }
  }

  /** The current train-ready corpus: connected components over the
    * accumulated edge list (ids only — document text is read exactly
    * once, from raw/), drop non-minimum cluster members, benchmark docs,
    * and flagged docs, then tag splits. Equals
    * `CorpusPipeline.buildFrame` over everything ingested so far.
    */
  def snapshot(spark: SparkSession, base: String): DataFrame = {
    val raw = readOr(spark, s"$base/raw")
      .getOrElse(throw new IllegalStateException(
        s"$base/raw: no ingested state to snapshot"))
      .drop("batch_id", "digest")
    val pairs = StreamingDedup.readPairs(spark, s"$base/pairs")
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val dedges = readOr(spark, s"$base/dedges")
      .map(_.select(col("src"), col("dst"))).getOrElse(pairs.limit(0))
    val drop = graft.ml.StarComponents
      .connectedComponents(pairs.unionByName(dedges), validate = false)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    val benchIds = readOr(spark, s"$base/bench")
      .map(_.select(col("doc_id"))).getOrElse(drop.limit(0))
    val flagged = readOr(spark, s"$base/flags")
      .map(_.select(col("doc_id"))).getOrElse(drop.limit(0))
    CorpusPipeline.withSplit(
      raw.join(drop, Seq("doc_id"), "left_anti")
        .join(benchIds, Seq("doc_id"), "left_anti")
        .join(flagged, Seq("doc_id"), "left_anti"))
  }

  /** Offline state maintenance (round 15): compact every snapshot-side
    * batch-partitioned store to one sorted zstd file per batch
    * ([[graft.sources.Maintenance.compactBatchStore]] — they otherwise
    * accumulate task-count files per micro-batch forever, and a
    * snapshot opens O(batches × tasks) of them), and fold the two
    * TieredStores' landed append batches into their bucketed tiers.
    * Run between batches/snapshots, not concurrently with a commit;
    * crash-safe via the `__prev` protocols; replay of any compacted
    * batch remains a no-op (MaintenanceSpec pins snapshot-before ≡
    * snapshot-after, the listing-count drop, and the replay).
    */
  def maintain(spark: SparkSession, base: String): Unit = {
    Seq("pairs" -> "doc_a", "dedges" -> "src", "flags" -> "doc_id",
      "bench" -> "doc_id", "benchsh" -> "shingle", "raw" -> "doc_id")
      .foreach { case (d, key) =>
        graft.sources.Maintenance.compactBatchStore(spark, s"$base/$d", Seq(key))
      }
    // above-watermark only: replayed compacted batches leave garbage
    // append dirs below it (invisible to reads, but an upTo below the
    // watermark would trip the advance-only clamp)
    val hubs = hubStoreOf(base)
    val hubW = hubs.watermark(spark)
    val hubLanded = hubs.landedBatchIds(spark).filter(_ > hubW)
    if (hubLanded.nonEmpty) hubs.compact(spark, hubLanded.max)
    val bands = StreamingDedup.bandStoreOf(s"$base/store")
    val bandW = bands.watermark(spark)
    val bandLanded = bands.landedBatchIds(spark).filter(_ > bandW)
    if (bandLanded.nonEmpty) bands.compact(spark, bandLanded.max)
  }

  /** Self-contained fixture run (the q_corpus_inc query surface): land
    * the documents table as a multi-file dir, stream it through
    * [[ingestBatch]] batch by batch via foreachBatch, return the final
    * [[snapshot]]. The temp state is deleted after localCheckpointing
    * the result, as in [[StreamingDedup.nearDedupFixtureRun]].
    */
  def fixtureRun(spark: SparkSession, sfDir: String, nFiles: Int = 2,
      benchMaxId: Long = Long.MaxValue): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_inc_corpus")
    graft.Tables.documents(spark, sfDir)
      .repartition(nFiles).write.parquet(s"$tmp/in")
    val schema = spark.read.parquet(s"$tmp/in").schema
    val q = StreamingDedup.docsStream(spark, s"$tmp/in", schema)
      .writeStream
      .option("checkpointLocation", s"$tmp/ck")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, s"$tmp/state", benchMaxId = benchMaxId)
      }
      .start()
    profile("stream_total", -1L) { q.processAllAvailable() }
    q.stop()
    val out = profile("snapshot", -1L)(snapshot(spark, s"$tmp/state")
      .select(col("doc_id"), col("lang"), col("split"))
      .orderBy(col("doc_id"))
      .localCheckpoint(true))
    import scala.util.Try
    java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { Try(java.nio.file.Files.deleteIfExists(p)); () })
    out
  }
}
