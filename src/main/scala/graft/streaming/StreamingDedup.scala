package graft.streaming

import graft.queries.Similarity
import org.apache.spark.sql.{AnalysisException, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Streaming MinHash near-dedup — the continuously-ingesting corpus-build
  * form of q_dedup_near. Each micro-batch computes the codegen'd MinHash
  * signatures of the ARRIVING documents only, band-joins them against the
  * accumulated signature store (and the batch itself), emits the new
  * near-dup pairs, and appends the batch's band rows to the store.
  *
  * Scale shape mirrors the batch operator exactly: signatures are
  * map-only kernels over new docs only, candidates come from a bucketed
  * band equi-join (never doc × store cross), the hot-bucket cap bounds
  * any one bucket, and the store carries (doc_id, sig, band, band_hash) —
  * ids + a 32-long signature — never document text.
  *
  * Store layout (round 14) — TWO TIERS, the LSM shape every streaming
  * table store converges on:
  *
  *  - '''append tier''' (`<store>/batch_id=N/`): each micro-batch lands
  *    its band rows in its own partition via dynamic overwrite (the
  *    idempotence key), rows sorted by band_hash so parquet row-group
  *    stats stay tight. File count per batch = task count — small
  *    batches never explode into per-bucket fragments (the first
  *    formulation partitioned every BATCH by bucket and drowned in
  *    2500 tiny files by batch 10 — measured 3× slower than no pruning
  *    at all; StoreScale caught it).
  *  - '''bucketed tier''' (`<store>_bucketed/sb=K/`, sb =
  *    pmod(band_hash, StoreBuckets)): produced by [[compactStore]],
  *    which rewrites all append-tier batches up to a watermark into
  *    few LARGE per-bucket files (batch_id kept as a data column, the
  *    watermark in `_watermark`), publish-by-rename with the
  *    `__prev` crash recovery the literal-layout sink uses.
  *
  * Each micro-batch's candidate read ([[readStorePruned]]) restricts
  * the bucketed tier to the sb partitions the batch's own band hashes
  * touch (DIRECTORY pruning — untouched buckets are never opened) and
  * both tiers to rows matching the batch's band-hash set — as pushed
  * OR-of-equals parquet predicates when the set is small (row-group
  * skipping on the sorted files) or a broadcast left-semi join when
  * large (no 40k-literal plan bloat; the join input still shrinks to
  * true candidates before the shuffle). The pruning is EXACTLY
  * lossless: a store row whose band_hash the batch never produced can
  * only equi-join other store rows, and old×old pairs are already
  * excluded by the is_new emission condition (each pair belongs to the
  * batch where its LATER doc arrived); within a touched
  * (band, band_hash) bucket every store row survives, so the
  * hot-bucket cap ranks the identical row set (StreamingParitySpec
  * pins pair-set parity, the only-touched-buckets IO assertion, and
  * replay of a COMPACTED batch). Without this, every micro-batch
  * scanned + shuffled the ENTIRE accumulated store — per-batch cost
  * linear in corpus history, the round-13 VERDICT's one
  * unbounded-growth term. A pre-round-14 store is just an append tier
  * with unsorted files — it prunes through the same row-level path.
  *
  * Pair-emission invariant: documents arrive exactly once, so a pair
  * (a, b) forms in exactly the micro-batch where the LATER of the two
  * arrives (same batch if together) — no cross-batch duplicates.
  * Signatures are deterministic, so the emitted (doc_a, doc_b,
  * est_jaccard) rows equal batch `uncappedMinhashPairsOf` over the
  * union of all batches whenever the hot-bucket cap doesn't bind
  * mid-stream (StreamingParitySpec asserts set equality on the fixture,
  * any batch split). When the cap does bind, batch and stream may keep
  * different bucket representatives — the same recall-for-boundedness
  * trade, made at different times. The stream signs ALL shingles
  * (round 13: the declared batch q_dedup_near signs only the
  * df ≤ MaxShingleDf universe — a corpus-df prepass the append-only
  * signature store cannot replay; the streaming role is CANDIDATE
  * generation, with the capped exact stage as the verdict, so the
  * streaming path may additionally surface hot-boilerplate-only pairs
  * the batch query drops).
  *
  * Delivery: foreachBatch is at-least-once, so both sinks are made
  * IDEMPOTENT under replay: pairs and band rows land in a `batch_id=N`
  * partition via dynamic partition overwrite, and the store read
  * restricts to strictly-earlier batches. A replayed batch therefore
  * sees the identical store prefix, recomputes the identical rows, and
  * overwrites its own partition — a no-op (StreamingParitySpec replays
  * [[commitBatch]] and asserts the pair set is unchanged).
  */
object StreamingDedup {

  /** Emitted-pairs schema — fixed, so an empty pairs directory (no
    * near-dups yet) still reads back cleanly.
    */
  val PairsSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType), StructField("doc_b", LongType),
    StructField("est_jaccard", DoubleType)))

  /** Signature-store schema ([[Similarity.bandedSignaturesOf]] layout). */
  val StoreSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType)),
    StructField("band", IntegerType), StructField("band_hash", LongType)))

  /** File-source stream of documents-shaped parquet under `dir`. */
  def docsStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Bucket count of the compacted tier. 256 bounds its file count
    * (one-ish large file per bucket per compaction) while a small
    * micro-batch's band hashes touch only the buckets they land in;
    * the row-level band-hash pruning does the fine selectivity inside
    * touched buckets, so sb only needs to bound DIRECTORY opens.
    */
  val StoreBuckets = 256

  /** Ceiling on the driver-collected band-hash probe used for the
    * PUSHED OR-of-equals form (row-group skipping needs source-
    * translatable predicates; a giant literal chain would bloat the
    * plan instead). Batches past it — ≥ ~128 docs — prune via the
    * broadcast left-semi join, which never collects hashes at all.
    */
  val PushdownHashLimit: Int = 1 << 10

  private def sbOf(bandHash: Long): Int =
    java.lang.Math.floorMod(bandHash, StoreBuckets.toLong).toInt

  /** The compacted tier lives in a SIBLING directory so the append
    * tier's partition inference never sees two layouts in one tree.
    */
  def bucketedDirOf(storeDir: String): String =
    storeDir.stripSuffix("/") + "_bucketed"

  /** One micro-batch step (also the unit under direct test): new pairs
    * from `batch` vs `store` ∪ `batch`, restricted to pairs touching the
    * batch. Returns (newPairs, newBandRows).
    */
  def processBatch(batch: DataFrame, store: Option[DataFrame],
      threshold: Double): (DataFrame, DataFrame) = {
    val newBands = Similarity.bandedSignaturesOf(batch)
    (pairsFromBands(newBands, store, threshold), newBands)
  }

  /** The candidate join given precomputed batch band rows: cap buckets
    * over store ∪ batch, emit pairs touching the batch.
    */
  private def pairsFromBands(newBands: DataFrame, store: Option[DataFrame],
      threshold: Double): DataFrame = {
    val tagged = newBands.withColumn("is_new", lit(true))
    val combined = store match {
      case Some(st) => st.withColumn("is_new", lit(false)).unionByName(tagged)
      case None     => tagged
    }
    val capped = Similarity.capBuckets(combined, Seq("band", "band_hash"))
    Similarity
      .estPairsFromBands(capped, capped, col("x.is_new") || col("y.is_new"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** The accumulated store restricted to batches strictly before
    * `beforeBatch` — so a replayed batch sees the identical store prefix
    * even when its own rows already landed before the crash. Resolved by
    * attempting the read and treating a missing/empty path as "no store
    * yet": works identically for local disk, HDFS, and s3a URIs (a
    * java.io.File existence probe would silently report false on any
    * non-local filesystem and drop every cross-batch pair).
    */
  def readStore(spark: SparkSession, storeDir: String,
      beforeBatch: Long): Option[DataFrame] = {
    val cols = StoreSchema.fieldNames.map(col).toSeq
    // two-tier aware (round-14 review): after compactStore has moved
    // history into the bucketed tier, an append-tier-only read would
    // silently lose every compacted batch — the unpruned read must
    // union both tiers exactly like the pruned one, just without the
    // hash/bucket filters.
    val w = compactionWatermark(spark, storeDir)
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val bucketed: Option[DataFrame] =
      if (w < 0) None
      else resolvedBucketedDir(fs, storeDir).flatMap { dir =>
        try Some(spark.read.parquet(dir)
          .filter(col("batch_id") < beforeBatch).select(cols: _*))
        catch { case _: AnalysisException => None }
      }
    val fresh: Option[DataFrame] =
      try Some(spark.read.parquet(storeDir)
        .filter(col("batch_id") > w && col("batch_id") < beforeBatch)
        .select(cols: _*))
      catch { case _: AnalysisException => None }
    (bucketed, fresh) match {
      case (Some(b), Some(f)) => Some(b.unionByName(f))
      case (b, f) => b.orElse(f)
    }
  }

  /** The committed compacted-tier directory, resolving the `__prev`
    * crash window: a compaction that died between its two publish
    * renames leaves the last good tier at `__prev` — readers use it
    * (and [[compactStore]] restores it) rather than losing the only
    * surviving copy.
    */
  private def resolvedBucketedDir(
      fs: org.apache.hadoop.fs.FileSystem, storeDir: String): Option[String] = {
    val bucketed = new org.apache.hadoop.fs.Path(bucketedDirOf(storeDir))
    val prev = new org.apache.hadoop.fs.Path(bucketedDirOf(storeDir) + "__prev")
    if (fs.exists(bucketed)) Some(bucketed.toString)
    else if (fs.exists(prev)) Some(prev.toString)
    else None
  }

  /** The compaction watermark of the resolved bucketed tier: batches
    * with id ≤ watermark live there; -1 when no tier exists (all
    * batches are append-tier).
    */
  private[streaming] def compactionWatermark(spark: SparkSession,
      storeDir: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    resolvedBucketedDir(fs, storeDir).map { dir =>
      val wPath = new org.apache.hadoop.fs.Path(dir, "_watermark")
      if (!fs.exists(wPath)) -1L
      else {
        val in = fs.open(wPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
        finally in.close()
      }
    }.getOrElse(-1L)
  }

  /** [[readStore]] pruned to what the micro-batch's own band rows can
    * possibly pair with — see the class doc for why this is lossless.
    * The bucketed tier additionally prunes to the touched sb
    * partitions (directory-level); both tiers prune rows to the
    * batch's band-hash set, as pushed OR-of-equals predicates when the
    * probe is ≤ [[PushdownHashLimit]] hashes (parquet row-group
    * skipping on the sorted files) or a broadcast left-semi join
    * otherwise (no literal-bloated plan; the driver never collects an
    * unbounded list).
    */
  def readStorePruned(spark: SparkSession, storeDir: String,
      beforeBatch: Long, batchBands: DataFrame): Option[DataFrame] = {
    val distinctHashes = batchBands.select(col("band_hash")).distinct()
    val probe = distinctHashes.limit(PushdownHashLimit + 1)
      .collect().map(_.getLong(0))
    val small = probe.length <= PushdownHashLimit
    // BALANCED or-tree (depth log n): the left-deep reduce(_ || _)
    // form recursed Catalyst's tree walks to a StackOverflow at
    // ~1000 terms
    def balancedOr(preds: IndexedSeq[org.apache.spark.sql.Column])
        : org.apache.spark.sql.Column =
      if (preds.length == 1) preds.head
      else {
        val (l, r) = preds.splitAt(preds.length / 2)
        balancedOr(l) || balancedOr(r)
      }
    def hashPrune(df: DataFrame): DataFrame =
      if (small) {
        if (probe.isEmpty) df.limit(0) // empty batch pairs with nothing
        else df.filter(balancedOr(probe.toIndexedSeq.map(h => col("band_hash") === h)))
      } else df.join(broadcast(distinctHashes), Seq("band_hash"), "left_semi")
    val cols = StoreSchema.fieldNames.map(col).toSeq
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val w = compactionWatermark(spark, storeDir)
    val bucketed: Option[DataFrame] =
      if (w < 0) None
      else resolvedBucketedDir(fs, storeDir).flatMap { dir =>
        try {
          val sbs =
            if (small) probe.map(sbOf).distinct
            else batchBands
              .select(pmod(col("band_hash"), lit(StoreBuckets.toLong))
                .cast("int").as("sb"))
              .distinct().collect().map(_.getInt(0)) // bounded ≤ StoreBuckets
          Some(hashPrune(spark.read.parquet(dir)
            .filter(col("sb").isin(sbs.map(Integer.valueOf).toSeq: _*) &&
              col("batch_id") < beforeBatch))
            .select(cols: _*))
        } catch { case _: AnalysisException => None }
      }
    val fresh: Option[DataFrame] =
      try Some(hashPrune(spark.read.parquet(storeDir)
        // > w: batches ≤ w live in the bucketed tier; append-tier dirs
        // a replay recreated after compaction are garbage, not data
        .filter(col("batch_id") > w && col("batch_id") < beforeBatch))
        .select(cols: _*))
      catch { case _: AnalysisException => None }
    (bucketed, fresh) match {
      case (Some(b), Some(f)) => Some(b.unionByName(f))
      case (b, f) => b.orElse(f)
    }
  }

  /** Rewrite every append-tier batch with id ≤ `upTo` (plus the
    * existing bucketed tier) into a fresh bucketed tier: `sb=K/`
    * partitions, rows clustered one large file per bucket and sorted
    * by band_hash (tight row-group stats for the pruned read's pushed
    * predicates), batch_id kept as a DATA column so replay-prefix
    * reads still filter exactly. Publish is stage-then-swap with the
    * `__prev` recovery (the literal-layout sink's protocol): a crash
    * anywhere leaves either the old committed tier or its recoverable
    * `__prev`, never a torn mix, and the append-tier dirs are deleted
    * only AFTER the new tier is committed. The watermark may only
    * advance over batches whose append dirs actually LANDED (enforced
    * below): a watermark past a not-yet-committed batch would hide
    * that batch's rows forever once it lands (its dir sits ≤ watermark,
    * invisible to both the pruned read and the next compaction).
    * Within that bound any `upTo` is safe — a later REPLAY of a
    * compacted batch stays a no-op: its rewritten append dir is
    * excluded by the watermark filter while the bucketed tier already
    * holds the identical rows.
    */
  def compactStore(spark: SparkSession, storeDir: String, upTo: Long): Unit = {
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val bucketed = new org.apache.hadoop.fs.Path(bucketedDirOf(storeDir))
    val prev = new org.apache.hadoop.fs.Path(bucketedDirOf(storeDir) + "__prev")
    val tmp = new org.apache.hadoop.fs.Path(bucketedDirOf(storeDir) + "__tmp")
    // crash recovery first, the literal-layout discipline: a committed
    // tier makes a surviving prev garbage; a missing tier restores it
    if (fs.exists(prev)) {
      if (fs.exists(bucketed)) fs.delete(prev, true)
      else require(fs.rename(prev, bucketed),
        s"band-store compaction could not restore $prev")
    }
    fs.delete(tmp, true) // stale staging from an earlier failed run
    val w = compactionWatermark(spark, storeDir)
    require(upTo >= w, s"compaction watermark can only advance ($w → $upTo)")
    // the landed-batch bound (round-14 review): the watermark must not
    // pass the NEWEST landed append batch — micro-batch ids are
    // monotone, so a batch committing later always carries a HIGHER id
    // than everything landed, but a watermark set past max(landed)
    // would hide exactly those future batches' rows forever once they
    // land (dir ≤ watermark, invisible to reads and to the next
    // compaction). Gaps below max(landed) are safe: monotone ids are
    // never back-filled.
    val maxLanded: Long =
      Option(fs.listStatus(new org.apache.hadoop.fs.Path(storeDir)))
        .map(_.toSeq.map(_.getPath.getName)
          .filter(_.startsWith("batch_id="))
          .map(_.stripPrefix("batch_id=").toLong))
        .filter(_.nonEmpty).map(_.max).getOrElse(w)
    require(upTo <= math.max(maxLanded, w),
      s"compaction watermark $upTo passes the newest landed batch " +
        s"$maxLanded — a batch committing later would be hidden forever; " +
        "compact only up to the newest LANDED batch")
    val cols = (StoreSchema.fieldNames :+ "batch_id").map(col).toSeq
    val oldTier: Option[DataFrame] =
      if (w < 0) None
      else try Some(spark.read.parquet(bucketed.toString).select(cols: _*))
      catch { case _: AnalysisException => None }
    val freshRows: Option[DataFrame] =
      try Some(spark.read.parquet(storeDir)
        .filter(col("batch_id") > w && col("batch_id") <= upTo)
        .select(cols: _*))
      catch { case _: AnalysisException => None }
    if (oldTier.isEmpty && freshRows.isEmpty) return // nothing to compact
    val all = (oldTier, freshRows) match {
      case (Some(o), Some(f)) => o.unionByName(f)
      case (o, f) => o.orElse(f).get
    }
    all
      .withColumn("sb", pmod(col("band_hash"), lit(StoreBuckets.toLong)).cast("int"))
      .repartition(col("sb")) // one task's output per bucket → few large files
      .sortWithinPartitions(col("sb"), col("band_hash"))
      .write.mode("overwrite").partitionBy("sb").parquet(tmp.toString)
    val os = fs.create(new org.apache.hadoop.fs.Path(tmp, "_watermark"), true)
    try os.write(upTo.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    if (fs.exists(bucketed)) require(fs.rename(bucketed, prev),
      s"band-store compaction could not stage the previous tier aside: $bucketed")
    require(fs.rename(tmp, bucketed),
      s"band-store compaction could not publish $tmp")
    fs.delete(prev, true)
    // the rewritten batches leave the append tier only after commit
    Option(fs.listStatus(new org.apache.hadoop.fs.Path(storeDir)))
      .foreach(_.foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("batch_id=") &&
            n.stripPrefix("batch_id=").toLong <= upTo)
          fs.delete(st.getPath, true)
      })
  }

  /** All pairs emitted so far (any batch), in [[PairsSchema]] layout; an
    * absent/empty pairs directory reads as zero rows.
    */
  def readPairs(spark: SparkSession, pairsDir: String): DataFrame =
    try spark.read.parquet(pairsDir)
      .select(PairsSchema.fieldNames.map(col).toSeq: _*)
    catch {
      case _: AnalysisException =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], PairsSchema)
    }

  /** Land `df` as the `batch_id=batchId` partition of `dir`. Dynamic
    * partition overwrite is the idempotence mechanism: a replay rewrites
    * ONLY its own partition with the identical recomputed rows and never
    * touches other batches' output.
    */
  private[streaming] def writeBatchPartition(df: DataFrame, batchId: Long, dir: String): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)

  /** Land band rows as the append-tier `batch_id=N` partition. Same
    * dynamic-overwrite idempotence as [[writeBatchPartition]]; rows
    * are sorted by band_hash within each task so row-group stats stay
    * tight for the pruned read's pushed predicates — NO extra shuffle
    * and no per-batch bucket fan-out (file count stays at task count;
    * the bucketed layout is [[compactStore]]'s job).
    */
  private[streaming] def writeBandStore(bands: DataFrame, batchId: Long,
      dir: String): Unit =
    bands
      .withColumn("batch_id", lit(batchId))
      .sortWithinPartitions(col("band_hash"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)

  /** The full idempotent micro-batch commit (the foreachBatch body,
    * exposed so tests can replay it): read the earlier-batch store,
    * compute the batch's pairs and band rows, land both keyed on the
    * batch id. Running this twice for the same (batch, batchId) leaves
    * both sinks byte-identical.
    */
  def commitBatch(batch: DataFrame, batchId: Long, storeDir: String,
      pairsDir: String, threshold: Double, prune: Boolean = true): Unit = {
    val spark = batch.sparkSession
    // band rows feed the touched-hash collect, the pair join, AND the
    // store write — cut the streaming-source lineage and materialize
    // ONCE (signatures are the batch's expensive map-only work)
    val bands = Similarity.bandedSignaturesOf(batch).localCheckpoint(true)
    val store =
      if (prune) readStorePruned(spark, storeDir, batchId, bands)
      else readStore(spark, storeDir, batchId)
    val pairs = pairsFromBands(bands, store, threshold)
    writeBatchPartition(pairs, batchId, pairsDir)
    writeBandStore(bands, batchId, storeDir)
  }

  /** Run the stream: docs under `docsDir` → near-dup pairs landed under
    * `pairsDir`, band rows accumulated under `storeDir`, both keyed by
    * micro-batch id. Blocks until all currently-available input is
    * processed.
    */
  def nearDedupStream(spark: SparkSession, docsDir: String, schema: StructType,
      storeDir: String, pairsDir: String, checkpoint: String,
      threshold: Double = 0.5, maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val q = docsStream(spark, docsDir, schema, maxFilesPerTrigger)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch, batchId, storeDir, pairsDir, threshold)
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Self-contained fixture run (the q_stream_dedup_near query surface):
    * land the documents table as a multi-file parquet dir, stream it
    * batch-by-batch through [[nearDedupStream]], return the accumulated
    * pairs. Deterministic: the emitted pair SET is independent of the
    * batch split (see pair-emission invariant above). The working
    * directory is deleted before returning — the result is
    * localCheckpointed first so it no longer reads from it.
    */
  def nearDedupFixtureRun(spark: SparkSession, sfDir: String,
      threshold: Double = 0.5, nFiles: Int = 4): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_dedup")
    graft.Tables.documents(spark, sfDir)
      .repartition(nFiles).write.parquet(s"$tmp/in")
    val schema = spark.read.parquet(s"$tmp/in").schema
    val q = nearDedupStream(spark, s"$tmp/in", schema,
      s"$tmp/store", s"$tmp/pairs", s"$tmp/ck", threshold)
    q.stop()
    val out = readPairs(spark, s"$tmp/pairs")
      .orderBy(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    // bench/verify call this repeatedly — don't leak a copy of the
    // corpus + store + checkpoint per invocation
    import scala.util.Try
    java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { Try(java.nio.file.Files.deleteIfExists(p)); () })
    out
  }
}
