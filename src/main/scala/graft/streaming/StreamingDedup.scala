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
  * ids + a 32-long signature — never document text. The store here is
  * plain parquet partitioned by batch id; at 100 TB it would additionally
  * be bucketed by (band, band_hash) so each micro-batch join prunes to
  * the buckets the batch actually touches.
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

  /** One micro-batch step (also the unit under direct test): new pairs
    * from `batch` vs `store` ∪ `batch`, restricted to pairs touching the
    * batch. Returns (newPairs, newBandRows).
    */
  def processBatch(batch: DataFrame, store: Option[DataFrame],
      threshold: Double): (DataFrame, DataFrame) = {
    val newBands = Similarity.bandedSignaturesOf(batch)
      .withColumn("is_new", lit(true))
    val combined = store match {
      case Some(st) => st.withColumn("is_new", lit(false)).unionByName(newBands)
      case None     => newBands
    }
    val capped = Similarity.capBuckets(combined, Seq("band", "band_hash"))
    val pairs = Similarity
      .estPairsFromBands(capped, capped, col("x.is_new") || col("y.is_new"))
      .filter(col("est_jaccard") >= threshold)
    (pairs, newBands.drop("is_new"))
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
      beforeBatch: Long): Option[DataFrame] =
    try {
      val st = spark.read.parquet(storeDir)
        .filter(col("batch_id") < beforeBatch)
        .select(StoreSchema.fieldNames.map(col).toSeq: _*)
      Some(st)
    } catch { case _: AnalysisException => None }

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

  /** The full idempotent micro-batch commit (the foreachBatch body,
    * exposed so tests can replay it): read the earlier-batch store,
    * compute the batch's pairs and band rows, land both keyed on the
    * batch id. Running this twice for the same (batch, batchId) leaves
    * both sinks byte-identical.
    */
  def commitBatch(batch: DataFrame, batchId: Long, storeDir: String,
      pairsDir: String, threshold: Double): Unit = {
    val spark = batch.sparkSession
    val store = readStore(spark, storeDir, batchId)
    val (pairs, bands) = processBatch(batch, store, threshold)
    // band rows feed both the pair join (via processBatch) and the
    // store write — cut the streaming-source lineage once
    val bandsLocal = bands.localCheckpoint(true)
    writeBatchPartition(pairs, batchId, pairsDir)
    writeBatchPartition(bandsLocal, batchId, storeDir)
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
