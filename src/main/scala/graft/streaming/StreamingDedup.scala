package graft.streaming

import java.io.File

import graft.queries.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * plain appendable parquet; at 100 TB it would be a compacted table
  * bucketed by (band, band_hash) so each micro-batch join prunes to the
  * buckets the batch actually touches.
  *
  * Pair-emission invariant: documents arrive exactly once, so a pair
  * (a, b) forms in exactly the micro-batch where the LATER of the two
  * arrives (same batch if together) — no cross-batch duplicates.
  * Signatures are deterministic, so the emitted (doc_a, doc_b,
  * est_jaccard) rows equal batch `minhashPairsOf` over the union of all
  * batches whenever the hot-bucket cap doesn't bind mid-stream
  * (StreamingParitySpec asserts set equality on the fixture, any batch
  * split). When the cap does bind, batch and stream may keep different
  * bucket representatives — the same recall-for-boundedness trade, made
  * at different times.
  *
  * Delivery: foreachBatch is at-least-once — a crash between the pairs
  * append and the store append replays the batch. A production sink
  * makes the two writes idempotent by keying both on (batchId, doc_id)
  * (e.g. MERGE into a table keyed on the pair) — kept as plain appends
  * here so the mechanics stay visible.
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

  /** Run the stream: docs under `docsDir` → near-dup pairs appended to
    * `pairsDir`, band rows accumulated under `storeDir`. Blocks until all
    * currently-available input is processed.
    */
  def nearDedupStream(spark: SparkSession, docsDir: String, schema: StructType,
      storeDir: String, pairsDir: String, checkpoint: String,
      threshold: Double = 0.5, maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val q = docsStream(spark, docsDir, schema, maxFilesPerTrigger)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val store =
          if (new File(s"$storeDir/_SUCCESS").exists()) Some(s.read.parquet(storeDir))
          else None
        val (pairs, bands) = processBatch(batch, store, threshold)
        // band rows feed both the pair join (via processBatch) and the
        // store append — cut the streaming-source lineage once
        val bandsLocal = bands.localCheckpoint(true)
        pairs.write.mode("append").parquet(pairsDir)
        bandsLocal.write.mode("append").parquet(storeDir)
        ()
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Self-contained fixture run (the q_stream_dedup_near query surface):
    * land the documents table as a multi-file parquet dir, stream it
    * batch-by-batch through [[nearDedupStream]], return the accumulated
    * pairs. Deterministic: the emitted pair SET is independent of the
    * batch split (see pair-emission invariant above).
    */
  def nearDedupFixtureRun(spark: SparkSession, sfDir: String,
      threshold: Double = 0.5, nFiles: Int = 4): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_dedup").toString
    graft.Tables.documents(spark, sfDir)
      .repartition(nFiles).write.parquet(s"$tmp/in")
    val schema = spark.read.parquet(s"$tmp/in").schema
    val q = nearDedupStream(spark, s"$tmp/in", schema,
      s"$tmp/store", s"$tmp/pairs", s"$tmp/ck", threshold)
    q.stop()
    spark.read.schema(PairsSchema).parquet(s"$tmp/pairs")
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
