package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ml.StarComponents

/** The composed corpus build: quality filter → exact dedup → near-dup
  * cluster dedup → benchmark decontamination → deterministic split.
  * One call takes raw (doc_id, text, …) rows to train-ready documents —
  * the end-to-end flow a user of the engine runs, with every stage one
  * of the individually-tested operators (TextOps / Similarity /
  * StarComponents / Corpus).
  *
  * Every stage is a narrow transformation or a bucketed join on ids and
  * digests — document text never shuffles after stage 1 computes its
  * digest, and the near-dup stage shuffles only (id, signature) tuples.
  * Stage order matters at scale: exact dedup (cheapest, digest groupBy)
  * runs before MinHash (which would otherwise band-join every copy of a
  * viral document), and decontamination runs on the deduped survivors
  * (bench side is broadcast either way, but candidates shrink).
  */
object CorpusPipeline {

  /** Per-stage survivor counts — the audit trail a corpus build logs. */
  final case class Summary(
      nInput: Long, nQuality: Long, nExactDedup: Long,
      nNearDedup: Long, nDecontam: Long)

  /** Stage 1: map-side quality gate (min tokens, sane mean word length,
    * non-null text) — the cheap filter that runs inside the scan.
    */
  def qualityFilter(docs: DataFrame, minTokens: Int = 5,
      maxMeanWordLen: Double = 14.0): DataFrame = {
    // ws split: declared unit — the Gopher-style mean-WORD-length gate
    // is definitionally over whitespace words (a CJK doc is screened by
    // the Unicode-token operators downstream, not this cheap scan gate)
    val toks = split(col("text"), " ")
    docs.filter(col("text").isNotNull)
      .withColumn("n_words", size(toks))
      .withColumn("mean_wl",
        length(regexp_replace(col("text"), " ", "")).cast("double") / col("n_words"))
      .filter(col("n_words") >= minTokens && col("mean_wl") <= maxMeanWordLen)
      .drop("n_words", "mean_wl")
  }

  /** Stage 2: exact dedup — keep the minimum doc_id per normalized-text
    * digest. Shuffles the 64-byte digest, never the text.
    */
  def exactDedup(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(sha2(lower(trim(col("text"))), 256))
      .orderBy(col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Stage 3: near-dup dedup — MinHash-LSH candidate pairs → connected
    * components (star contraction: edge-list-only rounds) → keep each
    * cluster's minimum doc_id. Docs without a near-duplicate never
    * enter the component computation at all.
    */
  def nearDedup(docs: DataFrame, threshold: Double = 0.5,
      cacheKey: Option[String] = None): DataFrame = {
    val pairs = Similarity.minhashPairsOf(docs, threshold, cacheKey = cacheKey)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    // production path: skip the star-forest post-check jobs — the
    // fingerprint-certified fixpoint suffices here, and the invariant
    // checks stay on in StarComponentsSpec where they gate correctness
    val drop = StarComponents.connectedComponents(pairs, validate = false)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Stage 4: remove documents contaminated by the benchmark set (and
    * the benchmark docs themselves — eval data must not be trained on).
    * Screens against the ORIGINAL benchmark frame, not the deduped
    * survivors: near-dedup may have dropped a benchmark doc (its
    * cluster's min id was a non-bench doc), and the surviving near-dup
    * is exactly the leak that must be caught.
    */
  def decontaminate(docs: DataFrame, benchDocs: DataFrame,
      minOverlap: Double = 0.3): DataFrame = {
    // membership, not naming convention: the bench set is whatever frame
    // the caller passed, so bench docs are removed by anti-joining their
    // ids — broadcast hint made explicit so the anti-join never degrades
    // to a shuffle when the bench frame lacks stats or exceeds the
    // autoBroadcastJoinThreshold (bench sets are small by definition)
    val corpus = docs.join(broadcast(benchDocs.select(col("doc_id"))),
      Seq("doc_id"), "left_anti")
    val flagged = Corpus.decontamAgainst(corpus, benchDocs, minOverlap)
      .select(col("doc_id")).distinct()
    corpus.join(flagged, Seq("doc_id"), "left_anti")
  }

  /** Stage 5: deterministic md5 train/val/test tag (same keying as
    * q_split_hash — stable under repartition and append).
    */
  def withSplit(docs: DataFrame): DataFrame = {
    val h = substring(md5(concat(lit("s:"), col("doc_id").cast("string"))), 1, 1)
    docs.withColumn("split",
      when(h < "1", "test").when(h < "2", "val").otherwise("train"))
  }

  /** Leakage-safe split: tags keyed on each doc's near-dup CLUSTER
    * representative, clustered at a LOWER threshold than the dedup
    * stage — the weak near-duplicates (est. Jaccard between the two
    * thresholds) that survive dedup are exactly the pairs a doc-keyed
    * split lets straddle train/test, silently leaking eval content into
    * training. Keying the hash on the cluster minimum keeps every
    * member of a weak-dup cluster in ONE split; singletons key on
    * themselves and get the identical tag [[withSplit]] would give.
    * Same shuffle shape as the dedup stage (band join + star
    * contraction on ids only); CorpusPipelineSpec proves zero
    * straddling pairs. Unlike the dedup stage, the hot-bucket cap here
    * is compensated: docs the cap drops from pair generation are tied
    * to their bucket's minimum via linear star edges
    * ([[Similarity.bucketOverflowEdges]]), so the zero-leakage guarantee
    * holds even on corpora dense enough to overflow buckets — the cost
    * is conservative over-merging of band-colliding docs into one split.
    */
  def withClusterSplit(docs: DataFrame, threshold: Double = 0.3): DataFrame = {
    // One window pass, one banded materialization (round 16): `banded`
    // fed THREE plan branches (both self-join sides through capBuckets
    // + the overflow edges), so Catalyst re-planned the MinHash-sign →
    // band-explode tower three times, and capBuckets/bucketOverflowEdges
    // each re-ran the identical (band, band_hash)-ordered window on top
    // (guide §7.2 / §2.4 — dedup the subtree, establish the partitioning
    // once). Ranking ONCE with the bucket minimum carried alongside lets
    // the cap filter and the overflow edges read the same materialized
    // rows; both outputs are row-identical to the old
    // capBuckets/bucketOverflowEdges pair by construction (same window,
    // same rank predicate, first-over-ordered-frame = bucket min).
    val w = Window.partitionBy(col("band"), col("band_hash")).orderBy(col("doc_id"))
    val ranked = graft.Materialize.frame(Similarity.bandedSignaturesOf(docs)
      .withColumn("bucket_rank", row_number().over(w))
      .withColumn("hub", first(col("doc_id")).over(w)))
    val capped = ranked.filter(col("bucket_rank") <= Similarity.MaxBandBucket)
      .drop("bucket_rank", "hub")
    val pairs = Similarity.estPairsFromBands(capped, capped)
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    // the hot-bucket cap bounds pair GENERATION but must not let
    // capped-out docs escape their cluster (and so the split
    // guarantee): each dropped row contributes one star edge to its
    // bucket's minimum instead — linear in bucket size, conservatively
    // over-merging (CorpusPipelineSpec exercises a 200-doc hot bucket)
    val overflow = ranked.filter(col("bucket_rank") > Similarity.MaxBandBucket)
      .select(col("hub").as("src"), col("doc_id").as("dst"))
      .distinct()
    val edges = pairs.unionByName(overflow)
    val comp = StarComponents.connectedComponents(edges, validate = false)
      .withColumnRenamed("id", "doc_id").withColumnRenamed("comp", "rep")
    val h = substring(md5(concat(lit("s:"),
      coalesce(col("rep"), col("doc_id")).cast("string"))), 1, 1)
    docs.join(comp, Seq("doc_id"), "left")
      .withColumn("split",
        when(h < "1", "test").when(h < "2", "val").otherwise("train"))
      .drop("rep")
  }

  /** The composed flow as one declarative frame, no audit counts — the
    * q_corpus_build query surface ([[build]] adds the per-stage counts).
    * Bench set = doc_id % 10, matching q_decontam's convention.
    */
  def buildFrame(docs: DataFrame,
      cacheKey: Option[String] = None): DataFrame = {
    // the dedup survivors feed THREE decontamination branches (the
    // bench-id anti-join consumed twice + the overlap screen), and
    // Catalyst duplicates the whole quality → digest-window → drop
    // anti-join tower per branch (round 15; the before plan shows it
    // three times, each with its own full-text shuffle). One eager
    // materialization — the same boundary [[build]] already pays for
    // its audit counts — makes the dedup pass run once: measured
    // 5.5 s → ~3.5 s at sf0.1.
    val deduped = graft.Materialize.frame(
      nearDedup(exactDedup(qualityFilter(docs)), cacheKey = cacheKey))
    withSplit(decontaminate(deduped, docs.filter(col("doc_id") % 10 === 0)))
  }

  /** The full composition, returning the train-ready frame and the
    * per-stage audit counts. Each audited boundary is localCheckpointed
    * (eagerly materialized) so the count action AND the next stage both
    * read the materialized boundary instead of recomputing the whole
    * prefix — without it, counting stage k re-ran stages 1..k, making
    * the audit path quadratic in stages. On a cluster the same pattern
    * uses reliable checkpoints/cached tables; the trade (materialized
    * boundary storage vs recompute) is the standard one for multi-action
    * pipelines.
    */
  def build(docs: DataFrame): (DataFrame, Summary) = {
    val q = graft.Materialize.frame(qualityFilter(docs))
    val e = graft.Materialize.frame(exactDedup(q))
    val n = graft.Materialize.frame(nearDedup(e))
    val d = graft.Materialize.frame(
      decontaminate(n, docs.filter(col("doc_id") % 10 === 0)))
    val out = withSplit(d)
    (out, Summary(docs.count(), q.count(), e.count(), n.count(), d.count()))
  }
}
