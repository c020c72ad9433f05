package graft.queries

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection and similarity search (north-star:
  * MinHash+LSH, SimHash, embedding cosine ANN).
  *
  * Scale design: every candidate-generation step is a *bucketed*
  * equi-join (LSH bands / simhash bands / hyperplane buckets), never an
  * O(n²) cross join; the exact similarity is only computed on candidate
  * pairs. Hash functions are Spark's xxhash64 (engine-specific) → these
  * are scalatest-verified against exact computations, not DuckDB-oracle
  * (SURVEY.md §2b).
  */
object Similarity {

  val NumPerms = 32  // MinHash permutations
  val BandSize = 4   // → 8 bands of 4 rows: catches Jaccard ≳ 0.5 w.h.p.

  /** Token-3-gram shingles per doc (distinct). Shared with
    * TextOps.jaccardPairs so the MinHash estimate and the exact Jaccard
    * baseline are computed over the identical shingle set.
    */
  def shingles(s: SparkSession, d: String): DataFrame = {
    val toks = T.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("col", "word")
    toks.as("a")
      .join(toks.as("b"), col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
      .join(toks.as("c"), col("a.doc_id") === col("c.doc_id") && col("c.pos") === col("a.pos") + 2)
      .select(col("a.doc_id").as("doc_id"),
        concat_ws(" ", col("a.word"), col("b.word"), col("c.word")).as("shingle"))
      .distinct()
  }

  /** MinHash signature: one min-aggregated hash per permutation, single
    * groupBy pass (no per-permutation shuffle).
    */
  def minhashSignatures(s: SparkSession, d: String): DataFrame = {
    val perms: Seq[Column] = (0 until NumPerms)
      .map(p => min(xxhash64(lit(p), col("shingle"))).as(s"m$p"))
    shingles(s, d).groupBy("doc_id")
      .agg(perms.head, perms.tail: _*)
      .select(col("doc_id"), array((0 until NumPerms).map(p => col(s"m$p")): _*).as("sig"))
  }

  /** Candidate pairs via LSH banding + estimated Jaccard from signature
    * agreement. Pairs sharing ≥1 band bucket are joined; nothing else.
    */
  def minhashPairs(s: SparkSession, d: String, threshold: Double): DataFrame = {
    val sigs = minhashSignatures(s, d)
    val bands = sigs.select(col("doc_id"), col("sig"),
        posexplode(array((0 until NumPerms / BandSize).map { b =>
          xxhash64(Seq(lit(b)) ++ (0 until BandSize).map(i => col("sig")(b * BandSize + i)): _*)
        }: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sig").as("sig_a"), col("y.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    cands.select(col("doc_a"), col("doc_b"),
        round(aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
          .cast("double") / NumPerms, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 64-bit SimHash per document from token-frequency-weighted bit votes. */
  def simhash(s: SparkSession, d: String): DataFrame = {
    val tokCnt = T.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("word")))
    // Scala shiftright/shiftleft require a literal Int bit count; the SQL
    // forms accept a column, so the per-bit extraction goes through expr().
    val bitVotes = tokCnt
      .select(col("doc_id"), col("cnt"), col("h"), explode(sequence(lit(0), lit(63))).as("bit"))
      .withColumn("vote",
        when(expr("shiftright(h, CAST(bit AS INT))").bitwiseAND(1) === 1, col("cnt"))
          .otherwise(-col("cnt")))
      .groupBy(col("doc_id"), col("bit")).agg(sum(col("vote")).as("v"))
    bitVotes
      .withColumn("bitval",
        when(col("v") > 0, expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))
          .otherwise(lit(0L)))
      .groupBy("doc_id").agg(sum(col("bitval")).as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** SimHash near-dup pairs: 4×16-bit band blocking, then Hamming ≤ maxDist. */
  def simhashPairs(s: SparkSession, d: String, maxDist: Int): DataFrame = {
    val sh = simhash(s, d)
    val banded = sh.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_val")
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxDist)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Cast float embedding to double + precompute L2 norm. */
  private def corpus(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d)
      .withColumn("emb", transform(col("embedding"), x => x.cast("double")))
      .withColumn("norm", sqrt(aggregate(col("emb"), lit(0.0), (a, x) => a + x * x)))

  private def cosine(a: Column, b: Column, na: Column, nb: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    when(na * nb === 0, lit(0.0)).otherwise(dot / (na * nb)) // zero-vector guard
  }

  /** Brute-force cosine top-k for a bounded probe set: corpus is streamed
    * once against broadcast probes — correctness baseline; the scale path
    * is [[lshTopK]].
    */
  def bruteForceTopK(s: SparkSession, d: String, probeIds: Seq[Long], k: Int): DataFrame = {
    val c = corpus(s, d)
    val probes = c.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"), col("emb").as("p_emb"), col("norm").as("p_norm"))
    val scored = c.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosine(col("emb"), col("p_emb"), col("norm"), col("p_norm")).as("cos"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("probe_id"), col("rn"), col("vec_id"), round(col("cos"), 4).as("cosine"))
      .orderBy(col("probe_id"), col("rn"))
  }

  /** Sign-random-projection LSH buckets: deterministic hyperplanes
    * (seeded), 12-bit bucket key. At scale, neighbor search becomes a
    * bucket-equi-join instead of a cross join.
    */
  def lshBuckets(s: SparkSession, d: String, nPlanes: Int = 12, seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val planes: Array[Array[Double]] =
      Array.fill(nPlanes)(Array.fill(64)(rnd.nextGaussian()))
    val c = corpus(s, d)
    val bucketBits = (0 until nPlanes).map { p =>
      val plane = array(planes(p).map(v => lit(v)): _*)
      val dot = aggregate(zip_with(col("emb"), plane, (x, y) => x * y), lit(0.0), (a, x) => a + x)
      when(dot >= 0, shiftleft(lit(1), p)).otherwise(lit(0))
    }
    c.withColumn("bucket", bucketBits.reduce(_ + _))
  }

  /** ANN top-k: probes compared only against vectors in the same LSH
    * bucket (plus exact cosine re-rank). Recall < 1 by construction;
    * scalatest checks overlap with the brute-force baseline.
    */
  def lshTopK(s: SparkSession, d: String, probeIds: Seq[Long], k: Int): DataFrame = {
    val b = lshBuckets(s, d)
    val probes = b.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"), col("emb").as("p_emb"),
        col("norm").as("p_norm"), col("bucket").as("p_bucket"))
    val scored = b.join(broadcast(probes),
        col("bucket") === col("p_bucket") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosine(col("emb"), col("p_emb"), col("norm"), col("p_norm")).as("cos"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("probe_id"), col("rn"), col("vec_id"), round(col("cos"), 4).as("cosine"))
      .orderBy(col("probe_id"), col("rn"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_dedup_near", (s, d) => minhashPairs(s, d, 0.5), None),
    QueryDef("q_dedup_simhash", (s, d) => simhashPairs(s, d, 3), None),
    QueryDef("q_sim_topk", (s, d) => bruteForceTopK(s, d, Seq(0L, 1L, 2L), 5), None),
    QueryDef("q_sim_lsh", (s, d) => lshTopK(s, d, Seq(0L, 1L, 2L), 5), None)
  )
}
