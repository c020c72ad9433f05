package graft

import graft.queries.{Curation, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the curation pack: paragraph dedup reassembly semantics,
  * BM25 ranking properties, column-profile invariants, and SemDeDup
  * removal correctness on planted duplicates (the oracle-checked
  * q_dedup_para / q_bm25 / q_profile get their value checks from the
  * driver's DuckDB compare; these tests pin the engine-side semantics).
  */
class CurationSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  // 8 tokens = exactly one paragraph (Curation.ParaTokens)
  private val para1 = "a b c d e f g h"
  private val para2 = "i j k l m n o p"
  private val para3 = "q r s t u v w x"

  test("paragraph dedup: repeated paragraph survives only at its first (doc_id, idx)") {
    val docs = Seq(
      (0L, s"$para1 $para2"),        // owns para1, para2
      (1L, s"$para1 $para3"),        // para1 claimed by doc 0 → keeps only para3
      (2L, s"$para1 $para2")         // fully claimed → empty
    ).toDF("doc_id", "text")
    val out = Curation.paraDedupOf(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(0L) == ((2L, s"$para1 $para2")))
    assert(out(1L) == ((1L, para3)))
    assert(out(2L) == ((0L, "")))
  }

  test("paragraph dedup: order of surviving paragraphs is the original document order") {
    val docs = Seq(
      (0L, para2),                           // claims para2
      (1L, s"$para1 $para2 $para3")          // loses the MIDDLE paragraph
    ).toDF("doc_id", "text")
    val out = Curation.paraDedupOf(docs).filter(col("doc_id") === 1L).head()
    assert(out.getLong(1) == 2L)
    assert(out.getString(2) == s"$para1 $para3") // middle removed, order kept
  }

  test("paragraph dedup: a short tail (< 8 tokens) is its own paragraph") {
    val docs = Seq((0L, s"$para1 tail tok"), (1L, "tail tok")).toDF("doc_id", "text")
    val out = Curation.paraDedupOf(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 0 keeps both its full paragraph and the 2-token tail; doc 1's
    // identical tail paragraph is claimed by doc 0
    assert(out(0L) == 2L && out(1L) == 0L)
  }

  test("paragraph dedup: a tokenless doc contributes zero paragraphs, no phantom empties (round 13)") {
    // Reachable since the Unicode tokenizer: "!!!" tokenizes to [].
    // Unguarded, sequence(0, floor((0-1)/8)) = the DESCENDING [0, -1]
    // would emit two phantom "" paragraphs, and the min doc_id would
    // WIN the "" digest, reporting n_kept = 1 where the oracle says 0.
    val docs = Seq((0L, "!!! … 。"), (1L, s"$para1"), (2L, ""))
      .toDF("doc_id", "text")
    val out = Curation.paraDedupOf(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(0L) == ((0L, "")), s"phantom paragraphs: ${out(0L)}")
    assert(out(2L) == ((0L, "")), s"phantom paragraphs: ${out(2L)}")
    assert(out(1L) == ((1L, para1)))
  }

  test("bm25: rarer terms score higher; repetition raises, length lowers") {
    val docs = Seq(
      (0L, "spark x x x x x x x"),             // 1× spark, dl 8
      (1L, "spark spark x x x x x x"),         // 2× spark, dl 8
      (2L, "spark x x x x x x x x x x x x x x x"), // 1× spark, dl 16
      (3L, "merge x x x x x x x"),             // 1× merge (rarer: df 1 vs 3)
      (4L, "spark y y y y y y y")              // 1× spark, dl 8 (pads spark's df)
    ).toDF("doc_id", "text")
    val got = Curation.bm25Of(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(0L), "higher tf must raise the score")
    assert(got(0L) > got(2L), "longer doc with same tf must score lower")
    assert(got(3L) > got(0L), "rarer term must out-score a common one")
  }

  test("bm25: result is the top-k by score with doc_id tiebreak") {
    val docs = Tables.documents(spark, sf)
    val rows = Curation.bm25Of(docs).collect()
    assert(rows.length == 10)
    val scores = rows.map(r => (-r.getDouble(1), r.getLong(0)))
    assert(scores.sameElements(scores.sorted), "must be ordered by (bm25 desc, doc_id)")
  }

  test("profile: one row per orders column, counts consistent with the table") {
    val orders = Tables.orders(spark, sf)
    val n = orders.count()
    val prof = Curation.profileOrdersOf(orders).collect()
    assert(prof.map(_.getString(0)).toSeq == Seq("o_custkey", "o_orderdate",
      "o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"))
    val byCol = prof.map(r => r.getString(0) -> r).toMap
    // o_orderkey is the PK: no nulls, all-distinct, min/max match the data
    val pk = byCol("o_orderkey")
    assert(pk.getLong(1) == 0L && pk.getLong(2) == n)
    assert(pk.getDouble(3) == orders.agg(min("o_orderkey")).head().getLong(0).toDouble)
    // every column's distinct count is ≤ rows and > 0
    prof.foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(2) <= n, s"${r.getString(0)} distinct")
    }
  }

  test("approx profile: HLL distincts within 5% of exact, nulls identical, no Expand") {
    val orders = Tables.orders(spark, sf)
    val exact = Curation.profileOrdersOf(orders).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val approxDf = Curation.profileOrdersApproxOf(orders)
    assert(!approxDf.queryExecution.executedPlan.toString.contains("Expand"),
      "the HLL profile must not expand the input")
    approxDf.collect().foreach { r =>
      val (nulls, dist) = exact(r.getString(0))
      assert(r.getLong(1) == nulls, s"${r.getString(0)} null count must be exact")
      val est = r.getLong(2)
      assert(math.abs(est - dist) <= math.max(1L, (dist * 0.05).toLong),
        s"${r.getString(0)} estimate $est vs exact $dist")
    }
  }

  test("deterministic shuffle: shard+pos are a pure function of doc_id, positions contiguous") {
    val once = SparkEntry.queries("q_shuffle_det")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // stable under a different input partitioning: run the SAME sharding
    // logic over a repartitioned (and differently-ordered) input frame
    val docs = Tables.documents(spark, sf).repartition(7)
    val again = Curation.shuffleDetOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(once == again, "shard/pos must not depend on physical layout")
    // per shard: positions are exactly 1..n_shard
    once.values.groupBy(_._1).foreach { case (shard, members) =>
      val ps = members.map(_._2).toSeq.sorted
      assert(ps == (1L to ps.length.toLong), s"shard $shard positions not contiguous")
    }
    // the md5 nibble spreads docs over all 16 shards at fixture size
    assert(once.values.map(_._1).toSet.size == 16)
  }

  test("semantic dedup: planted near-duplicates are removed, keeper is the lower id") {
    val base = Tables.embeddings(spark, sf)
    val copies = base.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + 100000L)
      .withColumn("embedding",
        transform(col("embedding"), (x, i) => when(i === 0, x + lit(0.01f)).otherwise(x)))
    val corpus = base.unionByName(copies)
    val removals = Curation.semDedupRemovalsOf(corpus, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // every planted copy is removed, dominated by its original
    (0L until 10L).foreach { i =>
      assert(removals.get(i + 100000L).contains(i),
        s"copy of $i missing or wrong keeper: ${removals.get(i + 100000L)}")
    }
    // nothing else is removed: the fixture corpus is isotropic (max
    // pairwise cosine 0.51, measured)
    assert(removals.size == 10)
    // cluster accounting sums: removals + survivors = corpus size
    val summary = Curation.semDedupClustersOf(corpus, threshold = 0.95).collect()
    assert(summary.map(_.getLong(1)).sum == corpus.count())
    assert(summary.map(_.getLong(2)).sum == 10L)
    assert(summary.map(_.getLong(3)).sum == corpus.count() - 10L)
  }

  test("semantic dedup: fixture-only corpus removes nothing (k clusters, all survive)") {
    val emb = Tables.embeddings(spark, sf)
    val summary = Curation.semDedupClustersOf(emb).collect()
    assert(summary.nonEmpty)
    assert(summary.forall(_.getLong(2) == 0L), "no natural near-dups in the fixture")
    assert(summary.map(_.getLong(1)).sum == emb.count())
  }

  test("semantic dedup parity: in-cluster removals agree with brute-force pairs when clusters are coarse") {
    // with ONE cluster, SemDeDup must equal the exact all-pairs answer
    val base = Tables.embeddings(spark, sf).filter(col("vec_id") < 50)
    val copies = base.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 1000L)
    val corpus = base.unionByName(copies)
    val sem = Curation.semDedupRemovalsOf(corpus, threshold = 0.95, lists = 1)
      .select("removed_id").as[Long].collect().toSet
    val brute = Similarity.cosineDupPairsOf(corpus, 0.95)
      .select(col("vec_b")).as[Long].collect().toSet
    // brute-force emits (a,b) pairs; the removed set is every vector
    // dominated by a lower id — identical vectors ⇒ exactly the copies
    assert(sem == (0L until 5L).map(_ + 1000L).toSet)
    assert(brute.subsetOf(sem union (0L until 5L).map(_ + 1000L).toSet))
  }

  test("rrf fusion: top-of-both-lists wins, ranks are dense, partitions are independent") {
    // lang xx: doc 20 is rank 1 in BOTH signals (most tokens AND most
    // chars) so it must be fused rank 1; lang yy is a 1-doc partition.
    val docs = Seq(
      (10L, "a b c", "xx", 50L),
      (20L, "a b c d e f", "xx", 200L),
      (30L, "a", "xx", 120L),
      (40L, "a b", "yy", 10L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val out = Curation.rrfFusedOf(docs).collect()
    val xx = out.filter(_.getString(0) == "xx").sortBy(_.getInt(1))
    assert(xx.head.getLong(2) == 20L, s"dual-top doc must fuse first: ${xx.toSeq}")
    assert(xx.map(_.getInt(1)).toSeq == (1 to 3), "dense fused ranks per lang")
    // rrf scores non-increasing in fused rank
    assert(xx.sliding(2).forall { case Array(a, b) => a.getDouble(3) >= b.getDouble(3) })
    val yy = out.filter(_.getString(0) == "yy")
    assert(yy.length == 1 && yy.head.getInt(1) == 1 && yy.head.getLong(2) == 40L)
    // 1/(60+1) + 1/(60+1) rounded at 4 dp
    assert(math.abs(yy.head.getDouble(3) - 0.0328) < 1e-9)
  }
}
