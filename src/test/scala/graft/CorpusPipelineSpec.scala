package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusPipeline

/** End-to-end corpus build (queries/CorpusPipeline.scala): the staged
  * composition of quality gate, exact dedup, MinHash near-dedup,
  * decontamination, and splitting — each stage is individually tested
  * elsewhere; this suite proves they COMPOSE: stage monotonicity, no
  * surviving duplicates, no surviving contamination, stable splits.
  */
class CorpusPipelineSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private lazy val built = CorpusPipeline.build(Tables.documents(spark, sf))

  test("stage counts are monotone non-increasing and stages actually filter") {
    val s = built._2
    assert(s.nInput >= s.nQuality && s.nQuality >= s.nExactDedup &&
      s.nExactDedup >= s.nNearDedup && s.nNearDedup >= s.nDecontam)
    assert(s.nInput > 0 && s.nDecontam > 0)
    // the fixture has exact and near duplicates — dedup must remove some
    assert(s.nExactDedup < s.nQuality || s.nNearDedup < s.nExactDedup,
      "fixture duplicates must be removed by some dedup stage")
  }

  test("no two survivors share a normalized text") {
    val out = built._1
    val dups = out.groupBy(sha2(lower(trim(col("text"))), 256))
      .count().filter(col("count") > 1).count()
    assert(dups == 0)
  }

  test("no survivor is a benchmark doc or flagged as contaminated") {
    val out = built._1
    assert(out.filter(col("doc_id") % 10 === 0).count() == 0)
    // re-running the decontam operator over the survivors plus the
    // original benchmark docs finds nothing above threshold
    val bench = Tables.documents(spark, sf).filter(col("doc_id") % 10 === 0)
    val rescored = graft.queries.Corpus.decontamOf(
      out.select("doc_id", "text").unionByName(bench.select("doc_id", "text")))
    assert(rescored.count() == 0)
  }

  test("split tags partition the survivors and are deterministic") {
    val out = built._1.cache()
    val bySplit = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.values.sum == built._2.nDecontam)
    // recomputing after a repartition yields identical tags
    val again = CorpusPipeline.withSplit(out.drop("split").repartition(7))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val first = out.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(again == first)
    out.unpersist()
  }

  test("buildFrame (the q_corpus_build surface) equals build's output frame") {
    val frame = CorpusPipeline.buildFrame(Tables.documents(spark, sf))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = built._1.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(frame.nonEmpty && frame == full)
  }

  test("cluster-keyed split: no weak near-dup pair straddles splits; doc-keyed split does leak") {
    val docs = Tables.documents(spark, sf)
    val pairs = graft.queries.Similarity.minhashPairsOf(docs, 0.3).cache()
    assert(pairs.count() > 0, "fixture must have weak near-dup pairs at 0.3")
    def leaks(tagged: org.apache.spark.sql.DataFrame): Long = pairs
      .join(tagged.select(col("doc_id").as("doc_a"), col("split").as("sa")), Seq("doc_a"))
      .join(tagged.select(col("doc_id").as("doc_b"), col("split").as("sb")), Seq("doc_b"))
      .filter(col("sa") =!= col("sb")).count()
    assert(leaks(CorpusPipeline.withClusterSplit(docs, 0.3)) == 0)
    // the motivating bug: the doc-keyed split separates near-dup pairs
    assert(leaks(CorpusPipeline.withSplit(docs)) > 0)
    pairs.unpersist()
  }

  test("cluster split survives a hot band bucket past the cap") {
    // 200 identical docs: every band bucket holds all 200, the cap (64)
    // drops 136 of them from pair generation — the overflow star edges
    // must still pull every one into a single cluster → a single split.
    // Without them the capped-out docs key the split hash on themselves
    // and scatter across train/val/test while being mutual near-dups.
    val docs = (0L until 200L)
      .map(i => (1000L + i,
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet"))
      .toDF("doc_id", "text")
    val splits = CorpusPipeline.withClusterSplit(docs, 0.3)
      .select("split").distinct().as[String].collect().toSeq
    assert(splits.size == 1,
      s"identical docs past the bucket cap must share one split, got $splits")
  }

  test("planted pipeline: quality reject, exact dup, near dup, contaminated doc all removed") {
    val bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val keep = "the quick brown fox jumps over the lazy dog today"
    val docs = Seq(
      (10L, bench),                            // benchmark (id%10==0): excluded
      (11L, keep),                             // clean: survives
      (12L, keep),                             // exact dup of 11: removed
      (13L, keep + " extra"),                  // near dup of 11: removed
      (14L, "tiny"),                           // quality reject (<5 tokens)
      (15L, bench + " and one more trailer"),  // contaminated: removed
      (16L, "completely unrelated sentence with many distinct tokens here")
    ).toDF("doc_id", "text")
    val (out, s) = CorpusPipeline.build(docs)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(11L, 16L), s"got $ids, summary $s")
  }
}
