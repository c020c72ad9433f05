package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distribution-free SpaceSaving guarantees, asserted against exact
  * counts — counter values are merge-order-dependent, so the contract
  * (not the numbers) is what the sketch owes:
  *   (1) overcount: est(t) ≥ true(t) for every reported item;
  *   (2) n/M band: est(t) ≤ true(t) + n/M (per-merge errors telescope
  *       to the total stream length over M);
  *   (3) heavy-hitter recall: every item with true count > 2n/M is in
  *       the sketch (its estimate can't be evicted below a true heavy
  *       count when the floor is ≤ n/M).
  */
class SketchTopKSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def tokens = Tables.documents(spark, sf)
    .select(explode(split(lower(col("text")), " ")).as("tok"))

  test("SpaceSaving: overcount, n/M error band, heavy-hitter recall vs exact") {
    val ss = udaf(graft.functions.SpaceSaving)
    val sk = tokens.agg(ss(col("tok")))
      .head().getAs[scala.collection.Map[String, Long]](0)
    val exact = tokens.groupBy("tok").count()
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val band = n / graft.functions.SpaceSaving.M
    assert(sk.nonEmpty && sk.size <= graft.functions.SpaceSaving.M)
    sk.foreach { case (t, est) =>
      val tr = exact.getOrElse(t, 0L)
      assert(est >= tr, s"undercount for '$t': est=$est true=$tr")
      assert(est <= tr + band, s"'$t' above band: est=$est true=$tr band=$band")
    }
    val heavy = exact.filter(_._2 > 2L * band).keySet
    assert(heavy.nonEmpty, "fixture must contain heavy hitters for this test")
    heavy.foreach(t => assert(sk.contains(t), s"heavy hitter '$t' missing"))
  }

  test("SpaceSaving: guarantees hold under a different partitioning (merge path)") {
    val ss = udaf(graft.functions.SpaceSaving)
    val sk = tokens.repartition(13).agg(ss(col("tok")))
      .head().getAs[scala.collection.Map[String, Long]](0)
    val exact = tokens.groupBy("tok").count()
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val band = n / graft.functions.SpaceSaving.M
    sk.foreach { case (t, est) =>
      val tr = exact.getOrElse(t, 0L)
      assert(est >= tr && est <= tr + band,
        s"'$t' out of band under repartition: est=$est true=$tr band=$band")
    }
    exact.filter(_._2 > 2L * band).keySet
      .foreach(t => assert(sk.contains(t), s"heavy hitter '$t' missing"))
  }

  test("SpaceSaving: eviction path — guarantees on a 10k-distinct stream") {
    // the fixture vocabulary (~30 words) never saturates M=64, so this
    // stream forces evictions: 5 planted heavies (1000 each) drowned in
    // 10k singletons. distinct >> M ⇒ the replace-min path runs
    // constantly, and the guarantees must still hold.
    val heavies = (0 until 5).flatMap(h => Seq.fill(1000)(s"heavy$h"))
    val rares = (0 until 10000).map(i => s"rare$i")
    val stream = spark.sparkContext
      .parallelize(new scala.util.Random(42).shuffle(heavies ++ rares), 11).toDF("tok")
    val ss = udaf(graft.functions.SpaceSaving)
    val sk = stream.agg(ss(col("tok")))
      .head().getAs[scala.collection.Map[String, Long]](0)
    val n = heavies.size + rares.size
    val band = n / graft.functions.SpaceSaving.M
    assert(sk.size == graft.functions.SpaceSaving.M, "sketch must be saturated")
    (0 until 5).foreach { h =>
      val t = s"heavy$h"
      assert(sk.contains(t), s"$t (1000 > 2*band=$band... ) evicted")
      assert(sk(t) >= 1000L && sk(t) <= 1000L + band,
        s"$t est=${sk(t)} outside [1000, ${1000 + band}]")
    }
    // every reported rare is a singleton: est must stay within the band
    sk.foreach { case (t, est) =>
      val tr = if (t.startsWith("heavy")) 1000L else 1L
      assert(est >= tr && est <= tr + band, s"'$t' est=$est true=$tr band=$band")
    }
  }

  test("priority sampling: population <= k keeps every weight exact (tau = 0)") {
    // Duffield–Lund–Thorup: with no (k+1)-th priority the subset-sum
    // estimator must return w itself — a min-of-kept tau would inflate
    // every est_w above w (q = w/u > w always) and sum(est_w) would
    // overestimate total weight on small populations.
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 10)
    val got = graft.queries.Pipeline.prioritySampleOf(docs, 20)
      .select(col("doc_id"), col("n_chars"), col("est_w"))
      .as[(Long, Long, Double)].collect()
    assert(got.length == 10, "all 10 docs must be sampled when k=20")
    got.foreach { case (id, w, est) =>
      assert(est == w.toDouble, s"doc $id: est_w=$est must equal w=$w when n <= k")
    }
  }

  test("q_sketch_topk declared head matches the exact top tokens") {
    val got = SparkEntry.queries("q_sketch_topk")(spark, sf)
      .as[(Int, String)].collect().sortBy(_._1).map(_._2)
    val exact = tokens.groupBy("tok").count().as[(String, Long)].collect()
      .sortBy { case (t, c) => (-c, t) }.take(10).map(_._1)
    // head membership (not order): estimates can swap near-ties, but on
    // the zipfy fixture the top-10 SET should agree with exact
    assert(got.toSet == exact.toSet,
      s"got ${got.mkString(",")} want ${exact.mkString(",")}")
  }
}
