package graft

import graft.functions.Kll
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KLL quantile-sketch guarantees, asserted empirically against exact
  * quantiles (the SpaceSaving convention for merge-order-dependent
  * sketches): rank-error bounds across distributions and
  * partitionings, and the n ≤ Cap exactness floor.
  */
class KllSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  /** Exact rank (0..1) of `v` in `xs`: fraction of items ≤ v. */
  private def rankOf(xs: Array[Double], v: Double): Double =
    xs.count(_ <= v).toDouble / xs.length

  private def sketchOf(xs: Seq[Double], parts: Int): Array[Double] = {
    val k = udaf(Kll)
    xs.toDF("v").repartition(parts)
      .agg(k(col("v")).as("sk"))
      .head().getAs[scala.collection.Seq[Double]]("sk").toArray
  }

  /** Observed rank error at the probe quantiles must stay within eps. */
  private def assertBounds(xs: Seq[Double], parts: Int, eps: Double): Unit = {
    val sk = sketchOf(xs, parts)
    assert(math.round(sk(0)) == xs.length, "sketch must count n exactly")
    val sorted = xs.toArray.sorted
    for (p <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)) {
      val est = Kll.quantile(sk, p)
      val err = math.abs(rankOf(sorted, est) - p)
      assert(err <= eps, f"p=$p%.2f parts=$parts: rank error $err%.4f > $eps")
    }
  }

  test("empty sketch (n=0) answers NaN instead of throwing") {
    // merge/finish of two zero buffers legitimately serializes as [0.0];
    // the quantile of nothing is NaN (the percentile-over-0-rows
    // convention), never a NoSuchElementException in an executor
    val empty = Kll.finish(Kll.merge(Kll.zero, Kll.zero))
    assert(empty.toSeq == Seq(0.0))
    for (p <- Seq(0.0, 0.5, 1.0))
      assert(Kll.quantile(empty, p).isNaN, s"p=$p on empty sketch must be NaN")
  }

  test("exact below capacity: n <= Cap sketches answer every quantile exactly") {
    val xs = (1 to Kll.Cap).map(i => (i * 37 % 251).toDouble)
    val sk = sketchOf(xs, 3)
    val sorted = xs.toArray.sorted
    for (p <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
      val exact = sorted(math.max(0, math.ceil(p * xs.length).toInt - 1))
      assert(Kll.quantile(sk, p) == exact, s"p=$p must be exact below Cap")
    }
  }

  test("uniform distribution: rank error within 3% at 100k values") {
    // deterministic pseudo-uniform stream (no Math.random in tests)
    val xs = (0 until 100000).map(i =>
      ((i * 2654435761L) % 1000003L).toDouble)
    assertBounds(xs, 8, 0.03)
  }

  test("heavily skewed (Zipf-ish) distribution holds the same bound") {
    val xs = (0 until 100000).map { i =>
      val u = ((i * 2654435761L) % 999983L).toDouble / 999983.0
      math.pow(u, 4) * 1000.0 // mass piled near 0, long tail to 1000
    }
    assertBounds(xs, 8, 0.03)
  }

  test("partitioning independence of the BOUND: 1, 4, and 32 partitions all pass") {
    val xs = (0 until 50000).map(i => ((i * 48271L) % 65537L).toDouble)
    for (parts <- Seq(1, 4, 32)) assertBounds(xs, parts, 0.03)
  }

  test("q_sketch_quantile matches exact per-type quantiles within the bound") {
    val got = SparkEntry.queries("q_sketch_quantile")(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    val exact = Tables.events(spark, sf)
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.nonEmpty && got.map(_._1).toSet == exact.keySet)
    got.foreach { case (t, n, p50, p95, p99) =>
      val xs = exact(t)
      assert(n == xs.length)
      for ((p, est) <- Seq(0.5 -> p50, 0.95 -> p95, 0.99 -> p99)) {
        val err = math.abs(rankOf(xs, est) - p)
        assert(err <= 0.04, f"$t p=$p: rank error $err%.4f")
      }
    }
  }
}
