package graft

import graft.functions.Kmv
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV bottom-k distinct sketch (q_sketch_kmv): exactness below k,
  * bounded error beyond k, set-determined results (partition
  * independence), and the union/intersection estimators against exact
  * set algebra on crafted and fixture data.
  */
class KmvSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val kmv = udaf(Kmv)

  private def sketchOf(values: Seq[Long], parts: Int): Array[Long] =
    values.toDF("v").repartition(parts)
      .select(xxhash64(col("v")).as("h"))
      .agg(kmv(col("h")).as("sk"))
      .head().getAs[scala.collection.Seq[Long]]("sk").toArray

  test("below k the sketch IS the distinct hash set: estimate exact") {
    val sk = sketchOf((1L to 100L) ++ (1L to 100L), parts = 4)
    assert(sk.length == 100)
    assert(Kmv.estimate(sk) == 100.0)
  }

  test("estimate within 3σ (~19%) of exact for 50k distinct keys") {
    val n = 50000L
    val sk = sketchOf(1L to n, parts = 8)
    assert(sk.length == Kmv.K)
    val est = Kmv.estimate(sk)
    val tol = 3.0 / math.sqrt(Kmv.K.toDouble) // ≈ 0.1875
    assert(math.abs(est - n) / n < tol, s"est $est vs exact $n")
  }

  test("sketch is a set property: identical across partitionings and duplication") {
    val base = (1L to 20000L)
    val a = sketchOf(base, parts = 2)
    val b = sketchOf(base ++ base.take(5000), parts = 17)
    assert(a.sameElements(b), "KMV minima must not depend on layout or dup counts")
  }

  test("union/intersection estimates track exact overlap (50% planted)") {
    val a = sketchOf(1L to 20000L, parts = 4)       // A = [1, 20k]
    val b = sketchOf(10001L to 30000L, parts = 4)   // B = [10k+1, 30k]
    val (estU, estI) = Kmv.overlap(a, b)
    assert(math.abs(estU - 30000) / 30000.0 < 0.25, s"union est $estU vs 30000")
    assert(math.abs(estI - 10000) / 10000.0 < 0.35, s"inter est $estI vs 10000")
  }

  test("disjoint sets: intersection estimate is (near) zero") {
    val a = sketchOf(1L to 10000L, parts = 4)
    val b = sketchOf(100001L to 110000L, parts = 4)
    val (_, estI) = Kmv.overlap(a, b)
    // a union-sample element can only count if the same hash sits in
    // both bottom-k sets — impossible for disjoint inputs
    assert(estI == 0.0, s"disjoint sets must estimate 0 overlap, got $estI")
  }

  test("q_sketch_kmv fixture estimates agree with exact distinct-token algebra") {
    val row = SparkEntry.queries("q_sketch_kmv")(spark, sf).head()
    val toks = Tables.documents(spark, sf)
      .select((regexp_extract(col("source"), "(\\d+)", 1).cast("int") % 2).as("grp"),
        explode(split(col("text"), " ")).as("tok"))
    val even = toks.filter(col("grp") === 0).select("tok").distinct().count()
    val odd  = toks.filter(col("grp") === 1).select("tok").distinct().count()
    val union = toks.select("tok").distinct().count()
    val inter = even + odd - union
    val tol = 0.2
    def ok(est: Long, exact: Long, what: String): Unit =
      assert(math.abs(est - exact).toDouble / exact.max(1L) < tol,
        s"$what: est $est vs exact $exact")
    ok(row.getLong(0), even, "even-domain distinct")
    ok(row.getLong(1), odd, "odd-domain distinct")
    ok(row.getLong(2), union, "union")
    ok(row.getLong(3), inter, "intersection")
  }
}
