package graft

import graft.ml.KMeansLite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite with SharedSpark {

  private def emb = Tables.embeddings(spark, sf)
    .withColumn("emb", col("embedding").cast("array<double>"))
    .select(col("vec_id"), col("emb"))

  private def seeds: Array[Array[Double]] =
    emb.orderBy("vec_id").limit(8).collect().map(_.getSeq[Double](1).toArray)

  test("Lloyd iterations never increase within-cluster sum of squares") {
    val s0 = seeds
    val w0 = KMeansLite.wcss(KMeansLite.assign(emb, s0), s0)
    val c1 = KMeansLite.fit(emb, s0, iters = 1)
    val w1 = KMeansLite.wcss(KMeansLite.assign(emb, c1), c1)
    val c3 = KMeansLite.fit(emb, s0, iters = 3)
    val w3 = KMeansLite.wcss(KMeansLite.assign(emb, c3), c3)
    assert(w1 <= w0 + 1e-6, s"one iteration worsened WCSS: $w0 -> $w1")
    assert(w3 <= w1 + 1e-6, s"more iterations worsened WCSS: $w1 -> $w3")
    assert(w3 < w0, "training should strictly improve on raw seeds here")
  }

  test("assignment covers all rows with valid cluster ids") {
    val a = KMeansLite.assign(emb, seeds)
    assert(a.count() == emb.count())
    assert(a.filter(col("cid") < 0 || col("cid") >= 8).count() == 0)
  }

  test("fit is deterministic") {
    val a = KMeansLite.fit(emb, seeds, iters = 2)
    val b = KMeansLite.fit(emb, seeds, iters = 2)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
