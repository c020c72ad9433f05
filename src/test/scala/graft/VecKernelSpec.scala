package graft

import graft.functions.VecExprs
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Direct semantics lock for the vector kernels (the recall/distortion
  * tests cover them end-to-end; these pin the per-element contract).
  */
class VecKernelSpec extends AnyFunSuite with SharedSpark {

  private def embFrame(vs: Seq[Array[Double]]) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("emb", ArrayType(DoubleType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        vs.zipWithIndex.map { case (v, i) => Row(i.toLong, v.toSeq) }),
      schema)
  }

  test("srpBuckets equals the per-bit sign reference at an adaptive-size geometry") {
    val rnd = new scala.util.Random(11)
    val nTables = 5; val bits = 13; val dim = 24 // a geometry the CASE-tree form choked on
    val planes = Array.fill(nTables * bits)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = Seq.fill(50)(Array.fill(dim)(rnd.nextGaussian()))
    val got = embFrame(vecs)
      .withColumn("buckets", VecExprs.srpBuckets(col("emb"), planes, nTables, bits))
      .orderBy("vec_id").select("buckets")
      .collect().map(_.getSeq[Long](0).toArray)
    // reference: same left-to-right accumulation order as the kernel, so
    // the IEEE result (and thus every sign bit) must match exactly
    val want = vecs.map { v =>
      (0 until nTables).map { t =>
        (0 until bits).foldLeft(0L) { (acc, b) =>
          var s = 0.0
          var j = 0
          while (j < dim) { s += v(j) * planes(t * bits + b)(j); j += 1 }
          if (s >= 0.0) acc | (1L << b) else acc
        }
      }.toArray
    }
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g.sameElements(w), s"vector $i: ${g.toSeq} != ${w.toSeq}")
    }
  }

  test("centroidScores equals dot minus half squared norm, argmax picks the nearest centroid") {
    val rnd = new scala.util.Random(17)
    val k = 9; val dim = 12
    val cents = Array.fill(k)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = Seq.fill(30)(Array.fill(dim)(rnd.nextGaussian()))
    val got = embFrame(vecs)
      .withColumn("s", VecExprs.centroidScores(col("emb"), cents))
      .orderBy("vec_id").select("s")
      .collect().map(_.getSeq[Double](0).toArray)
    vecs.zip(got).foreach { case (v, scores) =>
      val want = cents.map { c =>
        var s = 0.0; var j = 0
        while (j < dim) { s += v(j) * c(j); j += 1 }
        s - c.map(x => x * x).sum / 2.0
      }
      assert(scores.sameElements(want))
      // the assignment rule: argmax of adjusted dots == argmin of L2
      def d2(c: Array[Double]) = v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(scores.indexOf(scores.max) == cents.map(d2).zipWithIndex.minBy(_._1)._2)
    }
  }

  test("srpBuckets hard-fails on a plane/vector dimension mismatch") {
    val planes = Array.fill(4)(Array.fill(8)(1.0))
    val bad = embFrame(Seq(Array.fill(5)(1.0)))
      .withColumn("b", VecExprs.srpBuckets(col("emb"), planes, 2, 2))
    val e = intercept[Exception](bad.collect())
    assert(e.toString.contains("srp_buckets") ||
      Option(e.getCause).exists(_.toString.contains("srp_buckets")))
  }

  test("dotProducts hard-fails on a matrix-row dimension mismatch") {
    val mat = Array(Array(1.0, 2.0, 3.0))
    val bad = embFrame(Seq(Array(1.0, 2.0)))
      .withColumn("d", VecExprs.dotProducts(col("emb"), mat))
    val e = intercept[Exception](bad.collect())
    assert(e.toString.contains("dot_products") ||
      Option(e.getCause).exists(_.toString.contains("dot_products")))
  }
}
