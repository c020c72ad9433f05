package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the privacy release gate (queries/Privacy.scala) beyond
  * the driver's oracle hash-match: noise magnitude bounds, determinism,
  * and the k-anonymity accounting identity.
  */
class PrivacySpec extends AnyFunSuite with SharedSpark {

  test("q_dp_noise: noise bounded by the Laplace tail, deterministic, floored at 0") {
    val out = SparkEntry.queries("q_dp_noise")(spark, sf)
    val rows = out.collect() // ≤ langs × sources = 100 groups
    assert(rows.nonEmpty)
    // |Laplace(b=2)| at the 2^-24-grained uniform is at most
    // 2·ln(2^24) ≈ 33.3; anything larger means the inverse CDF is wrong.
    rows.foreach { r =>
      val trueN = r.getAs[Long]("true_n").toDouble
      val noisy = r.getAs[Double]("noisy_n")
      assert(noisy >= 0.0, s"released count must be floored at 0: $r")
      assert(math.abs(noisy - trueN) <= 2 * math.log(16777216.0) + 1e-9,
        s"noise exceeds the Laplace tail bound: $r")
    }
    // Same key ⇒ same draw: a second evaluation must hash identically.
    val again = SparkEntry.queries("q_dp_noise")(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
    // The draw must not be constant across groups (a sign()/abs() bug
    // collapsing every u to the same side would still pass the bound).
    val noises = rows.map(r => r.getAs[Double]("noisy_n") - r.getAs[Long]("true_n"))
    assert(noises.distinct.length > rows.length / 2,
      "noise draws should differ across group keys")
    assert(noises.exists(_ > 0.01) && noises.exists(_ < -0.01),
      "Laplace draws must land on both sides of zero")
  }

  test("q_k_anon: class sizes sum to the corpus; suppress ⟺ size < 3") {
    val out = SparkEntry.queries("q_k_anon")(spark, sf)
    val total = out.agg(sum(col("class_size"))).head.getLong(0)
    val nDocs = Tables.documents(spark, sf).count()
    assert(total == nDocs, s"equivalence classes must partition the corpus: $total != $nDocs")
    val bad = out.filter(col("suppress") =!= (col("class_size") < 3)).count()
    assert(bad == 0, "suppression verdict must match the k threshold exactly")
    assert(out.filter(col("suppress")).count() > 0,
      "fixture should contain at least one sub-k class (else the test is vacuous)")
  }
}
