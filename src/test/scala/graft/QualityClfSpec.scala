package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** In-engine logistic-regression quality classifier (q_quality_clf /
  * ml/LogReg): the training loop must move weights toward the planted
  * signal, and the learned model must actually separate the fixture's
  * target class.
  */
class QualityClfSpec extends AnyFunSuite with SharedSpark {

  test("planted separable tokens get correctly-signed weights") {
    import spark.implicits._
    // y=1 docs say 'good', y=0 docs say 'bad'; 'noise' appears in both
    val feats = (0 until 40).flatMap { i =>
      val y = if (i % 2 == 0) 1.0 else 0.0
      val marker = if (y == 1.0) "good" else "bad"
      Seq((i.toLong, y, marker, 2.0), (i.toLong, y, "noise", 1.0),
        (i.toLong, y, "_bias", 1.0))
    }.toDF("doc_id", "y", "f", "x")
    val w = ml.LogReg.train(spark, feats, 40.0, iterations = 12, lr = 0.5).toMap
    assert(w("good") > 0.1, s"'good' should get a positive weight: $w")
    assert(w("bad") < -0.1, s"'bad' should get a negative weight: $w")
    assert(math.abs(w("noise")) < math.abs(w("good")) / 2,
      s"the uninformative token should stay near zero: $w")
  }

  test("learned model separates the target class on the fixture") {
    // sf0.01: the 500-doc corpus the driver verifies at — the 50-doc
    // sf0.001 fixture is too small for the lang signal to emerge
    val sf01 = "/root/testdata/sf0.01"
    val weights = SparkEntry.queries("q_quality_clf")(spark, sf01)
    val wMap = weights.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val tk = Tables.documents(spark, sf01)
      .select(col("doc_id"), col("lang"),
        explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .collect()
    // driver-side margin scoring with the learned weights (fixture-
    // sized); compare mean margins, not sigmoids — σ saturates
    val scores = tk.groupBy(r => (r.getLong(0), r.getString(1))).map { case ((_, lang), rows) =>
      val z = wMap("_bias") + rows.map(r => wMap.getOrElse(r.getString(2), 0.0)).sum
      (lang, z)
    }.toSeq
    val en = scores.filter(_._1 == "en").map(_._2)
    val rest = scores.filter(_._1 != "en").map(_._2)
    assert(en.nonEmpty && rest.nonEmpty)
    val enMean = en.sum / en.size
    val restMean = rest.sum / rest.size
    assert(enMean > restMean + 0.1,
      f"expected margin separation, got en=$enMean%.4f rest=$restMean%.4f")
  }

  test("weights are invariant to input partitioning") {
    import spark.implicits._
    val feats = (0 until 30).flatMap { i =>
      val y = if (i % 3 == 0) 1.0 else 0.0
      Seq((i.toLong, y, "tok", (i % 5 + 1).toDouble), (i.toLong, y, "_bias", 1.0))
    }.toDF("doc_id", "y", "f", "x")
    val a = ml.LogReg.train(spark, feats.repartition(1), 30.0, 8, 0.5)
      .map { case (f, w) => f -> math.rint(w * 1e4) / 1e4 }
    val b = ml.LogReg.train(spark, feats.repartition(7), 30.0, 8, 0.5)
      .map { case (f, w) => f -> math.rint(w * 1e4) / 1e4 }
    assert(a == b)
  }
}
