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

  test("doc-major fast path learns the same weights as the join form (4 dp)") {
    import spark.implicits._
    // mixed doc sizes + duplicate-free (doc, f) rows, several features
    val feats = (0 until 50).flatMap { i =>
      val y = if (i % 2 == 0) 1.0 else 0.0
      val marker = if (y == 1.0) "pos" else "neg"
      Seq((i.toLong, y, marker, 1.0 + (i % 3)), (i.toLong, y, "noise", 1.0),
        (i.toLong, y, "_bias", 1.0))
    }.toDF("doc_id", "y", "f", "x")
    val fast = ml.LogReg.train(spark, feats, 50.0, 10, 0.5)
      .map { case (f, w) => f -> math.rint(w * 1e4) / 1e4 }
    val join = ml.LogReg.trainJoinForm(spark, feats, 50.0, 10, 0.5)
      .map { case (f, w) => f -> math.rint(w * 1e4) / 1e4 }
    assert(fast == join)
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

  test("iteration plans reuse the pinned doc_id partitioning: zero exchanges, margins never broadcast") {
    import spark.implicits._
    val feats = (0 until 64).flatMap { i =>
      Seq((i.toLong, (i % 2).toDouble, "tok" + (i % 8), 1.0),
        (i.toLong, (i % 2).toDouble, "_bias", 1.0))
    }.toDF("doc_id", "y", "f", "x")
    val pinned = feats.repartition(col("doc_id")).persist()
    val wDf = Seq(("_bias", 0.0)).toDF("f", "wt")
      .union((0 until 8).map(k => ("tok" + k, 0.0)).toDF("f", "wt"))
    // Forced-broadcast hints survive autoBroadcastJoinThreshold=-1;
    // stats-driven AQE broadcasts do not — so with the threshold off,
    // any BroadcastExchange on the doc-keyed margins is a plan bug.
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val grad = ml.LogReg.gradientFrame(pinned,
        ml.LogReg.residualFrame(pinned, wDf))
      grad.queryExecution.toRdd.count()
      // Walk the EXECUTED adaptive plan (not the printed text, which
      // repeats the cached subtree and the pre-adaptive initial plan).
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      def walk(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => q +: walk(q.plan)
        case _: InMemoryTableScanExec => Seq(p) // stop: cached subtree is pre-paid
        case _ => p +: p.children.flatMap(walk)
      }
      val nodes = walk(grad.queryExecution.executedPlan)
      val shuffles = nodes.collect { case e: ShuffleExchangeExec => e.outputPartitioning.toString }
      assert(shuffles.length == 1 && shuffles.head.contains("f#"),
        s"only the f-keyed agg may shuffle, found $shuffles")
      val bcasts = nodes.count(_.isInstanceOf[BroadcastExchangeExec])
      assert(bcasts == 1, s"only the weight join may broadcast, found $bcasts")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
