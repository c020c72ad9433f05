package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed full-batch logistic regression by gradient aggregation —
  * the in-engine training loop behind q_quality_clf (a CCNet/fastText-
  * style document-quality classifier learned FROM the corpus rather
  * than imported into it).
  *
  * Execution shape (the 100-TB contract, same family as
  * [[KMeansLite]] / [[Bpe]]): the feature frame is corpus-sized and
  * localCheckpointed once; each iteration is two broadcast joins + two
  * map-side-combined aggregations — per-doc margin (doc-keyed, one
  * combined row per doc crosses the shuffle) and per-feature gradient
  * (feature-keyed, bounded by the vocab). Only the model itself — one
  * weight per feature, bounded ≤ vocabSize+1 — ever reaches the
  * driver, the same bounded-collect pattern as the ≤4096 k-means
  * centroids.
  */
object LogReg {

  /** Train on `feats` (doc_id, y, f, x) for `iterations` full-batch
    * steps at rate `lr`, starting from zero weights:
    * w_f ← w_f − lr · Σ_docs x_f·(σ(w·x) − y) / nDocs.
    * Returns the learned (feature, weight) pairs sorted by feature.
    */
  def train(spark: SparkSession, feats: DataFrame, nDocs: Double,
      iterations: Int, lr: Double): Seq[(String, Double)] = {
    val pinned = feats.localCheckpoint(true)
    var w: Seq[(String, Double)] = pinned.select(col("f")).distinct()
      .collect().map(_.getString(0)).sorted.map(_ -> 0.0).toSeq
    import spark.implicits._
    var it = 0
    while (it < iterations) {
      val wDf = w.toDF("f", "wt")
      val resid = pinned.join(broadcast(wDf), "f")
        .groupBy(col("doc_id"), col("y"))
        .agg(sum(col("x") * col("wt")).as("z"))
        .select(col("doc_id"),
          (lit(1.0) / (lit(1.0) + exp(-col("z"))) - col("y")).as("r"))
      val grad = pinned.join(broadcast(resid), "doc_id")
        .groupBy(col("f")).agg(sum(col("x") * col("r")).as("s"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      w = w.map { case (f, wt) => f -> (wt - lr * grad.getOrElse(f, 0.0) / nDocs) }
      it += 1
    }
    w
  }
}
