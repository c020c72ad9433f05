package graft.ml

import graft.functions.VecExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal DataFrame-native Lloyd's k-means over `array<double>` columns
  * — the IVF training step done properly (SURVEY.md §2b q_sim_ivf notes),
  * and the house pattern for iterative workloads:
  *
  *  - the assignment step is one codegen'd DotProducts kernel call per
  *    row against the broadcast centroid matrix (argmin ‖x−c‖² ≡
  *    argmax(x·c − ‖c‖²/2), so dots suffice);
  *  - the update step is an explode-by-dimension elementwise mean — a
  *    single shuffle of (cid, dim, value) triples, never of vectors;
  *  - the input is cached ONCE outside the loop and unpersisted after
  *    (each iteration re-reads the cache, not the source), and centroids
  *    travel driver→executors as broadcast literals (k×64 doubles).
  *
  * At 100 TB: same plan per iteration, centroid matrix stays tiny, and
  * the only growing cost is the (cid, dim) shuffle — 64×N rows of 24
  * bytes, well within shuffle budgets.
  */
object KMeansLite {

  /** Assign each vector its nearest centroid id as column `cid`. */
  def assign(emb: DataFrame, cents: Array[Array[Double]]): DataFrame =
    emb
      .withColumn("scores", VecExprs.centroidScores(col("emb"), cents))
      .withColumn("cid",
        expr("array_position(scores, array_max(scores)) - 1").cast("int"))
      .drop("scores")

  /** Within-cluster sum of squared distances (convergence metric), via
    * ‖x−c‖² = ‖x‖² − 2·(dot(x,c) − ‖c‖²/2) so the centroid matrix rides
    * inside the kernel instead of as a k×dim literal array (which would
    * grow generated code with the adaptive list count).
    */
  def wcss(assigned: DataFrame, cents: Array[Array[Double]]): Double =
    assigned
      .withColumn("scores", VecExprs.centroidScores(col("emb"), cents))
      .select((aggregate(col("emb"), lit(0.0), (a, x) => a + x * x)
        - lit(2.0) * element_at(col("scores"), col("cid") + 1)).as("d2"))
      .agg(sum("d2")).head().getDouble(0)

  /** Lloyd iterations from the given seeds; returns final centroids.
    * Empty clusters keep their previous centroid.
    */
  def fit(emb: DataFrame, seeds: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
    val cached = emb.select(col("emb")).cache() // training reads only the vectors
    try {
      var cents = seeds
      for (_ <- 1 to iters) {
        val updated = assign(cached, cents)
          .select(col("cid"), posexplode(col("emb")))
          .groupBy(col("cid"), col("pos")).agg(avg(col("col")).as("v"))
          .groupBy(col("cid"))
          .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pairs"))
          .select(col("cid"), expr("transform(pairs, p -> p.v)").as("centroid"))
          .collect()
          .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
        cents = cents.indices.map(i => updated.getOrElse(i, cents(i))).toArray
      }
      cents
    } finally cached.unpersist()
  }
}
