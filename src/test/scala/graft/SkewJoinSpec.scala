package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling (SCALING.md claim): a sort-merge join with one
  * hot key gets its skewed partition split at runtime — asserted on the
  * adaptive plan, with thresholds lowered so test-sized data triggers
  * the path that defaults reserve for multi-hundred-MB partitions.
  */
class SkewJoinSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("AQE splits the skewed partition of a hot-key sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // key 1 is hot: 50k rows (all even i); odd i spreads over ~500
      // odd residues (+10) at ~100 rows each
      val left = (1 to 100000)
        .map(i => (if (i % 2 == 0) 1L else (i % 1000).toLong + 10, s"payload_left_$i"))
        .toDF("k", "lv")
      val right = (1 to 2000).map(i => ((i % 1010).toLong, s"r_$i")).toDF("k", "rv")
      val joined = left.join(right, "k")
      // collect() executes THIS Dataset's query execution (count() would
      // plan a separate aggregation QE and leave this plan un-finalized)
      assert(joined.collect().length > 100000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-join split in final plan:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }
}
