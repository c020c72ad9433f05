package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = co-located joins (SURVEY.md §7.4 / 100-TB design): both
  * fact tables bucketed+sorted on the join key join WITHOUT any shuffle
  * exchange — the bucketed layout already co-locates matching keys.
  */
class BucketedJoinSpec extends AnyFunSuite with SharedSpark {

  test("join of two tables bucketed on the key plans no shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.lineitem(spark, sf).write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
      Tables.orders(spark, sf).write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // the join inputs must come straight from the bucketed scans — the
      // only allowed exchange is the post-join aggregation shuffle
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange"),
        s"bucketed join inputs must not shuffle:\n$plan")
      // result equality vs unbucketed plan
      val expect = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      assert(joined.exceptAll(expect).isEmpty && expect.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("declared q_join_bucketed plans the SMJ with no input exchange") {
    // the declared query pins SMJ via the merge hint (no conf games),
    // so the bucketed layout must satisfy the join's distribution
    val df = SparkEntry.queries("q_join_bucketed")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinSection.contains("Exchange"),
      s"bucketed join inputs must not shuffle:\n$plan")
    // and the answer matches the unbucketed q_join_smj surface
    val expect = SparkEntry.queries("q_join_smj")(spark, sf)
    assert(df.collect().toSeq == expect.collect().toSeq)
  }
}
