package graft

import graft.plans.GroupedTopKOp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom grouped top-k operator (q_topk_group_fast): result parity
  * with the window-rank form, the physical-plan shape (partial+final
  * GroupedTopKExec around one exchange), exchange-volume bound, and
  * the edge cases a heap implementation gets wrong (groups smaller
  * than k, ties, null keys, k=1).
  */
class GroupedTopKSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("parity with row_number window form on the orders fixture") {
    val orders = Tables.orders(spark, sf)
    val got = GroupedTopKOp.topK(orders, 3,
        Seq("o_orderpriority"), Seq("o_totalprice" -> true, "o_orderkey" -> false))
      .select("o_orderkey").as[Long].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("o_orderkey").as[Long].collect().toSet
    assert(got == want)
  }

  test("physical plan: partial and final GroupedTopKExec bracket one exchange") {
    val plan = formattedPlan(GroupedTopKOp.topK(Tables.orders(spark, sf), 3,
      Seq("o_orderpriority"), Seq("o_totalprice" -> true, "o_orderkey" -> false)))
    // plan text strips the Exec suffix from node names
    assert("GroupedTopK".r.findAllIn(plan).size >= 2, plan.take(800))
    assert(plan.contains("Exchange"), "final phase must demand clustering")
  }

  test("exchange carries at most partitions * groups * k rows (volume bound)") {
    // AQE off so the executed plan exposes the raw ShuffleExchangeExec
    // (under AQE it hides inside query stages); restored afterwards
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = GroupedTopKOp.topK(
        Tables.orders(spark, sf).repartition(7), 3,
        Seq("o_orderpriority"), Seq("o_totalprice" -> true, "o_orderkey" -> false))
      df.collect()
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty, df.queryExecution.executedPlan.toString.take(500))
      val ex = exchanges.head
      val written = ex.metrics.collectFirst {
        case (k, m) if k.toLowerCase.contains("recordswritten") => m.value
      }
      assert(written.isDefined, s"no records-written metric in ${ex.metrics.keys}")
      // 7 partitions x 5 priorities x 3 = 105 max; the window form
      // would shuffle all 1500 fixture orders
      assert(written.get <= 7L * 5 * 3,
        s"partial phase must bound the shuffle, wrote ${written.get} rows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("groups smaller than k emit every row; ties broken by the tiebreak column") {
    val df = Seq(
      ("a", 10, 1L), ("a", 10, 2L), ("a", 5, 3L), ("a", 5, 4L), ("a", 1, 5L),
      ("b", 7, 6L), ("b", 7, 7L)
    ).toDF("g", "v", "id")
    val got = GroupedTopKOp.topK(df.repartition(3), 4,
        Seq("g"), Seq("v" -> true, "id" -> false))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 4L, 6L, 7L),
      s"expected top-4 of a (ids 1,2,3,4) plus all of b, got $got")
  }

  test("null group key forms its own group; k=1 keeps the single best") {
    val df = Seq(
      (Some("a"), 3, 1L), (Some("a"), 9, 2L),
      (None, 5, 3L), (None, 8, 4L)
    ).toDF("g", "v", "id")
    val got = GroupedTopKOp.topK(df.repartition(2), 1,
        Seq("g"), Seq("v" -> true, "id" -> false))
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 4L))
  }

  test("ascending order keeps the smallest (first-k-in-sort-order contract)") {
    val df = (1L to 100L).map(i => (i % 4, i)).toDF("g", "id")
    val got = GroupedTopKOp.topK(df.repartition(5), 2,
        Seq("g"), Seq("id" -> false))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))
  }
}
