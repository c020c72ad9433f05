package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning (q_join_dpp): the dimension-side quarter
  * filter must reach the month-partitioned fact scan as a runtime
  * partition filter — the fact carries no static predicate, so without
  * DPP the scan reads all ~80 month partitions for a 3-month answer.
  */
class DppSpec extends AnyFunSuite with SharedSpark {

  private def frame = SparkEntry.queries("q_join_dpp")(spark, sf)

  test("fact scan carries a dynamicpruning partition filter") {
    val plan = frame.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a DynamicPruning partition filter on the fact scan:\n$plan")
  }

  test("result equals the statically-filtered aggregation") {
    val got = frame
    val expect = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1996 && quarter(col("o_orderdate")) === 2)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("revenue"))
      .orderBy(col("o_orderpriority"))
    assert(got.collect().toSeq == expect.collect().toSeq)
  }

  test("pruned scan reads only the filtered quarter's partitions") {
    // count the distinct months the executed fact scan actually
    // produced — with DPP this is the dim-selected 3, not the ~80 the
    // table holds
    val base = graft.queries.Layout.ensurePartitionedOrders(spark, sf)
    val all = spark.read.parquet(s"$base/orders_bymonth")
      .select(countDistinct(col("o_month"))).head().getLong(0)
    assert(all > 10, s"fixture should span many months, got $all")
    val joined = spark.read.parquet(s"$base/orders_bymonth")
      .join(broadcast(spark.read.parquet(s"$base/monthdim")
        .filter(col("m_quarter") === "1996-Q2")),
        col("o_month") === col("m_month"))
    val months = joined.select(countDistinct(col("o_month"))).head().getLong(0)
    assert(months == 3, s"expected the 3 months of 1996-Q2, got $months")
  }
}
