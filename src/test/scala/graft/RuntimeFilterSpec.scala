package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter injection — the row-level sibling of dynamic
  * partition pruning (DppSpec): a selective dimension-side predicate is
  * turned into a bloom filter applied INSIDE the fact scan, so fact rows
  * that cannot survive the join die before the shuffle. At 100 TB this
  * is the lever for joins on NON-partition columns, where DPP cannot
  * help.
  */
class RuntimeFilterSpec extends AnyFunSuite with SharedSpark {

  test("selective dim filter injects a bloom filter into the fact side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // fixture-sized thresholds: the default application-side floor is
      // 10GB (a real cluster's worthwhile-scan bar) — lower both so the
      // mechanism is exercised at test scale
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, sf)
      val dim = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice")), 4).as("rev"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"expected an injected bloom filter on the fact scan:\n$optimized")
      // and the filtered plan computes the same answer
      val expect = fact.join(dim.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice")), 4).as("rev"))
      assert(joined.collect().toSeq == expect.collect().toSeq)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
