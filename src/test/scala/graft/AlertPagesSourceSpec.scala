package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 paginated-source semantics: parallel page partitions, limit
  * pushdown pruning pages, and composition with the relational layer.
  */
class AlertPagesSourceSpec extends AnyFunSuite with SharedSpark {

  private def read(pages: Int, pageSize: Int) =
    spark.read.format("graft.sources.v2.AlertPages")
      .option("pages", pages.toString).option("pageSize", pageSize.toString).load()

  test("reads pages x pageSize rows with one partition per page (parallel pagination)") {
    val df = read(6, 50)
    assert(df.count() == 300)
    val scan = df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
    assert(scan.inputPartitions.length == 6)
  }

  test("limit pushdown plans only the needed pages") {
    val df = read(10, 100).limit(150)
    assert(df.count() == 150)
    val scan = df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
    assert(scan.inputPartitions.length == 2,
      s"limit(150) over 100-row pages must plan 2 pages, got ${scan.inputPartitions.length}")
  }

  test("read options are case-insensitive (Spark option contract)") {
    val df = spark.read.format("graft.sources.v2.AlertPages")
      .option("PAGES", "3").option("pagesize", "20").load()
    assert(df.count() == 60, "lowercase/uppercase option keys must not fall back to defaults")
  }

  test("a limit near Int.MaxValue plans all pages, not zero (no Int overflow)") {
    val df = read(5, 100).limit(Int.MaxValue - 1)
    assert(df.count() == 500)
    val scan = df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
    assert(scan.inputPartitions.length == 5,
      s"overflowed page math planned ${scan.inputPartitions.length} pages")
  }

  test("source rows feed the standard aggregation path") {
    val perPolicy = read(4, 25)
      .groupBy("policyId").agg(count(lit(1)).as("n"))
    assert(perPolicy.count() == 7)
    assert(perPolicy.agg(sum("n")).head().getLong(0) == 100)
  }
}
