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

  test("column pruning reaches the source: reader materializes only requested fields") {
    val df = read(4, 50).select("policyId")
    val scan = df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("policyId"),
      s"scan must read only policyId, got ${scan.scan.readSchema().fieldNames.mkString(",")}")
    assert(df.distinct().count() == 7)
  }

  test("equality filter pushes into the reader (the API filter-body analog)") {
    val df = read(4, 50).filter(col("cloudType") === "aws")
    val scan = df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
    assert(scan.scan.description().contains("cloudType=aws"),
      s"filter must reach the scan: ${scan.scan.description()}")
    assert(df.count() == 100, "even alert numbers are aws: exactly half of 200")
    // result parity with the unpushed evaluation
    val unpushed = read(4, 50).collect().count(_.getAs[String]("cloudType") == "aws")
    assert(unpushed == 100)
  }

  test("a pushed filter disables limit page-reduction (no under-delivery)") {
    // azure rows are the odd half; limit(120) needs 240 raw rows = 3 pages.
    // If the source still cut pages by ceil(120/100)=2, only 100 azure rows
    // would exist to return — an under-delivery bug. With the guard, all
    // pages are planned and Spark's own Limit takes 120.
    val df = read(5, 100).filter(col("cloudType") === "azure").limit(120)
    assert(df.count() == 120,
      "filter+limit must still deliver the full limit when matches exist")
    val scan = df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
    assert(scan.inputPartitions.length == 5,
      s"pushed filter must disable page reduction, got ${scan.inputPartitions.length} pages")
  }

  test("non-equality predicates stay Spark-side and still apply") {
    val df = read(3, 40).filter(col("policyId") > "policy-4") // range: not pushed
    val scan = df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
    assert(scan.scan.description().contains("pushedFilters=[]"),
      s"a range predicate must not be claimed as pushed: ${scan.scan.description()}")
    assert(df.collect().map(_.getAs[String]("policyId")).toSet == Set("policy-5", "policy-6"))
  }

  test("source rows feed the standard aggregation path") {
    val perPolicy = read(4, 25)
      .groupBy("policyId").agg(count(lit(1)).as("n"))
    assert(perPolicy.count() == 7)
    assert(perPolicy.agg(sum("n")).head().getLong(0) == 100)
  }
}
