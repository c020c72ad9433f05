package graft.sources

import org.apache.spark.sql.SparkSession

/** End-to-end report pipeline — the reference's `handler()` orchestration
  * (`/root/reference/modules/src/prisma_report/lambda.py:386-441`, R25)
  * as one Spark driver program: inventory report → per-service
  * resource-type report → alert report, each published to a
  * hive-partitioned CSV sink through the commit protocol (no rollback
  * bookkeeping — R24). Fixture payloads stand in for the live API
  * (offline build); a deployment swaps [[Fixtures]] for landed JSON or
  * the DSv2 source.
  *
  * Usage: runMain graft.sources.ReportPipeline <outDir>
  */
object ReportPipeline {

  /** Reference-shaped payloads (FIXTURES.md §B). */
  object Fixtures {
    val inventory: Seq[String] = Seq(
      """{"timestamp": 1712500000000, "requestedTimestamp": 1712500000000,
        | "groupedAggregates": [
        |  {"serviceName": "Amazon EC2", "criticalSeverityFailedResources": 1,
        |   "highSeverityFailedResources": 2, "passedResources": 10,
        |   "failedResources": 3, "totalResources": 13},
        |  {"serviceName": "Amazon S3", "passedResources": 5,
        |   "failedResources": 0, "totalResources": 5}
        | ]}""".stripMargin.replace("\n", " "))

    val resourceType: Seq[(String, String)] = Seq(
      "Amazon EC2" ->
        """{"timestamp": 1712500000000, "requestedTimestamp": 1712500000000,
          | "groupedAggregates": [
          |  {"resourceTypeName": "EC2 Instance", "failedResources": 2,
          |   "passedResources": 8, "totalResources": 10},
          |  {"resourceTypeName": "Security Group", "failedResources": 1,
          |   "passedResources": 2, "totalResources": 3}]}""".stripMargin.replace("\n", " "),
      "Amazon S3" ->
        """{"timestamp": 1712500000000, "requestedTimestamp": 1712500000000,
          | "groupedAggregates": [
          |  {"resourceTypeName": "S3 Bucket", "failedResources": 0,
          |   "passedResources": 5, "totalResources": 5}]}""".stripMargin.replace("\n", " "))

    val policies: Seq[String] = Seq(
      """{"policies": [
        | {"policyId": "p1", "policyName": "Public bucket", "policyType": "config",
        |  "severity": "high", "alertCount": 3},
        | {"policyId": "p2", "policyName": "Open security group", "policyType": "network",
        |  "severity": "critical", "alertCount": 1}]}""".stripMargin.replace("\n", " "))

    val alertPages: Seq[String] = Seq(
      """{"policyId": "p1", "items": [
        | {"id": "a1", "resource": {"account": "prod", "accountId": "111",
        |  "cloudType": "aws", "cloudAccountGroups": ["g1"]}},
        | {"id": "a2", "resource": {"account": "prod", "accountId": "111",
        |  "cloudType": "aws", "cloudAccountGroups": ["g1"]}},
        | {"id": "a3", "resource": {"account": "prod", "accountId": "222",
        |  "cloudType": "aws", "cloudAccountGroups": ["g2"]}}],
        | "nextPageToken": null}""".stripMargin.replace("\n", " "),
      """{"policyId": "p2", "items": [
        | {"id": "a4", "resource": {"account": "dev", "accountId": "333",
        |  "cloudType": "azure", "cloudAccountGroups": []}}]}""".stripMargin.replace("\n", " "),
      """{"policyId": "p2", "items": []}""")
  }

  /** Run all three reports to `outDir`; returns per-report row counts.
    * Counts are collected via `observe()` during the write — no second
    * execution of each report plan.
    */
  def run(spark: SparkSession, outDir: String): Map[String, Long] = {
    import org.apache.spark.sql.{DataFrame, Observation}
    import org.apache.spark.sql.functions.{count, lit}
    import spark.implicits._
    def publish(df: DataFrame, path: String, name: String): Long = {
      val obs = new Observation(s"rows_$name")
      PrismaConnector.writeReport(
        df.observe(obs, count(lit(1)).as("n")), path)
      obs.get("n").asInstanceOf[Long]
    }
    Map(
      "inventory" -> publish(
        PrismaConnector.inventoryReport(spark, Fixtures.inventory.toDF("json")),
        s"$outDir/inventory_report", "inv"),
      "resource_type" -> publish(
        PrismaConnector.resourceTypeReport(spark, Fixtures.resourceType.toDF("service", "json")),
        s"$outDir/inventory_resource_type_report", "rt"),
      "alert" -> publish(
        PrismaConnector.alertReport(spark, Fixtures.policies.toDF("json"),
          Fixtures.alertPages.toDF("json")),
        s"$outDir/alert_report", "al"))
  }

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/tmp/graft_reports"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = run(spark, outDir)
    println(s"REPORTS written to $outDir: " +
      counts.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(", "))
    spark.stop()
  }
}
