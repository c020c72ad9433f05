package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector modeling the reference's paginated alert API
  * (`/root/reference/modules/src/prisma_report/lambda.py:267-318`: POST
  * /v2/alert, `limit: 100` + `pageToken` loop, 1 s sleep per page —
  * ≤ 100 alerts/sec, sequential).
  *
  * Re-expressed Spark-first: each page is an InputPartition, so pages
  * are fetched in PARALLEL across executor threads, and `df.limit(n)`
  * reaches the source via SupportsPushDownLimit — only ⌈n/pageSize⌉
  * pages are planned at all, the engine-side equivalent of stopping the
  * pagination loop early. Offline build: rows are deterministic
  * synthetic alerts (seeded per page); a live connector would issue the
  * HTTP call inside the partition reader with the same structure.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.v2.AlertPages")
  *     .option("pages", "10").option("pageSize", "100").load()
  * }}}
  */
class AlertPages extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AlertPages.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // Spark read options are case-insensitive (.option("pagesize", …) and
    // SQL OPTIONS must not silently fall back to defaults), so re-wrap
    // the raw properties map before lookup.
    val opts = new CaseInsensitiveStringMap(properties)
    new AlertPagesTable(
      opts.getInt("pages", 10),
      opts.getInt("pageSize", 100))
  }
}

object AlertPages {
  val schema: StructType = StructType(Seq(
    StructField("alert_id", StringType, nullable = false),
    StructField("policyId", StringType, nullable = false),
    StructField("account", StringType, nullable = false),
    StructField("accountId", StringType, nullable = false),
    StructField("cloudType", StringType, nullable = false)))
}

class AlertPagesTable(pages: Int, pageSize: Int) extends Table with SupportsRead {
  override def name(): String = s"alert_pages($pages x $pageSize)"
  override def schema(): StructType = AlertPages.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AlertScanBuilder(pages, pageSize)
}

class AlertScanBuilder(pages: Int, pageSize: Int)
    extends ScanBuilder with SupportsPushDownLimit {
  private var limit: Int = Int.MaxValue
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  // Pages over-deliver up to pageSize-1 rows beyond the limit, so Spark
  // must keep its Limit operator: partial push, stated explicitly rather
  // than relying on the interface default.
  override def isPartiallyPushed: Boolean = true
  override def build(): Scan = {
    // Long arithmetic: (limit + pageSize - 1) overflows Int for limits
    // near Int.MaxValue, which would plan zero pages.
    val neededPages =
      if (limit == Int.MaxValue) pages
      else math.min(pages.toLong, (limit.toLong + pageSize - 1) / pageSize).toInt
    new AlertScan(neededPages, pageSize)
  }
}

class AlertScan(pages: Int, pageSize: Int) extends Scan with Batch {
  override def readSchema(): StructType = AlertPages.schema
  override def toBatch: Batch = this
  override def description(): String = s"AlertScan(pages=$pages, pageSize=$pageSize)"
  override def planInputPartitions(): Array[InputPartition] =
    (0 until pages).map(p => AlertPagePartition(p, pageSize): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = new AlertPageReaderFactory
}

case class AlertPagePartition(page: Int, pageSize: Int) extends InputPartition

class AlertPageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AlertPagePartition]
    new PartitionReader[InternalRow] {
      // A live connector performs the page POST here (executor-side).
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.pageSize }
      override def get(): InternalRow = {
        val n = p.page.toLong * p.pageSize + i
        InternalRow(
          UTF8String.fromString(s"alert-$n"),
          UTF8String.fromString(s"policy-${n % 7}"),
          UTF8String.fromString(s"acct-name-${n % 5}"),
          UTF8String.fromString(s"acct-${n % 13}"),
          UTF8String.fromString(if (n % 2 == 0) "aws" else "azure"))
      }
      override def close(): Unit = ()
    }
  }
}
