package graft.sources.v2

import java.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 transactional report SINK — the write-side counterpart
  * of [[AlertPages]], modeling the reference's report publishing
  * (`/root/reference/modules/src/prisma_report/lambda.py:406-441`: csv
  * uploads with a delete-based rollback, R22–R24) with the commit
  * protocol a 1000-executor cluster actually needs:
  *
  *  - every task writes to a UNIQUE staging file
  *    (`_staging/part-<partition>-<taskAttemptId>`), so concurrent
  *    attempts of the same partition (speculation, retries) never
  *    collide;
  *  - the driver's `commit(messages)` publishes EXACTLY the files named
  *    by the committed attempts' messages — orphan staging files from
  *    failed or speculative attempts are deleted, not published;
  *  - visibility is manifest-gated: readers ([[ReportSink.read]]) load
  *    only files listed in `_MANIFEST`, which is written LAST — a crash
  *    anywhere before that leaves the previous manifest (and therefore
  *    the previous dataset version) intact;
  *  - `abort()` removes the staging dir, leaving the published dataset
  *    untouched.
  *
  * This is exactly-once publishing from at-least-once task execution —
  * the property the reference's delete-then-rewrite loop (bug B5) lacks.
  * Append mode unions into the manifest; overwrite (SupportsTruncate)
  * replaces it.
  *
  * Format: tab-separated text (no per-file header; schema travels in the
  * manifest as a DDL string), one staging file per task.
  */
class ReportSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  // write-only source: the schema always comes from the frame being
  // written (LogicalWriteInfo); reads go through ReportSink.read
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "ReportSink requires option(\"path\", ...)")
    new ReportSinkTable(schema, path)
  }
}

object ReportSink {
  val ManifestFile = "_MANIFEST"

  /** Manifest-gated read-back: only files the last committed manifest
    * lists are loaded — orphaned task files are invisible by
    * construction. Line 1 of the manifest is the schema DDL; the rest
    * are data-file names relative to `dir`.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir, ManifestFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
    val schema = StructType.fromDDL(lines.head)
    val files = lines.tail.map(f => new Path(dir, f).toString)
    if (files.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema)
      .option("sep", "\t").option("header", "false").option("nullValue", "\\N")
      .csv(files: _*)
  }
}

class ReportSinkTable(writeSchema: StructType, path: String)
    extends Table with SupportsWrite {
  override def name(): String = s"report_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ReportWriteBuilder(info.schema(), path, truncateFirst = false)
}

class ReportWriteBuilder(schema: StructType, path: String, truncateFirst: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new ReportWriteBuilder(schema, path, truncateFirst = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new ReportBatchWrite(schema, path, truncateFirst)
  }
}

/** One committed task attempt: the staging file it wrote and its row
  * count (the count is publish-audit metadata, mirroring the
  * reference's row-count logging).
  */
case class ReportTaskCommit(stagedFile: String, rows: Long)
  extends WriterCommitMessage

class ReportBatchWrite(schema: StructType, path: String, truncateFirst: Boolean)
    extends BatchWrite {

  // The driver's session Hadoop conf, captured ONCE driver-side (DSv2
  // gives the provider no session handle; BatchWrite objects are built
  // on the driver where SparkSession.active is the writing session) and
  // shipped to task writers inside the serializable factory — custom-FS
  // clusters (s3a credential providers etc.) resolve the same
  // FileSystem everywhere instead of executor-local classpath defaults.
  private val serConf = new org.apache.spark.util.SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())

  private def fs(conf: org.apache.hadoop.conf.Configuration): FileSystem =
    new Path(path).getFileSystem(conf)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    ReportWriterFactory(schema.toDDL, path, serConf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs(serConf.value)
    val dir = new Path(path)
    val staging = new Path(dir, "_staging")
    f.mkdirs(dir)
    val committed = messages.collect { case m: ReportTaskCommit => m }
    // publish exactly the committed attempts' files
    val published = committed.map { m =>
      val src = new Path(m.stagedFile)
      val dst = new Path(dir, src.getName)
      if (f.exists(dst)) f.delete(dst, false) // re-run of the same job
      require(f.rename(src, dst), s"publish rename failed: $src")
      src.getName
    }
    // orphans: staging files written by failed/speculative attempts
    // whose commit message never reached the driver — cleaned, never
    // published
    if (f.exists(staging)) f.delete(staging, true)
    val manifest = new Path(dir, ReportSink.ManifestFile)
    val old: List[String] =
      if (!f.exists(manifest)) Nil
      else {
        val in = f.open(manifest)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList.tail
        finally in.close()
      }
    val previous =
      if (truncateFirst) {
        // overwrite: previously-published files are superseded; drop them
        old.foreach(n => f.delete(new Path(dir, n), false))
        Nil
      } else old
    // manifest LAST: readers flip to the new version atomically-enough
    // for a single object (a crash before this line leaves the previous
    // manifest — and dataset version — fully intact)
    val out = f.create(manifest, true)
    try out.write(((schema.toDDL :: (previous ++ published.toList)).mkString("\n") + "\n")
      .getBytes("UTF-8"))
    finally out.close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs(serConf.value)
    val staging = new Path(new Path(path), "_staging")
    if (f.exists(staging)) f.delete(staging, true)
  }
}

case class ReportWriterFactory(ddl: String, path: String,
    conf: org.apache.spark.util.SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ReportDataWriter(StructType.fromDDL(ddl), path, partitionId, taskId, conf)
}

/** Executor-side task writer: streams rows to its own staging file.
  * TSV encoding; nulls as \N (matched by the reader's nullValue).
  */
class ReportDataWriter(schema: StructType, path: String,
    partitionId: Int, taskId: Long,
    conf: org.apache.spark.util.SerializableConfiguration) extends DataWriter[InternalRow] {

  private val file =
    new Path(new Path(path, "_staging"), f"part-$partitionId%05d-$taskId")
  private var opened = false
  private lazy val out = {
    val f = file.getFileSystem(conf.value)
    opened = true
    new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      f.create(file, true), "UTF-8"))
  }
  private var rows = 0L

  private def render(row: InternalRow, i: Int, dt: DataType): String =
    if (row.isNullAt(i)) "\\N"
    else dt match {
      case StringType => row.getUTF8String(i).toString
      case _ => row.get(i, dt).toString
    }

  override def write(row: InternalRow): Unit = {
    val line = schema.fields.indices
      .map(i => render(row, i, schema.fields(i).dataType)).mkString("\t")
    out.write(line); out.write("\n")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close() // forces creation for empty partitions: every task commits a file
    ReportTaskCommit(file.toString, rows)
  }

  override def abort(): Unit = {
    if (opened) {
      out.close()
      val f = file.getFileSystem(conf.value)
      if (f.exists(file)) f.delete(file, false)
    }
  }

  override def close(): Unit = ()
}
