package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{ReportBatchWrite, ReportSink}

/** Transactional DSv2 report sink: exactly-once publishing from
  * at-least-once task execution — only files named by committed task
  * attempts become visible, orphans are cleaned, aborts leave the
  * published dataset untouched, and visibility flips on the manifest.
  */
class ReportSinkSpec extends AnyFunSuite with SharedSpark {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_sink").toString + "/report"

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def row(k: Long, v: String): InternalRow =
    InternalRow(k, UTF8String.fromString(v))

  private def info(n: Int): PhysicalWriteInfo = new PhysicalWriteInfo {
    override def numPartitions(): Int = n
  }

  test("df.write round-trip: all rows visible, manifest written") {
    val dir = tmp()
    val df = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"))
    df.write.format("graft.sources.v2.ReportSink")
      .option("path", dir).mode("append").save()
    val back = ReportSink.read(spark, dir)
    assert(back.count() == df.count())
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("commit publishes only committed attempts; the orphan is cleaned") {
    val dir = tmp()
    val bw = new ReportBatchWrite(schema, dir, truncateFirst = false)
    val factory = bw.createBatchWriterFactory(info(3))
    // three attempts; attempt for partition 2 never reaches the driver
    // (speculative duplicate / lost task) — its file must not publish
    val w0 = factory.createWriter(0, 100L)
    val w1 = factory.createWriter(1, 101L)
    val zombie = factory.createWriter(2, 102L)
    w0.write(row(1, "a")); w1.write(row(2, "b")); zombie.write(row(99, "ZOMBIE"))
    val m0 = w0.commit(); val m1 = w1.commit()
    zombie.commit() // attempt commits locally, but its message is lost
    bw.commit(Array[WriterCommitMessage](m0, m1))
    val back = ReportSink.read(spark, dir).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSet == Set((1L, "a"), (2L, "b")), back.mkString(","))
    // staging fully cleaned
    assert(!new java.io.File(dir + "/_staging").exists())
  }

  test("abort leaves the previously-published dataset intact") {
    val dir = tmp()
    val bw = new ReportBatchWrite(schema, dir, truncateFirst = false)
    val f1 = bw.createBatchWriterFactory(info(1))
    val w = f1.createWriter(0, 1L); w.write(row(1, "keep"))
    bw.commit(Array[WriterCommitMessage](w.commit()))
    // second job stages rows, then aborts
    val bw2 = new ReportBatchWrite(schema, dir, truncateFirst = false)
    val f2 = bw2.createBatchWriterFactory(info(1))
    val w2 = f2.createWriter(0, 2L); w2.write(row(2, "lost"))
    w2.commit()
    bw2.abort(Array.empty)
    val back = ReportSink.read(spark, dir).collect().map(_.getLong(0))
    assert(back.toSeq == Seq(1L))
    assert(!new java.io.File(dir + "/_staging").exists())
  }

  test("append unions into the manifest; overwrite supersedes it") {
    val dir = tmp()
    import spark.implicits._
    Seq((1L, "x")).toDF("k", "v").write.format("graft.sources.v2.ReportSink")
      .option("path", dir).mode("append").save()
    Seq((2L, "y")).toDF("k", "v").write.format("graft.sources.v2.ReportSink")
      .option("path", dir).mode("append").save()
    assert(ReportSink.read(spark, dir).collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    Seq((3L, "z")).toDF("k", "v").write.format("graft.sources.v2.ReportSink")
      .option("path", dir).mode("overwrite").save()
    val after = ReportSink.read(spark, dir)
    assert(after.collect().map(_.getLong(0)).toSeq == Seq(3L))
    // superseded data files are physically removed, not just delisted
    val files = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("part-"))
    assert(after.count() == 1 && files.nonEmpty)
  }

  test("nulls survive the TSV round-trip") {
    val dir = tmp()
    import spark.implicits._
    Seq((1L, Some("a")), (2L, None)).toDF("k", "v")
      .write.format("graft.sources.v2.ReportSink")
      .option("path", dir).mode("append").save()
    val back = ReportSink.read(spark, dir).orderBy("k").collect()
    assert(back(0).getString(1) == "a" && back(1).isNullAt(1))
  }
}
