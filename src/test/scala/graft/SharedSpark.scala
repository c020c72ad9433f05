package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** One shared local SparkSession for the whole test run (session startup
  * is ~5 s; per-suite sessions would dominate test time). Config mirrors
  * Verify/Bench: UTC, nanosAsLong for the events table, small shuffle
  * parallelism.
  */
trait SharedSpark { self: Suite =>
  lazy val spark: SparkSession = SharedSpark.session
  /** Smallest fixture scale — correctness, not throughput. */
  val sf: String = "/root/testdata/sf0.001"

  /** `EXPLAIN FORMATTED` text of a frame (explain prints to stdout). */
  def formattedPlan(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(out)(df.explain("formatted"))
    out.toString
  }
}

object SharedSpark {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
