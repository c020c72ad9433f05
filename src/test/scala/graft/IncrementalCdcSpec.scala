package graft

import graft.queries.Versioning
import graft.streaming.IncrementalCdc
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IncrementalCdc contract: snapshot ≡ one-shot cdcStateOf over the
  * union of batches, micro-batch replay is a no-op, and at-least-once
  * redelivery under a NEW batch id does not inflate the op count.
  */
class IncrementalCdcSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def rowsOf(df: DataFrame): Seq[(Long, String, Double, Long)] =
    df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSeq

  private def log(rows: (Long, Long, Int, String, Double)*): DataFrame =
    rows.toSeq
      .toDF("user_id", "event_id", "secs", "event_type", "value")
      .select(col("user_id"), col("event_id"),
        timestamp_seconds(col("secs")).as("ts"), col("event_type"), col("value"))

  test("snapshot over micro-batches equals the one-shot pass on the fixture") {
    val got = rowsOf(SparkEntry.queries("q_cdc_inc")(spark, sf))
    val want = rowsOf(Versioning.cdcStateOf(Tables.events(spark, sf)))
    assert(want.nonEmpty)
    assert(got == want, "incremental snapshot differs from one-shot")
  }

  test("replaying a committed batch leaves store and snapshot unchanged") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdc_replay").toString
    val b0 = log((1L, 100L, 10, "signup", 1.0), (2L, 101L, 11, "click", 2.0))
    val b1 = log((1L, 102L, 12, "purchase", 9.0), (2L, 103L, 13, "error", 0.0))
    IncrementalCdc.commitBatch(b0, 0L, s"$tmp/state")
    IncrementalCdc.commitBatch(b1, 1L, s"$tmp/state")
    val before = rowsOf(IncrementalCdc.snapshot(spark, s"$tmp/state"))
    // user 1 live at its purchase, user 2 deleted by the error op
    assert(before == Seq((1L, "purchase", 9.0, 2L)))
    IncrementalCdc.commitBatch(b0, 0L, s"$tmp/state") // replay
    assert(IncrementalCdc.readRows(spark, s"$tmp/state").count() == 4,
      "replay grew the store")
    assert(rowsOf(IncrementalCdc.snapshot(spark, s"$tmp/state")) == before,
      "replay changed the snapshot")
  }

  test("redelivery under a DIFFERENT batchId does not double-count n_ops") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdc_redeliver").toString
    val b = log((5L, 200L, 20, "signup", 1.0), (5L, 201L, 21, "view", 3.0))
    IncrementalCdc.commitBatch(b, 0L, s"$tmp/state")
    IncrementalCdc.commitBatch(b, 2L, s"$tmp/state") // redelivered
    val got = rowsOf(IncrementalCdc.snapshot(spark, s"$tmp/state"))
    assert(got == Seq((5L, "view", 3.0, 2L)),
      s"redelivered ops must dedupe on event_id, got $got")
  }

  test("a later delete removes a previously-live key; a later insert revives it") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdc_revive").toString
    IncrementalCdc.commitBatch(log((9L, 300L, 30, "signup", 1.0)), 0L, s"$tmp/state")
    assert(rowsOf(IncrementalCdc.snapshot(spark, s"$tmp/state")).map(_._1) == Seq(9L))
    IncrementalCdc.commitBatch(log((9L, 301L, 31, "error", 0.0)), 1L, s"$tmp/state")
    assert(IncrementalCdc.snapshot(spark, s"$tmp/state").count() == 0,
      "deleted key must leave the state")
    IncrementalCdc.commitBatch(log((9L, 302L, 32, "signup", 5.0)), 2L, s"$tmp/state")
    assert(rowsOf(IncrementalCdc.snapshot(spark, s"$tmp/state")) ==
      Seq((9L, "signup", 5.0, 3L)), "re-insert must revive the key")
  }
}
