package graft

import graft.queries.TimeWindows
import graft.streaming.IncrementalDau
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IncrementalDau contract: snapshot ≡ one-shot activeUsersOf over the
  * union of batches, micro-batch replay is a no-op, cross-batch
  * redelivery is absorbed by set semantics, and a late BACKFILL that
  * shifts the corpus min date re-anchors the day axis correctly (the
  * absolute-epoch-day store is what makes that safe).
  */
class IncrementalDauSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def rowsOf(df: DataFrame): Seq[(Int, Long, Long, Long)] =
    df.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  /** (user_id, epoch-day) activity batches as event-shaped frames. */
  private def acts(rows: (Long, Int)*): DataFrame =
    rows.toSeq.toDF("user_id", "day")
      .select(col("user_id"),
        timestamp_seconds(col("day") * 86400L + 3600L).as("ts"))

  test("snapshot over micro-batches equals the one-shot pass on the fixture") {
    val got = rowsOf(SparkEntry.queries("q_dau_inc")(spark, sf))
    val want = rowsOf(SparkEntry.queries("q_active_users")(spark, sf))
    assert(want.nonEmpty)
    assert(got == want, "incremental snapshot differs from one-shot")
  }

  test("replaying a committed batch leaves store and snapshot unchanged") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dau_replay").toString
    IncrementalDau.commitBatch(acts((1L, 100), (2L, 100), (1L, 101)), 0L, s"$tmp/state")
    IncrementalDau.commitBatch(acts((2L, 102), (3L, 103)), 1L, s"$tmp/state")
    val before = rowsOf(IncrementalDau.snapshot(spark, s"$tmp/state"))
    assert(before.map(_._1) == (0 to 3).toSeq, "day axis 100..103 → t 0..3")
    IncrementalDau.commitBatch(acts((1L, 100), (2L, 100), (1L, 101)), 0L, s"$tmp/state")
    assert(IncrementalDau.readRows(spark, s"$tmp/state").count() == 5,
      "replay grew the store")
    assert(rowsOf(IncrementalDau.snapshot(spark, s"$tmp/state")) == before,
      "replay changed the snapshot")
  }

  test("cross-batch redelivery of the same user-day is absorbed by set semantics") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dau_redeliver").toString
    IncrementalDau.commitBatch(acts((7L, 200), (8L, 200)), 0L, s"$tmp/state")
    val before = rowsOf(IncrementalDau.snapshot(spark, s"$tmp/state"))
    IncrementalDau.commitBatch(acts((7L, 200)), 3L, s"$tmp/state") // redelivered
    assert(rowsOf(IncrementalDau.snapshot(spark, s"$tmp/state")) == before,
      "redelivered activity must not change any count")
  }

  test("a >64-day horizon does not wrap (64-day word sharding)") {
    // Pre-sharding, shiftleft's Java shift-mod-64 semantics made day 64
    // collide with day 0 and the mau lowbits mask wrap to 0 at t=63.
    // Axis spans 0..200: user 1 active on days 0 and 64 (the collision
    // pair), user 2 only on day 63 (the t=63 mask-wrap row), user 3
    // only on day 200 (anchors the axis; 3 words apart from day 0).
    val got = rowsOf(TimeWindows.activeUsersOf(
      Seq((1L, 0), (1L, 64), (2L, 63), (3L, 200)).toDF("user_id", "day_abs")))
    assert(got.size == 201)
    val byT = got.map(r => r._1 -> r).toMap
    assert(byT(0) == ((0, 1L, 1L, 1L)), "day 0: only user 1")
    assert(byT(63) == ((63, 1L, 1L, 2L)), "day 63: user 2 dau; mau 2 (u1+u2)")
    assert(byT(64) == ((64, 1L, 2L, 2L)), "day 64: user 1 again, NOT a day-0 ghost; wau7 covers 58..64 = u1+u2")
    assert(byT(70) == ((70, 0L, 1L, 2L)), "day 70: wau7 64..70 still sees u1's day 64")
    assert(byT(71) == ((71, 0L, 0L, 2L)), "day 71: window 65..71 empty")
    assert(byT(199) == ((199, 0L, 0L, 2L)), "mau carries across empty words")
    assert(byT(200) == ((200, 1L, 1L, 3L)), "day 200: user 3 arrives")
  }

  test("a late backfill shifting the min date re-anchors the whole day axis") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dau_backfill").toString
    IncrementalDau.commitBatch(acts((1L, 110), (2L, 111)), 0L, s"$tmp/state")
    assert(rowsOf(IncrementalDau.snapshot(spark, s"$tmp/state")).map(_._1) == Seq(0, 1))
    // backfill 5 days BEFORE everything committed so far
    IncrementalDau.commitBatch(acts((3L, 105)), 1L, s"$tmp/state")
    val got = rowsOf(IncrementalDau.snapshot(spark, s"$tmp/state"))
    val want = rowsOf(TimeWindows.activeUsersOf(
      Seq((1L, 110), (2L, 111), (3L, 105)).toDF("user_id", "day_abs")))
    assert(got == want, "backfill must re-anchor, not corrupt committed state")
    assert(got.map(_._1) == (0 to 6).toSeq, "axis now spans 105..111")
  }
}
