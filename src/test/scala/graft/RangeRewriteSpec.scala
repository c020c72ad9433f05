package graft

import graft.plans.RewriteRangeJoin
import graft.queries.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RewriteRangeJoin contract: fires on pure interval-containment joins
  * (BNLJ → hash join on the injected bin key), result-identical to the
  * naive plan, and leaves equi-keyed and outer joins alone.
  */
class RangeRewriteSpec extends AnyFunSuite with SharedSpark {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("naive containment join plans as a nested loop WITHOUT the rule") {
    val p = planOf(Relational.rangeJoinNaive(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected BNLJ baseline:\n$p")
  }

  test("rule replaces the nested loop with a bin-keyed hash join, same rows") {
    val naiveRows = Relational.rangeJoinNaive(spark, sf).collect()
    RewriteRangeJoin.withRule(spark) {
      val df = Relational.rangeJoinNaive(spark, sf)
      val p = planOf(df)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop survived:\n$p")
      assert(p.contains("graft_bin"), s"bin key missing:\n$p")
      assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
        || p.contains("ShuffledHashJoin"), s"no equi join:\n$p")
      // the explode replicates each interval to ≤2 bins exactly once:
      // exactly one Generate node (also proves the fixed-point pass
      // didn't stack a second rewrite — the equi guard is idempotence)
      assert("Generate".r.findAllIn(p).size == 1, s"explode count wrong:\n$p")
      val got = df.collect()
      assert(got.sameElements(naiveRows), "rewritten rows differ from naive")
    }
  }

  test("no-fire: an equi-keyed join is left alone") {
    RewriteRangeJoin.withRule(spark) {
      val o = Tables.orders(spark, sf)
      val c = Tables.customer(spark, sf)
      val df = o.join(c, o("o_custkey") === c("c_custkey") &&
        o("o_orderdate") >= c("c_custkey").cast("timestamp"))
      assert(!planOf(df).contains("graft_bin"), "rewrote an equi join")
    }
  }

  test("no-fire: an outer containment join is left alone") {
    RewriteRangeJoin.withRule(spark) {
      val e = Tables.events(spark, sf)
      val win = e.limit(5).select(col("event_id").as("wid"),
        (col("ts") - expr("INTERVAL 10 MINUTES")).as("a"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("b"))
      val df = e.join(win, col("ts") >= col("a") && col("ts") < col("b"), "left")
      assert(!planOf(df).contains("graft_bin"), "rewrote an outer join")
    }
  }

  test("inverted intervals (hi < lo) match nothing — and don't explode") {
    // sequence() steps BACKWARD when start > stop: without the If
    // guard, one corrupted interval row would explode to a bin per hour
    // of the reversed span. The guard emits zero bins, matching the
    // naive predicate's zero matches.
    RewriteRangeJoin.withRule(spark) {
      val e = Tables.events(spark, sf)
      val bad = e.limit(3).select(col("event_id").as("wid"),
        (col("ts") + expr("INTERVAL 10 DAYS")).as("a"),   // lo AFTER hi
        (col("ts") - expr("INTERVAL 10 DAYS")).as("b"))
      val df = e.join(bad, col("ts") >= col("a") && col("ts") < col("b"))
      val p = planOf(df)
      assert(p.contains("graft_bin"), s"rule did not fire on inverted bounds:\n$p")
      assert(df.count() == 0, "inverted interval must match nothing")
    }
  }

  test("deregistration: the rule leaves no trace on the shared session") {
    RewriteRangeJoin.withRule(spark) { () }
    val p = planOf(Relational.rangeJoinNaive(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"), "rule leaked past its scope")
  }
}
