package graft

import graft.plans.{GroupedTopK, RewriteWindowTopK}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The window-top-k optimizer rewrite (q_topk_rewrite): fires on the
  * canonical pattern, produces identical results, respects every
  * no-fire guard, and deregisters cleanly (scoped registration on the
  * shared session).
  */
class RewriteTopKSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def windowForm: DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  private def hasRewrite(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst { case g: GroupedTopK => g }.isDefined

  test("rule fires on filter(row_number <= k) over a single-expression window") {
    val want = windowForm.select("o_orderkey", "rn").as[(Long, Int)].collect().toSet
    RewriteWindowTopK.withRule(spark) {
      val df = windowForm
      assert(hasRewrite(df), df.queryExecution.optimizedPlan.toString.take(600))
      val got = df.select("o_orderkey", "rn").as[(Long, Int)].collect().toSet
      assert(got == want, "rewritten plan must produce identical rows AND rn values")
    }
  }

  test("rule is idempotent under the optimizer's fixed-point batch: ONE node, not a stack") {
    RewriteWindowTopK.withRule(spark) {
      val n = windowForm.queryExecution.optimizedPlan.collect {
        case g: GroupedTopK => g
      }.size
      // without the already-rewritten guard, every fixed-point iteration
      // stacked another GroupedTopK+exchange (observed: 8 layers)
      assert(n == 1, s"expected exactly one GroupedTopK, got $n")
    }
  }

  test("rn < k form fires with k-1; rn <= 0 and k > MaxK do not fire") {
    RewriteWindowTopK.withRule(spark) {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val base = Tables.orders(spark, sf).withColumn("rn", row_number().over(w))
      assert(hasRewrite(base.filter(col("rn") < 4)))
      assert(!hasRewrite(base.filter(col("rn") <= 0)))
      assert(!hasRewrite(base.filter(col("rn") <= RewriteWindowTopK.MaxK + 1)))
    }
  }

  test("guards: sibling window column, empty partition spec, non-rn predicate") {
    RewriteWindowTopK.withRule(spark) {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      // sibling window expression needs the full partition — must not fire
      val twoCols = Tables.orders(spark, sf)
        .withColumn("rn", row_number().over(w))
        .withColumn("mx", max(col("o_totalprice")).over(
          Window.partitionBy(col("o_orderpriority"))))
        .filter(col("rn") <= 3)
      assert(!hasRewrite(twoCols))
      // global window (no partition) — TakeOrdered territory, must not fire
      val global = Tables.orders(spark, sf)
        .withColumn("rn", row_number().over(
          Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .filter(col("rn") <= 3)
      assert(!hasRewrite(global))
      // predicate on a non-window column — must not fire
      val wrongCol = Tables.orders(spark, sf)
        .withColumn("rn", row_number().over(w))
        .filter(col("o_orderkey") <= 3)
      assert(!hasRewrite(wrongCol))
    }
  }

  test("scoped registration: the rule is gone after withRule, even on failure") {
    intercept[RuntimeException] {
      RewriteWindowTopK.withRule(spark) { throw new RuntimeException("boom") }
    }
    assert(!hasRewrite(windowForm),
      "rule must be deregistered after withRule — a leak rewrites every later window query")
  }

  test("q_topk_rewrite equals the plain window query's answer") {
    val got = SparkEntry.queries("q_topk_rewrite")(spark, sf).collect().map(_.toString)
    val want = SparkEntry.queries("q_topk_group")(spark, sf).collect().map(_.toString)
    assert(got.sameElements(want))
  }
}
