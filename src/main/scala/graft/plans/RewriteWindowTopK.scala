package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.PlanBridge

/** Optimizer rewrite: `Filter(row_number <= k, Window(row_number over
  * partitionBy p orderBy o))` → the same Filter+Window over
  * `GroupedTopK(p, o, k, child)` (SURVEY.md §2b q_topk_rewrite).
  *
  * This is the deployment story for the custom operator: users keep
  * writing the idiomatic window form, and the rule swaps the
  * full-table shuffle+sort for the bounded-heap partial/final plan.
  * The Window node is RETAINED above the injected operator — it
  * recomputes `rn` over the `groups × k` survivors (exactly the rows
  * whose row_number was ≤ k, so the numbers come out identical), which
  * keeps the rewrite a pure child-substitution: no projection surgery,
  * and every downstream reference to `rn` still resolves.
  *
  * Guards (reasons NOT to fire): exactly one window expression (any
  * sibling window column needs the full partition), a non-empty
  * partition spec (a global top-k is already TakeOrderedAndProject
  * territory, and ClusteredDistribution(Nil) is meaningless), a
  * literal integer bound on the row_number attribute itself, and
  * k ≤ MaxK (the per-group heap is the memory bound).
  *
  * Registered SCOPED via [[withRule]] (register → plan → deregister):
  * a global rewrite left on a shared session would change every later
  * window query's plan behind its back.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  /** Heap-bound guard: groups × MaxK rows per partition is the rewrite's
    * memory footprint; past this the window form's spill path is safer.
    */
  val MaxK = 1000

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // the !GroupedTopK guard makes the rule IDEMPOTENT: the rewrite
    // keeps the Filter+Window pattern it matched (rn is recomputed over
    // the survivors), and the extraOptimizations batch runs to fixed
    // point — without the guard every iteration stacked another
    // GroupedTopK+exchange under the window (observed: 8 layers, 8.1 s
    // vs 1.2 s plain at sf0.1; RewriteTopKSpec pins single-node now)
    case f @ Filter(cond, w: Window)
        if w.windowExpressions.size == 1 && w.partitionSpec.nonEmpty &&
          !w.child.isInstanceOf[GroupedTopK] =>
      (w.windowExpressions.head, kOf(cond, w.windowExpressions.head.toAttribute)) match {
        case (Alias(WindowExpression(_: RowNumber, _), _), Some(k))
            if k > 0 && k <= MaxK =>
          f.copy(child = w.copy(child =
            GroupedTopK(w.partitionSpec, w.orderSpec, k, w.child)))
        case _ => f
      }
  }

  /** The k in `rn <= k` / `rn < k+1`, iff the compared attribute IS the
    * row_number output.
    */
  private def kOf(cond: org.apache.spark.sql.catalyst.expressions.Expression,
      rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  /** Run `body` with the rule (and the operator's strategy) registered,
    * deregistering the rule afterwards even on failure.
    */
  def withRule[T](spark: SparkSession)(body: => T): T = {
    PlanBridge.register(spark, GroupedTopKStrategy)
    PlanBridge.registerRule(spark, this)
    try body
    finally PlanBridge.deregisterRule(spark, this)
  }
}
