package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.PlanBridge

/** Grouped top-k as a first-class operator: logical node + strategy +
  * two-phase physical plan (SURVEY.md §2b q_topk_group_fast).
  *
  * Why Spark needs it: the idiomatic `row_number().over(partitionBy
  * ...) <= k` SHUFFLES EVERY ROW to its group's reducer and sorts full
  * partitions before discarding all but k — at 100 TB the exchange
  * moves the whole table to keep `groups × k` rows. This operator runs
  * per-partition bounded heaps BEFORE the exchange (the aggregation-
  * style partial/final split applied to top-k), so the shuffle carries
  * at most `input_partitions × groups × k` rows and nothing is ever
  * fully sorted. GroupedTopKSpec proves result-set equality with the
  * window form (which also makes the declared query oracle-checkable)
  * and asserts the exchange-volume claim on the physical plan.
  *
  * Memory bound: one k-row heap per distinct key per partition —
  * intended for bounded-cardinality group columns (the same contract
  * as broadcast dims or pivot keys). The window form remains the
  * spill-safe fallback for unbounded group cardinality.
  */
case class GroupedTopK(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}

/** Plans the logical node as partial-heaps → (exchange inserted by
  * requiredChildDistribution) → final-heaps.
  */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(g, o, k, child) =>
      val partial = GroupedTopKExec(g, o, k, planLater(child), partial = true)
      GroupedTopKExec(g, o, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

/** Per-partition bounded heaps: head of each heap is the WORST row
  * kept, replaced whenever a better one arrives. The partial phase
  * runs on arbitrary partitioning; the final phase demands
  * ClusteredDistribution(groupExprs), so Catalyst inserts the (tiny)
  * exchange between them exactly like partial/final aggregation.
  */
case class GroupedTopKExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val groupLocal = groupExprs
    val orderLocal = ordering
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupLocal, childOutput)
      val ord = GenerateOrdering.generate(orderLocal, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // reverse: head = last in sort order among the kept k
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}

object GroupedTopKOp {

  /** Top `k` rows of `df` per `groupCols` under `order` — each order
    * entry is (column, descending?); "top" = first k in that sort
    * order. Registers the strategy on the session idempotently; output
    * row order within a group is unspecified (sort downstream if
    * needed — the result is only `groups × k` rows). The node is built
    * from raw catalyst UnresolvedAttributes (NOT the Column bridge:
    * Spark 4's lazy ColumnNodeExpression wrapper neither resolves
    * inside a custom node nor serializes into task closures).
    */
  def topK(df: DataFrame, k: Int, groupCols: Seq[String],
      order: Seq[(String, Boolean)]): DataFrame = {
    val spark = df.sparkSession
    PlanBridge.register(spark, GroupedTopKStrategy)
    val sortOrders = order.map { case (name, desc) =>
      SortOrder(UnresolvedAttribute.quoted(name),
        if (desc) Descending else Ascending)
    }
    PlanBridge.ofRows(spark,
      GroupedTopK(groupCols.map(UnresolvedAttribute.quoted), sortOrders, k,
        PlanBridge.logical(df)))
  }
}
