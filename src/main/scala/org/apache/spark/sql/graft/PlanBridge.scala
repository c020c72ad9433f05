package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into the `private[sql]` logical-plan surface — the
  * counterpart of [[ColumnBridge]] for whole-operator extensions
  * (graft.plans.GroupedTopK): wrap a DataFrame's logical plan in a
  * custom node, turn the result back into a DataFrame, and register
  * the custom strategy on a live session. Kept beside ColumnBridge so
  * every package-private access point stays in one auditable place.
  */
object PlanBridge {

  /** The (unanalyzed) logical plan behind a DataFrame. */
  def logical(df: DataFrame): LogicalPlan = df.queryExecution.logical

  /** DataFrame over an arbitrary logical plan (re-analyzed). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently add a planning strategy to the session (the
    * `experimental.extraStrategies` registration path — the same hook
    * SparkSessionExtensions' injectPlannerStrategy feeds, usable on an
    * already-built session).
    */
  def register(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(strategy))
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ strategy
  }

  /** Idempotently add / remove an optimizer rule (the
    * `experimental.extraOptimizations` hook — the post-optimizer "User
    * Provided Optimizers" batch, SparkSessionExtensions'
    * injectOptimizerRule analog for a live session). Removal exists
    * because graft registers rewrite rules SCOPED (register → plan →
    * deregister): a rule left behind on the shared session would
    * silently change every later query's plan.
    */
  def registerRule(spark: SparkSession, rule: Rule[LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraOptimizations.contains(rule))
      cs.experimental.extraOptimizations =
        cs.experimental.extraOptimizations :+ rule
  }

  def deregisterRule(spark: SparkSession, rule: Rule[LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.experimental.extraOptimizations =
      cs.experimental.extraOptimizations.filterNot(_ eq rule)
  }
}
