package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Cast, EqualNullSafe, EqualTo, Explode, Expression, Floor, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, PredicateHelper, Sequence}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampNTZType, TimestampType}

/** Optimizer rewrite for PURE range joins (q_range_rewrite): an inner
  * join whose ONLY cross-side predicates bound a left-side timestamp
  * into a right-side interval (`l.ts >= r.lo AND l.ts < r.hi`, any
  * strictness, either argument order) plans as a
  * BroadcastNestedLoopJoin — O(n·m) predicate evaluations, and a hard
  * failure once the interval side outgrows the broadcast threshold.
  * This rule injects the BIN equi-key mechanically (the automated form
  * of q_join_range's hand-written rewrite, and of Databricks' range-join
  * optimization with a bin-size hint): the probe side gains
  * `floor(epoch_seconds(ts)/W)`, the interval side EXPLODES to every
  * bin its [lo, hi] span overlaps, and the original condition rides
  * along as the residual of what is now an equi hash join. Every
  * satisfying pair meets in exactly the probe row's bin (second-
  * truncation and floor are monotone, so bin(ts) ∈ [bin(lo), bin(hi)]
  * whenever lo ≤ ts ≤ hi), no dedup is needed, and rows the original
  * predicate rejects are rejected by the residual — the rewrite is
  * result-identical by construction, so the window oracle checks it.
  *
  * Guards (reasons NOT to fire): inner joins only (outer-side
  * null-padding counts rows per side, which the bin explode would
  * distort); no existing cross-side equi predicate (Spark already
  * hash-joins those — and this is also what makes the rule IDEMPOTENT:
  * its own output contains the bin equality, so the fixed-point pass
  * skips it); both bound expressions must be timestamp-typed and each
  * side's references confined to one child. W is a bin-size HINT
  * (efficiency, never correctness): intervals wider than W simply
  * explode to more bins.
  */
object RewriteRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  /** Bin width in seconds — the Databricks-style range-join hint. One
    * hour suits the ±30-min incident windows of the declared query;
    * wider intervals stay correct at more replicated bins.
    */
  val BinSeconds = 3600L

  private def seconds(e: Expression): Expression = {
    val ts = e.dataType match {
      case TimestampNTZType => Cast(e, TimestampType, Some(conf.sessionLocalTimeZone))
      case _ => e
    }
    Cast(ts, LongType, Some(conf.sessionLocalTimeZone))
  }

  private def bin(e: Expression): Expression =
    Floor(org.apache.spark.sql.catalyst.expressions.Divide(
      Cast(seconds(e), DoubleType), Literal(BinSeconds.toDouble)))

  private def isTs(e: Expression): Boolean = e.dataType match {
    case TimestampType | TimestampNTZType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      def fromL(e: Expression) = e.references.nonEmpty && e.references.subsetOf(l.outputSet)
      def fromR(e: Expression) = e.references.nonEmpty && e.references.subsetOf(r.outputSet)
      val hasCrossEqui = conjuncts.exists {
        case EqualTo(a, b) => (fromL(a) && fromR(b)) || (fromR(a) && fromL(b))
        case EqualNullSafe(a, b) => (fromL(a) && fromR(b)) || (fromR(a) && fromL(b))
        case _ => false
      }
      // normalize each cross-side comparison to (probeExpr, boundExpr,
      // isLower): probe on the left child, bound on the right child
      val bounds = conjuncts.flatMap {
        case GreaterThanOrEqual(a, b) if fromL(a) && fromR(b) => Some((a, b, true))
        case GreaterThan(a, b) if fromL(a) && fromR(b) => Some((a, b, true))
        case LessThanOrEqual(a, b) if fromL(a) && fromR(b) => Some((a, b, false))
        case LessThan(a, b) if fromL(a) && fromR(b) => Some((a, b, false))
        case GreaterThanOrEqual(a, b) if fromR(a) && fromL(b) => Some((b, a, false))
        case GreaterThan(a, b) if fromR(a) && fromL(b) => Some((b, a, false))
        case LessThanOrEqual(a, b) if fromR(a) && fromL(b) => Some((b, a, true))
        case LessThan(a, b) if fromR(a) && fromL(b) => Some((b, a, true))
        case _ => None
      }.filter { case (p, b, _) => isTs(p) && isTs(b) }
      val pair = bounds.collectFirst {
        case (p, lo, true) if bounds.exists { case (p2, _, isLo) =>
          !isLo && p2.semanticEquals(p) } =>
          (p, lo, bounds.find { case (p2, _, isLo) => !isLo && p2.semanticEquals(p) }.get._2)
      }
      pair match {
        case Some((probe, lo, hi)) if !hasCrossEqui =>
          val binL = Alias(bin(probe), "graft_bin_l")()
          val left2 = Project(l.output :+ binL, l)
          val binR = AttributeReference("graft_bin_r", LongType, nullable = false)()
          // inverted-interval guard: sequence() steps BACKWARD when
          // start > stop, so a corrupted row with hi < lo (a cheap
          // zero-match for the naive predicate) would explode to one
          // bin per hour of the reversed span — emit NO bins instead,
          // which matches the naive result (the residual can never
          // hold) at zero cost
          val binLo = bin(lo)
          val binHi = bin(hi)
          val seq = org.apache.spark.sql.catalyst.expressions.If(
            LessThanOrEqual(binLo, binHi),
            Sequence(binLo, binHi, None, Some(conf.sessionLocalTimeZone)),
            Literal.create(Array.empty[Long],
              org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))
          val right2 = Generate(Explode(seq), Nil, outer = false, None, Seq(binR), r)
          val joined = Join(left2, right2, Inner,
            Some(And(EqualTo(binL.toAttribute, binR), cond)), hint)
          Project(j.output, joined)
        case _ => j
      }
  }

  /** Run `body` with the rule registered, deregistering afterwards even
    * on failure (the scoped-register convention of RewriteWindowTopK —
    * a rule left behind would rewrite every later range join).
    */
  def withRule[T](spark: SparkSession)(body: => T): T = {
    PlanBridge.registerRule(spark, this)
    try body
    finally PlanBridge.deregisterRule(spark, this)
  }
}
