package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** Analyzer-time lint (SURVEY §4 candidate rule (a); §7.4 risk 2):
  * reject join plans that degenerate into unbounded O(n²) scans at
  * cluster scale (the reference ran exactly this on ~6k users,
  * hw4/hw4.py:104-110, which is lethal at 100 TB). Two shapes:
  *
  *  1. no join condition at all — a cross product, virtually always an
  *     authoring mistake in an analytics job;
  *  2. an *inequality-only* condition (no top-level equality conjunct,
  *     e.g. `a.id < b.id`): Spark has no hash key to shuffle on, so the
  *     plan is a BroadcastNestedLoopJoin — O(|L|·|R|) work however the
  *     predicate filters the output. Flagged only when BOTH sides'
  *     estimated size exceeds `spark.graft.inequalityJoinMaxBytes`
  *     (default 64 MiB): a bounded side (broadcast dim, filtered query
  *     set) keeps the nested loop linear in the big side, which is the
  *     legitimate theta-join shape (q7-style bounds ride on an equi key
  *     and never hit this path).
  *
  * Opt-in via `spark.graft.failOnCartesian=true` (default off: the
  * engine's own bounded nested-loop baselines are legitimate).
  */
object CartesianGuard extends (LogicalPlan => Unit) {

  val FLAG = "spark.graft.failOnCartesian"
  val MAX_BYTES = "spark.graft.inequalityJoinMaxBytes"
  private val DEFAULT_MAX_BYTES: Long = 64L * 1024 * 1024

  /** Does any top-level conjunct equate attributes ACROSS the two join
    * inputs (a hashable key)? A same-side equality (`b.x === b.y`)
    * gives Spark no shuffle key, and `a =!= b` is Not(EqualTo(..)) —
    * a NESTED equality inside a negation is not a key either, so only
    * cross-side top-level conjuncts count.
    */
  private def hasCrossEquiConjunct(
      cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def crossSides(l: Expression, r: Expression): Boolean =
      l.references.nonEmpty && r.references.nonEmpty &&
        ((l.references.subsetOf(left.outputSet) &&
          r.references.subsetOf(right.outputSet)) ||
          (l.references.subsetOf(right.outputSet) &&
            r.references.subsetOf(left.outputSet)))
    conjuncts(cond).exists {
      case EqualTo(l, r) => crossSides(l, r)
      case EqualNullSafe(l, r) => crossSides(l, r)
      case _ => false
    }
  }

  /** Conservative "is this side plausibly bounded" test for the lint:
    * basic (non-CBO) stats pass a child's sizeInBytes through Filter
    * unchanged, so a filtered query set (`vec_id < 20` over a big
    * table) would read as large. Any Filter in the subtree is assumed
    * selective — the unbounded corpus-×-corpus shape the lint targets
    * has bare scans on both sides, so this keeps the lint precise
    * without CBO selectivity estimates.
    */
  private def unboundedAbove(side: LogicalPlan, maxBytes: Long): Boolean =
    side.stats.sizeInBytes > maxBytes &&
      !side.exists {
        case _: org.apache.spark.sql.catalyst.plans.logical.Filter => true
        case _: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => true
        case _: org.apache.spark.sql.catalyst.plans.logical.LocalLimit => true
        case _ => false
      }

  override def apply(plan: LogicalPlan): Unit = {
    SparkSession.getActiveSession.foreach { s =>
      if (s.conf.get(FLAG, "false").toBoolean) {
        val maxBytes =
          s.conf.get(MAX_BYTES, DEFAULT_MAX_BYTES.toString).toLong
        plan.foreach {
          case j @ Join(_, _, Inner | Cross, None, _) =>
            throw new IllegalStateException(
              s"[graft] unguarded cartesian join rejected ($FLAG=true): " +
                s"add a join condition or an explicit bound. Plan:\n$j")
          case j @ Join(l, r, Inner | Cross, Some(cond), _)
              if !hasCrossEquiConjunct(cond, l, r) &&
                unboundedAbove(l, maxBytes) &&
                unboundedAbove(r, maxBytes) =>
            throw new IllegalStateException(
              s"[graft] inequality-only join over two large unbounded " +
                s"inputs rejected ($FLAG=true, both sides > $maxBytes " +
                s"bytes): no cross-input hash key means a nested-loop " +
                s"O(n^2) scan. Add an equi conjunct (bucket/band key) " +
                s"or bound one side. Plan:\n$j")
          case _ =>
        }
      }
    }
  }
}
