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
  *  1. no join condition at all — a cross product;
  *  2. an *inequality-only* condition (no top-level cross-input
  *     equality conjunct, e.g. `a.id < b.id`): Spark has no hash key
  *     to shuffle on, so the plan is a BroadcastNestedLoopJoin —
  *     O(|L|·|R|) work however the predicate filters the output.
  *
  * Both shapes are flagged only when BOTH sides' estimated size
  * exceeds `spark.graft.inequalityJoinMaxBytes` (default 64 MiB) with
  * no reducing operator (Filter/Limit/Aggregate/Sample) above the
  * scan: a bounded side (broadcast dim, filtered query set, small
  * aggregate) keeps the nested loop linear in the big side, which is
  * the legitimate theta-join shape.
  *
  * Enabled via `spark.graft.failOnCartesian=true` — ON in the engine's
  * own sessions (GraftSession/Verify/Bench), so every gate query
  * dogfoods the lint; default off for embedders.
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
  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def hasCrossEquiConjunct(
      cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = splitConjuncts(e)
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
    * table) would read as large. Any non-trivial Filter (at least one
    * conjunct beyond IsNotNull) or Limit/Aggregate/Sample in the
    * subtree is assumed reducing — the unbounded corpus-×-corpus
    * shape the lint targets has bare scans on both sides, so this
    * keeps the lint precise without CBO selectivity estimates.
    */
  private def unboundedAbove(side: LogicalPlan, maxBytes: Long): Boolean =
    side.stats.sizeInBytes > maxBytes &&
      !side.exists {
        // an IsNotNull-only filter (Spark injects these under every
        // inner join) reduces nothing — it must not disarm the lint
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          splitConjuncts(f.condition).exists {
            case _: org.apache.spark.sql.catalyst.expressions.IsNotNull =>
              false
            case _ => true
          }
        case _: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => true
        case _: org.apache.spark.sql.catalyst.plans.logical.LocalLimit => true
        case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => true
        case _: org.apache.spark.sql.catalyst.plans.logical.Sample => true
        // typed/object pipelines (spark.ml's blocked factor cross
        // joins, Dataset-from-RDD sources) report the default
        // sizeInBytes (Long.MaxValue) — unknown, not "large"; the lint
        // targets declarative plans over stats-bearing sources
        case _: org.apache.spark.sql.catalyst.plans.logical.MapPartitions => true
        case _: org.apache.spark.sql.execution.ExternalRDD[_] => true
        case _: org.apache.spark.sql.execution.LogicalRDD => true
        case _ => false
      }

  override def apply(plan: LogicalPlan): Unit = {
    SparkSession.getActiveSession.foreach { s =>
      if (s.conf.get(FLAG, "false").toBoolean) {
        val maxBytes =
          s.conf.get(MAX_BYTES, DEFAULT_MAX_BYTES.toString).toLong
        plan.foreach {
          // Both shapes are size-gated: a nested loop with one bounded
          // side (broadcast dim, filtered query set, small aggregate)
          // is linear in the big side and legitimate — e.g. the 10-row
          // centroid assign cross join. Only big-unbounded × big-
          // unbounded is the cluster-killer.
          case j @ Join(l, r, Inner | Cross, cond, _)
              if !cond.exists(hasCrossEquiConjunct(_, l, r)) &&
                unboundedAbove(l, maxBytes) &&
                unboundedAbove(r, maxBytes) =>
            val shape = if (cond.isEmpty) "condition-less cartesian"
              else "inequality-only"
            throw new IllegalStateException(
              s"[graft] $shape join over two large unbounded inputs " +
                s"rejected ($FLAG=true, both sides > $maxBytes bytes): " +
                s"no cross-input hash key means a nested-loop O(n^2) " +
                s"scan. Add an equi conjunct (bucket/band key) or bound " +
                s"one side. (Note the lint's escape hatch: any " +
                s"non-IsNotNull Filter on a side marks it bounded — " +
                s"make sure such a filter is actually selective.) " +
                s"Plan:\n$j")
          case _ =>
        }
      }
    }
  }
}
