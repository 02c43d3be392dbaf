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

  /** Does any top-level conjunct equate attributes (a hashable key)?
    * Note `a =!= b` is Not(EqualTo(..)) — a NESTED equality inside a
    * negation is not a key, so only top-level conjuncts count.
    */
  private def hasEquiConjunct(cond: Expression): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).exists {
      case EqualTo(l, r) => l.references.nonEmpty && r.references.nonEmpty
      case EqualNullSafe(l, r) => l.references.nonEmpty && r.references.nonEmpty
      case _ => false
    }
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
              if !hasEquiConjunct(cond) &&
                l.stats.sizeInBytes > maxBytes &&
                r.stats.sizeInBytes > maxBytes =>
            throw new IllegalStateException(
              s"[graft] inequality-only join over two large inputs " +
                s"rejected ($FLAG=true, both sides > $maxBytes bytes): " +
                s"no hash key means a nested-loop O(n^2) scan. Add an " +
                s"equi conjunct (bucket/band key) or bound one side. " +
                s"Plan:\n$j")
          case _ =>
        }
      }
    }
  }
}
