package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** Analyzer-time lint (SURVEY §4 candidate rule (a); §7.4 risk 2):
  * reject join plans with no join condition at all — the shape that
  * becomes an unbounded O(n²) cartesian at cluster scale (the reference
  * ran exactly this on ~6k users, hw4/hw4.py:104-110, which is lethal
  * at 100 TB).
  *
  * Opt-in via `spark.graft.failOnCartesian=true` (default off: the
  * engine's own bounded nested-loop baselines — e.g. the query-set-
  * bounded brute-force ANN — are legitimate). Inequality-only
  * conditions are allowed: they're how bounded theta-joins (q7) and
  * the gated pair scans express themselves; the lint targets the
  * no-condition cross product, which is virtually always an authoring
  * mistake in an analytics job.
  */
object CartesianGuard extends (LogicalPlan => Unit) {

  val FLAG = "spark.graft.failOnCartesian"

  override def apply(plan: LogicalPlan): Unit = {
    val active = SparkSession.getActiveSession
      .exists(_.conf.get(FLAG, "false").toBoolean)
    if (active) {
      plan.foreach {
        case j @ Join(_, _, Inner | Cross, None, _) =>
          throw new IllegalStateException(
            s"[graft] unguarded cartesian join rejected ($FLAG=true): " +
              s"add a join condition or an explicit bound. Plan:\n$j")
        case _ =>
      }
    }
  }
}
