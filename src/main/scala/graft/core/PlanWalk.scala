package graft.core

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** STAGE-AWARE physical-plan traversal.  The naive
  * `plan.collect { case n => n }` is blind twice under AQE: an
  * `AdaptiveSparkPlanExec` hides its current plan behind
  * `executedPlan`, and — the trap — a finished `QueryStageExec` is a
  * `LeafExecNode`, so after an action the ENTIRE executed plan
  * collapses into result stages whose interiors (including every
  * `ShuffleExchangeExec`) a naive collect never visits.  A
  * "zero shuffles" assertion written with plain collect is therefore
  * vacuously true for ANY join once the query has run.  Every
  * plan-shape assertion (specs and in-query gate pins) must walk
  * through BOTH wrappers — this object is the one shared definition.
  */
object PlanWalk {
  /** Every node, recursing through AQE wrappers and executed stages. */
  def nodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: QueryStageExec => s +: nodes(s.plan)
      case n => Seq(n)
    }.flatten

  /** Shuffle exchanges anywhere in the (possibly executed) plan. */
  def shuffles(p: SparkPlan): Int =
    nodes(p).count(_.isInstanceOf[ShuffleExchangeLike])
}
