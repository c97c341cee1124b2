package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Shared structural-plan walking for specs that assert plan SHAPE
  * instead of plan-string fragments (the r16 ADVICE discipline). One
  * copy on purpose: when a Spark upgrade adds another wrapper node
  * type, every structural assert regains descent together instead of
  * one spec's copy silently going vacuous.
  */
object PlanTestUtil {

  /** Every node of an executed plan. AQE wrappers hide their subtrees
    * outside `children`: `QueryStageExec` nodes (present once the frame
    * has EXECUTED) carry theirs in `.plan`, `ReusedExchangeExec` in
    * `.child` — descend all of them.
    */
  def flattenPlan(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flattenPlan(a.executedPlan)
    case q: QueryStageExec => p +: flattenPlan(q.plan)
    case r: ReusedExchangeExec => p +: flattenPlan(r.child)
    case _ => p +: p.children.flatMap(flattenPlan)
  }
}
