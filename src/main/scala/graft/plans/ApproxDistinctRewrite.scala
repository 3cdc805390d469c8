package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: rewrite exact `count(DISTINCT x)` aggregates
  * to HyperLogLog++ sketches under an explicit session opt-in.
  *
  * At 100 TB an exact distinct count is the expensive shape in the plan:
  * Spark expands it into a two-level aggregate whose FIRST level shuffles
  * one row per DISTINCT (group, x) — for a high-cardinality column that is
  * a near-data-sized exchange. The HLL++ sketch aggregates to a fixed
  * ~`1.04/rsd²`-register buffer per group in one pass: map-side partial
  * sketches merge associatively, the exchange carries O(groups) buffers,
  * and the answer lands within the configured relative standard deviation.
  * The rewrite turns the EXACT formulation into that sketch plan without
  * touching query text — dashboards and ad-hoc SQL keep writing
  * `count(DISTINCT user_id)`.
  *
  * A silent approximation must never be default behavior (the
  * [[LshJoinRewrite]] principle), so the rule fires only when the session
  * opts in:
  *
  * {{{
  *   spark.conf.set(ApproxDistinctRewrite.EnabledKey, "true")
  *   spark.conf.set(ApproxDistinctRewrite.RsdKey, "0.02")   // optional
  * }}}
  *
  * Scope guards: only single-argument `count(DISTINCT x)` rewrites —
  * multi-column distincts (tuple cardinality) and `count(x)` stay exact;
  * aggregate FILTER clauses ride through unchanged on the rewritten
  * expression; result type stays BIGINT, aliases/attribute ids are
  * preserved (the expression is rewritten in place), so nothing downstream
  * re-resolves. Install via `GraftExtensions` or
  * `spark.experimental.extraOptimizations` (Pipelines.installApproxDistinct).
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.approx.countDistinct"

  /** Relative standard deviation for the sketch (approx_count_distinct's
    * dial); Spark's default 0.05 unless overridden. */
  val RsdKey = "spark.graft.approx.countDistinct.rsd"

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "false").toBoolean

  private def rsd: Double =
    conf.getConfString(RsdKey, "0.05").toDouble

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          // skip foldable children (r13, advisor note): count(DISTINCT
          // <literal>) is a constant 0/1 per group — HLL++ would return
          // the right value but pay sketch buffers for it
          case ae @ AggregateExpression(Count(Seq(child)), _, true, _, _)
              if !child.foldable =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(child, rsd, 0, 0),
              isDistinct = false)
        }
    }
}
