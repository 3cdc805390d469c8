package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: rewrite exact `percentile(x, p)` aggregates
  * to the GK sketch (`approx_percentile`) under an explicit session
  * opt-in — the [[ApproxDistinctRewrite]] pattern for order statistics.
  *
  * At 100 TB the exact percentile is the scale-killer aggregate: Spark's
  * `Percentile` is a TypedImperativeAggregate that buffers EVERY group
  * value in one task's memory (the CLAUDE.md r5 trap — with a 3-value
  * group key that is N/3 values per buffer). The GK sketch aggregates to
  * a bounded ~O(accuracy) buffer per group: map-side partials merge
  * associatively and the answer lands within the configured rank error
  * (1/accuracy). The rewrite turns the exact formulation into that
  * sketch plan without touching query text.
  *
  * A silent approximation must never be default behavior (the
  * [[LshJoinRewrite]] principle), so the rule fires only on opt-in:
  *
  * {{{
  *   spark.conf.set(ApproxPercentileRewrite.EnabledKey, "true")
  *   spark.conf.set(ApproxPercentileRewrite.AccuracyKey, "1000") // optional
  * }}}
  *
  * Scope guards: only plain `percentile(x, p)` / `percentile(x,
  * array(...))` with the default unit frequency and no DISTINCT/reverse
  * rewrite; weighted percentiles stay exact. `Percentile` returns
  * DOUBLE (or array thereof) while `ApproximatePercentile` returns the
  * INPUT type, so the rewritten aggregate is wrapped in a Cast back to
  * the original type — the enclosing Alias keeps its exprId, so nothing
  * downstream re-resolves. The deterministic REPLAYABLE sample-percentile
  * operator is `q_agg_approx_percentile` (DiagOps.BottomKSample); this
  * rule is the query-text-preserving convenience path.
  */
object ApproxPercentileRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.approx.percentile"

  /** GK sketch accuracy (approx_percentile's dial): rank error ≤
    * 1/accuracy. Spark's default 10000 unless overridden. */
  val AccuracyKey = "spark.graft.approx.percentile.accuracy"

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "false").toBoolean

  private def accuracy: Int =
    conf.getConfString(AccuracyKey,
      ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY.toString).toInt

  /** True when the frequency expression is semantically the integral
    * constant 1 (r14 advisor: the old string-y `v.toString == "1"` guard
    * matched any type and missed foldable-but-non-literal frequencies
    * like CAST(1 AS INT)). Foldable expressions are evaluated first, and
    * the folded value compares as an integral 1 per type. */
  private def unitFrequency(e: Expression): Boolean = {
    val lit: Option[Literal] = e match {
      case l: Literal => Some(l)
      case f if f.foldable && !f.dataType.isInstanceOf[
          org.apache.spark.sql.types.DecimalType] =>
        scala.util.Try(Literal.create(f.eval(), f.dataType)).toOption
      case _ => None
    }
    lit.exists {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v == 1
      case Literal(v: Long, org.apache.spark.sql.types.LongType) => v == 1L
      case Literal(v: Short, org.apache.spark.sql.types.ShortType) => v == 1
      case Literal(v: Byte, org.apache.spark.sql.types.ByteType) => v == 1
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(p: Percentile, _, false, _, _)
              if !p.reverse && unitFrequency(p.frequencyExpression) =>
            Cast(
              ae.copy(aggregateFunction = ApproximatePercentile(
                p.child, p.percentageExpression, Literal(accuracy), 0, 0)),
              p.dataType)
        }
    }
}
