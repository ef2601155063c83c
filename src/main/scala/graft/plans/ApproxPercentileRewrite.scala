package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Opt-in optimizer rule: rewrite exact `percentile(x, p)` into the
  * KLL-style sketch (`approx_percentile(x, p, accuracy)`) — the
  * [[ApproxDistinctRewrite]] pattern applied to quantiles. At 100 TB an
  * exact percentile materializes each group's full value multiset in its
  * reducer (`percentile` is an ObjectHashAggregate whose state grows
  * with the group); the sketch's state is fixed-size and MERGEABLE, so
  * heavy groups ship constant-size buffers from each map task exactly
  * like any partial aggregate.
  *
  * Off by default (`spark.graft.approxPercentile.enabled`), accuracy
  * tuned via `spark.graft.approxPercentile.accuracy` (the
  * approx_percentile accuracy knob: error ≤ 1/accuracy of the rank).
  * Scope: DOUBLE-typed inputs with the default frequency of 1 —
  * `percentile` always returns double, while `approx_percentile`
  * returns its INPUT type, so rewriting an integral column would change
  * the aggregate's result type out from under its attribute; weighted
  * percentiles have no sketch equivalent and pass through.
  */
object ApproxPercentileRewrite extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.approxPercentile.enabled"
  val AccuracyKey = "spark.graft.approxPercentile.accuracy"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else {
      val acc = conf.getConfString(AccuracyKey, "10000").toInt
      plan.transformUp {
        case agg: Aggregate =>
          agg.transformExpressions {
            case ae @ AggregateExpression(p: Percentile, _, false, _, _)
                if p.child.dataType == DoubleType &&
                  p.frequencyExpression == Literal(1L) && !p.reverse =>
              // !reverse: percentile_cont(p ORDER BY x DESC) lowers to
              // Percentile(reverse=true) — an ascending approx sketch
              // would silently return the (1−p) quantile
              ae.copy(aggregateFunction = new ApproximatePercentile(
                p.child, p.percentageExpression, Literal(acc)))
          }
      }
    }
  }
}
