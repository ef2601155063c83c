package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite exact `COUNT(DISTINCT x)` into
  * HyperLogLog++ (`approx_count_distinct`). At 100 TB an exact distinct
  * count shuffles every distinct key; the sketch is a constant-size
  * (relativeSD-determined) buffer that merges map-side — the difference
  * between a terabyte-scale Exchange and a few KB per partition.
  *
  * Because the rewrite trades exactness for speed, it is OFF by default
  * and gated per-session on `spark.graft.approxCountDistinct.enabled`;
  * accuracy is tuned with `spark.graft.approxCountDistinct.relativeSD`.
  * Scope: single-argument `COUNT(DISTINCT x)` in logical `Aggregate`
  * nodes (multi-column distinct sets have already been expanded by
  * Catalyst's RewriteDistinctAggregates before injected rules run, and
  * pass through untouched). The FILTER clause and result attribute id of
  * the original aggregate are preserved, so references stay valid.
  *
  * Installed by `graft.GraftExtensions` via `injectOptimizerRule` (built
  * sessions) or `spark.experimental.extraOptimizations` (existing
  * sessions).
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.approxCountDistinct.enabled"
  val SdKey = "spark.graft.approxCountDistinct.relativeSD"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else {
      val sd = conf.getConfString(SdKey, "0.05").toDouble
      plan.transformUp {
        case agg: Aggregate =>
          agg.transformExpressions {
            case ae @ AggregateExpression(Count(Seq(child)), _, true, _, _) =>
              ae.copy(aggregateFunction = HyperLogLogPlusPlus(child, sd),
                isDistinct = false)
          }
      }
    }
  }
}
