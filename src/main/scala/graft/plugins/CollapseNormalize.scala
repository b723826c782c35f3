package graft.plugins

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.expr.LowerRemovePunc

/** Optimizer rule: `graft_normalize` is idempotent (its output contains
  * no punctuation and no uppercase ASCII), so nested applications —
  * common when composed pipelines each defensively normalize — collapse
  * to one. A `Rule[LogicalPlan]` registered through
  * [[GraftExtensions]], demonstrating the custom-optimization extension
  * point (SURVEY.md §7.4); Catalyst runs it alongside the built-in
  * batches until fixpoint. */
object CollapseNormalize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LowerRemovePunc(inner @ LowerRemovePunc(_)) => inner
    }
}
