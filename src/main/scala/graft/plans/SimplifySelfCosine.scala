package graft.plans

import graft.functions.{CosineSimilarity, SelfCosine}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `cosine_sim(x, x)` → `self_cosine(x)` when both
  * sides are the same deterministic expression — the self-join diagonal
  * that shows up in all-pairs similarity plans. Injected via
  * GraftExtensions (`injectOptimizerRule`), the engine's demonstration
  * of the Catalyst rule surface (SURVEY.md §4); PlanSpec asserts the
  * rewrite fires.
  *
  * The rewrite is exactly semantics-preserving: SelfCosine computes the
  * identical d/(√d·√d) formula in one pass, so NULL in → NULL out,
  * zero-norm / empty arrays stay NaN, and non-finite elements still
  * propagate — unlike the earlier fold to literal 1.0, which silently
  * changed results for degenerate vectors depending on whether the
  * rule fired (ADVICE r1).
  */
object SimplifySelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if a.semanticEquals(b) && a.deterministic =>
        SelfCosine(a)
    }
}
