package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: `cosine_sim(x, x)` → 1.0 when both sides are the
  * same deterministic expression — the self-join diagonal that shows up
  * in all-pairs similarity plans. Injected via GraftExtensions
  * (`injectOptimizerRule`), the engine's demonstration of the Catalyst
  * rule surface (SURVEY.md §4); PlanSpec asserts the rewrite fires.
  *
  * Null-preservation: cosine_sim returns NULL iff the input is NULL, so
  * the fold wraps in `If(IsNull(x), NULL, 1.0)` unless x is known
  * non-nullable.
  */
object SimplifySelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if a.semanticEquals(b) && a.deterministic =>
        if (a.nullable) {
          org.apache.spark.sql.catalyst.expressions.If(
            org.apache.spark.sql.catalyst.expressions.IsNull(a),
            Literal(null, DoubleType), Literal(1.0))
        } else Literal(1.0)
    }
}
