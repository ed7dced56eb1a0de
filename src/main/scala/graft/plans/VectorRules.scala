package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{FloatDot, FloatNorm2}

/** Optimizer rule (the `Rule[LogicalPlan]` extension point): algebraic
  * simplification over the engine's own expression library —
  * `vec_dot(x, x)` is `vec_norm2(x)`, halving the loop's multiplies and
  * array reads. Semantically exact: both are the same sequential
  * Σ x(i)·x(i) fold, so results are bit-identical.
  *
  * Runs in every Catalyst optimization pass via
  * `GraftExtensions.injectOptimizerRule`, so user code (or generated
  * query text) that spells the norm as a self-dot still gets the tight
  * single-array loop.
  */
object RewriteSelfDot extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case FloatDot(a, b) if a.semanticEquals(b) && a.deterministic =>
        FloatNorm2(a)
    }
}
