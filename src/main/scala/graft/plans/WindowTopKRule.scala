package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, PredicateHelper, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: the `row_number().over(partitionBy.orderBy) ≤ k`
  * filter idiom auto-rewrites to the engine's [[TopKPerKeyPlan]] —
  * bounded per-key heaps (O(n log k), memory k·keys) instead of a full
  * partition sort under WindowExec. Users write the standard
  * declarative pattern; the planner swaps in the custom operator, the
  * same way Spark's own ReplaceDistinctWithAggregate works.
  *
  * Fires only on the exactly-safe shape:
  *  - the Window node computes ONE expression, a plain `row_number`;
  *  - the partition spec is nonempty (the custom exec distributes by
  *    it) and both specs are deterministic;
  *  - the filter bounds that row number above by an integer literal
  *    (`rn ≤ k`, `rn < k`, `k ≥ rn`, or `rn = 1`); other conjuncts are
  *    preserved as a residual Filter above the rewrite.
  *
  * With a tie-free order the result set is identical; with ties both
  * formulations are equally under-specified (row_number itself is
  * non-deterministic on ties). All 178 oracled queries hash-match with
  * the rule active, and WindowTopKRuleSpec pins shape + semantics.
  *
  * OPT-IN (`spark.graft.topkRewrite=true`): measured at sf0.1, the
  * heap operator wins when partitions are large relative to k
  * (q_window_rank 0.81 → 0.47 s) but loses to Spark's own codegen'd
  * WindowGroupLimit path when groups are small (q_capped_sample
  * 0.20 → 0.67 s) — per-key heap state dominates there. Without
  * per-relation statistics the rule can't pick sides statically, so
  * the default stays off and the knob is the contract, like AQE's.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.topkRewrite", "false") == "true"

  /** k such that `cond` ≡ rn ≤ k, if it is an upper bound on `rn`. */
  private def bound(cond: Expression, rn: AttributeReference): Option[Int] =
    cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) => Some(k)
      case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) =>
        // rn < Int.MinValue is always false; k - 1 would wrap to
        // Int.MaxValue and turn "return no rows" into "return all rows"
        if (k == Int.MinValue) None else Some(k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference)
        if a.semanticEquals(rn) => Some(k)
      case EqualTo(a: AttributeReference, Literal(1, IntegerType))
        if a.semanticEquals(rn) => Some(1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else plan.transform {
    case f @ Filter(cond, w: Window) if w.windowExpressions.size == 1 =>
      w.windowExpressions.head match {
        case alias @ Alias(WindowExpression(_: RowNumber, spec: WindowSpecDefinition), _)
          if spec.partitionSpec.nonEmpty &&
            spec.partitionSpec.forall(_.deterministic) &&
            spec.orderSpec.nonEmpty && spec.orderSpec.forall(_.deterministic) =>
          val rnAttr = alias.toAttribute match {
            case a: AttributeReference => a
            case _ => null
          }
          val conjuncts = if (rnAttr == null) Nil else splitConjunctivePredicates(cond)
          val ks = conjuncts.flatMap(c => bound(c, rnAttr))
          if (ks.isEmpty || ks.min < 1) f
          else {
            val k = ks.min
            val residual = conjuncts.filter(c => bound(c, rnAttr).isEmpty)
            // keep the original exprId so downstream references to rn
            // still resolve
            val rank = AttributeReference(rnAttr.name, IntegerType,
              nullable = false)(exprId = rnAttr.exprId)
            val topk = TopKPerKeyPlan(
              spec.partitionSpec, spec.orderSpec, k, rank, w.child)
            if (residual.isEmpty) topk else Filter(residual.reduce(And), topk)
          }
        case _ => f
      }
  }
}
