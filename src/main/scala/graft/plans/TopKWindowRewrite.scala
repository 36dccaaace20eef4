package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule — level (c)+ of the custom-operator ladder: rewrites
  * the UNIVERSAL top-k-per-key idiom
  *
  *   `row_number().over(partitionBy(keys).orderBy(s.desc, t)) <= k`
  *
  * (a Filter directly over a single-row_number Window after Spark's own
  * optimization, including the InferWindowGroupLimit shape) into the
  * [[TopKPerKey]] logical operator, so UNCHANGED user window code gets
  * the bounded-buffer O(n·k) physical plan instead of a full per-key
  * sort. The rank attribute keeps its original exprId through a
  * restoring Project, so downstream references (casts, projections,
  * sorts) are untouched.
  *
  * Conservative by design — bails (returns the plan unchanged) unless:
  * exactly one window expression and it is `row_number()`; partition
  * keys are plain attributes; ordering is exactly (LongType DESC,
  * LongType ASC) — the engine's scaled-integer measure contract; and
  * the filter's rank conjunct is `rk <= k`, `rk < k+1` or `rk = 1`
  * with a positive literal. Non-rank conjuncts stay as a Filter above
  * the rewritten operator. The same nullability caveat as
  * [[TopKPerKey.ofDF]] applies (grouped integer measures).
  *
  * MEMORY GUARD: [[TopKPerKey]]'s physical buffer is
  * O(distinct-keys-per-partition × k) on heap with NO spill — safe for
  * grouped keys, an executor-OOM hazard for near-unique keys at scale.
  * The rule therefore only fires when the window input is an
  * `Aggregate` whose grouping keys INCLUDE every partition key
  * (directly or through a pass-through Project): in that shape the
  * operator's input is one row per group, so the buffer is bounded by
  * the already-aggregated input and can never exceed it. A
  * `row_number()<=k` over a raw fact table with near-unique keys keeps
  * Spark's spilling window sort.
  *
  * Register via `spark.experimental.extraOptimizations` (runtime) or
  * GraftExtensions (session builder).
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      tryRewrite(cond, w).getOrElse(f)
  }

  /** (rank-limit k) from one conjunct against the rank attribute. */
  private def rankLimit(e: Expression, rk: Attribute): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
      if a.exprId == rk.exprId && k > 0 => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k))
      if a.exprId == rk.exprId && k > 1 => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1))
      if a.exprId == rk.exprId => Some(1)
    case _ => None
  }

  private def tryRewrite(cond: Expression, w: Window): Option[LogicalPlan] =
    w match {
      case Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
          parts, Seq(SortOrder(s: AttributeReference, Descending, _, _),
            SortOrder(t: AttributeReference, Ascending, _, _)), wchild, _)
          if parts.forall(_.isInstanceOf[AttributeReference]) &&
            s.dataType == LongType && t.dataType == LongType =>
        val rkAttr = alias.toAttribute
        val conjuncts = splitConjuncts(cond)
        val hits = conjuncts.flatMap(c => rankLimit(c, rkAttr).map(c -> _))
        // Spark's InferWindowGroupLimit may already sit below the
        // Window — our operator subsumes it, plan from its child
        val input = wchild match {
          case WindowGroupLimit(_, _, _, _, inner) => inner
          case other => other
        }
        val partIds = parts.collect { case a: AttributeReference => a.exprId }.toSet
        hits.headOption.filter(_ => aggregateCoversKeys(input, partIds))
          .map { case (rankConjunct, k) =>
          val rkLong = AttributeReference("rk", LongType, nullable = false)()
          val topk = TopKPerKey(parts.map(_.asInstanceOf[AttributeReference]),
            s, t, k, input, rkLong)
          // restore the original rank attribute (IntegerType, original
          // exprId) so every downstream reference keeps resolving
          val restored: LogicalPlan = Project(
            input.output :+ Alias(Cast(rkLong, IntegerType), rkAttr.name)(
              exprId = rkAttr.exprId),
            topk)
          val rest = conjuncts.filterNot(_ eq rankConjunct)
          if (rest.isEmpty) restored
          else Filter(rest.reduce(And), restored)
        }
      case _ => None
    }

  /** True iff `plan` is an Aggregate (possibly under a pass-through /
    * renaming Project) whose grouping keys include every window
    * partition key — the shape where the no-spill TopKPerKey buffer is
    * structurally bounded by its (already aggregated) input. Anything
    * else — in particular a raw scan with near-unique keys — bails. */
  private def aggregateCoversKeys(plan: LogicalPlan,
      partIds: Set[ExprId]): Boolean = plan match {
    case agg: Aggregate =>
      val groupingIds = agg.groupingExpressions
        .collect { case a: Attribute => a.exprId }.toSet
      // a pass-through grouping column keeps its exprId in the output;
      // an Alias over one exposes a new exprId mapping back to it
      val exposed = agg.aggregateExpressions.collect {
        case a: Attribute if groupingIds.contains(a.exprId) => a.exprId
        case al @ Alias(a: Attribute, _) if groupingIds.contains(a.exprId) =>
          al.exprId
      }.toSet
      partIds.subsetOf(exposed)
    case p: Project =>
      // map each partition key back through the projection, then
      // re-check against the Project's child
      val mapped = partIds.map { id =>
        p.projectList.collectFirst {
          case a: Attribute if a.exprId == id => a.exprId
          case al @ Alias(a: Attribute, _) if al.exprId == id => a.exprId
        }
      }
      if (mapped.exists(_.isEmpty)) false
      else aggregateCoversKeys(p.child, mapped.flatten)
    case _ => false
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
