package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrites exact `count(DISTINCT <integral col>)`
  * aggregates into the two-level BITMAP plan (the same shape
  * `q_bitmap_distinct` §2#168 hand-writes), so UNCHANGED user queries
  * get bitmap shuffles automatically:
  *
  *   Aggregate(g, count(DISTINCT x))
  *     ⇒ Aggregate(g, coalesce(sum(bitmap_count(bm)), 0))
  *          over Aggregate(g + bitmap_bucket_number(x),
  *                         bm = bitmap_construct_agg(bitmap_bit_position(x)))
  *
  * Why: Spark plans single-distinct aggregates as TWO shuffles of the
  * DISTINCT (group, x) pairs — at 100 TB of near-unique ids that is a
  * full id shuffle. The bitmap plan's first aggregate is map-side
  * combinable into ≤4 KB bitmaps per (group, bucket), so shuffle bytes
  * scale with |groups|×|id-range/32768|, independent of row count.
  *
  * Exactness incl. NULLs is oracle-checked: `bitmap_construct_agg`
  * skips null positions and returns a zero bitmap for an all-null
  * group, so groups keep their 0 rows exactly like count(DISTINCT);
  * the `coalesce(..., 0)` covers the one remaining seam — a GLOBAL
  * aggregate over zero rows, where sum yields NULL but count yields 0.
  *
  * Conservative by design — fires only when: every grouping expression
  * is a plain attribute; exactly ONE aggregate appears and it is an
  * unfiltered `count(DISTINCT x)` on a single Int/Long attribute; every
  * other output column is a grouping attribute. Mixed aggregate lists
  * (sum + distinct), string/decimal ids, count(DISTINCT a, b), and
  * FILTER clauses keep Spark's own planning. The bitmap expressions
  * are RuntimeReplaceable, and this rule runs after ReplaceExpressions
  * — so it emits their `.replacement` directly.
  *
  * Register via [[ensure]] (`spark.experimental.extraOptimizations`)
  * or GraftExtensions. */
object BitmapDistinctRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
  }

  /** The one aggregate output this rule handles: an alias of an
    * unfiltered single-column integral count(DISTINCT). */
  private def countDistinctTarget(e: NamedExpression)
      : Option[(Alias, AttributeReference)] = e match {
    case al @ Alias(AggregateExpression(
        Count(Seq(x: AttributeReference)), Complete, true, None, _), _)
        if x.dataType == LongType || x.dataType == IntegerType =>
      Some((al, x))
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val groupAttrs = agg.groupingExpressions.collect { case a: AttributeReference => a }
    if (groupAttrs.length != agg.groupingExpressions.length) return None
    val groupIds = groupAttrs.map(_.exprId).toSet

    val targets = agg.aggregateExpressions.flatMap(countDistinctTarget)
    // exactly one count(DISTINCT), all other outputs plain group attrs,
    // and no other aggregate function hiding anywhere
    val rest = agg.aggregateExpressions.filter(countDistinctTarget(_).isEmpty)
    val restAreGroupRefs = rest.forall {
      case a: AttributeReference => groupIds.contains(a.exprId)
      case _ => false
    }
    if (targets.length != 1 || !restAreGroupRefs) return None
    val (alias, xRaw) = targets.head

    // the bitmap expressions declare inputTypes Seq(LongType) and this
    // rule runs AFTER the analyzer — its ImplicitCastInputTypes pass
    // will not come back around, so an IntegerType id must be cast
    // here or the plan goes unresolved at validation
    val x: Expression =
      if (xRaw.dataType == IntegerType) Cast(xRaw, LongType) else xRaw

    // inner: group by (groups, bucket(x)); emit groups + the bitmap.
    // RuntimeReplaceable wrappers are already past their rewrite batch
    // — emit the replacements themselves.
    val bucket = BitmapBucketNumber(x).replacement
    val position = BitmapBitPosition(x).replacement
    val bmAlias = Alias(
      BitmapConstructAgg(position).toAggregateExpression(), "graft_bm")()
    val inner = Aggregate(
      (groupAttrs: Seq[Expression]) :+ bucket,
      (groupAttrs: Seq[NamedExpression]) :+ bmAlias,
      agg.child, None)

    // outer: original grouping; count(DISTINCT) becomes Σ bitmap_count,
    // keeping the ORIGINAL name and exprId so parent references resolve
    val total = Coalesce(Seq(
      Sum(BitmapCount(bmAlias.toAttribute).replacement).toAggregateExpression(),
      Literal(0L)))
    val rewrittenOutputs = agg.aggregateExpressions.map { ne =>
      if (countDistinctTarget(ne).isDefined)
        Alias(total, alias.name)(exprId = alias.exprId,
          qualifier = alias.qualifier, explicitMetadata = Some(alias.metadata))
      else ne
    }
    Some(Aggregate(groupAttrs, rewrittenOutputs, inner, None))
  }

  /** Idempotently activate on a live session (runtime twin of the
    * GraftExtensions registration). */
  def ensure(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(BitmapDistinctRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BitmapDistinctRewrite
    }
}
