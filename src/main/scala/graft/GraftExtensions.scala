package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, TopKDistinctLongs}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions at session build time, so a user can enable the whole
  * library with
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *
  * and call e.g. `SELECT graft_dot(a, b)` from plain SQL. The runtime
  * alternative (no session rebuild needed) is
  * graft.functions.Registry.ensure(spark).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_topk_vals"),
      new ExpressionInfo(classOf[TopKDistinctLongs].getName, "graft_topk_vals"),
      (exprs: Seq[Expression]) =>
        TopKDistinctLongs(exprs(0),
          exprs(1).eval(null).asInstanceOf[Number].intValue())
          .toAggregateExpression()))
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // rewrite `row_number().over(...) <= k` window top-k into the
    // bounded-buffer TopKPerKey operator (post-resolution batch; the
    // rule itself is conservative about when it fires)
    ext.injectOptimizerRule(_ => graft.plans.TopKWindowRewrite)
    // rewrite exact count(DISTINCT <integral>) into the two-level
    // bitmap aggregation (shuffle ships bitmaps, not raw ids)
    ext.injectOptimizerRule(_ => graft.plans.BitmapDistinctRewrite)
  }
}
