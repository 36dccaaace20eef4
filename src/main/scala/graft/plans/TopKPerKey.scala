package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanShim, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, JoinedRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Custom whole-operator: top-k rows per key WITHOUT a full per-key
  * sort. Spark's `row_number().over(Window ...)` sorts every partition
  * end-to-end; at 100 TB that's a full sort of the fact table just to
  * keep 3 rows per key. This operator keeps a bounded k-slot buffer per
  * key (insertion into a tiny array), so the per-partition cost is
  * O(n·k) scan work instead of O(n log n) sort, and the only shuffle is
  * the hash partitioning by key that `requiredChildDistribution` asks
  * the planner to insert.
  *
  * Demonstrates level (c) of the operator preference order: a
  * LogicalPlan node + planner Strategy + physical UnaryExecNode,
  * activated via spark.experimental.extraStrategies (or
  * GraftExtensions).
  *
  * Ordering is sortCol DESC, tieCol ASC; both LongType (the engine's
  * deterministic scaled-integer measures). Output = child columns plus
  * a 1-based `rk` rank.
  *
  * MEMORY CONTRACT: both phases hold one k-row buffer per distinct key
  * per partition ON HEAP, with no spilling — memory is
  * O(distinct-keys-per-partition × k × rowSize). That is the point (a
  * sort spills because it must keep n rows; this keeps k per key), but
  * it assumes keys-per-partition × k rows fit in executor memory:
  * fine for grouped/rolled-up keys (suppliers, users, buckets), wrong
  * for near-unique keys. For key cardinality approaching row count use
  * the window variant (Analytics.qWindowTopk), whose sort spills.
  */
case class TopKPerKey(
    keys: Seq[Attribute],
    sortCol: Attribute,
    tieCol: Attribute,
    k: Int,
    child: LogicalPlan,
    rankAttr: AttributeReference) extends UnaryNode {
  // rankAttr is a constructor arg (not a val) so plan copies keep the
  // same exprId — otherwise every transform re-minted the attribute and
  // downstream references broke with ATTRIBUTE_NOT_FOUND
  require(sortCol.dataType == LongType && tieCol.dataType == LongType,
    "TopKPerKey sorts on a LongType measure + LongType tiebreak")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Shared bounded-buffer pass: scan a partition keeping the best ≤k
  * rows per key (sortCol DESC, tieCol ASC). O(n·k) with tiny constant —
  * no sort. */
private object BoundedTopK {
  def perKey(
      iter: Iterator[InternalRow],
      keyProj: InternalRow => InternalRow,
      sortIdx: Int, tieIdx: Int, kk: Int)
      : java.util.LinkedHashMap[InternalRow, java.util.ArrayList[InternalRow]] = {
    val buffers = new java.util.LinkedHashMap[InternalRow, java.util.ArrayList[InternalRow]]()
    iter.foreach { row =>
      val key = keyProj(row)
      var buf = buffers.get(key)
      if (buf == null) {
        buf = new java.util.ArrayList[InternalRow](kk + 1)
        buffers.put(key.copy(), buf)
      }
      val s = row.getLong(sortIdx)
      val t = row.getLong(tieIdx)
      val full = buf.size() == kk
      val skip = full && {
        val last = buf.get(kk - 1)
        val ls = last.getLong(sortIdx)
        s < ls || (s == ls && t > last.getLong(tieIdx))
      }
      if (!skip) {
        var i = buf.size()
        while (i > 0 && {
          val p = buf.get(i - 1)
          val ps = p.getLong(sortIdx)
          ps < s || (ps == s && p.getLong(tieIdx) > t)
        }) i -= 1
        buf.add(i, row.copy())
        if (buf.size() > kk) buf.remove(kk)
      }
    }
    buffers
  }
}

/** Map-side partial top-k (the combiner): runs BEFORE the shuffle with
  * no distribution requirement. A partition's local top-k per key is a
  * superset of that partition's contribution to the global top-k, so
  * the exchange ships ≤ partitions×keys×k rows instead of n. */
case class TopKPerKeyPartialExec(
    keys: Seq[Attribute],
    sortCol: Attribute,
    tieCol: Attribute,
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val sortIdx = childOutput.indexWhere(_.exprId == sortCol.exprId)
    val tieIdx = childOutput.indexWhere(_.exprId == tieCol.exprId)
    val keyExprs = keys
    val kk = k
    child.execute().mapPartitions { iter =>
      val keyProj = GenerateUnsafeProjection.generate(keyExprs, childOutput)
      val buffers = BoundedTopK.perKey(iter, keyProj(_), sortIdx, tieIdx, kk)
      import scala.jdk.CollectionConverters._
      buffers.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Final top-k per key: requires co-located keys (the planner inserts
  * the hash exchange), merges the partial winners and emits ranks. */
case class TopKPerKeyExec(
    keys: Seq[Attribute],
    sortCol: Attribute,
    tieCol: Attribute,
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val sortIdx = childOutput.indexWhere(_.exprId == sortCol.exprId)
    val tieIdx = childOutput.indexWhere(_.exprId == tieCol.exprId)
    val keyExprs = keys
    val kk = k
    val outTypes = output.map(_.dataType).toArray
    child.execute().mapPartitions { iter =>
      val keyProj = GenerateUnsafeProjection.generate(keyExprs, childOutput)
      val outProj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(outTypes)
      val buffers = BoundedTopK.perKey(iter, keyProj(_), sortIdx, tieIdx, kk)
      import scala.jdk.CollectionConverters._
      buffers.values().iterator().asScala.flatMap { buf =>
        buf.iterator().asScala.zipWithIndex.map { case (row, i) =>
          outProj(new JoinedRow(row, InternalRow(java.lang.Long.valueOf(i + 1L)))): InternalRow
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKey =>
      // two-phase: partial combiner below the exchange, final above
      TopKPerKeyExec(t.keys, t.sortCol, t.tieCol, t.k, t.rankAttr,
        TopKPerKeyPartialExec(t.keys, t.sortCol, t.tieCol, t.k,
          planLater(t.child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Wrap `df` in the custom operator (registers the strategy once). */
  def ofDF(df: DataFrame, keyCols: Seq[String], sortCol: String,
      tieCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column $n in ${plan.output.map(_.name)}"))
    GraftPlanShim.ofRows(spark,
      TopKPerKey(keyCols.map(attr), attr(sortCol), attr(tieCol), k, plan,
        AttributeReference("rk", LongType, nullable = false)()))
  }

  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
}
