package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanShim}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** Custom AS-OF JOIN as a physical operator — the native form of the
  * time-series join kdb/QuestDB/Flink ship and Spark lacks: each left
  * row (key, id, t) matches the LAST right row of the same key strictly
  * before it in (t, id) order. The engine's declarative formulation
  * (Temporal.asofJoin: union-tag + running-last window) is the
  * composition path; this node is preference-order level (c) — a
  * BinaryNode + Strategy + BinaryExecNode — and produces bit-identical
  * results against the same DuckDB oracle.
  *
  * Physical contract: both children hash-cluster on the key
  * (`requiredChildDistribution`) and sort (key, t, id)
  * (`requiredChildOrdering`) — the planner inserts exactly one exchange
  * + sort per side, then `doExecute` streams the two sorted partitions
  * through a single-pass merge holding ONE (t, id) pair of state per
  * side: O(1) memory per partition, no window buffer, no JoinedRow
  * backtracking. At 100 TB this is the sort-merge-join cost model with
  * a constant-memory probe instead of a hash table.
  *
  * Children are fixed-shape (key, id, t), all LongType — the engine's
  * scaled-integer convention; enforced at construction.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    out: Seq[AttributeReference], outer: Boolean = false) extends BinaryNode {
  require(left.output.size == 3 && right.output.size == 3 &&
    (left.output ++ right.output).forall(_.dataType == LongType),
    s"AsOfJoin children must be (key, id, t), all LongType; got " +
      s"left=${left.output.map(a => s"${a.name}:${a.dataType}")} " +
      s"right=${right.output.map(a => s"${a.name}:${a.dataType}")}")
  override def output: Seq[Attribute] = out
  override def producedAttributes: AttributeSet = AttributeSet(out)
  // the merge consumes every child column — without this, ColumnPruning
  // sees zero references from this node and prunes the children empty
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    out: Seq[Attribute], outer: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] = out
  override def producedAttributes: AttributeSet = AttributeSet(out)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(left.output.head)) ::
      ClusteredDistribution(Seq(right.output.head)) :: Nil

  // (key, t, id) per side: the merge below is single-pass BECAUSE the
  // planner guarantees this ordering (inserting sorts only when the
  // child is not already sorted)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(left.output(0), Ascending),
      SortOrder(left.output(2), Ascending),
      SortOrder(left.output(1), Ascending)),
    Seq(SortOrder(right.output(0), Ascending),
      SortOrder(right.output(2), Ascending),
      SortOrder(right.output(1), Ascending)))

  // rows leave clustered by the key VALUE exactly as the left exchange
  // hashed them — advertise that on OUR key attribute (the child's
  // partitioning names child exprIds, invisible above this node), so a
  // downstream groupBy(key) legitimately skips its exchange
  override def outputPartitioning: Partitioning =
    left.outputPartitioning match {
      case p: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
        org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(
          Seq(out.head), p.numPartitions)
      case other =>
        org.apache.spark.sql.catalyst.plans.physical
          .UnknownPartitioning(other.numPartitions)
    }

  override protected def doExecute(): RDD[InternalRow] = {
    val outTypes = out.map(_.dataType).toArray
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outTypes)
      // sorted-iterator rows are REUSED by the sorter — extract the
      // three longs immediately, never hold a row reference
      var rValid = false
      var rKey = 0L; var rId = 0L; var rT = 0L
      def advanceRight(): Unit = {
        rValid = false
        while (!rValid && rIter.hasNext) {
          val r = rIter.next()
          if (!(r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2))) {
            rKey = r.getLong(0); rId = r.getLong(1); rT = r.getLong(2)
            rValid = true
          }
        }
      }
      advanceRight()
      var haveCur = false; var curKey = 0L
      var lastValid = false; var lastId = 0L; var lastT = 0L
      // SQL equi-join semantics: a NULL on either side never matches.
      // Spark sorts NULLS FIRST, so null right rows drain before any
      // real key and null left rows emit nothing.
      lIter.filterNot(l => l.isNullAt(0) || l.isNullAt(1) || l.isNullAt(2))
        .flatMap { l =>
        val lKey = l.getLong(0); val lId = l.getLong(1); val lT = l.getLong(2)
        if (!haveCur || lKey != curKey) {
          haveCur = true; curKey = lKey; lastValid = false
        }
        // consume right rows strictly before (lT, lId) for this key;
        // rows of smaller keys are skipped (no left rows want them)
        while (rValid && (rKey < lKey ||
            (rKey == lKey && (rT < lT || (rT == lT && rId < lId))))) {
          if (rKey == lKey) { lastValid = true; lastId = rId; lastT = rT }
          advanceRight()
        }
        // LEFT OUTER mode: an unmatched left row emits with NULL
        // matched columns (SQL left-join semantics) instead of
        // dropping — same O(1) state, one extra branch
        if (lastValid)
          Iterator.single(proj(
            InternalRow(lKey, lId, lT, lastId, lastT)): InternalRow)
        else if (outer)
          Iterator.single(proj(
            InternalRow(lKey, lId, lT, null, null)): InternalRow)
        else Iterator.empty
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case a: AsOfJoin =>
      AsOfJoinExec(planLater(a.left), planLater(a.right), a.output,
        a.outer) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {
  /** As-of join two (key, id, t) LongType frames; output column names
    * are caller-chosen (left id/t names, then matched right id/t).
    * `outer = true` = LEFT OUTER semantics: unmatched left rows emit
    * with NULL matched columns (and those two attributes become
    * nullable in the output schema). */
  def ofDF(leftDf: DataFrame, rightDf: DataFrame,
      outNames: Seq[String], outer: Boolean = false): DataFrame = {
    require(outNames.size == 5, "outNames = (key, lId, lT, rId, rT)")
    val spark = leftDf.sparkSession
    ensureStrategy(spark)
    val out = outNames.zipWithIndex.map { case (n, i) =>
      AttributeReference(n, LongType, nullable = outer && i >= 3)()
    }
    GraftPlanShim.ofRows(spark,
      AsOfJoin(leftDf.queryExecution.analyzed,
        rightDf.queryExecution.analyzed, out, outer))
  }

  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
}
