package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise SUM of fixed-dimension double vectors — the missing
  * built-in for distributed centroid recomputation (Lloyd's k-means,
  * PQ codebook means).
  *
  * Why not `posexplode → groupBy(key, dim) → avg → collect_list`:
  * that shape multiplies the aggregated row count by the vector
  * dimension (64× here) before the partial aggregate, pays a SECOND
  * shuffle to reassemble the per-dim means into an array, and burns a
  * sort (`array_sort`) per group. This aggregate does one hash probe
  * per INPUT ROW, carries one `dim+1`-slot buffer per group (count in
  * slot 0), and merges pointwise — commutative/associative partial
  * aggregation, so the map side combines before the only shuffle and
  * the shuffled bytes are |groups|·(dim+1)·8 regardless of input size.
  *
  * Float caveat: addition order differs from the exploded per-dim avg
  * (and run to run, as with any distributed float sum) — callers must
  * be rows-kind / approximate paths, never hash-gated e6-rounded
  * outputs. Consumers divide by their own `count(*)` column for the
  * mean.
  *
  * Vectors must share one dimension per group (enforced); nulls are
  * skipped like built-in sum.
  */
case class VecSumDoubles(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vec_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_sum requires ARRAY<DOUBLE> input, got ${other.catalogString}")
  }

  /** slot 0 = row count, slots 1..dim = element sums; length 1 = "no
    * rows seen yet" (dimension unknown until the first input). */
  override def createAggregationBuffer(): Array[Double] = Array(0.0)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = if (buf.length == 1) new Array[Double](n + 1) else buf
    require(b.length == n + 1,
      s"graft_vec_sum: mixed dimensions in one group (${b.length - 1} vs $n)")
    b(0) += 1.0
    var i = 0
    while (i < n) { b(i + 1) += arr.getDouble(i); i += 1 }
    b
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.length == 1) return buf
    if (buf.length == 1) return other.clone()
    require(buf.length == other.length,
      s"graft_vec_sum: mixed dimensions across partials (${buf.length - 1} vs ${other.length - 1})")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.length == 1) null
    else new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1, buf.length))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumDoubles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumDoubles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
