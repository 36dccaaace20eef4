package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count–Min sketch aggregate (Cormode & Muthukrishnan 2005) over long
  * keys, with the query keys baked into the call: eval returns
  * `est_0,est_1,...,est_{q-1};N` — the sketch's frequency estimate for
  * each requested key plus the total stream count.
  *
  * The buffer is a FIXED d×w counter grid (d=4 rows × w=1024 long
  * counters = 32 KiB) regardless of stream size or cardinality:
  * update is d counter increments, merge is pointwise sum —
  * commutative and associative, so the result is DETERMINISTIC for a
  * given multiset on any partitioning (unlike arrival-order-dependent
  * summaries such as space-saving / Misra–Gries, which is why this
  * sketch was chosen). Guarantees: never underestimates;
  * overestimates by more than e·N/w with probability ≤ e^-d.
  *
  * Hashes are fixed multiply-shift functions of the key (seeded per
  * row) — no stored model, reproducible on any cluster.
  */
case class CountMinLongs(
    child: Expression,
    queryKeys: Seq[Long],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val d = 4
  private val w = 1024
  // fixed odd multipliers (Knuth-style multiplicative hashing per row)
  private val seeds = Array(0x9E3779B97F4A7C15L, 0xC2B2AE3D27D4EB4FL,
    0x165667B19E3779F9L, 0x27D4EB2F165667C5L)

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_countmin"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_countmin requires BIGINT input, got ${child.dataType.catalogString}")

  /** cells 0..d*w-1 are the grid; the last slot carries N. */
  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w + 1)

  private def cell(row: Int, key: Long): Int = {
    val h = (key * seeds(row)) ^ (key >>> 31)
    row * w + math.floorMod(h, w.toLong).toInt
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      var i = 0
      while (i < d) { buf(cell(i, k)) += 1; i += 1 }
      buf(d * w) += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val sb = new StringBuilder
    queryKeys.foreach { k =>
      var est = Long.MaxValue
      var i = 0
      while (i < d) { est = math.min(est, buf(cell(i, k))); i += 1 }
      if (sb.nonEmpty) sb.append(',')
      sb.append(est)
    }
    sb.append(';').append(buf(d * w))
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(d * w + 1)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
