package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** The per-group exact distinct count after a micro-batch. */
case class DistinctCount(group: String, n_distinct: Long)

/** §2#173 STREAMING EXACT DISTINCT COUNT — the live twin of
  * `q_bitmap_distinct` (§2#168) and the exact counterpart of a
  * streaming HLL: per group, membership lives in ADAPTIVE containers
  * keyed by `floorDiv(item, 32768)` on the MAP-shaped state slot (the
  * roaring-bitmap two-container recipe):
  *
  *   - SPARSE bucket (< 2048 members): a sorted u16 position array,
  *     2 bytes per member — a bucket with one member costs 2 bytes,
  *     so a sparse/hashed id universe (each item alone in its bucket)
  *     costs O(items), not 4 KB per item;
  *   - DENSE bucket (≥ 2048 members): a 4 KB bitmap — cost capped at
  *     4 KB no matter how full the 32768-id range gets.
  *
  * The two encodings are unambiguous by payload length alone: arrays
  * hold ≤ 2047 entries (≤ 4094 bytes), bitmaps are exactly 4096 bytes.
  * Worst-case state is therefore min(2·n_distinct, id_range/8) bytes
  * per group — bounded by the smaller of the stream's distinct count
  * and the ID UNIVERSE (when the universe itself is unbounded, the
  * approximate rung is an HLL sketch in ValueState — this operator is
  * the exact rung below it).
  *
  * Mechanics per batch: touched buckets load once into a local map,
  * members added for unseen items (each increments the running total
  * in ValueState; an array container crossing 2048 converts to a
  * bitmap), dirty buckets write back, and the group emits its new
  * total ONLY when it changed (Update-mode friendly: a batch of pure
  * redeliveries emits nothing). MapState means a batch pays RocksDB
  * I/O only for the buckets it touches — never a full scan of the
  * group's container set. */
class BitmapDistinctProcessor
    extends StatefulProcessor[String, ItemEvent, DistinctCount] {

  import BitmapDistinctProcessor._

  @transient private var buckets: MapState[Long, Array[Byte]] = _
  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buckets = getHandle.getMapState[Long, Array[Byte]](
      "buckets", Encoders.scalaLong, Encoders.BINARY, TTLConfig.NONE)
    total = getHandle.getValueState[Long](
      "total", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[ItemEvent],
      timerValues: TimerValues): Iterator[DistinctCount] = {
    val touched = scala.collection.mutable.HashMap.empty[Long, Container]
    val dirty = scala.collection.mutable.HashSet.empty[Long]
    var added = 0L
    rows.foreach { r =>
      val bucket = Math.floorDiv(r.item, 32768L)
      val pos = Math.floorMod(r.item, 32768L).toInt
      val c = touched.getOrElseUpdate(bucket,
        if (buckets.containsKey(bucket)) decode(buckets.getValue(bucket))
        else new SparseContainer(scala.collection.mutable.TreeSet.empty[Int]))
      val next = c.add(pos) // may be a dense replacement of a full sparse
      touched(bucket) = next
      if (next.justAdded) { dirty += bucket; added += 1 }
    }
    dirty.foreach(b => buckets.updateValue(b, touched(b).encode))
    if (added == 0) Iterator.empty
    else {
      val t = (if (total.exists()) total.get() else 0L) + added
      total.update(t)
      Iterator.single(DistinctCount(key, t))
    }
  }
}

object BitmapDistinctProcessor {
  /** Array container holds at most this many positions; one more
    * converts it to a bitmap. 2047 (not 2048) keeps array payloads
    * ≤ 4094 bytes — never equal to the bitmap's 4096, so the decoder
    * distinguishes the encodings by length alone. */
  private[streaming] val sparseMax = 2047

  private[streaming] sealed trait Container {
    /** Whether the most recent [[add]] inserted a new member. */
    var justAdded: Boolean = false
    /** Add `pos`; returns the container to keep (a sparse container
      * crossing [[sparseMax]] returns its dense replacement). */
    def add(pos: Int): Container
    def encode: Array[Byte]
  }

  private[streaming] final class SparseContainer(
      val members: scala.collection.mutable.TreeSet[Int]) extends Container {
    def add(pos: Int): Container = {
      justAdded = members.add(pos)
      if (justAdded && members.size > sparseMax) {
        val dense = new DenseContainer(new Array[Byte](4096))
        members.foreach(dense.set)
        dense.justAdded = true
        dense
      } else this
    }
    def encode: Array[Byte] = {
      val out = new Array[Byte](2 * members.size)
      var i = 0
      members.foreach { p =>
        out(i) = (p >> 8).toByte; out(i + 1) = p.toByte; i += 2
      }
      out
    }
  }

  private[streaming] final class DenseContainer(val bits: Array[Byte])
      extends Container {
    private[BitmapDistinctProcessor] def set(pos: Int): Unit = {
      val b = (1 << (pos & 7)).toByte
      bits(pos >> 3) = (bits(pos >> 3) | b).toByte
    }
    def add(pos: Int): Container = {
      val byteIdx = pos >> 3
      val bit = (1 << (pos & 7)).toByte
      justAdded = (bits(byteIdx) & bit) == 0
      if (justAdded) bits(byteIdx) = (bits(byteIdx) | bit).toByte
      this
    }
    def encode: Array[Byte] = bits
  }

  private[streaming] def decode(payload: Array[Byte]): Container =
    if (payload.length == 4096) new DenseContainer(payload)
    else {
      val s = scala.collection.mutable.TreeSet.empty[Int]
      var i = 0
      while (i < payload.length) {
        s.add(((payload(i) & 0xff) << 8) | (payload(i + 1) & 0xff))
        i += 2
      }
      new SparseContainer(s)
    }
}

object StreamDistinct {
  /** Exact per-group distinct counts, emitted only when they change. */
  def counts(events: Dataset[ItemEvent])
      (implicit spark: SparkSession): Dataset[DistinctCount] = {
    import spark.implicits._
    events.groupByKey(_.group)
      .transformWithState(new BitmapDistinctProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
