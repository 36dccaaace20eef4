package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** The per-group exact distinct count after a micro-batch. */
case class DistinctCount(group: String, n_distinct: Long)

/** §2#173 STREAMING EXACT DISTINCT COUNT — the live twin of
  * `q_bitmap_distinct` (§2#168) and the exact counterpart of a
  * streaming HLL: per group, membership lives in 4 KB bucket bitmaps
  * keyed by `floorDiv(item, 32768)` on the MAP-shaped state slot, so
  * state is O(occupied-id-range / 32768) bitmaps per group — bounded
  * by the ID UNIVERSE, not the stream length (the dashboard
  * "distinct users ever" counter; when the universe itself is
  * unbounded, the approximate rung is an HLL sketch in ValueState —
  * this operator is the exact rung below it).
  *
  * Mechanics per batch: touched buckets load once into a local map,
  * bits set for unseen items (each new bit increments the running
  * total in ValueState), dirty buckets write back, and the group emits
  * its new total ONLY when it changed (Update-mode friendly: a batch
  * of pure redeliveries emits nothing). MapState means a batch pays
  * RocksDB I/O only for the buckets it touches — never a full scan of
  * the group's bitmap set. */
class BitmapDistinctProcessor
    extends StatefulProcessor[String, ItemEvent, DistinctCount] {

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
    val touched = scala.collection.mutable.HashMap.empty[Long, Array[Byte]]
    val dirty = scala.collection.mutable.HashSet.empty[Long]
    var added = 0L
    rows.foreach { r =>
      val bucket = Math.floorDiv(r.item, 32768L)
      val pos = Math.floorMod(r.item, 32768L).toInt
      val bm = touched.getOrElseUpdate(bucket,
        if (buckets.containsKey(bucket)) buckets.getValue(bucket)
        else new Array[Byte](4096))
      val byteIdx = pos >> 3
      val bit = (1 << (pos & 7)).toByte
      if ((bm(byteIdx) & bit) == 0) {
        bm(byteIdx) = (bm(byteIdx) | bit).toByte
        dirty += bucket
        added += 1
      }
    }
    dirty.foreach(b => buckets.updateValue(b, touched(b)))
    if (added == 0) Iterator.empty
    else {
      val t = (if (total.exists()) total.get() else 0L) + added
      total.update(t)
      Iterator.single(DistinctCount(key, t))
    }
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
