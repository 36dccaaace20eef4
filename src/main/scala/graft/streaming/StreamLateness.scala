package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One keyed arrival (key = a table / source partition — the grain a
  * watermark policy is tuned per). */
case class LateEvent(key: String, event_id: Long, ts: Timestamp)

/** One live histogram cell: `bucket` 0 = on time, b ≥ 1 = lateness in
  * [2^(b−1), 2^b) ms behind the key's running max event time;
  * `n_batch` = this batch's additions (the delta a consumer folds),
  * `n_total` = the running cell count, `worst_ms` = the key's worst
  * lateness ever (repeated on every emitted cell — observability, the
  * single number a lateness alert pages on). */
case class LatenessCell(key: String, bucket: Long, n_batch: Long,
    n_total: Long, worst_ms: Long)

/** §2#271 STREAMING LATENESS HISTOGRAM — the live twin of
  * `ts_lateness`, and the measurement a watermark delay is actually
  * CHOSEN from (Akidau et al., VLDB'15: the watermark trade-off is
  * read off the observed lateness distribution — too short drops
  * data, too long holds state): per key, the log₂ histogram of how far
  * behind the key's running-max event time each arrival lands.
  *
  * Deterministic by construction (the StreamOrderAudit contract):
  * within a batch a key's rows apply in event_id order — the
  * deterministic stand-in for arrival order, immune to retry-dependent
  * group-iterator order — and lateness compares against the running
  * max over everything APPLIED so far (prior batches included), so a
  * replay of the same batch sequence reproduces the same cells
  * bit-for-bit. No processing-time clock anywhere.
  *
  * Emission is DELTA-shaped (the StreamIvm idiom): only buckets
  * touched this batch emit, carrying both the batch delta and the
  * running total — ≤ 64 cells per key per batch, and a consumer
  * materializes the live histogram by last-total-wins per (key,
  * bucket).
  *
  * State per key: a SPARSE bucket map (≤ 64 entries — the
  * StreamQuantiles MapState idiom, RocksDB-friendly point updates) +
  * the running max event time + worst lateness. O(keys · 64), NEVER
  * O(rows); the 12th StreamBench op measures exactly that bound in
  * rows and bytes. */
class LatenessProcessor
    extends StatefulProcessor[String, LateEvent, LatenessCell] {

  @transient private var maxTs: ValueState[Long] = _
  @transient private var worst: ValueState[Long] = _
  @transient private var hist: MapState[Long, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    maxTs = getHandle.getValueState[Long]("maxTs", Encoders.scalaLong,
      TTLConfig.NONE)
    worst = getHandle.getValueState[Long]("worst", Encoders.scalaLong,
      TTLConfig.NONE)
    hist = getHandle.getMapState[Long, Long]("hist",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
  }

  /** bucket(late): 0 for on-time, else 1 + ⌊log₂ late⌋ capped at 63. */
  private def bucketOf(late: Long): Long =
    if (late <= 0L) 0L
    else math.min(63, 64 - java.lang.Long.numberOfLeadingZeros(late)).toLong

  override def handleInputRows(key: String, rows: Iterator[LateEvent],
      timerValues: TimerValues): Iterator[LatenessCell] = {
    var mx = if (maxTs.exists()) maxTs.get() else Long.MinValue
    var w = if (worst.exists()) worst.get() else 0L
    val delta = scala.collection.mutable.TreeMap.empty[Long, Long]
    rows.toArray.sortBy(_.event_id).foreach { e =>
      val ms = e.ts.getTime
      val late = if (mx == Long.MinValue) 0L else math.max(0L, mx - ms)
      delta.updateWith(bucketOf(late))(c => Some(c.getOrElse(0L) + 1L))
      if (late > w) w = late
      if (ms > mx) mx = ms
    }
    if (delta.isEmpty) return Iterator.empty
    maxTs.update(mx)
    worst.update(w)
    delta.iterator.map { case (b, d) =>
      val total = (if (hist.containsKey(b)) hist.getValue(b) else 0L) + d
      hist.updateValue(b, total)
      LatenessCell(key, b, d, total, w)
    }.toArray.iterator
  }
}

object StreamLateness {
  /** Live per-key lateness histogram cells for an arrival stream. */
  def cells(events: Dataset[LateEvent])(implicit spark: SparkSession)
      : Dataset[LatenessCell] = {
    import spark.implicits._
    events.groupByKey(_.key)
      .transformWithState(new LatenessProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
