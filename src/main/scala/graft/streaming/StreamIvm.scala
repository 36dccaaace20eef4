package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

case class IvmChange(pk: String, event_type: String, event_id: Long, us: Long,
    value_c: Long)
case class IvmDelta(event_type: String, d_count: Long, d_sum_c: Long)
case class IvmView(event_type: String, view_count: Long, view_sum_c: Long)

/** Stage 1 of the LIVE incremental view (§2#212): keyed by the logical
  * PK, holds the PK's last applied (us, event_id, value) and folds each
  * micro-batch's changes into ONE delta row — (+1, +v) when the PK
  * first appears, (0, v_new − v_old) after. The streaming twin of the
  * batch `cdc_incremental_view` lag: the "previous version" lives in
  * ValueState instead of a window frame.
  *
  * Cross-batch ordering: within a batch rows apply in (us, event_id)
  * order; ACROSS batches the state remembers the last applied
  * (us, event_id), and any later-arriving change at or below that
  * point is DROPPED — a stale version must never overwrite a newer
  * one, so the final state equals the batch `cdc_incremental_view`
  * ledger under ANY batch slicing of the history, including
  * out-of-order slicings (pinned by StreamIvmSpec). This matches the
  * batch twin, whose lag window orders globally by (us, event_id).
  * State per PK: three longs. */
class IvmDeltaProcessor
    extends StatefulProcessor[String, IvmChange, IvmDelta] {

  // (last applied us, event_id, value)
  @transient private var last: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[(Long, Long, Long)](
      "last", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[IvmChange],
      timerValues: TimerValues): Iterator[IvmDelta] = {
    val existed = last.exists()
    val (pUs, pId, prev) = if (existed) last.get() else (Long.MinValue, Long.MinValue, 0L)
    val fresh = rows
      .filter(c => c.us > pUs || (c.us == pUs && c.event_id > pId))
      .toSeq.sortBy(c => (c.us, c.event_id))
    if (fresh.isEmpty) return Iterator.empty
    val fin = fresh.last
    last.update((fin.us, fin.event_id, fin.value_c))
    Iterator.single(IvmDelta(fin.event_type,
      if (existed) 0L else 1L, fin.value_c - prev))
  }
}

/** Stage 2: keyed by the view's GROUP BY column, adds the deltas into
  * the persisted aggregate and emits the updated view row — the
  * materialized view itself, maintained without ever re-reading
  * state. State per group: two longs. */
class IvmViewProcessor
    extends StatefulProcessor[String, IvmDelta, IvmView] {

  @transient private var agg: ValueState[IvmView] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    agg = getHandle.getValueState[IvmView](
      "agg", Encoders.product[IvmView], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[IvmDelta],
      timerValues: TimerValues): Iterator[IvmView] = {
    val ds = rows.toSeq
    if (ds.isEmpty) return Iterator.empty
    val prev = if (agg.exists()) agg.get() else IvmView(key, 0L, 0L)
    val next = IvmView(key,
      prev.view_count + ds.map(_.d_count).sum,
      prev.view_sum_c + ds.map(_.d_sum_c).sum)
    agg.update(next)
    Iterator.single(next)
  }
}

/** LIVE INCREMENTAL VIEW MAINTENANCE — the streaming twin of the batch
  * `cdc_incremental_view` (§2#211): two chained `transformWithState`
  * operators, PK-keyed delta extraction then group-keyed view fold.
  * Each change is touched exactly once; the view is exact after every
  * micro-batch regardless of how history was sliced into batches
  * (pinned by StreamIvmSpec against the batch ledger). Shuffles: one
  * exchange per stage, on the PK then on the group key — the same two
  * keys the batch plan shuffles on. */
object StreamIvm {
  def views(changes: DataFrame)(implicit spark: SparkSession)
      : Dataset[IvmView] = {
    import spark.implicits._
    changes
      .select(concat_ws("\u0000", col("user_id"), col("event_type")).as("pk"),
        col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        graft.functions.Fns.cents(col("value")).as("value_c"))
      .as[IvmChange]
      .groupByKey(_.pk)
      .transformWithState(new IvmDeltaProcessor,
        TimeMode.None(), OutputMode.Update())
      .groupByKey(_.event_type)
      .transformWithState(new IvmViewProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
