package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

case class LedgerEvent(user_id: Long, event_id: Long, us: Long, value_c: Long)
case class LedgerUpdate(user_id: Long, last_event_id: Long, n_events: Long,
    balance_c: Long)

/** Per-user running balance on Spark 4's `transformWithState` — the
  * arbitrary-state API that supersedes `mapGroupsWithState` (typed
  * named state slots from a `StatefulProcessorHandle`, RocksDB-backed,
  * TTL-able, timer support). State per key is ONE LedgerUpdate row —
  * the streaming twin of the batch `ts_running_total` (§2#80): each
  * micro-batch folds its events into the persisted balance and emits
  * the updated row in Update mode.
  *
  * Scale: state is O(active users) regardless of stream length, lives
  * in the executor-local RocksDB store (required by this API), and the
  * shuffle key is user_id — the same partitioning every stateful op in
  * the pipeline reuses. */
class RunningBalanceProcessor
    extends StatefulProcessor[Long, LedgerEvent, LedgerUpdate] {

  @transient private var balance: ValueState[LedgerUpdate] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    balance = getHandle.getValueState[LedgerUpdate](
      "balance", Encoders.product[LedgerUpdate], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[LedgerEvent],
      timerValues: TimerValues): Iterator[LedgerUpdate] = {
    val sorted = rows.toSeq.sortBy(e => (e.us, e.event_id))
    if (sorted.isEmpty) Iterator.empty
    else {
      val prev =
        if (balance.exists()) balance.get() else LedgerUpdate(key, -1L, 0L, 0L)
      val next = sorted.foldLeft(prev) { (acc, e) =>
        LedgerUpdate(key, e.event_id, acc.n_events + 1, acc.balance_c + e.value_c)
      }
      balance.update(next)
      Iterator.single(next)
    }
  }
}

object RunningBalance {
  /** §2#85: one updated balance row per user per micro-batch. */
  def updates(events: Dataset[LedgerEvent])
      (implicit spark: SparkSession): Dataset[LedgerUpdate] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningBalanceProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}

case class RecentWindow(user_id: Long, n_in_window: Long, recent_ids: String)

/** Bounded per-key event ring on `ListState` — the list-shaped state
  * slot of the arbitrary-state API (ValueState: RunningBalance; timers:
  * TimerSessions). Keeps each user's LAST `n` event ids across
  * micro-batches: append the batch, trim to the tail — the
  * recent-activity feature window every personalization pipeline
  * maintains. State per key is EXACTLY n ids however long the stream
  * runs. */
class RecentEventsProcessor(n: Int)
    extends StatefulProcessor[Long, LedgerEvent, RecentWindow] {

  @transient private var recent: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    recent = getHandle.getListState[Long](
      "recent", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[LedgerEvent],
      timerValues: TimerValues): Iterator[RecentWindow] = {
    val incoming = rows.toSeq.sortBy(e => (e.us, e.event_id)).map(_.event_id)
    if (incoming.isEmpty) return Iterator.empty
    val merged = (recent.get().toSeq ++ incoming).takeRight(n)
    recent.put(merged.toArray)
    Iterator.single(RecentWindow(key, merged.length.toLong, merged.mkString(",")))
  }
}

object RecentEvents {
  /** §2#117: the last `n` event ids per user, maintained across
    * micro-batches in ListState. */
  def windows(events: Dataset[LedgerEvent], n: Int = 5)
      (implicit spark: SparkSession): Dataset[RecentWindow] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RecentEventsProcessor(n),
        TimeMode.None(), OutputMode.Update())
  }
}

case class TypedCount(user_id: Long, event_type: String, n: Long)
case class TypedEventIn(user_id: Long, event_type: String, event_id: Long)

/** Per-(key, sub-key) counters on `MapState` — the map-shaped slot that
  * completes the arbitrary-state quartet (ValueState: RunningBalance,
  * ListState: RecentEvents, timers: TimerSessions). One map per user,
  * one entry per event_type seen: the streaming twin of a two-level
  * groupBy where only the OUTER key partitions the stream — sub-key
  * updates never reshuffle, they mutate the local RocksDB map. */
class TypedCountsProcessor
    extends StatefulProcessor[Long, TypedEventIn, TypedCount] {

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long](
      "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TypedEventIn],
      timerValues: TimerValues): Iterator[TypedCount] = {
    val touched = scala.collection.mutable.LinkedHashSet.empty[String]
    rows.foreach { e =>
      val cur = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
      counts.updateValue(e.event_type, cur + 1L)
      touched += e.event_type
    }
    touched.iterator.map(t => TypedCount(key, t, counts.getValue(t)))
  }
}

object TypedCounts {
  /** §2#118: per-user per-type running counts in MapState; emits only
    * the (user, type) pairs touched by the micro-batch. */
  def counts(events: Dataset[TypedEventIn])
      (implicit spark: SparkSession): Dataset[TypedCount] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TypedCountsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
