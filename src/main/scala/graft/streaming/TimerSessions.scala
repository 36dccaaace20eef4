package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

case class TimedEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
case class TimerSession(user_id: Long, n_events: Long, start_us: Long,
    end_us: Long, closed_by: String)

/** Idle-session closing via EVENT-TIME TIMERS on `transformWithState` —
  * the timer half of Spark 4's arbitrary-state API (RunningBalance
  * covers typed ValueState; this covers `registerTimer` /
  * `handleExpiredTimer`). A session CLOSES and emits when the watermark
  * passes last-event + gap — driven by the TIMER, not by the arrival of
  * more data for that key, which is exactly what
  * `flatMapGroupsWithState` timeouts did and what a pure
  * handleInputRows design cannot do (an idle key would hold state
  * forever). In-batch gap splits still close inline.
  *
  * Scale: state per key is one small session row + one registered
  * timer; both live in the RocksDB store; timers fire in watermark
  * order with no per-key polling.
  */
class TimerSessionProcessor(gapUs: Long)
    extends StatefulProcessor[Long, TimedEvent, TimerSession] {

  @transient private var sess: ValueState[TimerSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[TimerSession](
      "session", Encoders.product[TimerSession], TTLConfig.NONE)

  private def tsUs(e: TimedEvent): Long = e.ts.getTime * 1000L

  override def handleInputRows(key: Long, rows: Iterator[TimedEvent],
      timerValues: TimerValues): Iterator[TimerSession] = {
    val sorted = rows.toSeq.sortBy(e => (tsUs(e), e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var out = List.empty[TimerSession]
    var cur = if (sess.exists()) Some(sess.get()) else None
    // working session for LATE stragglers (>gap before the stored
    // session's start — reachable only when the watermark delay exceeds
    // the gap): consecutive stragglers within gap of each other belong
    // to ONE session, so they accumulate here instead of each emitting
    // a singleton; sorted input means the group flushes at loop end (or
    // when a straggler arrives >gap after the previous one).
    var late: Option[TimerSession] = None
    sorted.foreach { e =>
      val us = tsUs(e)
      cur match {
        // merge iff within gap of the session INTERVAL [start_us, end_us]
        // (both comparisons are vacuously true when us falls inside it).
        // A cross-batch out-of-order event that is newer than the
        // watermark but older than the stored end_us must NOT regress
        // end_us (that would re-arm the timer early and emit a session
        // whose end is not the max event time) — clamp with max/min.
        case Some(s) if us - s.end_us <= gapUs && s.start_us - us <= gapUs =>
          cur = Some(s.copy(n_events = s.n_events + 1,
            start_us = math.min(s.start_us, us),
            end_us = math.max(s.end_us, us)))
        case Some(s) if us < s.start_us =>
          late match {
            case Some(l) if us - l.end_us <= gapUs =>
              late = Some(l.copy(n_events = l.n_events + 1,
                end_us = math.max(l.end_us, us)))
            case Some(l) =>
              out ::= l
              late = Some(TimerSession(key, 1L, us, us, "gap"))
            case None =>
              late = Some(TimerSession(key, 1L, us, us, "gap"))
          }
        case Some(s) => // in-batch gap split: close inline
          out ::= s.copy(closed_by = "gap")
          cur = Some(TimerSession(key, 1L, us, us, "open"))
        case None =>
          cur = Some(TimerSession(key, 1L, us, us, "open"))
      }
    }
    late.foreach(l => out ::= l) // flush the trailing straggler group
    cur.foreach { s =>
      sess.update(s)
      // one timer per key: re-arm at the new idle deadline
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer((s.end_us + gapUs) / 1000L)
    }
    out.reverseIterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[TimerSession] =
    if (sess.exists()) {
      val s = sess.get()
      sess.clear()
      Iterator.single(s.copy(closed_by = "timer"))
    } else Iterator.empty
}

object TimerSessions {
  /** §2#115: closed sessions (30-min idle gap), emitted by event-time
    * timer when the watermark passes the idle deadline. */
  def closed(events: Dataset[TimedEvent], gapUs: Long = 1800000000L)
      (implicit spark: SparkSession): Dataset[TimerSession] = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
