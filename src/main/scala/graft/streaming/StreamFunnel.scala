package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

case class FunnelEvent(user_id: Long, step: String, ts: Timestamp)

/** One finished journey: `outcome` is `completed` or
  * `expired_at_<step>` (the deadline for that step passed). */
case class FunnelOutcome(user_id: Long, outcome: String,
    signup_us: Long, last_us: Long, steps_reached: Long)

/** Journey state between batches: `stage` = steps completed so far
  * (1 = signup seen), −1 = journey completed (re-entry suppressed). */
case class FunnelState(stage: Long, signup_us: Long, last_us: Long)

/** §2#201 STREAMING WINDOWED FUNNEL — the live twin of
  * `q_funnel_windowed` (§2#195): per user, a state machine walks the
  * fixed step chain (signup → click → purchase) with a per-step
  * deadline, and EVENT-TIME TIMERS turn missed deadlines into
  * emitted `expired_at_<step>` outcomes the moment the watermark
  * passes them — the abandonment feed a growth dashboard alerts on,
  * which the batch funnel can only see in retrospect.
  *
  * Semantics (deterministic given batch contents):
  *  - events sort by (ts, step) inside a batch before folding, so
  *    retry-order never changes the machine;
  *  - a step advances the machine iff it is the NEXT expected step
  *    and lands in `(last_us, last_us + windowUs]` — the same greedy
  *    earliest-chain contract as the batch query;
  *  - completion emits once and parks the machine at a done marker:
  *    one user converts at most once (the batch count-distinct
  *    contract); a TTL on the state slot is the re-engagement lever;
  *  - a deadline expiry emits `expired_at_<next step>` and CLEARS the
  *    machine — the user's next signup starts a fresh journey (the
  *    one documented divergence from the batch query, which only ever
  *    considers the user's first chain).
  *
  * Scale: state is one 3-field row + one armed timer per in-flight
  * user — O(active journeys), not O(events); timers fire in watermark
  * order with no polling; the shuffle key is user_id, the same key
  * the sessionization family already uses. */
class FunnelProcessor(steps: Seq[String], windowUs: Long)
    extends StatefulProcessor[Long, FunnelEvent, FunnelOutcome] {
  require(steps.size >= 2, "a funnel needs at least two steps")

  @transient private var st: ValueState[FunnelState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[FunnelState](
      "journey", Encoders.product[FunnelState], TTLConfig.NONE)

  private def tsUs(e: FunnelEvent): Long = e.ts.getTime * 1000L

  override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
      timerValues: TimerValues): Iterator[FunnelOutcome] = {
    val sorted = rows.toSeq.sortBy(e => (tsUs(e), steps.indexOf(e.step)))
    var out = List.empty[FunnelOutcome]
    var cur = if (st.exists()) Some(st.get()) else None
    sorted.foreach { e =>
      val us = tsUs(e)
      cur match {
        case Some(s) if s.stage < 0 => () // completed: suppressed
        case None | Some(FunnelState(0, _, _)) if e.step == steps.head =>
          cur = Some(FunnelState(1L, us, us))
        case Some(s) if s.stage > 0 && s.stage < steps.size &&
            e.step == steps(s.stage.toInt) &&
            us > s.last_us && us <= s.last_us + windowUs =>
          val advanced = s.copy(stage = s.stage + 1, last_us = us)
          if (advanced.stage == steps.size) {
            out ::= FunnelOutcome(key, "completed", advanced.signup_us,
              us, steps.size.toLong)
            cur = Some(FunnelState(-1L, advanced.signup_us, us))
          } else cur = Some(advanced)
        case _ => () // wrong step, too late, or before the chain: ignored
      }
    }
    cur match {
      case Some(s) =>
        st.update(s)
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
        if (s.stage > 0 && s.stage < steps.size)
          getHandle.registerTimer((s.last_us + windowUs) / 1000L)
      case None => ()
    }
    out.reverseIterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[FunnelOutcome] =
    if (st.exists()) {
      val s = st.get()
      if (s.stage > 0 && s.stage < steps.size) {
        st.clear() // next signup starts a fresh journey
        Iterator.single(FunnelOutcome(key,
          s"expired_at_${steps(s.stage.toInt)}", s.signup_us, s.last_us,
          s.stage))
      } else Iterator.empty
    } else Iterator.empty
}

object StreamFunnel {
  /** Completed and expired journeys over an unbounded event stream. */
  def outcomes(events: Dataset[FunnelEvent],
      steps: Seq[String] = Seq("signup", "click", "purchase"),
      windowUs: Long = 86400000000L)
      (implicit spark: SparkSession): Dataset[FunnelOutcome] = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(steps, windowUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
