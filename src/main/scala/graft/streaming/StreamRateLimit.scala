package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** One keyed event competing for admission (key = e.g. a tenant, a
  * source crawler, an API client). */
case class RateEvent(key: String, event_id: Long, ts: Timestamp)

/** The admission verdict: admitted ⇔ a token was available;
  * `tokens_m` is the bucket's fill AFTER this event in milli-tokens
  * (observability — alerting reads sustained 0 as throttling). */
case class RateVerdict(key: String, event_id: Long, admitted: Boolean,
    tokens_m: Long)

/** §2#230 STREAMING RATE LIMITING — the per-key token bucket every
  * ingestion edge needs (a runaway crawler or a hot tenant must not
  * starve the pipeline; the reference's single-feed relay has no
  * tenancy, but a multi-source ingest does): capacity `capacity`
  * tokens per key, refilled at `ratePerSec` tokens per second of
  * EVENT time, one token per admitted event.
  *
  * Deterministic by construction — replays and retries must produce
  * the SAME verdicts, so the bucket advances on event time, never on
  * processing-time clocks:
  *   - within a batch, a key's rows apply in (ts, event_id) order
  *     (group-iterator order is retry-dependent, the sort is not);
  *   - refill is integer milli-tokens: `Δms · ratePerSec` exactly
  *     (milli-tokens per ms = tokens per second), capped at capacity;
  *   - regressing timestamps refill nothing (effective time is the
  *     running max — a replayed old event can't mint tokens).
  *
  * State per key: two longs (last effective event-time ms, fill in
  * milli-tokens) — O(keys) total, the shuffle key is the bucket key,
  * so admission is single-writer per key. The batch twin is a
  * windowed count cap; this is the form that holds a budget ACROSS
  * windows without boundary bursts. */
class RateLimitProcessor(capacity: Long, ratePerSec: Long)
    extends StatefulProcessor[String, RateEvent, RateVerdict] {
  require(capacity > 0 && ratePerSec > 0,
    s"bad bucket config: capacity=$capacity rate=$ratePerSec")

  @transient private var bucket: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    bucket = getHandle.getValueState[(Long, Long)](
      "bucket", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[RateEvent],
      timerValues: TimerValues): Iterator[RateVerdict] = {
    val capM = capacity * 1000L
    var (lastMs, fillM) =
      if (bucket.exists()) bucket.get()
      else (Long.MinValue, capM) // a fresh key starts with a full bucket
    val out = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
      val ms = e.ts.getTime
      if (lastMs == Long.MinValue) lastMs = ms
      if (ms > lastMs) {
        // refill without forming Δms·rate when it can only mean "full"
        // (an epoch-scale gap times a large rate overflows Long)
        val delta = ms - lastMs
        val toFull = (capM - fillM + ratePerSec - 1) / ratePerSec
        fillM = if (delta >= toFull) capM else fillM + delta * ratePerSec
        lastMs = ms
      }
      val admitted = fillM >= 1000L
      if (admitted) fillM -= 1000L
      RateVerdict(key, e.event_id, admitted, fillM)
    }
    bucket.update((lastMs, fillM))
    out.iterator
  }
}

object StreamRateLimit {
  /** Admission verdicts for a keyed event stream under a per-key
    * token bucket. */
  def admissions(events: Dataset[RateEvent], capacity: Long = 10L,
      ratePerSec: Long = 2L)(implicit spark: SparkSession)
      : Dataset[RateVerdict] = {
    import spark.implicits._
    events.groupByKey(_.key)
      .transformWithState(new RateLimitProcessor(capacity, ratePerSec),
        TimeMode.None(), OutputMode.Append())
  }
}
