package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One keyed monetary observation (key = a table / merchant / channel
  * — the grain a fraud alarm pages per). */
case class DigitEvent(key: String, event_id: Long, cents: Long)

/** The live Benford verdict after a batch: running observation count,
  * the digit whose observed ‰ deviates worst from the Benford
  * expectation, and that deviation — the one number a fraud-drift
  * alarm thresholds. */
case class DigitDrift(key: String, n_total: Long, worst_digit: Long,
    worst_dev_pm: Long)

/** §2#280 STREAMING BENFORD DRIFT — the live twin of `q_benford`
  * (Benford 1938 / Nigrini 1996): per key, maintain the leading-digit
  * counts of positive cent amounts and after every batch emit the
  * worst per-digit deviation from the Benford expectation in ‰.
  * Fabricated or systematically-priced flows drift the distribution
  * LIVE — this is the alarm that fires while the batch screen is
  * still a day away.
  *
  * Determinism is free here: digit counts are order-independent
  * (pure increments), so no within-batch sort is needed — any replay
  * or retry that delivers the same multiset of rows produces the
  * same verdicts. Ties on the worst deviation resolve to the
  * smallest digit. Non-positive amounts are skipped (no leading
  * digit), mirroring the batch op's `c > 0` filter.
  *
  * State per key: ≤9 digit counters (sparse MapState — the
  * StreamLateness idiom) + one total. O(keys·10), never O(rows);
  * 13th StreamBench op. */
class DigitDriftProcessor
    extends StatefulProcessor[String, DigitEvent, DigitDrift] {

  /** Rounded Benford ‰ for digits 1–9 (index 0 unused) — the same
    * literal table as q_benford's oracle. */
  private val expPm =
    Array(0L, 301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)

  @transient private var counts: MapState[Long, Long] = _
  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counts = getHandle.getMapState[Long, Long]("digits",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    total = getHandle.getValueState[Long]("total", Encoders.scalaLong,
      TTLConfig.NONE)
  }

  private def leadDigit(c: Long): Long = {
    var v = c
    while (v >= 10L) v /= 10L
    v
  }

  override def handleInputRows(key: String, rows: Iterator[DigitEvent],
      timerValues: TimerValues): Iterator[DigitDrift] = {
    val delta = new Array[Long](10)
    var added = 0L
    rows.foreach { e =>
      if (e.cents > 0L) {
        delta(leadDigit(e.cents).toInt) += 1L
        added += 1L
      }
    }
    if (added == 0L) return Iterator.empty
    val n = (if (total.exists()) total.get() else 0L) + added
    total.update(n)
    var d = 1
    val cur = new Array[Long](10)
    while (d <= 9) {
      val c = (if (counts.containsKey(d.toLong)) counts.getValue(d.toLong)
        else 0L) + delta(d)
      if (delta(d) > 0L) counts.updateValue(d.toLong, c)
      cur(d) = c
      d += 1
    }
    var worstDigit = 1L
    var worstDev = -1L
    d = 1
    while (d <= 9) {
      val dev = math.abs(1000L * cur(d) / n - expPm(d))
      if (dev > worstDev) { worstDev = dev; worstDigit = d.toLong }
      d += 1
    }
    Iterator.single(DigitDrift(key, n, worstDigit, worstDev))
  }
}

object StreamDigitDrift {
  /** Live per-key Benford drift verdicts for a monetary stream. */
  def drift(events: Dataset[DigitEvent])(implicit spark: SparkSession)
      : Dataset[DigitDrift] = {
    import spark.implicits._
    events.groupByKey(_.key)
      .transformWithState(new DigitDriftProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
