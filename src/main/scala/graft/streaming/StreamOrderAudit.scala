package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** One keyed change observed in commit order (event_id is the commit
  * sequence; ts is the payload's event time). */
case class AuditChange(key: String, event_id: Long, ts: Timestamp)

/** The running audit row for a key, emitted whenever a batch touches
  * it: changes seen, event-time inversions, worst regression, and the
  * per-mille of in-order steps. */
case class AuditRow(key: String, n_changes: Long, n_inversions: Long,
    max_regress_us: Long, ordered_pm: Long)

/** §2#244 STREAMING ORDER AUDIT — the live twin of the batch
  * `cdc_order_audit` (#237): while the batch op scores a finished
  * feed, this one maintains the per-key inversion counters AS THE
  * FEED FLOWS, so the "is my cursor-advance policy safe" signal
  * exists while there is still time to act on it (the reference
  * advances its cursor to the batch max event time — a key whose
  * event time regresses between consecutive commits re-delivers or
  * skips under that contract).
  *
  * Deterministic by construction: within a batch a key's changes
  * apply in (event_id, ts) order — commit order, exactly the batch
  * twin's walk — so replays reproduce the same counters regardless
  * of shuffle arrival order. State per key: four longs (last event
  * time, changes, inversions, worst regression) — O(keys); the
  * shuffle key is the audited key, single-writer per key. Emission
  * is one updated audit row per touched key per batch (update mode),
  * so a dashboard reads current totals without re-scanning. */
class OrderAuditProcessor
    extends StatefulProcessor[String, AuditChange, AuditRow] {

  @transient private var st: ValueState[(Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long, Long)](
      "audit", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[AuditChange],
      timerValues: TimerValues): Iterator[AuditRow] = {
    var (lastUs, n, inv, worst) =
      if (st.exists()) st.get() else (Long.MinValue, 0L, 0L, 0L)
    rows.toArray.sortBy(c => (c.event_id, c.ts.getTime)).foreach { c =>
      // exact µs (getTime alone floors to ms and would miss sub-ms
      // regressions the batch twin counts)
      val us = math.floorDiv(c.ts.getTime, 1000L) * 1000000L +
        c.ts.getNanos / 1000L
      if (lastUs != Long.MinValue && us < lastUs) {
        inv += 1
        if (lastUs - us > worst) worst = lastUs - us
      }
      lastUs = us
      n += 1
    }
    st.update((lastUs, n, inv, worst))
    Iterator.single(
      AuditRow(key, n, inv, worst, 1000L * (n - inv) / math.max(n, 1L)))
  }
}

object StreamOrderAudit {
  /** Running per-key order-audit rows for a keyed change stream. */
  def audit(changes: Dataset[AuditChange])(implicit spark: SparkSession)
      : Dataset[AuditRow] = {
    import spark.implicits._
    changes.groupByKey(_.key)
      .transformWithState(new OrderAuditProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
