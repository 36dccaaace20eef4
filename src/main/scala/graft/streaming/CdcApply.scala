package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

case class ChangeRow(key: String, sort_us: Long, value: String)

/** One emitted materialization event: `op` is `upsert` or `delete`. */
case class Materialized(key: String, sort_us: Long, value: String, op: String)

/** The per-key latest version held in state. */
case class LatestVersion(sort_us: Long, value: String, tombstone: Boolean)

/** §2#158 STREAMING CDC APPLY — the consumer-side materialized view of
  * the published feed, as a stateful streaming operator: per primary
  * key, keep the LATEST version (max commit timestamp) across
  * micro-batches and emit a row only when the materialization actually
  * changes. The batch twin is `cdc_apply` (§2#46); this is the form a
  * consumer runs forever against the live queue.
  *
  * The correctness bit a naive foreachBatch MERGE gets wrong:
  * OUT-OF-ORDER deliveries. At-least-once queues redeliver and
  * interleave — a change with an OLDER commit timestamp than the
  * materialized version must be IGNORED, not applied (latest-wins by
  * commit time, not by arrival time — the reference's upsert cursor
  * semantics, cursors.rs:44-57, generalized to rows). State stores the
  * winning (sort_us, value); stale arrivals compare and drop. Spark's
  * own `dropDuplicates` keeps FIRST-arrival (wrong version), and a
  * blind MERGE keeps LAST-arrival (wrong again) — the ValueState
  * comparison is what implements commit-time wins.
  *
  * Tombstones (`{"after": null}` — the CockroachDB delete payload)
  * materialize as deletions: the key's state remembers the tombstone's
  * commit time (so a STALE pre-delete change cannot resurrect the row
  * — the classic zombie-row bug) and emits `op=delete` once.
  *
  * Scale: state is O(live keys) in RocksDB, one (sort_us, value) per
  * key; the shuffle key is the PK — the same partitioning the feed's
  * queue assignment (§2#8) already uses, so a co-partitioned consumer
  * reshuffles nothing. */
class CdcApplyProcessor
    extends StatefulProcessor[String, ChangeRow, Materialized] {

  @transient private var latest: ValueState[LatestVersion] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    latest = getHandle.getValueState[LatestVersion](
      "latest", Encoders.product[LatestVersion], TTLConfig.NONE)

  private def isTombstone(value: String): Boolean =
    value.replaceAll("\\s+", "").contains("\"after\":null")

  override def handleInputRows(key: String, rows: Iterator[ChangeRow],
      timerValues: TimerValues): Iterator[Materialized] = {
    // batch-local winner first: max (sort_us, value) — the value
    // tiebreak makes equal-timestamp duplicates deterministic
    val winner = rows.maxBy(r => (r.sort_us, r.value))
    val prev = if (latest.exists()) Some(latest.get()) else None
    val ord = Ordering.Tuple2[Long, String]
    val stale = prev.exists(p =>
      ord.gteq((p.sort_us, p.value), (winner.sort_us, winner.value)))
    if (stale) Iterator.empty
    else {
      val tomb = isTombstone(winner.value)
      latest.update(LatestVersion(winner.sort_us, winner.value, tomb))
      // an already-deleted key re-deleted emits nothing new
      if (tomb && prev.exists(_.tombstone)) Iterator.empty
      else Iterator.single(Materialized(key, winner.sort_us, winner.value,
        if (tomb) "delete" else "upsert"))
    }
  }
}

object CdcApply {
  /** Materialization updates for a stream of change rows. */
  def updates(changes: Dataset[ChangeRow])
      (implicit spark: SparkSession): Dataset[Materialized] = {
    import spark.implicits._
    changes.groupByKey(_.key)
      .transformWithState(new CdcApplyProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
