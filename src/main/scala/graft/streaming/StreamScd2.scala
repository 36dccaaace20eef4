package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** One CLOSED dimension version: the key held `value` from
  * `valid_from_us` (inclusive) to `valid_to_us` (exclusive). */
case class Scd2Version(key: String, version_n: Long, valid_from_us: Long,
    valid_to_us: Long, value: String)

/** The per-key OPEN version held in state. */
case class OpenVersion(versionN: Long, validFromUs: Long, value: String)

/** §2#253 STREAMING SCD2 — the dimension-history maintainer as a
  * stateful streaming operator: per key, keep the OPEN version and,
  * when a later change arrives, CLOSE it (valid_to = the newcomer's
  * commit time) and emit the closed interval. The batch twin is
  * cdc_scd2 (§2#72), which derives the same intervals with one lead()
  * window over history; this is the form a consumer runs forever
  * against the live feed, emitting each version row exactly when it
  * closes — the incremental load of a type-2 dimension table (Kimball
  * DWH toolkit ch.5) without re-windowing history every batch.
  *
  * Ordering contract (replay-deterministic by construction): a key's
  * batch rows apply in ascending (sort_us, value) order — each strictly
  * newer change closes the open version; an EQUAL-timestamp change
  * replaces the open version's value by last-writer-wins on value
  * (zero-width versions never existed — the CdcApply equal-ts rule);
  * a STALE change (sort_us < open.valid_from) is dropped, never
  * retro-inserted: version history already emitted downstream is
  * immutable, the same append-mode contract as the as-of join.
  * Checkpointed
  * offsets replay identical batches, and nothing here reads arrival
  * order or a wall clock, so replays emit identical version rows.
  *
  * Scale: state is ONE OpenVersion per live key (O(keys), RocksDB);
  * the shuffle key is the dimension PK — co-partitioned with the
  * feed's queue assignment like CdcApply. */
class Scd2Processor extends StatefulProcessor[String, ChangeRow, Scd2Version] {

  @transient private var open: ValueState[OpenVersion] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState[OpenVersion](
      "open", Encoders.product[OpenVersion], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[ChangeRow],
      timerValues: TimerValues): Iterator[Scd2Version] = {
    val ordered = rows.toArray.sortBy(r => (r.sort_us, r.value))
    val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Version]
    var cur = if (open.exists()) Some(open.get()) else None
    ordered.foreach { r =>
      cur match {
        case None =>
          cur = Some(OpenVersion(1L, r.sort_us, r.value))
        case Some(o) if r.sort_us > o.validFromUs =>
          out += Scd2Version(key, o.versionN, o.validFromUs, r.sort_us, o.value)
          cur = Some(OpenVersion(o.versionN + 1, r.sort_us, r.value))
        case Some(o) if r.sort_us == o.validFromUs && r.value > o.value =>
          // equal-ts last-writer-wins: replace in place, no zero-width
          // version is ever emitted
          cur = Some(o.copy(value = r.value))
        case _ => () // stale or equal-ts loser: dropped
      }
    }
    cur.foreach(open.update)
    out.iterator
  }
}

object StreamScd2 {
  /** Closed dimension versions for a stream of change rows. */
  def versions(changes: Dataset[ChangeRow])
      (implicit spark: SparkSession): Dataset[Scd2Version] = {
    import spark.implicits._
    changes.groupByKey(_.key)
      .transformWithState(new Scd2Processor,
        TimeMode.None(), OutputMode.Append())
  }
}
