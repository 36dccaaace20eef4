package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** One side-tagged row of the as-of union: `is_right = false` is the
  * probe stream (events asking "what was the reference at my time?"),
  * `is_right = true` is the reference stream (quotes/rates/config
  * versions). `value` is the probe's id payload or the reference's
  * value. */
case class AsofInput(key: String, event_id: Long, ts: Timestamp,
    is_right: Boolean, value: Long)

/** One enriched probe: the latest reference row at-or-before the
  * probe's event time, or `matched = false` when none is retained.
  * `ref_ts_ms = -1` on a miss (null-free for a stable wire schema). */
case class AsofMatch(key: String, event_id: Long, ts: Timestamp,
    matched: Boolean, ref_ts_ms: Long, ref_value: Long)

/** Bounded per-key reference history, ascending by timestamp —
  * parallel arrays keep the state row one codec hop (no nested
  * collection-of-tuples encoding). `eid` carries each retained
  * timestamp's WINNING writer, so the last-writer-wins-by-event_id
  * contract holds across batches, not just within one (without it, a
  * replayed/re-delivered old reference in a later batch would
  * silently overwrite a larger-event_id retained value). */
case class RefHist(tsMs: Array[Long], v: Array[Long], eid: Array[Long])

/** §2#235 STREAMING AS-OF JOIN — the streaming twin of the batch
  * as-of family (#38/#132/#162/#181): enrich every probe event with
  * the LATEST reference row whose event time is ≤ the probe's, across
  * micro-batch boundaries. The batch operator sorts both sides; a
  * stream cannot, so the reference side lives in keyed state: a
  * bounded ascending history of the last `maxHistory` reference rows
  * per key — late PROBES still resolve correctly against any retained
  * reference (an as-of join with only last-value state silently
  * mis-enriches every out-of-order probe; the history is the fix,
  * TTL'd by bound rather than wall-clock so replay stays exact).
  *
  * Semantics, pinned by spec: a probe matches the latest KNOWN
  * reference with ref.ts ≤ probe.ts at the time its micro-batch
  * processes — within a batch the key's rows apply in (ts, rights
  * before probes at equal ts, event_id) order, so an equal-timestamp
  * reference IS visible to its probe (the ≤ contract), and replays
  * reproduce verdicts exactly (checkpointed offsets replay the same
  * batching; no processing-time clock anywhere). A reference arriving
  * AFTER a probe was already emitted does not retro-correct it —
  * append mode, the same contract as Spark's stream-stream interval
  * join. Equal-timestamp references resolve LAST-WRITER-WINS by
  * event_id — ACROSS batches too: the retained history stores each
  * timestamp's winning event_id, and an incoming reference replaces
  * the retained value only when its event_id is ≥ the retained
  * writer's (history is ts-unique — neither shuffle arrival order
  * nor re-delivery of an old reference can leak into a verdict) —
  * and probes match the batch's FULL merged reference view:
  * `maxHistory` truncates only what is RETAINED for later batches,
  * so a same-batch reference is never invisible to a same-batch
  * probe.
  *
  * State per key: 2·`maxHistory` longs — O(keys), never O(rows); the
  * shuffle key is the join key, single-writer per key. */
class AsofJoinProcessor(maxHistory: Int)
    extends StatefulProcessor[String, AsofInput, AsofMatch] {
  require(maxHistory > 0, s"bad history bound: $maxHistory")

  @transient private var hist: ValueState[RefHist] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    hist = getHandle.getValueState[RefHist](
      "refs", Encoders.product[RefHist], TTLConfig.NONE)

  /** Greatest index with ts ≤ t, or −1. */
  private def floorIdx(ts: Array[Long], t: Long): Int = {
    var lo = 0; var hi = ts.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (ts(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    ans
  }

  override def handleInputRows(key: String, rows: Iterator[AsofInput],
      timerValues: TimerValues): Iterator[AsofMatch] = {
    val batch = rows.toArray
    val prior =
      if (hist.exists()) hist.get() else RefHist(Array(), Array(), Array())
    // merge this batch's references into the retained history first:
    // "latest known at processing" — a batch's own references are
    // known to its probes (ts order still gates the ≤ contract
    // below). Equal-timestamp references resolve LAST-WRITER-WINS by
    // event_id, against the RETAINED writer too: a value is replaced
    // only by an equal-or-larger event_id, so neither shuffle
    // arrival order within the batch nor a re-delivered/replayed old
    // reference in a later batch can flip a verdict. The history is
    // ts-UNIQUE, which also makes the floor lookup unambiguous.
    val incoming = batch.filter(_.is_right)
      .sortBy(r => (r.ts.getTime, r.event_id))
    val full =
      if (incoming.isEmpty) prior
      else {
        // ts → (winning event_id, its value)
        val m = scala.collection.mutable.TreeMap.empty[Long, (Long, Long)]
        prior.tsMs.indices.foreach(i =>
          m(prior.tsMs(i)) = (prior.eid(i), prior.v(i)))
        incoming.foreach { r =>
          val t = r.ts.getTime
          if (!m.contains(t) || r.event_id >= m(t)._1)
            m(t) = (r.event_id, r.value)
        }
        RefHist(m.keysIterator.toArray, m.valuesIterator.map(_._2).toArray,
          m.valuesIterator.map(_._1).toArray)
      }
    // probes match against the FULL merged view — a same-batch
    // reference must be visible to a same-batch probe even when the
    // retention bound would evict it for LATER batches; only the
    // stored state is truncated
    if (incoming.nonEmpty) {
      val keepFrom = math.max(0, full.tsMs.length - maxHistory)
      hist.update(RefHist(full.tsMs.drop(keepFrom), full.v.drop(keepFrom),
        full.eid.drop(keepFrom)))
    }
    val out = batch.filter(!_.is_right)
      .sortBy(p => (p.ts.getTime, p.event_id))
      .map { p =>
        val i = floorIdx(full.tsMs, p.ts.getTime)
        if (i < 0) AsofMatch(key, p.event_id, p.ts, matched = false, -1L, 0L)
        else AsofMatch(key, p.event_id, p.ts, matched = true,
          full.tsMs(i), full.v(i))
      }
    out.iterator
  }
}

object StreamAsofJoin {
  /** Enriched probes for a union-tagged (probe ∪ reference) stream. */
  def enrich(input: Dataset[AsofInput], maxHistory: Int = 64)
      (implicit spark: SparkSession): Dataset[AsofMatch] = {
    import spark.implicits._
    input.groupByKey(_.key)
      .transformWithState(new AsofJoinProcessor(maxHistory),
        TimeMode.None(), OutputMode.Append())
  }
}
