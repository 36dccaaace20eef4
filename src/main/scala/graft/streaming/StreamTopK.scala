package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** One observed item in a keyed stream (group = e.g. event_type,
  * item = e.g. user_id). */
case class ItemEvent(group: String, item: Long)

/** A current heavy hitter: `count` overestimates the true frequency by
  * at most `err` (SpaceSaving's per-counter error bound). */
case class TopItem(group: String, item: Long, count: Long, err: Long)

/** One SpaceSaving counter; the summary is a bounded Seq of these. */
case class SsCounter(item: Long, count: Long, err: Long)
case class SsSummary(counters: Seq[SsCounter])

/** §2#170 STREAMING HEAVY HITTERS — per-group top-k over an unbounded
  * stream in O(capacity) state: the SpaceSaving summary (Metwally,
  * Agrawal & El Abbadi, ICDT 2005). Exact per-group counting is
  * O(distinct items) state — unbounded on a 100 TB/day feed; the
  * summary holds `capacity` counters per group and guarantees (a) any
  * item with true frequency > n/capacity IS in the summary, and (b)
  * each reported count overestimates truth by at most its recorded
  * `err`. The batch twin is `q_heavy_hitters` (§2#108, count-min);
  * this is the form a live dashboard runs forever.
  *
  * Determinism: the summary under eviction depends on FOLD ORDER, and
  * the iterator order Spark hands a shuffled group is not stable
  * across retries — so each batch's rows are sorted by item before
  * folding, making the committed summary a function of batch CONTENTS
  * (the error bounds hold for any order; the sort buys replay-stable
  * state on top of them).
  *
  * Mechanics per arriving item: present → increment; room → insert at
  * (1, 0); full → evict the MIN counter and inherit its count as the
  * newcomer's (count = min+1, err = min) — the inherited minimum is
  * exactly the maximum possible undercount, which is what makes the
  * bound certifiable per item rather than per summary.
  *
  * Shape: state is one ValueState[SsSummary] per group — bounded at
  * `capacity` counters regardless of stream length; the shuffle key is
  * the group, so summary maintenance is single-writer per group (no
  * merge ambiguity); each micro-batch folds its rows in sorted item
  * order then emits the group's current top-k (count desc, item asc —
  * total order, so emissions are deterministic given batch contents
  * and boundaries). */
object SpaceSaving {
  /** One SpaceSaving update pass, factored out of the processor so the
    * algorithm's guarantees are property-testable without a streaming
    * harness: fold `items` into `counters` (item → (count, err)) under
    * the capacity bound. Mutates and returns `counters`.
    *
    * Cost note: each eviction scans the whole map for the min counter —
    * O(capacity) per NEW item once full, so a micro-batch of b novel
    * items costs O(b·capacity). That is a deliberate simplicity
    * trade-off at the dashboard capacities this targets (≤ a few
    * hundred counters); raising capacity into the thousands wants the
    * textbook Stream-Summary structure (counters doubly linked into
    * count buckets, O(1) min eviction) — swap it inside this function,
    * the fold contract and the error bounds are unchanged. */
  def fold(counters: scala.collection.mutable.LinkedHashMap[Long, (Long, Long)],
      items: IterableOnce[Long], capacity: Int)
      : scala.collection.mutable.LinkedHashMap[Long, (Long, Long)] = {
    items.iterator.foreach { item =>
      counters.get(item) match {
        case Some((c, e)) => counters(item) = (c + 1, e)
        case None if counters.size < capacity => counters(item) = (1L, 0L)
        case None =>
          // evict the min counter (ties: larger item evicted first, so
          // the survivor set is deterministic), inherit its count
          val (minItem, (minCount, _)) =
            counters.minBy { case (i, (c, _)) => (c, -i) }
          counters.remove(minItem)
          counters(item) = (minCount + 1, minCount)
      }
    }
    counters
  }
}

class SpaceSavingProcessor(capacity: Int, k: Int)
    extends StatefulProcessor[String, ItemEvent, TopItem] {

  @transient private var summary: ValueState[SsSummary] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    summary = getHandle.getValueState[SsSummary](
      "spacesaving", Encoders.product[SsSummary], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[ItemEvent],
      timerValues: TimerValues): Iterator[TopItem] = {
    val counters = scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Long)]
    if (summary.exists())
      summary.get().counters.foreach(c => counters(c.item) = (c.count, c.err))
    // sort before folding: group-iterator order is retry-dependent and
    // evictions are order-sensitive (see class scaladoc)
    SpaceSaving.fold(counters, rows.map(_.item).toArray.sorted, capacity)
    val seq = counters.toSeq.map { case (i, (c, e)) => SsCounter(i, c, e) }
    summary.update(SsSummary(seq))
    seq.sortBy(c => (-c.count, c.item)).take(k)
      .map(c => TopItem(key, c.item, c.count, c.err)).iterator
  }
}

object StreamTopK {
  /** Current per-group heavy hitters after each micro-batch. */
  def topk(events: Dataset[ItemEvent], capacity: Int = 64, k: Int = 5)
      (implicit spark: SparkSession): Dataset[TopItem] = {
    import spark.implicits._
    events.groupByKey(_.group)
      .transformWithState(new SpaceSavingProcessor(capacity, k),
        TimeMode.None(), OutputMode.Update())
  }
}
