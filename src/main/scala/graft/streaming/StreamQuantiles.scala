package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** One observed measurement in a keyed stream (group = e.g.
  * event_type, value_c = the measurement in integer cents). */
case class MeasureEvent(group: String, value_c: Long)

/** Current per-group quantiles after a micro-batch, in cents rounded
  * DOWN to the bucket width the processor was built with. */
case class QuantileRow(group: String, n: Long,
    p50_c: Long, p90_c: Long, p99_c: Long)

/** §2#197 STREAMING QUANTILES — the live twin of `q_quantiles`
  * (§2#40): per group, a bucketed integer histogram lives in MapState
  * (bucket = value_c div `bucketC`, count per bucket), and each batch
  * that changes the group emits p50/p90/p99 read off the cumulative
  * histogram. Quantiles are EXACT to the bucket width (error ≤
  * bucketC cents, a configuration choice, not a sketch bound), state
  * is O(occupied buckets) = O(value_range / bucketC) per group —
  * bounded by the VALUE DOMAIN, not the stream length — and every
  * arithmetic step is integer, so emissions are deterministic given
  * batch contents and boundaries. When the value domain is unbounded
  * (latencies with no ceiling), the rungs above this are exponential
  * buckets (bucket = log-scale index — same MapState shape, swap the
  * bucket function) or a mergeable sketch (KLL/t-digest) in
  * ValueState; this operator is the exact rung below those.
  *
  * The quantile read is the nearest-rank definition on the bucketed
  * histogram: p(q) = the smallest bucket whose cumulative count
  * reaches ⌈q·n⌉, reported as the bucket's lower edge. A batch of
  * pure redeliveries of already-counted rows still shifts counts
  * (this is a frequency histogram, not a distinct set) — dedup before
  * this operator if the feed redelivers, exactly as you would for any
  * streaming aggregate. Per batch the processor touches only the
  * buckets the batch hits plus one ordered scan of the group's
  * occupied buckets for the read — MapState iteration, no full-state
  * rewrite. */
class BucketQuantileProcessor(bucketC: Long)
    extends StatefulProcessor[String, MeasureEvent, QuantileRow] {
  require(bucketC >= 1, s"bucket width $bucketC must be >= 1 cent")

  @transient private var buckets: MapState[Long, Long] = _
  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buckets = getHandle.getMapState[Long, Long](
      "buckets", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    total = getHandle.getValueState[Long](
      "total", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[MeasureEvent],
      timerValues: TimerValues): Iterator[QuantileRow] = {
    val delta = scala.collection.mutable.HashMap.empty[Long, Long]
    var added = 0L
    rows.foreach { r =>
      delta.updateWith(Math.floorDiv(r.value_c, bucketC)) {
        c => Some(c.getOrElse(0L) + 1L)
      }
      added += 1
    }
    if (added == 0) return Iterator.empty
    delta.foreach { case (b, c) =>
      val prev = if (buckets.containsKey(b)) buckets.getValue(b) else 0L
      buckets.updateValue(b, prev + c)
    }
    val n = (if (total.exists()) total.get() else 0L) + added
    total.update(n)
    // ordered pass over occupied buckets; ranks are ceil(q*n)
    val hist = {
      val it = buckets.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      while (it.hasNext) { val kv = it.next(); buf += ((kv._1, kv._2)) }
      buf.sortBy(_._1)
    }
    def rank(qPm: Long): Long = {
      val target = (qPm * n + 999L) / 1000L // ceil(q·n) in integer math
      var cum = 0L
      var i = 0
      while (i < hist.length) {
        cum += hist(i)._2
        if (cum >= target) return hist(i)._1 * bucketC
        i += 1
      }
      hist.last._1 * bucketC
    }
    Iterator.single(QuantileRow(key, n, rank(500L), rank(900L), rank(990L)))
  }
}

object StreamQuantiles {
  /** Current per-group bucketed quantiles, emitted after every batch
    * that touches the group. */
  def quantiles(events: Dataset[MeasureEvent], bucketC: Long = 100L)
      (implicit spark: SparkSession): Dataset[QuantileRow] = {
    import spark.implicits._
    events.groupByKey(_.group)
      .transformWithState(new BucketQuantileProcessor(bucketC),
        TimeMode.None(), OutputMode.Update())
  }
}
