package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** One candidate row offered to the per-key reservoir. */
case class ReservoirOffer(key: String, doc_id: Long)

/** One reservoir membership change: `action` is "add" or "evict".
  * The CURRENT sample at any instant is (all adds) minus (all
  * evicts) — an incrementally-maintained view of the sample. */
case class ReservoirChange(key: String, doc_id: Long, h: Long,
    action: String)

/** Bounded per-key reservoir, ascending by (h, doc_id) — parallel
  * arrays, one codec hop. */
case class ReservoirKeep(h: Array[Long], id: Array[Long])

/** §2#238 STREAMING RESERVOIR SAMPLE — the streaming twin of
  * [[graft.operators.Sampling.sampleDocs]] (#48): maintain, per key,
  * the k documents with the SMALLEST deterministic hash seen so far,
  * emitting membership changes as they happen. Bottom-k-by-hash is
  * the merge-order-independent reservoir: unlike Vitter's random
  * replacement (Algorithm R), the same input SET yields the same
  * sample under ANY batching, arrival order, partial replay, or
  * cross-stream merge — so the streaming sample provably CONVERGES TO
  * THE BATCH OPERATOR'S OUTPUT on the same data (spec-pinned), which
  * is what makes a sample auditable: re-run the batch op over the
  * lake, get byte-identical membership.
  *
  * Hash: the same Knuth multiplicative residue as #48
  * ((doc_id mod p)·2654435761 mod p, p = 1e9+7) — one integer per
  * row, no RNG state anywhere.
  *
  * State per key: 2k longs, O(keys·k) total, never O(rows); shuffle
  * key = reservoir key, single-writer per key. Emission is the
  * CHANGE LOG (adds + evicts), so a downstream sink maintains the
  * live sample incrementally instead of re-reading k rows per key
  * per batch. */
class ReservoirProcessor(k: Int)
    extends StatefulProcessor[String, ReservoirOffer, ReservoirChange] {
  require(k > 0, s"bad reservoir size: $k")

  private val P = 1000000007L

  @transient private var keep: ValueState[ReservoirKeep] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    keep = getHandle.getValueState[ReservoirKeep](
      "keep", Encoders.product[ReservoirKeep], TTLConfig.NONE)

  private def hash(id: Long): Long = (id % P) * 2654435761L % P

  override def handleInputRows(key: String, rows: Iterator[ReservoirOffer],
      timerValues: TimerValues): Iterator[ReservoirChange] = {
    val prior = if (keep.exists()) keep.get()
      else ReservoirKeep(Array(), Array())
    val priorSet = prior.id.toSet
    val offered = rows.map(_.doc_id).toArray.distinct
      .filterNot(priorSet.contains)
    if (offered.isEmpty) return Iterator.empty
    val merged = (prior.h.zip(prior.id) ++
      offered.map(id => (hash(id), id)))
      .sortBy(identity).take(k)
    val mergedIds = merged.map(_._2).toSet
    if (mergedIds == priorSet) return Iterator.empty
    keep.update(ReservoirKeep(merged.map(_._1), merged.map(_._2)))
    val adds = merged.filterNot { case (_, id) => priorSet.contains(id) }
      .map { case (h, id) => ReservoirChange(key, id, h, "add") }
    val evicts = prior.h.zip(prior.id)
      .filterNot { case (_, id) => mergedIds.contains(id) }
      .map { case (h, id) => ReservoirChange(key, id, h, "evict") }
    (adds ++ evicts).sortBy(c => (c.h, c.doc_id, c.action)).iterator
  }
}

object StreamReservoir {
  /** Membership change log for per-key bottom-k reservoirs. */
  def changes(offers: Dataset[ReservoirOffer], k: Int = 10)
      (implicit spark: SparkSession): Dataset[ReservoirChange] = {
    import spark.implicits._
    offers.groupByKey(_.key)
      .transformWithState(new ReservoirProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }
}
