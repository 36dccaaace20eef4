package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** One (band-key, doc) observation — a doc emits `n_bands` of these,
  * all inside the micro-batch that carried the doc. The doc's ingest
  * payload rides along so the admission verdict is self-contained. */
case class NearDupBand(band: Long, doc_id: Long, ts: Timestamp,
    source: String, lang: String, n_tokens: Long, n_bands: Int)

/** Verdict of one band group for one doc: hit = 1 iff the band was
  * already registered (by an earlier batch's doc, or by a smaller
  * doc_id in this batch). */
case class BandVerdict(doc_id: Long, ts: Timestamp, source: String,
    lang: String, n_tokens: Long, n_bands: Int, hit: Int)

/** The per-doc admission: admitted ⇔ no band collided. `hit_bands`
  * says how strong the near-dup evidence was (all bands hit = exact or
  * near-exact duplicate; one band = borderline). */
case class IngestAdmit(doc_id: Long, source: String, lang: String,
    n_tokens: Long, admitted: Boolean, hit_bands: Int)

/** §2#187 STREAMING NEAR-DUP ADMISSION — the streaming twin of
  * `dedup_minhash_lsh` (§2#26), and the banded upgrade of
  * [[graft.operators.Pipeline.streamIngest]]'s exact-hash
  * `dropDuplicates`: per arriving doc, a k-hash MinHash signature
  * splits into `n_bands` LSH band keys; the doc is ADMITTED iff none
  * of its band keys is already registered, and an admitted doc
  * registers all of them. A near-dup arriving in any later micro-batch
  * shares ≥ 1 band with the original (probability 1 − (1 − j^r)^b,
  * the standard S-curve) and is dropped at the door — the steady-state
  * crawl-admission shape, where re-clustering the corpus per increment
  * is not an option.
  *
  * Two chained `transformWithState` operators (the Spark 4 chained-
  * stateful form — the first declares its output event-time column so
  * the second may follow):
  *
  *  1. [[BandRegistryProcessor]], keyed by BAND KEY. State: one
  *     ValueState[Long] = the owning doc_id per registered band — so
  *     state is exactly `n_bands` longs per admitted doc (the
  *     "bands × live docs" bound; an unbounded-lifetime registry is
  *     the semantics of global dedup — a deployment that wants a
  *     sliding admission window adds a TTLConfig here and nothing
  *     else changes). Within a batch the claim is DETERMINISTIC:
  *     the smallest doc_id in the band group claims; everyone else is
  *     a hit (replay-stable, like SpaceSaving's sorted fold).
  *  2. [[AdmissionProcessor]], keyed by DOC. A doc's band verdicts
  *     all arrive in the same micro-batch, so this is a within-batch
  *     conjunction — state (partial counts) only persists if an
  *     engine ever splits a doc's verdicts across batches; it emits
  *     once per doc and clears.
  *
  * Known over-drop, documented: a doc dropped for band y keeps any
  * bands it was first to claim — a later doc colliding only with
  * those ghost bands is dropped although its collision partner never
  * entered the corpus. That is the conservative direction (dedup may
  * only over-drop, never under-drop), the artifact is bounded by the
  * batch-concurrency of near-dups, and resolving it exactly would
  * need a second round trip per batch. */
class BandRegistryProcessor
    extends StatefulProcessor[Long, NearDupBand, BandVerdict] {

  @transient private var owner: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    owner = getHandle.getValueState[Long](
      "owner", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[NearDupBand],
      timerValues: TimerValues): Iterator[BandVerdict] = {
    val obs = rows.toArray
    val claimant =
      if (owner.exists()) owner.get()
      else {
        val c = obs.minBy(_.doc_id).doc_id
        owner.update(c)
        c
      }
    obs.iterator.map(o => BandVerdict(o.doc_id, o.ts, o.source, o.lang,
      o.n_tokens, o.n_bands, if (o.doc_id == claimant) 0 else 1))
  }
}

class AdmissionProcessor
    extends StatefulProcessor[Long, BandVerdict, IngestAdmit] {

  @transient private var partial: ValueState[(Long, Long)] = _ // (seen, hits)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    partial = getHandle.getValueState[(Long, Long)](
      "partial", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[BandVerdict],
      timerValues: TimerValues): Iterator[IngestAdmit] = {
    val obs = rows.toArray
    val (seen0, hits0) =
      if (partial.exists()) partial.get() else (0L, 0L)
    val seen = seen0 + obs.length
    val hits = hits0 + obs.count(_.hit == 1)
    val head = obs.head
    if (seen >= head.n_bands) {
      partial.clear()
      Iterator.single(IngestAdmit(head.doc_id, head.source, head.lang,
        head.n_tokens, admitted = hits == 0, hit_bands = hits.toInt))
    } else {
      partial.update((seen, hits))
      Iterator.empty
    }
  }
}

object StreamNearDup {
  /** Chain the two processors over a banded stream. `banded` must be
    * watermarked on `ts` (the chained-stateful requirement). */
  def admissions(banded: Dataset[NearDupBand])
      (implicit spark: SparkSession): Dataset[IngestAdmit] = {
    import spark.implicits._
    banded.groupByKey(_.band)
      .transformWithState(new BandRegistryProcessor, "ts", OutputMode.Append())
      .groupByKey(_.doc_id)
      .transformWithState(new AdmissionProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
