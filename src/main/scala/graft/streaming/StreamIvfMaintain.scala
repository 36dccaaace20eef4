package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** One vector CHANGE from an embedding changefeed, Debezium-style
  * before/after images (the reference's envelope model carries the
  * full row image per change — model.rs:74-91 — which is exactly what
  * makes index maintenance STATELESS to route; see below):
  * insert = (before empty, after set), update = (both set),
  * delete = (before set, after empty). */
case class VecChange(vec_id: Long, before: Array[Double],
    after: Array[Double])

/** A ± maintenance delta against one IVF cell: vector count and
  * residual mass (1 − cos to the cell centroid, e6 fixed-point —
  * integer so cross-batch sums are order-independent). */
case class CellDelta(cell: Long, d_count: Long, d_resid_e6: Long)

/** The live health verdict for one IVF cell after a batch: current
  * vector count, mean residual in e6 (how well the centroid still
  * fits the cell's population — the DRIFT signal), and the rebuild
  * hint a maintenance job thresholds on. */
case class CellHealth(cell: Long, n_vecs: Long, mean_resid_e6: Long,
    rebuild: Boolean)

/** §2#298 STREAMING IVF INDEX MAINTENANCE — the live twin the batch
  * ANN rung ladder stops short of: `persistIvfPqIndex` builds a
  * partition-pruned index ONCE; this keeps its health current as the
  * embedding table changes, emitting per-cell occupancy + centroid
  * drift so the orchestrator knows WHICH cells to re-train and WHEN
  * (the "when do I rebuild my index" question every vector store
  * answers with a cron job and a prayer).
  *
  * Design, Spark-first:
  *   - Routing is STATELESS. The changefeed envelope carries
  *     before/after images, so a change maps to ≤2 cell deltas in-row
  *     (before's cell −1/−resid, after's cell +1/+resid) — no per-
  *     vector state, no cross-cell coordination, a narrow flatMap.
  *     The assignment recomputes the before-image's cell with the
  *     same deterministic argmin the insert used, so the decrement
  *     always hits the cell the increment landed in.
  *   - One keyed stateful fold. Cells are the state unit:
  *     O(|cells|) longs regardless of stream length — the same
  *     bounded-state contract as the other 13 StreamBench twins.
  *   - Determinism: deltas are integer e6 fixed-point; sums are
  *     order-independent, so replays/retries that deliver the same
  *     change multiset produce the same verdicts. Ties in the
  *     centroid argmin resolve to the smallest cell id.
  *
  * At 100 TB: centroids are the persisted index's (k ≤ 2¹⁶ cells ×
  * dim) array — a broadcast, exactly like the batch rungs; state is
  * |cells| counters in RocksDB; hot cells surface as rebuild hints
  * (the capacity bound) — the signal that drives cell SPLITS, the
  * IVF equivalent of salting a skewed key. */
class CellFoldProcessor(capacity: Long, driftE6: Long)
    extends StatefulProcessor[Long, CellDelta, CellHealth] {

  @transient private var count: ValueState[Long] = _
  @transient private var resid: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong,
      TTLConfig.NONE)
    resid = getHandle.getValueState[Long]("resid", Encoders.scalaLong,
      TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[CellDelta],
      timerValues: TimerValues): Iterator[CellHealth] = {
    var dc = 0L
    var dr = 0L
    rows.foreach { d => dc += d.d_count; dr += d.d_resid_e6 }
    val n = (if (count.exists()) count.get() else 0L) + dc
    val r = (if (resid.exists()) resid.get() else 0L) + dr
    count.update(n)
    resid.update(r)
    val mean = if (n > 0L) r / n else 0L
    Iterator.single(CellHealth(key, n, mean,
      rebuild = n > capacity || mean > driftE6))
  }
}

object StreamIvfMaintain {

  /** Deterministic cell assignment: argmin cosine distance to the
    * centroids (ties → smallest id). Mirrors the batch IVF rungs'
    * assignment so the live hints describe the same partitioning the
    * queries prune by. */
  private[streaming] def assign(centroids: Array[Array[Double]],
      v: Array[Double]): (Long, Long) = {
    var best = 0
    var bestCos = -2.0
    val nv = math.sqrt(v.map(x => x * x).sum)
    var c = 0
    while (c < centroids.length) {
      val ct = centroids(c)
      var dot = 0.0
      var nc = 0.0
      var i = 0
      while (i < v.length) { dot += ct(i) * v(i); nc += ct(i) * ct(i); i += 1 }
      val cos = if (nv == 0.0 || nc == 0.0) 0.0
        else dot / (nv * math.sqrt(nc))
      if (cos > bestCos) { bestCos = cos; best = c }
      c += 1
    }
    (best.toLong, math.round((1.0 - bestCos) * 1e6))
  }

  /** Stateless change → cell-delta routing (narrow; see scaladoc). */
  def deltas(changes: Dataset[VecChange],
      centroids: Array[Array[Double]])(implicit spark: SparkSession)
      : Dataset[CellDelta] = {
    import spark.implicits._
    changes.flatMap { ch =>
      val drop = if (ch.before != null && ch.before.nonEmpty) {
        val (cell, r) = assign(centroids, ch.before)
        Seq(CellDelta(cell, -1L, -r))
      } else Nil
      val add = if (ch.after != null && ch.after.nonEmpty) {
        val (cell, r) = assign(centroids, ch.after)
        Seq(CellDelta(cell, 1L, r))
      } else Nil
      drop ++ add
    }
  }

  /** Live per-cell health for an embedding changefeed against a fixed
    * centroid set. `capacity` = the cell-size bound the index was
    * provisioned for; `driftE6` = the mean-residual alarm line. */
  def health(changes: Dataset[VecChange], centroids: Array[Array[Double]],
      capacity: Long = 1000000L, driftE6: Long = 500000L)
      (implicit spark: SparkSession): Dataset[CellHealth] = {
    import spark.implicits._
    deltas(changes, centroids)
      .groupByKey(_.cell)
      .transformWithState(new CellFoldProcessor(capacity, driftE6),
        TimeMode.None(), OutputMode.Update())
  }
}
