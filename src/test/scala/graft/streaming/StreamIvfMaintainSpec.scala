package graft.streaming

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** §2#298: streaming IVF index maintenance — stateless before/after
  * routing, cell-keyed fold, drift + capacity hints, delete/update
  * moves, cross-batch accumulation. */
class StreamIvfMaintainSpec extends SparkSuite {
  import spark.implicits._

  // two well-separated unit centroids on the axes
  private val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))

  private def run(capacity: Long = 1000000L, driftE6: Long = 500000L,
      cents: Array[Array[Double]] = centroids)(
      body: (MemoryStream[VecChange], () => Seq[(Long, CellHealth)]) => Unit): Unit = {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[VecChange](97, spark, None)
      // Capture (batchId, verdict) via foreachBatch: cross-batch row
      // order of a memory-sink table is NOT a contract (r16 advice),
      // but the batch id is — `latest` keys recency on it.
      val captured =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, CellHealth)]()
      val q = StreamIvfMaintain.health(in.toDS(), cents, capacity, driftE6)
        .writeStream.outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[CellHealth],
            batchId: Long) =>
          batch.collect().foreach(h => captured.add((batchId, h)))
          ()
        }
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-ivfmaintain").toString)
        .start()
      def all(): Seq[(Long, CellHealth)] = {
        q.processAllAvailable()
        import scala.jdk.CollectionConverters._
        captured.iterator().asScala.toSeq
      }
      body(in, all _)
      q.stop()
    } finally spark.conf.unset(key)
  }

  /** Latest verdict per cell = the one from the highest batch id (a
    * cell emits at most one verdict per micro-batch, so this is
    * unambiguous and independent of sink row order). */
  private def latest(rows: Seq[(Long, CellHealth)]): Map[Long, CellHealth] =
    rows.groupBy(_._2.cell)
      .view.mapValues(_.maxBy(_._1)._2).toMap

  test("inserts land in their nearest cell with zero residual on exact match") {
    run() { (in, all) =>
      in.addData(
        VecChange(1L, Array.empty, Array(1.0, 0.0)),   // exactly centroid 0
        VecChange(2L, Array.empty, Array(0.0, 2.0)),   // direction of centroid 1
        VecChange(3L, Array.empty, Array(0.1, 0.9)))   // near centroid 1
      val m = latest(all())
      assert(m(0L).n_vecs === 1L && m(0L).mean_resid_e6 === 0L)
      assert(m(1L).n_vecs === 2L)
      assert(!m(0L).rebuild && !m(1L).rebuild)
    }
  }

  test("update moves a vector between cells; both sides reconcile") {
    run() { (in, all) =>
      in.addData(VecChange(7L, Array.empty, Array(0.9, 0.1)))
      assert(latest(all())(0L).n_vecs === 1L)
      // move to cell 1: before = old image, after = new
      in.addData(VecChange(7L, Array(0.9, 0.1), Array(0.1, 0.9)))
      val m = latest(all())
      assert(m(0L).n_vecs === 0L && m(0L).mean_resid_e6 === 0L,
        s"old cell not reconciled: ${m(0L)}")
      assert(m(1L).n_vecs === 1L)
    }
  }

  test("delete removes exactly what the insert added (residual returns to zero)") {
    run() { (in, all) =>
      in.addData(VecChange(5L, Array.empty, Array(0.7, 0.3)))
      val before = latest(all())(0L)
      assert(before.n_vecs === 1L && before.mean_resid_e6 > 0L)
      in.addData(VecChange(5L, Array(0.7, 0.3), Array.empty))
      val after = latest(all())(0L)
      assert(after.n_vecs === 0L && after.mean_resid_e6 === 0L)
    }
  }

  test("capacity bound raises the rebuild hint; counts accumulate across batches") {
    run(capacity = 2L) { (in, all) =>
      in.addData(VecChange(1L, Array.empty, Array(1.0, 0.1)),
        VecChange(2L, Array.empty, Array(1.0, 0.2)))
      assert(!latest(all())(0L).rebuild)
      in.addData(VecChange(3L, Array.empty, Array(1.0, 0.3)))
      val m = latest(all())(0L)
      assert(m.n_vecs === 3L && m.rebuild, s"capacity hint missing: $m")
    }
  }

  test("drift bound: a population far from its centroid raises the hint") {
    run(driftE6 = 100000L) { (in, all) =>
      // 45° off centroid 0 (cos ≈ 0.707 → resid ≈ 292893 e6) but still
      // nearer cell 0 than cell 1? cos to both equal → tie resolves to
      // cell 0; resid over the 100000 line
      in.addData(VecChange(9L, Array.empty, Array(1.0, 1.0)))
      val m = latest(all())(0L)
      assert(m.n_vecs === 1L && m.mean_resid_e6 > 250000L && m.rebuild,
        s"drift hint missing: $m")
    }
  }

  test("batch↔stream reconciliation: cellHealthOn over the end state agrees per cell") {
    // r16 verdict #2: SURVEY §2 claims ann_cell_health is "the batch
    // reconciliation the streaming hints are checked against" — this
    // pins it (the StreamOrderAudit↔cdc_order_audit precedent). The
    // SAME change feed drives StreamIvfMaintain.health; the feed's
    // materialized END STATE + the SAME centroid array drive
    // Similarity.cellHealthOn; final per-cell (n_vecs, mean_resid_e6)
    // must agree exactly — both sides are e6 fixed-point with floor
    // mean division, and both assign by the same cosine argmax
    // (ties → smallest cell).
    import org.apache.spark.sql.functions.col
    import graft.functions.Fns.norm2

    // 4 well-spread dim-4 directions (none zero, no near-ties)
    val cents = Array(
      Array(1.0, 0.2, 0.1, 0.0),
      Array(0.1, 1.0, 0.0, 0.3),
      Array(0.0, 0.2, 1.0, 0.1),
      Array(0.3, 0.0, 0.2, 1.0))
    def vecOf(id: Long, salt: Long): Array[Double] =
      Array.tabulate(4)(d =>
        (((id * 37L + salt * 29L + d * 13L) % 97L) + 1L) / 97.0 +
          (if (d == ((id + salt) % 4L).toInt) 1.0 else 0.0))
    // 40 inserts, then every 5th vector MOVES (before = the exact
    // insert image), then every 7th is DELETED (before = its current
    // image: the moved image when it moved, else the insert image)
    val inserts = (0L until 40L).map(i => VecChange(i, Array.empty, vecOf(i, 0L)))
    val moves = (0L until 40L).filter(_ % 5L == 0L)
      .map(i => VecChange(i, vecOf(i, 0L), vecOf(i, 1L)))
    val deletes = (0L until 40L).filter(_ % 7L == 0L)
      .map(i => VecChange(i,
        if (i % 5L == 0L) vecOf(i, 1L) else vecOf(i, 0L), Array.empty))
    // end state: survivors with their current image
    val endState = (0L until 40L).filter(_ % 7L != 0L)
      .map(i => (i, if (i % 5L == 0L) vecOf(i, 1L) else vecOf(i, 0L)))

    run(cents = cents) { (in, all) =>
      in.addData(inserts: _*)
      in.addData(moves: _*)
      in.addData(deletes: _*)
      val stream = latest(all())

      graft.functions.Registry.ensure(spark)
      val base = endState.toDF("vec_id", "emb")
        .withColumn("nrm", norm2(col("emb").cast("array<double>")))
      val centDf = cents.zipWithIndex.toSeq
        .map { case (e, i) => (i.toLong, e) }.toDF("cell", "c_emb")
        .withColumn("c_nrm", norm2(col("c_emb").cast("array<double>")))
      val batch = graft.operators.Similarity.cellHealthOn(base, centDf)
        .collect().map(r => r.getAs[Long]("cell") ->
          ((r.getAs[Long]("n_vecs"), r.getAs[Long]("mean_resid_e6")))).toMap

      // every batch cell: the stream's final verdict matches exactly
      batch.foreach { case (cell, (n, mean)) =>
        val s = stream.getOrElse(cell,
          fail(s"cell $cell in batch report but never emitted live"))
        assert(s.n_vecs === n && s.mean_resid_e6 === mean,
          s"cell $cell: stream (${s.n_vecs}, ${s.mean_resid_e6}) " +
            s"vs batch ($n, $mean)")
      }
      // stream cells absent from the batch report must have drained
      stream.foreach { case (cell, s) =>
        if (!batch.contains(cell))
          assert(s.n_vecs === 0L && s.mean_resid_e6 === 0L,
            s"cell $cell live but empty-or-missing in batch: $s")
      }
      // non-vacuous: the feed touches several cells and survivors exist
      assert(batch.values.map(_._1).sum === endState.size.toLong)
      assert(batch.size >= 2, s"feed collapsed into one cell: $batch")
    }
  }

  test("routing is deterministic and pure: same multiset, same verdicts") {
    implicit val s = spark
    val changes = Seq(
      VecChange(1L, Array.empty, Array(0.9, 0.4)),
      VecChange(2L, Array.empty, Array(0.2, 0.8)),
      VecChange(1L, Array(0.9, 0.4), Array(0.3, 0.7)))
    val a = StreamIvfMaintain.deltas(changes.toDS(), centroids)
      .collect().sortBy(d => (d.cell, d.d_count, d.d_resid_e6)).toSeq
    val b = StreamIvfMaintain.deltas(changes.reverse.toDS(), centroids)
      .collect().sortBy(d => (d.cell, d.d_count, d.d_resid_e6)).toSeq
    assert(a === b)
    // the move's decrement recomputes the SAME cell+residual the
    // insert used — net per-cell residual mass for vec 1's old image
    // cancels exactly
    val net = a.groupBy(_.cell).view
      .mapValues(ds => (ds.map(_.d_count).sum, ds.map(_.d_resid_e6).sum))
    assert(net(1L)._1 === 2L) // vec 2 + moved vec 1
  }
}
