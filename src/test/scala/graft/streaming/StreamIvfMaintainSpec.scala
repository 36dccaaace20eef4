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

  private def run(capacity: Long = 1000000L, driftE6: Long = 500000L)(
      body: (MemoryStream[VecChange], () => Seq[CellHealth]) => Unit): Unit = {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[VecChange](97, spark, None)
      val q = StreamIvfMaintain.health(in.toDS(), centroids, capacity, driftE6)
        .writeStream.outputMode("update")
        .format("memory").queryName("ivfmaintain")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-ivfmaintain").toString)
        .start()
      def all(): Seq[CellHealth] = {
        q.processAllAvailable()
        spark.table("ivfmaintain").as[CellHealth].collect().toSeq
      }
      body(in, all _)
      q.stop()
    } finally spark.conf.unset(key)
  }

  /** Latest verdict per cell = the one from the highest batch; memory
    * sink appends, so take the last row per cell. */
  private def latest(rows: Seq[CellHealth]): Map[Long, CellHealth] =
    rows.zipWithIndex.groupBy(_._1.cell)
      .view.mapValues(_.maxBy(_._2)._1).toMap

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
