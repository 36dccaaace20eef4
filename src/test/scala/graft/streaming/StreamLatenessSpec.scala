package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** §2#271: streaming lateness histogram — bucket arithmetic, delta
  * emission, cross-batch accumulation, event_id-order determinism. */
class StreamLatenessSpec extends SparkSuite {
  import spark.implicits._

  private def ev(key: String, id: Long, ms: Long) =
    LateEvent(key, id, new Timestamp(ms))

  private def run(body: (MemoryStream[LateEvent], () => Seq[LatenessCell]) => Unit)
      : Unit = {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[LateEvent](97, spark, None)
      val q = StreamLateness.cells(in.toDS())
        .writeStream.outputMode("update")
        .format("memory").queryName("lateness")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-lateness").toString)
        .start()
      def all(): Seq[LatenessCell] = {
        q.processAllAvailable()
        spark.table("lateness").as[LatenessCell].collect().toSeq
      }
      body(in, all _)
      q.stop()
    } finally spark.conf.unset(key)
  }

  /** Live histogram = last n_total per (key, bucket). */
  private def live(cells: Seq[LatenessCell]): Map[(String, Long), Long] =
    cells.groupBy(c => (c.key, c.bucket))
      .view.mapValues(_.last.n_total).toMap

  test("log2 buckets: on-time, 100 ms and 6 s lateness, worst tracked") {
    run { (in, all) =>
      // event_id order: 10s (first, on time), 4s (late 6000 → bucket
      // 13: 4096 ≤ 6000 < 8192), 10.4s (late… max is 10s → on time?
      // no: 10400 > 10000 → on time, advances max), 10.3s (late 100 →
      // bucket 7: 64 ≤ 100 < 128)
      in.addData(ev("k", 1, 10000L), ev("k", 2, 4000L),
        ev("k", 3, 10400L), ev("k", 4, 10300L))
      val cells = all()
      val h = live(cells)
      assert(h(("k", 0L)) === 2L)   // ids 1 and 3
      assert(h(("k", 13L)) === 1L)  // 6000 ms late
      assert(h(("k", 7L)) === 1L)   // 100 ms late
      assert(cells.map(_.worst_ms).max === 6000L)
    }
  }

  test("arrival scrambled within a batch applies in event_id order") {
    run { (in, all) =>
      // same rows as above, scrambled — identical cells
      in.addData(ev("k", 4, 10300L), ev("k", 1, 10000L),
        ev("k", 2, 4000L), ev("k", 3, 10400L))
      val h = live(all())
      assert(h(("k", 0L)) === 2L && h(("k", 13L)) === 1L
        && h(("k", 7L)) === 1L)
    }
  }

  test("cross-batch: lateness vs the running max; totals accumulate") {
    run { (in, all) =>
      in.addData(ev("k", 1, 10000L), ev("x", 2, 50000L))
      all()
      // 1s arrives a batch later: late 9000 vs k's max → bucket 14
      // (8192 ≤ 9000 < 16384); x's max (50s) must not bleed into k
      in.addData(ev("k", 3, 1000L))
      val cells = all()
      val h = live(cells)
      assert(h(("k", 14L)) === 1L)
      assert(h(("k", 0L)) === 1L && h(("x", 0L)) === 1L)
      assert(cells.filter(_.key == "k").map(_.worst_ms).max === 9000L)
    }
  }

  test("delta emission: only touched buckets emit, deltas sum to totals") {
    run { (in, all) =>
      in.addData(ev("k", 1, 1000L), ev("k", 2, 2000L))
      val first = all()
      assert(first.map(_.bucket).distinct === Seq(0L))
      in.addData(ev("k", 3, 3000L))
      val second = all().drop(first.size)
      // second batch touches only bucket 0 with delta 1, total 3
      assert(second === Seq(LatenessCell("k", 0L, 1L, 3L, 0L)))
    }
  }
}
