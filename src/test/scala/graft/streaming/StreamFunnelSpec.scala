package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** §2#201: streaming windowed funnel — completion inline, abandonment
  * via event-time timers, one conversion per user, fresh journey after
  * expiry. */
class StreamFunnelSpec extends SparkSuite {
  import spark.implicits._

  private val hourMs = 3600000L
  private val dayMs = 24L * hourMs

  // all times ride on a base offset: a row AT the initial watermark
  // (epoch 0) is dropped as late before the processor ever sees it
  private val baseMs = 30L * 24 * 3600000L
  private def ev(u: Long, step: String, ms: Long) =
    FunnelEvent(u, step, new Timestamp(baseMs + ms))

  private def run(body: (MemoryStream[FunnelEvent],
      () => Seq[FunnelOutcome]) => Unit): Unit = {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[FunnelEvent](91, spark, None)
      val name = "streamfunnel" + math.abs(in.hashCode())
      val q = StreamFunnel.outcomes(in.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-sfunnel").toString)
        .start()
      def emitted(): Seq[FunnelOutcome] = {
        q.processAllAvailable()
        spark.table(name).as[FunnelOutcome].collect().toSeq
      }
      body(in, emitted _)
      q.stop()
    } finally spark.conf.unset(key)
  }

  test("in-window chain completes inline; out-of-order within a batch is sorted first") {
    run { (in, emitted) =>
      // delivered out of order inside one batch; event-time order is
      // signup -> click -> purchase, each within the 24h step window
      in.addData(
        ev(1, "purchase", 2 * hourMs),
        ev(1, "signup", 0),
        ev(1, "click", hourMs))
      val got = emitted().filter(_.user_id == 1L)
      assert(got === Seq(FunnelOutcome(1L, "completed", baseMs * 1000L,
        (baseMs + 2 * hourMs) * 1000L, 3L)))
      // a second full chain for the same user must NOT double-convert
      in.addData(ev(1, "signup", 3 * hourMs), ev(1, "click", 4 * hourMs),
        ev(1, "purchase", 5 * hourMs))
      assert(emitted().count(_.user_id == 1L) === 1)
    }
  }

  test("a missed step deadline emits expired_at_<step> by timer; the user can start over") {
    run { (in, emitted) =>
      in.addData(ev(2, "signup", 0))
      assert(emitted().count(_.user_id == 2L) === 0, "nothing due yet")
      // another user's far-future activity drags the watermark past
      // user 2's click deadline (signup + 24h); one more batch fires it
      in.addData(ev(9, "signup", 2 * dayMs))
      emitted()
      in.addData(ev(9, "click", 2 * dayMs + 1000))
      val expired = emitted().filter(_.user_id == 2L)
      assert(expired === Seq(FunnelOutcome(2L, "expired_at_click",
        baseMs * 1000L, baseMs * 1000L, 1L)), s"got $expired")
      // post-expiry, a fresh in-window chain converts normally
      in.addData(ev(2, "signup", 3 * dayMs), ev(2, "click", 3 * dayMs + 1),
        ev(2, "purchase", 3 * dayMs + 2))
      val after = emitted().filter(_.user_id == 2L)
      assert(after.map(_.outcome).sorted === Seq("completed", "expired_at_click"))
    }
  }

  test("late steps and wrong-order steps never advance the machine") {
    run { (in, emitted) =>
      // click BEFORE any signup: ignored entirely
      in.addData(ev(3, "click", 0))
      // signup, then a click 25h later — outside the step window
      in.addData(ev(3, "signup", hourMs))
      in.addData(ev(3, "click", hourMs + dayMs + 60000))
      assert(emitted().count(o => o.user_id == 3L && o.outcome == "completed") === 0)
      // a purchase while click is still pending: ignored, not an advance
      in.addData(ev(4, "signup", 0), ev(4, "purchase", hourMs))
      assert(emitted().count(o => o.user_id == 4L && o.outcome == "completed") === 0)
    }
  }
}
