package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** §2#230: per-key token-bucket rate limiting — event-time refill,
  * replay-deterministic verdicts, O(keys) state. */
class StreamRateLimitSpec extends SparkSuite {
  import spark.implicits._

  private def ev(key: String, id: Long, ms: Long) =
    RateEvent(key, id, new Timestamp(ms))

  private def run(capacity: Long, rate: Long)
      (body: (MemoryStream[RateEvent], () => Seq[RateVerdict]) => Unit): Unit = {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[RateEvent](83, spark, None)
      val q = StreamRateLimit.admissions(in.toDS(), capacity, rate)
        .writeStream.outputMode("append")
        .format("memory").queryName("ratelimit")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-ratelimit").toString)
        .start()
      def emitted(): Seq[RateVerdict] = {
        q.processAllAvailable()
        spark.table("ratelimit").as[RateVerdict].collect().toSeq
      }
      body(in, emitted _)
      q.stop()
    } finally spark.conf.unset(key)
  }

  test("burst drains the bucket, event-time refill re-admits") {
    run(capacity = 3, rate = 1) { (in, emitted) =>
      // burst of 5 at the same instant: exactly capacity admitted,
      // event_id order breaks the tie deterministically
      in.addData((1L to 5L).map(i => ev("k", i, 10000L)): _*)
      val e1 = emitted().sortBy(_.event_id)
      assert(e1.map(_.admitted) === Seq(true, true, true, false, false))
      assert(e1.last.tokens_m === 0L)

      // +2 s of event time at 1 token/s: exactly 2 more admissions
      in.addData(ev("k", 6, 12000L), ev("k", 7, 12000L), ev("k", 8, 12000L))
      val e2 = emitted().sortBy(_.event_id).drop(5)
      assert(e2.map(_.admitted) === Seq(true, true, false))
    }
  }

  test("within-batch order is (ts, event_id), not arrival order") {
    run(capacity = 1, rate = 1) { (in, emitted) =>
      // arrival order 9 then 2 — the EARLIER ts must win the one token
      in.addData(ev("k", 9, 5000L), ev("k", 2, 1000L))
      val got = emitted().map(v => v.event_id -> v.admitted).toMap
      // id 2 (ts 1s) admitted first; by id 9's ts (5s) 4 s refilled 4
      // tokens against capacity 1 → also admitted
      assert(got(2L) === true && got(9L) === true)

      // same instant, capacity exhausted: smaller id wins
      in.addData(ev("k2", 20, 1000L), ev("k2", 10, 1000L))
      val g2 = emitted().filter(_.key == "k2").map(v => v.event_id -> v.admitted).toMap
      assert(g2(10L) === true && g2(20L) === false)
    }
  }

  test("regressing timestamps never mint tokens; keys are independent") {
    run(capacity = 2, rate = 1) { (in, emitted) =>
      in.addData(ev("a", 1, 10000L), ev("a", 2, 10000L)) // drain a
      emitted()
      // a replayed OLD event (ts regresses 5 s) must not refill
      in.addData(ev("a", 3, 5000L))
      val e = emitted().filter(_.key == "a").sortBy(_.event_id)
      assert(e.map(_.admitted) === Seq(true, true, false))
      // an untouched key still has its full bucket
      in.addData(ev("b", 4, 1000L))
      assert(emitted().filter(_.key == "b").head.admitted === true)
    }
  }

  test("cross-batch state: the budget holds across micro-batches") {
    run(capacity = 2, rate = 1) { (in, emitted) =>
      in.addData(ev("k", 1, 1000L), ev("k", 2, 1000L))
      assert(emitted().count(_.admitted) === 2)
      // NEXT batch, same event time: bucket is empty, nothing refilled
      in.addData(ev("k", 3, 1000L))
      val e = emitted().sortBy(_.event_id)
      assert(e.map(_.admitted) === Seq(true, true, false))
      // a windowed-count cap would reset here; the bucket must not
      in.addData(ev("k", 4, 1500L)) // +0.5 s = 500 milli-tokens < 1 token
      assert(emitted().sortBy(_.event_id).last.admitted === false)
      in.addData(ev("k", 5, 2100L)) // +1.1 s total ≥ 1 token
      assert(emitted().sortBy(_.event_id).last.admitted === true)
    }
  }
}
