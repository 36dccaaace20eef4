package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class TimerSessionsSpec extends SparkSuite {
  import spark.implicits._

  test("event-time timer closes an idle session when the watermark passes") {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val hourMs = 3600000L
      def ev(user: Long, id: Long, ms: Long) =
        TimedEvent(user, id, new Timestamp(ms))
      val in = MemoryStream[TimedEvent](31, spark, None)
      val q = TimerSessions.closed(in.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName("timersessions")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-tsess").toString)
        .start()

      // user 1: two events 5 min apart, then silence FOREVER
      in.addData(ev(1, 1, hourMs), ev(1, 2, hourMs + 300000))
      q.processAllAvailable()
      assert(spark.table("timersessions").isEmpty) // watermark hasn't moved

      // a DIFFERENT user's much-later event advances the watermark past
      // user 1's idle deadline — the TIMER must close user 1's session
      // even though no user-1 data ever arrives again
      in.addData(ev(2, 3, 10 * hourMs))
      q.processAllAvailable()
      in.addData(ev(2, 4, 10 * hourMs + 1000)) // one more batch to fire timers
      q.processAllAvailable()
      val out = spark.table("timersessions").as[TimerSession].collect()
      q.stop()
      val u1 = out.filter(_.user_id == 1L)
      assert(u1.length === 1, s"expected one closed session, got ${out.toSeq}")
      assert(u1.head === TimerSession(1L, 2L, hourMs * 1000L,
        (hourMs + 300000) * 1000L, "timer"))
      // user 2's session is still open (watermark never passed its deadline)
      assert(!out.exists(_.user_id == 2L))
    } finally {
      spark.conf.unset(key)
    }
  }

  test("cross-batch out-of-order event merges without regressing end_us") {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val hourMs = 3600000L
      val minMs = 60000L
      def ev(user: Long, id: Long, ms: Long) =
        TimedEvent(user, id, new Timestamp(ms))
      val in = MemoryStream[TimedEvent](35, spark, None)
      val q = TimerSessions.closed(in.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName("timersessions3")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-tsess3").toString)
        .start()
      // batch 1: session spans [1h, 1h20m]; watermark advances to 1h10m
      in.addData(ev(5, 1, hourMs), ev(5, 2, hourMs + 20 * minMs))
      q.processAllAvailable()
      // batch 2: out-of-order event at 1h12m — newer than the watermark,
      // OLDER than the stored end_us. It must merge WITHOUT regressing
      // end_us (the bug: end_us = us re-armed the timer early and emitted
      // a session whose end was not the max event time).
      in.addData(ev(5, 3, hourMs + 12 * minMs))
      q.processAllAvailable()
      // advance the watermark far past the idle deadline; timer fires
      in.addData(ev(2, 9, 10 * hourMs))
      q.processAllAvailable()
      in.addData(ev(2, 10, 10 * hourMs + 1000))
      q.processAllAvailable()
      val out = spark.table("timersessions3").as[TimerSession].collect()
      q.stop()
      val u5 = out.filter(_.user_id == 5L)
      assert(u5.length === 1, s"expected one closed session, got ${out.toSeq}")
      assert(u5.head === TimerSession(5L, 3L, hourMs * 1000L,
        (hourMs + 20 * minMs) * 1000L, "timer"))
    } finally {
      spark.conf.unset(key)
    }
  }

  test("consecutive late stragglers merge into one gap-closed session") {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val hourMs = 3600000L
      val minMs = 60000L
      def ev(user: Long, id: Long, ms: Long) =
        TimedEvent(user, id, new Timestamp(ms))
      val in = MemoryStream[TimedEvent](36, spark, None)
      // gap (2 min) SMALLER than the 10-min watermark delay: late events
      // can be admitted that are >gap before the stored session
      val q = TimerSessions.closed(in.toDS(), gapUs = 2 * minMs * 1000L)
        .writeStream.outputMode("append")
        .format("memory").queryName("timersessions4")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-tsess4").toString)
        .start()
      // batch 1: stored session [1h, 1h]
      in.addData(ev(7, 1, hourMs))
      q.processAllAvailable()
      // batch 2: two stragglers at 1h-9m and 1h-8m — both newer than the
      // watermark (1h-10m), both >gap before the stored start, within
      // gap of EACH OTHER: correct sessionization yields ONE two-event
      // "gap" session (the bug emitted two singletons)
      in.addData(ev(7, 2, hourMs - 9 * minMs), ev(7, 3, hourMs - 8 * minMs))
      q.processAllAvailable()
      val out = spark.table("timersessions4").as[TimerSession].collect()
      q.stop()
      val straggler = out.filter(r => r.user_id == 7L && r.closed_by == "gap")
      assert(straggler.length === 1, s"expected one straggler session, got ${out.toSeq}")
      assert(straggler.head === TimerSession(7L, 2L,
        (hourMs - 9 * minMs) * 1000L, (hourMs - 8 * minMs) * 1000L, "gap"))
    } finally {
      spark.conf.unset(key)
    }
  }

  test("in-batch gap split closes the earlier session inline") {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val hourMs = 3600000L
      def ev(user: Long, id: Long, ms: Long) =
        TimedEvent(user, id, new Timestamp(ms))
      val in = MemoryStream[TimedEvent](32, spark, None)
      val q = TimerSessions.closed(in.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName("timersessions2")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-tsess2").toString)
        .start()
      // one batch containing a > 30 min gap for the same user
      in.addData(ev(7, 1, hourMs), ev(7, 2, hourMs + 60000),
        ev(7, 3, 3 * hourMs))
      q.processAllAvailable()
      val out = spark.table("timersessions2").as[TimerSession].collect()
      q.stop()
      assert(out.toSeq === Seq(TimerSession(7L, 2L, hourMs * 1000L,
        (hourMs + 60000) * 1000L, "gap")))
    } finally {
      spark.conf.unset(key)
    }
  }
}
