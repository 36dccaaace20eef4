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
