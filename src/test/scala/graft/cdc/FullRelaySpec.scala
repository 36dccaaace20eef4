package graft.cdc

import java.nio.file.Files
import graft.SparkSuite

/** The ENTIRE reference relay, end to end and offline: a scripted
  * CockroachDB changefeed (java.sql proxies) is tailed into the
  * segment log, streamed through the `graft-changefeed` DSv2 source,
  * classified + enveloped by the pipeline, and published over REAL
  * AMQP 0-9-1 frames to an in-process broker — database to message
  * queue, exactly the reference's main loop (main.rs:203-231), with
  * real protocol bytes on both network edges and Spark Structured
  * Streaming in the middle. */
class FullRelaySpec extends SparkSuite {
  import ScriptedJdbc._

  test("JDBC feed -> tail -> log -> DSv2 stream -> AMQP broker") {
    val logDir = Files.createTempDirectory("relay-log").toString
    val tailStore = new InMemoryCursorStore(
      "relay-tail-" + java.util.UUID.randomUUID)
    val hourUs = 3600000000L
    val feed = Seq(
      change(1, hourUs + 10), change(2, hourUs + 20), resolvedRow(2 * hourUs),
      change(3, 2 * hourUs + 10), resolvedRow(3 * hourUs))
    val db = new ScriptedDb(Seq(Right(resultSet(feed))))
    val tail = new JdbcChangefeedTail(db.connect, "events", logDir, tailStore,
      hlcWallDivisor = 1L)
    val stats = tail.runOnce()
    assert(stats.rowsIngested === 3 && stats.segmentsWritten === 2)

    val broker = new FakeAmqpBroker
    try {
      val pubStore = new InMemoryCursorStore(
        "relay-pub-" + java.util.UUID.randomUUID)
      val pipeline = new ChangefeedPipeline(
        new AmqpQueue(s"amqp://127.0.0.1:${broker.port}/changes"),
        pubStore, Files.createTempDirectory("relay-ckpt").toString)
      val q = pipeline.startFromLog(spark, logDir)
      q.processAllAvailable(); q.stop()

      val got = broker.awaitPublished(3)
      assert(broker.error == null, s"broker error: ${broker.error}")
      assert(got.map(_._1).toSet === Set("changes"))
      val bodies = got.map(_._2)
      assert(bodies.forall(_.startsWith("""{"table":"events","key":"[""")))
      // raw changefeed values ride inside the envelope untouched
      assert(bodies.exists(b => b.contains(""""key":"[1]"""") &&
        b.contains(""""after": {"event_id": 1}""")))
      assert(bodies.exists(_.contains(""""key":"[3]"""")))
      // both edges agree on the cursor: the tail committed what it
      // ingested, the publisher committed what it relayed
      assert(tailStore.get() === Some((3 * hourUs).toString))
      assert(pubStore.get() === Some((3 * hourUs).toString))
      assert(pipeline.messagesSent.value === 3L)
    } finally broker.stop()
  }
}
