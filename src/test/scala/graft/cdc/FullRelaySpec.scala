package graft.cdc

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.functions._

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

  test("multi-table relay: ONE process, queue-per-table routing, one shared cursor") {
    // the reference binds one process per table (cli.yml); this is the
    // consolidated form — one multi-table changefeed statement, one
    // log, one pipeline, one cursor, queue-per-table at the publish
    // edge (the streaming twin of cdc_table_router #156)
    val logDir = Files.createTempDirectory("mt-relay-log").toString
    val tailStore = new InMemoryCursorStore(
      "mt-tail-" + java.util.UUID.randomUUID)
    val hourUs = 3600000000L
    def row(tbl: String, k: Long, us: Long): Row =
      (Some(tbl), Some(s"[$k]"),
        s"""{"after": {"id": $k}, "updated": "$us.0000000000"}""")
    val feed = Seq(
      row("events", 1, hourUs + 10), row("orders", 100, hourUs + 20),
      row("events", 2, hourUs + 30), resolvedRow(2 * hourUs),
      row("orders", 101, 2 * hourUs + 10), row("events", 3, 2 * hourUs + 20),
      resolvedRow(3 * hourUs))
    val db = new ScriptedDb(Seq(Right(resultSet(feed))))
    // ONE statement tails BOTH tables — the multi-table changefeed form
    val tail = new JdbcChangefeedTail(db.connect, "events, orders", logDir,
      tailStore, hlcWallDivisor = 1L)
    val stats = tail.runOnce()
    assert(db.sqls.head.startsWith(
      "EXPERIMENTAL CHANGEFEED FOR events, orders WITH updated"))
    assert(stats.rowsIngested === 5 && stats.resolvedSeen === 2)

    val run = java.util.UUID.randomUUID.toString.take(8)
    val pubStore = new InMemoryCursorStore(s"mt-pub-$run")
    val pipeline = new ChangefeedPipeline(
      new InMemoryQueue(s"mt-$run-unused"), pubStore,
      Files.createTempDirectory("mt-ckpt").toString,
      tableRouter = Some((t: String) => new InMemoryQueue(s"mt-$run-$t")))
    val q = pipeline.startFromLog(spark, logDir)
    q.processAllAvailable(); q.stop()

    // the batch router ledger over the SAME log is the truth the live
    // relay must match: per-table message counts from one narrow scan
    val ledger = spark.read.format("graft-changefeed").option("path", logDir)
      .load().where(col("tbl").isNotNull)
      .groupBy(col("tbl")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ledger === Map("events" -> 3L, "orders" -> 2L))
    val evMsgs = InMemoryQueue.messages(s"mt-$run-events")
    val orMsgs = InMemoryQueue.messages(s"mt-$run-orders")
    assert(evMsgs.size.toLong === ledger("events") &&
      orMsgs.size.toLong === ledger("orders"),
      s"queue counts ${evMsgs.size}/${orMsgs.size} != ledger $ledger")
    // routing is by the row's OWN table tag, envelopes intact
    assert(evMsgs.forall(_.startsWith("""{"table":"events"""")))
    assert(orMsgs.forall(_.startsWith("""{"table":"orders"""")))
    assert(InMemoryQueue.messages(s"mt-$run-unused").isEmpty,
      "routed mode must not publish to the default queue")
    // one shared cursor for the whole multi-table relay, at the last
    // resolved both edges agree on
    assert(tailStore.get() === Some((3 * hourUs).toString))
    assert(pubStore.get() === Some((3 * hourUs).toString))
    assert(pipeline.messagesSent.value === 5L)
  }

  test("GraftMain with --table list and a {table} queue placeholder routes end-to-end") {
    val logDir = Files.createTempDirectory("mt-main-log").toString
    val hourUs = 3600000000L
    def row(tbl: String, k: Long, us: Long): Row =
      (Some(tbl), Some(s"[$k]"),
        s"""{"after": {"id": $k}, "updated": "${us}.0000000000"}""")
    // nanos feed — GraftMain wires the production hlcWallDivisor
    val feed = Seq(
      row("events", 1, (hourUs + 10) * 1000),
      row("orders", 100, (hourUs + 20) * 1000),
      resolvedRow(2 * hourUs * 1000))
    val db = new ScriptedDb(Seq(Right(resultSet(feed))))
    val driver = fakeDriver(db, "jdbc:graft-mt:")
    java.sql.DriverManager.registerDriver(driver)
    try {
      val run = java.util.UUID.randomUUID.toString.take(8)
      val metrics = GraftMain.run(spark, GraftConfig.fromArgs(Seq(
        "--table", "events,orders",
        "--queue", s"inmemory:mtm-$run-{table}",
        "--cursor-store", s"inmemory:mtm-$run-cursor",
        "--log-dir", logDir,
        "--database", "jdbc:graft-mt:db",
        "--once", "true")))
      assert(db.sqls.head.contains("CHANGEFEED FOR events,orders"))
      assert(InMemoryQueue.messages(s"mtm-$run-events").size === 1)
      assert(InMemoryQueue.messages(s"mtm-$run-orders").size === 1)
      assert(metrics.contains("messages_sent 2"))
    } finally java.sql.DriverManager.deregisterDriver(driver)
  }
}
