package graft.cdc

import java.nio.file.Files

import graft.SparkSuite
import graft.sources.ChangefeedLog

/** GraftMain assembles config → pipeline-over-DSv2-source → metrics the
  * way the reference's main.rs does; drive the app body end-to-end in
  * drain (`--once`) mode. */
class GraftMainSpec extends SparkSuite {

  test("run wires config, pipeline, cursor store and metrics end-to-end") {
    val dir = Files.createTempDirectory("graft-main-log").toString
    ChangefeedLog.writeSegment(dir, Seq(
      ChangefeedLog.Record(10, Some("events"), Some("[1]"), "{\"after\": {\"event_id\": 1}}"),
      ChangefeedLog.Record(20, Some("events"), Some("[2]"), "{\"after\": {\"event_id\": 2}}"),
      ChangefeedLog.Record(30, None, None, "{\"resolved\": \"30.0000000000\"}")))

    val qname = "t-graft-main"
    InMemoryQueue.clear(qname)
    val cursorFile = Files.createTempDirectory("graft-main-cur").resolve("cursor")
    val cfg = GraftConfig.fromArgs(Seq(
      "--table", "events",
      "--log-dir", dir,
      "--queue", s"inmemory:$qname",
      "--cursor-store", s"file:$cursorFile",
      "--checkpoint-dir", Files.createTempDirectory("graft-main-ckpt").toString,
      "--metrics-port", "0",
      "--once", "true"))

    val metricsText = GraftMain.run(spark, cfg)

    assert(InMemoryQueue.messages(qname).size === 2) // the two change rows
    assert(new FileCursorStore(cursorFile.toString).get() === Some("30"))
    assert(metricsText.contains("messages_sent 2"))
    assert(metricsText.contains("cursors_committed 1"))
    assert(metricsText.contains("messages_dead_lettered 0"))
  }

  test("poison rows in the log land in the dead-letter queue end to end") {
    val dir = Files.createTempDirectory("graft-main-dlq-log").toString
    ChangefeedLog.writeSegment(dir, Seq(
      ChangefeedLog.Record(10, Some("events"), Some("[1]"), "{\"after\": {\"event_id\": 1}}"),
      ChangefeedLog.Record(15, Some("events"), Some("[2]"), "{\"afte"), // truncated
      ChangefeedLog.Record(30, None, None, "{\"resolved\": \"30.0000000000\"}")))
    val qname = "t-main-dlq"; val dname = "t-main-dlq-dead"
    InMemoryQueue.clear(qname); InMemoryQueue.clear(dname)
    val cfg = GraftConfig.fromArgs(Seq(
      "--table", "events",
      "--log-dir", dir,
      "--queue", s"inmemory:$qname",
      "--dead-letter-queue", s"inmemory:$dname",
      "--cursor-store", "inmemory:t-main-dlq",
      "--checkpoint-dir", Files.createTempDirectory("graft-main-dlq-ckpt").toString,
      "--metrics-port", "0",
      "--once", "true"))
    val metricsText = GraftMain.run(spark, cfg)
    assert(InMemoryQueue.messages(qname).size === 1)
    assert(InMemoryQueue.messages(dname) === Seq("{\"afte"))
    assert(metricsText.contains("messages_sent 1"))
    assert(metricsText.contains("messages_dead_lettered 1"))
    assert(new InMemoryCursorStore("t-main-dlq").get() === Some("30"))
  }

  test("changefeed queue scheme relays the log through the DSv2 sink") {
    val dir = Files.createTempDirectory("graft-main-relay-in").toString
    ChangefeedLog.writeSegment(dir, Seq(
      ChangefeedLog.Record(10, Some("events"), Some("[1]"), "{\"after\": {\"event_id\": 1}}"),
      ChangefeedLog.Record(20, Some("events"), Some("[2]"), "{\"after\": {\"event_id\": 2}}"),
      ChangefeedLog.Record(30, None, None, "{\"resolved\": \"30.0000000000\"}")))
    val out = Files.createTempDirectory("graft-main-relay-out").toString

    val cfg = GraftConfig.fromArgs(Seq(
      "--table", "events",
      "--log-dir", dir,
      "--queue", s"changefeed:$out",
      "--cursor-store", "inmemory:t-main-relay",
      "--checkpoint-dir", Files.createTempDirectory("graft-main-relay-ck").toString,
      "--once", "true"))
    val metricsText = GraftMain.run(spark, cfg)

    // downstream log carries exactly the change rows (resolved markers
    // are the upstream's bookkeeping, consumed into the cursor store)
    val relayed = ChangefeedLog.listSegments(out)
      .flatMap(s => ChangefeedLog.readSegment(s.path))
      .map(r => (r.sortUs, r.tbl, r.key)).sortBy(_._1)
    assert(relayed === Seq((10L, Some("events"), Some("[1]")),
      (20L, Some("events"), Some("[2]"))))
    assert(new InMemoryCursorStore("t-main-relay").get() === Some("30"))
    assert(metricsText.contains("messages_sent 2"))
  }

  test("--database runs the whole relay: tail ingests the feed, pipeline publishes") {
    val dir = Files.createTempDirectory("graft-main-db-log").toString
    // the scripted feed speaks NANOS HLCs — forUrl's CockroachDB
    // default divisor (1000) must land µs in the log
    val db = new ScriptedJdbc.ScriptedDb(Seq(Right(ScriptedJdbc.resultSet(Seq(
      ScriptedJdbc.change(1, 1010000), ScriptedJdbc.change(2, 1020000),
      ScriptedJdbc.resolvedRow(2000000))))))
    val driver = ScriptedJdbc.fakeDriver(db, "jdbc:graft-main-fake:")
    java.sql.DriverManager.registerDriver(driver)
    try {
      val qname = "t-main-db"
      InMemoryQueue.clear(qname)
      val cfg = GraftConfig.fromArgs(Seq(
        "--table", "events",
        "--log-dir", dir,
        "--database", "jdbc:graft-main-fake:db",
        "--queue", s"inmemory:$qname",
        "--cursor-store", "inmemory:t-main-db-cur",
        "--checkpoint-dir", Files.createTempDirectory("graft-main-db-ck").toString,
        "--cursor-frequency", "10s",
        "--once", "true"))
      val metricsText = GraftMain.run(spark, cfg)

      // the tail's statement carried the configured cursor frequency
      assert(db.sqls.head.contains("resolved = '10s'"))
      // feed rows crossed the whole app: DB → log → stream → queue
      val msgs = InMemoryQueue.messages(qname)
      assert(msgs.size === 2)
      assert(msgs.exists(_.contains("\"key\":\"[1]\"")))
      // publish cursor (µs) and the tail's own resume point both landed
      assert(new InMemoryCursorStore("t-main-db-cur").get() === Some("2000"))
      assert(new FileCursorStore(s"$dir/_tail_cursor").get() === Some("2000"))
      assert(metricsText.contains("messages_sent 2"))
    } finally java.sql.DriverManager.deregisterDriver(driver)
  }
}
