package graft.cdc

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement, ResultSet, SQLException, Statement}
import java.nio.file.Files
import graft.sources.ChangefeedLog

/** A scripted java.sql database for [[JdbcCursorStore]]: interprets the
  * store's three statements (DDL / SELECT / UPSERT-or-ON-CONFLICT)
  * against an in-memory map, records every SQL text, counts
  * connections opened vs closed, and can throw a scripted
  * SQLException. Optionally also serves a scripted changefeed (the
  * `EXPERIMENTAL CHANGEFEED` executeQuery path) so ONE fake database
  * can play the reference's single-CockroachDB role: feed AND cursor
  * store behind the same URL (main.rs:57-63). */
private[cdc] class FakeCursorDb(
    feedScript: Seq[Either[SQLException, Seq[ScriptedJdbc.Row]]] = Nil) {
  val cursors = scala.collection.concurrent.TrieMap.empty[String, String]
  val sqls = scala.collection.mutable.ArrayBuffer.empty[String]
  var ddlCount = 0
  var opened = 0
  var closed = 0
  var failNextWith: SQLException = null
  private var feedCalls = 0

  private def maybeFail(): Unit =
    if (failNextWith != null) { val e = failNextWith; failNextWith = null; throw e }

  private def prepared(sql: String): PreparedStatement = {
    val params = scala.collection.mutable.HashMap.empty[Int, String]
    val h = new InvocationHandler {
      override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
        m.getName match {
          case "setString" =>
            params(args(0).asInstanceOf[Integer].intValue) =
              args(1).asInstanceOf[String]
            null
          case "executeQuery" =>
            maybeFail()
            require(sql.startsWith("SELECT cursor FROM cursor_store"),
              s"unexpected query: $sql")
            val row = cursors.get(params(1))
            var served = false
            val rsH = new InvocationHandler {
              override def invoke(p2: Any, m2: Method, a2: Array[AnyRef]): AnyRef =
                m2.getName match {
                  case "next" =>
                    val has = row.isDefined && !served
                    served = true
                    java.lang.Boolean.valueOf(has)
                  case "getString" => row.orNull
                  case "close" => null
                  case "toString" => "fake-cursor-resultset"
                  case other =>
                    throw new AssertionError(s"unexpected ResultSet.$other")
                }
            }
            Proxy.newProxyInstance(getClass.getClassLoader,
              Array(classOf[ResultSet]), rsH)
          case "executeUpdate" =>
            maybeFail()
            require(sql.contains("INTO cursor_store"), s"unexpected update: $sql")
            cursors(params(1)) = params(2)
            java.lang.Integer.valueOf(1)
          case "close" => null
          case "toString" => "fake-cursor-prepared"
          case other =>
            throw new AssertionError(s"unexpected PreparedStatement.$other")
        }
    }
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[PreparedStatement]), h).asInstanceOf[PreparedStatement]
  }

  private def statement(): Statement = {
    val h = new InvocationHandler {
      override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
        m.getName match {
          case "execute" => // DDL
            sqls += args(0).asInstanceOf[String]
            ddlCount += 1
            java.lang.Boolean.valueOf(false)
          case "executeQuery" => // the changefeed tail's statement
            sqls += args(0).asInstanceOf[String]
            val r = feedScript(feedCalls); feedCalls += 1
            r match {
              case Left(e) => throw e
              case Right(rows) => ScriptedJdbc.resultSet(rows)
            }
          case "close" => null
          case "toString" => "fake-cursor-statement"
          case other => throw new AssertionError(s"unexpected Statement.$other")
        }
    }
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[Statement]), h).asInstanceOf[Statement]
  }

  val connect: () => Connection = () => {
    opened += 1
    val h = new InvocationHandler {
      override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
        m.getName match {
          case "createStatement" => statement()
          case "prepareStatement" =>
            sqls += args(0).asInstanceOf[String]
            prepared(args(0).asInstanceOf[String])
          case "close" => closed += 1; null
          case "isClosed" => java.lang.Boolean.valueOf(false)
          case "toString" => "fake-cursor-connection"
          case other => throw new AssertionError(s"unexpected Connection.$other")
        }
    }
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[Connection]), h).asInstanceOf[Connection]
  }
}

/** §2: the reference's CrdbCursorStore (cursors.rs:13-58) re-expressed
  * over injectable JDBC — statement fidelity, latest-wins upsert,
  * restart-resume durability, per-op connection discipline, error
  * propagation, DriverManager + GraftConfig wiring, and the tail
  * integration incl. the GC-threshold cursor-drop path. */
class JdbcCursorStoreSpec extends graft.SparkSuite {
  import ScriptedJdbc.{change, resolvedRow}

  test("reference statements: DDL once per store, SELECT miss -> None, UPSERT latest-wins") {
    val db = new FakeCursorDb
    val store = new JdbcCursorStore(db.connect)
    assert(store.get() === None)
    store.set("1000")
    store.set("2000") // upsert overwrites, never duplicates
    assert(store.get() === Some("2000"))
    assert(db.ddlCount === 1, "CREATE TABLE IF NOT EXISTS must run once per store")
    assert(db.sqls.head === JdbcCursorStore.ddl)
    assert(db.sqls.count(_.startsWith("UPSERT INTO cursor_store (key, cursor)")) === 2)
    assert(db.sqls.count(_.startsWith("SELECT cursor FROM cursor_store")) === 2)
    assert(db.cursors.size === 1, "one key, one row — the UPSERT contract")
  }

  test("restart-resume: a fresh store instance reads the committed cursor (durability = the database)") {
    val db = new FakeCursorDb
    new JdbcCursorStore(db.connect).set("777")
    val restarted = new JdbcCursorStore(db.connect)
    assert(restarted.get() === Some("777"))
    assert(db.ddlCount === 2, "each instance re-ensures the table (IF NOT EXISTS)")
  }

  test("postgres dialect: INSERT ... ON CONFLICT instead of UPSERT") {
    val db = new FakeCursorDb
    val store = new JdbcCursorStore(db.connect,
      dialect = JdbcCursorStore.Postgres)
    store.set("1")
    assert(db.sqls.exists(_.contains("ON CONFLICT (key) DO UPDATE")))
    assert(!db.sqls.exists(_.startsWith("UPSERT")))
    assert(store.get() === Some("1"))
    intercept[IllegalArgumentException](
      new JdbcCursorStore(db.connect, dialect = "oracle"))
  }

  test("keys partition the table: publish and tail cursors coexist") {
    val db = new FakeCursorDb
    val pub = new JdbcCursorStore(db.connect) // reference key = 'key'
    val tail = new JdbcCursorStore(db.connect, key = "tail:events")
    pub.set("100"); tail.set("200")
    assert(pub.get() === Some("100") && tail.get() === Some("200"))
    assert(db.cursors === scala.collection.concurrent.TrieMap(
      "key" -> "100", "tail:events" -> "200"))
  }

  test("errors propagate, the next op runs on a fresh connection, none leak") {
    val db = new FakeCursorDb
    val store = new JdbcCursorStore(db.connect)
    store.set("1")
    db.failNextWith = new SQLException("connection refused")
    intercept[SQLException](store.set("2"))
    assert(store.get() === Some("1"), "failed set must not half-commit")
    store.set("3")
    assert(store.get() === Some("3"))
    assert(db.opened === db.closed,
      s"leaked connections: opened ${db.opened}, closed ${db.closed}")
    assert(db.opened === 5, "one fresh connection per operation")
  }

  test("forUrl: DriverManager wiring works (registered fake driver)") {
    val db = new FakeCursorDb
    val driver = ScriptedJdbc.fakeDriver(
      new ScriptedJdbc.ScriptedDb(Nil) { override val connect = db.connect },
      "jdbc:graft-cursor:")
    java.sql.DriverManager.registerDriver(driver)
    try {
      val store = JdbcCursorStore.forUrl("jdbc:graft-cursor:db")
      store.set("42")
      assert(store.get() === Some("42"))
    } finally java.sql.DriverManager.deregisterDriver(driver)
  }

  test("GraftConfig routing: jdbc:<url> spec, bare cockroachdb via --database, tail key") {
    val jdbcCfg = GraftConfig(table = "events",
      cursorStore = "jdbc:graft-cursor:db")
    assert(jdbcCfg.newCursorStore().isInstanceOf[JdbcCursorStore])
    assert(jdbcCfg.newTailCursorStore("/tmp/x").isInstanceOf[JdbcCursorStore])

    // the reference's cli value: cursor store lives in DATABASE_URL's db
    val crdbCfg = GraftConfig(table = "events", cursorStore = "cockroachdb",
      database = Some("jdbc:graft-cursor:db"))
    assert(crdbCfg.newCursorStore().isInstanceOf[JdbcCursorStore])
    // without a database the reference shape is unconfigurable
    intercept[IllegalArgumentException](
      GraftConfig(table = "events", cursorStore = "cockroachdb").newCursorStore())

    // env precedence: DATABASE_URL + cursor-store cockroachdb — the
    // reference's exact deployment (main.rs:57-63)
    val envCfg = GraftConfig.fromArgs(
      Seq("--table", "events", "--cursor-store", "cockroachdb"),
      Map("DATABASE_URL" -> "jdbc:graft-cursor:db"))
    assert(envCfg.database === Some("jdbc:graft-cursor:db"))
    assert(envCfg.newCursorStore().isInstanceOf[JdbcCursorStore])

    // non-jdbc stores keep the file fallback for the tail cursor
    val fileCfg = GraftConfig(table = "events", cursorStore = "inmemory:x")
    assert(fileCfg.newTailCursorStore("/tmp/x").isInstanceOf[FileCursorStore])
  }

  test("tail + jdbc store: resume from the DB cursor; GC threshold restarts from now and the DB cursor moves on") {
    val logDir = Files.createTempDirectory("jdbc-cursor-tail").toString
    val db = new FakeCursorDb(feedScript = Seq(
      Left(new SQLException(
        "batch timestamp must be after replica GC threshold")),
      Right(Seq(change(9, 9010), resolvedRow(9100)))))
    val store = new JdbcCursorStore(db.connect, key = "tail:events")
    store.set("100") // the stale cursor a long-stopped relay left behind
    val tail = new JdbcChangefeedTail(db.connect, "events", logDir, store,
      hlcWallDivisor = 1L)
    val stats = tail.runOnce()
    assert(stats.gcRestarts === 1)
    val feedSqls = db.sqls.filter(_.startsWith("EXPERIMENTAL CHANGEFEED"))
    assert(feedSqls.size === 2)
    assert(feedSqls(0).contains("cursor = '100.0000000000'"),
      "first attempt must resume from the DB cursor")
    assert(!feedSqls(1).contains("cursor"), "GC restart must drop the cursor")
    assert(store.get() === Some("9100"),
      "the next resolved overwrites the dropped cursor in the DB")
    assert(db.opened === db.closed)
  }

  test("chaos: cursor commit fails mid-stream — batch replays on restart, at-least-once, cursor lands") {
    val logDir = Files.createTempDirectory("jdbc-cursor-chaos").toString
    val hourUs = 3600000000L
    graft.sources.ChangefeedLog.writeSegment(logDir, Seq(
      ChangefeedLog.Record(hourUs + 10, Some("events"), Some("[1]"),
        """{"after": {"event_id": 1}}"""),
      ChangefeedLog.Record(2 * hourUs, None, None,
        s"""{"resolved": "${2 * hourUs}.0000000000"}""")))
    val db = new FakeCursorDb
    val store = new JdbcCursorStore(db.connect)
    val qname = "cursor-chaos-" + java.util.UUID.randomUUID
    val ckpt = Files.createTempDirectory("jdbc-chaos-ckpt").toString
    val pipeline = new ChangefeedPipeline(new InMemoryQueue(qname), store, ckpt)
    val q = pipeline.startFromLog(spark, logDir)
    // the database dies between the batch's publishes and its commit
    db.failNextWith = new java.sql.SQLException("connection reset by peer")
    intercept[Exception](q.processAllAvailable())
    q.stop()
    // crash ordering: publishes happened, the cursor did NOT commit —
    // at-least-once into the queue, never lost-and-committed
    assert(InMemoryQueue.messages(qname).size === 1)
    assert(store.get() === None, "a failed commit must not half-land")

    // operator restart from the same checkpoint: the failed batch
    // REPLAYS (redelivering its messages) and the commit lands
    val retry = new ChangefeedPipeline(new InMemoryQueue(qname), store, ckpt)
    val q2 = retry.startFromLog(spark, logDir)
    q2.processAllAvailable(); q2.stop()
    assert(store.get() === Some((2 * hourUs).toString))
    assert(InMemoryQueue.messages(qname).size === 2,
      "the replayed batch redelivers — the documented at-least-once")
    assert(db.opened === db.closed)
  }

  test("GraftMain e2e: one process, jdbc feed + jdbc cursor store (the reference binary's shape)") {
    val logDir = Files.createTempDirectory("jdbc-e2e-log").toString
    val hourUs = 3600000000L
    // the feed speaks NANOS like a real CockroachDB (GraftMain wires the
    // production hlcWallDivisor = 1000); the log/cursors land in µs
    val db = new FakeCursorDb(feedScript = Seq(Right(Seq(
      change(1, (hourUs + 10) * 1000), change(2, (hourUs + 20) * 1000),
      resolvedRow(2 * hourUs * 1000)))))
    val driver = ScriptedJdbc.fakeDriver(
      new ScriptedJdbc.ScriptedDb(Nil) { override val connect = db.connect },
      "jdbc:graft-e2e:")
    java.sql.DriverManager.registerDriver(driver)
    try {
      val qName = "jdbc-e2e-" + java.util.UUID.randomUUID
      val metrics = GraftMain.run(spark, GraftConfig.fromArgs(Seq(
        "--table", "events",
        "--queue", s"inmemory:$qName",
        "--cursor-store", "cockroachdb",
        "--log-dir", logDir,
        "--once", "true"),
        Map("DATABASE_URL" -> "jdbc:graft-e2e:db")))
      // both cursors live in the one cursor_store table, split by key —
      // ingested-up-to and published-up-to both at the resolved ts
      assert(db.cursors.get("tail:events") === Some((2 * hourUs).toString))
      assert(db.cursors.get("key") === Some((2 * hourUs).toString))
      // the two change rows were relayed to the queue
      assert(InMemoryQueue.messages(qName).size === 2)
      assert(metrics.contains("messages_sent 2"))
      assert(ChangefeedLog.listSegments(logDir).nonEmpty)
      assert(db.opened === db.closed)
    } finally java.sql.DriverManager.deregisterDriver(driver)
  }
}
