package graft.cdc

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, ResultSet, SQLException, Statement}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ChangefeedLog

/** Scripted java.sql proxies for driving [[JdbcChangefeedTail]] with no
  * database — shared by JdbcChangefeedTailSpec and FullRelaySpec. */
private[cdc] object ScriptedJdbc {

  /** One scripted feed row: (table, key, value) with NULLs as None. */
  type Row = (Option[String], Option[String], String)

  def change(k: Long, us: Long): Row =
    (Some("events"), Some(s"[$k]"),
      s"""{"after": {"event_id": $k}, "updated": "$us.0000000000"}""")
  def resolvedRow(us: Long): Row =
    (None, None, s"""{"resolved": "$us.0000000000"}""")

  /** ResultSet proxy over a script; throws `failWith` instead of
    * yielding row index `failAt` (0-based). getString is 1-based:
    * table, key, value. */
  def resultSet(rows: Seq[Row], failAt: Int = -1,
      failWith: SQLException = null): ResultSet = {
    var i = -1
    var lastNull = false
    val h = new InvocationHandler {
      override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
        m.getName match {
          case "next" =>
            i += 1
            if (i == failAt && failWith != null) throw failWith
            java.lang.Boolean.valueOf(i < rows.length)
          case "getString" =>
            val col = args(0).asInstanceOf[Integer].intValue
            val v = col match {
              case 1 => rows(i)._1
              case 2 => rows(i)._2
              case 3 => Some(rows(i)._3)
              case other => throw new AssertionError(s"unexpected column $other")
            }
            lastNull = v.isEmpty
            v.orNull
          case "wasNull" => java.lang.Boolean.valueOf(lastNull)
          case "close" => null
          case "isClosed" => java.lang.Boolean.valueOf(false)
          case "toString" => "scripted-resultset"
          case other => throw new AssertionError(s"unexpected ResultSet.$other")
        }
    }
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[ResultSet]), h).asInstanceOf[ResultSet]
  }

  /** Connection proxy factory: each executeQuery records its SQL and
    * serves the next scripted result set (or throws the scripted
    * exception). */
  class ScriptedDb(script: Seq[Either[SQLException, ResultSet]]) {
    val sqls = scala.collection.mutable.ArrayBuffer.empty[String]
    private var calls = 0
    val connect: () => Connection = () => {
      val stmtH = new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "executeQuery" =>
              sqls += args(0).asInstanceOf[String]
              val r = script(calls); calls += 1
              r match { case Left(e) => throw e; case Right(rs) => rs }
            case "close" => null
            case "toString" => "scripted-statement"
            case other => throw new AssertionError(s"unexpected Statement.$other")
          }
      }
      val stmt = Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[Statement]), stmtH).asInstanceOf[Statement]
      val connH = new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "createStatement" => stmt
            case "close" => null
            case "isClosed" => java.lang.Boolean.valueOf(false)
            case "toString" => "scripted-connection"
            case other => throw new AssertionError(s"unexpected Connection.$other")
          }
      }
      Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[Connection]), connH).asInstanceOf[Connection]
    }
  }

  /** A registrable java.sql.Driver serving a ScriptedDb for URLs with
    * the given prefix — proves the DriverManager wiring offline. */
  def fakeDriver(db: ScriptedDb, prefix: String): java.sql.Driver =
    new java.sql.Driver {
      override def acceptsURL(url: String): Boolean = url.startsWith(prefix)
      override def connect(url: String, info: java.util.Properties) =
        if (acceptsURL(url)) db.connect() else null
      override def getMajorVersion = 1
      override def getMinorVersion = 0
      override def getPropertyInfo(url: String, info: java.util.Properties) =
        Array.empty
      override def jdbcCompliant() = false
      override def getParentLogger = throw new SQLException("no logger")
    }
}

/** Offline drive of the JDBC changefeed tail against scripted java.sql
  * proxies: the full reference loop — statement text (cursor option
  * in/out), row classification, segment-per-resolved landing,
  * commit-after-durable ordering, replica-GC restart-from-now, and
  * deterministic-replay idempotence — with no database. */
class JdbcChangefeedTailSpec extends AnyFunSuite {
  import ScriptedJdbc._


  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"jdbc-tail-$tag").toString

  private def freshStore(): CursorStore =
    new InMemoryCursorStore("jdbc-tail-" + java.util.UUID.randomUUID)

  test("happy path: segments per resolved, commit-after-durable, cursor advances") {
    val dir = tmpDir("happy")
    val store = freshStore()
    val feed = Seq(
      change(1, 1010), change(2, 1020), change(3, 1030), resolvedRow(2000),
      change(4, 2010), resolvedRow(3000))
    val db = new ScriptedDb(Seq(Right(resultSet(feed))))
    val tail = new JdbcChangefeedTail(db.connect, "events", dir, store,
      resolvedFrequency = "30s", hlcWallDivisor = 1L)
    val stats = tail.runOnce()

    assert(stats === TailStats(4, 2, 2, 2, 0))
    // no stored cursor → no cursor option; frequency flows through
    assert(db.sqls.toSeq === Seq(
      "EXPERIMENTAL CHANGEFEED FOR events WITH updated, resolved = '30s'"))
    assert(store.get() === Some("3000"))

    val segs = ChangefeedLog.listSegments(dir)
    assert(segs.map(s => (s.firstUs, s.lastUs)) === Seq((1010, 2000), (2010, 3000)))
    val all = segs.flatMap(s => ChangefeedLog.readSegment(s.path).toSeq)
    assert(all.count(_.tbl.isEmpty) === 2) // resolved records landed too
    assert(all.count(_.tbl.contains("events")) === 4)
    // change rows keyed by their `updated` HLC µs
    assert(all.filter(_.tbl.nonEmpty).map(_.sortUs) === Seq(1010, 1020, 1030, 2010))
  }

  test("resume: stored cursor becomes the changefeed cursor option") {
    val dir = tmpDir("resume")
    val store = freshStore()
    store.set("3000")
    val db = new ScriptedDb(Seq(Right(resultSet(Seq(
      change(5, 3010), resolvedRow(4000))))))
    val tail = new JdbcChangefeedTail(db.connect, "events", dir, store,
      hlcWallDivisor = 1L)
    tail.runOnce()
    assert(db.sqls.toSeq === Seq(
      "EXPERIMENTAL CHANGEFEED FOR events WITH updated, resolved = '1h', " +
        "cursor = '3000.0000000000'"))
    assert(store.get() === Some("4000"))
  }

  test("replica GC threshold: restart from now without the cursor") {
    val dir = tmpDir("gc")
    val store = freshStore()
    store.set("100")
    val gc = new SQLException(
      "batch timestamp 100.0000000000 must be after replica GC threshold 500.0000000000")
    val db = new ScriptedDb(Seq(
      Left(gc),
      Right(resultSet(Seq(change(9, 9010), resolvedRow(9100))))))
    val tail = new JdbcChangefeedTail(db.connect, "events", dir, store,
      hlcWallDivisor = 1L)
    val stats = tail.runOnce()

    assert(stats.gcRestarts === 1)
    assert(db.sqls.size === 2)
    assert(db.sqls(0).contains("cursor = '100.0000000000'"))
    assert(!db.sqls(1).contains("cursor")) // restarted from now
    assert(store.get() === Some("9100"))

    // a non-GC SQLException must propagate, not restart
    val db2 = new ScriptedDb(Seq(Left(new SQLException("connection refused"))))
    val tail2 = new JdbcChangefeedTail(db2.connect, "events", dir, freshStore(),
      hlcWallDivisor = 1L)
    intercept[SQLException](tail2.runOnce())
  }

  test("mid-stream GC error restarts; deterministic replay rewrites, never duplicates") {
    val dir = tmpDir("replay")
    val store = freshStore()
    val feed = Seq(change(1, 1010), resolvedRow(2000), change(2, 2010), resolvedRow(3000))
    // GC error surfaces from rs.next() AFTER the first segment landed
    val gc = new SQLException("must be after replica GC threshold")
    val db = new ScriptedDb(Seq(
      Right(resultSet(feed, failAt = 2, failWith = gc)),
      Right(resultSet(feed))))
    val tail = new JdbcChangefeedTail(db.connect, "events", dir, store,
      hlcWallDivisor = 1L)
    tail.runOnce()
    // first attempt wrote seg 1 (id j0x0) then died; the restart (also
    // cursorless → same id base) replayed identical content: segment
    // REPLACED atomically, then the rest appended — no duplicates
    val segs = ChangefeedLog.listSegments(dir)
    assert(segs.map(s => (s.firstUs, s.lastUs)) === Seq((1010, 2000), (2010, 3000)))
    assert(store.get() === Some("3000"))
  }

  test("chaos: connection reset mid-drain — operator retry resumes from the committed cursor, nothing lost") {
    val dir = tmpDir("reset")
    val store = freshStore()
    // the wire dies AFTER segment (1010..2000) landed and cursor 2000
    // committed, but BEFORE the feed delivers anything else — a plain
    // socket reset, NOT a GC error, so runOnce must NOT restart-from-now
    // internally; it propagates and the operator's retry loop re-calls
    val reset = new SQLException("connection reset by peer")
    val fullFeed = Seq(change(1, 1010), resolvedRow(2000),
      change(2, 2010), change(3, 2020), resolvedRow(3000))
    val resumedFeed = Seq(change(2, 2010), change(3, 2020), resolvedRow(3000))
    val db = new ScriptedDb(Seq(
      Right(resultSet(fullFeed, failAt = 2, failWith = reset)),
      Right(resultSet(resumedFeed))))
    val tail = new JdbcChangefeedTail(db.connect, "events", dir, store,
      hlcWallDivisor = 1L)
    intercept[SQLException](tail.runOnce()) // the reset surfaces
    assert(store.get() === Some("2000"), "commit-before-crash must survive")
    val s2 = tail.runOnce() // the operator's retry
    assert(s2.gcRestarts === 0L, "a reset is not a GC restart")
    // the retry's changefeed statement carries the committed cursor —
    // the feed resumes where coverage ended instead of re-tailing history
    assert(db.sqls.last.contains("cursor = '2000.0000000000'"),
      s"retry did not resume from the committed cursor: ${db.sqls.last}")
    // nothing lost: every change row is durable in the log at least once
    val recs = ChangefeedLog.listSegments(dir)
      .flatMap(s => ChangefeedLog.readSegment(s.path))
    val keys = recs.filter(_.tbl.isDefined).map(_.key.get)
    assert(Seq("[1]", "[2]", "[3]").forall(keys.contains),
      s"lost change rows across the reset: $keys")
    assert(store.get() === Some("3000"))
  }

  test("trailing change rows without a covering resolved still flush") {
    val dir = tmpDir("trail")
    val db = new ScriptedDb(Seq(Right(resultSet(Seq(
      change(1, 1010), resolvedRow(2000), change(2, 2010), change(3, 2020))))))
    val tail = new JdbcChangefeedTail(db.connect, "events", dir, freshStore(),
      hlcWallDivisor = 1L)
    val stats = tail.runOnce()
    assert(stats.segmentsWritten === 2)
    val segs = ChangefeedLog.listSegments(dir)
    assert(segs.map(s => (s.firstUs, s.lastUs)) === Seq((1010, 2000), (2010, 2020)))
  }

  test("nanos HLC feed (real CockroachDB shape): divisor lands µs in the log") {
    val dir = tmpDir("nanos")
    val store = freshStore()
    store.set("3000") // µs, the log/pipeline convention
    // feed speaks NANOS: updated/resolved wall clocks are µs × 1000
    val db = new ScriptedDb(Seq(Right(resultSet(Seq(
      (Some("events"), Some("[7]"),
        """{"after": {"event_id": 7}, "updated": "3010000.0000000000"}"""),
      (None, None, """{"resolved": "4000000.0000000000"}"""))))))
    val tail = new JdbcChangefeedTail(db.connect, "events", dir, store)
    tail.runOnce()
    // cursor option rendered back in the feed's unit (3000 µs → nanos)
    assert(db.sqls.head.contains("cursor = '3000000.0000000000'"))
    // log keyed in µs; cursor committed in µs
    val segs = ChangefeedLog.listSegments(dir)
    assert(segs.map(s => (s.firstUs, s.lastUs)) === Seq((3010, 4000)))
    assert(store.get() === Some("4000"))
  }

  test("forUrl: DriverManager wiring works (registered fake driver)") {
    val dir = tmpDir("url")
    val db = new ScriptedDb(Seq(Right(resultSet(Seq(
      change(1, 1010), resolvedRow(2000))))))
    val driver = fakeDriver(db, "jdbc:graft-fake:")
    java.sql.DriverManager.registerDriver(driver)
    try {
      val tail = JdbcChangefeedTail.forUrl("jdbc:graft-fake:db", "events",
        dir, freshStore(), hlcWallDivisor = 1L)
      val stats = tail.runOnce()
      assert(stats.rowsIngested === 1 && stats.cursorsCommitted === 1)
      assert(ChangefeedLog.listSegments(dir).size === 1)
    } finally java.sql.DriverManager.deregisterDriver(driver)
  }
}
