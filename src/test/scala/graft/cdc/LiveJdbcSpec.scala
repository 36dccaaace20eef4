package graft.cdc

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, ResultSet, SQLException, Statement}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** OPT-IN live-database contract — the JDBC twin of LiveAmqpSpec: the
  * JdbcChangefeedTail statement/classify/land/commit loop and the
  * JdbcCursorStore upsert/resume contract, executed against a REAL
  * CockroachDB when one is reachable (the reference's exact deploy
  * shape: main.rs:110-139 builds the EXPERIMENTAL CHANGEFEED
  * statement, cursors.rs:13-58 stores the cursor in the same
  * database).
  *
  * Gate: set `GRAFT_CRDB_URL=jdbc:postgresql://root@host:26257/
  * defaultdb?sslmode=disable` (CockroachDB speaks pgwire; the pgjdbc
  * driver must be on the test classpath — it is NOT shipped here).
  * Unset, or driver missing → every test CANCELS, not fails, so the
  * suite stays green in the sandbox and meaningful on a workstation
  * with `docker run cockroachdb/cockroach start-single-node`.
  *
  * A live changefeed cursor never ends, so each tail test bounds the
  * drain with a reflective ResultSet decorator that reports
  * exhaustion once the feed has delivered the expected rows and a
  * covering resolved timestamp — the tail code under test is the
  * production class, unmodified; only the feed's LENGTH is staged,
  * exactly like the scripted proxies in JdbcChangefeedTailSpec. */
class LiveJdbcSpec extends AnyFunSuite {

  private def url: Option[String] =
    sys.env.get("GRAFT_CRDB_URL").map(_.trim).filter(_.nonEmpty)

  private def withUrl(body: String => Unit): Unit = url match {
    case None => cancel("GRAFT_CRDB_URL not set — live CockroachDB suite skipped")
    case Some(u) =>
      try body(u)
      catch {
        case e: SQLException if Option(e.getMessage)
            .exists(_.contains("No suitable driver")) =>
          cancel(s"GRAFT_CRDB_URL set but no JDBC driver on classpath: $e")
      }
  }

  private def connect(u: String): Connection =
    java.sql.DriverManager.getConnection(u)

  private def fresh(tag: String): String =
    s"graft_live_${tag}_${System.nanoTime()}"

  private def exec(c: Connection, sql: String): Unit = {
    val st = c.createStatement(); try { st.execute(sql); () } finally st.close()
  }

  // ---- bounded live feed: a Connection proxy whose ResultSets report
  // exhaustion after minRows rows once the LAST-SEEN row was a
  // resolved one (both key columns NULL) — the only way to hand an
  // endless live cursor to drain() and get control back.
  private def bounded(real: Connection, minRows: Int): Connection = {
    def proxy[T](iface: Class[T], target: AnyRef, h: InvocationHandler): T =
      iface.cast(Proxy.newProxyInstance(iface.getClassLoader,
        Array[Class[_]](iface), h))

    def wrapRs(rs: ResultSet): ResultSet = {
      var rows = 0
      var lastWasResolved = false
      proxy(classOf[ResultSet], rs, (_, m: Method, a: Array[AnyRef]) => {
        m.getName match {
          case "next" =>
            if (rows >= minRows && lastWasResolved)
              java.lang.Boolean.FALSE
            else {
              val r = rs.next()
              if (r) { rows += 1; lastWasResolved = true } // until a col shows
              java.lang.Boolean.valueOf(r)
            }
          case "getString" =>
            val v = rs.getString(a(0).asInstanceOf[Integer].intValue())
            // a non-null table/key column marks the row as a change row
            if (a(0).asInstanceOf[Integer] <= 2 && v != null)
              lastWasResolved = false
            v
          case _ => m.invoke(rs, a: _*)
        }
      })
    }
    def wrapSt(st: Statement): Statement =
      proxy(classOf[Statement], st, (_, m: Method, a: Array[AnyRef]) =>
        if (m.getName == "executeQuery")
          wrapRs(st.executeQuery(a(0).asInstanceOf[String]))
        else m.invoke(st, a: _*))
    proxy(classOf[Connection], real, (_, m: Method, a: Array[AnyRef]) =>
      if (m.getName == "createStatement" && (a == null || a.isEmpty))
        wrapSt(real.createStatement())
      else m.invoke(real, a: _*))
  }

  test("live: cursor store upsert + resume round-trip on a real cursor_store table") {
    withUrl { u =>
      val key = fresh("cursor")
      val store = JdbcCursorStore.forUrl(u, key)
      assert(store.get() === None, "fresh key must start empty")
      store.set("1000")
      assert(store.get() === Some("1000"))
      store.set("2000") // UPSERT overwrite, cursors.rs:46-57
      assert(store.get() === Some("2000"))
      // a second store instance (fresh connections, fresh DDL pass)
      // resumes from the committed value — the process-restart path
      val resumed = JdbcCursorStore.forUrl(u, key)
      assert(resumed.get() === Some("2000"))
    }
  }

  test("live: tail lands real changefeed rows, commits cursor, resumes past them") {
    withUrl { u =>
      val table = fresh("t")
      val setup = connect(u)
      try {
        exec(setup, "SET CLUSTER SETTING kv.rangefeed.enabled = true")
        exec(setup, s"CREATE TABLE $table (id INT PRIMARY KEY, v STRING)")
        exec(setup, s"INSERT INTO $table VALUES (1,'a'), (2,'b'), (3,'c')")
      } finally setup.close()

      val logDir = Files.createTempDirectory("livejdbc").toString
      val store = JdbcCursorStore.forUrl(u, fresh("tailcur"))
      val tail = new JdbcChangefeedTail(
        () => bounded(connect(u), minRows = 4), // 3 changes + ≥1 resolved
        table, logDir, store, resolvedFrequency = "1s")

      val s1 = tail.runOnce()
      assert(s1.rowsIngested >= 3, s"expected the 3 inserts, got $s1")
      assert(s1.resolvedSeen >= 1 && s1.cursorsCommitted >= 1, s1.toString)
      val committed = store.get().map(_.toLong)
      assert(committed.nonEmpty, "resolved must commit a cursor")

      // second drain resumes FROM the committed cursor: only new rows
      val setup2 = connect(u)
      try exec(setup2, s"INSERT INTO $table VALUES (4,'d')")
      finally setup2.close()
      assert(tail.changefeedSql(committed).contains("cursor = "),
        "resume statement must carry the committed cursor")
      val tail2 = new JdbcChangefeedTail(
        () => bounded(connect(u), minRows = 2), // 1 change + ≥1 resolved
        table, logDir, store, resolvedFrequency = "1s")
      val s2 = tail2.runOnce()
      assert(s2.rowsIngested >= 1 && s2.rowsIngested < 3,
        s"resume must see only the post-cursor insert, got $s2")
    }
  }

  test("live: multi-table CHANGEFEED FOR t1, t2 drains both tables through one statement") {
    withUrl { u =>
      // the reference binds ONE process per table (cli.yml); the
      // engine's consolidated form (#186) tails several tables with a
      // single statement — prove the statement shape against the real
      // parser and that landed records carry each table's name, the
      // key the segment-log router (#156) fans out on
      val t1 = fresh("mta")
      val t2 = fresh("mtb")
      val setup = connect(u)
      try {
        exec(setup, "SET CLUSTER SETTING kv.rangefeed.enabled = true")
        exec(setup, s"CREATE TABLE $t1 (id INT PRIMARY KEY, v STRING)")
        exec(setup, s"CREATE TABLE $t2 (id INT PRIMARY KEY, v STRING)")
        exec(setup, s"INSERT INTO $t1 VALUES (1,'a'), (2,'b')")
        exec(setup, s"INSERT INTO $t2 VALUES (10,'x'), (11,'y'), (12,'z')")
      } finally setup.close()

      val logDir = Files.createTempDirectory("livejdbcmt").toString
      val store = JdbcCursorStore.forUrl(u, fresh("mtcur"))
      val tail = new JdbcChangefeedTail(
        () => bounded(connect(u), minRows = 6), // 5 changes + ≥1 resolved
        s"$t1, $t2", logDir, store, resolvedFrequency = "1s")

      val s = tail.runOnce()
      assert(s.rowsIngested >= 5, s"expected the 5 inserts across both tables, got $s")
      assert(s.resolvedSeen >= 1 && s.cursorsCommitted >= 1, s.toString)

      // one shared cursor covers the whole multi-table feed
      assert(store.get().exists(_.toLong > 0L), "resolved must commit a cursor")

      // the landed log carries BOTH table names — the routing key the
      // multi-table relay fans out on
      import graft.sources.ChangefeedLog
      val landedTables = ChangefeedLog.listSegments(logDir)
        .iterator.flatMap(seg => ChangefeedLog.readSegment(seg.path))
        .flatMap(_.tbl).toSet
      // CockroachDB reports the bare table name in the changefeed row
      val want = Set(t1, t2)
      assert(want.subsetOf(landedTables.map(_.toLowerCase)),
        s"landed segments must carry both tables, got $landedTables")
    }
  }

  test("live: a cursor below the replica GC threshold restarts from now") {
    withUrl { u =>
      val table = fresh("gc")
      val setup = connect(u)
      try {
        exec(setup, "SET CLUSTER SETTING kv.rangefeed.enabled = true")
        exec(setup, s"CREATE TABLE $table (id INT PRIMARY KEY)")
        exec(setup, s"INSERT INTO $table VALUES (1)")
      } finally setup.close()

      val logDir = Files.createTempDirectory("livejdbcgc").toString
      val store = JdbcCursorStore.forUrl(u, fresh("gccur"))
      store.set("1") // 1 µs after epoch: guaranteed below any GC threshold
      val tail = new JdbcChangefeedTail(
        () => bounded(connect(u), minRows = 2),
        table, logDir, store, resolvedFrequency = "1s")
      val s = tail.runOnce() // must swallow ONE gc error + restart from now
      assert(s.gcRestarts === 1L,
        s"ancient cursor must trigger the restart-from-now path, got $s")
      assert(s.resolvedSeen >= 1, s.toString)
    }
  }
}
