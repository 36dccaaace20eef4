package graft.cdc

import java.sql.Connection

/** Database-backed cursor persistence — the reference's
  * `CrdbCursorStore` (reference src/cursors.rs:13-58): the cursor's
  * durability story IS the database transaction. Table and statements
  * mirror the reference exactly:
  *
  *   - `CREATE TABLE IF NOT EXISTS cursor_store (key ... PRIMARY KEY,
  *     cursor ...)` once per store (cursors.rs:19-21);
  *   - `get` = `SELECT cursor FROM cursor_store WHERE key = ?`
  *     (cursors.rs:28-44);
  *   - `set` = `UPSERT INTO cursor_store (key, cursor) VALUES (?, ?)`
  *     (cursors.rs:46-57) — CockroachDB's native upsert; the `postgres`
  *     dialect emits the standard `INSERT ... ON CONFLICT (key) DO
  *     UPDATE` instead, so the same store runs against vanilla
  *     Postgres.
  *
  * The reference pins key = 'key' (one process, one cursor); here the
  * key is a parameter so one cursor_store table serves many relays
  * (publish cursor and tail cursor land under different keys — see
  * GraftMain's split-cursor note).
  *
  * Connection discipline: every operation runs on a FRESH connection
  * from the injected factory and closes it — cursor traffic is one
  * round-trip per resolved tick, so per-call connect is cheap, and a
  * half-dead pooled connection can never wedge the commit path. A
  * deployment that wants pooling injects a pooling factory; the store
  * doesn't care. DDL runs lazily once per store instance, on the first
  * operation (failing fast at startup is the caller's choice of when
  * to make the first call).
  *
  * Like [[JdbcChangefeedTail]], the factory is injectable so the store
  * is fully spec-able against scripted java.sql proxies
  * (JdbcCursorStoreSpec); production wiring is
  * [[JdbcCursorStore.forUrl]] over DriverManager. */
final class JdbcCursorStore(
    connect: () => Connection,
    key: String = "key",
    dialect: String = JdbcCursorStore.Cockroach) extends CursorStore {

  require(JdbcCursorStore.dialects.contains(dialect),
    s"unknown cursor-store dialect '$dialect' " +
      s"(want one of: ${JdbcCursorStore.dialects.mkString(", ")})")

  @volatile private var tableEnsured = false

  private def withConnection[A](f: Connection => A): A = {
    val conn = connect()
    try {
      if (!tableEnsured) {
        val st = conn.createStatement()
        try { st.execute(JdbcCursorStore.ddl); () } finally st.close()
        tableEnsured = true
      }
      f(conn)
    } finally conn.close()
  }

  override def get(): Option[String] = withConnection { conn =>
    val ps = conn.prepareStatement(
      "SELECT cursor FROM cursor_store WHERE key = ?")
    try {
      ps.setString(1, key)
      val rs = ps.executeQuery()
      try { if (rs.next()) Option(rs.getString(1)) else None }
      finally rs.close()
    } finally ps.close()
  }

  override def set(cursor: String): Unit = withConnection { conn =>
    val sql = dialect match {
      case JdbcCursorStore.Cockroach =>
        "UPSERT INTO cursor_store (key, cursor) VALUES (?, ?)"
      case JdbcCursorStore.Postgres =>
        "INSERT INTO cursor_store (key, cursor) VALUES (?, ?) " +
          "ON CONFLICT (key) DO UPDATE SET cursor = excluded.cursor"
    }
    val ps = conn.prepareStatement(sql)
    try {
      ps.setString(1, key)
      ps.setString(2, cursor)
      ps.executeUpdate()
      ()
    } finally ps.close()
  }
}

object JdbcCursorStore {
  val Cockroach = "cockroachdb"
  val Postgres = "postgres"
  private[cdc] val dialects = Seq(Cockroach, Postgres)

  /** The reference's DDL (cursors.rs:19-21) with portable column types:
    * CockroachDB's STRING is an alias of VARCHAR, so this text runs on
    * both dialects unchanged. */
  val ddl: String =
    "CREATE TABLE IF NOT EXISTS cursor_store " +
      "(key VARCHAR NOT NULL PRIMARY KEY, cursor VARCHAR NOT NULL)"

  /** Store over a JDBC URL via the standard DriverManager registry —
    * the reference's `DATABASE_URL` deployment shape (main.rs:57-63:
    * cursor-store = cockroachdb reads the same database the changefeed
    * comes from). Spec-covered with a registered fake java.sql.Driver. */
  def forUrl(url: String, key: String = "key",
      dialect: String = Cockroach): JdbcCursorStore =
    new JdbcCursorStore(
      () => java.sql.DriverManager.getConnection(url), key, dialect)
}
