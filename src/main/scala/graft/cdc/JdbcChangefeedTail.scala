package graft.cdc

import java.sql.{Connection, ResultSet, SQLException}
import graft.sources.ChangefeedLog
import graft.sources.ChangefeedLog.Record

/** Summary of one [[JdbcChangefeedTail.runOnce]] drain. */
final case class TailStats(rowsIngested: Long, resolvedSeen: Long,
    segmentsWritten: Long, cursorsCommitted: Long, gcRestarts: Long)

/** Live CockroachDB core-changefeed ingestion over JDBC — the
  * reference's connection loop (reference src/main.rs:203-221)
  * re-expressed for the Spark architecture. A changefeed is ONE endless
  * SQL cursor; there is nothing to distribute at the connection, so the
  * right Spark shape is a driver-side tail that lands rows in the
  * changefeed segment log, from which the `graft-changefeed` DSv2
  * source streams them into executors — the same role Kafka plays in a
  * production CDC stack (connector tails the database, the log
  * scales out).
  *
  * Faithful to the reference loop:
  *  - issues `EXPERIMENTAL CHANGEFEED FOR <table> WITH updated,
  *    resolved = '<freq>' [, cursor = '<hlc>']` (main.rs:110-116; the
  *    `updated` option is added so every change row carries the HLC
  *    timestamp the durable log keys segments by);
  *  - classifies rows exactly like main.rs:240-253: NULL table+key →
  *    resolved row, else change row;
  *  - each resolved timestamp closes a segment (change rows since the
  *    last resolved + the resolved record itself) and THEN commits the
  *    cursor — crash-ordering that makes the committed cursor always
  *    covered by durable segments (at-least-once, de-duplicated by the
  *    deterministic segment id below);
  *  - on a "replica GC threshold" SQLException the stored cursor is
  *    abandoned and the feed restarts from now (main.rs:180-198),
  *    matching ChangefeedPipeline's ignore-cursor retry semantics.
  *
  * Segment ids are derived from the cursor the drain STARTED from plus
  * a sequence number, so a crashed run replayed from the same committed
  * cursor and identical feed content rewrites the SAME segment names —
  * [[ChangefeedLog.writeSegmentAs]] atomically replaces them instead of
  * duplicating (the DSv2 sink's idempotence trick at the ingestion
  * edge). A real feed may re-batch rows across a restart, in which case
  * consumers see at-least-once — exactly the reference's delivery
  * guarantee.
  *
  * The `Connection` factory is injected, so the loop is fully testable
  * offline against a scripted java.sql proxy (JdbcChangefeedTailSpec);
  * pointing it at a real CockroachDB is supplying
  * `() => DriverManager.getConnection(url)`.
  *
  * Cursor format: stored as a plain µs string (the convention
  * ChangefeedPipeline commits); rendered to the changefeed option as
  * `<us>.0000000000`, the HLC shape the synthetic feed uses. */
final class JdbcChangefeedTail(
    connect: () => Connection,
    table: String,
    logDir: String,
    cursorStore: CursorStore,
    resolvedFrequency: String = "1h",
    maxSegmentRows: Int = 4096,
    hlcWallDivisor: Long = 1000L) {
  // hlcWallDivisor: the feed's HLC wall-clock unit relative to the
  // log's µs convention. A real CockroachDB emits NANOS in its HLC
  // strings, so the PRODUCTION value (1000) is the default; the
  // synthetic µs feeds in the specs override with 1.
  require(hlcWallDivisor > 0, s"bad hlcWallDivisor $hlcWallDivisor")

  /** The statement the reference builds in main.rs:110-116. The stored
    * µs cursor is rendered back in the feed's wall-clock unit. */
  def changefeedSql(cursorUs: Option[Long]): String = {
    val base = s"EXPERIMENTAL CHANGEFEED FOR $table " +
      s"WITH updated, resolved = '$resolvedFrequency'"
    cursorUs.fold(base)(us =>
      s"$base, cursor = '${us * hlcWallDivisor}.0000000000'")
  }

  private val HlcField = """"(resolved|updated)"\s*:\s*"(\d+)(?:\.\d+)?"""".r

  /** First µs timestamp under the given JSON field, if present. */
  private def hlcUs(json: String, field: String): Option[Long] =
    HlcField.findAllMatchIn(json)
      .collectFirst { case m if m.group(1) == field =>
        m.group(2).toLong / hlcWallDivisor }

  private def isGcError(e: SQLException): Boolean =
    Option(e.getMessage).exists(_.contains("replica GC threshold"))

  /** Drain the feed until the result set is exhausted (a live feed
    * never is — production callers run this on a supervisor thread;
    * test doubles and backfills script a finite feed). One GC-threshold
    * error triggers one restart-from-now; a second propagates. */
  def runOnce(): TailStats = {
    val cursor = cursorStore.get().map(_.toLong)
    try drain(cursor)
    catch {
      case e: SQLException if isGcError(e) =>
        val s = drain(None) // restart from now, reference main.rs:180-198
        s.copy(gcRestarts = s.gcRestarts + 1)
    }
  }

  // (constructor params close over everything; companion below wires
  // DriverManager URLs — the reference's DATABASE_URL shape)

  private def drain(startCursorUs: Option[Long]): TailStats = {
    var rows = 0L; var resolved = 0L; var segments = 0L; var commits = 0L
    val conn = connect()
    try {
      val st = conn.createStatement()
      val rs = st.executeQuery(changefeedSql(startCursorUs))
      val buf = scala.collection.mutable.ArrayBuffer.empty[Record]
      // monotonic fallback clock for rows without an `updated` field
      var lastUs = startCursorUs.getOrElse(0L)
      var seq = 0L
      val idBase = s"j${startCursorUs.getOrElse(0L)}"
      def flush(): Unit = if (buf.nonEmpty) {
        ChangefeedLog.writeSegmentAs(logDir, buf.toSeq, s"${idBase}x$seq")
        seq += 1; segments += 1; buf.clear()
      }
      while (rs.next()) {
        val tbl = Option(rs.getString(1))
        val key = Option(rs.getString(2))
        val value = rs.getString(3)
        if (tbl.isEmpty && key.isEmpty) {
          // resolved row (main.rs:240-253): close the covered segment,
          // then commit the cursor — never the other way around
          val us = hlcUs(value, "resolved").getOrElse(
            throw new IllegalArgumentException(s"malformed resolved row: $value"))
          lastUs = math.max(lastUs, us)
          // land the resolved row in the LOG's µs convention — every
          // downstream consumer (pipeline cursor commits, DSv2 offset
          // planning) parses this value; change-row values stay
          // verbatim like the reference's pass-through
          val normValue = if (hlcWallDivisor == 1L) value
            else s"""{"resolved": "$us.0000000000"}"""
          buf += Record(us, None, None, normValue)
          resolved += 1
          flush()
          cursorStore.set(us.toString)
          commits += 1
        } else {
          val us = hlcUs(value, "updated").getOrElse { lastUs + 1 }
          lastUs = math.max(lastUs, us)
          buf += Record(us, tbl, key, value)
          rows += 1
          if (buf.size >= maxSegmentRows) flush()
        }
      }
      flush() // trailing change rows not yet covered by a resolved
      TailStats(rows, resolved, segments, commits, 0L)
    } finally conn.close()
  }
}

object JdbcChangefeedTail {
  /** Tail from a JDBC URL via the standard DriverManager registry —
    * the reference's `DATABASE_URL` deployment shape (main.rs:57-60).
    * CockroachDB speaks pgwire, so `hlcWallDivisor` defaults to 1000
    * here (HLC wall clocks are nanos); the registered driver does the
    * rest. Spec-covered with a registered fake java.sql.Driver. */
  def forUrl(url: String, table: String, logDir: String,
      cursorStore: CursorStore, resolvedFrequency: String = "1h",
      hlcWallDivisor: Long = 1000L): JdbcChangefeedTail =
    new JdbcChangefeedTail(
      () => java.sql.DriverManager.getConnection(url),
      table, logDir, cursorStore, resolvedFrequency,
      hlcWallDivisor = hlcWallDivisor)
}
