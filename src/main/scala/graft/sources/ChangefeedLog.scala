package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** On-disk layout of a changefeed log — the durable stand-in for the
  * reference's live CockroachDB changefeed cursor (src/main.rs:205-221):
  * an append-only directory of immutable segment files, each covering a
  * contiguous `sort_us` range, plus a `_gc_floor` marker mirroring the
  * database's replica GC threshold.
  *
  * Segment name carries the row range (`seg-<firstUs>-<lastUs>-<id>.log`)
  * so micro-batch PLANNING is a directory listing — no data is read on
  * the driver, exactly like Kafka offset planning. Row format is one
  * escaped TSV record per line: `sort_us<TAB>tbl<TAB>key<TAB>value`
  * with `\N` for SQL NULL (resolved rows have NULL tbl/key).
  */
object ChangefeedLog {

  /** `tblTag`: the TABLE-ROUTED layout marker. `None` = classic mixed
    * segment; `Some(t)` = every record in this segment has tbl == t
    * (`Some(None)` = all resolved rows, whose tbl is SQL NULL). When
    * EVERY segment of a log carries a tag, the DSv2 scan reports
    * KeyGroupedPartitioning over `tbl` and a groupBy/join on the
    * routing key runs exchange-free (SupportsReportPartitioning). */
  final case class Segment(path: Path, firstUs: Long, lastUs: Long,
      tblTag: Option[Option[String]] = None)

  /** One changefeed record — matches the (table, key, value) triple the
    * reference reads off the feed, plus its HLC-ish sort timestamp. */
  final case class Record(sortUs: Long, tbl: Option[String],
      key: Option[String], value: String)

  // optional -t<tag> = table-routed segment: tn (resolved/NULL tbl) or
  // tx<hex-utf8-of-table-name> (hex keeps arbitrary table names inside
  // the filename grammar)
  private val SegmentName =
    raw"seg-(\d+)-(\d+)-([0-9a-zA-Z]+)(?:-t(n|x[0-9a-f]*))?\.log".r

  private[sources] def encodeTblTag(tbl: Option[String]): String = tbl match {
    case None => "n"
    case Some(t) =>
      "x" + t.getBytes(StandardCharsets.UTF_8).map("%02x".format(_)).mkString
  }

  private[sources] def decodeTblTag(tag: String): Option[String] =
    if (tag == "n") None
    else Some(new String(tag.drop(1).grouped(2)
      .map(h => Integer.parseInt(h, 16).toByte).toArray, StandardCharsets.UTF_8))
  private val GcFloorFile = "_gc_floor"
  private val Null = "\\N"

  private[sources] def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '\t' => "\\t"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case c => c.toString
  }

  private[sources] def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b.append('\\'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'n' => b.append('\n'); i += 2
          case 'r' => b.append('\r'); i += 2
          case 'N' => b.append("\\N"); i += 2 // not produced by esc; keep literal
          case other => b.append(c).append(other); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private def fmt(r: Record): String =
    s"${r.sortUs}\t${r.tbl.map(esc).getOrElse(Null)}\t" +
      s"${r.key.map(esc).getOrElse(Null)}\t${esc(r.value)}"

  private[sources] def parse(line: String): Record = {
    val parts = line.split("\t", 4)
    require(parts.length == 4, s"malformed changefeed log line: $line")
    def opt(s: String): Option[String] = if (s == Null) None else Some(unesc(s))
    Record(parts(0).toLong, opt(parts(1)), opt(parts(2)), unesc(parts(3)))
  }

  /** Append one immutable segment (records sorted by sort_us; write to a
    * temp file then atomic-rename so readers never see partial files). */
  def writeSegment(dir: String, records: Seq[Record]): Path =
    writeSegmentAs(dir, records,
      java.util.UUID.randomUUID.toString.replace("-", "").take(12))

  /** Same, with a CALLER-CHOSEN segment id: a deterministic id (e.g.
    * epoch+partition from a streaming writer) makes re-executed writes
    * idempotent — the retry atomically replaces the identical segment
    * instead of appending a duplicate. */
  def writeSegmentAs(dir: String, records: Seq[Record], id: String): Path =
    writeSegmentAs(dir, records, id, tagTbl = false)

  /** Same, optionally stamping the table-routed tag: with `tagTbl` the
    * segment name asserts "every record's tbl equals this one value" —
    * enforced here, because the DSv2 partitioning report derives an
    * exchange-elimination guarantee from it. */
  def writeSegmentAs(dir: String, records: Seq[Record], id: String,
      tagTbl: Boolean): Path = {
    require(records.nonEmpty, "empty changefeed segment")
    require(id.matches("[0-9a-zA-Z]+"), s"bad segment id '$id'")
    // segment NAMES carry the range and the name grammar is \d+ — a
    // negative sort_us would write a file listSegments can never list
    // (silent data loss); HLC-ish timestamps are non-negative, enforce it
    require(records.forall(_.sortUs >= 0),
      s"negative sort_us in segment (first: ${records.find(_.sortUs < 0).get.sortUs})")
    val tagSuffix = if (!tagTbl) "" else {
      val tbls = records.map(_.tbl).distinct
      require(tbls.size == 1,
        s"table-routed segment must hold ONE table, got ${tbls.take(5)}")
      s"-t${encodeTblTag(tbls.head)}"
    }
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val sorted = records.sortBy(r => (r.sortUs, r.key.getOrElse("")))
    val name = s"seg-${sorted.head.sortUs}-${sorted.last.sortUs}-$id$tagSuffix.log"
    // per-attempt tmp name: concurrent attempts (speculation) must not
    // share a scratch file; the atomic move arbitrates the final name
    val tmp = d.resolve(
      s".$name.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    Files.write(tmp, sorted.map(fmt).mkString("\n").getBytes(StandardCharsets.UTF_8))
    val dst = d.resolve(name)
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    dst
  }

  def listSegments(dir: String): Seq[Segment] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      // close the directory stream — this runs on the driver every
      // micro-batch, so a leaked fd per call adds up in a long stream
      val st = Files.list(d)
      try {
        st.iterator.asScala.flatMap { p =>
          p.getFileName.toString match {
            case SegmentName(first, last, _, tag) =>
              Some(Segment(p, first.toLong, last.toLong,
                Option(tag).map(decodeTblTag)))
            case _ => None
          }
        }.toList
      } finally st.close()
    }.sortBy(s => (s.firstUs, s.lastUs, s.path.toString))
  }

  def readSegment(path: Path): Iterator[Record] =
    Files.readAllLines(path, StandardCharsets.UTF_8).iterator.asScala
      .filter(_.nonEmpty).map(parse)

  /** The replica-GC threshold: data at or below this sort_us may have
    * been reclaimed; a consumer cursor below it is invalid. */
  def gcFloorUs(dir: String): Option[Long] = {
    val f = Paths.get(dir, GcFloorFile)
    if (Files.exists(f))
      Some(new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  /** Garbage-collect: drop every segment wholly at-or-below `floorUs`
    * and record the new floor — the moral equivalent of CockroachDB's
    * replica GC advancing past old MVCC history. */
  def gc(dir: String, floorUs: Long): Unit = {
    listSegments(dir).filter(_.lastUs <= floorUs)
      .foreach(s => Files.delete(s.path))
    Files.write(Paths.get(dir, GcFloorFile),
      floorUs.toString.getBytes(StandardCharsets.UTF_8))
  }

  /** §2#160 log COMPACTION — Kafka compacted-topic semantics, the
    * third retention policy next to keep-everything (append) and
    * drop-everything ([[gc]]): every segment wholly at-or-below
    * `belowUs` is rewritten into ONE segment holding only the LATEST
    * change per (table, key) — same (sort_us, value) winner rule as
    * the cdc_compact query and the streaming CdcApply — plus the
    * single maximum resolved row (older resolved ticks are subsumed).
    * A late-joining consumer then bootstraps from |live keys| rows
    * instead of replaying all history, while consumers past `belowUs`
    * see identical data.
    *
    * Crash-safety is write-then-delete with a DETERMINISTIC segment id
    * derived from `belowUs`: the compacted segment lands atomically
    * first, victim deletes follow. A crash in between leaves
    * duplicates (compacted + originals) — at-least-once, exactly what
    * feed consumers already tolerate — and RE-RUNNING the compaction
    * is idempotent: the previous compacted segment is itself a victim,
    * re-compacts to the same rows, same range, same name, and is
    * atomically replaced while the leftover originals are removed.
    * Segments straddling `belowUs` are left alone (immutable). */
  def compact(dir: String, belowUs: Long): Option[Path] = {
    val victims = listSegments(dir).filter(_.lastUs <= belowUs)
    if (victims.isEmpty) None
    else {
      val records = victims.flatMap(s => readSegment(s.path))
      val changes = records.filter(_.tbl.isDefined)
        .groupBy(r => (r.tbl, r.key))
        .map { case (_, vs) => vs.maxBy(r => (r.sortUs, r.value)) }
      val resolved = records.filter(_.tbl.isEmpty)
      val keepResolved =
        if (resolved.isEmpty) Seq.empty else Seq(resolved.maxBy(_.sortUs))
      val out = writeSegmentAs(dir, (changes ++ keepResolved).toSeq,
        s"compacted$belowUs")
      victims.filter(_.path.getFileName != out.getFileName)
        .foreach(s => Files.deleteIfExists(s.path))
      Some(out)
    }
  }
}
