package graft.sources

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.functions._

/** §2#160: Kafka-style log compaction below a cursor — latest change
  * per key survives, resolved ticks collapse to the max, straddling
  * and newer segments untouched, reruns idempotent. */
class CompactionSpec extends SparkSuite {
  import ChangefeedLog.Record

  private def ch(us: Long, key: String, v: String) =
    Record(us, Some("events"), Some(key), v)
  private def rs(us: Long) =
    Record(us, None, None, s"""{"resolved": "$us"}""")

  private def buildLog(): String = {
    val dir = Files.createTempDirectory("graft-compact").toString
    // seg 1: k1@10, k2@20, resolved@25; seg 2: k1@30 (supersedes), k3@40,
    // resolved@45; seg 3 (ABOVE the cursor): k2@200
    ChangefeedLog.writeSegment(dir, Seq(ch(10, "k1", "v1a"), ch(20, "k2", "v2a"), rs(25)))
    ChangefeedLog.writeSegment(dir, Seq(ch(30, "k1", "v1b"), ch(40, "k3", "v3a"), rs(45)))
    ChangefeedLog.writeSegment(dir, Seq(ch(200, "k2", "v2b")))
    dir
  }

  test("compact keeps latest-per-key + max resolved; newer segments untouched") {
    val dir = buildLog()
    val out = ChangefeedLog.compact(dir, belowUs = 100L)
    assert(out.isDefined)
    val segs = ChangefeedLog.listSegments(dir)
    assert(segs.length === 2, s"expected compacted + new segment, got $segs")
    val compacted = ChangefeedLog.readSegment(segs.head.path).toSeq
    // latest per key below the cursor + ONE resolved (the max)
    assert(compacted.toSet === Set(ch(30, "k1", "v1b"), ch(20, "k2", "v2a"),
      ch(40, "k3", "v3a"), rs(45)))
    // the segment above the cursor is byte-untouched
    assert(ChangefeedLog.readSegment(segs(1).path).toSeq === Seq(ch(200, "k2", "v2b")))
    // a consumer reading the whole log now materializes the same state
    // the uncompacted log would have produced (latest per key overall)
    val got = spark.read.format("graft-changefeed").option("path", dir).load()
      .where(col("tbl").isNotNull).collect()
      .groupBy(_.getString(2)).view
      .mapValues(rows => rows.maxBy(_.getLong(0)).getString(3)).toMap
    assert(got === Map("k1" -> "v1b", "k2" -> "v2b", "k3" -> "v3a"))
  }

  test("compaction rerun is idempotent (crash between write and deletes)") {
    val dir = buildLog()
    val first = ChangefeedLog.compact(dir, 100L).get
    // simulate the crash leftover: restore a victim next to the
    // compacted segment, then re-run
    ChangefeedLog.writeSegment(dir, Seq(ch(10, "k1", "v1a"), ch(20, "k2", "v2a"), rs(25)))
    val second = ChangefeedLog.compact(dir, 100L).get
    assert(second.getFileName === first.getFileName, "compacted name not stable")
    val segs = ChangefeedLog.listSegments(dir)
    assert(segs.length === 2)
    assert(ChangefeedLog.readSegment(segs.head.path).toSet ===
      Set(ch(30, "k1", "v1b"), ch(20, "k2", "v2a"), ch(40, "k3", "v3a"), rs(45)))
  }

  test("compact below everything is a no-op; straddling segments survive") {
    val dir = Files.createTempDirectory("graft-compact2").toString
    ChangefeedLog.writeSegment(dir, Seq(ch(50, "k", "v"), ch(150, "k", "v2")))
    assert(ChangefeedLog.compact(dir, 10L).isEmpty) // nothing wholly below
    assert(ChangefeedLog.compact(dir, 100L).isEmpty) // straddler left alone
    assert(ChangefeedLog.listSegments(dir).length === 1)
  }
}
