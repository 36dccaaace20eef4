package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.cdc.Changefeed

/** The `graft-changefeed` WRITE path: batch + streaming sinks that emit
  * atomic, idempotently-named log segments — the Spark-native broker
  * stand-in that closes the relay loop (log → transform → log). */
class ChangefeedSinkSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def buildLog(nSegments: Int): (String, Seq[ChangefeedLog.Record]) = {
    val dir = tmp("graft-sinklog")
    val rows = Changefeed.changefeedRows(spark, sf)
      .collect().toSeq.map { r =>
        ChangefeedLog.Record(r.getLong(0), Option(r.getString(1)),
          Option(r.getString(2)), r.getString(3))
      }.sortBy(r => (r.sortUs, r.key.getOrElse("")))
    val per = math.max(rows.size / nSegments, 1)
    rows.grouped(per).foreach(g => ChangefeedLog.writeSegment(dir, g))
    (dir, rows)
  }

  private def readAll(dir: String): Seq[(Long, Option[String], Option[String], String)] =
    ChangefeedLog.listSegments(dir)
      .flatMap(s => ChangefeedLog.readSegment(s.path))
      .map(r => (r.sortUs, r.tbl, r.key, r.value))
      .sortBy(t => (t._1, t._3.getOrElse("")))

  test("batch write round-trips the full log through the sink") {
    val (dir, _) = buildLog(3)
    val out = tmp("graft-sink-out")
    spark.read.format("graft-changefeed").option("path", dir).load()
      .write.format("graft-changefeed").option("path", out).mode("append").save()
    assert(readAll(out) === readAll(dir))
  }

  test("sink-written segments carry prunable ranges: pushdown works on relayed logs") {
    // integration across write + read paths: segments the SINK names
    // must expose the same sort_us range metadata the reader's
    // filter pushdown prunes on — a relayed log stays as queryable as
    // a directly-written one
    val (dir, rows) = buildLog(4)
    val out = tmp("graft-sink-pushdown")
    spark.read.format("graft-changefeed").option("path", dir).load()
      .repartitionByRange(4, col("sort_us")) // several disjoint-range segments
      .write.format("graft-changefeed").option("path", out).mode("append").save()
    val cut = rows(rows.size / 2).sortUs
    val df = spark.read.format("graft-changefeed").option("path", out).load()
      .where(col("sort_us") > cut)
    val fullParts = spark.read.format("graft-changefeed").option("path", out)
      .load().rdd.getNumPartitions
    assert(fullParts >= 3, s"range repartition produced too few segments: $fullParts")
    assert(df.rdd.getNumPartitions < fullParts,
      s"no segment pruning on sink-written log: ${df.rdd.getNumPartitions}/$fullParts")
    assert(df.count() === rows.count(_.sortUs > cut))
  }

  test("sink accepts a by-name subset (nullable cols null-filled) but rejects a missing value col") {
    import spark.implicits._
    // Spark's DSv2 by-name resolution null-fills missing NULLABLE columns
    val subsetDir = tmp("graft-sink-subset")
    Seq((7L, "x")).toDF("sort_us", "value")
      .write.format("graft-changefeed").option("path", subsetDir)
      .mode("append").save()
    assert(readAll(subsetDir) === Seq((7L, None, None, "x")))
    // ...but a frame without the non-nullable `value` fails analysis
    intercept[Exception] {
      Seq((1L, "t")).toDF("sort_us", "tbl")
        .write.format("graft-changefeed").option("path", tmp("graft-sink-bad2"))
        .mode("append").save()
    }
    ()
  }

  test("streaming relay log->filter->log drains incrementally across restarts") {
    val (dir, rows) = buildLog(3)
    val out = tmp("graft-relay-out")
    val ckpt = tmp("graft-relay-ckpt")

    def relayOnce(): Unit = {
      val q = spark.readStream.format("graft-changefeed").option("path", dir).load()
        .where(col("tbl").isNotNull) // drop resolved markers in transit
        .writeStream.format("graft-changefeed").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    relayOnce()
    val want1 = rows.filter(_.tbl.isDefined)
      .map(r => (r.sortUs, r.tbl, r.key, r.value))
      .sortBy(t => (t._1, t._3.getOrElse("")))
    assert(readAll(out) === want1)

    // new upstream segment; same checkpoint → ONLY the delta is relayed
    val lastUs = rows.last.sortUs
    ChangefeedLog.writeSegment(dir, Seq(
      ChangefeedLog.Record(lastUs + 5, Some("events"), Some("[777]"), "{\"after\": {\"event_id\": 777}}"),
      ChangefeedLog.Record(lastUs + 9, None, None, s"""{"resolved": "${lastUs + 9}.0000000000"}""")))
    val segsBefore = ChangefeedLog.listSegments(out).size
    relayOnce()
    assert(readAll(out) === want1 :+ ((lastUs + 5, Some("events"), Some("[777]"),
      "{\"after\": {\"event_id\": 777}}")))
    // incremental: the catch-up run added at most one segment per partition
    assert(ChangefeedLog.listSegments(out).size <= segsBefore + 4)
  }

  test("task-retry idempotence: same segment id atomically replaces, never duplicates") {
    val dir = tmp("graft-idem")
    val recs = Seq(ChangefeedLog.Record(1, Some("t"), Some("k"), "v1"))
    ChangefeedLog.writeSegmentAs(dir, recs, "e0p0")
    ChangefeedLog.writeSegmentAs(dir, recs, "e0p0") // re-executed task
    assert(ChangefeedLog.listSegments(dir).size === 1)
    assert(readAll(dir) === Seq((1L, Some("t"), Some("k"), "v1")))
  }
}
