package graft.sources

import java.nio.file.Files
import graft.SparkSuite
import graft.cdc.Changefeed
import org.apache.spark.sql.functions._

/** SupportsReportStatistics on the `graft-changefeed` scan: pruned
  * sizes reach the optimizer, and the optimizer — not a hint — picks
  * broadcast for a narrow feed slice. */
class StatsReportSpec extends SparkSuite {

  private def buildLog(nSegments: Int): (String, Long) = {
    val dir = Files.createTempDirectory("graft-statslog").toString
    val rows = Changefeed.changefeedRows(spark, sf)
      .collect().toSeq.map { r =>
        ChangefeedLog.Record(r.getLong(0), Option(r.getString(1)),
          Option(r.getString(2)), r.getString(3))
      }.sortBy(r => (r.sortUs, r.key.getOrElse("")))
    val per = math.max(rows.size / nSegments, 1)
    rows.grouped(per).foreach(g => ChangefeedLog.writeSegment(dir, g))
    (dir, rows.map(_.sortUs).max)
  }

  test("estimateStatistics: full-log bytes; a pushed range shrinks them; the agg scan is one row") {
    val (dir, maxUs) = buildLog(8)
    def statsOf(configure: ChangefeedScan => Unit): Long = {
      val scan = new ChangefeedScan(dir, None, None)
      configure(scan)
      scan.estimateStatistics().sizeInBytes().getAsLong
    }
    val full = statsOf(_ => ())
    val diskBytes = ChangefeedLog.listSegments(dir)
      .map(s => java.nio.file.Files.size(s.path)).sum
    assert(full === diskBytes && full > 0)
    // a narrow sort_us range must prune the reported size along with
    // the segments
    import org.apache.spark.sql.sources.GreaterThan
    val sliced = statsOf(_.pushFilters(Array(GreaterThan("sort_us", maxUs - 1))))
    assert(sliced < full / 2, s"slice $sliced vs full $full")
  }

  test("the optimizer broadcasts a narrow feed slice from reported stats, no hint") {
    val (dir, maxUs) = buildLog(8)
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    // threshold between the slice's size and the full log's size
    val slice = {
      val scan = new ChangefeedScan(dir, None, None)
      scan.pushFilters(Array(
        org.apache.spark.sql.sources.GreaterThan("sort_us", maxUs - 1)))
      scan.estimateStatistics().sizeInBytes().getAsLong
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      (slice * 20 + 1024).toString)
    try {
      val feed = spark.read.format("graft-changefeed").option("path", dir)
        .load().where(col("sort_us") > maxUs - 1)
      val big = graft.Tables.events(spark, sf)
        .select(unix_micros(col("ts")).as("sort_us"), col("event_id"))
      val joined = big.join(feed, Seq("sort_us"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"stats-driven broadcast missing:\n$plan")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
