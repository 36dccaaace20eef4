package graft.sources

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, UnknownPartitioning}

/** SupportsReportPartitioning on the `graft-changefeed` scan (r13
  * verdict #2 — the last standard scan mixin): a TABLE-ROUTED log
  * (one table per segment, tag in the name) reports
  * KeyGroupedPartitioning over `tbl`, so the per-table relay
  * accounting aggregate runs with NO exchange; the report is
  * withdrawn for mixed layouts and when tbl is pruned. */
class PartitioningReportSpec extends SparkSuite {

  private def rec(us: Long, tbl: String, key: String) =
    ChangefeedLog.Record(us, Some(tbl), Some(key), s"""{"k":"$key"}""")

  /** Routed log: 3 tables × `segsPerTable` tagged segments. */
  private def buildRoutedLog(segsPerTable: Int = 3): String = {
    val dir = Files.createTempDirectory("graft-routedlog").toString
    var us = 0L
    for (s <- 0 until segsPerTable; t <- Seq("orders", "users", "items")) {
      val recs = (0 until 10).map { i => us += 1; rec(us, t, s"k$i") }
      ChangefeedLog.writeSegmentAs(dir, recs, s"s$s${t.take(1)}x", tagTbl = true)
    }
    dir
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("routed log: groupBy(tbl) aggregate plans NO exchange") {
    val dir = buildRoutedLog()
    val conf = "spark.sql.sources.v2.bucketing.enabled"
    spark.conf.set(conf, "true")
    try {
      val agg = spark.read.format("graft-changefeed").option("path", dir)
        .load().groupBy("tbl")
        .agg(count(lit(1)).as("n"), max("sort_us").as("hi"))
      val plan = finalPlan(agg)
      assert(!plan.contains("Exchange"),
        s"routed layout still paid a shuffle:\n$plan")
      // and the numbers are right: 3 segments x 10 rows per table
      val got = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === Map("orders" -> 30L, "users" -> 30L, "items" -> 30L))
    } finally spark.conf.unset(conf)
  }

  test("mixed layout withdraws the report: same aggregate pays its exchange") {
    val dir = buildRoutedLog()
    // one UNTAGGED segment makes the layout mixed — the clustering
    // guarantee is gone and the scan must say so
    ChangefeedLog.writeSegmentAs(dir,
      Seq(rec(900L, "orders", "z"), rec(901L, "users", "z")), "mixed")
    val conf = "spark.sql.sources.v2.bucketing.enabled"
    spark.conf.set(conf, "true")
    try {
      val agg = spark.read.format("graft-changefeed").option("path", dir)
        .load().groupBy("tbl").agg(count(lit(1)).as("n"))
      val plan = finalPlan(agg)
      assert(plan.contains("Exchange"),
        s"mixed layout must shuffle for a per-table aggregate:\n$plan")
      val got = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === Map("orders" -> 31L, "users" -> 31L, "items" -> 30L))
    } finally spark.conf.unset(conf)
  }

  test("report withdrawn when tbl is pruned or the scan is the agg row") {
    val dir = buildRoutedLog()
    def freshScan(): ChangefeedScan = new ChangefeedScan(dir, None, None)
    // routed + tbl in the output → KeyGrouped over identity(tbl)
    val keyed = freshScan()
    keyed.outputPartitioning() match {
      case kg: KeyGroupedPartitioning =>
        assert(kg.keys.length === 1 && kg.keys()(0).toString.contains("tbl"))
        assert(kg.numPartitions === 9, "one partition per tagged segment")
      case other => fail(s"expected KeyGroupedPartitioning, got $other")
    }
    // tbl pruned away → nothing to cluster on → Unknown
    val pruned = freshScan()
    pruned.pruneColumns(org.apache.spark.sql.types.StructType(
      ChangefeedDataSource.schema.filter(_.name != "tbl")))
    assert(pruned.outputPartitioning().isInstanceOf[UnknownPartitioning],
      "a scan that does not output tbl cannot claim clustering on it")
    // metadata-aggregate scan (one synthetic row) → Unknown
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Max}
    val agged = freshScan()
    assert(agged.pushAggregation(new Aggregation(
      Array(new Max(Expressions.column("sort_us"))), Array.empty)))
    assert(agged.outputPartitioning().isInstanceOf[UnknownPartitioning])
  }

  test("routeByTable sink writes tagged segments; round-trip + exchange-free") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-routedsink").toString
    val df = (1L to 60L).map { i =>
      (i, s"t${i % 3}", s"k${i % 7}", s"""{"v":$i}""")
    }.toDF("sort_us", "tbl", "key", "value")
    // production shape: repartition by the routing key first (the
    // write-side shuffle a bucketed layout pays once), then route
    df.repartition(col("tbl")).write.format("graft-changefeed")
      .mode("append").option("path", dir).option("routeByTable", "true").save()
    val segs = ChangefeedLog.listSegments(dir)
    assert(segs.nonEmpty && segs.forall(_.tblTag.isDefined),
      s"sink left untagged segments: $segs")
    assert(segs.flatMap(_.tblTag).flatten.toSet === Set("t0", "t1", "t2"))
    val conf = "spark.sql.sources.v2.bucketing.enabled"
    spark.conf.set(conf, "true")
    try {
      val agg = spark.read.format("graft-changefeed").option("path", dir)
        .load().groupBy("tbl").agg(count(lit(1)).as("n"))
      val plan = finalPlan(agg)
      assert(!plan.contains("Exchange"), s"sink-routed log shuffled:\n$plan")
      assert(agg.collect().map(_.getLong(1)).sum === 60L)
    } finally spark.conf.unset(conf)
  }
}
