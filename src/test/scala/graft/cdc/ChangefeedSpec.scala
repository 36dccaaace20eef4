package graft.cdc

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ChangefeedSpec extends SparkSuite {

  test("changefeed frame classifies change vs resolved rows") {
    val rows = Changefeed.classify(spark, sf).collect()
    val byType = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("change") === 1000L) // one change row per event
    assert(byType("cursor") > 0L)
  }

  test("envelope matches the reference's published-message shape") {
    // README example: {"table":"foo","key":"[54]","value":{...}}
    val first = Changefeed.envelope(spark, sf)
      .where(col("event_id") === 0).collect()(0).getString(1)
    assert(first.startsWith("""{"table":"events","key":"[0]","value":{"after": {"event_id": 0"""))
    assert(first.endsWith("}}}"))
  }

  test("resolved cursor is the max end-of-hour over all events") {
    val r = Changefeed.resolvedCursor(spark, sf).collect()(0)
    val maxUs = graft.Tables.events(spark, sf)
      .agg(max(unix_micros(date_trunc("hour", col("ts"))) + lit(3600000000L)))
      .collect()(0).getLong(0)
    assert(r.getLong(0) === maxUs)
  }

  test("cursor store holds exactly one row per user (latest wins)") {
    val cs = Changefeed.cursorStore(spark, sf)
    val users = graft.Tables.events(spark, sf).select("user_id").distinct().count()
    assert(cs.count() === users)
    assert(cs.select("user_id").distinct().count() === users)
  }

  test("schema drift classifies added, removed, and stable payload keys") {
    // Crafted feed: `id` spans the window, `old_col` vanishes after
    // t=1, `new_col` appears at t=3 — the upstream ALTER TABLE shapes.
    import spark.implicits._
    val change = Seq(
      (1L, """{"after": {"id": 1, "old_col": 7}}"""),
      (2L, """{"after": {"id": 2}}"""),
      (3L, """{"after": {"id": 3, "new_col": 9}}"""),
      (4L, """{"after": {"id": 4, "new_col": 9}}"""))
      .toDF("sort_us", "value")
      .select(lit("t").as("tbl"), col("sort_us"), col("value"))
    val out = Changefeed.schemaDriftFrom(change).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getString(5))).toMap
    assert(out("id") === (4L, "stable"))
    assert(out("old_col") === (1L, "removed"))
    assert(out("new_col") === (2L, "added"))
  }

  test("schema drift on the synthetic feed is all-stable with full spans") {
    val rows = Changefeed.schemaDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(5) == "stable"))
    val keys = rows.map(_.getString(1)).toSet
    assert(keys.contains("event_id") && keys.contains("value_cents"))
  }

  test("incremental view: final ledger row equals a from-scratch aggregate of compacted state") {
    // the whole point of IVM — delta-folding must land exactly where a
    // full recompute over latest-per-PK state lands
    val ledger = Changefeed.incrementalView(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(ledger.nonEmpty)
    val finalPerType = ledger.groupBy(_._1).view
      .mapValues(rows => rows.maxBy(_._2)).toMap
    val scratch = Changefeed.compact(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("event_type"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("last_value_cents")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(finalPerType.keySet === scratch.keySet)
    finalPerType.foreach { case (t, (_, _, _, _, viewCount, viewSum)) =>
      val (n, s) = scratch(t)
      assert(viewCount === n, s"$t: IVM count $viewCount vs scratch $n")
      assert(viewSum === s, s"$t: IVM sum $viewSum vs scratch $s")
    }
    // deltas are consistent: per type, running view == prefix-sum of deltas
    ledger.groupBy(_._1).foreach { case (t, rows) =>
      val ordered = rows.sortBy(_._2)
      val (cs, ss) = ordered.foldLeft((0L, 0L)) { case ((c, s), r) =>
        val (nc, ns) = (c + r._3, s + r._4)
        assert(r._5 === nc && r._6 === ns, s"$t batch ${r._2} prefix mismatch")
        (nc, ns)
      }
      assert(cs > 0L, s"$t: no inserts?")
      (cs, ss)
    }
  }
}
