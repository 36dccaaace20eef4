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
}
