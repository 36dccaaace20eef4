package graft.operators

import graft.SparkSuite

class TemporalSpec extends SparkSuite {

  test("asof join: every matched click is strictly before its purchase") {
    val rows = Temporal.asofJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(4) < r.getLong(2))) // click_us < purchase_us
    assert(rows.forall(_.getLong(5) > 0L))                // gap_us positive
  }

  test("range join: all pairs within the 5-minute window, ids ordered") {
    val rows = Temporal.rangeJoin(spark, sf).collect()
    assert(rows.forall(r => r.getLong(3) <= 300000000L))
    assert(rows.forall(r => r.getLong(1) < r.getLong(2)))
    // no duplicate pairs from the bucket fanout
    val pairs = rows.map(r => (r.getLong(1), r.getLong(2)))
    assert(pairs.distinct.length === pairs.length)
  }

  test("approx distinct stays within the configured 2% rsd (loose 10% bound)") {
    val rows = Analytics.qApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("quantiles are ordered p50 <= p90 and positive") {
    val rows = Analytics.qQuantiles(spark, sf).collect()
    assert(rows.length === 3)
    assert(rows.forall(r => r.getLong(1) > 0 && r.getLong(1) <= r.getLong(2)))
  }
}
