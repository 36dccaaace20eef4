package graft.plans

import graft.SparkSuite
import graft.operators.Analytics

class TopKPerKeySpec extends SparkSuite {

  test("native TopKPerKey matches the window row_number formulation exactly") {
    val native = Analytics.qTopkNative(spark, sf).collect()
    val window = Analytics.qWindowTopk(spark, sf).collect()
    assert(native.length === window.length)
    assert(native.map(_.toSeq).toSeq === window.map(_.toSeq).toSeq)
  }

  test("the physical plan contains TopKPerKeyExec (not a Window sort)") {
    val df = Analytics.qTopkNative(spark, sf)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerKey"))
    assert(!physical.contains("RunningWindowFunction"))
  }

  test("rank is bounded by k and unique within a key") {
    val rows = Analytics.qTopkNative(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getLong(3)).sorted.toSeq
      assert(ranks === (1L to ranks.length).toSeq)
      assert(ranks.length <= 3)
    }
  }
}
