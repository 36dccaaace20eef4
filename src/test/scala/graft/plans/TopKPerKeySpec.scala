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

  test("TopKWindowRewrite: UNCHANGED window user code plans through TopKPerKeyExec") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ TopKWindowRewrite
    TopKPerKey.ensureStrategy(spark)
    try {
      // qWindowTopk is the plain row_number()<=3 formulation — with the
      // rule injected it must plan through the custom operator...
      val rewritten = Analytics.qWindowTopk(spark, sf)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey") && plan.contains("TopKPerKeyPartial"),
        s"rewrite did not fire:\n$plan")
      assert(!plan.contains(" Window "),
        s"window operator survived the rewrite:\n$plan")
      val got = rewritten.collect().map(_.toSeq).toSeq
      // ...and produce bit-identical results to the un-rewritten plan
      spark.experimental.extraOptimizations = prev
      val want = Analytics.qWindowTopk(spark, sf).collect().map(_.toSeq).toSeq
      assert(got === want)
    } finally {
      spark.experimental.extraOptimizations = prev
    }
  }

  test("TopKWindowRewrite bails on near-unique keys (no Aggregate below the window)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ TopKWindowRewrite
    try {
      // row_number()<=k over the RAW scan partitioned by l_orderkey —
      // near-unique keys, the no-spill buffer's OOM shape. The memory
      // guard must keep Spark's spilling window sort.
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("qty_c").desc, col("l_linenumber"))
      val df = graft.Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          graft.functions.Fns.cents(col("l_quantity")).as("qty_c"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 2)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerKeyPartial"),
        s"rewrite fired on a raw-scan (near-unique key) window:\n$plan")
      val rows = df.collect()
      assert(rows.nonEmpty)
      rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
        assert(rs.length <= 2)
      }
    } finally {
      spark.experimental.extraOptimizations = prev
    }
  }

  test("TopKWindowRewrite bails on patterns outside its contract") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ TopKWindowRewrite
    try {
      // rank() is not row_number(): must NOT rewrite, must stay correct
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("qty_c").desc, col("l_orderkey"))
      val df = graft.Tables.lineitem(spark, sf)
        .select(col("l_returnflag"), col("l_orderkey"),
          graft.functions.Fns.cents(col("l_quantity")).as("qty_c"))
        .withColumn("rk", rank().over(w))
        .where(col("rk") <= 2)
      assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKeyPartial"))
      assert(df.collect().nonEmpty)
    } finally {
      spark.experimental.extraOptimizations = prev
    }
  }
}
