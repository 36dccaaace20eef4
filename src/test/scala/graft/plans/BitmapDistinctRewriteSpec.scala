package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** §2#171: the count(DISTINCT) → bitmap-aggregation optimizer rule.
  * Fires on the canonical shape, stays out of everything else, and the
  * rewritten plan's results are bit-identical to Spark's own planning
  * — including the NULL seams (mixed-null groups, all-null groups, a
  * global aggregate over zero rows). */
class BitmapDistinctRewriteSpec extends SparkSuite {
  import spark.implicits._

  private def withRule[A](body: => A): A = {
    BitmapDistinctRewrite.ensure(spark)
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == BitmapDistinctRewrite)
  }

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private val nullish: DataFrame = Seq[(String, Option[Long])](
    ("a", Some(1L)), ("a", Some(1L)), ("a", None), ("b", None),
    ("c", Some(5L)), ("c", Some(70000L)), ("c", Some(5L))).toDF("g", "x")

  test("fires on grouped count(DISTINCT bigint) and matches exactly") {
    val events = graft.Tables.events(spark, sf)
    val q = () => events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"event_type")
    val baseline = q().collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    withRule {
      val df = q()
      assert(physical(df).contains("bitmap_construct_agg"),
        s"rule did not fire:\n${physical(df)}")
      assert(df.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
        === baseline)
    }
  }

  test("NULL seams: mixed-null and all-null groups keep their exact zeros") {
    val q = () => nullish.groupBy($"g").agg(countDistinct($"x").as("n"))
      .orderBy($"g")
    val expected = Seq("a" -> 1L, "b" -> 0L, "c" -> 2L)
    assert(q().collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      === expected)
    withRule {
      val df = q()
      assert(physical(df).contains("bitmap_construct_agg"))
      assert(df.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
        === expected)
    }
  }

  test("global aggregate over zero rows still yields 0, not NULL") {
    // a parquet-backed filter the optimizer cannot prove empty — the
    // rule fires and the runtime input is genuinely zero rows, which
    // exercises the coalesce(sum, 0) seam (sum alone would yield NULL)
    val q = () => graft.Tables.events(spark, sf).where($"user_id" < -1L)
      .agg(countDistinct($"user_id").as("n"))
    assert(q().collect().map(_.getLong(0)).toSeq === Seq(0L))
    withRule {
      val df = q()
      assert(physical(df).contains("bitmap_construct_agg"))
      assert(df.collect().map(_.getLong(0)).toSeq === Seq(0L))
    }
  }

  test("full Long domain: negatives, bucket boundaries, and extremes stay exact") {
    val nasty = Seq[(String, Option[Long])](
      ("a", Some(-1L)), ("a", Some(-32768L)), ("a", Some(-32769L)),
      ("a", Some(0L)), ("a", Some(32767L)), ("a", Some(32768L)),
      ("a", Some(-1L)), ("b", Some(Long.MaxValue)), ("b", Some(Long.MinValue)),
      ("b", Some(Long.MaxValue)), ("b", None)).toDF("g", "x")
    val q = () => nasty.groupBy($"g").agg(countDistinct($"x").as("n"))
      .orderBy($"g")
    val baseline = q().collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(baseline === Seq("a" -> 6L, "b" -> 2L))
    withRule {
      val df = q()
      assert(physical(df).contains("bitmap_construct_agg"))
      assert(df.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
        === baseline)
    }
  }

  test("IntegerType ids rewrite too (the bitmap inputs get the Long cast the analyzer no longer adds)") {
    // the embeddings label column is the schema-pinned IntegerType id
    // in the corpus — exactly the column a user would count
    val q = () => graft.Tables.embeddings(spark, sf)
      .select(($"vec_id" % 5).as("g"), $"label")
      .groupBy($"g").agg(countDistinct($"label").as("n"))
      .orderBy($"g")
    val baseline = q().collect().map(_.getLong(1)).toSeq
    withRule {
      val df = q()
      assert(physical(df).contains("bitmap_construct_agg"),
        s"rule did not fire on an Int column:\n${physical(df)}")
      assert(df.collect().map(_.getLong(1)).toSeq === baseline)
    }
  }

  test("conservative: mixed aggregates, string ids, multi-column distinct stay untouched") {
    withRule {
      // count(DISTINCT) mixed with another aggregate
      val mixed = nullish.groupBy($"g")
        .agg(countDistinct($"x").as("n"), sum($"x").as("s"))
      assert(!physical(mixed).contains("bitmap_construct_agg"))
      // string column — no bit positions for strings
      val strings = nullish.groupBy($"x").agg(countDistinct($"g").as("n"))
      assert(!physical(strings).contains("bitmap_construct_agg"))
      // multi-column distinct
      val multi = nullish.agg(countDistinct($"g", $"x").as("n"))
      assert(!physical(multi).contains("bitmap_construct_agg"))
      // all still produce correct results through Spark's own planning
      assert(mixed.orderBy($"g").collect().map(_.getLong(1)).toSeq
        === Seq(1L, 0L, 2L))
    }
  }

  test("the rewritten plan replaces the distinct double-shuffle with partial bitmaps") {
    withRule {
      val df = graft.Tables.events(spark, sf).groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n_users"))
      val plan = physical(df)
      // map-side partial bitmap aggregation before its exchange
      assert(plan.contains("partial_bitmap_construct_agg"), plan)
      // Spark's single-distinct planning would show a `count(distinct`
      // aggregate — gone after the rewrite
      assert(!plan.toLowerCase.contains("count(distinct"), plan)
    }
  }
}
