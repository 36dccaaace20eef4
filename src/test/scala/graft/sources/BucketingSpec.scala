package graft.sources

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Bucketed-table co-located join (§5 scale design): writing both fact
  * tables bucketed by the join key lets the join run with NO exchange —
  * at 100 TB this is the difference between re-shuffling the fact table
  * on every join and shuffling once at write time. */
class BucketingSpec extends SparkSuite {

  test("join of two tables bucketed by the key plans without a shuffle exchange") {
    // warehouse.dir is a static conf — tables land in ./spark-warehouse
    // (gitignored) and are dropped at the end; also clear any leftover
    // location from a previous aborted run (DROP alone won't)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    import scala.reflect.io.Directory
    new Directory(new java.io.File("spark-warehouse/li_bucketed")).deleteRecursively()
    new Directory(new java.io.File("spark-warehouse/ord_bucketed")).deleteRecursively()

    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    // disable broadcast so the planner actually exercises the bucketed
    // SortMergeJoin path (what a fact-fact join would do at scale)
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not introduce a shuffle: both sides are
    // already hash-bucketed on the key
    val joinSection = plan.substring(plan.indexOf("SortMergeJoin").max(0))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"bucketed join should not re-shuffle:\n$plan")

    // and it still computes the right thing
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.agg(sum("n")).collect()(0).getLong(0) === expected)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
  }
}
