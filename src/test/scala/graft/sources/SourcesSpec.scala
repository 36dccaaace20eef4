package graft.sources

import java.nio.file.Files
import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** §2.8 sources/sinks: parquet (all tables), csv + json round-trips,
  * file streaming source, and the GraftExtensions SQL surface. */
class SourcesSpec extends SparkSuite {

  test("parquet: every test table loads with non-zero rows") {
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.foreach { n =>
      assert(Tables.load(spark, sf, n).count() > 0, s"table $n")
    }
  }

  test("csv round-trip preserves rows and values") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val src = Tables.nation(spark, sf)
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(src.schema).csv(dir)
    assert(back.count() === src.count())
    assert(back.orderBy("n_nationkey").collect().map(_.getString(1)).toSeq ===
      src.orderBy("n_nationkey").collect().map(_.getString(1)).toSeq)
  }

  test("json round-trip preserves the changefeed envelope payloads") {
    val dir = Files.createTempDirectory("graft-json").toString
    val env = graft.cdc.Changefeed.envelope(spark, sf).limit(50)
    env.write.mode("overwrite").json(dir)
    val back = spark.read.schema(env.schema).json(dir)
    assert(back.count() === 50)
    assert(back.agg(sum(length(col("payload")))).collect()(0).getLong(0) ===
      env.agg(sum(length(col("payload")))).collect()(0).getLong(0))
  }

  test("orc round-trip preserves rows and values") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val src = Tables.nation(spark, sf)
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === src.count())
    assert(back.orderBy("n_nationkey").collect().map(_.getString(1)).toSeq ===
      src.orderBy("n_nationkey").collect().map(_.getString(1)).toSeq)
  }

  test("file streaming source: parquet dir drives a streaming query") {
    val dir = Files.createTempDirectory("graft-stream-src").toString
    Tables.nation(spark, sf).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(Tables.nation(spark, sf).schema).parquet(dir)
    assert(stream.isStreaming)
    val q = stream.groupBy(col("n_regionkey")).count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("natcount")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-src").toString)
      .start()
    q.processAllAvailable()
    val total = spark.table("natcount").agg(sum("count")).collect()(0).getLong(0)
    q.stop()
    assert(total === 25L)
  }

  test("GraftExtensions exposes graft_dot to plain SQL") {
    graft.functions.Registry.ensure(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r === 32.0)
  }
}
