package graft.streaming

import java.nio.file.Files
import graft.SparkSuite
import graft.operators.Pipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

case class DocRow(doc_id: Long, source: String, lang: String, text: String)

class StreamIngestSpec extends SparkSuite {
  import spark.implicits._

  test("streaming ingest pipeline equals the batch application, dedups across batches") {
    implicit val s = spark
    val bench = Pipeline.benchWindowHashes(spark, sf)
    assert(bench.nonEmpty)

    // pre-dedup the feed (min doc_id per normalized class) so the
    // stream/batch comparison isn't hostage to which class member an
    // unordered dropDuplicates happens to keep
    val normHash = md5(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9\\s]", ""), "\\s+", " "))
    val unique = graft.Tables.documents(spark, sf)
      .withColumn("rn", row_number().over(
        Window.partitionBy(normHash).orderBy(col("doc_id"))))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .as[DocRow].collect().sortBy(_.doc_id)

    val expected = Pipeline.streamIngest(
        unique.toSeq.toDF("doc_id", "source", "lang", "text"), bench)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(expected.nonEmpty)

    val in = MemoryStream[DocRow](40, spark, None)
    val q = Pipeline.streamIngest(in.toDF(), bench)
      .writeStream.outputMode("append")
      .format("memory").queryName("ingest")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-ing").toString)
      .start()

    val (first, second) = unique.splitAt(unique.length / 2)
    in.addData(first.toIndexedSeq)
    q.processAllAvailable()
    // second batch includes an exact duplicate (same text, new id) of a
    // batch-1 doc — the cross-batch dedup state must drop it
    val dupOf = first.head
    in.addData(second.toIndexedSeq :+ DocRow(9999999L, dupOf.source, dupOf.lang, dupOf.text))
    q.processAllAvailable()
    val got = spark.table("ingest").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    q.stop()

    assert(!got.exists(_._1 == 9999999L)) // duplicate never surfaced
    assert(got === expected)              // stream ≡ batch, stage for stage
  }
}
