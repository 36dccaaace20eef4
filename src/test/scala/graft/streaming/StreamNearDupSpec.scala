package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSuite
import graft.operators.Pipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class TsDocRow(doc_id: Long, ts: Timestamp, source: String,
    lang: String, text: String)

/** §2#187 / VERDICT r9 item 8: banded MinHash near-dup ADMISSION on an
  * unbounded ingest stream — a near-dup arriving in a LATER
  * micro-batch is dropped at the door, exact duplicates are subsumed,
  * within-batch ties resolve deterministically, and band-registry
  * state is bounded by bands × admitted docs. */
class StreamNearDupSpec extends SparkSuite {
  import spark.implicits._

  // doc_ids chosen to pass the stratified 400‰ bucket filter for "de"
  private val ids = Seq(3L, 7L, 11L, 14L, 15L, 18L, 19L, 22L, 23L, 26L)
  private def doc(id: Long, batchSec: Long, text: String) =
    TsDocRow(id, new Timestamp(batchSec * 1000), "web", "de", text)

  private val baseText =
    "the quick brown fox jumps over the lazy dog while seven wizards " +
      "brew strong potions beneath the ancient oak tree every morning"
  // near-dup: one appended token — shingle sets differ by 3 of ~23,
  // so most MinHash bands agree (deterministic: xxhash64 is seeded)
  private val nearDupText = baseText + " quietly"
  private val otherText =
    "completely different content about distributed query engines " +
      "shuffling columnar batches across executor partitions with " +
      "adaptive skew handling and broadcast hash joins at scale"

  private def run(body: (MemoryStream[TsDocRow], () => Seq[IngestAdmit]) => Unit): Unit = {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[TsDocRow](71, spark, None)
      val name = "neardup" + math.abs(in.hashCode())
      val q = Pipeline.streamIngestNearDup(in.toDF(), Nil)
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-neardup").toString)
        .start()
      def emitted(): Seq[IngestAdmit] = {
        q.processAllAvailable()
        spark.table(name).as[IngestAdmit].collect().toSeq
      }
      body(in, emitted _)
      // state bound: the band registry holds nBands rows per admitted
      // doc (plus nothing for the transient per-doc conjunction)
      val admitted = emitted().count(_.admitted)
      val stateRows = q.lastProgress.stateOperators.asInstanceOf[Array[_]]
        .map(_.asInstanceOf[org.apache.spark.sql.streaming.StateOperatorProgress]
          .numRowsTotal).sum
      assert(stateRows <= 4L * admitted + 4L,
        s"registry state $stateRows exceeds bands x admitted ($admitted)")
      q.stop()
    } finally spark.conf.unset(key)
  }

  test("a near-dup arriving in a LATER micro-batch is dropped; unrelated docs pass") {
    run { (in, emitted) =>
      in.addData(doc(ids(0), 10, baseText))
      val e1 = emitted()
      assert(e1.map(a => (a.doc_id, a.admitted)) === Seq((ids(0), true)))

      // batch 2: the near-dup (one token appended) + an unrelated doc
      in.addData(doc(ids(1), 20, nearDupText), doc(ids(2), 20, otherText))
      val e2 = emitted().drop(e1.size).sortBy(_.doc_id)
      val byId = e2.map(a => a.doc_id -> a).toMap
      assert(byId(ids(1)).admitted === false,
        s"near-dup must be dropped: ${byId(ids(1))}")
      assert(byId(ids(1)).hit_bands >= 1)
      assert(byId(ids(2)).admitted === true, "unrelated doc must pass")

      // batch 3: exact duplicate of the original — every band hits
      in.addData(doc(ids(3), 30, baseText))
      val e3 = emitted().takeRight(1).head
      assert(e3.doc_id === ids(3) && !e3.admitted && e3.hit_bands === 4)
    }
  }

  test("within-batch tie: smallest doc_id claims, the other is dropped (deterministic)") {
    run { (in, emitted) =>
      in.addData(doc(ids(4), 10, otherText), doc(ids(5), 10, otherText))
      val got = emitted().sortBy(_.doc_id)
      assert(got.map(a => (a.doc_id, a.admitted)) ===
        Seq((ids(4), true), (ids(5), false)))
      assert(got(1).hit_bands === 4, "identical text must hit every band")
    }
  }

  test("registry survives a query restart: a near-dup of a pre-restart doc is still dropped") {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[TsDocRow](72, spark, None)
      val ckpt = Files.createTempDirectory("ckpt-neardup-restart").toString
      // the memory sink can't recover from a checkpoint — the restart
      // needs a real recoverable sink, so admissions land as json files
      val outDir = Files.createTempDirectory("out-neardup-restart").toString
      def start() = Pipeline.streamIngestNearDup(in.toDF(), Nil)
        .writeStream.outputMode("append").format("json")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .start()
      val q1 = start()
      in.addData(doc(ids(0), 10, baseText))
      q1.processAllAvailable()
      q1.stop() // relay restarts; RocksDB state must carry the registry

      val q2 = start()
      in.addData(doc(ids(1), 20, baseText))
      q2.processAllAvailable()
      q2.stop()
      val all = spark.read
        .schema(implicitly[org.apache.spark.sql.Encoder[IngestAdmit]].schema)
        .json(outDir).as[IngestAdmit].collect().sortBy(_.doc_id)
      assert(all.map(a => (a.doc_id, a.admitted)).toSeq ===
        Seq((ids(0), true), (ids(1), false)),
        s"restart lost the band registry: ${all.toSeq}")
      assert(all.last.hit_bands === 4)
    } finally spark.conf.unset(key)
  }

  test("stateless stages still apply: short docs and filtered langs never reach the registry") {
    run { (in, emitted) =>
      in.addData(
        doc(ids(6), 10, "too short"),                       // < minTokens
        TsDocRow(ids(7), new Timestamp(10000), "web", "xx", baseText), // lang rate 0
        doc(ids(8), 10, baseText))                          // passes
      val got = emitted()
      assert(got.map(a => (a.doc_id, a.admitted)) === Seq((ids(8), true)))
    }
  }
}
