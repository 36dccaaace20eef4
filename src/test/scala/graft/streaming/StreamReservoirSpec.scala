package graft.streaming

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** §2#238: streaming bottom-k reservoir — batching-independent
  * membership, change-log emission, convergence to the batch #48
  * sample. */
class StreamReservoirSpec extends SparkSuite {
  import spark.implicits._

  private def run(k: Int)
      (body: (MemoryStream[ReservoirOffer], () => Seq[ReservoirChange]) => Unit)
      : Unit = {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[ReservoirOffer](91, spark, None)
      val q = StreamReservoir.changes(in.toDS(), k)
        .writeStream.outputMode("append")
        .format("memory").queryName("reservoir")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-reservoir").toString)
        .start()
      def emitted(): Seq[ReservoirChange] = {
        q.processAllAvailable()
        spark.table("reservoir").as[ReservoirChange].collect().toSeq
      }
      body(in, emitted _)
      q.stop()
    } finally spark.conf.unset(key)
  }

  /** Net membership from a change log. */
  private def live(changes: Seq[ReservoirChange]): Map[String, Set[Long]] =
    changes.groupBy(_.key).view.mapValues { cs =>
      val adds = cs.filter(_.action == "add").map(_.doc_id).toSet
      val evicts = cs.filter(_.action == "evict").map(_.doc_id).toSet
      adds -- evicts
    }.toMap

  test("converges to the batch sample_docs membership, any batching") {
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "doc_id").as[(String, Long)].collect()
    val want = BatchSampleRef.membership(spark, sf)
    run(k = 10) { (in, emitted) =>
      // adversarial batching: reverse doc_id order in 3 uneven chunks
      val rows = docs.sortBy(-_._2).map { case (s0, id) => ReservoirOffer(s0, id) }
      val chunks = Seq(rows.take(7), rows.slice(7, 50), rows.drop(50))
      chunks.foreach { c => in.addData(c.toIndexedSeq); emitted() }
      val got = live(emitted())
      assert(got === want, "stream reservoir != batch sample_docs")
      // state bound: never more than k live members per key
      got.values.foreach(s0 => assert(s0.size <= 10))
    }
  }

  test("evictions emitted when a smaller hash displaces a member") {
    run(k = 1) { (in, emitted) =>
      // find two ids where the second hashes SMALLER than the first
      def h(id: Long) = (id % 1000000007L) * 2654435761L % 1000000007L
      val a = 1L
      val b = (2L to 500L).find(i => h(i) < h(a)).get
      in.addData(ReservoirOffer("k", a))
      emitted()
      in.addData(ReservoirOffer("k", b))
      val e = emitted()
      assert(e.map(c => (c.doc_id, c.action)).toSet ===
        Set((a, "add"), (b, "add"), (a, "evict")))
    }
  }

  test("duplicate offers and no-op batches emit nothing") {
    run(k = 2) { (in, emitted) =>
      in.addData(ReservoirOffer("k", 5L), ReservoirOffer("k", 5L))
      assert(emitted().count(_.action == "add") === 1)
      val n = emitted().size
      in.addData(ReservoirOffer("k", 5L)) // already a member
      assert(emitted().size === n, "re-offer of a member must be silent")
    }
  }
}

/** Bridge to the batch operator's expected membership. */
private object BatchSampleRef {
  def membership(spark: org.apache.spark.sql.SparkSession, sf: String)
      : Map[String, Set[Long]] =
    graft.operators.Sampling.sampleDocs(spark, sf)
      .select("source", "doc_id")
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
}
