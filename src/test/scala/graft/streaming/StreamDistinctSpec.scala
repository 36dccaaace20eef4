package graft.streaming

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** §2#173: streaming exact distinct count — bitmap MapState, exact
  * across batches, redeliveries silent, bucket boundaries and negative
  * ids handled. */
class StreamDistinctSpec extends SparkSuite {
  import spark.implicits._

  private def run(body: (MemoryStream[ItemEvent],
      () => Seq[DistinctCount]) => Unit): Unit = {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[ItemEvent](53, spark, None)
      val q = StreamDistinct.counts(in.toDS())
        .writeStream.outputMode("update")
        .format("memory").queryName("streamdistinct")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-streamdistinct").toString)
        .start()
      def emitted(): Seq[DistinctCount] = {
        q.processAllAvailable()
        spark.table("streamdistinct").as[DistinctCount].collect().toSeq
      }
      body(in, emitted _)
      q.stop()
    } finally spark.conf.unset(key)
  }

  test("exact across batches; pure redeliveries emit nothing") {
    run { (in, emitted) =>
      in.addData(ItemEvent("g", 1L), ItemEvent("g", 2L), ItemEvent("g", 1L),
        ItemEvent("h", 42L))
      val e1 = emitted()
      assert(e1.toSet === Set(DistinctCount("g", 2L), DistinctCount("h", 1L)))

      // batch 2: one genuinely new id + two redeliveries
      in.addData(ItemEvent("g", 3L), ItemEvent("g", 1L), ItemEvent("h", 42L))
      val e2 = emitted().drop(e1.size)
      assert(e2 === Seq(DistinctCount("g", 3L)),
        s"redelivery leaked an emission: $e2")

      // batch 3: nothing new at all — no emissions
      in.addData(ItemEvent("g", 2L), ItemEvent("h", 42L))
      assert(emitted().drop(e1.size + e2.size).isEmpty)
    }
  }

  test("bucket boundaries and negative ids count exactly") {
    run { (in, emitted) =>
      // ids straddling the 32768 bucket boundary, zero, and negatives
      val ids = Seq(0L, 1L, 32767L, 32768L, 32769L, -1L, -32768L, -32769L,
        1000000L, 0L, -1L, 32768L)
      in.addData(ids.map(ItemEvent("g", _)): _*)
      val expected = ids.distinct.size.toLong
      assert(emitted().last === DistinctCount("g", expected))
      // a second pass of the same ids changes nothing
      val before = emitted().size
      in.addData(ids.map(ItemEvent("g", _)): _*)
      assert(emitted().size === before)
    }
  }

  test("adaptive containers: sparse costs O(items), dense converts at 2048") {
    import BitmapDistinctProcessor._
    // sparse: n members encode to exactly 2n bytes (not 4 KB)
    var c: Container = decode(Array.emptyByteArray)
    (0 until 100).foreach(p => c = c.add(p * 17))
    assert(c.encode.length === 200)
    // round-trip preserves membership: re-adding is a no-op
    val rt = decode(c.encode)
    val again = rt.add(17)
    assert(!again.justAdded && (again eq rt))
    // filling past sparseMax converts to a 4096-byte bitmap that still
    // knows every member (add of an old member stays a no-op)
    (0 until 2100).foreach(p => c = c.add(p))
    assert(c.encode.length === 4096, "dense conversion missed")
    assert(!c.add(0).justAdded && !c.add(100 * 17).justAdded)
    assert(c.add(32767).justAdded)
    // the encodings stay unambiguous: max sparse payload < 4096
    assert(2 * sparseMax < 4096)
  }

  test("matches exact batch distinct on a replayed events sample") {
    run { (in, emitted) =>
      val sample = graft.Tables.events(spark, sf)
        .select($"event_type", $"user_id").limit(300)
        .as[(String, Long)].collect()
      val (b1, b2) = sample.splitAt(150)
      in.addData(b1.map { case (g, u) => ItemEvent(g, u) }: _*)
      emitted()
      in.addData(b2.map { case (g, u) => ItemEvent(g, u) }: _*)
      // totals are monotone and emitted once per batch — the max IS the
      // latest (robust to collect ordering)
      val last = emitted().groupBy(_.group).view
        .mapValues(_.map(_.n_distinct).max).toMap
      val exact = sample.groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.length.toLong).toMap
      assert(last === exact)
    }
  }
}
