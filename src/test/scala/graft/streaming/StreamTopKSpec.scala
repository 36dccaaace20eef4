package graft.streaming

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** §2#170: streaming heavy hitters — SpaceSaving summaries in bounded
  * state, exact when distinct ≤ capacity, certified error bounds when
  * evicting. */
class StreamTopKSpec extends SparkSuite {
  import spark.implicits._

  private def run(capacity: Int, k: Int)(body: (MemoryStream[ItemEvent],
      () => Seq[TopItem]) => Unit): Unit = {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[ItemEvent](47, spark, None)
      val q = StreamTopK.topk(in.toDS(), capacity, k)
        .writeStream.outputMode("update")
        .format("memory").queryName("streamtopk")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-streamtopk").toString)
        .start()
      def emitted(): Seq[TopItem] = {
        q.processAllAvailable()
        spark.table("streamtopk").as[TopItem].collect().toSeq
      }
      body(in, emitted _)
      q.stop()
    } finally spark.conf.unset(key)
  }

  test("exact counts accumulate across micro-batches when distinct <= capacity") {
    run(capacity = 64, k = 3) { (in, emitted) =>
      in.addData(ItemEvent("click", 1L), ItemEvent("click", 1L),
        ItemEvent("click", 2L), ItemEvent("view", 7L))
      val e1 = emitted()
      assert(e1.filter(_.group == "click").map(t => t.item -> t.count).toMap
        === Map(1L -> 2L, 2L -> 1L))
      assert(e1.filter(_.group == "view").map(t => t.item -> t.count).toMap
        === Map(7L -> 1L))
      assert(e1.forall(_.err == 0L)) // no evictions → exact

      // second batch: counts continue from state, k caps the emission
      in.addData(ItemEvent("click", 2L), ItemEvent("click", 2L),
        ItemEvent("click", 2L), ItemEvent("click", 3L), ItemEvent("click", 4L))
      val e2 = emitted().drop(e1.size).filter(_.group == "click")
      assert(e2.size === 3) // top-3 of 4 live items
      assert(e2.map(t => t.item -> t.count).toMap
        === Map(2L -> 4L, 1L -> 2L, 3L -> 1L)) // count desc, item asc tiebreak
    }
  }

  test("under eviction pressure: true heavy hitter survives with a certified bound") {
    run(capacity = 4, k = 4) { (in, emitted) =>
      // one dominant item (12 hits) + 8 distinct one-hit items through
      // capacity 4: the long tail churns, the heavy hitter must remain
      val tail = (100L to 107L).map(ItemEvent("g", _))
      val heavy = Seq.fill(12)(ItemEvent("g", 9L))
      in.addData(new scala.util.Random(7).shuffle(heavy ++ tail): _*)
      val out = emitted()
      val hh = out.find(_.item == 9L)
      assert(hh.isDefined, s"heavy hitter evicted: $out")
      // SpaceSaving bound: true ≤ count ≤ true + err
      assert(hh.get.count >= 12L && hh.get.count - hh.get.err <= 12L)
      // state is bounded at capacity
      assert(out.size <= 4)
      // total counted mass equals the number of observed rows (the
      // summary redistributes, never loses, mass)
      assert(out.map(_.count).sum === (heavy.size + tail.size).toLong)
    }
  }
}
