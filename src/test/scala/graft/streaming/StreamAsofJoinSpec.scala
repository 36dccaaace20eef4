package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** §2#235: streaming as-of join — latest-at-or-before enrichment,
  * bounded per-key reference history, late-probe correctness. */
class StreamAsofJoinSpec extends SparkSuite {
  import spark.implicits._

  private def probe(key: String, id: Long, ms: Long) =
    AsofInput(key, id, new Timestamp(ms), is_right = false, 0L)
  private def ref(key: String, ms: Long, v: Long, id: Long = 0L) =
    AsofInput(key, id, new Timestamp(ms), is_right = true, v)

  private def run(maxHistory: Int = 64)
      (body: (MemoryStream[AsofInput], () => Seq[AsofMatch]) => Unit): Unit = {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[AsofInput](87, spark, None)
      val q = StreamAsofJoin.enrich(in.toDS(), maxHistory)
        .writeStream.outputMode("append")
        .format("memory").queryName("asof")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-asof").toString)
        .start()
      def emitted(): Seq[AsofMatch] = {
        q.processAllAvailable()
        spark.table("asof").as[AsofMatch].collect().toSeq
      }
      body(in, emitted _)
      q.stop()
    } finally spark.conf.unset(key)
  }

  test("latest at-or-before wins; equal timestamp is visible (≤)") {
    run() { (in, emitted) =>
      in.addData(ref("k", 1000L, 10L), ref("k", 3000L, 30L),
        probe("k", 1, 2000L), // between refs → ref@1000
        probe("k", 2, 3000L), // equal ts → ref@3000 (the ≤ contract)
        probe("k", 3, 500L))  // before any ref → miss
      val got = emitted().map(m => m.event_id -> m).toMap
      assert(got(1L).matched && got(1L).ref_ts_ms === 1000L
        && got(1L).ref_value === 10L)
      assert(got(2L).matched && got(2L).ref_ts_ms === 3000L
        && got(2L).ref_value === 30L)
      assert(!got(3L).matched && got(3L).ref_ts_ms === -1L)
    }
  }

  test("history survives batches: late probes resolve against old refs") {
    run() { (in, emitted) =>
      in.addData(ref("k", 1000L, 10L), ref("k", 5000L, 50L))
      emitted()
      // a LATE probe (ts between the two retained refs) next batch:
      // a last-value-only join would wrongly hand it ref@5000
      in.addData(probe("k", 1, 2000L))
      val m = emitted().head
      assert(m.matched && m.ref_ts_ms === 1000L && m.ref_value === 10L)
    }
  }

  test("references arriving after a probe do not retro-correct it") {
    run() { (in, emitted) =>
      in.addData(probe("k", 1, 2000L))
      assert(!emitted().head.matched)
      in.addData(ref("k", 1000L, 10L), probe("k", 2, 2000L))
      val byId = emitted().map(m => m.event_id -> m).toMap
      assert(!byId(1L).matched, "append mode: no retroactive emission")
      assert(byId(2L).matched && byId(2L).ref_value === 10L)
    }
  }

  test("bounded history evicts oldest; keys are independent") {
    run(maxHistory = 2) { (in, emitted) =>
      in.addData(ref("k", 1000L, 10L), ref("k", 2000L, 20L),
        ref("k", 3000L, 30L), ref("other", 500L, 5L))
      emitted()
      // ref@1000 evicted (bound 2) → a probe older than the retained
      // window misses; probes inside it resolve exactly
      in.addData(probe("k", 1, 1500L), probe("k", 2, 2500L),
        probe("other", 3, 600L))
      val got = emitted().map(m => m.event_id -> m).toMap
      assert(!got(1L).matched, "evicted reference must not resurface")
      assert(got(2L).matched && got(2L).ref_value === 20L)
      assert(got(3L).matched && got(3L).ref_value === 5L)
    }
  }

  test("equal-ts references: last writer by event_id wins, any arrival order") {
    run() { (in, emitted) =>
      // arrival order puts the SMALLER event_id last — the verdict
      // must still be the larger writer's value
      in.addData(ref("k", 1000L, 50L, id = 5), ref("k", 1000L, 20L, id = 2),
        probe("k", 1, 1500L))
      assert(emitted().head.ref_value === 50L)
      // a later batch's LARGER-event_id writer at the same ts replaces
      // the retained one
      in.addData(ref("k", 1000L, 70L, id = 7), probe("k", 2, 1500L))
      val m = emitted().find(_.event_id == 2L).get
      assert(m.ref_value === 70L)
      // but a re-delivered/replayed OLD reference (smaller event_id)
      // in a later batch must NOT overwrite the retained winner —
      // last-writer-wins holds across batches, not just within one
      in.addData(ref("k", 1000L, 30L, id = 3), probe("k", 3, 1500L))
      val m3 = emitted().find(_.event_id == 3L).get
      assert(m3.ref_value === 70L, "stale re-delivery flipped the verdict")
    }
  }

  test("same-batch reference beyond the retention bound still matches its probe") {
    run(maxHistory = 2) { (in, emitted) =>
      // three refs + a probe between the first two, ONE batch: the
      // probe must see ref@10 even though retention keeps only 20/30
      in.addData(ref("k", 10L, 1L), ref("k", 20L, 2L), ref("k", 30L, 3L),
        probe("k", 1, 15L))
      val m1 = emitted().head
      assert(m1.matched && m1.ref_ts_ms === 10L && m1.ref_value === 1L)
      // next batch: ref@10 is evicted from RETAINED state
      in.addData(probe("k", 2, 15L))
      assert(!emitted().find(_.event_id == 2L).get.matched)
    }
  }

  test("within-batch determinism: out-of-order arrival, ordered verdicts") {
    run() { (in, emitted) =>
      // arrival order scrambled; semantics must follow timestamps
      in.addData(probe("k", 9, 4000L), ref("k", 3500L, 35L),
        probe("k", 2, 3600L), ref("k", 100L, 1L))
      val got = emitted().map(m => m.event_id -> m).toMap
      assert(got(2L).ref_ts_ms === 3500L && got(9L).ref_ts_ms === 3500L)
    }
  }
}
