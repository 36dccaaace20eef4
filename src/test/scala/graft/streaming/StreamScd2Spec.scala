package graft.streaming

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** §2#253: streaming SCD2 — closed-version emission, cross-batch
  * continuity, equal-ts last-writer-wins, stale drops. */
class StreamScd2Spec extends SparkSuite {
  import spark.implicits._

  private def run(body: (MemoryStream[ChangeRow], () => Seq[Scd2Version]) => Unit): Unit = {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[ChangeRow](91, spark, None)
      val q = StreamScd2.versions(in.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName("scd2")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-scd2").toString)
        .start()
      def emitted(): Seq[Scd2Version] = {
        q.processAllAvailable()
        spark.table("scd2").as[Scd2Version].collect().toSeq
      }
      body(in, emitted _)
      q.stop()
    } finally spark.conf.unset(key)
  }

  test("versions close across batches with contiguous intervals") {
    run { (in, emitted) =>
      in.addData(ChangeRow("k", 1000L, "a"))
      assert(emitted().isEmpty, "an open version emits nothing yet")
      in.addData(ChangeRow("k", 3000L, "b"), ChangeRow("k", 5000L, "c"))
      val got = emitted().sortBy(_.version_n)
      assert(got.map(v => (v.version_n, v.valid_from_us, v.valid_to_us, v.value))
        === Seq((1L, 1000L, 3000L, "a"), (2L, 3000L, 5000L, "b")))
      // the batch twin's interval law: each valid_to = successor's
      // valid_from (cdc_scd2 derives the same via lead())
      assert(got(0).valid_to_us === got(1).valid_from_us)
    }
  }

  test("within-batch scrambled arrival applies in (sort_us, value) order") {
    run { (in, emitted) =>
      in.addData(ChangeRow("k", 5000L, "late"), ChangeRow("k", 1000L, "first"),
        ChangeRow("k", 3000L, "mid"))
      val got = emitted().sortBy(_.version_n)
      assert(got.map(_.value) === Seq("first", "mid"))
      assert(got.map(_.valid_to_us) === Seq(3000L, 5000L))
    }
  }

  test("equal-ts last-writer-wins by value; stale changes are dropped") {
    run { (in, emitted) =>
      in.addData(ChangeRow("k", 1000L, "a"), ChangeRow("k", 1000L, "z"))
      assert(emitted().isEmpty, "equal-ts replacement emits no zero-width version")
      // stale arrival (older than the open version) must not retro-insert
      in.addData(ChangeRow("k", 500L, "ancient"))
      assert(emitted().isEmpty)
      // the close reveals the retained winner: z (not a, not ancient)
      in.addData(ChangeRow("k", 2000L, "b"))
      val got = emitted()
      assert(got.map(v => (v.valid_from_us, v.valid_to_us, v.value))
        === Seq((1000L, 2000L, "z")))
    }
  }

  test("keys are independent; version numbering is per key") {
    run { (in, emitted) =>
      in.addData(ChangeRow("x", 10L, "x1"), ChangeRow("y", 10L, "y1"))
      in.addData(ChangeRow("x", 20L, "x2"), ChangeRow("y", 30L, "y2"),
        ChangeRow("x", 30L, "x3"))
      val byKey = emitted().groupBy(_.key)
      assert(byKey("x").map(_.version_n).sorted === Seq(1L, 2L))
      assert(byKey("y").map(_.version_n) === Seq(1L))
      assert(byKey("y").head.valid_to_us === 30L)
    }
  }
}
