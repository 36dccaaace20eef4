package graft.streaming

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** §2#158: the streaming CDC apply — latest-wins BY COMMIT TIME across
  * micro-batches, stale redeliveries dropped, tombstones final. */
class CdcApplySpec extends SparkSuite {
  import spark.implicits._

  private def run(body: (MemoryStream[ChangeRow],
      () => Seq[Materialized]) => Unit): Unit = {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[ChangeRow](41, spark, None)
      val q = CdcApply.updates(in.toDS())
        .writeStream.outputMode("update")
        .format("memory").queryName("cdcapply")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-cdcapply").toString)
        .start()
      def emitted(): Seq[Materialized] = {
        q.processAllAvailable()
        spark.table("cdcapply").as[Materialized].collect().toSeq
      }
      body(in, emitted _)
      q.stop()
    } finally spark.conf.unset(key)
  }

  test("latest-wins by commit time: stale redeliveries never regress the view") {
    run { (in, emitted) =>
      // batch 1: two keys insert
      in.addData(ChangeRow("k1", 100L, "{\"after\": {\"v\": 1}}"),
        ChangeRow("k2", 100L, "{\"after\": {\"v\": 10}}"))
      val e1 = emitted()
      assert(e1.toSet === Set(
        Materialized("k1", 100L, "{\"after\": {\"v\": 1}}", "upsert"),
        Materialized("k2", 100L, "{\"after\": {\"v\": 10}}", "upsert")))

      // batch 2: k1 advances; k2 gets an OUT-OF-ORDER older version
      // (an at-least-once redelivery) — it must be dropped
      in.addData(ChangeRow("k1", 200L, "{\"after\": {\"v\": 2}}"),
        ChangeRow("k2", 50L, "{\"after\": {\"v\": 9}}"))
      val e2 = emitted()
      assert(e2.count(_.key == "k1") === 2) // k1 re-emitted at 200
      assert(e2.filter(_.key == "k1").map(_.sort_us).max === 200L)
      assert(e2.count(_.key == "k2") === 1, "stale k2 change leaked through")

      // batch 3: exact duplicate redelivery of the k1 winner — dropped
      in.addData(ChangeRow("k1", 200L, "{\"after\": {\"v\": 2}}"))
      assert(emitted().count(_.key == "k1") === 2)
    }
  }

  test("in-batch ordering: the max-commit version wins within one batch") {
    run { (in, emitted) =>
      in.addData(ChangeRow("k", 300L, "{\"after\": {\"v\": 3}}"),
        ChangeRow("k", 100L, "{\"after\": {\"v\": 1}}"),
        ChangeRow("k", 200L, "{\"after\": {\"v\": 2}}"))
      val e = emitted()
      assert(e === Seq(Materialized("k", 300L, "{\"after\": {\"v\": 3}}", "upsert")))
    }
  }

  test("tombstones delete once and stale pre-delete changes cannot resurrect") {
    run { (in, emitted) =>
      in.addData(ChangeRow("k", 100L, "{\"after\": {\"v\": 1}}"))
      emitted()
      in.addData(ChangeRow("k", 500L, "{\"after\": null}"))
      val e2 = emitted()
      assert(e2.map(_.op).sorted === Seq("delete", "upsert"))
      // a LATE change that committed before the delete: zombie row — no
      in.addData(ChangeRow("k", 400L, "{\"after\": {\"v\": 9}}"))
      assert(emitted().size === 2, "zombie row resurrected a deleted key")
      // a second tombstone redelivery emits nothing new
      in.addData(ChangeRow("k", 500L, "{\"after\": null}"))
      assert(emitted().size === 2)
      // but a GENUINELY newer insert after the delete re-creates the key
      in.addData(ChangeRow("k", 600L, "{\"after\": {\"v\": 6}}"))
      val e5 = emitted()
      assert(e5.size === 3 &&
        e5.exists(m => m.sort_us == 600L && m.op == "upsert"))
    }
  }
}
