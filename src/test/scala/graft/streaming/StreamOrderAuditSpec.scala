package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** §2#244: streaming order audit — commit-order walk, cross-batch
  * counters, agreement with the batch twin's arithmetic. */
class StreamOrderAuditSpec extends SparkSuite {
  import spark.implicits._

  private def ch(key: String, id: Long, ms: Long) =
    AuditChange(key, id, new Timestamp(ms))

  private def run(body: (MemoryStream[AuditChange], () => Seq[AuditRow]) => Unit)
      : Unit = {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[AuditChange](93, spark, None)
      val q = StreamOrderAudit.audit(in.toDS())
        .writeStream.outputMode("update")
        .format("memory").queryName("orderaudit")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-orderaudit").toString)
        .start()
      def latest(): Seq[AuditRow] = {
        q.processAllAvailable()
        // update mode appends each batch's rows to the memory sink;
        // the LAST row per key is the current state
        spark.table("orderaudit").as[AuditRow].collect().toSeq
      }
      body(in, latest _)
      q.stop()
    } finally spark.conf.unset(key)
  }

  private def current(rows: Seq[AuditRow]): Map[String, AuditRow] =
    rows.groupBy(_.key).view.mapValues(_.maxBy(_.n_changes)).toMap

  test("inversions counted in commit order, scrambled arrival") {
    run { (in, latest) =>
      // commit order (by event_id): ts 9s, 4s, 6s → ONE inversion of
      // 5s at step 2 (6s after 4s is in order); arrival scrambled
      in.addData(ch("k", 5, 6000L), ch("k", 3, 9000L), ch("k", 4, 4000L))
      val a = current(latest())("k")
      assert(a.n_changes === 3L && a.n_inversions === 1L)
      assert(a.max_regress_us === 5000000L)
      assert(a.ordered_pm === 666L)
    }
  }

  test("counters accumulate across batches; keys independent") {
    run { (in, latest) =>
      in.addData(ch("a", 1, 5000L), ch("b", 2, 1000L))
      latest()
      // a regresses in a LATER batch (cross-batch inversion); b stays
      // monotone
      in.addData(ch("a", 3, 2000L), ch("b", 4, 3000L))
      val m = current(latest())
      assert(m("a").n_inversions === 1L && m("a").max_regress_us === 3000000L)
      assert(m("b").n_inversions === 0L && m("b").ordered_pm === 1000L)
    }
  }

  test("agrees with the batch twin on the same feed") {
    // drive the sf events through one batch and compare totals with
    // cdc_order_audit's per-partition rollup
    val events = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"))
      .collect()
      .map(r => AuditChange(s"u${r.getLong(0)}", r.getLong(1),
        r.getTimestamp(2)))
    run { (in, latest) =>
      in.addData(events.toIndexedSeq)
      val m = current(latest())
      val streamInv = m.values.map(_.n_inversions).sum
      val streamN = m.values.map(_.n_changes).sum
      val batch = graft.cdc.Changefeed.orderAudit(spark, sf).collect()
      assert(streamInv === batch.map(_.getLong(3)).sum)
      assert(streamN === batch.map(_.getLong(2)).sum)
    }
  }
}
