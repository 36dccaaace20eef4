package graft.streaming

import java.nio.file.Files
import graft.SparkSuite
import graft.cdc.{Changefeed, Ev}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** §2#212 live IVM: the chained PK-delta → view-fold stateful pair
  * must land on exactly the batch `cdc_incremental_view` final state,
  * no matter how the history is sliced into micro-batches. */
class StreamIvmSpec extends SparkSuite {
  import spark.implicits._

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streamed view equals the batch IVM final ledger, across a batch split")(withRocksDb {
    val in = MemoryStream[Ev](31, spark, None)
    // three PKs; u1/click gets an update in a LATER micro-batch, so the
    // second batch must fold (0, v_new − v_old) against persisted state
    def ev(id: Long, ms: Long, u: Long, typ: String, v: Double) =
      Ev(id, new java.sql.Timestamp(ms), u, typ, v, "{}")
    val q = StreamIvm.views(in.toDF())(spark).writeStream
      .outputMode("update")
      .format("memory").queryName("ivm")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-ivm").toString)
      .start()

    in.addData(
      ev(1, 1000, 1, "click", 1.00),
      ev(2, 2000, 2, "click", 2.00),
      ev(3, 3000, 1, "view", 5.00))
    q.processAllAvailable()
    in.addData(
      ev(4, 4000, 1, "click", 7.50), // update of PK (1, click): Δ = +650c
      ev(5, 5000, 3, "click", 4.00)) // new PK
    q.processAllAvailable()

    // latest row per type from the update-mode sink
    val rows = spark.table("ivm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val latest = rows.zipWithIndex.groupBy(_._1._1).view
      .mapValues(_.maxBy(_._2)._1).toMap
    q.stop()
    assert(latest("click") === (("click", 3L, 1350L))) // 750 + 200 + 400
    assert(latest("view") === (("view", 1L, 500L)))
  })

  test("out-of-order arrival: a stale change in a later batch is dropped")(withRocksDb {
    // the ADVICE r11 seam: a change arriving in a LATER micro-batch
    // with an EARLIER (us, event_id) must not overwrite the newer
    // applied version — state remembers the last applied position and
    // drops stale rows, so the final view equals the batch ledger
    // (which orders globally by (us, event_id)) even under
    // out-of-order slicings.
    val in = MemoryStream[Ev](33, spark, None)
    def ev(id: Long, ms: Long, u: Long, typ: String, v: Double) =
      Ev(id, new java.sql.Timestamp(ms), u, typ, v, "{}")
    val q = StreamIvm.views(in.toDF())(spark).writeStream
      .outputMode("update")
      .format("memory").queryName("ivm_ooo")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-ivm3").toString)
      .start()

    in.addData(ev(2, 2000, 1, "click", 7.50)) // newest version first
    q.processAllAvailable()
    in.addData(ev(1, 1000, 1, "click", 1.00)) // stale: must be ignored
    q.processAllAvailable()

    val rows = spark.table("ivm_ooo").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    q.stop()
    // batch ledger final state: count 1, sum 750c (the us=2000 version)
    val latest = rows.zipWithIndex.groupBy(_._1._1).view
      .mapValues(_.maxBy(_._2)._1).toMap
    assert(latest("click") === (("click", 1L, 750L)),
      s"stale change leaked into the view: ${rows.toSeq}")
  })

  test("streamed view over the corpus equals the batch ledger's final rows")(withRocksDb {
    val events = graft.Tables.events(spark, sf).orderBy(col("event_id"))
    val half = events.count() / 2
    val first = events.limit(half.toInt)
    val second = events.join(first.select(col("event_id").as("eid")),
      col("event_id") === col("eid"), "left_anti")

    val in = MemoryStream[Ev](32, spark, None)
    val q = StreamIvm.views(in.toDF())(spark).writeStream
      .outputMode("update")
      .format("memory").queryName("ivm_corpus")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-ivm2").toString)
      .start()
    def feed(df: org.apache.spark.sql.DataFrame): Unit = {
      in.addData(df.as[Ev].collect().toSeq)
      q.processAllAvailable()
    }
    feed(first)
    feed(second)

    val rows = spark.table("ivm_corpus").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val latest = rows.zipWithIndex.groupBy(_._1._1).view
      .mapValues(_.maxBy(_._2)._1).toMap
    q.stop()

    val batch = Changefeed.incrementalView(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(4), r.getLong(5)))
    val batchFinal = batch.groupBy(_._1).view
      .mapValues(rs => rs.maxBy(_._2)).toMap
    assert(latest.keySet === batchFinal.keySet)
    latest.foreach { case (t, (_, n, s)) =>
      val (_, _, bn, bs) = batchFinal(t)
      assert(n === bn, s"$t: stream count $n vs batch $bn")
      assert(s === bs, s"$t: stream sum $s vs batch $bs")
    }
  })
}
