package graft.streaming

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class RunningBalanceSpec extends SparkSuite {
  import spark.implicits._

  test("ListState recent-events ring keeps exactly the last 5 ids across batches") {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[LedgerEvent](33, spark, None)
      val q = RecentEvents.windows(in.toDS())
        .writeStream.outputMode("update")
        .format("memory").queryName("recentevents")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ckpt-recent").toString)
        .start()
      in.addData((1 to 4).map(i => LedgerEvent(9, i.toLong, i * 1000L, 1L)): _*)
      q.processAllAvailable()
      val r1 = spark.table("recentevents").as[RecentWindow].collect()
        .filter(_.user_id == 9L).maxBy(_.recent_ids.length)
      assert(r1 === RecentWindow(9L, 4L, "1,2,3,4"))
      // second batch overflows the ring: only the last 5 survive, ordered
      in.addData(Seq(6L, 5L).map(i => LedgerEvent(9, i, i * 1000L, 1L)): _*)
      q.processAllAvailable()
      // the memory sink does not guarantee batch insertion order on
      // collect(): pick the post-overflow row by its window high-water
      val r2 = spark.table("recentevents").as[RecentWindow].collect()
        .filter(_.user_id == 9L).maxBy(_.n_in_window)
      q.stop()
      assert(r2 === RecentWindow(9L, 5L, "2,3,4,5,6"))
    } finally {
      spark.conf.unset(key)
    }
  }

  test("MapState per-type counters accumulate independently per sub-key") {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[TypedEventIn](34, spark, None)
      val q = TypedCounts.counts(in.toDS())
        .writeStream.outputMode("update")
        .format("memory").queryName("typedcounts")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ckpt-tc").toString)
        .start()
      in.addData(TypedEventIn(1, "click", 1), TypedEventIn(1, "click", 2),
        TypedEventIn(1, "view", 3), TypedEventIn(2, "click", 4))
      q.processAllAvailable()
      in.addData(TypedEventIn(1, "click", 5)) // only (1, click) re-emits
      q.processAllAvailable()
      val out = spark.table("typedcounts").as[TypedCount].collect()
      q.stop()
      val latest = out.groupBy(c => (c.user_id, c.event_type))
        .view.mapValues(_.map(_.n).max).toMap
      assert(latest === Map((1L, "click") -> 3L, (1L, "view") -> 1L,
        (2L, "click") -> 1L))
    } finally {
      spark.conf.unset(key)
    }
  }

  test("transformWithState accumulates per-user balances across micro-batches") {
    implicit val s = spark
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[LedgerEvent](30, spark, None)
      val q = RunningBalance.updates(in.toDS())
        .writeStream.outputMode("update")
        .format("memory").queryName("balances")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-bal").toString)
        .start()

      in.addData(LedgerEvent(1, 1, 1000, 500), LedgerEvent(1, 2, 2000, 250),
        LedgerEvent(2, 3, 1500, 100))
      q.processAllAvailable()
      val b1 = spark.table("balances").as[LedgerUpdate].collect()
        .groupBy(_.user_id).view.mapValues(_.maxBy(_.n_events)).toMap
      assert(b1(1L) === LedgerUpdate(1, 2, 2, 750))
      assert(b1(2L) === LedgerUpdate(2, 3, 1, 100))

      // second micro-batch folds into the persisted state
      in.addData(LedgerEvent(1, 4, 3000, -750), LedgerEvent(2, 5, 2500, 900))
      q.processAllAvailable()
      val b2 = spark.table("balances").as[LedgerUpdate].collect()
        .groupBy(_.user_id).view.mapValues(_.maxBy(_.n_events)).toMap
      q.stop()
      assert(b2(1L) === LedgerUpdate(1, 4, 3, 0))
      assert(b2(2L) === LedgerUpdate(2, 5, 2, 1000))
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
