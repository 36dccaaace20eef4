package graft.streaming

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SessionWindowsSpec extends SparkSuite {
  import spark.implicits._

  test("flatMapGroupsWithState closes a session when the 30-min gap breaks") {
    implicit val s = spark
    val in = MemoryStream[SessionEvent](20, spark, None)
    val gap = 1800000000L

    val q = SessionWindows.sessionize(in.toDS(), gap)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-sess").toString)
      .start()

    // batch 1: user 1 has two close events, then nothing closes yet
    in.addData(SessionEvent(1, 1, 1000), SessionEvent(1, 2, 2000))
    q.processAllAvailable()
    assert(spark.table("sessions").count() === 0)

    // batch 2: an event far beyond the gap closes the first session
    in.addData(SessionEvent(1, 3, 2000 + gap + 1))
    q.processAllAvailable()
    val closed = spark.table("sessions").as[ClosedSession].collect()
    assert(closed.toSeq === Seq(ClosedSession(1, 1000, 2000, 2)))

    // batch 3: a different user's gap-broken events close independently
    in.addData(SessionEvent(2, 4, 500), SessionEvent(2, 5, 600 + gap * 2))
    q.processAllAvailable()
    val all = spark.table("sessions").as[ClosedSession].collect()
    q.stop()
    assert(all.length === 2)
    assert(all.exists(c => c.user_id === 2 && c.n_events === 1))
  }

  test("mm_resize and mm_frame_sample produce deterministic stub output") {
    val r1 = graft.operators.Multimodal.resize(spark, sf).collect()
    val r2 = graft.operators.Multimodal.resize(spark, sf).collect()
    assert(r1.map(_.getLong(3)).toSeq === r2.map(_.getLong(3)).toSeq)
    assert(r1.forall(r => r.getInt(1) === 32 && r.getInt(2) === 32))

    val frames = graft.operators.Multimodal.frameSample(spark, sf)
    val perDoc = frames.groupBy("doc_id").count().collect()
    assert(perDoc.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 8))
  }
}
