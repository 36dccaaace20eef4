package graft.streaming

import java.nio.file.Files
import graft.SparkSuite
import graft.cdc.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** §2#16: a real watermarked windowed aggregation running under a
  * StreamingQuery (the streaming twin of StreamOps.windowAgg). */
class StreamingAggSpec extends SparkSuite {
  import spark.implicits._

  test("watermarked 1-hour windowed count/sum under a streaming query") {
    val in = MemoryStream[Ev](10, spark, None)
    val hourMs = 3600000L
    def ev(id: Long, ms: Long, typ: String, v: Double) =
      Ev(id, new java.sql.Timestamp(ms), id, typ, v, "{}")

    in.addData(
      ev(1, hourMs + 1, "click", 1.0),
      ev(2, hourMs + 2, "click", 2.0),
      ev(3, 2 * hourMs + 1, "view", 3.0))

    val agg = in.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))

    val q = agg.writeStream
      .outputMode("complete")
      .format("memory").queryName("winagg")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-agg").toString)
      .start()
    q.processAllAvailable()

    val out = spark.table("winagg")
      .select(col("event_type"), col("n"), col("v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    assert(out === Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
  }

  test("union fan-in: the combined watermark is the MIN over input frontiers") {
    // §2#176's law at the ENGINE level: a windowed append-mode agg over
    // the union of two watermarked streams may emit a window only when
    // EVERY input's watermark has passed its end — one lagging source
    // holds back the merge exactly as cdc_fan_in's ledger reports.
    val fast = MemoryStream[Ev](21, spark, None)
    val slow = MemoryStream[Ev](22, spark, None)
    val hourMs = 3600000L
    def ev(id: Long, ms: Long) =
      Ev(id, new java.sql.Timestamp(ms), id, "click", 1.0, "{}")

    val merged = fast.toDF().withWatermark("ts", "10 minutes")
      .unionByName(slow.toDF().withWatermark("ts", "10 minutes"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))

    val q = merged.writeStream
      .outputMode("append") // append = emit only on watermark close
      .format("memory").queryName("fanin")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-fanin").toString)
      .start()

    // both sources put rows in hour-1; the FAST source races 10 hours
    // ahead while the slow one stays inside hour 1
    fast.addData(ev(1, hourMs + 1000), ev(2, 10 * hourMs))
    slow.addData(ev(3, hourMs + 2000))
    q.processAllAvailable()
    // fast's frontier alone would close hour-1 — the min with slow's
    // (still inside hour 1) must NOT
    assert(spark.table("fanin").count() === 0L,
      "hour-1 window emitted while the slow input's watermark was still inside it")

    // the slow source advances past hour-1 + delay → now the MIN
    // frontier closes it and it emits exactly once with BOTH sources' rows
    slow.addData(ev(4, 2 * hourMs + 20 * 60000L))
    q.processAllAvailable()
    val rows = spark.table("fanin").collect()
    q.stop()
    assert(rows.length === 1)
    assert(rows.head.getLong(1) === 2L) // fast's hour-1 row + slow's
  }

  test("chained stateful aggs: 15-min windows roll up to hours in ONE streaming query") {
    // Spark 3.5+ allows MULTIPLE stateful operators in one query when
    // the second groups on the first's window column (window-on-window)
    // — the production two-tier rollup (fine windows for freshness, a
    // coarse tier for dashboards) without a second query re-reading the
    // fine tier. Both tiers share one watermark; append mode means each
    // hourly row emits exactly once, when the watermark passes its end.
    val in = MemoryStream[Ev](17, spark, None)
    val minMs = 60000L
    def ev(id: Long, ms: Long, typ: String) =
      Ev(id, new java.sql.Timestamp(ms), id, typ, 1.0, "{}")

    // hour 1 (ms 3_600_000..): events in three different 15-min slots
    in.addData(
      ev(1, 60 * minMs + 1, "click"), ev(2, 60 * minMs + 2, "click"),
      ev(3, 77 * minMs, "click"), ev(4, 100 * minMs, "view"))

    val fine = in.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n15"))
    val hourly = fine
      .groupBy(window(col("window"), "1 hour"), col("event_type"))
      .agg(sum(col("n15")).as("n"))
      .select(col("window.start").cast("long").as("start_s"),
        col("event_type"), col("n"))

    val q = hourly.writeStream
      .outputMode("append")
      .format("memory").queryName("chained")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-chain").toString)
      .start()
    q.processAllAvailable()
    // nothing final yet: the watermark hasn't passed hour 1's end
    assert(spark.table("chained").isEmpty)

    // a much later event pushes the watermark past hour 1 on the NEXT
    // batch (watermark advances at batch boundaries)
    in.addData(ev(9, 400 * minMs, "click"))
    q.processAllAvailable()
    in.addData(ev(10, 401 * minMs, "click"))
    q.processAllAvailable()

    val out = spark.table("chained").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(out === Set((3600L, "click", 3L), (3600L, "view", 1L)))
  }

  test("watermark eviction: a row older than the watermark is dropped, window emits once") {
    val in = MemoryStream[Ev](14, spark, None)
    val hourMs = 3600000L
    def ev(id: Long, ms: Long) =
      Ev(id, new java.sql.Timestamp(ms), id, "click", 1.0, "{}")

    val agg = in.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("start_s"), col("n"))

    val q = agg.writeStream
      .outputMode("append") // append: a window emits exactly once, final
      .format("memory").queryName("lateagg")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-late").toString)
      .start()
    in.addData(ev(1, hourMs + 1), ev(2, hourMs + 2)) // two rows in hour 1
    q.processAllAvailable()
    in.addData(ev(3, 4 * hourMs)) // advances watermark past hour 1's end
    q.processAllAvailable()
    in.addData(ev(4, hourMs + 3), // LATE: below the watermark → dropped
      ev(5, 5 * hourMs)) // and a fresh row to force the batch through
    q.processAllAvailable()
    val out = spark.table("lateagg").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    q.stop()
    // hour-1 window: emitted exactly once, count 2 — the late row
    // neither re-emits the window nor inflates it
    assert(out.filter(_._1 === hourMs / 1000).toSeq === Seq((hourMs / 1000, 2L)))
  }

  test("stream-static enrichment join: live events pick up broadcast dim attributes") {
    // the standard streaming-enrichment shape: an unbounded stream
    // joined to a bounded dimension — Spark re-plans the static side
    // per micro-batch and broadcasts it, no stream-side state at all
    val in = MemoryStream[Ev](11, spark, None)
    def ev(id: Long, typ: String, v: Double) =
      Ev(id, new java.sql.Timestamp(id * 1000L), id, typ, v, "{}")
    in.addData(ev(1, "click", 1.0), ev(2, "view", 2.0), ev(3, "click", 3.0),
      ev(4, "purchase", 4.0))

    val dim = Seq(("click", 10L), ("view", 20L)).toDF("event_type", "type_weight")
    val joined = in.toDF()
      .join(broadcast(dim), Seq("event_type")) // inner: unknown types drop
      .select(col("event_id"), col("event_type"), col("type_weight"))

    val q = joined.writeStream
      .outputMode("append")
      .format("memory").queryName("enriched")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-enrich").toString)
      .start()
    q.processAllAvailable()
    // second batch: the same static dim serves later micro-batches
    in.addData(ev(5, "view", 5.0), ev(6, "error", 6.0))
    q.processAllAvailable()
    val out = spark.table("enriched").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(out === Set((1L, "click", 10L), (3L, "click", 10L),
      (2L, "view", 20L), (5L, "view", 20L))) // purchase/error: no dim row
  }

  test("stream-stream join: purchases join clicks per user within the watermark") {
    val clicks = MemoryStream[Ev](12, spark, None)
    val purchases = MemoryStream[Ev](13, spark, None)
    def ev(id: Long, user: Long, ms: Long) =
      Ev(id, new java.sql.Timestamp(ms), user, "x", 1.0, "{}")

    val c = clicks.toDF().withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    val p = purchases.toDF().withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val joined = p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"))

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-ssj").toString)
      .start()
    val base = 3600000L
    clicks.addData(ev(1, 7, base), ev(2, 7, base + 25 * 60000), ev(3, 8, base))
    purchases.addData(ev(10, 7, base + 30 * 60000), ev(11, 9, base))
    q.processAllAvailable()
    val out = spark.table("ssjoin")
      .select(col("purchase_id"), col("click_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    // purchase 10 (user 7, t+30m) matches clicks 1 (t+0, exactly 30m) and 2 (t+25m);
    // purchase 11 (user 9) matches nothing
    assert(out === Set((10L, 1L), (10L, 2L)))
  }

  test("streaming dropDuplicates matches the batch dedup-by-key semantics") {
    val in = MemoryStream[Ev](11, spark, None)
    def ev(id: Long, user: Long, typ: String) =
      Ev(id, new java.sql.Timestamp(1000L * id), user, typ, 1.0, "{}")
    in.addData(ev(1, 1, "click"), ev(2, 1, "click"), ev(3, 1, "view"), ev(4, 2, "click"))

    val q = in.toDF()
      .dropDuplicates("user_id", "event_type")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedupkey")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-dd").toString)
      .start()
    q.processAllAvailable()
    val out = spark.table("dedupkey").select("event_id").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(out === Set(1L, 3L, 4L))
  }

  test("dropDuplicatesWithinWatermark dedups across batches with BOUNDED state") {
    // Plain streaming dropDuplicates keeps every seen key forever —
    // state grows with the stream. The production form bounds state to
    // the watermark window: a key older than the delay is evictable,
    // which is what makes exactly-once event dedup viable on an
    // unbounded 100 TB stream (at-least-once sources redeliver within
    // a bounded horizon, not years later).
    val in = MemoryStream[Ev](12, spark, None)
    def ev(id: Long, us: Long, user: Long) =
      Ev(id, new java.sql.Timestamp(us / 1000), user, "click", 1.0, "{}")

    val q = in.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedupwm")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-ddwm").toString)
      .start()

    val t0 = 1700000000000000L // µs
    in.addData(ev(1, t0, 1), ev(2, t0 + 60000000L, 2))
    q.processAllAvailable()
    // redelivery of event 1 in a later micro-batch, still inside the
    // watermark horizon → dropped
    in.addData(ev(1, t0 + 120000000L, 1), ev(3, t0 + 180000000L, 3))
    q.processAllAvailable()
    val out = spark.table("dedupwm").select("event_id").collect()
      .map(_.getLong(0)).toSeq
    q.stop()
    assert(out.sorted === Seq(1L, 2L, 3L)) // each event exactly once
  }
}
