package graft

import java.nio.file.Files
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming._

/** Input row for the [[StreamIvm]] drive — the five columns
  * `StreamIvm.views` selects from a changefeed frame. */
case class StreamBenchEv(event_id: Long, ts: java.sql.Timestamp,
    user_id: Long, event_type: String, value: Double)

/** STREAMING micro-bench — the measured-throughput story for the
  * stateful half of the surface (the batch half has `graft.Bench`;
  * until r13 the six transformWithState operators had correctness
  * specs but no recorded rows/sec or state-size numbers).
  *
  * Method: per operator, a deterministic synthetic workload of
  * `SPARK_GRAFT_STREAM_ROWS` rows (default 200k) is fed through a
  * MemoryStream in `SPARK_GRAFT_STREAM_BATCHES` micro-batches (default
  * 20) into the operator's production pipeline (RocksDB state store —
  * the provider a real cluster runs), sunk to `noop` so sink cost
  * never pollutes the operator measurement. One small untimed warmup
  * batch pays query start + first-batch planning/codegen; the timed
  * region is exactly the N driven batches (addData +
  * processAllAvailable per batch, so batch boundaries are
  * deterministic). Best-of-`SPARK_GRAFT_STREAM_REPS` (default 2)
  * fresh-checkpoint passes, same min-of-n estimator as Bench.
  *
  * Reported per op: rows, batches, wall sec, rows/sec, and the state
  * operators' final numRowsTotal (the state-size story — bounded
  * summaries should sit at O(groups·capacity), not O(rows)). One JSON
  * line on stdout; appended to bench_history.jsonl with
  * `"sf":"stream"` so batch baseline selection (which filters on its
  * own sf dir) never reads a streaming line as a batch one. */
object StreamBench {
  private var streamId = 1000 // MemoryStream ids, unique per query

  private[graft] def drive[I: Encoder, O](spark: SparkSession, name: String,
      rows: Int, batches: Int, reps: Int,
      gen: Int => I, outputMode: String,
      pipe: Dataset[I] => Dataset[O]): (Double, Long, Long) = {
    val perBatch = rows / batches
    var best = Double.MaxValue
    var stateRows = 0L
    var emitted = 0L
    (1 to reps).foreach { _ =>
      streamId += 1
      val in = MemoryStream[I](streamId, spark, None)(implicitly[Encoder[I]])
      val q: StreamingQuery = pipe(in.toDS()).writeStream
        .outputMode(outputMode).format("noop")
        .option("checkpointLocation",
          Files.createTempDirectory(s"ckpt-sb-$name").toString)
        .start()
      // warmup: one row re-used from the workload head (start-up,
      // planning, codegen, RocksDB open — all outside the timed region)
      in.addData(gen(0))
      q.processAllAvailable()
      val t0 = System.nanoTime()
      var i = 0
      while (i < batches) {
        in.addData((i * perBatch until (i + 1) * perBatch).map(gen))
        q.processAllAvailable()
        i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      if (dt < best) {
        best = dt
        val p = q.lastProgress
        stateRows = p.stateOperators.map(_.numRowsTotal).sum
        emitted = q.recentProgress.map(_.sink.numOutputRows).sum
      }
      q.stop()
    }
    (best, stateRows, emitted)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_STREAM_ROWS", "200000").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "20").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_STREAM_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val s: SparkSession = spark

    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i.toLong)

    // Workloads: deterministic functions of the row index — replayable
    // numbers, no RNG state. Skews chosen to exercise each operator's
    // state regime (eviction pressure, bounded bitmaps, band
    // collisions, cross-batch updates), not best-case uniformity.
    val ops = Seq[(String, () => (Double, Long, Long))](
      // 8 groups; 80% of traffic on 16 hot items, tail over 4096 —
      // SpaceSaving runs under real eviction pressure (capacity 64)
      ("stream_topk", () => drive[ItemEvent, TopItem](spark, "topk",
        rows, batches, reps,
        i => ItemEvent(s"g${i % 8}",
          if (i % 5 < 4) (i % 16).toLong else (i % 4096).toLong),
        "update", ds => StreamTopK.topk(ds))),
      // 16 groups × 50k item space: sparse→dense bitmap container flips
      ("stream_distinct", () => drive[ItemEvent, DistinctCount](spark,
        "distinct", rows, batches, reps,
        i => ItemEvent(s"g${i % 16}", (i % 50000).toLong),
        "update", ds => StreamDistinct.counts(ds))),
      // 16 groups, values cycling 0..9999 in bucket width 100
      ("stream_quantiles", () => drive[MeasureEvent, QuantileRow](spark,
        "quantiles", rows, batches, reps,
        i => MeasureEvent(s"g${i % 16}", (i.toLong * 37) % 10000),
        "update", ds => StreamQuantiles.quantiles(ds))),
      // 4 band rows per doc (all in one batch — perBatch is a multiple
      // of 4); band space cycles every 2000 docs so later docs collide
      // with registered bands and the admission path sees both verdicts
      ("stream_neardup", () => drive[NearDupBand, IngestAdmit](spark,
        "neardup", rows, batches, reps,
        i => NearDupBand(((i / 4) % 2000).toLong * 4 + i % 4,
          (i / 4).toLong, ts(i / 4), "web", "de", 40L, 4),
        "append",
        ds => StreamNearDup.admissions(ds.withWatermark("ts", "10 seconds")))),
      // 5000 PKs × 8 event types; every PK updated ~rows/5000 times —
      // the delta stage folds against persisted state on every batch
      ("stream_ivm", () => drive[StreamBenchEv, IvmView](spark, "ivm",
        rows, batches, reps,
        i => StreamBenchEv(i.toLong, ts(i), (i % 5000).toLong,
          s"t${i % 8}", (i % 100) / 10.0),
        "update", ds => StreamIvm.views(ds.toDF()))),
      // 10k keys, monotone sort_us, ~1% tombstones — upsert-heavy CDC
      // materialization with periodic delete emission
      ("stream_cdc_apply", () => drive[ChangeRow, Materialized](spark,
        "cdcapply", rows, batches, reps,
        i => ChangeRow(s"k${i % 10000}", i.toLong,
          if (i % 97 == 0) s"""{"after":null,"id":$i}"""
          else s"""{"after":{"id":$i},"v":${i % 1000}}"""),
        "update", ds => CdcApply.updates(ds))),
      // 1000 keys, event time advancing 1 ms/row — each key sees
      // ~1 event/s of event time against a 2/s bucket, with periodic
      // same-instant bursts so both verdict paths stay hot
      ("stream_rate_limit", () => drive[RateEvent, RateVerdict](spark,
        "ratelimit", rows, batches, reps,
        i => RateEvent(s"k${i % 1000}", i.toLong,
          new java.sql.Timestamp(1700000000000L + i.toLong)),
        "append", ds => StreamRateLimit.admissions(ds))),
      // 500 keys, 1 reference per 8 probes, ±4 ms timestamp jitter so
      // probes land out of order around their references — the floor
      // search and history merge both stay hot; state = 500·history
      ("stream_asof", () => drive[AsofInput, AsofMatch](spark, "asof",
        rows, batches, reps,
        i => AsofInput(s"k${i % 500}", i.toLong,
          new java.sql.Timestamp(1700000000000L + i.toLong + (i % 9) - 4),
          i % 8 == 0, (i % 1000).toLong),
        "append", ds => StreamAsofJoin.enrich(ds))),
      // 200 keys × k=10 reservoirs over a 1M id space: early batches
      // churn members, later ones mostly reject — both paths measured;
      // state = keys·k, never O(rows)
      ("stream_reservoir", () => drive[ReservoirOffer, ReservoirChange](
        spark, "reservoir", rows, batches, reps,
        i => ReservoirOffer(s"k${i % 200}", ((i.toLong * 48271) % 1000000L)),
        "append", ds => StreamReservoir.changes(ds))),
      // 1000 keys, ~3% event-time regressions (every 31st change
      // steps back 7 ms) — both the in-order and inversion paths hot
      ("stream_order_audit", () => drive[AuditChange, AuditRow](spark,
        "orderaudit", rows, batches, reps,
        i => AuditChange(s"k${i % 1000}", i.toLong,
          new java.sql.Timestamp(
            1700000000000L + i.toLong + (if (i % 31 == 0) -7L else 0L))),
        "update", ds => StreamOrderAudit.audit(ds))))

    val results = ops.map { case (name, f) =>
      val (sec, stateRows, emitted) = f()
      System.err.println(f"[streambench] $name: $rows rows / $sec%.2f s = " +
        f"${rows / sec}%.0f rows/s, state $stateRows, emitted $emitted")
      name -> (sec, stateRows, emitted)
    }
    val total = results.map(_._2._1).sum
    val opsJson = results.map { case (n, (sec, st, em)) =>
      f""""$n":{"sec":$sec%.3f,"rows_per_sec":${(rows / sec).toLong},"state_rows":$st,"emitted":$em}"""
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"stream_total","value":$total,"unit":"sec","rows_per_op":$rows,"batches":$batches,"ops":$opsJson,"sf":"stream","epoch_ms":${System.currentTimeMillis()}}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_history.jsonl"),
      (line + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[streambench] history persist failed: ${e.getMessage}")
    }
    println(line)
    spark.stop()
  }
}
