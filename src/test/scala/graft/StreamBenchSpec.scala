package graft

import graft.streaming.{ItemEvent, StreamTopK, TopItem}

/** §2#224: the streaming micro-bench harness — pins that
  * [[StreamBench.drive]] measures what it claims: N micro-batches
  * through a production transformWithState pipeline on RocksDB state,
  * warmup outside the timed region, and the state/emission metrics
  * read back from the query's progress. The recorded numbers live in
  * bench_history.jsonl (`"sf":"stream"` lines); this spec keeps the
  * instrument itself from silently breaking between measurements. */
class StreamBenchSpec extends SparkSuite {

  test("drive: times N batches and reports state rows + emissions") {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      val r =
        StreamBench.drive[ItemEvent, TopItem](spark, "spec-topk",
          rows = 400, batches = 4, reps = 1,
          gen = i => ItemEvent(s"g${i % 4}", (i % 8).toLong),
          outputMode = "update", pipe = ds => StreamTopK.topk(ds))
      assert(r.sec > 0.0, "timed region must be non-empty")
      // 4 groups × ≤8 distinct items, capacity 64 → exact summaries;
      // state is one row per group
      assert(r.stateRows === 4L, s"one summary per group, got ${r.stateRows}")
      // update mode emits each group's current top-k every batch that
      // touches it: warmup row + 4 batches × 4 groups × k ≥ emissions
      assert(r.emitted > 0L && r.emitted <= 1L + 4L * 4 * 5,
        s"implausible emission count ${r.emitted}")
      // the BYTES story (r13 verdict #5): the RocksDB provider reports
      // a real in-memory footprint for live state — boundedness in the
      // unit capacity planning uses, not just a row count
      assert(r.stateBytes > 0L,
        s"RocksDB memoryUsedBytes must be reported, got ${r.stateBytes}")
    } finally spark.conf.unset(key)
  }

  test("drive: batch boundaries are respected (batches param = micro-batches)") {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      // one group, k=5 default: every timed batch carries ≥100 items,
      // so update mode emits exactly top-5 per batch; the untimed
      // warmup batch (1 item live) emits 1 — total 8×5 + 1. This pins
      // that `batches` really means micro-batches, not one big fold.
      val r =
        StreamBench.drive[ItemEvent, TopItem](spark, "spec-batches",
          rows = 800, batches = 8, reps = 1,
          gen = i => ItemEvent("g", (i % 100).toLong),
          outputMode = "update", pipe = ds => StreamTopK.topk(ds))
      assert(r.emitted === 8L * 5 + 1,
        s"8 batches x top-5 of one group + warmup row, got ${r.emitted}")
    } finally spark.conf.unset(key)
  }
}
