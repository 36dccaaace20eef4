package graft.sources

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.SparkSuite
import graft.cdc._

/** End-to-end coverage of the `graft-changefeed` DSv2 source: batch
  * parity, offset-level resume (fresh cursor and checkpoint restart),
  * and the replica-GC-threshold invalid-cursor path with the
  * reference's ignore-cursor retry. */
class ChangefeedSourceSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** The sf0.001 synthetic changefeed as log records (change + resolved
    * rows), split into `nSegments` contiguous segments. */
  private def buildLog(nSegments: Int): (String, Seq[ChangefeedLog.Record]) = {
    val dir = tmp("graft-cflog")
    val rows = Changefeed.changefeedRows(spark, sf)
      .collect().toSeq.map { r =>
        ChangefeedLog.Record(r.getLong(0), Option(r.getString(1)),
          Option(r.getString(2)), r.getString(3))
      }.sortBy(r => (r.sortUs, r.key.getOrElse("")))
    val per = math.max(rows.size / nSegments, 1)
    rows.grouped(per).foreach(g => ChangefeedLog.writeSegment(dir, g))
    (dir, rows)
  }

  /** Segments actually planned by a batch read (post-pushdown). */
  private def scanPartitions(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.size
    }.getOrElse(fail("no BatchScanExec leaf in plan"))
  }

  test("batch read replays the full retained log") {
    val (dir, rows) = buildLog(4)
    val got = spark.read.format("graft-changefeed").option("path", dir).load()
    assert(got.count() === rows.size)
    assert(got.schema.fieldNames.toSeq === Seq("sort_us", "tbl", "key", "value"))
    // spot-check round-trip fidelity of one change and one resolved row
    val firstChange = got.where(col("tbl").isNotNull).orderBy("sort_us", "key").head()
    val expected = rows.filter(_.tbl.isDefined).minBy(r => (r.sortUs, r.key.get))
    assert(firstChange.getLong(0) === expected.sortUs)
    assert(firstChange.getString(3) === expected.value)
    assert(got.where(col("tbl").isNull && col("key").isNull).count() ===
      rows.count(_.tbl.isEmpty))
  }

  test("reported sort_us ordering deletes the per-partition sort; withdrawn when pruned") {
    val (dir, rows) = buildLog(4)
    def sorts(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.size
    }
    val base = spark.read.format("graft-changefeed").option("path", dir).load()
    // segments are written (sort_us, key)-sorted and read sequentially,
    // and the scan REPORTS that — a per-partition sort on sort_us is free
    assert(sorts(base.sortWithinPartitions("sort_us")) === 0,
      "reported ordering should satisfy the per-partition sort")
    // the claim is exactly sort_us-ascending: any other key still sorts
    assert(sorts(base.sortWithinPartitions("key")) === 1)
    assert(sorts(base.sortWithinPartitions(col("sort_us").desc)) === 1)
    // correctness: the order the reader actually emits matches the claim
    val perPart = base.select("sort_us").rdd
      .mapPartitions(it => Iterator(it.map(_.getLong(0)).toSeq)).collect()
    perPart.foreach(p => assert(p === p.sorted, "partition not sort_us-sorted"))
    // a global orderBy still range-exchanges but needs no scan-side sort
    val globalSorted = base.orderBy("sort_us").select("sort_us")
      .collect().map(_.getLong(0))
    assert(globalSorted.toSeq === rows.map(_.sortUs).sorted)
    // pruning sort_us away withdraws the report (nothing left to order)
    val pruned = base.select("key", "value")
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.ordering.forall(_.isEmpty))
  }

  test("batch scan pushes sort_us range filters to segment pruning and prunes columns") {
    val (dir, rows) = buildLog(4)
    val cut = rows(rows.size / 2).sortUs
    val df = spark.read.format("graft-changefeed").option("path", dir).load()
      .where(col("sort_us") > cut).select("value")
    // pruned read schema reaches the DSv2 scan node
    val scans = df.queryExecution.executedPlan.collectLeaves()
    assert(scans.exists(_.schema.fieldNames.toSeq === Seq("value")),
      s"scan not pruned to value: ${scans.map(_.schema.fieldNames.toSeq)}")
    // the filter string shows in the scan description as a consumed range
    assert(df.queryExecution.executedPlan.toString.contains("pushed=("),
      "pushed range missing from scan description")
    // correctness under pruning + pushdown
    val want = rows.filter(_.sortUs > cut).map(_.value).sorted
    assert(df.collect().map(_.getString(0)).sorted.toSeq === want)
    // metadata-only segment pruning: only segments intersecting the
    // range become partitions; a full read plans one per retained
    // segment (contiguous segments cut at the midpoint → some drop)
    val prunedParts = df.rdd.getNumPartitions
    val fullParts = spark.read.format("graft-changefeed").option("path", dir)
      .load().rdd.getNumPartitions
    assert(fullParts === graft.sources.ChangefeedLog.listSegments(dir).size)
    assert(prunedParts < fullParts,
      s"expected segment pruning: $prunedParts vs full $fullParts")
  }

  test("Long.MinValue range literals stay in the residual (no silent wrap)") {
    val (dir, rows) = buildLog(3)
    val base = spark.read.format("graft-changefeed").option("path", dir).load()
    // >= Long.MinValue is vacuously true — consuming it used to wrap
    // (MinValue - 1 = MaxValue) and return ZERO rows; it must return all
    assert(base.where(col("sort_us") >= Long.MinValue).count() === rows.size)
    // < Long.MinValue is vacuously false — the wrap returned EVERY row
    assert(base.where(col("sort_us") < Long.MinValue).count() === 0)
    assert(base.where(col("sort_us") === Long.MinValue).count() === 0)
    // non-boundary pushdown still consumes (no residual re-evaluation)
    val cut = rows(rows.size / 2).sortUs
    assert(base.where(col("sort_us") >= cut).count() ===
      rows.count(_.sortUs >= cut))
  }

  test("streaming resumes after startCursor and drains new segments on restart") {
    val (dir, rows) = buildLog(3)
    val mid = rows(rows.size / 2).sortUs
    val ckpt = tmp("graft-cfsrc-ckpt")

    // memory sink can't recover a checkpoint — collect per run through
    // foreachBatch (which can), so the restart truly resumes offsets
    def runOnce(): Seq[Long] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = spark.readStream.format("graft-changefeed")
        .option("path", dir).option("startCursor", mid).load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => got.add(r.getLong(0))); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      got.iterator().asScala.toSeq.sorted
    }

    val got1 = runOnce()
    val want1 = rows.map(_.sortUs).filter(_ > mid).sorted
    assert(got1 === want1) // offset-level resume: nothing at/below cursor

    // new data arrives; same checkpoint → ONLY the new segment is read
    val lastUs = rows.last.sortUs
    ChangefeedLog.writeSegment(dir, Seq(
      ChangefeedLog.Record(lastUs + 10, Some("events"), Some("[999001]"), "{\"after\": {\"event_id\": 999001}}"),
      ChangefeedLog.Record(lastUs + 20, None, None, s"""{"resolved": "${lastUs + 20}.0000000000"}""")))
    val got2 = runOnce()
    assert(got2 === Seq(lastUs + 10, lastUs + 20))
  }

  test("cursor below the GC floor fails the stream with InvalidCursor") {
    val (dir, rows) = buildLog(4)
    val floor = rows(rows.size / 2).sortUs
    ChangefeedLog.gc(dir, floor)
    assert(ChangefeedLog.listSegments(dir).nonEmpty) // newer segments retained
    val q = spark.readStream.format("graft-changefeed")
      .option("path", dir).option("startCursor", 1L).load()
      .writeStream.format("memory").queryName("cfsrc_gc")
      .option("checkpointLocation", tmp("graft-cfgc-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    val ex = intercept[StreamingQueryException](q.awaitTermination())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(ex).exists(_.isInstanceOf[InvalidCursorException]))
  }

  test("dirty checkpoint below the GC floor: supervised retry restarts from scratch") {
    val dir = tmp("graft-dirtylog")
    val qname = "t-dsv2-dirty"
    InMemoryQueue.clear(qname)
    val store = new InMemoryCursorStore(qname)
    val ckpt = tmp("graft-dirty-ckpt")
    val pipeline = new ChangefeedPipeline(new InMemoryQueue(qname), store, ckpt,
      trigger = Some(Trigger.AvailableNow()))

    // run 1: change rows only (no resolved → CursorStore stays empty, so
    // the later restart passes the synchronous pre-flight check and the
    // ONLY stale resume point is the streaming checkpoint's offset)
    ChangefeedLog.writeSegment(dir, Seq(
      ChangefeedLog.Record(10, Some("events"), Some("[1]"), "{\"after\": {\"event_id\": 1}}"),
      ChangefeedLog.Record(20, Some("events"), Some("[2]"), "{\"after\": {\"event_id\": 2}}")))
    pipeline.runFromLogWithRetry(spark, dir)
    assert(InMemoryQueue.messages(qname).size === 2)
    assert(store.get() === None)

    // GC past the consumed offset; new data arrives above the floor
    ChangefeedLog.gc(dir, 100)
    ChangefeedLog.writeSegment(dir, Seq(
      ChangefeedLog.Record(150, Some("events"), Some("[3]"), "{\"after\": {\"event_id\": 3}}"),
      ChangefeedLog.Record(160, None, None, "{\"resolved\": \"160.0000000000\"}")))

    // run 2: the checkpoint resumes offset 20 < floor 100 →
    // InvalidCursor on the STREAM thread (wrapped in
    // StreamingQueryException); supervision must clear the checkpoint
    // and restart from scratch instead of failing forever
    pipeline.runFromLogWithRetry(spark, dir)
    assert(InMemoryQueue.messages(qname).size === 3) // +1 retained change row
    assert(store.get() === Some("160")) // cursor re-committed post-retry
  }

  test("pipeline resumes from CursorStore via the source and retries a GC'd cursor") {
    val (dir, rows) = buildLog(4)
    val floor = rows(rows.size / 2).sortUs
    ChangefeedLog.gc(dir, floor)

    val qname = "t-dsv2-retry"
    InMemoryQueue.clear(qname)
    val store = new InMemoryCursorStore(qname)
    store.set((floor - 1000).toString) // stale: below the GC floor
    val pipeline = new ChangefeedPipeline(new InMemoryQueue(qname), store,
      tmp("graft-dsv2-ckpt"))

    intercept[InvalidCursorException](pipeline.startFromLog(spark, dir))

    // the reference's ignore_cursor retry: restart without the cursor
    val q = pipeline.startFromLogWithRetry(spark, dir)
    q.processAllAvailable(); q.stop()
    // GC drops whole segments, so the replay is exactly the retained
    // segment contents (may straddle the floor within a kept segment)
    val retained = ChangefeedLog.listSegments(dir)
      .flatMap(s => ChangefeedLog.readSegment(s.path))
    assert(retained.nonEmpty)
    assert(InMemoryQueue.messages(qname).size === retained.count(_.tbl.isDefined))
    // cursor re-committed from the retained resolved rows
    val maxResolved = retained.filter(_.tbl.isEmpty).map(_.sortUs).max
    assert(store.get() === Some(maxResolved.toString))
  }

  test("min/max(sort_us) aggregates are answered from segment metadata alone") {
    val (dir, rows) = buildLog(4)
    val df = spark.read.format("graft-changefeed").option("path", dir).load()
    val agg = df.agg(min(col("sort_us")), max(col("sort_us")))
    val desc = agg.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.description()
    }
    assert(desc.exists(_.contains("aggs=min(sort_us),max(sort_us)")), desc.mkString)
    val first = agg.head()
    assert(first.getLong(0) === rows.map(_.sortUs).min)
    assert(first.getLong(1) === rows.map(_.sortUs).max)
    // behavioral proof rows are never read: clobber every segment's
    // BYTES (names intact) — the cursor-discovery query still answers
    Files.list(java.nio.file.Paths.get(dir)).iterator.asScala
      .filter(_.getFileName.toString.startsWith("seg-"))
      .foreach(p => Files.writeString(p, "not a record"))
    val again = spark.read.format("graft-changefeed").option("path", dir).load()
      .agg(min(col("sort_us")), max(col("sort_us"))).head()
    assert(again === first)
  }

  test("aggregate pushdown declines groupings, filtered scans, and other aggs") {
    val (dir, rows) = buildLog(3)
    def fresh = spark.read.format("graft-changefeed").option("path", dir).load()
    // a consumed range filter can cut a segment's interior → no pushdown,
    // and the row-level answer is still exact
    val cuts = rows.map(_.sortUs).distinct.sorted
    val cut = cuts(cuts.size / 2)
    val f = fresh.where(col("sort_us") > cut)
      .agg(min(col("sort_us")), max(col("sort_us"))).head()
    assert(f.getLong(0) === rows.map(_.sortUs).filter(_ > cut).min)
    assert(f.getLong(1) === rows.map(_.sortUs).max)
    // grouping → declined (correct per-group values from rows)
    val grouped = fresh.groupBy(col("tbl")).agg(max(col("sort_us")).as("mx"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(grouped(None) === rows.filter(_.tbl.isEmpty).map(_.sortUs).max)
    assert(grouped(Some("events")) ===
      rows.filter(_.tbl.isDefined).map(_.sortUs).max)
    // count(*) is not metadata-derivable here → declined, exact from rows
    assert(fresh.agg(count(lit(1))).head().getLong(0) === rows.size.toLong)
  }

  test("maxSegmentsPerTrigger drains a backfill as bounded micro-batches") {
    val (dir, rows) = buildLog(4)
    val nSegs = ChangefeedLog.listSegments(dir).size
    assert(nSegs >= 4)
    val sizes = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-changefeed")
      .option("path", dir).option("maxSegmentsPerTrigger", "1").load()
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        sizes += df.count(); ()
      }
      .option("checkpointLocation", tmp("graft-ratelimit-ckpt"))
      .start()
    q.awaitTermination()
    // complete drain, but never as one mega-batch: one segment per
    // trigger → as many non-empty batches as segments
    assert(sizes.sum === rows.size.toLong)
    assert(sizes.count(_ > 0) === nSegs)
    assert(sizes.max < rows.size.toLong)
  }

  test("limit pushdown bounds the segments planned; ranges disable the shortcut") {
    val (dir, rows) = buildLog(6)
    val nSegs = ChangefeedLog.listSegments(dir).size
    assert(nSegs >= 4)
    val base = spark.read.format("graft-changefeed").option("path", dir).load()
    // a bare LIMIT plans exactly `n` segments, not the whole log…
    val limited = base.limit(2)
    assert(limited.count() === 2)
    assert(scanPartitions(limited) === 2,
      "limit(2) should admit exactly 2 segments")
    assert(limited.queryExecution.executedPlan.toString.contains("limit=2"),
      "pushed limit missing from scan description")
    // …a LIMIT past the log end planfully takes everything and is exact
    val over = base.limit(rows.size + 100)
    assert(over.count() === rows.size)
    // with a pushed sort_us range the shortcut must NOT apply: an
    // intersecting segment can contribute zero surviving rows, so
    // admission-by-count would under-deliver — every intersecting
    // segment stays planned and the result is exact
    val cut = rows(rows.size / 2).sortUs
    val ranged = base.where(col("sort_us") > cut).limit(3)
    assert(ranged.count() === 3)
    val rangedParts = scanPartitions(ranged)
    val survivors = ChangefeedLog.listSegments(dir)
      .count(s => s.lastUs > cut)
    assert(rangedParts === survivors,
      s"ranged limit must plan all $survivors intersecting segments, got $rangedParts")
  }

  test("top-n pushdown: ORDER BY sort_us LIMIT opens n segments each way, stays exact") {
    val (dir, rows) = buildLog(6)
    val nSegs = ChangefeedLog.listSegments(dir).size
    assert(nSegs >= 4)
    val base = spark.read.format("graft-changefeed").option("path", dir).load()

    // "latest 3 changes" — the standing ops query; exact values, 3 segments
    val latest = base.orderBy(col("sort_us").desc).limit(3)
    assert(latest.collect().map(_.getLong(0)).toSeq ===
      rows.map(_.sortUs).sorted.reverse.take(3))
    assert(scanPartitions(latest) === 3,
      "descending top-3 should open exactly 3 segments")
    assert(latest.queryExecution.executedPlan.toString.contains("topN=3(desc)"))

    // earliest 3 — ascending takes the firstUs-smallest segments
    val earliest = base.orderBy(col("sort_us")).limit(3)
    assert(earliest.collect().map(_.getLong(0)).toSeq ===
      rows.map(_.sortUs).sorted.take(3))
    assert(scanPartitions(earliest) === 3)

    // a pushed range disables the shortcut (a planned segment could
    // contribute zero surviving rows) but the answer stays exact
    val cut = rows(rows.size / 2).sortUs
    val ranged = base.where(col("sort_us") > cut)
      .orderBy(col("sort_us").desc).limit(2)
    assert(ranged.collect().map(_.getLong(0)).toSeq ===
      rows.map(_.sortUs).filter(_ > cut).sorted.reverse.take(2))
    assert(scanPartitions(ranged) ===
      ChangefeedLog.listSegments(dir).count(_.lastUs > cut),
      "ranged top-n must plan every intersecting segment")
  }

  test("runtime join-key filtering prunes segments never opened") {
    val (dir, rows) = buildLog(6)
    val segs = ChangefeedLog.listSegments(dir)
    assert(segs.size >= 4)
    val target = segs.head
    val keys = ChangefeedLog.readSegment(target.path).toSeq.map(_.sortUs)
      .distinct.take(3)
    // values live only in the first segment's range — clobber every
    // segment whose range excludes them; with runtime filtering those
    // are never opened, without it the join would read garbage and blow up
    segs.filter(s => !keys.exists(v => v >= s.firstUs && v <= s.lastUs))
      .foreach(s => Files.writeString(s.path, "garbage"))
    import spark.implicits._
    // the dim must carry a REAL (non-constant-foldable) selective
    // filter or Spark's partition-pruning rule sees no benefit — a
    // parquet-backed cursor list with a tag predicate, like an audit
    // table would be
    val dimPath = tmp("graft-dpp-dim")
    keys.toDF("k").withColumn("tag", lit("x"))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).where(col("tag") === "x").select("k")
    val feed = spark.read.format("graft-changefeed").option("path", dir).load()
    val joined = feed.join(broadcast(dim), col("sort_us") === col("k"))
    val got = joined.collect()
    assert(got.length === rows.count(r => keys.contains(r.sortUs)))
    // and the plan actually carries the dynamic-pruning subquery
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no runtime filter in plan:\n$plan")
  }

  test("a corrupt non-pruned segment fails LOUDLY, never silently drops rows") {
    val (dir, _) = buildLog(4)
    val victim = ChangefeedLog.listSegments(dir).head
    Files.writeString(victim.path, "this is not a changefeed segment")
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-changefeed").option("path", dir).load().count()
    }
    // the root cause names the malformed line — an operator can find
    // the bad segment from the error alone
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("malformed changefeed log line"))),
      s"corruption error not surfaced: ${causes(e).map(_.getMessage)}")
  }

  test("aggregates on an empty log are SQL NULLs") {
    val dir = tmp("graft-cflog-empty")
    val r = spark.read.format("graft-changefeed").option("path", dir).load()
      .agg(min(col("sort_us")), max(col("sort_us"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
