package graft.cdc

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.util.LongAccumulator

/** InvalidCursor — the stored cursor predates the source's retention
  * floor, the moral equivalent of CockroachDB's "batch timestamp must
  * be after replica GC threshold" error (reference src/main.rs:180-198). */
class InvalidCursorException(msg: String) extends RuntimeException(msg)

/** Structured-Streaming re-expression of the reference's changefeed
  * processing loop (src/main.rs:117-253):
  *
  *   1. read the stored cursor; resume the feed after it,
  *   2. per micro-batch: change rows → ChangePayload envelope →
  *      publish to the MessageQueue from executor tasks,
  *   3. resolved rows → max resolved timestamp → cursor-store upsert
  *      (driver side, one value per batch),
  *   4. a cursor older than the retention floor raises InvalidCursor;
  *      `startWithRetry` drops it and restarts from scratch — exactly
  *      the reference's ignore_cursor retry.
  *
  * Scale: classify/envelope are narrow maps; publish parallelism =
  * partition count; the only global step is a one-value max aggregate.
  * Cursor commit happens after the batch's publishes, so the pipeline
  * is at-least-once into the queue (same semantics as the reference).
  */
class ChangefeedPipeline(
    queue: MessageQueue,
    cursorStore: CursorStore,
    checkpointDir: String,
    gcFloorUs: Option[Long] = None,
    trigger: Option[Trigger] = None,
    deadLetterQueue: Option[MessageQueue] = None,
    tableRouter: Option[String => MessageQueue] = None) extends Serializable {

  /** rabbitmq_messages_sent equivalent (reference src/metrics.rs). */
  @volatile var messagesSent: LongAccumulator = _
  /** Cursor-store commits (one per micro-batch with resolved rows). */
  @volatile var cursorsCommitted: LongAccumulator = _
  /** Change rows routed to the dead-letter queue (unparseable payload). */
  @volatile var messagesDeadLettered: LongAccumulator = _

  private def resumeFrom(frame: DataFrame, ignoreCursor: Boolean): DataFrame =
    (if (ignoreCursor) None else cursorStore.get().map(_.toLong)) match {
      case Some(c) =>
        gcFloorUs.filter(c < _).foreach { floor =>
          throw new InvalidCursorException(
            s"cursor $c must be after replica GC threshold $floor")
        }
        frame.where(col("sort_us") > c)
      case None => frame
    }

  /** Start the pipeline on a streaming changefeed frame
    * (columns: sort_us, tbl, key, value). */
  def start(spark: SparkSession, frame: DataFrame,
      ignoreCursor: Boolean = false): StreamingQuery = {
    messagesSent = spark.sparkContext.longAccumulator("graft.messages_sent")
    cursorsCommitted = spark.sparkContext.longAccumulator("graft.cursors_committed")
    messagesDeadLettered = spark.sparkContext.longAccumulator("graft.messages_dead_lettered")
    val acc = messagesSent
    val curAcc = cursorsCommitted
    val dlqAcc = messagesDeadLettered
    val q = queue
    val router = tableRouter
    val dlq = deadLetterQueue
    val store = cursorStore
    // a change row must carry parseable JSON WITH an `after` key;
    // anything else (truncation, encoding damage) is poison — with a
    // DLQ configured it is PRESERVED there raw instead of crashing or
    // silently vanishing from the relay (the consumer-side NACK path
    // the reference's fire-and-forget publish leaves implicit).
    // Key-PRESENCE, not value: a tombstone `{"after": null}` (the
    // CockroachDB DELETE form) is a legitimate change row and must
    // publish, which a naive `$.after IS NULL` check would dead-letter.
    // The key test is coalesce'd to false because valid non-OBJECT JSON
    // (a bare scalar or array) parses but has no keys: json_object_keys
    // returns NULL, and a NULL `malformed` would fail BOTH the DLQ
    // route and the publish route — the silent drop this predicate
    // exists to prevent.
    val parsed = get_json_object(col("value"), "$")
    val malformed = col("tbl").isNotNull &&
      (parsed.isNull ||
        !coalesce(array_contains(json_object_keys(parsed), "after"), lit(false)))
    val writer = resumeFrom(frame, ignoreCursor).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        // with a DLQ the batch is read twice (route + publish) — keep
        // the micro-batch from recomputing its source
        val batch = if (dlq.isDefined) batch0.persist() else batch0
        try {
          dlq.foreach { dq =>
            batch.where(malformed).select(col("value"))
              .foreachPartition { (it: Iterator[Row]) =>
                it.foreach { r =>
                  dq.publish(r.getString(0).getBytes("UTF-8"))
                  dlqAcc.add(1L)
                }
              }
          }
          val good = if (dlq.isDefined) !malformed else lit(true)
          q match {
            case log: ChangefeedLogQueue =>
              // whole-batch publish through the DSv2 sink: one atomic
              // segment per partition, e<batch>p<part> ids → idempotent
              // across foreachBatch retries (effectively-once)
              val changes = batch.where(col("tbl").isNotNull && good)
              changes.write.format("graft-changefeed")
                .option("path", log.dir).option("epochId", batchId)
                .mode("append").save()
              acc.add(changes.count())
            case _ => router match {
              case Some(make) =>
                // MULTI-TABLE fan-out (the streaming form of
                // cdc_table_router #156): the reference binds one
                // process per table and names the queue after it
                // (cli.yml, queues.rs:17-30) — a consolidated relay
                // runs ONE stream over a multi-table feed and routes
                // each change row to the queue named after ITS table
                // tag. Queue handles are resolved once per (partition,
                // table) — |tables| broker channels per task, not per
                // record — and rows of every table still ride the same
                // micro-batch, checkpoint, and cursor.
                val payloads = batch.where(col("tbl").isNotNull && good)
                  .select(col("tbl"), Changefeed.payloadCol.as("payload"))
                payloads.foreachPartition { (it: Iterator[Row]) =>
                  val perTable =
                    scala.collection.mutable.HashMap.empty[String, MessageQueue]
                  it.foreach { r =>
                    val tq = perTable.getOrElseUpdate(r.getString(0),
                      make(r.getString(0)))
                    tq.publish(r.getString(1).getBytes("UTF-8"))
                    acc.add(1L)
                  }
                }
              case None =>
                val payloads = batch.where(col("tbl").isNotNull && good)
                  .select(Changefeed.payloadCol.as("payload"))
                payloads.foreachPartition { (it: Iterator[Row]) =>
                  it.foreach { r =>
                    q.publish(r.getString(0).getBytes("UTF-8"))
                    acc.add(1L)
                  }
                }
            }
          }
          val maxResolved = batch
            .where(col("tbl").isNull && col("key").isNull)
            .agg(max(Changefeed.resolvedUsCol)).collect()(0)
          if (!maxResolved.isNullAt(0)) {
            store.set(maxResolved.getLong(0).toString)
            curAcc.add(1L)
          }
        } finally if (dlq.isDefined) { batch.unpersist(); () }
        ()
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  /** Reference retry loop (src/main.rs:140-198): an invalid cursor is
    * ignored and the feed restarts without it. */
  def startWithRetry(spark: SparkSession, frame: DataFrame): StreamingQuery =
    try start(spark, frame)
    catch {
      case _: InvalidCursorException => start(spark, frame, ignoreCursor = true)
    }

  /** Start on the custom DSv2 source (`graft-changefeed`) over a
    * changefeed log directory: the CursorStore cursor becomes the
    * source's `startCursor` (offset-level resume — skipped rows are
    * never read, vs. the post-read filter of `resumeFrom`), and the
    * cursor is validated against the log's GC floor BEFORE the stream
    * starts, mirroring the reference's pre-flight cursor handling
    * (src/main.rs:117-140). */
  def startFromLog(spark: SparkSession, logDir: String,
      ignoreCursor: Boolean = false): StreamingQuery = {
    val cursor = if (ignoreCursor) None else cursorStore.get().map(_.toLong)
    val floor = gcFloorUs.orElse(graft.sources.ChangefeedLog.gcFloorUs(logDir))
    for (c <- cursor; f <- floor; if c < f)
      throw new InvalidCursorException(
        s"cursor $c must be after replica GC threshold $f")
    val reader = spark.readStream.format("graft-changefeed").option("path", logDir)
    val frame = cursor.fold(reader)(c => reader.option("startCursor", c)).load()
    // the source already resumed at the offset level → skip resumeFrom
    start(spark, frame, ignoreCursor = true)
  }

  /** "From scratch" means BOTH the stored cursor and the streaming
    * checkpoint: a restart that reused the checkpoint would resume from
    * the same stale offset `planInputPartitions` just rejected and fail
    * identically, forever. */
  def startFromLogIgnoringCursor(spark: SparkSession, logDir: String): StreamingQuery = {
    ChangefeedPipeline.deleteRecursively(java.nio.file.Paths.get(checkpointDir))
    startFromLog(spark, logDir, ignoreCursor = true)
  }

  /** Reference retry loop over the DSv2 source: an invalid cursor is
    * dropped and the feed restarts from whatever the log retains. Only
    * covers the synchronous pre-flight check — an invalid offset
    * resumed from the CHECKPOINT surfaces on the stream-execution
    * thread after start() returns; supervise with
    * [[runFromLogWithRetry]] to cover that path too. */
  def startFromLogWithRetry(spark: SparkSession, logDir: String): StreamingQuery =
    try startFromLog(spark, logDir)
    catch {
      case _: InvalidCursorException =>
        startFromLogIgnoringCursor(spark, logDir)
    }

  /** Supervised (blocking) form of the reference's retry loop
    * (src/main.rs:140-198): run the feed to termination; if it dies
    * because a resume point — stored cursor OR checkpoint-resumed
    * offset — fell below the replica GC threshold, drop cursor AND
    * checkpoint and restart from scratch. Returns the final query once
    * it terminates. */
  def runFromLogWithRetry(spark: SparkSession, logDir: String,
      onStart: StreamingQuery => Unit = _ => ()): StreamingQuery = {
    val first = startFromLogWithRetry(spark, logDir)
    onStart(first)
    try { first.awaitTermination(); first }
    catch {
      case e: Throwable if ChangefeedPipeline.causedByInvalidCursor(e) =>
        val fresh = startFromLogIgnoringCursor(spark, logDir)
        onStart(fresh)
        fresh.awaitTermination()
        fresh
    }
  }
}

object ChangefeedPipeline {

  /** An async stream failure arrives wrapped (StreamingQueryException →
    * SparkException → ...); walk the cause chain for the real reason. */
  private[cdc] def causedByInvalidCursor(t: Throwable): Boolean = {
    val seen = scala.collection.mutable.Set.empty[Throwable]
    var cur = t
    while (cur != null && seen.add(cur)) {
      if (cur.isInstanceOf[InvalidCursorException]) return true
      cur = cur.getCause
    }
    false
  }

  private[cdc] def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p)) {
      val st = Files.walk(p)
      try {
        st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => { Files.deleteIfExists(f); () })
      } finally st.close()
    }
  }

  /** Publish a batch of payload rows to a FileQueue: one atomic JSONL
    * file per (batch, partition) → idempotent, effectively-once. */
  def publishToFileQueue(payloads: DataFrame, batchId: Long, fq: FileQueue): Unit =
    payloads.foreachPartition { (it: Iterator[Row]) =>
      val w = fq.writerFor(batchId, TaskContext.getPartitionId())
      it.foreach(r => w.write(r.getString(0)))
      w.commit()
      ()
    }
}
