package graft.cdc

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** The reference's application shell (crdb-changefeed-publisher
  * src/main.rs:30-105): parse flags, start the `/metrics` server, run
  * the changefeed relay inside the ignore-cursor retry loop — assembled
  * from the parts this library ships (GraftConfig, ChangefeedPipeline
  * over the `graft-changefeed` DSv2 source, GraftMetrics).
  *
  * {{{
  * spark-submit --class graft.cdc.GraftMain graft.jar \
  *   --table events --log-dir /data/cflog \
  *   --queue inmemory:events --cursor-store file:/data/cursor \
  *   --checkpoint-dir /data/ckpt --metrics-port 9090
  * }}}
  *
  * `--once true` drains the retained log and exits (backfill mode);
  * the default runs continuously like the reference relay.
  */
object GraftMain {

  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.fromArgs(args.toIndexedSeq)
    val spark = SparkSession.builder()
      .appName(s"graft-changefeed-publisher[${cfg.table}]")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try { run(spark, cfg); () } finally spark.stop()
  }

  /** App body, session-agnostic so specs can drive it on a shared
    * session. Returns the final Prometheus metrics text (what a last
    * scrape of `/metrics` would have seen).
    *
    * With `--database jdbc:...` (or a `jdbc:` DATABASE_URL) the app
    * ALSO runs the changefeed tail — the reference's full relay,
    * database to queue: the tail lands the `EXPERIMENTAL CHANGEFEED`
    * rows in the log, the streaming pipeline relays them out. In
    * `--once` mode the tail drains the feed synchronously before the
    * pipeline's AvailableNow pass (the backfill shape); continuously,
    * a supervised daemon thread re-runs the tail with backoff, like the
    * reference's reconnect loop (main.rs:140-198). The tail keeps its
    * OWN cursor (key `tail:<table>` in a database-backed store,
    * `_tail_cursor` beside the log otherwise): "ingested up to"
    * and "published up to" are different resume points — committing the
    * ingestion cursor into the publish store would make the pipeline
    * skip rows the tail landed but nobody relayed yet. (The reference
    * has one loop and so one cursor; splitting ingest from publish is
    * what makes the Spark form scale, and it needs both.) */
  def run(spark: SparkSession, cfg: GraftConfig): String = {
    val logDir = cfg.logDir.getOrElse(
      throw new IllegalArgumentException("--log-dir is required"))
    val checkpoint = cfg.checkpointDir.getOrElse(
      Files.createTempDirectory("graft-ckpt").toString)
    val store = cfg.newCursorStore()
    val pipeline = new ChangefeedPipeline(cfg.newQueue(), store,
      checkpoint, trigger = if (cfg.once) Some(Trigger.AvailableNow()) else None,
      deadLetterQueue = cfg.newDeadLetterQueue(),
      tableRouter = cfg.newTableRouter())
    val metrics = new GraftMetrics(spark)
    val server = metrics.serve(cfg.metricsPort)
    try {
      cfg.database.foreach { url =>
        val tail = JdbcChangefeedTail.forUrl(url, cfg.table, logDir,
          cfg.newTailCursorStore(logDir),
          resolvedFrequency = cfg.cursorFrequency)
        if (cfg.once) { tail.runOnce(); () }
        else {
          // supervision must survive EVERY recoverable failure, not
          // just SQLException — a malformed row or an IO error killing
          // this thread silently would leave the pipeline half looking
          // healthy while ingesting nothing
          val t = new Thread(() => {
            var running = true
            while (running) {
              try { tail.runOnce(); () }
              catch {
                case _: InterruptedException => running = false
                case scala.util.control.NonFatal(e) =>
                  System.err.println(
                    s"graft-changefeed-tail: ${e.getClass.getSimpleName}: " +
                      s"${e.getMessage}; reconnecting")
              }
              if (running)
                try Thread.sleep(1000)
                catch { case _: InterruptedException => running = false }
            }
          }, "graft-changefeed-tail")
          t.setDaemon(true)
          t.start()
        }
      }
      // registration runs after every (re)start: start() re-creates the
      // accumulators, so the retry's fresh counters replace the dead ones
      pipeline.runFromLogWithRetry(spark, logDir, _ => {
        metrics.register("messages_sent", pipeline.messagesSent)
        metrics.register("cursors_committed", pipeline.cursorsCommitted)
        metrics.register("messages_dead_lettered", pipeline.messagesDeadLettered)
      })
      metrics.prometheusText()
    } finally server.stop(0)
  }
}
