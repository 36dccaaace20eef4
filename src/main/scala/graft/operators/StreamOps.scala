package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Fns._

/** Batch twins of the streaming analytics surface (§2.2). The same
  * logical ops run under Structured Streaming in graft.streaming /
  * graft.cdc; these batch forms are what the DuckDB oracle checks. */
object StreamOps {

  /** §2#13 tumbling 1-hour window aggregate per event_type — the batch
    * equivalent of `groupBy(window($"ts","1 hour"), $"event_type")`. */
  def windowAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(unix_micros(date_trunc("hour", col("ts"))).as("window_start_us"),
        col("event_type"), cents(col("value")).as("value_c"))
      .groupBy(col("window_start_us"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value_c")).as("sum_value_c"))
      .orderBy(col("window_start_us"), col("event_type"))

  /** §2#138 SLIDING-window aggregate (1 h window, 15 min slide) via the
    * NATIVE `window()` function — completes the window-kind trio next
    * to the tumbling [[windowAgg]] and session [[sessionizeNative]]:
    * every event lands in exactly 4 overlapping epoch-aligned windows,
    * the streaming-capable form of a trailing-hour dashboard refreshed
    * every 15 min. The ×4 fan-out happens BEFORE the partial aggregate,
    * so map-side combine still shrinks the shuffle to
    * |windows|×|types| rows — at 100 TB the slide factor multiplies
    * pre-combine work, never shuffle width. */
  def slidingAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"), col("sum_value_c"))
      .orderBy(col("win_start_us"), col("event_type"))

  /** §2#14 30-minute-gap sessionization per user (lag + cumulative sum;
    * the streaming twin uses flatMapGroupsWithState). One shuffle on
    * user_id; both window functions share that partitioning. */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val gapUs = 1800000000L // 30 min
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(order))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** §2#97 the NATIVE session-window twin of [[sessionize]]: Spark's
    * built-in `session_window` aggregate (usable in batch AND under a
    * real StreamingQuery with watermark-driven state eviction — the
    * production streaming form, vs the lag+cumsum window which is
    * batch-only). Gap is 30min+1µs because session_window opens a new
    * session when gap >= G while the lag rule opens when gap > 30min —
    * the +1µs makes the two boundary conditions identical, so this
    * query shares stream_sessionize's oracle bit-for-bit. Session
    * ordinals are re-derived by start time to match the cumsum ids. */
  def sessionizeNative(spark: SparkSession, sfDir: String): DataFrame = {
    val sessions = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"))
      .groupBy(col("user_id"), session_window(col("ts"), "1800000001 microseconds"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"))
    val byStart = Window.partitionBy(col("user_id")).orderBy(col("start_us"))
    sessions
      .withColumn("session_id", row_number().over(byStart).cast("long"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("start_us"), col("end_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** §2#15 streaming dropDuplicates semantics: first event per
    * (user_id, event_type) in event-time order. */
  def dedupByKey(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("first_event_id"), col("us").as("first_us"))
      .orderBy(col("user_id"), col("event_type"))
  }
}
