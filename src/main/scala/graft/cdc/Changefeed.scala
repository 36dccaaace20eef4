package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.Checkpoints.CutOps
import graft.functions.Fns._

/** Batch re-expression of the reference CDC pipeline
  * (crdb-changefeed-publisher: src/main.rs, src/model.rs).
  *
  * A CockroachDB core changefeed emits rows (table, key, value) where
  *  - change rows:   key = JSON array of PK values, value = {"after": {...}}
  *  - resolved rows: table/key NULL, value = {"resolved": "<ts>"}
  * (reference src/main.rs:203-253). We synthesize exactly that frame from
  * the `events` table: one change row per event, one resolved row per
  * event-hour (the reference's `resolved = '<frequency>'` option,
  * src/main.rs:117-126).
  *
  * All JSON is built by string concatenation (not to_json) and every
  * numeric is BIGINT so the DuckDB oracle agrees byte-for-byte; doubles
  * are converted to integer cents per row (see Fns).
  */
object Changefeed {

  /** Micros since epoch of the event ts. */
  private def tsUs: Column = unix_micros(col("ts"))

  /** The published envelope for one change row — exactly the
    * reference's serialized ChangePayload (src/model.rs:74-91). */
  def payloadCol: Column = concat(
    lit("{\"table\":\""), col("tbl"),
    lit("\",\"key\":\""), col("key"),
    lit("\",\"value\":"), col("value"), lit("}"))

  /** Resolved timestamp (µs) parsed out of a resolved-row value,
    * mirroring the reference's JsonCursor parse (src/main.rs:233-238). */
  def resolvedUsCol: Column =
    substring_index(get_json_object(col("value"), "$.resolved"), ".", 1)
      .cast("long")

  /** The {"after": {...}} document for one event row. */
  private def afterJson: Column = concat(
    lit("{\"after\": {\"event_id\": "), str(col("event_id")),
    lit(", \"ts_us\": "), str(tsUs),
    lit(", \"user_id\": "), str(col("user_id")),
    lit(", \"event_type\": \""), col("event_type"),
    lit("\", \"value_cents\": "), str(cents(col("value"))),
    lit(", \"k\": "), coalesce(get_json_object(col("props"), "$.k"), lit("null")),
    lit("}}"))

  /** Change rows (table, key, value) from any events frame (batch or
    * streaming) — narrow projection, no shuffle. */
  def changeRowsFrom(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      tsUs.as("sort_us"),
      lit("events").as("tbl"),
      concat(lit("["), str(col("event_id")), lit("]")).as("key"),
      afterJson.as("value"))

  def changeRows(spark: SparkSession, sfDir: String): DataFrame =
    changeRowsFrom(Tables.events(spark, sfDir))

  /** Resolved-cursor cadence when none is configured: the reference's
    * `resolved = '<frequency>'` default bucket used across the test
    * oracle (one resolved row per event hour). */
  val defaultResolvedFrequencyUs: Long = 3600000000L

  /** Resolved-cursor rows, one per `frequencyUs` bucket end (the
    * changefeed's periodic resolved timestamp — the reference's
    * `resolved = '<frequency>'`, driven by `--cursor-frequency`;
    * main.rs:110-116). Buckets are epoch-aligned: bucket end =
    * (µs div f + 1)·f, which for the 1h default equals the UTC
    * hour-end the oracle computes. `dedup=false` keeps this usable on
    * streaming frames (duplicates are harmless there — the cursor
    * commit takes max per micro-batch). */
  def resolvedRowsFrom(events: DataFrame, dedup: Boolean = true,
      frequencyUs: Long = defaultResolvedFrequencyUs): DataFrame = {
    require(frequencyUs > 0, s"cursor frequency must be positive: $frequencyUs")
    val us = unix_micros(col("ts"))
    val endOfBucketUs = us - pmod(us, lit(frequencyUs)) + lit(frequencyUs)
    val hours = events.select(endOfBucketUs.as("sort_us"))
    (if (dedup) hours.distinct() else hours)
      .select(
        col("sort_us"),
        lit(null).cast("string").as("tbl"),
        lit(null).cast("string").as("key"),
        concat(lit("{\"resolved\": \""), str(col("sort_us")),
          lit(".0000000000\"}")).as("value"))
  }

  def resolvedRows(spark: SparkSession, sfDir: String): DataFrame =
    resolvedRowsFrom(Tables.events(spark, sfDir))

  /** Streaming changefeed frame (change + resolved rows, no global
    * sort — commit order is per-micro-batch) from any events frame.
    * `frequencyUs` is the resolved-row cadence (`--cursor-frequency`). */
  def changefeedFrameFrom(events: DataFrame,
      frequencyUs: Long = defaultResolvedFrequencyUs): DataFrame =
    changeRowsFrom(events).drop("event_id")
      .unionByName(resolvedRowsFrom(events, dedup = false, frequencyUs))

  /** File-based streaming source over an events parquet directory/file
    * — the production shape of the changefeed ingest (new files appear,
    * the query drains them). A streaming read requires the schema up
    * front, and the ts column's PHYSICAL encoding has changed across
    * testdata generations (TIMESTAMP(NANOS)-as-long → µs NTZ) — so
    * probe the actual file schema with a footer-only batch read, feed
    * THAT to readStream, and normalize ts through the same
    * schema-adaptive branch the batch loader uses. Hard-coding either
    * era's layout is exactly the assumption that broke 50 queries in
    * round 8. */
  def streamFromEventsDir(spark: SparkSession, path: String,
      frequencyUs: Long = defaultResolvedFrequencyUs): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // an EMPTY watch dir must still start (the standard
    // start-stream-then-produce pattern): fall back to the current
    // generator era's schema when the dir EXISTS but holds nothing to
    // probe yet. A path that does not exist at all keeps failing fast
    // — swallowing it would start a healthy-looking stream that
    // publishes nothing forever on a typo'd path (review-found).
    val fileSchema =
      try spark.read.parquet(path).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) Tables.currentEventsSchema else throw e
      }
    val events = spark.readStream.schema(fileSchema).parquet(path)
      .withColumn("ts", Tables.normalizeTs(spark, fileSchema("ts").dataType))
    changefeedFrameFrom(events, frequencyUs)
  }

  /** Same, with the cadence taken from the parsed CLI config — the
    * wiring that makes `--cursor-frequency 30s` govern how often the
    * feed emits resolved rows, like the reference's
    * `resolved = '<frequency>'` changefeed option (main.rs:110-116). */
  def streamFromEventsDir(spark: SparkSession, path: String,
      cfg: GraftConfig): DataFrame =
    streamFromEventsDir(spark, path, cfg.cursorFrequencyUs)

  /** §2#1 the full synthetic changefeed frame, in commit order. */
  def changefeedRows(spark: SparkSession, sfDir: String): DataFrame =
    changeRows(spark, sfDir).drop("event_id")
      .unionByName(resolvedRows(spark, sfDir))
      .orderBy(col("sort_us"), coalesce(col("key"), lit("")))

  /** §2#156 multi-table feed ROUTER ledger: the reference binds one
    * process per table (`--table`, cli.yml) and names the destination
    * queue after it (queues.rs:17-30) — a consolidated relay instead
    * runs ONE stream over a multi-table changefeed (CockroachDB core
    * changefeeds accept several tables; rows carry their `table` tag,
    * model.rs:60-73) and routes each change to queue-per-table ×
    * partition-per-key. This op is that router's ledger: per
    * (destination table queue, partition), the message count and the
    * first/last commit timestamps — the fan-out audit an operator
    * reads next to [[lagReport]].
    *
    * Shape: a narrow unionByName of per-table change frames (no
    * shuffle — union is a plan concatenation) + ONE map-side-
    * combinable aggregate on (tbl, part); |tables|×|partitions| rows
    * out regardless of feed size. */
  def tableRouter(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = changeRows(spark, sfDir)
      .select(lit("events").as("tbl"), col("event_id").as("id"),
        col("sort_us"))
    val ord = Tables.load(spark, sfDir, "orders")
      .select(lit("orders").as("tbl"), col("o_orderkey").as("id"),
        // o_orderdate is µs TIMESTAMP_NTZ (UTC wall clock); the cast
        // is instant-exact because every entrypoint pins a UTC session
        unix_micros(col("o_orderdate").cast("timestamp")).as("sort_us"))
    ev.unionByName(ord)
      .select(col("tbl"), pmod(col("id"), lit(8L)).as("part_id"),
        col("sort_us"))
      .groupBy(col("tbl"), col("part_id"))
      .agg(count(lit(1)).as("n_messages"),
        min(col("sort_us")).as("first_us"),
        max(col("sort_us")).as("last_us"))
      .orderBy(col("tbl"), col("part_id"))
  }

  /** §2#150 resolved-window batch ledger — the consumer-side view of
    * the feed as CHECKPOINT BATCHES: every change row belongs to the
    * resolved window that closes over it, and a consumer that applies
    * batch-per-resolved (the standard exactly-once materialization
    * loop) sees, per checkpoint, how many rows it applies, the key
    * range touched, the batch's own high watermark, and the cumulative
    * row count its ledger should read after the commit. [[lagReport]]
    * and [[resolvedGaps]] audit the feed's cadence; this materializes
    * the batch bookkeeping itself.
    *
    * Shape: the reference feed's resolved timestamps are
    * CADENCE-ALIGNED (`resolved='<freq>'` buckets, main.rs:110-126),
    * so window assignment is O(1) arithmetic on sort_us — no join
    * against the resolved stream at all (a feed with ad-hoc resolved
    * timestamps would use the as-of join, §2#132, for the same
    * assignment). One map-side-combinable aggregate to |windows| rows,
    * then the cumulative ledger runs over that calendar-bounded frame
    * — raw changes never enter a window function. */
  def resolvedBatches(spark: SparkSession, sfDir: String): DataFrame = {
    val f = defaultResolvedFrequencyUs
    val cum = Window.orderBy(col("window_end_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    changeRows(spark, sfDir)
      .select(col("sort_us"), col("key"),
        (col("sort_us") - pmod(col("sort_us"), lit(f)) + lit(f))
          .as("window_end_us"))
      .groupBy(col("window_end_us"))
      .agg(count(lit(1)).as("n_changes"),
        min(col("key")).as("first_key"),
        max(col("key")).as("last_key"),
        max(col("sort_us")).as("last_change_us"))
      .withColumn("cum_changes", sum(col("n_changes")).over(cum))
      .orderBy(col("window_end_us"))
  }

  /** §2#211 INCREMENTAL VIEW MAINTENANCE over the changefeed — the
    * materialized-aggregate consumer every CDC pipeline eventually
    * builds (the Materialize/Flink-SQL shape): maintain
    * `SELECT event_type, count(*), sum(value) FROM latest-state GROUP
    * BY event_type` WITHOUT re-reading state, by folding each change's
    * DELTA into the view. A change that creates its PK contributes
    * (+1, +value); one that supersedes a prior version contributes
    * (0, value_new − value_old) — the old value is the PK's previous
    * version in the log (one lag over the PK partition). Deltas
    * aggregate per resolved batch (the same cadence-aligned window
    * assignment as [[resolvedBatches]]), and the running view is a
    * prefix sum over the |batches|×|types| ledger.
    *
    * Why it matters at 100 TB: the naive alternative recomputes the
    * aggregate from compacted state per checkpoint — a full state scan
    * per batch. The IVM path touches each change exactly once: one
    * PK-partitioned lag (co-locatable with the feed's key
    * partitioning), one map-side-combinable delta agg, and a window
    * over the tiny ledger frame. The final ledger row per type equals
    * the from-scratch aggregate over [[compact]] — pinned by spec AND
    * by the DuckDB oracle hash. */
  def incrementalView(spark: SparkSession, sfDir: String): DataFrame = {
    val f = defaultResolvedFrequencyUs
    val pkw = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    val deltas = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"), cents(col("value")).as("c"))
      .withColumn("prev_c", lag(col("c"), 1).over(pkw))
      .select(
        (col("us") - pmod(col("us"), lit(f)) + lit(f)).as("batch_us"),
        col("event_type"),
        when(col("prev_c").isNull, 1L).otherwise(0L).as("dc"),
        (col("c") - coalesce(col("prev_c"), lit(0L))).as("ds"))
      .groupBy(col("batch_us"), col("event_type"))
      .agg(sum(col("dc")).as("d_count"), sum(col("ds")).as("d_sum_c"))
    val runw = Window.partitionBy(col("event_type")).orderBy(col("batch_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("view_count", sum(col("d_count")).over(runw))
      .withColumn("view_sum_c", sum(col("d_sum_c")).over(runw))
      .orderBy(col("event_type"), col("batch_us"))
  }

  /** §2#109 relay lag report — the monitoring query an operator of the
    * reference would run: per queue partition, the last PUBLISHED
    * change timestamp vs the latest RESOLVED cursor; the gap is how far
    * each partition's consumer view trails the changefeed's closed
    * timestamp (resolved rows promise no earlier commits are coming —
    * src/main.rs:240-253). One partial-agg per partition + one
    * broadcast scalar join. */
  def lagReport(spark: SparkSession, sfDir: String): DataFrame = {
    val cursor = resolvedCursor(spark, sfDir).select(col("max_resolved_us"))
    changeRows(spark, sfDir)
      .select(pmod(col("event_id"), lit(32L)).as("part_id"), col("sort_us"))
      .groupBy(col("part_id"))
      .agg(count(lit(1)).as("n_messages"),
        max(col("sort_us")).as("last_published_us"))
      .crossJoin(broadcast(cursor))
      .select(col("part_id"), col("n_messages"), col("last_published_us"),
        col("max_resolved_us"),
        (col("max_resolved_us") - col("last_published_us")).as("lag_us"))
      .orderBy(col("part_id"))
  }

  /** §2#112 VARIANT-typed payload extraction — the Spark 4 twin of
    * [[jsonExtract]]: `parse_json` converts the props payload ONCE into
    * the binary VARIANT encoding, then any number of `variant_get`
    * paths read it without re-parsing text — the right 100 TB shape
    * when many fields are extracted from the same payload (the
    * string-JSON path re-tokenizes per extraction). Missing paths
    * yield typed NULLs, surfaced here via a sentinel. */
  def variantExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"), expr("parse_json(props)").as("v"))
      .select(col("event_id"),
        expr("variant_get(v, '$.k', 'long')").as("k"),
        expr("variant_get(v, '$.not_there', 'long')").as("absent"))
      .where(col("k").isNotNull)
      .select(col("event_id"), col("k"),
        coalesce(col("absent"), lit(-1L)).as("absent_k"))
      .orderBy(col("event_id"))

  /** §2#2 classify change vs resolved rows (reference src/main.rs:240-253:
    * table IS NULL AND key IS NULL → cursor row). */
  def classify(spark: SparkSession, sfDir: String): DataFrame =
    changefeedRows(spark, sfDir)
      .withColumn("row_type",
        when(col("tbl").isNull && col("key").isNull, lit("cursor"))
          .otherwise(lit("change")))
      .groupBy(col("row_type"))
      .agg(count(lit(1)).as("n"),
        min(col("sort_us")).as("first_us"),
        max(col("sort_us")).as("last_us"))
      .orderBy(col("row_type"))

  /** §2#3 ChangePayload envelope {"table","key","value"} published to the
    * queue (reference src/model.rs:74-91, src/main.rs:223-231). */
  def envelope(spark: SparkSession, sfDir: String): DataFrame =
    changeRows(spark, sfDir).select(
      col("event_id"),
      concat(lit("{\"table\":\""), col("tbl"),
        lit("\",\"key\":\""), col("key"),
        lit("\",\"value\":"), col("value"), lit("}")).as("payload"))
      .orderBy(col("event_id"))

  /** §2#4 latest resolved cursor — what the cursor store holds after the
    * feed drains (reference src/cursors.rs:44-57 upsert latest-wins),
    * parsed back out of the resolved-row JSON like src/main.rs:233-238. */
  def resolvedCursor(spark: SparkSession, sfDir: String): DataFrame =
    resolvedRows(spark, sfDir)
      .select(substring_index(get_json_object(col("value"), "$.resolved"), ".", 1)
        .cast("long").as("resolved_us"))
      .agg(max(col("resolved_us")).as("max_resolved_us"),
        count(lit(1)).as("n_resolved"))

  /** §2#5 generalized keyed cursor store: latest position per key
    * (user_id), i.e. UPSERT latest-wins per key. */
  def cursorStore(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").desc, col("event_id").desc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("cursor_event_id"),
        col("us").as("cursor_ts_us"))
      .orderBy(col("user_id"))
  }

  /** §2#6 CDC log compaction: the materialized view a consumer of the
    * published stream would hold — latest change per logical PK
    * (user_id, event_type), plus how many versions it superseded. */
  def compact(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us").desc, col("event_id").desc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"), cents(col("value")).as("value_cents"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_versions", count(lit(1)).over(
        Window.partitionBy(col("user_id"), col("event_type"))))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("last_event_id"),
        col("value_cents").as("last_value_cents"), col("n_versions"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** §2#46 CDC apply (the consumer side of the published stream): merge
    * a newer change batch onto a compacted base snapshot, latest version
    * per PK wins — the distributed MERGE INTO equivalent. Base = state
    * compacted before the split point; delta = raw changes after it.
    * One shuffle on the PK; at scale the base would be bucketed by PK
    * so the merge co-locates. */
  def applyChanges(spark: SparkSession, sfDir: String): DataFrame = {
    val split = lit(java.sql.Timestamp.valueOf("2024-07-01 00:00:00"))
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"), cents(col("value")).as("value_cents"),
        col("ts"))
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us").desc, col("event_id").desc)
    // ONE window pass over the tagged union: every delta row sorts after
    // every base row of the same PK (us is monotone with ts), so the
    // global latest-by-(us, event_id) winner is identical to
    // "compact the base, then merge the delta" — with a single Exchange
    // on (user_id, event_type) instead of two.
    ev.withColumn("origin",
        when(col("ts") >= split, lit("delta")).otherwise(lit("base")))
      .drop("ts")
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("us"), col("value_cents"), col("origin"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** §2#86 consumer-side payload parsing — the INVERSE of [[envelope]]:
    * `from_json` applies the typed table schema back onto the published
    * JSON payloads, recovering relational columns from the wire format
    * (what every downstream consumer of the queue does first; the
    * reference emits the envelope opaquely, src/model.rs:74-91, and
    * leaves parsing to consumers). Narrow per-row codegen'd JSON parse,
    * no shuffle before the final ORDER BY; a malformed payload yields
    * NULLs rather than killing the stream (from_json's PERMISSIVE
    * default — poison-pill tolerance built in). */
  def payloadParse(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val afterSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value_cents", LongType), StructField("k", LongType)))
    val payloadSchema = StructType(Seq(
      StructField("table", StringType), StructField("key", StringType),
      StructField("value", StructType(Seq(StructField("after", afterSchema))))))
    envelope(spark, sfDir)
      .select(from_json(col("payload"), payloadSchema).as("p"))
      .select(col("p.table").as("src_table"),
        col("p.value.after.event_id").as("event_id"),
        col("p.value.after.ts_us").as("ts_us"),
        col("p.value.after.user_id").as("user_id"),
        col("p.value.after.event_type").as("event_type"),
        col("p.value.after.value_cents").as("value_cents"),
        coalesce(col("p.value.after.k"), lit(-1L)).as("k"))
      .orderBy(col("event_id"))
  }

  /** §2#84 compaction WITH DELETE semantics: a changefeed row whose
    * payload carries no "after" document is a tombstone (CockroachDB
    * emits `{"after": null}` on DELETE — the reference's ChangePayload
    * passes it through opaquely, src/model.rs:74-91). Synthesized here
    * as a deterministic marker (every 97th event deletes its PK).
    * Compaction is the same latest-wins argmax as [[compact]], but a PK
    * whose LATEST version is a tombstone vanishes from the materialized
    * view — the consumer-side GC a real CDC sink must implement. Still
    * one shuffle; tombstone handling is a post-argmax filter, and
    * n_deletes is carried so the spec can see drops happened. */
  def compactTombstones(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us").desc, col("event_id").desc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"), cents(col("value")).as("value_cents"),
        when(col("event_id") % 97 === 0, lit(1L)).otherwise(lit(0L)).as("is_delete"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_versions", count(lit(1)).over(
        Window.partitionBy(col("user_id"), col("event_type"))))
      .withColumn("n_deletes", sum(col("is_delete")).over(
        Window.partitionBy(col("user_id"), col("event_type"))))
      .where(col("rn") === 1 && col("is_delete") === 0L)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("last_event_id"),
        col("value_cents").as("last_value_cents"),
        col("n_versions"), col("n_deletes"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** §2#72 SCD Type-2 history from the change log: per logical PK
    * (user_id, event_type), each change version gets a validity interval
    * [valid_from_us, valid_to_us) — `lead` over the PK-partitioned commit
    * order closes each interval at the next version's start; the current
    * version stays open (sentinel Long.MaxValue, never NULL — NULL sort
    * and hash behavior differ across engines). This is what a warehouse
    * consumer of the published feed (reference src/main.rs:223-231)
    * materializes for time-travel queries. One shuffle on the PK; window
    * state is one row (lead(1)), so reducers stream at any scale. */
  def scd2(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"), cents(col("value")).as("value_cents"))
      .withColumn("valid_to_us",
        coalesce(lead(col("us"), 1).over(w), lit(Long.MaxValue)))
      .withColumn("version_n", row_number().over(w).cast("long"))
      .withColumn("is_current",
        when(col("valid_to_us") === lit(Long.MaxValue), lit(1L)).otherwise(lit(0L)))
      .select(col("user_id"), col("event_type"), col("version_n"),
        col("event_id"), col("value_cents"),
        col("us").as("valid_from_us"), col("valid_to_us"), col("is_current"))
      .orderBy(col("user_id"), col("event_type"), col("version_n"))
  }

  /** §2#7 JSON field extraction (the reference parses `{"resolved":..}` /
    * `{"after":..}` payloads; generalized over the events.props column). */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .where(col("k").isNotNull)
      .orderBy(col("event_id"))

  /** §2#137 resolved-cadence audit: gaps between CONSECUTIVE resolved
    * timestamps larger than the configured frequency — on a healthy
    * feed resolved rows arrive every `resolved='<freq>'` tick
    * (main.rs:110-126), so a gap means the changefeed stalled, the
    * relay fell behind, or (in this synthetic feed) the source went
    * quiet; `missed_ticks` counts how many cadence intervals went by
    * silently. This is the alert an operator pages on next to
    * [[lagReport]] (lag = how far behind; gaps = how bumpy).
    *
    * Audited at a 10-min cadence (`resolved='10m'` — finer than the
    * oracle-shared hourly feed, because at test densities every hour
    * has traffic and an hourly audit is vacuously clean; quiet 10-min
    * buckets are where the gaps live). Shape: the resolved frame is
    * |buckets|-sized, one lag window over a single ordered sequence —
    * the window input is the pre-shrunk resolved stream, never the
    * change feed. */
  def resolvedGaps(spark: SparkSession, sfDir: String,
      frequencyUs: Long = 600000000L): DataFrame = {
    val w = Window.orderBy(col("sort_us"))
    resolvedRowsFrom(Tables.events(spark, sfDir), dedup = true,
        frequencyUs = frequencyUs)
      .select(col("sort_us"))
      .withColumn("prev_us", lag(col("sort_us"), 1).over(w))
      .where(col("prev_us").isNotNull &&
        col("sort_us") - col("prev_us") > frequencyUs)
      .select(col("prev_us"), col("sort_us").as("next_us"),
        (col("sort_us") - col("prev_us")).as("gap_us"),
        expr(s"(sort_us - prev_us) div $frequencyUs - 1").as("missed_ticks"))
      .orderBy(col("prev_us"))
  }

  /** §2#131 snapshot diff — CDC time travel: compact the feed at an
    * earlier cursor T (here the feed's midpoint, computed distributed)
    * and at the head, then diff the two materialized states per PK:
    * `added` (PK born after T) or `changed` (newer version won) — the
    * "what changed since the last report ran" query every downstream
    * consumer of the reference eventually writes. `removed` cannot
    * occur on an append-only feed (T's keys ⊆ head's keys); the
    * full-outer join keeps the diff honest if a tombstoning feed is
    * swapped in. `same` rows are filtered server-side — at 100 TB the
    * diff output is ∝ churn, not ∝ state.
    *
    * Shape: one window pass computes BOTH snapshots (row_number over
    * the full feed; the ≤T snapshot is the same partition ordered by
    * the same key, filtered) — so the feed shuffles ONCE on the PK,
    * not once per snapshot; the cutoff is a broadcast scalar. */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"), cents(col("value")).as("value_cents"))
    val cutoff = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
      .select(expr("(mn + mx) div 2").as("cut"))
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us").desc, col("event_id").desc)
    val wCut = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("in_a").desc, col("us").desc, col("event_id").desc)
    val ranked = ev.crossJoin(broadcast(cutoff))
      .withColumn("in_a", when(col("us") <= col("cut"), 1L).otherwise(0L))
      .withColumn("rn_b", row_number().over(w))
      .withColumn("rn_a", row_number().over(wCut))
    val b = ranked.where(col("rn_b") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("b_event_id"), col("value_cents").as("b_value_cents"))
    val a = ranked.where(col("rn_a") === 1 && col("in_a") === 1L)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("a_event_id"), col("value_cents").as("a_value_cents"))
    b.join(a, Seq("user_id", "event_type"), "full_outer")
      .withColumn("status",
        when(col("a_event_id").isNull, lit("added"))
          .when(col("b_event_id").isNull, lit("removed"))
          .when(col("a_event_id") =!= col("b_event_id") ||
            col("a_value_cents") =!= col("b_value_cents"), lit("changed"))
          .otherwise(lit("same")))
      .where(col("status") =!= "same")
      .select(col("user_id"), col("event_type"), col("status"),
        col("a_event_id"), col("a_value_cents"),
        col("b_event_id"), col("b_value_cents"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** §2#125 payload schema-drift report: per (table, key-of-`after`)
    * first-seen / last-seen commit timestamps and row counts, with a
    * drift verdict against the table's own feed window — `added` if the
    * key shows up after the feed started, `removed` if it stops before
    * the feed ends, else `stable`. This is the consumer-side schema
    * registry an operator of the reference builds to notice upstream
    * `ALTER TABLE` landing in the published payloads (the changefeed
    * itself is schema-less JSON; src/model.rs:60-99 just forwards
    * bytes).
    *
    * Shape: `json_object_keys` over the `after` object is a narrow
    * codegen'd parse; the inventory agg is map-side combinable on
    * (table, key) — the shuffle carries |tables|×|keys| rows, never the
    * feed; the per-table window bounds join back broadcast-tiny. On the
    * synthetic feed every key spans the window (all `stable`) — the
    * added/removed verdicts are pinned by a crafted-frame ScalaTest. */
  def schemaDrift(spark: SparkSession, sfDir: String): DataFrame =
    schemaDriftFrom(changeRows(spark, sfDir))

  def schemaDriftFrom(change: DataFrame): DataFrame = {
    val keyed = change.select(col("tbl"), col("sort_us"),
      explode(json_object_keys(get_json_object(col("value"), "$.after"))).as("key"))
    val inv = keyed.groupBy(col("tbl"), col("key"))
      .agg(count(lit(1)).as("n"),
        min(col("sort_us")).as("first_seen_us"),
        max(col("sort_us")).as("last_seen_us"))
    val bounds = change.groupBy(col("tbl"))
      .agg(min(col("sort_us")).as("t_lo"), max(col("sort_us")).as("t_hi"))
    inv.join(broadcast(bounds), "tbl")
      .select(col("tbl"), col("key"), col("n"),
        col("first_seen_us"), col("last_seen_us"),
        when(col("first_seen_us") > col("t_lo"), lit("added"))
          .when(col("last_seen_us") < col("t_hi"), lit("removed"))
          .otherwise(lit("stable")).as("status"))
      .orderBy(col("tbl"), col("key"))
  }

  /** §2#129 dead-letter routing: the consumer-side handling the
    * reference leaves implicit — a malformed payload must not poison
    * the relay (the Rust side would NACK it; src/queues.rs:44-64
    * publishes fire-and-forget). Corruption is INJECTED deterministically
    * (every 97th payload loses its last 3 bytes, which always breaks the
    * trailing `"}}"` braces) so both engines see the same wire; a row
    * routes to the DLQ when the `after.event_id` extraction fails —
    * Spark's PERMISSIVE `get_json_object` NULL, the oracle's
    * `json_valid` guard. Output is the per-queue-partition ok/dlq
    * ledger + first bad key an operator would alert on.
    *
    * Shape: classification is a narrow codegen'd parse; the ledger agg
    * is map-side combinable on part_id (32 rows out). At 100 TB the
    * DLQ side would also be WRITTEN (a second sink in the same
    * foreachBatch) — the routing predicate here is that sink's
    * partition filter. */
  def dlq(spark: SparkSession, sfDir: String): DataFrame =
    changeRows(spark, sfDir)
      .select(col("event_id"),
        when(pmod(col("event_id"), lit(97L)) === 0L,
          expr("substr(value, 1, length(value) - 3)"))
          .otherwise(col("value")).as("wire"))
      .select(pmod(col("event_id"), lit(32L)).as("part_id"),
        col("event_id"),
        get_json_object(col("wire"), "$.after.event_id").isNotNull.as("ok"))
      .groupBy(col("part_id"))
      .agg(sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_dlq"),
        min(when(!col("ok"), col("event_id"))).as("first_bad_event_id"))
      .orderBy(col("part_id"))

  /** §2#8 deterministic queue-partition assignment + per-partition publish
    * stats (generalizes the single rabbitmq queue + messages_sent counter,
    * reference src/queues.rs:44-64, src/metrics.rs). */
  def queuePartition(spark: SparkSession, sfDir: String): DataFrame =
    envelope(spark, sfDir)
      .select(pmod(col("event_id"), lit(32L)).as("part_id"),
        length(col("payload")).cast("long").as("bytes"))
      .groupBy(col("part_id"))
      .agg(count(lit(1)).as("n_messages"), sum(col("bytes")).as("total_bytes"))
      .orderBy(col("part_id"))

  /** §2#176 FAN-IN merge ledger — the consumer-side law for joining N
    * independent feeds (per-region/per-shard changefeeds each publish
    * their own resolved timestamps, reference src/cursors.rs:44-57
    * generalized to many cursors): an ordered merged emission may only
    * advance to the MIN over per-source frontiers — one lagging shard
    * holds back the whole merge (exactly Kafka Streams' stream-time =
    * min over partitions, and watermark combination in any multi-input
    * streaming operator). Sources here are the deterministic shard
    * assignment `user_id mod nSources`; per-source frontier = its max
    * commit time. The ledger reports, per source: its own frontier,
    * the combined safe frontier, and how many of its rows are SAFE
    * (≤ safe frontier, emittable in order) vs HELD (beyond it, waiting
    * on the slowest sibling) — the "why is my merge stalled"
    * dashboard.
    *
    * Shape: one map-side-combinable aggregate pass builds the
    * |sources|-row frontier table (materialized — it feeds the global
    * min AND the final join, and re-deriving it would re-scan the
    * feed), then one counting pass over the feed against the broadcast
    * 1-row global min; no shuffle beyond the per-source combines. The
    * second pass is inherent: which rows are safe is only knowable
    * after the slowest frontier is. */
  def fanIn(spark: SparkSession, sfDir: String, nSources: Int = 4): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(pmod(col("user_id"), lit(nSources.toLong)).as("source_id"),
        unix_micros(col("ts")).as("us"))
    val per = e.groupBy(col("source_id"))
      .agg(max(col("us")).as("frontier_us"), count(lit(1)).as("n_total"))
      .cut
    val global = per.agg(min(col("frontier_us")).as("safe_frontier_us"))
    val safe = e.crossJoin(broadcast(global))
      .groupBy(col("source_id"), col("safe_frontier_us"))
      .agg(sum(when(col("us") <= col("safe_frontier_us"), 1L).otherwise(0L))
        .as("n_safe"))
    per.join(broadcast(safe), Seq("source_id"))
      .select(col("source_id"), col("frontier_us"), col("safe_frontier_us"),
        col("n_total"), col("n_safe"),
        (col("n_total") - col("n_safe")).as("n_held"))
      .orderBy(col("source_id"))
  }

  /** §2#237 per-key ORDER AUDIT — the monotonicity check the
    * reference's cursor design silently depends on (main.rs:132-169
    * advances the `updated_at` cursor to the batch max; a key whose
    * event time REGRESSES between consecutive changes re-delivers or
    * skips under that contract, and the GC-threshold restart
    * amplifies it): per key, walk the feed in commit order (event_id)
    * and count event-time inversions, reporting per queue partition
    * (the #8 `pmod(key, 32)` routing) how many keys/changes are
    * affected and the worst observed regression — the table an
    * on-call reads before trusting a cursor-advance policy.
    *
    * Shape: one window per user_id partition in event_id order (hash
    * exchange on the key — each of 1000 executors audits its key
    * range independently, per-key state is one lag value), then a
    * map-side-combinable agg to 32 partition rows. */
  def orderAudit(spark: SparkSession, sfDir: String,
      nParts: Int = 32): DataFrame =
    orderAuditOf(Tables.events(spark, sfDir), nParts)

  /** [[orderAudit]] over any (user_id, event_id, ts) frame. */
  def orderAuditOf(events: DataFrame, nParts: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("reg", when(col("prev").isNotNull && col("prev") > col("us"),
        col("prev") - col("us")).otherwise(0L))
      .groupBy(pmod(col("user_id"), lit(nParts.toLong)).as("part_id"))
      .agg(countDistinct(col("user_id")).as("n_keys"),
        count(lit(1)).as("n_changes"),
        sum(when(col("reg") > 0, 1L).otherwise(0L)).as("n_inversions"),
        max(col("reg")).as("max_regress_us"))
      .withColumn("ordered_pm",
        expr("1000 * (n_changes - n_inversions) div n_changes"))
      .orderBy(col("part_id"))
  }

  /** §2#251 TRANSACTION STATS — commit-group shape of the multi-table
    * feed: CockroachDB changefeed rows from one transaction share one
    * commit HLC timestamp (the reference orders and de-dups on exactly
    * that instant, model.rs:74-91), so grouping by (tbl, sort_us)
    * recovers transaction boundaries without any txn-id on the wire.
    * Per table: transaction count, row count, the largest transaction,
    * multi-row transaction count and the singleton share in per-mille
    * — the report that decides whether a downstream applier needs
    * batch-atomic writes (multi-row txns present) or can stream row
    *-at-a-time (all singletons).
    *
    * Shape: one combinable (tbl, sort_us) count (map-side partials →
    * |commit instants| rows), one |tables|-row aggregate. */
  def txnStats(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = changeRows(spark, sfDir).select(col("tbl"), col("sort_us"))
    val ord = Tables.load(spark, sfDir, "orders")
      .select(lit("orders").as("tbl"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("sort_us"))
    val txns = ev.unionByName(ord)
      .groupBy(col("tbl"), col("sort_us")).agg(count(lit(1)).as("n"))
    txns.groupBy(col("tbl"))
      .agg(count(lit(1)).as("n_txns"), sum(col("n")).as("n_changes"),
        max(col("n")).as("max_txn_rows"),
        sum(when(col("n") >= 2, 1L).otherwise(0L)).as("multi_row_txns"))
      .select(col("tbl"), col("n_txns"), col("n_changes"),
        col("max_txn_rows"), col("multi_row_txns"),
        expr("1000 * (n_txns - multi_row_txns) div n_txns").as("singleton_pm"))
      .orderBy(col("tbl"))
  }

  /** §2#270 HOT-KEY REPORT — the per-table top-10 hottest change
    * entities (events keyed by user, orders by customer): change
    * count, per-mille share of the table's feed, and rank. The
    * operational twin of cdc_queue_partition: partition counts say A
    * partition is hot, this says WHICH key — the input to key-split /
    * salting decisions on the publish side (the reference publishes
    * per-key FIFO, so one hot key serializes one queue partition;
    * main.rs:110-126's ordered feed is per-key ordered).
    *
    * Shape: one combinable (tbl, entity) count — the corpus shuffle;
    * the rank window runs per table over the compacted |entities|
    * count table (the #20 window-topk shape; the TopKWindowRewrite
    * rule turns it into O(k) per-partition buffers when enabled);
    * table totals broadcast back. Output ≤ 10·|tables| rows. */
  def hotKeys(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(lit("events").as("tbl"), col("user_id").as("entity"))
    val ord = Tables.load(spark, sfDir, "orders")
      .select(lit("orders").as("tbl"), col("o_custkey").as("entity"))
    val counts = ev.unionByName(ord)
      .groupBy(col("tbl"), col("entity")).agg(count(lit(1)).as("n_changes"))
    val totals = counts.groupBy(col("tbl")).agg(sum(col("n_changes")).as("t"))
    val w = Window.partitionBy(col("tbl"))
      .orderBy(col("n_changes").desc, col("entity"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .join(broadcast(totals), "tbl")
      .select(col("tbl"), col("rank"), col("entity"), col("n_changes"),
        expr("1000 * n_changes div t").as("share_pm"))
      .orderBy(col("tbl"), col("rank"))
  }
}
