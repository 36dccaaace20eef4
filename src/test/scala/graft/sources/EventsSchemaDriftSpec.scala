package graft.sources

import java.nio.file.Files
import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Regression pin for the round-8 outage: the driver-regenerated
  * events.parquet switched TIMESTAMP(NANOS) → TIMESTAMP(MICROS) and
  * the loader's hard-coded nanos normalization broke 50/119 queries.
  * `Tables.eventsRaw` must now normalize every physical encoding the
  * testdata has ever shipped to the same µs TimestampType instants:
  *
  *  - legacy ns-as-long (TIMESTAMP(NANOS) reads as LongType under
  *    spark.sql.legacy.parquet.nanosAsLong — we write a plain INT64
  *    column, which reads back as the identical LongType schema)
  *  - TIMESTAMP(MICROS) isAdjustedToUTC=false → TIMESTAMP_NTZ
  *  - TIMESTAMP(MICROS) isAdjustedToUTC=true  → TimestampType
  */
class EventsSchemaDriftSpec extends SparkSuite {

  /** 5 rows spanning sub-second precision and an hour boundary. */
  private val microsRows = Seq(
    (1L, 1704067199999999L, 10L, "click", 1.5, "{}"),
    (2L, 1704067200000000L, 11L, "view", 2.0, "{}"),
    (3L, 1704070800123456L, 10L, "click", 0.0, "{}"),
    (4L, 1704074400500000L, 12L, "purchase", 9.9, "{}"),
    (5L, 1704078000000001L, 11L, "view", 3.3, "{}"))

  private def base() = {
    import spark.implicits._
    microsRows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
  }

  /** Writes `df` (already carrying a `ts` column) as <tmp>/events.parquet
    * and loads it back through the production loader. */
  private def roundTrip(dfCols: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
    val dir = Files.createTempDirectory("graft-events-drift").toString
    dfCols
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.eventsRaw(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
  }

  private val expected = microsRows.map(r => (r._1, r._2)).sorted

  test("legacy ns-as-long events files normalize to µs instants") {
    assert(roundTrip(base().withColumn("ts", col("us") * 1000L)) === expected)
  }

  test("µs TIMESTAMP_NTZ events files (current testdata) normalize identically") {
    val df = base().withColumn("ts",
      timestamp_micros(col("us")).cast(TimestampNTZType))
    assert(df.schema("ts").dataType === TimestampNTZType)
    assert(roundTrip(df) === expected)
  }

  test("µs UTC-adjusted TIMESTAMP events files pass through unchanged") {
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      val df = base().withColumn("ts", timestamp_micros(col("us")))
      assert(df.schema("ts").dataType === TimestampType)
      assert(roundTrip(df) === expected)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  test("NTZ load fails loudly when the session zone is not UTC") {
    val dir = Files.createTempDirectory("graft-events-tz").toString
    base().withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val e = intercept[IllegalArgumentException] {
        Tables.eventsRaw(spark, dir).collect()
      }
      assert(e.getMessage.contains("session.timeZone"))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("the STREAMING events source adapts to every encoding too") {
    // the r8 outage's latent twin lived in streamFromEventsDir's
    // hard-coded LongType schema — pin both encodings through the
    // streaming path end-to-end
    for (legacy <- Seq(true, false)) {
      val dir = Files.createTempDirectory("graft-evdir-drift")
      val tsCol =
        if (legacy) col("us") * 1000L // ns-as-long era
        else timestamp_micros(col("us")).cast(TimestampNTZType) // current
      // part files land DIRECTLY in the watched dir (the source globs
      // the directory; a nested events.parquet/ dir would be invisible
      // to the schema probe)
      base().select(col("event_id"), tsCol.as("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(dir.toString)
      val frame = graft.cdc.Changefeed.streamFromEventsDir(spark, dir.toString)
      val q = frame.writeStream.outputMode("append")
        .format("memory").queryName(s"evdrift_$legacy")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-evdrift").toString)
        .start()
      q.processAllAvailable(); q.stop()
      val got = spark.table(s"evdrift_$legacy")
        .where(col("tbl").isNotNull).count()
      assert(got === 5L, s"legacy=$legacy: $got change rows, want 5")
    }
  }

  test("streaming source starts on an EMPTY dir and drains files that arrive later") {
    // the start-stream-then-produce pattern: the schema probe finds
    // nothing, falls back to the current-era schema, and the query
    // waits instead of dying at setup (review-found regression)
    val dir = Files.createTempDirectory("graft-evdir-empty")
    val frame = graft.cdc.Changefeed.streamFromEventsDir(spark, dir.toString)
    val q = frame.writeStream.outputMode("append")
      .format("memory").queryName("evdrift_empty")
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt-evempty").toString)
      .start()
    q.processAllAvailable() // empty batch: must not throw
    assert(spark.table("evdrift_empty").count() === 0)
    // the producer shows up AFTER the stream started
    base().select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("append").parquet(dir.toString)
    q.processAllAvailable(); q.stop()
    assert(spark.table("evdrift_empty")
      .where(col("tbl").isNotNull).count() === 5L)
  }

  test("a NONEXISTENT events path still fails fast — no silent empty stream") {
    // only an existing-but-empty dir gets the fallback schema; a typo'd
    // path must throw at setup like it always did
    intercept[org.apache.spark.sql.AnalysisException] {
      graft.cdc.Changefeed.streamFromEventsDir(spark,
        "/nonexistent/graft/events/dir")
    }
  }

  test("production testdata loads through the adaptive path with instants intact") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.count() > 0)
    // instants must land in the generator's 2024 window, not shifted by a zone
    val yrs = df.select(year(col("ts"))).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(yrs.nonEmpty && yrs.forall(y => y >= 2020 && y <= 2030), s"years=$yrs")
  }
}
