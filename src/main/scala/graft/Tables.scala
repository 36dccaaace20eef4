package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  * Parquet scans — Catalyst pushes filters/pruning into these. */
object Tables {
  /** `events` must ALWAYS go through the nanos normalization below —
    * reading it as plain parquet throws PARQUET_TYPE_ILLEGAL unless an
    * earlier events read happened to set the session conf (a
    * call-order trap). */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") eventsRaw(spark, sfDir) else raw(spark, sfDir, name)

  private def raw(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.ts has shipped in three physical parquet encodings across
    * testdata regenerations: TIMESTAMP(NANOS) (reads as a nanos
    * LongType under the legacy conf), TIMESTAMP(MICROS) isAdjustedToUTC
    * =false (reads as TIMESTAMP_NTZ), and TIMESTAMP(MICROS) UTC (reads
    * as TimestampType). Branch on the READ schema instead of assuming
    * one layout, and normalize them all to the same µs TimestampType
    * (exactly what DuckDB's read does: ns→µs truncation, NTZ treated
    * as UTC wall clock) so every downstream op sees a plain timestamp. */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    // Legacy NANOS files only read back (as LongType) under this conf;
    // harmless for µs files.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = raw(spark, sfDir, "events")
    df.withColumn("ts", normalizeTs(spark, df.schema("ts").dataType))
  }

  private[graft] def normalizeTs(
      spark: SparkSession,
      tsType: org.apache.spark.sql.types.DataType): Column = tsType match {
    case LongType => // legacy ns-as-long: truncate to µs, stamp as UTC instant
      timestamp_micros(expr("ts div 1000"))
    case _: TimestampNTZType =>
      // The generator writes UTC wall clocks. NTZ→Timestamp CAST
      // interprets the wall clock in the session zone, so it is only
      // exact under UTC — fail loudly rather than silently shift every
      // events timestamp for a caller who didn't pin the session zone.
      val tz = spark.conf.get("spark.sql.session.timeZone")
      require(
        tz == "UTC" || tz == "Etc/UTC" || tz == "+00:00",
        s"events.ts is TIMESTAMP_NTZ (UTC wall clock); set " +
          s"spark.sql.session.timeZone=UTC (was '$tz') so the cast to " +
          "TimestampType preserves the instant")
      col("ts").cast(TimestampType)
    case _: TimestampType => col("ts") // already an instant
    case other =>
      throw new IllegalStateException(
        s"events.ts read back as unsupported type $other; expected " +
          "long (legacy nanos), timestamp_ntz, or timestamp")
  }

  /** The CURRENT generator era's events schema (ts as µs TIMESTAMP_NTZ
    * — what the driver writes today). The single source of truth for
    * code that needs the schema before any file exists (the streaming
    * source's empty-dir start); keep in lockstep with the encodings
    * normalizeTs handles and EventsSchemaDriftSpec pins. */
  val currentEventsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampNTZType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
  }

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** The documents/embeddings test files are single small parquet files
    * → one input split → CPU-heavy narrow transforms (shingling,
    * hashing, similarity) would run on one core. Spread them across the
    * cluster first. On a real 100 TB table the file splits already
    * provide this parallelism and the repartition is a no-op choice. */
  def documentsPar(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(s.sparkContext.defaultParallelism)
  def embeddingsPar(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).repartition(s.sparkContext.defaultParallelism)
}
