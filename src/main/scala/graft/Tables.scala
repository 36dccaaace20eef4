package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark only reads as a
    * nanos LongType under the legacy conf. Normalize it back to a µs
    * TimestampType (exactly what DuckDB's read does: ns→µs truncation)
    * so every downstream op sees a plain timestamp. */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
