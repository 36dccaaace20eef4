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

  /** DERIVED SYNTHETIC SUPPLEMENT — the corpus has no `partsupp`
    * table, so the last four partsupp-bound TPC-H classics
    * (Q2/Q11/Q16/Q20) would otherwise be permanently out of scope
    * (r15 verdict #2). Instead of extending the read-only testdata,
    * partsupp is DERIVED deterministically from `part` with pure
    * non-negative integer arithmetic — the same formula dbgen uses
    * (TPC-H spec §4.2.3: supplier k of part p is
    * (p + k·(S/4 + p/S)) mod S, adapted to this corpus's 0-based
    * contiguous keys), so the DuckDB oracle reproduces it bit-exactly
    * from the same parquet inputs and every query over it stays
    * hash-gated.
    *
    * Columns: ps_partkey, ps_suppkey (4 per part), ps_availqty
    * (1..9999), ps_supplycost_c (integer cents, 1.00..999.99), plus
    * the part attributes (p_brand/p_type/p_size) carried along so
    * Q16-style attribute grouping needs no second part join.
    *
    * Scale note: the derivation is NARROW — four in-row expressions
    * over the part scan and a 1-row supplier-count broadcast; nothing
    * shuffles and nothing materializes. At 100 TB "partsupp" is four
    * codegen'd rows per part row, not a table. At tiny sf the modular
    * walk can land two k's on the same supplier (S div 4 small); the
    * duplicate row is IDENTICAL (availqty/cost derive from
    * (partkey, suppkey)) and both engines derive the same multiset,
    * so every gate stays exact. */
  /** Single source for the derived-availqty formula (r16 advice: the
    * expression appeared verbatim in four places — [[partsupp]],
    * [[partsuppSql]], Analytics.q20PartPromotion and its oracle — so
    * an edit to one would silently break the documented "same formula
    * partsupp uses" invariant; the hash gate only pins Spark-vs-oracle
    * WITHIN q20). Engine-portable: integer `%` on non-negative
    * operands evaluates identically in Spark SQL and DuckDB (the
    * sign-safety registry's standing proof obligation), so the same
    * string splices into both engines' queries. */
  def availqtySql(partCol: String, suppCol: String): String =
    s"1 + ($partCol * 47 + $suppCol * 31) % 9999"

  def partsupp(s: SparkSession, d: String): DataFrame = {
    val sCnt = supplier(s, d).agg(count(lit(1)).as("s_cnt"))
    part(s, d)
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      .crossJoin(broadcast(sCnt))
      .select(col("*"),
        explode(array((0 to 3).map(lit(_)): _*)).as("i"))
      .withColumn("ps_suppkey",
        expr("(p_partkey + CAST(i AS BIGINT) * (s_cnt div 4 + p_partkey div s_cnt)) % s_cnt"))
      .select(col("p_partkey").as("ps_partkey"), col("ps_suppkey"),
        expr(availqtySql("p_partkey", "ps_suppkey")).as("ps_availqty"),
        expr("100 + (p_partkey * 59 + ps_suppkey * 97) % 99900")
          .as("ps_supplycost_c"),
        col("p_brand"), col("p_type"), col("p_size"))
  }

  /** The DuckDB twin of [[partsupp]] as a WITH-clause body — every
    * oracle over the derived table splices this so both engines
    * compute the identical multiset. Keep in lockstep with partsupp
    * above (PartsuppDerivationSpec pins the equivalence). */
  val partsuppSql: String =
    s"""sc AS (SELECT count(*) AS s_cnt FROM supplier),
      |ps0 AS (SELECT p_partkey, p_brand, p_type, p_size,
      |  (p_partkey + CAST(i AS BIGINT) * (s_cnt // 4 + p_partkey // s_cnt)) % s_cnt AS ps_suppkey
      |  FROM part CROSS JOIN sc
      |  CROSS JOIN (VALUES (0), (1), (2), (3)) AS gen(i)),
      |partsupp AS (SELECT p_partkey AS ps_partkey, ps_suppkey,
      |  ${availqtySql("p_partkey", "ps_suppkey")} AS ps_availqty,
      |  100 + (p_partkey * 59 + ps_suppkey * 97) % 99900 AS ps_supplycost_c,
      |  p_brand, p_type, p_size FROM ps0)""".stripMargin

  /** DERIVED SHIP COLUMNS — the corpus lineitem has no l_shipmode and
    * no commit/receipt dates, blocking Q12 and Q21. Derived here the
    * same way: pure integer arithmetic in MICROSECOND space (timestamp
    * day-offsets as µs deltas — no calendar function crosses the
    * engine boundary) plus a 7-way modular ship-mode pick, identical
    * in [[lineitemShipSql]]. Receipt lands 1–30 days after ship;
    * commit −15..+45 days around ship, so both Q12's "shipped before
    * commit, received after" band and Q21's "received late" flag are
    * non-degenerate. Narrow: three in-row expressions over the
    * lineitem scan. */
  def lineitemShip(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      // l_shipdate reads back TIMESTAMP_NTZ (UTC wall clock, like
      // events.ts) — the cast to TIMESTAMP is exact under the pinned
      // UTC session zone and matches DuckDB's epoch_us read
      .withColumn("ship_us", expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))"))
      .withColumn("lnum", col("l_linenumber").cast(LongType))
      .withColumn("l_receipt_us",
        expr("ship_us + (1 + (l_orderkey * 5 + lnum * 3) % 30) * 86400000000"))
      .withColumn("l_commit_us",
        expr("ship_us + ((l_orderkey * 7 + lnum * 11) % 61) * 86400000000 - 15 * 86400000000"))
      .withColumn("l_shipmode",
        expr("""CASE (l_orderkey * 3 + lnum) % 7
          | WHEN 0 THEN 'AIR' WHEN 1 THEN 'FOB' WHEN 2 THEN 'MAIL'
          | WHEN 3 THEN 'RAIL' WHEN 4 THEN 'REG AIR' WHEN 5 THEN 'SHIP'
          | ELSE 'TRUCK' END""".stripMargin))
      .drop("ship_us", "lnum")

  /** DuckDB twin of [[lineitemShip]] (a WITH-clause body named
    * lineitem_ship). */
  val lineitemShipSql: String =
    """lineitem_ship AS (SELECT *,
      |  epoch_us(l_shipdate)
      |    + (1 + (l_orderkey * 5 + CAST(l_linenumber AS BIGINT) * 3) % 30)
      |      * 86400000000 AS l_receipt_us,
      |  epoch_us(l_shipdate)
      |    + ((l_orderkey * 7 + CAST(l_linenumber AS BIGINT) * 11) % 61)
      |      * 86400000000 - 15 * 86400000000 AS l_commit_us,
      |  CASE (l_orderkey * 3 + CAST(l_linenumber AS BIGINT)) % 7
      |    WHEN 0 THEN 'AIR' WHEN 1 THEN 'FOB' WHEN 2 THEN 'MAIL'
      |    WHEN 3 THEN 'RAIL' WHEN 4 THEN 'REG AIR' WHEN 5 THEN 'SHIP'
      |    ELSE 'TRUCK' END AS l_shipmode
      |  FROM lineitem)""".stripMargin

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
