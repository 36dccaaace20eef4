package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Physical data-layout operators (§2.8 extension): multi-dimensional
  * clustering for scan pruning. At 100 TB the cheapest query is the one
  * whose files never open — layout is an operator, not an afterthought.
  */
object Layout {

  private val bits = 10 // per-dimension resolution → 2·bits-bit z values
  private val fileBits = 6 // 64 z-range "files"

  /** §2#126 Z-order (Morton) clustering + the resulting skip index.
    *
    * Interleaves the bits of two scan dimensions (user bucket ×
    * hour-of-feed bucket) into one z value, assigns equal-z-range
    * "files", and emits each file's per-dimension min/max — exactly the
    * column statistics a lakehouse scan planner prunes on. Because the
    * top `fileBits` bits of z alternate between dimensions, every file
    * spans at most 2^(bits − fileBits/2) of EACH dimension (here 128 of
    * 1024): a predicate on either dimension prunes ~⅞ of files. A
    * single-dimension sort gives perfect pruning on the sort key and
    * NONE on the other — the Z-curve trades a constant factor on one
    * dim for bounded ranges on all dims (the Delta/Iceberg Z-ORDER
    * rationale; Morton 1966).
    *
    * Shape: the z value is pure integer bit-arithmetic (codegen'd, no
    * UDF); file assignment is `z div 2^(2·bits−fileBits)` — at
    * production scale you'd `repartitionByRange(z)` + write, which
    * range-shuffles ONCE and never sorts globally; the stats agg is
    * map-side combinable on file_id (64 rows out). */
  def zorder(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = 1L << bits
    val zExpr = (0 until bits)
      .map(i => s"(shiftleft(shiftright(x, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright(y, $i) & 1, ${2 * i + 1}))")
      .mkString(" + ")
    Tables.events(spark, sfDir)
      .select(expr(s"pmod(user_id, $dim)").as("x"),
        expr(s"pmod(unix_micros(date_trunc('hour', ts)) div 3600000000, $dim)").as("y"))
      .withColumn("z", expr(zExpr))
      .withColumn("file_id", expr(s"z div ${1L << (2 * bits - fileBits)}"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_lo"), max(col("x")).as("x_hi"),
        min(col("y")).as("y_lo"), max(col("y")).as("y_hi"),
        min(col("z")).as("z_lo"), max(col("z")).as("z_hi"))
      .orderBy(col("file_id"))
  }

  /** The DuckDB mirror of [[zorder]]'s bit-interleave (oracle SQL). */
  def zorderOracleExpr: String = (0 until bits)
    .map(i => s"((((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1}))")
    .mkString(" + ")
}
