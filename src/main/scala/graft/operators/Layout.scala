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
  /** The Morton bit-interleave as a Spark SQL expression over the
    * given column names — single source of truth for [[zorder]] and
    * [[pruneCompare]] (the DuckDB twin is [[zorderOracleExpr]]). */
  private def zExprFor(x: String, y: String): String = (0 until bits)
    .map(i => s"(shiftleft(shiftright($x, $i) & 1, ${2 * i}) + " +
      s"shiftleft(shiftright($y, $i) & 1, ${2 * i + 1}))")
    .mkString(" + ")

  def zorder(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = 1L << bits
    val zExpr = zExprFor("x", "y")
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

  /** One unrolled step of the standard Hilbert xy→d walk (Wikipedia's
    * `xy2d`, from Hilbert 1891 via Butz 1971): inspect bit `s` of each
    * coordinate (rx, ry), add `s²·((3·rx) xor ry)` to the distance,
    * then rotate/reflect the quadrant frame. The SAME template renders
    * the Spark and DuckDB step (only the xor spelling differs — `^` is
    * POWER in DuckDB), so the two engines run literally the same
    * arithmetic. Input/output columns: x, y, d. */
  private def hilbertStep(s: Long, xor: (String, String) => String)
      : (String, String, String) = {
    val rx = s"(CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)"
    (// new x: unrotated when ry=1; else reflect-swap
      s"CASE WHEN (y & $s) > 0 THEN x WHEN (x & $s) > 0 THEN ${s - 1} - y ELSE y END",
      s"CASE WHEN (y & $s) > 0 THEN y WHEN (x & $s) > 0 THEN ${s - 1} - x ELSE x END",
      s"d + ${s * s} * ${xor(s"(3 * $rx)", ry)}")
  }

  /** §2#154 HILBERT-curve clustering + skip index — the locality
    * upgrade over [[zorder]] (what Delta OPTIMIZE ... ZORDER actually
    * moved to): the Hilbert walk visits every cell of the x×y grid in
    * a path where CONSECUTIVE distances are always ADJACENT cells
    * (Morton's curve jumps across the plane at power-of-two seams), so
    * a contiguous d-range — one "file" — covers one compact blob
    * instead of up to four disjoint tiles, tightening per-file min/max
    * spans and therefore pruning. Same contract as zorder: assign each
    * row its curve distance, cut equal-d-range files, emit per-file
    * per-dim min/max — the stats a lakehouse planner prunes on.
    *
    * Shape: the walk is `bits` UNROLLED integer steps (pure
    * CASE/AND/XOR arithmetic — one codegen'd projection, no UDF, no
    * loop state outside the row); at production scale file assignment
    * is `repartitionByRange(d)` + write (one range shuffle, no global
    * sort) and the stats agg map-side combines to 2^fileBits rows. */
  def hilbert(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = 1L << bits
    val points = Tables.events(spark, sfDir)
      .select(expr(s"pmod(user_id, $dim)").as("x"),
        expr(s"pmod(unix_micros(date_trunc('hour', ts)) div 3600000000, $dim)").as("y"))
    hilbertIndex(points)
      .withColumn("file_id", expr(s"d div ${1L << (2 * bits - fileBits)}"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n"),
        min(col("x0")).as("x_lo"), max(col("x0")).as("x_hi"),
        min(col("y0")).as("y_lo"), max(col("y0")).as("y_hi"),
        min(col("d")).as("d_lo"), max(col("d")).as("d_hi"))
      .orderBy(col("file_id"))
  }

  /** The unrolled Hilbert walk over any (x, y) frame with coordinates
    * in [0, 2^bits): emits (x0, y0, d). One codegen'd projection chain
    * — package-visible so specs can pin it against a driver-side
    * reference xy2d. */
  private[graft] def hilbertIndex(points: DataFrame): DataFrame = {
    var df = points.select(col("x").as("x0"), col("y").as("y0"),
      col("x"), col("y"), lit(0L).as("d"))
    for (k <- (0 until bits).reverse) {
      val (nx, ny, nd) = hilbertStep(1L << k, (a, b) => s"($a ^ $b)")
      df = df.select(col("x0"), col("y0"),
        expr(nx).as("x"), expr(ny).as("y"), expr(nd).as("d"))
    }
    df.select(col("x0"), col("y0"), col("d"))
  }

  /** The DuckDB mirror of [[hilbert]]: the same unrolled steps as
    * chained CTEs (h1..h`bits`), xor spelled `xor()` because `^` is
    * power in DuckDB. Base CTE must provide (x0, y0, x, y, d). */
  def hilbertOracleCtes(base: String): String = {
    val steps = (0 until bits).reverse.zipWithIndex.map { case (k, i) =>
      val (nx, ny, nd) = hilbertStep(1L << k, (a, b) => s"xor($a, $b)")
      s"h${i + 1} AS (SELECT x0, y0, $nx AS x, $ny AS y, $nd AS d FROM h$i)"
    }
    s"h0 AS ($base),\n" + steps.mkString(",\n")
  }

  private[operators] val hilbertBits = bits
  private[operators] val hilbertFileBits = fileBits

  /** The fixed probe workload for [[pruneCompare]]: 16 single-dim
    * range predicates per dimension (width 64 of the 1024-wide
    * domain) and 8 two-dim boxes (width 128) along the diagonal —
    * (kind, probe_id, x_lo, x_hi, y_lo, y_hi) with −1/2^bits for an
    * unconstrained dimension. Literal constants, identical in the
    * oracle. */
  private[graft] val probes: Seq[(String, Long, Long, Long, Long, Long)] = {
    val dim = 1L << bits
    val xs = (0L until 16L).map(i =>
      ("x", i, 64 * i, 64 * i + 63, -1L, dim))
    val ys = (0L until 16L).map(i =>
      ("y", i, -1L, dim, 64 * i, 64 * i + 63))
    val xy = (0L until 8L).map(i =>
      ("xy", i, 128 * i, 128 * i + 127, 128 * i, 128 * i + 127))
    xs ++ ys ++ xy
  }

  /** §2#234 ZONE-MAP PRUNING COMPARISON — the measurement that
    * justifies [[zorder]]/[[hilbert]] as operators: simulate the
    * min/max file-skipping a lakehouse scan planner performs, under
    * the SAME probe workload, for four physical layouts of the same
    * rows — sorted by x, sorted by y, Z-order, Hilbert — and report
    * files/rows scanned per probe. The output is the table a platform
    * team reads before choosing a table's OPTIMIZE clause: the
    * single-dim sorts prune their own dimension perfectly and the
    * other not at all; the space-filling curves bound BOTH dimensions
    * per file (≤ 128 of 1024 here), so every probe kind prunes ~⅞ of
    * files, with Hilbert's contiguous walk edging Morton's seam jumps
    * on the two-dim boxes.
    *
    * All four layouts assign files by VALUE range (x div 16, y div
    * 16, z div 2¹⁴, d div 2¹⁴) — the `repartitionByRange`-and-write
    * shape, one range shuffle, never a global row_number sort. Shape:
    * ONE scan of events computes all four file ids per row (the
    * curve arithmetic is codegen'd projections), a 4-way explode
    * carries only (layout, file_id, x, y), the stats agg map-side
    * combines to ≤ 4·64 rows, and the probe join runs on that tiny
    * frame (broadcast, 40 literal probes). A file is scanned iff its
    * [min,max] box intersects the probe on every constrained
    * dimension — exactly the zone-map test. */
  def pruneCompare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dim = 1L << bits
    val fileDiv = 1L << (2 * bits - fileBits)
    val zExpr = zExprFor("x0", "y0")
    val points = Tables.events(spark, sfDir)
      .select(expr(s"pmod(user_id, $dim)").as("x"),
        expr(s"pmod(unix_micros(date_trunc('hour', ts)) div 3600000000, $dim)").as("y"))
    val stats = hilbertIndex(points)
      .withColumn("z", expr(zExpr))
      .select(col("x0"), col("y0"), explode(expr(
        s"""array(named_struct('layout', 'x_sort', 'file_id', x0 div 16),
           |      named_struct('layout', 'y_sort', 'file_id', y0 div 16),
           |      named_struct('layout', 'zorder', 'file_id', z div $fileDiv),
           |      named_struct('layout', 'hilbert', 'file_id', d div $fileDiv))"""
          .stripMargin)).as("lf"))
      .select(col("lf.layout").as("layout"), col("lf.file_id").as("file_id"),
        col("x0"), col("y0"))
      .groupBy(col("layout"), col("file_id"))
      .agg(count(lit(1)).as("n"),
        min(col("x0")).as("x_lo"), max(col("x0")).as("x_hi"),
        min(col("y0")).as("y_lo"), max(col("y0")).as("y_hi"))
    val probeDf = probes.toDF("kind", "probe_id", "px_lo", "px_hi", "py_lo", "py_hi")
    stats.crossJoin(broadcast(probeDf))
      .withColumn("hit", when(
        col("x_lo") <= col("px_hi") && col("x_hi") >= col("px_lo")
          && col("y_lo") <= col("py_hi") && col("y_hi") >= col("py_lo"), 1L)
        .otherwise(0L))
      .groupBy(col("layout"), col("kind"), col("probe_id"))
      .agg(sum(col("hit")).as("files_scanned"),
        sum(col("hit") * col("n")).as("rows_scanned"),
        count(lit(1)).as("files_total"))
      .orderBy(col("layout"), col("kind"), col("probe_id"))
  }

  /** The DuckDB mirror of [[pruneCompare]]'s probe table (VALUES list). */
  def probesOracleValues: String = probes
    .map { case (k, i, xl, xh, yl, yh) => s"('$k', $i, $xl, $xh, $yl, $yh)" }
    .mkString(", ")
}
