package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the derived synthetic supplement (Tables.partsupp /
  * Tables.lineitemShip) to its contract. The cross-engine half of the
  * lockstep (the DuckDB twin fragments computing the identical
  * multiset) is enforced by the hash gate itself — every r16 TPC-H
  * query over the supplement is oracle-checked end to end — so this
  * spec pins the SPARK side's formula against an independent row-wise
  * Scala recomputation plus the structural invariants the six queries
  * lean on.
  */
class PartsuppDerivationSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("partsupp: 4 rows per part, keys in range, bounded attributes") {
    val nParts = Tables.part(spark, sf).count()
    val nSupps = Tables.supplier(spark, sf).count()
    val ps = Tables.partsupp(spark, sf)
    assert(ps.count() === 4 * nParts)
    val bad = ps.where(col("ps_suppkey") < 0 || col("ps_suppkey") >= nSupps
      || col("ps_availqty") < 1 || col("ps_availqty") > 9999
      || col("ps_supplycost_c") < 100 || col("ps_supplycost_c") > 99999)
    assert(bad.count() === 0, "derived partsupp attribute out of range")
  }

  test("partsupp: formula matches an independent row-wise recomputation") {
    val s = Tables.supplier(spark, sf).count()
    val expected = Tables.part(spark, sf)
      .select("p_partkey").collect().map(_.getLong(0)).toSeq.flatMap { p =>
        (0L to 3L).map { i =>
          val supp = (p + i * (s / 4 + p / s)) % s
          (p, supp, 1 + (p * 47 + supp * 31) % 9999,
            100 + (p * 59 + supp * 97) % 99900)
        }
      }.sorted
    val actual = Tables.partsupp(spark, sf)
      .select("ps_partkey", "ps_suppkey", "ps_availqty", "ps_supplycost_c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(actual === expected)
  }

  test("partsupp derivation is narrow: no shuffle exchange in the plan") {
    val df = Tables.partsupp(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"derived partsupp shuffles — the supplement must stay in-row:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"supplier-count broadcast degenerated to a cartesian:\n$plan")
  }

  test("lineitemShip: derived columns obey their documented bands") {
    val ls = Tables.lineitemShip(spark, sf)
      .withColumn("ship_us", expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))"))
    val day = 86400000000L
    val bad = ls.where(
      col("l_receipt_us") < col("ship_us") + day
        || col("l_receipt_us") > col("ship_us") + lit(30L) * day
        || col("l_commit_us") < col("ship_us") - lit(15L) * day
        || col("l_commit_us") > col("ship_us") + lit(45L) * day)
    assert(bad.count() === 0, "derived ship columns out of band")
    val modes = ls.select("l_shipmode").distinct().collect()
      .map(_.getString(0)).toSet
    assert(modes.subsetOf(Set("AIR", "FOB", "MAIL", "RAIL", "REG AIR",
      "SHIP", "TRUCK")))
    assert(modes.size === 7, s"mode pick not exercising all 7: $modes")
    // Q12's band and Q21's late flag must both be non-degenerate
    val n = ls.count()
    val late = ls.where(col("l_receipt_us") > col("l_commit_us")).count()
    assert(late > 0 && late < n,
      s"late flag degenerate: $late of $n lines late")
  }
}
