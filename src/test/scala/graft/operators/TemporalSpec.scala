package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions.{approx_count_distinct, col, countDistinct}

class TemporalSpec extends SparkSuite {

  test("asof join: every matched click is strictly before its purchase") {
    val rows = Temporal.asofJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(4) < r.getLong(2))) // click_us < purchase_us
    assert(rows.forall(_.getLong(5) > 0L))                // gap_us positive
  }

  test("asof native == asof window formulation on the real frame") {
    val window = Temporal.asofJoin(spark, sf).collect().map(_.toSeq).toSeq
    val native = Temporal.asofNative(spark, sf).collect().map(_.toSeq).toSeq
    assert(native === window)
  }

  test("property: native asof merge == driver recompute on randomized frames") {
    import spark.implicits._
    // adversarial shapes: shared timestamps (tiny time domain), keys
    // with only-left / only-right rows, bursts of rights between lefts
    val rnd = new scala.util.Random(0xA50F)
    val lefts = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val rights = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var id = 0L
    for (key <- 0L until 40L) {
      val nL = rnd.nextInt(6) // 0..5 left rows (0 = right-only key)
      val nR = rnd.nextInt(6)
      for (_ <- 0 until nL) { lefts += ((key, id, rnd.nextInt(8).toLong)); id += 1 }
      for (_ <- 0 until nR) { rights += ((key, id, rnd.nextInt(8).toLong)); id += 1 }
    }
    val got = graft.plans.AsOfJoin.ofDF(
        lefts.toSeq.toDF("k", "id", "t"), rights.toSeq.toDF("k", "id", "t"),
        Seq("k", "l_id", "l_t", "r_id", "r_t"))
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSet
    val expected = lefts.flatMap { case (k, lid, lt) =>
      val prior = rights.filter { case (rk, rid, rt) =>
        rk == k && (rt < lt || (rt == lt && rid < lid))
      }
      if (prior.isEmpty) None
      else {
        val (_, rid, rt) = prior.maxBy { case (_, rid, rt) => (rt, rid) }
        Some((lid, rid, rt))
      }
    }.toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("property: LEFT OUTER asof == inner rows + NULL-matched leftovers") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x0B0E)
    val lefts = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val rights = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var id = 0L
    for (key <- 0L until 40L) {
      for (_ <- 0 until rnd.nextInt(6)) {
        lefts += ((key, id, rnd.nextInt(8).toLong)); id += 1 }
      for (_ <- 0 until rnd.nextInt(6)) {
        rights += ((key, id, rnd.nextInt(8).toLong)); id += 1 }
    }
    def run(outer: Boolean) = graft.plans.AsOfJoin.ofDF(
        lefts.toSeq.toDF("k", "id", "t"), rights.toSeq.toDF("k", "id", "t"),
        Seq("k", "l_id", "l_t", "r_id", "r_t"), outer = outer)
      .collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toSet
    val inner = run(outer = false)
    val outer = run(outer = true)
    // every left row appears exactly once in the outer result
    assert(outer.map(_._1) === lefts.map(_._2).toSet)
    // matched rows identical to inner; the rest are the NULL leftovers
    assert(outer.filter(_._2.isDefined) === inner)
    assert(outer.filter(_._2.isEmpty).map(_._1) ===
      (lefts.map(_._2).toSet -- inner.map(_._1)))
    assert(inner.nonEmpty && outer.size > inner.size)
  }

  test("native asof drops null keys like a SQL equi-join") {
    import spark.implicits._
    val lefts = Seq((Some(1L), 10L, 5L), (None, 11L, 5L))
      .toDF("k", "id", "t").select(col("k").cast("long").as("k"), col("id"), col("t"))
    val rights = Seq((Some(1L), 20L, 1L), (None, 21L, 1L))
      .toDF("k", "id", "t").select(col("k").cast("long").as("k"), col("id"), col("t"))
    val got = graft.plans.AsOfJoin.ofDF(lefts, rights,
      Seq("k", "l_id", "l_t", "r_id", "r_t")).collect()
    // only the non-null key matches; the null-key rows vanish entirely
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq ===
      Seq((1L, 10L, 20L)))
  }

  test("range join: all pairs within the 5-minute window, ids ordered") {
    val rows = Temporal.rangeJoin(spark, sf).collect()
    assert(rows.forall(r => r.getLong(3) <= 300000000L))
    assert(rows.forall(r => r.getLong(1) < r.getLong(2)))
    // no duplicate pairs from the bucket fanout
    val pairs = rows.map(r => (r.getLong(1), r.getLong(2)))
    assert(pairs.distinct.length === pairs.length)
  }

  test("approx distinct stays within the configured 2% rsd (loose 10% bound)") {
    // the gated output carries exacts + the est_ok bit; the raw
    // estimate's error bound is asserted here against a direct
    // recompute with the same rsd
    val rows = Analytics.qApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) === 1L, s"${r.getString(0)}: est_ok=0")
    }
    val raw = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .collect()
    assert(raw.nonEmpty)
    raw.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("quantiles are ordered p50 <= p90 and positive") {
    val rows = Analytics.qQuantiles(spark, sf).collect()
    assert(rows.length === 3)
    assert(rows.forall(r => r.getLong(1) > 0 && r.getLong(1) <= r.getLong(2)))
  }

  test("asof nearest: no same-user click is closer than the reported match") {
    import org.apache.spark.sql.functions._
    val clicks = graft.Tables.events(spark, sf)
      .where(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSeq).toMap
    val rows = Temporal.asofNearest(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (user, pUs) = (r.getLong(0), r.getLong(2))
      val (cid, cUs, gap, dir) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6))
      assert(gap === math.abs(pUs - cUs))
      // a same-instant click can sit in either frame (row order at
      // equal us is by event_id), so the implication is one-way
      if (dir == "backward") assert(cUs <= pUs) else assert(cUs >= pUs)
      // minimality: every other click of this user is at least as far
      val userClicks = clicks(user)
      assert(userClicks.exists(_._1 == cid))
      assert(userClicks.forall { case (_, us) => math.abs(us - pUs) >= gap },
        s"purchase ${r.getLong(1)}: a closer click than $cid exists")
    }
    // every purchase of a user with ≥1 click is matched
    val nPurch = graft.Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .join(graft.Tables.events(spark, sf)
        .where(col("event_type") === "click")
        .select(col("user_id")).distinct(), Seq("user_id"), "left_semi")
      .count()
    assert(rows.length.toLong === nPurch)
  }
}
