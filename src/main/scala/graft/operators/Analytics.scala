package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Fns._

/** Analytics core — the batch query engine the CDC pipeline feeds.
  * All money measures are per-row integer cents summed as BIGINT
  * (deterministic + partial-agg friendly); dimension joins broadcast.
  */
object Analytics {

  /** §2#17 TPC-H Q1-style pricing summary. Pure group-agg: map-side
    * partial aggregation, one shuffle of ~|groups| rows. */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
    li.select(
        col("l_returnflag"), col("l_linestatus"),
        cents(col("l_quantity")).as("qty_c"),
        cents(col("l_extendedprice")).as("price_c"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("disc_price_c"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("charge_c"),
        cents(col("l_discount")).as("disc_c"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("qty_c")).as("sum_qty_c"),
        sum(col("price_c")).as("sum_base_price_c"),
        sum(col("disc_price_c")).as("sum_disc_price_c"),
        sum(col("charge_c")).as("sum_charge_c"),
        round(sum(col("qty_c")) / count(lit(1))).cast("long").as("avg_qty_c"),
        round(sum(col("price_c")) / count(lit(1))).cast("long").as("avg_price_c"),
        round(sum(col("disc_c")) / count(lit(1))).cast("long").as("avg_disc_c"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** §2#18 TPC-H Q3-style: segment customers ⋈ orders ⋈ lineitem,
    * top-10 orders by revenue. customer is a dim → broadcast; the
    * orders⋈lineitem join shuffles on orderkey (co-partitioned). */
  def q3JoinTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
    val cust = Tables.customer(spark, sfDir)
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ord = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_c"))
    li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(col("rev_c")).as("revenue_c"))
      .select(col("l_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("revenue_c"))
      .orderBy(col("revenue_c").desc, col("l_orderkey"))
      .limit(10)
  }

  /** §2#19 TPC-H Q5-style 6-table star join: revenue by nation for two
    * regions. region/nation/supplier/customer all broadcast — only the
    * orders⋈lineitem join shuffles. */
  def q5MultiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val reg = Tables.region(spark, sfDir)
      .where(col("r_name").isin("ASIA", "EUROPE"))
    val nat = Tables.nation(spark, sfDir)
    val sup = Tables.supplier(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
             col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, sfDir).select(
      col("l_orderkey"), col("l_suppkey"),
      cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_c"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev_c")).as("revenue_c"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue_c").desc, col("n_name"))
  }

  /** §2#20 top-3 parts per supplier by revenue (partitioned window). */
  def qWindowTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val byPart = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_partkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_c"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("rev_c")).as("revenue_c"))
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("revenue_c").desc, col("l_partkey"))
    byPart.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select(col("l_suppkey"), col("l_partkey"), col("revenue_c"), col("rk"))
      .orderBy(col("l_suppkey"), col("rk"))
  }

  /** §2#49 q_window_topk through the NATIVE TopKPerKey operator
    * (LogicalPlan + Strategy + bounded-buffer SparkPlan — no full
    * per-key sort). Same semantics and oracle as q_window_topk. */
  def qTopkNative(spark: SparkSession, sfDir: String): DataFrame = {
    val byPart = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_partkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_c"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("rev_c")).as("revenue_c"))
    graft.plans.TopKPerKey.ofDF(byPart, Seq("l_suppkey"), "revenue_c", "l_partkey", 3)
      .orderBy(col("l_suppkey"), col("rk"))
  }

  /** §2#21 ROLLUP over returnflag/linestatus (hierarchical subtotals).
    * NULL group markers coalesced to 'ALL' so cross-engine ordering of
    * NULLs never matters. */
  def qRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"),
        cents(col("l_quantity")).as("qty_c"),
        cents(col("l_extendedprice")).as("price_c"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("qty_c")).as("sum_qty_c"),
        sum(col("price_c")).as("sum_price_c"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty_c"), col("sum_price_c"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** §2#81 CUBE aggregate — all 4 grouping sets of
    * (returnflag, linestatus) in one pass (vs ROLLUP's 3 in [[qRollup]]):
    * Catalyst expands the grouping sets BEFORE the exchange, so partial
    * aggregation still combines map-side and the shuffle carries one
    * partial row per (set, key) — not one pass over the fact table per
    * set. Grouping-NULL markers are coalesced to 'ALL' (NULL sort order
    * differs across engines). */
  def qCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"),
        cents(col("l_quantity")).as("qty_c"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("qty_c")).as("sum_qty_c"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty_c"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** §2#134 deterministic MODE: the most frequent value-cents per
    * event_type, ties broken toward the SMALLEST value — `mode()` with
    * a pinned tiebreak, since the engine refuses
    * partitioning-dependent answers (Spark's own `mode` is
    * non-deterministic under ties). Two map-side-combinable aggregates
    * ((type, value) counts, then `max_by` over (count, −value)); the
    * second agg's input is |types|×|values| rows, never the corpus. */
  def qMode(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"), cents(col("value")).as("v_c"))
      .groupBy(col("event_type"), col("v_c"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(
        max_by(col("v_c"), struct(col("n"), (-col("v_c")).as("neg"))).as("mode_c"),
        max(col("n")).as("mode_n"))
      .orderBy(col("event_type"))

  /** §2#127 explicit GROUPING SETS — the general form ROLLUP/CUBE
    * specialize: exactly the requested set list ((flag), (status), ()),
    * none of CUBE's unwanted cross terms. `grouping()` disambiguates a
    * real NULL group key from a rolled-up one; the composite
    * `grouping(a)·2 + grouping(b)` id is spelled out (not engine
    * grouping_id()) so the column is bit-identical across engines.
    * Like rollup/cube, the sets expand BEFORE the exchange, so partial
    * aggregation still combines map-side — one shuffle for all three
    * groupings of the corpus. */
  def qGroupingSets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"),
        cents(col("l_quantity")).as("qty_c"))
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg((grouping(col("l_returnflag")) * lit(2) +
          grouping(col("l_linestatus"))).cast("long").as("gid"),
        sum(col("qty_c")).as("sum_qty_c"), count(lit(1)).as("n"))
      .select(col("gid"),
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty_c"), col("n"))
      .orderBy(col("gid"), col("returnflag"), col("linestatus"))

  /** §2#22 pivot-style conditional aggregation: per-user event-type
    * profile (single shuffle; conditional aggs are map-side partial). */
  def qConditionalPivot(spark: SparkSession, sfDir: String): DataFrame = {
    def n(t: String) = sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), cents(col("value")).as("value_c"))
      .groupBy(col("user_id"))
      .agg(n("click"), n("view"), n("signup"), n("error"),
        sum(when(col("event_type") === "purchase", col("value_c")).otherwise(0L))
          .as("purchase_cents"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** §2#40 exact interpolated quantiles (p50/p90 of extendedprice per
    * returnflag) via the exact `percentile` aggregate — emitted as
    * rounded cents.
    *
    * SCALE CAVEAT: `percentile` buffers every value of a group on one
    * reducer (unbounded per-group state) — exact-correct and
    * oracle-checkable, but a scale-killer when a single group holds
    * billions of rows. At 100 TB use `qQuantilesApprox` below: the
    * t-digest-style `approx_percentile` sketch is constant-memory per
    * group and mergeable map-side. */
  def qQuantiles(spark: SparkSession, sfDir: String): DataFrame =
    quantilesExactOf(Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("grp"), col("l_extendedprice").as("v")))

  /** Exact `percentile` p50/p90 of `v` per `grp` (see [[qQuantiles]]).
    * Generic over any (grp, v) frame so the property spec can feed
    * randomized inputs through the SAME code path as the driver query. */
  def quantilesExactOf(gv: DataFrame): DataFrame =
    gv.groupBy(col("grp"))
      .agg(
        round(call_function("percentile", col("v"), lit(0.5)) * 100)
          .cast("long").as("p50_price_c"),
        round(call_function("percentile", col("v"), lit(0.9)) * 100)
          .cast("long").as("p90_price_c"),
        count(lit(1)).as("n"))
      .select(col("grp").as("l_returnflag"), col("p50_price_c"),
        col("p90_price_c"), col("n"))
      .orderBy(col("l_returnflag"))

  /** §2#63 EXACT quantiles, distributed: compact values into a
    * per-group histogram first (`groupBy(group, value).count()` — a
    * partial-agg-friendly hash aggregate over the full data), then rank
    * over the COMPACTED histogram (cumulative counts) and interpolate
    * exactly like `percentile` (lower + (higher−lower)·frac, same
    * association → same bits). Per-reducer state is the number of
    * DISTINCT values per group, not the number of rows — for 2-decimal
    * prices that's bounded by the value domain, so a 100 TB group with
    * billions of rows compacts to at most a few million histogram rows.
    * Same oracle as q_quantiles (it computes the same number). */
  def qQuantilesSortRank(spark: SparkSession, sfDir: String): DataFrame =
    quantilesSortRankOf(Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("grp"), col("l_extendedprice").as("v")))

  /** Histogram-compaction exact quantiles (see [[qQuantilesSortRank]]),
    * generic over any (grp, v) frame. */
  def quantilesSortRankOf(gv: DataFrame): DataFrame = {
    val hist = gv.select(col("grp").as("l_returnflag"), col("v"))
      .groupBy(col("l_returnflag"), col("v")).agg(count(lit(1)).as("cnt"))
    val byFlag = Window.partitionBy(col("l_returnflag"))
    val ranked = hist
      .withColumn("cum", sum(col("cnt")).over(byFlag.orderBy(col("v"))))
      .withColumn("n", sum(col("cnt")).over(byFlag))
    // 1-based rank of the lower interpolation neighbor for quantile q
    def loRank(q: Double): Column =
      floor((col("n") - lit(1)) * lit(q)).cast("long") + lit(1)
    // smallest value whose cumulative count reaches `rank`
    def valueAt(rank: Column): Column = min(when(col("cum") >= rank, col("v")))
    def interp(q: Double, loC: Column, hiC: Column, nC: Column): Column = {
      val pos = (nC - lit(1)) * lit(q)
      val frac = pos - floor(pos)
      loC + (coalesce(hiC, loC) - loC) * frac
    }
    ranked.groupBy(col("l_returnflag"))
      .agg(
        valueAt(loRank(0.5)).as("lo50"), valueAt(loRank(0.5) + 1).as("hi50"),
        valueAt(loRank(0.9)).as("lo90"), valueAt(loRank(0.9) + 1).as("hi90"),
        sum(col("cnt")).as("n"))
      .select(col("l_returnflag"),
        round(interp(0.5, col("lo50"), col("hi50"), col("n")) * 100)
          .cast("long").as("p50_price_c"),
        round(interp(0.9, col("lo90"), col("hi90"), col("n")) * 100)
          .cast("long").as("p90_price_c"),
        col("n"))
      .orderBy(col("l_returnflag"))
  }

  /** §2#60 the 100 TB twin of qQuantiles: `approx_percentile` with
    * accuracy 10000 (error <= 0.01% of rank). Constant-memory sketch per
    * group, partial-agg mergeable — per-group state no longer scales
    * with group size. The sketch values are engine-specific, so the sql
    * gate carries the exact count bit-exact plus p50_ok/p90_ok accuracy
    * bits (estimate within ±1% of the EXACT percentile, itself computed
    * in-plan by the scalable histogram-compaction path — a ~100×-wide
    * band over the sketch's rank-error guarantee on this value
    * distribution); the spec still asserts the tight bound on raw
    * values. */
  def qQuantilesApprox(spark: SparkSession, sfDir: String): DataFrame = {
    // COST NOTE (ADVICE r11): the oracle-gated ok-bits require the
    // exact quantiles, so this op's bench number deliberately includes
    // one qQuantilesSortRank pass — it measures "sketch + the check",
    // not the sketch alone (the sketch-alone cost is the gap to
    // q_quantiles_sortrank in the same bench). The ±1% band is a gate
    // on THIS distribution; the distribution-free guarantee is the
    // sketch's rank-error bound, asserted in OperatorSpec where
    // partitioning is pinned.
    val approx = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      // ONE sketch per group serving both percentiles — two separate
      // approx_percentile agg expressions would each build their own
      // identical digest (2× the aggregation work for the same answer)
      .agg(
        approx_percentile(col("l_extendedprice"),
          array(lit(0.5), lit(0.9)), lit(10000)).as("pcts"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        round(element_at(col("pcts"), 1) * 100).cast("long").as("ap50"),
        round(element_at(col("pcts"), 2) * 100).cast("long").as("ap90"),
        col("n"))
    val exact = qQuantilesSortRank(spark, sfDir)
      .select(col("l_returnflag"), col("p50_price_c").as("ep50"),
        col("p90_price_c").as("ep90"))
    def ok(a: Column, e: Column) =
      when(abs(a - e) * lit(1000L) <= lit(10L) * e, 1L).otherwise(0L)
    approx.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("n"),
        ok(col("ap50"), col("ep50")).as("p50_ok"),
        ok(col("ap90"), col("ep90")).as("p90_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** §2#41 sketch aggregate: HyperLogLog++ approximate distinct users
    * per event_type next to the exact count. The sketch estimate is
    * engine-specific by construction, so it enters the sql gate as the
    * est_ok accuracy bit (|est−exact| ≤ 10%·exact — a ≥5σ band at
    * rsd 0.02, deterministic because HLL unions are order-insensitive)
    * while the exact companions hash bit-exact; the spec still asserts
    * the tight relative error bound on the raw estimate. */
  def qApproxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("exact_users"), col("n_events"),
        when(abs(col("approx_users") - col("exact_users")) * lit(1000L)
          <= lit(100L) * col("exact_users"), 1L).otherwise(0L).as("est_ok"))
      .orderBy(col("event_type"))

  /** §2#53 custom sketch aggregate: top-5 distinct prices per group via
    * the TopKDistinctLongs TypedImperativeAggregate (bounded TreeSet
    * buffer — constant memory per group, partial-agg friendly; a
    * collect_set would ship every distinct value). */
  def qTopkValuesAgg(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.Registry.ensure(spark)
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), cents(col("l_extendedprice")).as("price_c"))
      .groupBy(col("l_returnflag"))
      .agg(
        call_function("graft_topk_vals", col("price_c"), lit(5)).as("top5_price_c"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** §2#56 funnel analysis: ordered signup → click → purchase per user
    * (each stage strictly after the previous user's stage time).
    * Sequential-pattern matching as three stage-joins — each stage
    * frame is one row per qualifying user. */
  def qFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    // stage frames are one row per funnel USER — unbounded at scale, so
    // no broadcast hints: the joins are equi-joins on user_id (the range
    // predicate rides along as a join condition), AQE broadcasts only
    // when a stage actually fits.
    val s1 = e.where(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("signup_us"))
    val s2 = e.where(col("event_type") === "click").as("e")
      .join(s1.as("s1"),
        col("e.user_id") === col("s1.user_id") && col("e.us") > col("s1.signup_us"))
      .groupBy(col("e.user_id")).agg(min(col("e.us")).as("click_us"))
    val s3 = e.where(col("event_type") === "purchase").as("e")
      .join(s2.as("s2"),
        col("e.user_id") === col("s2.user_id") && col("e.us") > col("s2.click_us"))
      .groupBy(col("e.user_id")).agg(min(col("e.us")).as("purchase_us"))
    s1.agg(count(lit(1)).as("n_signup"))
      .crossJoin(s2.agg(count(lit(1)).as("n_signup_click")))
      .crossJoin(s3.agg(count(lit(1)).as("n_full_funnel")))
  }

  /** §2#91 funnel conversion rates — [[qFunnel]]'s counts turned into
    * the per-stage per-mille conversions an analyst actually reads.
    * Integer `div` on the counts (never a float ratio), one row out. */
  def qFunnelConversion(spark: SparkSession, sfDir: String): DataFrame =
    qFunnel(spark, sfDir)
      .select(col("n_signup"), col("n_signup_click"), col("n_full_funnel"),
        expr("n_signup_click * 1000 div n_signup").as("click_conv_pm"),
        expr("n_full_funnel * 1000 div greatest(n_signup_click, 1)")
          .as("purchase_conv_pm"),
        expr("n_full_funnel * 1000 div n_signup").as("overall_conv_pm"))

  /** §2#195 WINDOWED strict-order funnel — [[qFunnel]] with a
    * per-step deadline (ClickHouse's windowFunnel family): each stage
    * must land within `windowUs` of the PREVIOUS stage's match, so
    * "signed up, clicked within a day, purchased within a day of the
    * click" — the product-analytics form, where an unbounded funnel
    * over-counts dead journeys. Matching is the GREEDY earliest chain
    * (each stage takes its first qualifying event), the deterministic
    * dashboard contract; a maximal matcher (any chain satisfying the
    * windows) needs a per-user sequence scan and reports ≥ these
    * counts — the conservative direction for conversion reporting.
    * Same scale shape as [[qFunnel]]: per-stage equi-joins on user_id
    * with the window riding as a join condition, no broadcast
    * mandates, three one-row aggregates. */
  def qFunnelWindowed(spark: SparkSession, sfDir: String,
      windowUs: Long = 86400000000L): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val s1 = e.where(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("signup_us"))
    val s2 = e.where(col("event_type") === "click").as("e")
      .join(s1.as("s1"),
        col("e.user_id") === col("s1.user_id") &&
          col("e.us") > col("s1.signup_us") &&
          col("e.us") <= col("s1.signup_us") + windowUs)
      .groupBy(col("e.user_id")).agg(min(col("e.us")).as("click_us"))
    val s3 = e.where(col("event_type") === "purchase").as("e")
      .join(s2.as("s2"),
        col("e.user_id") === col("s2.user_id") &&
          col("e.us") > col("s2.click_us") &&
          col("e.us") <= col("s2.click_us") + windowUs)
      .groupBy(col("e.user_id")).agg(min(col("e.us")).as("purchase_us"))
    s1.agg(count(lit(1)).as("n_signup"))
      .crossJoin(s2.agg(count(lit(1)).as("n_click_in_window")))
      .crossJoin(s3.agg(count(lit(1)).as("n_purchase_in_window")))
      .select(col("n_signup"), col("n_click_in_window"),
        col("n_purchase_in_window"),
        expr("n_click_in_window * 1000 div n_signup").as("click_conv_pm"),
        expr("n_purchase_in_window * 1000 div greatest(n_click_in_window, 1)")
          .as("purchase_conv_pm"))
  }

  /** §2#92 sequence-length histogram — the token-count distribution
    * report every training-data pipeline emits before packing (it sets
    * context-length and truncation policy). Power-of-two buckets via
    * integer arithmetic; one map-side-combined aggregate. */
  def textSeqlenHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documentsPar(spark, sfDir)
      .select(size(graft.functions.Fns.tokens(col("text"))).cast("long").as("n"))
      .select(
        // bucket = floor(log2(n)) via the binary-digit count of n
        // (n >= 1 always: the tokenizer emits [""] for empty text) —
        // pure integer/string ops, no float log that could flip a
        // boundary doc across engines
        (length(bin(col("n"))) - lit(1)).cast("long").as("log2_bucket"),
        col("n"))
      .groupBy(col("log2_bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("total_tokens"),
        min(col("n")).as("min_tokens"), max(col("n")).as("max_tokens"))
      .orderBy(col("log2_bucket"))

  /** §2#57 fixed-bucket value histogram per event_type (bucket width 50,
    * capped at bucket 9) — pure arithmetic bucketing, one shuffle. */
  def qHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        least(floor(col("value") / 50).cast("long"), lit(9L)).as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bucket"))

  /** §2#50 salted two-phase aggregation: the skew-mitigation pattern.
    * Phase 1 aggregates by (key, salt) — hot keys spread across 16
    * reducers — phase 2 merges salt partials per key. Results are
    * identical to the direct groupBy (the oracle is the plain GROUP BY);
    * on skewed 100 TB keys this is the difference between one stuck
    * reducer and an even shuffle. */
  def qSaltedAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"), cents(col("value")).as("value_c"),
        pmod(col("event_id"), lit(16L)).as("salt"))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value_c")).as("psum"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), sum(col("psum")).as("sum_value_c"))
      .orderBy(col("event_type"))

  /** §2#76 salted JOIN — the join-side twin of [[qSaltedAgg]]. events
    * joins an event_type dim table, but event_type has ~4 values, so a
    * plain shuffle join lands the whole fact table on 4 reducers. Salt
    * the fact side with pmod(event_id, 16) and REPLICATE each dim row
    * across all 16 salts; joining on (key, salt) spreads every hot key
    * over 16 reducers. The shuffle_hash hint forces the shuffle-join
    * shape the pattern exists for (AQE would otherwise broadcast this
    * demo-sized dim — at 100 TB the dim side can be too big to
    * broadcast yet still skew-joined). Result ≡ the plain join, which
    * is what the oracle checks. */
  def qSkewJoinSalted(spark: SparkSession, sfDir: String): DataFrame = {
    val nSalts = 16
    val dim = Tables.events(spark, sfDir)
      .select(col("event_type")).distinct()
      .withColumn("type_weight", length(col("event_type")).cast("long"))
      .withColumn("salt", explode(array((0 until nSalts).map(s => lit(s.toLong)): _*)))
    val fact = Tables.events(spark, sfDir)
      .select(col("event_type"), cents(col("value")).as("value_c"),
        pmod(col("event_id"), lit(nSalts.toLong)).as("salt"))
    fact.hint("shuffle_hash")
      .join(dim, Seq("event_type", "salt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value_c") * col("type_weight")).as("weighted_cents"))
      .orderBy(col("event_type"))
  }

  /** §2#93 correlated EXISTS subquery (TPC-H Q4 shape): orders from
    * 1996 with at least one lineitem shipped more than 90 days after
    * the order date, counted per priority. Expressed as SQL `EXISTS` on
    * purpose — Catalyst decorrelates it into a left-semi hash join on
    * l_orderkey (the date predicate rides along as join condition), so
    * the physical plan is the same one-shuffle semi join you would hand
    * write, with no per-row subquery execution anywhere. */
  def qExistsSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("g_ex_orders")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("g_ex_lineitem")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM g_ex_orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM g_ex_lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** §2#94 correlated SCALAR subqueries (TPC-H Q17 shape): lineitems
    * whose quantity is below 20% of their part's average quantity, for
    * three brands. The avg threshold is spelled as two correlated
    * scalar subqueries (count + sum) compared by integer
    * cross-multiplication — `5·qty_c·n < sum_c` — so the verdict can't
    * flip on float rounding in either engine. Catalyst decorrelates
    * both subqueries into ONE re-used aggregate joined on l_partkey. */
  def qScalarSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("g_sc_lineitem")
    Tables.part(spark, sfDir).createOrReplaceTempView("g_sc_part")
    spark.sql(
      """SELECT p.p_brand, count(*) AS n_small,
        |  sum(CAST(round(l1.l_extendedprice*100, 0) AS BIGINT)) AS sum_price_c
        |FROM g_sc_lineitem l1 JOIN g_sc_part p ON p.p_partkey = l1.l_partkey
        |WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |  AND CAST(round(l1.l_quantity*100, 0) AS BIGINT) * 5 *
        |      (SELECT count(*) FROM g_sc_lineitem l2
        |       WHERE l2.l_partkey = l1.l_partkey)
        |    < (SELECT sum(CAST(round(l3.l_quantity*100, 0) AS BIGINT))
        |       FROM g_sc_lineitem l3 WHERE l3.l_partkey = l1.l_partkey)
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin)
  }

  /** Exact per-group median of a LONG column, distributed: histogram
    * compaction (`groupBy(grp, v).count` — partial-agg hash aggregate)
    * + rank interpolation over the COMPACTED histogram, the
    * [[quantilesSortRankOf]] method specialized to q=0.5. Bit-equal to
    * `round(percentile(v, 0.5))` (same lower+(higher−lower)·frac
    * association; frac ∈ {0, 0.5} and long midpoints are exact in
    * double below 2^52) — WITHOUT buffering whole groups on a reducer:
    * per-reducer state is distinct values per group, bounded by the
    * value domain, not the row count. Input columns (grp, v). */
  private[operators] def medianOfLongs(gv: DataFrame): DataFrame =
    medianOfHist(gv.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("cnt")))

  /** [[medianOfLongs]] over an ALREADY-COMPACTED (grp, v, cnt)
    * histogram — callers that need the histogram for more than the
    * median (q_robust_stats' outlier count) build it once and reuse
    * it (r17). */
  private[operators] def medianOfHist(hist: DataFrame): DataFrame = {
    val byG = Window.partitionBy(col("grp"))
    val ranked = hist
      .withColumn("cum", sum(col("cnt")).over(byG.orderBy(col("v"))))
      .withColumn("n", sum(col("cnt")).over(byG))
    val loRank = floor((col("n") - lit(1)) * lit(0.5)).cast("long") + lit(1)
    ranked.groupBy(col("grp"))
      .agg(min(when(col("cum") >= loRank, col("v"))).as("lo"),
        min(when(col("cum") >= loRank + 1, col("v"))).as("hi"),
        sum(col("cnt")).as("n"))
      .select(col("grp"),
        round(col("lo") +
          (coalesce(col("hi"), col("lo")) - col("lo")) *
            ((col("n") - lit(1)) * lit(0.5) -
              floor((col("n") - lit(1)) * lit(0.5))))
          .cast("long").as("median_c"))
  }

  /** §2#114 robust statistics — median absolute deviation and MAD-based
    * outlier counts per group, the data-cleaning staple that survives
    * what mean/stddev can't (a single corrupt 1e9 row drags a mean
    * arbitrarily; the median doesn't move). Three aggregate passes
    * (median → MAD → outlier count), each joined back via the
    * broadcast-tiny per-group stats frame; all comparisons in integer
    * cents with an integer 5×MAD outlier fence (the float 1.4826·3
    * consistency fence would flip verdicts between engines on ties).
    * Both medians run on [[medianOfLongs]]'s histogram compaction (r6:
    * previously exact `percentile`, which buffers every group row in
    * one reducer's ObjectHashAggregate — the one whole-group buffer
    * left in the sql suite; now per-reducer state is the distinct
    * cents domain, and the result is bit-identical). */
  def qRobustStats(spark: SparkSession, sfDir: String): DataFrame = {
    val x = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("grp"), cents(col("l_extendedprice")).as("x_c"))
    // ONE fact scan total (r18, verdict #9; guide §2.4): the compacted
    // (grp, x_c, cnt) VALUE histogram is cut once and everything
    // downstream — the value median, the DEVIATION histogram (dev =
    // |v − med| re-keyed with counts summed: the same multiset of
    // deviations the r17 per-row rejoin produced by re-scanning
    // lineitem a second time), the MAD median, and the outlier
    // roll-up — is histogram-sized arithmetic over its checkpoint
    // blocks. Exact integers throughout: n = Σcnt, outliers = Σcnt
    // over dev > 5·MAD — bit-identical to the per-row form.
    val xHist = x.select(col("grp"), col("x_c").as("v"))
      .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("cnt"))
      .transform(graft.Checkpoints.cut)
    val med = medianOfHist(xHist)
    val devHist = xHist.join(broadcast(med), "grp")
      .select(col("grp"), col("median_c"),
        abs(col("v") - col("median_c")).as("v"), col("cnt"))
      .groupBy(col("grp"), col("median_c"), col("v"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = medianOfHist(devHist.select(col("grp"), col("v"), col("cnt")))
      .withColumnRenamed("median_c", "mad_c")
    devHist.join(broadcast(mad), Seq("grp"))
      .groupBy(col("grp").as("l_returnflag"), col("median_c"), col("mad_c"))
      .agg(sum(col("cnt")).as("n"),
        sum(when(col("v") > lit(5L) * col("mad_c"), col("cnt")).otherwise(0L))
          .as("n_outliers"))
      .orderBy(col("l_returnflag"))
  }

  /** §2#113 mergeable HLL sketches (Apache DataSketches surface, Spark
    * 3.5+): per-type HLL sketches of distinct users, plus a TOTAL row
    * whose estimate comes from `hll_union_agg` MERGING the per-type
    * sketches — the operation a 1000-executor rollup actually needs
    * (re-aggregating exact distincts across groups requires a second
    * full shuffle of raw ids; unioning sketches ships a few KiB per
    * group). Exact counts hash bit-exact in the sql gate; the
    * engine-specific estimates participate as the est_ok accuracy bit
    * (±10% of exact — ≥6σ at the default lgK=12), so a broken sketch
    * union fails the gate while the raw estimate stays engine-free;
    * the spec pins the tight error bound on the raw values. */
  def qHllUnion(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir).select(col("event_type"), col("user_id"))
    def estOk = when(abs(col("est_users") - col("exact_users")) * lit(1000L)
      <= lit(100L) * col("exact_users"), 1L).otherwise(0L).as("est_ok")
    val perType = e.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("exact_users"))
    val totalExact = e.agg(countDistinct(col("user_id")).as("exact_users"))
    val total = perType
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
      .crossJoin(totalExact)
      .select(lit("__ALL__").as("event_type"),
        col("est_users").cast("long").as("est_users"), col("exact_users"))
    perType
      .select(col("event_type"),
        hll_sketch_estimate(col("sk")).cast("long").as("est_users"),
        col("exact_users"))
      .unionByName(total)
      .select(col("event_type"), col("exact_users"), estOk)
      .orderBy(col("event_type"))
  }

  /** §2#110 RANGE-frame sliding window — the event-time moving
    * aggregate (vs the ROWS frames used elsewhere): per user, the sum
    * and count of value over the trailing 5 MINUTES of event time.
    * RANGE frames are peer-inclusive (all rows at the same `us` share a
    * frame), so the result is deterministic regardless of tie order —
    * the frame is defined by the ORDER-BY value, not row position. One
    * shuffle on user_id; the frame scan is streaming within each
    * partition (constant per-row state, sliding lower bound). */
  def qWindowRange(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-300000000L, 0L)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        cents(col("value")).as("value_c"))
      .withColumn("sum_5min_c", sum(col("value_c")).over(w))
      .withColumn("n_5min", count(lit(1)).over(w).cast("long"))
      .orderBy(col("user_id"), col("us"), col("event_id"))
  }

  /** §2#108 heavy-hitter estimation via a custom Count–Min sketch
    * TypedImperativeAggregate (graft_countmin — the SECOND custom
    * Catalyst aggregate next to graft_topk_vals): one pass builds a
    * fixed 4×1024 counter grid (32 KiB per partial, pointwise-summed
    * map-side like any built-in sketch) and estimates the frequency of
    * ten probe users; the exact counts ride along for comparison. CM
    * was chosen over space-saving/Misra–Gries because counter sums
    * commute — the estimate is bit-identical on any partitioning. At
    * 100 TB the sketch replaces a |users|-sized exact aggregation with
    * constant state; estimates never underestimate and overshoot by
    * more than ~3·N/w only with small probability (spec-pinned on this
    * corpus). */
  def qHeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.Registry.ensure(spark)
    import spark.implicits._
    val keys = 0L until 10L
    val est = Tables.events(spark, sfDir)
      .agg(call_function("graft_countmin", col("user_id"),
        lit(keys.mkString(","))).as("cm"))
    val keyIdx = keys.map(k => (k, (k + 1).toInt)).toDF("user_id", "idx")
    val exact = Tables.events(spark, sfDir)
      .where(col("user_id").isin(keys: _*))
      .groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
    exact.join(broadcast(keyIdx), "user_id")
      .crossJoin(broadcast(est))
      .select(col("user_id"), col("exact_n"),
        element_at(split(element_at(split(col("cm"), ";"), 1), ","), col("idx"))
          .cast("long").as("est_n"),
        element_at(split(col("cm"), ";"), 2).cast("long").as("n_total"))
      .withColumn("slack", col("est_n") - col("exact_n"))
      .orderBy(col("user_id"))
  }

  /** §2#107 set operators: customers ordering in BOTH 1996 and 1997
    * (`INTERSECT`) vs only in 1996 (`EXCEPT`), tagged in one frame.
    * Spark plans both as aggregate-backed joins with set semantics
    * (duplicate elimination included) — one shuffle each on custkey. */
  def qIntersectExcept(spark: SparkSession, sfDir: String): DataFrame = {
    def custIn(year: Int) = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf(s"$year-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf(s"${year + 1}-01-01 00:00:00")))
      .select(col("o_custkey"))
    val c96 = custIn(1996); val c97 = custIn(1997)
    c96.intersect(c97).withColumn("tag", lit("both"))
      .unionByName(c96.except(c97).withColumn("tag", lit("only_1996")))
      .orderBy(col("tag"), col("o_custkey"))
  }

  /** §2#105 the NATIVE relational pivot — `RelationalGroupedDataset
    * .pivot` with an EXPLICIT value list, the form that survives scale:
    * without the list Spark first runs a distinct-collect job over the
    * pivot column to discover values (a full extra pass plus a driver
    * materialization that a high-cardinality column would blow up);
    * with it the plan is a single pivot-aggregate, no discovery pass.
    * Same result as [[qConditionalPivot]]'s hand-written CASE columns —
    * pivot IS that rewrite, done by the engine. */
  def qPivotNative(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), cents(col("value")).as("value_c"))
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "signup", "error", "purchase"))
      .agg(sum(col("value_c")))
      .select(col("user_id"),
        coalesce(col("click"), lit(0L)).as("click_c"),
        coalesce(col("view"), lit(0L)).as("view_c"),
        coalesce(col("signup"), lit(0L)).as("signup_c"),
        coalesce(col("error"), lit(0L)).as("error_c"),
        coalesce(col("purchase"), lit(0L)).as("purchase_c"))
      .orderBy(col("user_id"))

  /** §2#165 correlated LATERAL join with per-row LIMIT — the "top-N
    * per group via lateral" idiom (the standard form in Postgres/
    * DuckDB; Spark 3.2+ plans it as a `LateralJoin` that decorrelates
    * into a ranked window, NOT a per-row re-execution): each
    * customer's 2 most expensive orders with their rank. The same
    * result as a window + filter — but expressed from the SQL surface
    * a migrating user brings, and the planner proves the
    * decorrelation. Inner-join semantics: order-less customers drop
    * (LEFT LATERAL would keep them). */
  def qLateralTopn(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.load(spark, sfDir, "orders").createOrReplaceTempView("ord_lat")
    Tables.load(spark, sfDir, "customer").createOrReplaceTempView("cust_lat")
    spark.sql(
      """SELECT c.c_custkey, t.o_orderkey, t.price_c, t.rk
        |FROM cust_lat c,
        |LATERAL (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_c,
        |    CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
        |  FROM ord_lat o WHERE o.o_custkey = c.c_custkey
        |  ORDER BY price_c DESC, o_orderkey LIMIT 2) t
        |ORDER BY c.c_custkey, t.rk""".stripMargin)
  }

  /** §2#164 the TPC-H Q21 decorrelation shape — EXISTS and NOT EXISTS
    * correlated against the SAME fact table in one query (the hardest
    * standard decorrelation case: Catalyst must plan a left-semi AND a
    * left-anti join against lineitem without re-scanning it per outer
    * row): suppliers who were the ONLY late shipper in a
    * multi-supplier finalized order ("late" = shipped >60 days after
    * the order date — the schema's receipt/commit columns adapted to
    * the columns the testdata carries). Lateness compares integer
    * epoch-µs (UTC session), so both engines agree exactly.
    *
    * Shape after decorrelation: three hash joins on l_orderkey (fact-
    * fact, AQE-planned) + a broadcast supplier dim + one combinable
    * count — no correlated re-execution anywhere. */
  def qExistsMulti(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("li_q21")
    Tables.load(spark, sfDir, "orders").createOrReplaceTempView("ord_q21")
    Tables.load(spark, sfDir, "supplier").createOrReplaceTempView("sup_q21")
    spark.sql(
      """SELECT s.s_name, count(*) AS numwait
        |FROM sup_q21 s
        |JOIN li_q21 l1 ON l1.l_suppkey = s.s_suppkey
        |JOIN ord_q21 o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND unix_micros(CAST(l1.l_shipdate AS TIMESTAMP)) >
        |      unix_micros(CAST(o.o_orderdate AS TIMESTAMP)) + 5184000000000
        |  AND EXISTS (SELECT 1 FROM li_q21 l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM li_q21 l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND unix_micros(CAST(l3.l_shipdate AS TIMESTAMP)) >
        |          unix_micros(CAST(o.o_orderdate AS TIMESTAMP)) + 5184000000000)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin)
  }

  /** §2#152 native WITH RECURSIVE (Spark 4's `UnionLoop`): the length
    * of each user's OPENING EVENT BURST — starting from the user's
    * first event, successive events chain while each arrives within
    * 5 min of the previous, capped at depth 50. The same linear
    * recursion a graph engine runs for path extension, here on the
    * engine's own recursive-CTE surface (the iterative twin of the
    * hash-min loop in [[Dedup.cluster]], which predates engines having
    * this feature).
    *
    * Scale contract: recursion depth is STRUCTURALLY bounded by the
    * chain cap (50 rounds max on any corpus — each round is one
    * equi-join of the |active-chains| working set against the indexed
    * per-user next-event frame), and the working set only shrinks
    * (chains leave when the gap exceeds 5 min). Unbounded recursion
    * over a 100 TB feed would be a bug, not a query — the cap is the
    * semantics. */
  def qRecursiveChain(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir).createOrReplaceTempView("events_rec")
    spark.sql(
      """WITH RECURSIVE e AS (
        |  SELECT user_id, unix_micros(ts) AS us, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY unix_micros(ts), event_id) AS rn
        |  FROM events_rec),
        |r AS (
        |  SELECT user_id, rn, us, CAST(1 AS BIGINT) AS chain_len
        |  FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.rn, e.us, r.chain_len + 1
        |  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
        |  WHERE e.us - r.us <= 300000000 AND r.chain_len < 50)
        |SELECT user_id, CAST(max(chain_len) AS BIGINT) AS chain_len
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin)
  }

  /** §2#151 the NATIVE relational UNPIVOT (melt) — the inverse surface
    * of [[qPivotNative]]: the per-returnflag measure totals fold from
    * wide (one column per measure) to long (one `(measure, total)` row
    * per measure) through `Dataset.unpivot`, the engine-level op
    * (`Unpivot` logical plan → an `Expand` projection, narrow — ×k
    * fan-out with NO shuffle, exactly how grouping-sets expand).
    * Long-format measures are what a metrics store or plotting layer
    * ingests; doing the melt AFTER aggregation means the fan-out runs
    * on |groups|×k rows, never on the fact table. All measures
    * integer-cents so the long `total` column is one BIGINT. */
  def qUnpivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        cents(col("l_quantity")).as("qty_c"),
        cents(col("l_extendedprice")).as("price_c"),
        cents(col("l_discount")).as("disc_c"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("qty_c")).as("sum_qty_c"),
        sum(col("price_c")).as("sum_price_c"),
        sum(col("disc_c")).as("sum_disc_c"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty_c"), col("sum_price_c"), col("sum_disc_c")),
        "measure", "total_c")
      .orderBy(col("l_returnflag"), col("measure"))

  /** §2#95 decile banding via HISTOGRAM RANKS, not a raw-row window:
    * a `ntile(10) over (partition by event_type order by ...)` sorts
    * every event of a type inside ONE reducer — a parallelism ceiling
    * of |event_types| that turns a 100× scale-up into ~5 tasks
    * streaming the whole table. Instead the rows compact map-side to a
    * per-(type, value_cents) histogram (same machinery as
    * [[quantilesSortRankOf]]), a window over the |values|-sized
    * histogram assigns each DISTINCT value its cumulative rank band —
    * decile = 1 + (10 · rows_before) div n — and the rollup sums
    * counts per band. Per-reducer state is the value domain, not the
    * group size. Tie rule (mirrored bit-for-bit in the DuckDB oracle):
    * a run of equal values shares the decile of its FIRST row, so band
    * sizes flex by tie mass instead of splitting a value across
    * bands — the statistically honest banding for discrete data. */
  def qNtileDecile(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = Tables.events(spark, sfDir)
      .select(col("event_type"), cents(col("value")).as("value_c"))
      .groupBy(col("event_type"), col("value_c"))
      .agg(count(lit(1)).as("cnt"))
    val byType = Window.partitionBy(col("event_type"))
    hist
      .withColumn("cum", sum(col("cnt")).over(byType.orderBy(col("value_c"))))
      .withColumn("n_grp", sum(col("cnt")).over(byType))
      .withColumn("decile", expr("1 + (10 * (cum - cnt)) div n_grp"))
      .groupBy(col("event_type"), col("decile"))
      .agg(sum(col("cnt")).as("n"),
        min(col("value_c")).as("lo_c"), max(col("value_c")).as("hi_c"))
      .orderBy(col("event_type"), col("decile"))
  }

  /** §2#198 DECILE LIFT — the model/segment evaluation chart: users
    * deciled by total spend, each decile's purchase-conversion rate
    * compared to the overall rate (lift 1000‰ = average; the top
    * decile of a working value model shows ≫1000). Deciling rides the
    * same histogram trick as [[qNtileDecile]]: users collapse to a
    * (spend, n_users, n_converted) histogram first, so the one
    * unpartitioned window runs over |distinct spend values| rows —
    * bounded by the VALUE RANGE in cents, not the user count (the
    * audited-unpartitioned-window contract, SURVEY §5). Lift is
    * integer end-to-end: per-mille rates by integer div, lift =
    * rate·1000 div overall_rate — rate_pm ≤ 1000 keeps every product
    * in range at any corpus size. */
  def qDecileLift(spark: SparkSession, sfDir: String): DataFrame = {
    val u = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(sum(cents(col("value"))).as("spend_c"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
    val hist = u.groupBy(col("spend_c"))
      .agg(count(lit(1)).as("n_u"), sum(col("converted")).as("n_conv"))
    val w = Window.orderBy(col("spend_c"))
    val deciled = hist
      .withColumn("cum", sum(col("n_u")).over(w))
      .withColumn("n_tot", sum(col("n_u")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("decile", expr("1 + (10 * (cum - n_u)) div n_tot"))
      .groupBy(col("decile"))
      .agg(sum(col("n_u")).as("n_users"), sum(col("n_conv")).as("n_converted"))
    val overall = u.agg(
      expr("sum(converted) * 1000 div count(1)").as("overall_conv_pm"))
    deciled.crossJoin(broadcast(overall))
      .select(col("decile"), col("n_users"), col("n_converted"),
        expr("n_converted * 1000 div n_users").as("conv_pm"),
        expr("(n_converted * 1000 div n_users) * 1000 " +
          "div greatest(overall_conv_pm, 1)").as("lift_pm"))
      .orderBy(col("decile"))
  }

  /** §2#96 exact second moments / covariance per group, two-pass
    * centered: pass 1 computes per-type n/Σx/Σy (one map-side-combined
    * agg on a ~|groups| frame, broadcast back); pass 2 sums centered
    * products (x−μx)(y−μy) around the INTEGER means. Centering first is
    * both the numerically-stable textbook recipe and what keeps every
    * sum within int64 at any realistic scale (naive n·Σxy − Σx·Σy
    * overflows beyond ~1e5 rows of cent values; centered deviations
    * are bounded by the value range, not the magnitude). x = value
    * cents, y = hour-of-day: the moments are the exact sufficient
    * statistics for variance/covariance/correlation of spend vs time. */
  def qCorrMoments(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("event_type"), cents(col("value")).as("x"),
        hour(col("ts")).cast("long").as("y"))
    val means = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"))
      .select(col("event_type"), col("n"),
        expr("sx div n").as("mx"), expr("sy div n").as("my"))
    e.join(broadcast(means), "event_type")
      .select(col("event_type"), col("n"), col("mx"), col("my"),
        (col("x") - col("mx")).as("dx"), (col("y") - col("my")).as("dy"))
      .groupBy(col("event_type"), col("n"), col("mx").as("mean_x_c"),
        col("my").as("mean_y"))
      .agg(sum(col("dx") * col("dx")).as("m2x"),
        sum(col("dy") * col("dy")).as("m2y"),
        sum(col("dx") * col("dy")).as("mxy"))
      .orderBy(col("event_type"))
  }

  /** §2#23 semi/anti join: per-nation counts of customers with and
    * without orders. Distinct custkeys from orders approaches |customer|
    * at scale — NOT broadcastable, so no hint: both sides shuffle on
    * custkey (or AQE broadcasts when the distinct set actually fits). */
  def qSemiAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"))
    val ordKeys = Tables.orders(spark, sfDir).select(col("o_custkey")).distinct()
    val withO = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_with_orders"))
    val withoutO = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_without_orders"))
    withO.join(withoutO, Seq("c_nationkey"), "full_outer")
      .select(col("c_nationkey").cast("long").as("c_nationkey"),
        coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
        coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
      .orderBy(col("c_nationkey"))
  }

  /** §2#168 EXACT distinct counting via BITMAP aggregation — the
    * two-level roaring-style pattern every warehouse uses when
    * approx_count_distinct isn't allowed but count(DISTINCT) shuffles
    * too much: bucket each user_id (bitmap_bucket_number), OR together
    * per-bucket position bitmaps (bitmap_construct_agg — map-side
    * combinable, so each partition ships ONE ≤4 KB bitmap per
    * (type, bucket), not its raw ids), then sum of bitmap_count per
    * type. At 100 TB the shuffle volume is |types|×|buckets|×4 KB,
    * independent of row count — vs count(DISTINCT)'s full id shuffle.
    * Oracle = plain count(DISTINCT): same integers, proving the bitmap
    * path EXACT, not approximate. */
  def qBitmapDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"))
      .groupBy(col("event_type"),
        expr("bitmap_bucket_number(user_id)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
      .groupBy(col("event_type"))
      .agg(sum(expr("bitmap_count(bm)")).as("n_users"))
      .orderBy(col("event_type"))

  /** §2#169 ordered string aggregation (LISTAGG/string_agg): the
    * per-group concatenated roster, deterministic via an explicit
    * element sort (collect_list order is partition-dependent;
    * sort_array pins it — the same contract as SQL's
    * WITHIN GROUP (ORDER BY)). Group sizes are bounded by the
    * dimension's fan-out (customers per nation), not the fact table,
    * so the collected arrays stay executor-safe at scale. */
  def qStringAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        array_join(sort_array(collect_list(col("c_name"))), "|")
          .as("roster"))
      .orderBy(col("n_name"))

  /** Sketch size for [[qKmvJaccard]] — fixed: the KMV synopsis is a
    * constant of the pipeline, never corpus-proportional. */
  val kmvK = 256

  /** §2#233 KMV bottom-k set RESEMBLANCE between sources — the sketch
    * the [[qHllUnion]] family can't provide: HLL unions cardinalities,
    * but "how much does source A's CONTENT overlap source B's" needs
    * Jaccard over their 3-shingle sets, and the K-Minimum-Values
    * synopsis (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07) answers
    * it from k hashes per side: the k smallest shingle hashes of A∪B
    * are a uniform sample of the union, so the fraction of them
    * present in BOTH sketches estimates |A∩B|/|A∪B| — and the kth
    * smallest hash estimates the union size as (k−1)·M div h_k
    * (hashes uniform on [0, M)). This is the corpus-curation
    * diagnostic that says WHICH feeds mirror each other before any
    * pairwise doc dedup runs — at k=[[kmvK]] per source it summarizes
    * arbitrarily large sources in constant space, where the exact
    * answer ([[graft.operators.Dedup]]'s pair joins) reads everything.
    * Exact integers throughout: the replayable 31-bit md5 shingle
    * hash (M = 2³¹ — products stay far under 2⁶³), estimates in raw
    * counts and per-mille.
    *
    * Shape: one combinable distinct on (source, shingle-hash) — the
    * only corpus-sized shuffle, carrying 31-bit hashes, never text;
    * bottom-k per source is a rank-≤-k window (the
    * [[graft.plans.TopKWindowRewrite]] pattern — per-partition
    * bounded heaps, never a full sort at scale); everything after
    * runs on |sources|·k rows: the source-pair union re-rank is
    * |sources|²·2k rows regardless of corpus size. */
  def qKmvJaccard(spark: SparkSession, sfDir: String): DataFrame =
    qKmvJaccardOf(Tables.documentsPar(spark, sfDir))

  /** Count-Min geometry for [[qCountminErr]] — fixed pipeline
    * constants (d hash rows × w cells = 1 KiB of counters), never
    * corpus-proportional. */
  val cmDepth = 4
  val cmWidth = 256L

  /** §2#241 COUNT-MIN SKETCH error report (Cormode & Muthukrishnan
    * 2005) — the third sketch family next to #113's HLL
    * (cardinality) and #233's KMV (resemblance): FREQUENCY. A d×w
    * grid of counters, each event incrementing one cell per hash
    * row; a key's estimate is the MIN over its d cells — never an
    * underestimate (every cell holds the key's true count plus
    * non-negative collision mass), overshooting by ≤ 2N/w with
    * probability ≥ 1−(1/2)^d. The report materializes that guarantee
    * as data: for the top-20 keys by exact count, exact vs estimate
    * vs overshoot — the table that says whether 1 KiB of state is
    * enough before replacing an exact 10⁹-key groupBy with a sketch.
    * Exact integers; the d hash rows are the replayable md5+affine
    * family (same [[graft.functions.Fns.affineHash]] constants both
    * engines), so the DuckDB oracle reproduces every collision. The
    * native-aggregate twin is [[graft.functions.CountMinLongs]] (one
    * 32 KiB TypedImperativeAggregate buffer, the execution-speed
    * form); THIS op is the relational formulation whose every cell
    * the cross-engine oracle can hash-gate — same sketch, two
    * extension depths, each verifying the other's math.
    *
    * Shape: ONE corpus scan — the combinable per-user count; every
    * event of a user hits the same d cells, so the sketch is the
    * per-user counts re-aggregated over their cells (d·w ≤ 1024
    * rows), and the exact top-20 is a distributed TakeOrdered over
    * the same |users|-row frame (never a global single-partition
    * window); probes join the broadcast sketch. */
  def qCountminErr(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Fns.{md5Hash31, affineHash}
    import graft.Checkpoints.CutOps
    val (d, w) = (cmDepth, cmWidth)
    // .cut: the |users|-row count frame feeds the sketch AND the
    // top-20 probe side — one events scan total
    val perUser = Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
      .withColumn("h", md5Hash31(col("user_id")))
      .cut
    def cellStructs(src: Column) = array((0 until d).map(j =>
      struct(lit(j.toLong).as("j"),
        pmod(affineHash(src, j), lit(w)).as("cell"))): _*)
    val cells = perUser
      .select(col("exact_n"), explode(cellStructs(col("h"))).as("jc"))
      .groupBy(col("jc.j").as("j"), col("jc.cell").as("cell"))
      .agg(sum(col("exact_n")).as("n"))
    val probes = perUser
      .orderBy(col("exact_n").desc, col("user_id")).limit(20)
      .select(col("user_id"), col("exact_n"),
        explode(cellStructs(col("h"))).as("jc"))
      .select(col("user_id"), col("exact_n"),
        col("jc.j").as("j"), col("jc.cell").as("cell"))
    probes.join(broadcast(cells), Seq("j", "cell"))
      .groupBy(col("user_id"), col("exact_n"))
      .agg(min(col("n")).as("est_n"))
      .select(col("user_id"), col("exact_n"), col("est_n"),
        (col("est_n") - col("exact_n")).as("overest_n"))
      .orderBy(col("user_id"))
  }

  /** [[qKmvJaccard]] over any (source, text) frame. */
  def qKmvJaccardOf(docs: DataFrame): DataFrame = {
    import graft.functions.Fns.{tokens, shingleMd5Hashes}
    import graft.Checkpoints.CutOps
    val k = kmvK
    // .cut on the |sources|·k sketch: it feeds the pair spine twice
    // and the union join — without it the shingle explode runs 3×
    val sk = docs
      .select(col("source"),
        explode(shingleMd5Hashes(tokens(col("text")), 3)).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"))))
      .where(col("rn") <= k)
      .select(col("source"), col("h"))
      .cut
    val pairs = sk.select(col("source").as("src_a")).distinct()
      .join(sk.select(col("source").as("src_b")).distinct(),
        col("src_a") < col("src_b"))
    val u = pairs
      .join(sk.as("s"), col("s.source") === col("src_a")
        || col("s.source") === col("src_b"))
      .groupBy(col("src_a"), col("src_b"), col("h"))
      .agg(max(when(col("s.source") === col("src_a"), 1L).otherwise(0L)).as("in_a"),
        max(when(col("s.source") === col("src_b"), 1L).otherwise(0L)).as("in_b"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))))
      .where(col("rn") <= k)
    u.groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("k_used"),
        sum(expr("in_a * in_b")).as("n_common"),
        max(col("h")).as("hk"))
      .select(col("src_a"), col("src_b"), col("k_used"), col("n_common"),
        expr("1000 * n_common div k_used").as("jaccard_pm"),
        expr("((k_used - 1) * 2147483648L) div greatest(hk, 1)").as("union_est"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** §2#248 RFM SEGMENTATION — the classic recency/frequency/monetary
    * customer cube (Hughes 1994; the standard warehouse segmentation
    * query): per user, recency = last event instant, frequency =
    * purchase count, monetary = integer-cents spend; each dimension
    * scored into quintiles 1–5 with the VALUE-GRANULAR cumsum idiom
    * (the #95/#198 construct — windows run over per-VALUE count
    * tables, never per-row ntile over the corpus), then one combinable
    * aggregate per (r, f, m) cell: ≤125 output rows at any scale.
    *
    * Shape: one user-grain aggregate over events (the only
    * corpus-sized shuffle), three value-count tables ≤ |users| rows
    * each (users ≪ events — the qDecileLift scale argument; for an
    * unbounded id universe the curriculum-style fixed value bands are
    * the documented fallback), one 125-cell aggregate. */
  def qRfmSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val u = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("r_us"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("f_n"),
        sum(cents(col("value"))).as("m_c"))
    // quintile score of one metric via its value-count table: score =
    // 1 + 5·(rows strictly below this value) div total — identical
    // tie handling in both engines because ties share one table row
    def quintile(metric: String): DataFrame = {
      val w = Window.orderBy(col(metric))
      u.groupBy(col(metric)).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("tot", sum(col("cnt")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col(metric),
          expr("1 + (5 * (cum - cnt)) div tot").as(s"${metric.take(1)}_score"))
    }
    u.join(quintile("r_us"), "r_us")
      .join(quintile("f_n"), "f_n")
      .join(quintile("m_c"), "m_c")
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"), sum(col("m_c")).as("segment_spend_c"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** §2#249 TOUCH ATTRIBUTION — first- and last-touch marketing
    * attribution inside a 7-day lookback (the two standard single-touch
    * models): for every purchase, the earliest and the latest
    * non-purchase event of the same user in (purchase−7d, purchase),
    * ties broken by event_id; purchases with no touch in the window
    * attribute to 'direct'. Output per touch channel (event_type):
    * purchases first-/last-attributed and last-touch revenue cents —
    * the report every growth team joins against ad spend.
    *
    * Shape: the purchase×touch candidate join is per-user and
    * 7-day-bounded (the q_funnel_windowed fanout argument: per-user
    * week volume, never corpus²); one row_number window per purchase
    * over those bounded candidates; two ≤|channels| aggregates. */
  def qAttribution(spark: SparkSession, sfDir: String,
      windowUs: Long = 604800000000L): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), cents(col("value")).as("value_c"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_eid"),
        col("us").as("p_us"), col("value_c"))
    val touches = e.where(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_id").as("t_eid"),
        col("us").as("t_us"), col("event_type").as("channel"))
    val cand = purchases.join(touches, Seq("user_id"))
      .where(col("t_us") < col("p_us") && col("t_us") > col("p_us") - windowUs)
    val byPurchase = Window.partitionBy(col("user_id"), col("p_eid"))
    val picked = cand
      .withColumn("rk_first", row_number().over(
        byPurchase.orderBy(col("t_us"), col("t_eid"))))
      .withColumn("rk_last", row_number().over(
        byPurchase.orderBy(col("t_us").desc, col("t_eid").desc)))
    val first = picked.where(col("rk_first") === 1)
      .select(col("p_eid"), col("channel").as("first_ch"))
    val last = picked.where(col("rk_last") === 1)
      .select(col("p_eid"), col("channel").as("last_ch"))
    val attributed = purchases
      .join(first, Seq("p_eid"), "left").join(last, Seq("p_eid"), "left")
      .select(coalesce(col("first_ch"), lit("direct")).as("first_ch"),
        coalesce(col("last_ch"), lit("direct")).as("last_ch"), col("value_c"))
    val byFirst = attributed.groupBy(col("first_ch").as("channel"))
      .agg(count(lit(1)).as("n_first_touch"))
    val byLast = attributed.groupBy(col("last_ch").as("channel"))
      .agg(count(lit(1)).as("n_last_touch"),
        sum(col("value_c")).as("last_touch_rev_c"))
    byFirst.join(byLast, Seq("channel"), "full_outer")
      .na.fill(0L, Seq("n_first_touch", "n_last_touch", "last_touch_rev_c"))
      .orderBy(col("channel"))
  }

  /** §2#256 MARKOV TRANSITIONS — the first-order behavior model over
    * event streams (the session-analysis classic; PageRank's row view):
    * per (from, to) event-type pair, how often a user's next event is
    * `to` given `from` (consecutive by (ts, event_id) per user), with
    * the row-conditional probability in per-mille. Product teams read
    * it as the navigation graph; anomaly detection reads drift in it.
    *
    * Shape: one per-user lead() window (the sessionize exchange), one
    * combinable (from, to) count — output |event_types|² rows. */
  def qMarkovTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val pairs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(broadcast(fromTotals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        expr("1000 * n div n_from").as("p_pm"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** §2#257 FUNNEL PATHS — the top-of-journey report ("what do users
    * actually do first?"): each user's first three events by
    * (ts, event_id) folded into a path string `a>b>c` (shorter
    * journeys pad with `-`), counted per distinct path — the
    * empirical funnel the designed funnel (#56) is compared against.
    *
    * Shape: one per-user row_number window, a 3-row-per-user
    * conditional-max fold (no collect_list — order is pinned by the
    * rank, not array aggregation order), one combinable count over
    * ≤ |types|³ paths. */
  def qFunnelPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val ranked = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
    ranked.groupBy(col("user_id"))
      .agg(
        max(when(col("rn") === 1, col("event_type"))).as("e1"),
        max(when(col("rn") === 2, col("event_type"))).as("e2"),
        max(when(col("rn") === 3, col("event_type"))).as("e3"))
      .select(concat_ws(">", coalesce(col("e1"), lit("-")),
        coalesce(col("e2"), lit("-")), coalesce(col("e3"), lit("-")))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("path"))
  }

  /** §2#250 JOIN-SKEW REPORT — the diagnostic run BEFORE picking a
    * skew mitigation (salting factor, AQE thresholds — the #50/#76
    * knobs): the multiplicity distribution of a join key, here
    * lineitem.l_orderkey (the fact side of the canonical
    * lineitem⋈orders join), as a log₂ histogram of per-key row counts
    * with each bucket's cumulative row share and the global
    * max-over-average skew factor (1000 = perfectly uniform). A key
    * whose max multiplicity sits orders of magnitude above average is
    * the key you salt; this report is how you know.
    *
    * Shape: one combinable per-key count (the only corpus-sized
    * shuffle — map-side partials make it |keys|-bounded), a ≤64-row
    * log₂ histogram, one window over those ≤64 rows, one broadcast
    * scalar. */
  def qJoinSkewReport(spark: SparkSession, sfDir: String): DataFrame = {
    val mult = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("m"))
    val buckets = mult
      .select((length(bin(col("m"))) - 1).cast("long").as("log2_bucket"),
        col("m"))
      .groupBy(col("log2_bucket"))
      .agg(count(lit(1)).as("n_keys"), sum(col("m")).as("n_rows"),
        max(col("m")).as("max_mult"))
    val w = Window.orderBy(col("log2_bucket"))
    val totals = mult.agg(count(lit(1)).as("t_keys"), sum(col("m")).as("t_rows"),
      max(col("m")).as("t_max"))
    buckets
      .withColumn("cum_rows", sum(col("n_rows")).over(w))
      .crossJoin(broadcast(totals))
      .select(col("log2_bucket"), col("n_keys"), col("n_rows"), col("max_mult"),
        expr("1000 * cum_rows div t_rows").as("cum_rows_pm"),
        expr("1000 * t_max * t_keys div t_rows").as("skew_factor_pm"))
      .orderBy(col("log2_bucket"))
  }

  /** §2#261 MARKET-BASKET ASSOCIATION RULES — support / confidence /
    * lift for brand pairs co-purchased in one order (Agrawal & Srikant
    * 1994's A-priori output at the 2-itemset level, the only level a
    * warehouse usually ships): for brands a<b,
    * support‰ = orders(a,b)/orders, conf‰ = orders(a,b)/orders(a),
    * lift‰ = P(ab)/(P(a)P(b)) — lift > 1000 ⇔ genuinely associated.
    * Pairs below `minSupport` co-orders are pruned (the a-priori
    * frequency floor).
    *
    * Exact-integer lift is computed as ((1000·c_ab div c_a) · N)
    * div c_b — the first factor is ≤1000 (c_ab ≤ c_a), so the product
    * stays ≤ 1000·N and never overflows at ANY order count, where the
    * naive 1000·c_ab·N breaks past N ≈ 3·10⁹ orders; the two-stage
    * floor is applied identically in the oracle.
    *
    * Shape: lineitem ⋈ part on partkey (both corpus-proportional →
    * shuffle join, AQE may still broadcast the dim at small SF), then
    * ONE groupBy(order) building the SORTED per-order brand set
    * (collect_set partial-merges map-side; sorted → canonical, so no
    * aggregation-order dependence) and the pair space is a NARROW
    * in-row explode of C(brands-in-order, 2) ≤ C(25,2) combinations —
    * no order-keyed self-join, no second shuffle of the order×brand
    * frame (the first cut of this op self-joined the distinct frame
    * and re-paid its build on both sides: 7.8× wall at 10× data;
    * restructured, the pair stage is fanout over the set rows).
    * Brand totals (≤|brands| rows) and the scalar total broadcast
    * back. Never orders². */
  def qBasketRules(spark: SparkSession, sfDir: String,
      minSupport: Long = 10L): DataFrame = {
    import graft.Checkpoints.CutOps
    val sets = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("okey"), col("l_partkey"))
      .join(Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("okey"))
      .agg(array_sort(collect_set(col("p_brand"))).as("bs"))
      .cut // feeds the total, the per-brand counts AND the pair explode
    val total = sets.agg(count(lit(1)).as("n_orders"))
    // the a-/b-side lookup legs re-run this tiny explode+count (their
    // aliases differ, so the subtrees never share the exchange) — but
    // an r17 same-window A/B measured the .cut that dedups it a WASH
    // to slightly slower (1.65/1.75 vs 1.69/1.55 s): the extra job
    // launch + materialization costs what the duplicate leg costs.
    // Kept lazy; both legs read the memoized `sets` cut blocks anyway.
    val perBrand = sets.select(explode(col("bs")).as("brand"))
      .groupBy(col("brand")).agg(count(lit(1)).as("c"))
    val pairs = sets
      .select(explode(expr(
        """flatten(transform(bs, (x, i) ->
          |  transform(slice(bs, i + 2, size(bs)),
          |    y -> struct(x AS brand_a, y AS brand_b))))""".stripMargin))
        .as("p"))
      .select(col("p.brand_a"), col("p.brand_b"))
      .groupBy(col("brand_a"), col("brand_b"))
      .agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= lit(minSupport))
    pairs
      .join(broadcast(perBrand.select(col("brand").as("brand_a"),
        col("c").as("c_a"))), "brand_a")
      .join(broadcast(perBrand.select(col("brand").as("brand_b"),
        col("c").as("c_b"))), "brand_b")
      .crossJoin(broadcast(total))
      .select(col("brand_a"), col("brand_b"), col("c_ab"), col("c_a"),
        col("c_b"),
        expr("1000 * c_ab div n_orders").as("support_pm"),
        expr("1000 * c_ab div c_a").as("conf_pm"),
        expr("((1000 * c_ab div c_a) * n_orders) div c_b").as("lift_pm"))
      .orderBy(col("brand_a"), col("brand_b"))
  }

  /** §2#262 BENFORD FIRST-DIGIT SCREEN — the classic forensic test on
    * monetary amounts (Benford 1938; Nigrini 1996 made it the audit
    * standard): the distribution of the leading digit of order totals
    * vs the Benford expectation log₁₀(1+1/d), deviation per digit in
    * ‰. Fabricated or systematically-priced data jumps out as a fat
    * |dev| on one digit; organic totals track the curve.
    *
    * The expectation is a 9-row literal table (rounded ‰ —
    * 301/176/125/97/79/67/58/51/46), identical constants in the
    * oracle; the leading digit is taken from the decimal string of
    * the integer cents value — the same digit both engines print.
    *
    * Shape: one narrow projection + a 9-group combinable count, one
    * broadcast scalar, one broadcast 9-row literal join. Scan-bound at
    * any scale. */
  def qBenford(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val benford = Seq(1L -> 301L, 2L -> 176L, 3L -> 125L, 4L -> 97L,
      5L -> 79L, 6L -> 67L, 7L -> 58L, 8L -> 51L, 9L -> 46L)
      .toDF("digit", "exp_pm")
    val digits = Tables.orders(spark, sfDir)
      .select(cents(col("o_totalprice")).as("c"))
      .where(col("c") > 0)
      .select(substring(col("c").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("t"))
    // join the literal spine FIRST, then the scalar total — the
    // other order leaves t NULL on digits absent from the data. The
    // spine is the preserved side, so the hint must ride the 9-row
    // aggregated digits frame (a LeftOuter can only build its right
    // side; a hint on the preserved side is silently ignored).
    benford.join(broadcast(digits), Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("1000 * n div t").as("obs_pm"), col("exp_pm"),
        expr("abs(1000 * n div t - exp_pm)").as("dev_pm"))
      .orderBy(col("digit"))
  }

  /** §2#272 TPC-H Q13-style CUSTOMER DISTRIBUTION — the canonical
    * outer-join + double-aggregation: how many customers placed
    * exactly k orders, INCLUDING k = 0 (the left join is the point —
    * an inner join silently drops the inactive customers, the segment
    * a retention team most wants counted). Output: (c_count,
    * custdist), the order-count histogram of the customer base.
    *
    * Shape: one left join customer ⋈ orders on custkey (both
    * corpus-proportional → shuffle join), one per-customer count
    * (combinable), one ≤|distinct order counts| histogram aggregate.
    * The classic TPC-H ordering (custdist DESC, c_count DESC) is a
    * total order — (c_count) is unique per row. */
  def q13CustDist(spark: SparkSession, sfDir: String): DataFrame = {
    val perCust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"))
      .join(Tables.orders(spark, sfDir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("c_count")) // count(col) skips nulls
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** §2#273 TPC-H Q4-style ORDER-PRIORITY check — orders from one
    * quarter with at least one LATE line (shipped > `lateDays` days
    * after the order date; the schema has no commit/receipt dates, so
    * ship-lag stands in for Q4's commit<receipt predicate), counted
    * per priority: the SLA report read against the priority ladder.
    * EXISTS-semantics via left_semi join — one probe row per order no
    * matter how many lines are late (the Q4 trap: an inner join would
    * double-count multi-line orders).
    *
    * Shape: date predicates push to both scans; the semi join shuffles
    * on orderkey (fact ⋈ fact); one ≤|priorities| combinable count. */
  def q4OrderPriority(spark: SparkSession, sfDir: String,
      lateDays: Int = 90): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))
        && col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1995-07-01 00:00:00")))
      .select(col("o_orderkey"), col("o_orderpriority"),
        // driver-era NTZ files; the UTC session pin makes the cast exact
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
    val late = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
    o.join(late,
        col("o_orderkey") === col("l_orderkey")
          && col("ship_us") > col("od_us") + lit(lateDays.toLong * 86400000000L),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** §2#282 TPC-H Q7-style TRADE MATRIX — revenue flows between
    * supplier nation and customer nation (the "volume shipping"
    * classic): per ordered nation pair (cross-border only), line
    * count and discounted revenue in integer cents, nations by NAME
    * via the dimension chain. The international-flows report every
    * supply-chain dashboard opens with.
    *
    * Shape: lineitem ⋈ orders is the one fact⋈fact shuffle; customer
    * and supplier key maps reduce to (key → nationkey) projections
    * (broadcast when they fit, AQE decides — at 100 TB they shuffle
    * and that IS the plan), the two nation-name joins broadcast
    * ≤|nations| rows; one ≤|nations|² combinable aggregate. */
  def q7TradeMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val nations = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"))
    val custNation = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"))
    val suppNation = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev_c"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(custNation, col("o_custkey") === col("c_custkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .where(col("s_nationkey") =!= col("c_nationkey"))
      .join(broadcast(nations.select(col("n_nationkey").as("s_nationkey"),
        col("n_name").as("supp_nation"))), "s_nationkey")
      .join(broadcast(nations.select(col("n_nationkey").as("c_nationkey"),
        col("n_name").as("cust_nation"))), "c_nationkey")
      .groupBy(col("supp_nation"), col("cust_nation"))
      .agg(count(lit(1)).as("n_lines"), sum(col("rev_c")).as("revenue_c"))
      .orderBy(col("supp_nation"), col("cust_nation"))
  }

  /** §2#283 TPC-H Q9-style PRODUCT-TYPE PROFIT — profit by supplier
    * nation and order year for one part family (Q9's "green" parts;
    * this corpus names parts color-first, so the family predicate is
    * `p_name LIKE '%red%'`). The schema has no partsupp table, so
    * Q9's ps_supplycost is stood in by a retail-margin cost proxy —
    * unit cost = p_retailprice/10 — keeping Q9's defining structure:
    * a FIVE-way join (lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ orders)
    * with a computed profit expression aggregated per (nation, year).
    * All arithmetic in integer cents so both engines agree exactly:
    * profit_c = cents(extprice·(1−discount)) − cents(retail)·qty/10.
    *
    * Shape: the selective part family (~13% of parts) joins FIRST —
    * a broadcast hash join that prunes lineitem before anything
    * shuffles; supplier reduces to (key → nationkey) and broadcasts;
    * lineitem ⋈ orders is the one fact⋈fact shuffle (year rides the
    * orders side as a 1-column projection); nation names broadcast
    * ≤|nations| rows; one ≤|nations|×|years| combinable aggregate.
    * At 100 TB part/supplier shuffle instead of broadcasting when AQE
    * says so — the plan's byte order (prune, then shuffle) stands. */
  def q9PartProfit(spark: SparkSession, sfDir: String): DataFrame = {
    val redParts = Tables.part(spark, sfDir)
      .where(col("p_name").like("%red%"))
      .select(col("p_partkey"), cents(col("p_retailprice")).as("retail_c"))
    val suppNation = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val nations = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name").as("nation"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("qty"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev_c"))
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long")
          .as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(col("rev_c") - expr("retail_c * qty div 10"))
        .as("profit_c"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** §2#284 TPC-H Q18-style LARGE-VOLUME CUSTOMERS — orders whose
    * total line quantity exceeds a threshold (Q18's 300), with the
    * customer who placed them: the "who is buying in bulk" report.
    * Q18's group-by-HAVING-IN is expressed as ONE pass: the per-order
    * quantity roll-up IS both the HAVING filter and the reported sum
    * (the textbook form re-scans lineitem after the IN; computing the
    * aggregate once and joining it forward is the same result with
    * half the fact reads).
    *
    * Shape: one orderkey-grain combinable roll-up of lineitem (the
    * fact shuffle), filtered to a tiny survivor set (~0.1% of orders
    * at threshold 300) BEFORE any join; orders joins on the same key
    * (the survivor side is small → AQE broadcasts it); customer is a
    * dim join; top-100 is TakeOrderedAndProject, never a global
    * sort. */
  def q18LargeOrders(spark: SparkSession, sfDir: String,
      threshold: Long = 300L): DataFrame = {
    val bigOrders = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).cast("long").as("total_qty"))
      .where(col("total_qty") > threshold)
    bigOrders
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"),
          cents(col("o_totalprice")).as("totalprice_c")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("od_us"), col("totalprice_c"), col("total_qty"))
      .orderBy(col("totalprice_c").desc, col("o_orderkey"))
      .limit(100)
  }

  /** §2#285 TPC-H Q10-style RETURNED-ITEM REVENUE — the top-20
    * customers by revenue on RETURNED lines (l_returnflag = 'R') for
    * orders placed in one quarter: the "who is returning the most
    * value" churn-risk report. Revenue in integer cents; customer
    * name, nation, and account balance ride along.
    *
    * Shape: both fact filters (returnflag, the order-date quarter)
    * push to their scans; lineitem ⋈ orders is the one fact⋈fact
    * shuffle; revenue is aggregated to customer grain BEFORE the
    * customer join (the textbook form joins 4 ways then groups — at
    * 100 TB that ships names/balances through the fact shuffle for
    * nothing); nation broadcasts; top-20 is TakeOrderedAndProject. */
  def q10ReturnedRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val returned = Tables.lineitem(spark, sfDir)
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev_c"))
    val q1Orders = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))
        && col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1995-04-01 00:00:00")))
      .select(col("o_orderkey"), col("o_custkey"))
    returned.join(q1Orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_lines"), sum(col("rev_c")).as("revenue_c"))
      .join(Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          cents(col("c_acctbal")).as("acctbal_c")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("acctbal_c"), col("n_lines"), col("revenue_c"))
      .orderBy(col("revenue_c").desc, col("c_custkey"))
      .limit(20)
  }

  /** §2#286 TPC-H Q15-style TOP SUPPLIER — the supplier(s) with the
    * maximum shipped revenue in one quarter (Q15's CREATE VIEW +
    * max-subquery, expressed as one plan): per-supplier revenue,
    * filtered to the max. Ties (exact integer cents) all surface,
    * ordered by supplier key — the classic Q15 subtlety.
    *
    * Shape: one pushed-date lineitem scan, a combinable agg to
    * ≤|suppliers| rows MEMOIZED ONCE (the `.cut` — it feeds both the
    * max scalar and the filter; without it the quarter's lineitem
    * would be scanned and aggregated twice), a 1-row max broadcast
    * back over it, supplier names broadcast. Nothing after the scan
    * exceeds dim size. */
  /** q15's pre-memo per-supplier revenue frame, exposed so the plan
    * spec can pin the shipdate pushdown on the PRODUCTION frame (the
    * memo cut hides the scan from the final query's plan). */
  private[graft] def q15Revenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))
        && col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1995-04-01 00:00:00")))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("total_revenue_c"))

  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.Checkpoints.CutOps
    val rev = q15Revenue(spark, sfDir)
      .cut // feeds the max scalar AND the filter — ONE lineitem scan
    rev
      .crossJoin(broadcast(rev.agg(max(col("total_revenue_c")).as("mx"))))
      .where(col("total_revenue_c") === col("mx"))
      .join(broadcast(Tables.supplier(spark, sfDir)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue_c"))
      .orderBy(col("s_suppkey"))
  }

  /** §2#287 TPC-H Q19-style DISJUNCTIVE-PREDICATE REVENUE — total
    * discounted revenue over an OR-of-ANDs across brand, part size,
    * and line quantity (Q19's "three special deals" shape): the query
    * optimizers historically mangled (a disjunction spanning two
    * tables can't fully push to either scan). One (n_lines,
    * revenue_c) row.
    *
    * Shape: the part-side ENVELOPE of the disjunction (brand ∈ the
    * three deals AND size ≤ the loosest bound) filters the broadcast
    * side before the join — the per-deal quantity×brand×size
    * conjunctions then evaluate in-row after the broadcast hash join;
    * lineitem never shuffles (the aggregate is a 1-row partial). */
  def q19DisjunctiveRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val deals = Tables.part(spark, sfDir)
      .where(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        && col("p_size").between(1, 15))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev_c"))
      .join(broadcast(deals), col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
          && col("l_quantity").between(1, 11))
        || (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
          && col("l_quantity").between(10, 20))
        || (col("p_brand") === "Brand#34" && col("p_size").between(1, 15)
          && col("l_quantity").between(20, 30)))
      .agg(count(lit(1)).as("n_lines"),
        coalesce(sum(col("rev_c")), lit(0L)).as("revenue_c"))
  }

  /** §2#288 TPC-H Q8-style NATIONAL MARKET SHARE — one supplier
    * nation's share of a region's revenue in one part family, per
    * order year (Q8's "how is BRAZIL doing in AMERICA on this
    * product line"): numerator = revenue supplied by the nation,
    * denominator = the region's whole revenue for the family, share
    * in integer ‰ (1000·num div den — both strictly positive).
    *
    * Shape: the part family broadcast-prunes lineitem FIRST; the one
    * fact⋈fact shuffle is lineitem ⋈ orders; the customer-side
    * region membership reduces to a (custkey) semi-join set built
    * from the broadcast nation→region chain; supplier reduces to a
    * key→nationkey broadcast map; one ≤|years| combinable agg. */
  def q8MarketShare(spark: SparkSession, sfDir: String,
      suppNation: String = "NATION_1", region: String = "AMERICA",
      partType: String = "ECONOMY"): DataFrame = {
    val nations = Tables.nation(spark, sfDir)
    val regionNations = nations
      .join(broadcast(Tables.region(spark, sfDir)
        .where(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val regionCusts = Tables.customer(spark, sfDir)
      .join(broadcast(regionNations),
        col("c_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("c_custkey"))
    val familyParts = Tables.part(spark, sfDir)
      .where(col("p_type") === partType).select(col("p_partkey"))
    val suppIsNation = Tables.supplier(spark, sfDir)
      .join(broadcast(nations.where(col("n_name") === suppNation)
        .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("s_suppkey").as("l_suppkey"), lit(1L).as("is_nation"))
    // the oracle INNER-joins supplier, so a lineitem row with a
    // dangling l_suppkey must be dropped, not counted — the semi join
    // below pins that semantics instead of leaning on FK integrity of
    // the corpus (the left join against suppIsNation alone would keep
    // orphans with is_nation = null)
    val allSupps = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("l_suppkey"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev_c"))
      .join(broadcast(familyParts), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .join(broadcast(allSupps), Seq("l_suppkey"), "left_semi")
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(regionCusts), col("o_custkey") === col("c_custkey"),
        "left_semi")
      .join(broadcast(suppIsNation), Seq("l_suppkey"), "left")
      .groupBy(col("o_year"))
      .agg(sum(when(col("is_nation") === 1L, col("rev_c")).otherwise(0L))
        .as("nation_rev_c"), sum(col("rev_c")).as("total_rev_c"))
      .select(col("o_year"), col("nation_rev_c"), col("total_rev_c"),
        expr("1000 * nation_rev_c div total_rev_c").as("mkt_share_pm"))
      .orderBy(col("o_year"))
  }

  /** §2#289 TPC-H Q14-style PROMO REVENUE SHARE — the fraction of one
    * ship-month's revenue on PROMO-type parts (this corpus carries the
    * literal 'PROMO' p_type, so the query is faithful): promo and
    * total revenue in cents plus the share in ‰.
    *
    * Shape: ship-month pushed to the lineitem scan; part reduces to a
    * (partkey, is_promo) broadcast map; ONE row out of a combinable
    * agg — lineitem never shuffles. */
  def q14PromoShare(spark: SparkSession, sfDir: String): DataFrame = {
    val partType = Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        (col("p_type") === "PROMO").cast("long").as("is_promo"))
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-09-01 00:00:00"))
        && col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1995-10-01 00:00:00")))
      .select(col("l_partkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev_c"))
      .join(broadcast(partType), col("l_partkey") === col("p_partkey"))
      .agg(sum(when(col("is_promo") === 1L, col("rev_c")).otherwise(0L))
        .as("promo_rev_c"), sum(col("rev_c")).as("total_rev_c"))
      .select(col("promo_rev_c"), col("total_rev_c"),
        expr("1000 * promo_rev_c div total_rev_c").as("promo_pm"))
  }

  /** §2#290 TPC-H Q17-style SMALL-QUANTITY REVENUE — revenue sitting
    * in orders of less than 20% of a part's average order quantity,
    * for one brand (Q17's "would consolidating micro-orders pay off"
    * question; no container column here, so brand alone selects the
    * family). The 20%-of-average predicate is evaluated in EXACT
    * integer arithmetic: qty < avg(qty)/5 ⇔ 5·qty·n < sum_qty — no
    * float average crosses an engine boundary.
    *
    * Shape: the brand's parts broadcast-prune lineitem; the per-part
    * (n, sum_qty) table is ≤|brand parts| rows and broadcasts back
    * over the SAME pruned frame (materialized once via the memo cut);
    * one 1-row combinable agg. The fact never shuffles. */
  def q17SmallQuantity(spark: SparkSession, sfDir: String,
      brand: String = "Brand#12"): DataFrame = {
    import graft.Checkpoints.CutOps
    val brandParts = Tables.part(spark, sfDir)
      .where(col("p_brand") === brand).select(col("p_partkey"))
    val brandLines = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        cents(col("l_extendedprice")).as("price_c"))
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .cut // feeds the per-part average AND the filtered sum
    val perPart = brandLines.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"))
    brandLines
      .join(broadcast(perPart), Seq("l_partkey"))
      .where(lit(5L) * col("qty") * col("n") < col("sum_qty"))
      .agg(count(lit(1)).as("n_lines"),
        coalesce(sum(col("price_c")), lit(0L)).as("revenue_c"))
      .select(col("n_lines"), col("revenue_c"),
        expr("revenue_c div 7").as("avg_yearly_c"))
  }

  /** §2#291 TPC-H Q22-style SALES OPPORTUNITY — customers with an
    * above-average positive balance and no order since a cutoff
    * (Q22's "have not placed orders for 7 years" lapse window — this
    * corpus spans 1995–2001, so the cutoff is 1999-01-01; WITHOUT the
    * window the result is empty at every sf: every customer has SOME
    * order), counted per nation with their total balance (Q22 groups
    * by phone country code; no phone column, so the customer's
    * nation — the same geography signal — is the grouping). The
    * average is the mean positive balance, compared in EXACT integer
    * cents (threshold = sum_c div n — floor; both engines
    * integer-only).
    *
    * Shape: the threshold is a 1-row broadcast; lapsed-customer is a
    * LEFT ANTI join against the date-filtered orders custkey
    * projection (the only shuffle, keyed on custkey; the date
    * predicate pushes to the orders scan); nation names broadcast;
    * ≤|nations| combinable agg. */
  def q22SalesOpportunity(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"),
        cents(col("c_acctbal")).as("bal_c"))
    val threshold = cust.where(col("bal_c") > 0L)
      .agg(expr("sum(bal_c) div count(1)").as("thr_c"))
    cust
      .crossJoin(broadcast(threshold))
      .where(col("bal_c") > col("thr_c"))
      .join(Tables.orders(spark, sfDir)
        .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")))
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, sfDir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_custs"), sum(col("bal_c")).as("total_bal_c"))
      .orderBy(col("n_name"))
  }

  /** §2#292 TPC-H Q2-style MIN-COST SUPPLIER — for each part of one
    * size and type, the cheapest supplier in a region (Q2's
    * correlated min-subquery, the supplier-selection report). The
    * corpus has no partsupp table: it is DERIVED in-row from part via
    * the dbgen modular-walk formula (Tables.partsupp — identical in
    * the oracle, so the gate stays hash-exact). No p_mfgr / s_address
    * / s_phone columns; p_brand and the available supplier fields
    * stand in. Costs are integer cents, so the per-part min and its
    * ties are exact.
    *
    * Shape: the size/type filter pushes into the PART SCAN under the
    * narrow derivation (four in-row rows per surviving part);
    * region's suppliers reduce to a broadcast dim (≤|suppliers|);
    * the per-part min is a combinable agg over ≤4·|filtered parts|
    * rows joined back on (partkey, cost=min) — never a window over
    * the full derived table; top-100 by TakeOrderedAndProject. */
  def q2MinCostSupp(spark: SparkSession, sfDir: String,
      sizeLo: Int = 10, sizeHi: Int = 20, ptype: String = "STANDARD",
      region: String = "EUROPE"): DataFrame = {
    val euroSupps = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .join(broadcast(Tables.region(spark, sfDir)
          .where(col("r_name") === region)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        cents(col("s_acctbal")).as("acctbal_c"))
    val cand = Tables.partsupp(spark, sfDir)
      .where(col("p_size").between(sizeLo, sizeHi) && col("p_type") === ptype)
      .join(broadcast(euroSupps), col("ps_suppkey") === col("s_suppkey"))
    val minCost = cand.groupBy(col("ps_partkey").as("mk"))
      .agg(min(col("ps_supplycost_c")).as("min_cost_c"))
    cand
      .join(broadcast(minCost), col("ps_partkey") === col("mk")
        && col("ps_supplycost_c") === col("min_cost_c"))
      .select(col("acctbal_c"), col("s_name"), col("n_name"),
        col("ps_partkey").as("p_partkey"), col("p_brand"),
        col("ps_supplycost_c"))
      // the modular walk can land two k's on one supplier at tiny S —
      // the identical duplicate row would surface here, so the output
      // is a DISTINCT set on both engines
      .distinct()
      .orderBy(col("acctbal_c").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** §2#293 TPC-H Q11-style IMPORTANT STOCK — parts whose stock value
    * (cost × availqty, integer) held by one nation's suppliers
    * exceeds 0.01% of that nation's total stock value (Q11's HAVING
    * over a scalar subquery). The fraction test is EXACT integers:
    * value > total/10000 ⇔ value·10000 > total — no float fraction
    * crosses the engine boundary.
    *
    * Shape: partsupp derives narrow from the part scan; the nation's
    * suppliers are a broadcast semi-join set; one partkey-grain
    * combinable agg (the only shuffle, ≤|parts| rows) + a 1-row total
    * broadcast; ordered output ≤|parts|. */
  def q11ImportantStock(spark: SparkSession, sfDir: String,
      nationName: String = "NATION_3"): DataFrame = {
    val natSupps = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .where(col("n_name") === nationName).select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("s_suppkey"))
    val held = Tables.partsupp(spark, sfDir)
      .join(broadcast(natSupps), col("ps_suppkey") === col("s_suppkey"),
        "left_semi")
      .select(col("ps_partkey"),
        (col("ps_supplycost_c") * col("ps_availqty")).as("v"))
    val perPart = held.groupBy(col("ps_partkey"))
      .agg(sum(col("v")).as("value_c"))
    perPart
      .crossJoin(broadcast(held.agg(sum(col("v")).as("total_c"))))
      .where(col("value_c") * lit(10000L) > col("total_c"))
      .select(col("ps_partkey"), col("value_c"))
      .orderBy(col("value_c").desc, col("ps_partkey"))
  }

  /** §2#294 TPC-H Q12-style SHIPMODE PRIORITY — for two ship modes,
    * lines received in one year that shipped before their commit date
    * but arrived after it (the "late but not our fault" SLA split),
    * counted by order priority class (urgent/high vs rest). The
    * corpus has no shipmode or commit/receipt dates: all three derive
    * in-row from (orderkey, linenumber, shipdate) in µs-integer space
    * (Tables.lineitemShip — identical in the oracle).
    *
    * Shape: mode + date-band predicates evaluate in-row on the
    * lineitem scan (the derivation is narrow, so the survivor set —
    * 2 of 7 modes × the year band — is pruned before any exchange);
    * lineitem ⋈ orders is the one fact⋈fact shuffle; ≤2-row
    * combinable agg. */
  def q12ShipmodePriority(spark: SparkSession, sfDir: String): DataFrame = {
    val y1995 = 788918400000000L // 1995-01-01T00:00:00Z in µs
    val y1996 = 820454400000000L
    Tables.lineitemShip(spark, sfDir)
      .where(col("l_shipmode").isin("MAIL", "SHIP")
        && col("l_commit_us") < col("l_receipt_us")
        && expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))") < col("l_commit_us")
        && col("l_receipt_us") >= y1995 && col("l_receipt_us") < y1996)
      .select(col("l_orderkey"), col("l_shipmode"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_shipmode"))
      .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
        .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_shipmode"))
  }

  /** §2#295 TPC-H Q16-style SUPPLIER COUNTS — distinct suppliers able
    * to supply each (brand, type, size) combination outside one
    * excluded brand/type, skipping "complaint" suppliers (Q16's
    * NOT LIKE '%Customer%Complaints%' — no s_comment column, so a
    * deterministic 1-in-7 synthetic complaint flag
    * (s_suppkey % 7 = 3) stands in, identically on both engines).
    *
    * Shape: brand/type/size filters push into the part scan under the
    * narrow derivation; complainers are a broadcast anti set
    * (≤|suppliers|/7); one combinable partial-distinct aggregate on
    * (brand, type, size, suppkey) — ≤4·|filtered parts| rows into the
    * only shuffle. */
  def q16SupplierCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val complainers = Tables.supplier(spark, sfDir)
      .where(expr("s_suppkey % 7 = 3")).select(col("s_suppkey"))
    Tables.partsupp(spark, sfDir)
      .where(col("p_brand") =!= "Brand#12" && col("p_type") =!= "PROMO"
        && col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      .join(broadcast(complainers), col("ps_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"),
        col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** q20's pre-memo fact frame — the family-pruned (partkey, suppkey)
    * roll-up with the derived availqty. Exposed (like q15Revenue) so
    * plan pins can assert the prune-below-roll-up and pushdown shape
    * that the memo cut's checkpoint scan would otherwise hide. */
  private[graft] def q20Stocked(spark: SparkSession, sfDir: String,
      family: String = "%blue%"): DataFrame = {
    val y1995 = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    val y1996 = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val famParts = Tables.part(spark, sfDir)
      .where(col("p_name").like(family)).select(col("p_partkey"))
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit(y1995) && col("l_shipdate") < lit(y1996))
      .join(broadcast(famParts), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).cast("long").as("shipped_qty"))
      .withColumn("availqty",
        expr(Tables.availqtySql("l_partkey", "l_suppkey")))
  }

  /** §2#296 TPC-H Q20-style PART PROMOTION — suppliers in one nation
    * holding excess stock of a part family relative to what they ship
    * (Q20's nested IN-chain as joins). Two corpus adaptations, both
    * documented: (1) dbgen guarantees every lineitem (partkey,
    * suppkey) pair exists in partsupp; this corpus's generator draws
    * l_suppkey independently, so the Tables.partsupp modular walk
    * intersects the fact's pairs only by 4/S coincidence — the
    * stocking bridge is therefore RECONSTRUCTED FROM THE FACT
    * (observed ship pairs, availqty from the same (part, supp)
    * integer formula partsupp uses), the standard
    * derive-the-bridge-from-the-fact warehouse move. (2) Q20's
    * literal availqty > shipped/2 is scale-DEPENDENT here (availqty
    * is bounded while this corpus grows shipments per pair, so the
    * predicate saturates empty at 10×): the excess test is instead
    * SHARE-based and scale-free — a pair qualifies when its
    * availability share exceeds its shipment share
    * (avail·Σshipped > shipped·Σavail, exact BIGINT cross-products;
    * bound: avail ≤ 10⁴ × Σshipped ≤ 9·10¹⁴ stays far under 2⁶³ up
    * to ~10⁸× this corpus). The family is '%blue%' (the corpus
    * names parts "<adj> <noun>"; no 'green'/'forest').
    *
    * Shape: the family's partkeys broadcast-prune lineitem BEFORE its
    * (partkey, suppkey)-grain roll-up (the one fact shuffle); the
    * share totals are a 1-row broadcast over that ≤|pairs| table;
    * the qualifying supplier set is aggregated-small and semi-joins
    * the supplier dim; ≤|nation's suppliers| ordered rows out. */
  def q20PartPromotion(spark: SparkSession, sfDir: String,
      family: String = "%blue%", nationName: String = "NATION_3"): DataFrame = {
    import graft.Checkpoints.CutOps
    // two consumers (share totals + excess filter) over the fact-grain
    // frame: memoize ONCE — r16 verdict #1 measured ReuseExchange NOT
    // covering the pair (two lineitem scans in the final plan); the
    // cut pins it to one, exactly the q15 idiom
    val stocked = q20Stocked(spark, sfDir, family).cut
    val totals = stocked.agg(sum(col("shipped_qty")).as("tot_shipped"),
      sum(col("availqty")).as("tot_avail"))
    val excess = stocked
      .crossJoin(broadcast(totals))
      .where(col("availqty") * col("tot_shipped")
        > col("shipped_qty") * col("tot_avail"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .where(col("n_name") === nationName).select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_name"))
  }

  /** §2#297 TPC-H Q21-style WAITING SUPPLIERS — suppliers in one
    * nation who were the SOLE late supplier on a finished multi-
    * supplier order (Q21's exists/not-exists pair, the
    * supply-chain-blame classic). Late = derived receipt after
    * derived commit (Tables.lineitemShip). Q21's correlated
    * EXISTS/NOT EXISTS re-scan lineitem twice; the single-pass form
    * rolls lineitem up ONCE per order — distinct suppliers, distinct
    * LATE suppliers and (when unique) that supplier plus their late
    * line count — then keeps orders with >1 suppliers and exactly 1
    * late one: identical semantics, one fact scan. Reported per
    * supplier: blamed orders and late lines on them.
    *
    * Shape: one orderkey-grain combinable roll-up of lineitem (the
    * fact shuffle); survivors (multi-supplier, one-late) join
    * status-F orders on the same key (pushed filter, AQE broadcasts
    * the survivor side when small); the nation's suppliers broadcast;
    * ≤|suppliers| agg; top-100 TakeOrderedAndProject. */
  def q21LateSuppliers(spark: SparkSession, sfDir: String,
      nationName: String = "NATION_3"): DataFrame = {
    val li = Tables.lineitemShip(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_receipt_us") > col("l_commit_us")).cast("long").as("late"))
    // Two-level roll-up instead of countDistinct (r17, guide §2.3):
    // the mixed distinct/non-distinct aggregate planned as an Expand —
    // THREE copies of every fact row into the first exchange. The
    // (orderkey, suppkey)-grain pre-aggregate computes the same
    // integers with no Expand (n_supps = count(groups) equals the old
    // countDistinct(l_suppkey) because l_suppkey is non-null in TPC-H
    // lineitem — a NULL suppkey would form a group count-distinct
    // ignores): n_supps = count of supplier groups,
    // n_late_supps = count of groups with any late line (any_late is
    // 0/1, so sum == count), late_supp = the max suppkey among late
    // groups, late_lines = the re-summed per-group late counts —
    // bit-identical, hash-gated against the unchanged oracle.
    val perSupp = li.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("any_late"),
        sum(col("late")).as("late_lines_s"))
    val perOrder = perSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supps"),
        sum(col("any_late")).as("n_late_supps"),
        max(when(col("any_late") === 1L, col("l_suppkey"))).as("late_supp"),
        sum(col("late_lines_s")).as("late_lines"))
      .where(col("n_supps") > 1L && col("n_late_supps") === 1L)
    perOrder
      .join(Tables.orders(spark, sfDir)
        .where(col("o_orderstatus") === "F").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(broadcast(Tables.supplier(spark, sfDir)
        .join(broadcast(Tables.nation(spark, sfDir)
          .where(col("n_name") === nationName).select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))),
        col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"), sum(col("late_lines")).as("late_lines"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** §2#277 AUDIENCE OVERLAP — the cross-feature co-usage matrix
    * every product team keeps ("how many users who do A also do B"):
    * for each event-type pair a<b, users doing both, each alone, and
    * the audience Jaccard ‰ — the number feature-bundling and
    * cross-sell decisions are read from. Uses the #261 restructure
    * directly: ONE sorted per-user type set (collect_set
    * partial-merges; ≤|types| elements), the pair space a narrow
    * in-row combination explode — never a user-keyed self-join.
    *
    * Shape: one (user)-grain combinable set build (the corpus
    * shuffle), ≤C(|types|,2) in-row pairs per user, one ≤|types|²
    * combinable count; per-type totals (≤|types| rows) broadcast
    * back. */
  def qAudienceOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.Checkpoints.CutOps
    val sets = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(array_sort(collect_set(col("event_type"))).as("ts"))
      .cut // feeds per-type totals AND the pair explode
    val perType = sets.select(explode(col("ts")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
    val pairs = sets
      .select(explode(expr(
        """flatten(transform(ts, (x, i) ->
          |  transform(slice(ts, i + 2, size(ts)),
          |    y -> struct(x AS type_a, y AS type_b))))""".stripMargin))
        .as("p"))
      .groupBy(col("p.type_a").as("type_a"), col("p.type_b").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(perType.select(col("t").as("type_a"), col("n").as("n_a"))),
        "type_a")
      .join(broadcast(perType.select(col("t").as("type_b"), col("n").as("n_b"))),
        "type_b")
      .select(col("type_a"), col("type_b"), col("n_both"), col("n_a"),
        col("n_b"),
        expr("1000 * n_both div (n_a + n_b - n_both)").as("jaccard_pm"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** §2#274 REFERENTIAL-INTEGRITY AUDIT — orphan counts for the three
    * FK edges of the star (lineitem→orders, lineitem→part,
    * orders→customer): per edge, child rows, orphans (children whose
    * parent key resolves nowhere — left_anti), and orphan ‰. The
    * report a warehouse runs after every load; a nonzero row is a
    * broken ETL step (and in a CDC-fed copy, a lost parent change —
    * the #131 snapshot-diff's cross-table cousin).
    *
    * Shape: three anti joins, each shuffling on its own key (dim
    * parents broadcast when small; AQE decides), three 1-row
    * combinable aggregates unioned. */
  def qRiAudit(spark: SparkSession, sfDir: String): DataFrame = {
    def edge(name: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String): DataFrame =
      child.join(parent, col(key) === col(pkey), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .crossJoin(broadcast(child.agg(count(lit(1)).as("n_child"))))
        .select(lit(name).as("fk_edge"), col("n_child"), col("n_orphans"),
          expr("1000 * n_orphans div greatest(n_child, 1)").as("orphan_pm"))
    val li = Tables.lineitem(spark, sfDir)
    edge("lineitem.l_orderkey->orders",
        li.select(col("l_orderkey")),
        "l_orderkey",
        Tables.orders(spark, sfDir).select(col("o_orderkey")), "o_orderkey")
      .unionByName(edge("lineitem.l_partkey->part",
        li.select(col("l_partkey")), "l_partkey",
        Tables.part(spark, sfDir).select(col("p_partkey")), "p_partkey"))
      .unionByName(edge("orders.o_custkey->customer",
        Tables.orders(spark, sfDir).select(col("o_custkey")), "o_custkey",
        Tables.customer(spark, sfDir).select(col("c_custkey")), "c_custkey"))
      .orderBy(col("fk_edge"))
  }

  /** §2#263 TPC-H Q6-style FORGONE-REVENUE scan — the canonical
    * pushed-predicate aggregate (date window × discount band ×
    * quantity cap → one row): revenue the discounts gave away, plus
    * the qualifying row count and quantity. Its entire cost is the
    * scan, which is the point: all three predicates reach the parquet
    * reader as PushedFilters (min/max row-group pruning does the rest
    * at 100 TB), and the aggregate is one map-side-combined partial —
    * the plan-audit spec family pins exactly this shape. Per-row
    * integer cents of extendedprice·discount keep the sum exact and
    * associative. */
  def q6ForgoneRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))
        && col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
        && col("l_discount") >= lit(0.05) && col("l_discount") <= lit(0.07)
        && col("l_quantity") < lit(24.0))
      .select(cents(col("l_extendedprice") * col("l_discount")).as("rev_c"),
        cents(col("l_quantity")).as("qty_c"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("rev_c")).as("forgone_revenue_c"),
        sum(col("qty_c")).as("sum_qty_c"))
      .select(col("n_rows"),
        coalesce(col("forgone_revenue_c"), lit(0L)).as("forgone_revenue_c"),
        coalesce(col("sum_qty_c"), lit(0L)).as("sum_qty_c"))
  }
}
