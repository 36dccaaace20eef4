package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.Checkpoints.CutOps
import graft.functions.Fns._

/** Time-series analytics over `events` (§2.3 extensions): gap-filled
  * series, cohort retention, running totals. All one-shuffle shapes —
  * the window/group key is always (user or series id), never a global
  * sort except the final deterministic ORDER BY. */
object TimeSeries {

  /** §2#78 gap-filled hourly series per event_type: hours with no
    * events appear with n=0 — the calendar-spine pattern. The spine is
    * generated DISTRIBUTED (per-type min/max hour → `sequence()` +
    * `explode`), so no driver-side calendar materializes; at 100 TB the
    * spine is |types| × |hours| rows — tiny next to the fact table —
    * and the left join shuffles on (event_type, hour) like any
    * pre-aggregated rollup. */
  def gapFill(spark: SparkSession, sfDir: String): DataFrame = {
    val hourUs = 3600000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"),
        (unix_micros(date_trunc("hour", col("ts")))).as("hour_us"))
    val counts = ev.groupBy(col("event_type"), col("hour_us"))
      .agg(count(lit(1)).as("n"))
    val spine = ev.groupBy(col("event_type"))
      .agg(min(col("hour_us")).as("lo"), max(col("hour_us")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), lit(hourUs))).as("hour_us"))
    spine.join(counts, Seq("event_type", "hour_us"), "left")
      .select(col("event_type"), col("hour_us"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("event_type"), col("hour_us"))
  }

  /** §2#79 cohort retention: users grouped by first-activity week
    * (cohort), counted by distinct-active-user per subsequent week
    * offset. Two map-side-combinable aggregates + one broadcast-size
    * join of per-user cohorts back onto activity — the classic
    * engagement table. At scale the per-user cohort frame is
    * |users|-sized, so it shuffle-joins on user_id (no broadcast
    * assumption); activity weeks pre-dedupe map-side. */
  def retention(spark: SparkSession, sfDir: String): DataFrame = {
    val weekUs = 7L * 24 * 3600000000L
    val act = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      // integral `div`, not `/` (which is float division on BIGINTs)
      .select(col("user_id"), expr(s"us div $weekUs").as("week"))
      .distinct()
    val cohorts = act.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    act.join(cohorts, "user_id")
      .select(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"),
        col("user_id"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** §2#90 spike detection over the gap-filled hourly series: an hour
    * is anomalous when its count exceeds 3× the trailing-24h average
    * with at least half the baseline window present. The comparison is
    * INTEGER cross-multiplication (`n · n_w > 3 · sum_w`) — no float
    * mean or stddev, so the oracle agrees exactly and no engine's
    * rounding can flip a verdict. Gap-filling first matters: without
    * the zero rows, quiet hours vanish and the trailing window would
    * silently span days. Same one-shuffle shape as [[gapFill]] plus a
    * bounded 24-row window frame the reducer streams through. */
  def anomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_us"))
      .rowsBetween(-24, -1)
    gapFill(spark, sfDir)
      .withColumn("sum_w", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("n_w", count(col("n")).over(w))
      .where(col("n_w") >= 12 && col("n") >= 5 &&
        col("n") * col("n_w") > lit(3L) * col("sum_w"))
      .select(col("event_type"), col("hour_us"), col("n"),
        col("sum_w"), col("n_w"))
      .orderBy(col("event_type"), col("hour_us"))
  }

  /** §2#80 running (cumulative) per-user value total in commit order —
    * the balance/ledger shape. One shuffle on user_id; the running-sum
    * window is an unbounded-preceding frame the reducer streams
    * through, constant state per row. Output keeps only each user's
    * LAST 5 rows (row_number from the end) so result size is bounded
    * per user while still exercising the full cumulative scan. */
  def runningTotal(spark: SparkSession, sfDir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fromEnd = Window.partitionBy(col("user_id"))
      .orderBy(col("us").desc, col("event_id").desc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), cents(col("value")).as("value_c"))
      .withColumn("running_c", sum(col("value_c")).over(cum))
      .withColumn("seq_n", row_number().over(order).cast("long"))
      .withColumn("from_end", row_number().over(fromEnd))
      .where(col("from_end") <= 5)
      .select(col("user_id"), col("seq_n"), col("event_id"),
        col("value_c"), col("running_c"))
      .orderBy(col("user_id"), col("seq_n"))
  }

  /** §2#116 SLIDING approximate distinct — trailing-24h distinct users
    * per hour ("rolling DAU"), the op where sketches are not an
    * optimization but the only feasible plan: distinct is not
    * subtractable, so an exact sliding count must re-scan every window
    * from raw ids (24× the corpus through a window), while HLL sketches
    * union associatively — ONE pass compacts each hour to a KiB sketch
    * and the 24-hour union runs over the |hours|-row frame, which the
    * raw corpus never enters. The global orderBy window is safe for the
    * same reason: it sorts hours, not events. The output is fully
    * sql-gated: the exact trailing distinct rides along (interval
    * diff-array — see inline note), and the engine-specific HLL
    * estimate participates as the est_ok accuracy bit rather than as a
    * raw value the oracle could never reproduce. */
  def slidingDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val hourIdx = Tables.events(spark, sfDir)
      .select((unix_micros(date_trunc("hour", col("ts"))) / 3600000000L)
        .cast("long").as("hi"), col("user_id"))
    val hourly = hourIdx
      .groupBy(col("hi"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("hour_exact"))
    // RANGE frames on the hour index (not ROWS): a gap hour must age
    // rows out of the trailing-24h union even though no row exists for
    // it — and the exact companion below is defined on event time, so
    // the estimate has to be too
    val w = Window.orderBy(col("hi")).rangeBetween(-23, 0)
    val est = hourly
      .withColumn("est_24h",
        hll_sketch_estimate(hll_union_agg(col("sk")).over(w)).cast("long"))
      .withColumn("n_hours_window", count(lit(1)).over(w).cast("long"))
      .select(col("hi"), col("hour_exact"), col("est_24h"),
        col("n_hours_window"))
    // EXACT trailing-24h distinct, scalably: a user active at hours
    // h_1<h_2<… is in window W iff some h_i ∈ [W−23, W]; merge the
    // per-user active hours into coverage intervals (consecutive gaps
    // ≤ 23 fuse), each interval [a,b] covers windows [a, b+23], and the
    // count per window is a ±1 boundary diff-array prefix-summed over
    // the |hours|-sized frame. One user-keyed shuffle + one |hours|-row
    // running sum — the raw ids never pass through a window frame, so
    // unlike the re-scan formulation this stays feasible at 100 TB.
    val perUserHours = hourIdx.distinct()
    val uw = Window.partitionBy(col("user_id")).orderBy(col("hi"))
    val intervals = perUserHours
      .withColumn("newIv",
        when(col("hi") - lag(col("hi"), 1).over(uw) <= 23, 0L).otherwise(1L))
      .withColumn("iv", sum(col("newIv")).over(
        uw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("iv"))
      .agg(min(col("hi")).as("a"), max(col("hi")).as("b"))
    val deltas = intervals.select(col("a").as("hi"), lit(1L).as("d"))
      .unionByName(intervals.select((col("b") + 24L).as("hi"), lit(-1L).as("d")))
      .groupBy(col("hi")).agg(sum(col("d")).as("d"))
    val cumw = Window.orderBy(col("hi"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exact = est.select(col("hi")).unionByName(deltas.select(col("hi")))
      .distinct()
      .join(deltas, Seq("hi"), "left")
      .withColumn("exact_24h", sum(coalesce(col("d"), lit(0L))).over(cumw))
      .select(col("hi"), col("exact_24h"))
    est.join(exact, "hi")
      .select((col("hi") * 3600000000L).as("hour_us"), col("hour_exact"),
        col("exact_24h"),
        col("n_hours_window"),
        // the sketch stays in the plan as a pinned accuracy bit: HLL at
        // the default lgK=12 is ~1.6% rsd, so ±10% is a ≥6σ band — a
        // broken union/estimate flips this to 0 and fails the hash gate
        when(abs(col("est_24h") - col("exact_24h")) * lit(1000L)
          <= lit(100L) * col("exact_24h"), 1L).otherwise(0L).as("est_ok"))
      .orderBy(col("hour_us"))
  }

  /** §2#104 OHLC resampling — the market-data downsampling shape: per
    * (event_type, hour) bars of open (value at earliest event), high,
    * low, close (value at latest event), count, and volume. Open/close
    * are `min_by`/`max_by` over the TOTAL order (us, event_id) — one
    * map-side-combinable aggregate, no window, no per-group sort: the
    * partial states (candidate row per partition) merge associatively,
    * so a 100 TB hour aggregates in one shuffle of |bars| rows. */
  def ohlc(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        cents(col("value")).as("value_c"))
      .groupBy(col("event_type"), col("hour_us"))
      .agg(
        min_by(col("value_c"), struct(col("us"), col("event_id"))).as("open_c"),
        max(col("value_c")).as("high_c"),
        min(col("value_c")).as("low_c"),
        max_by(col("value_c"), struct(col("us"), col("event_id"))).as("close_c"),
        count(lit(1)).as("n"),
        sum(col("value_c")).as("volume_c"))
      .orderBy(col("event_type"), col("hour_us"))

  /** §2#135 lead–lag cross-correlation between two event streams:
    * the centered integer cross-moment `Σ (a_t−ā)(b_{t+k}−b̄)` of the
    * click and purchase hourly series at lags −3..+3 h — the "do
    * clicks lead purchases, and by how much?" causality probe. The
    * peak lag is the answer; the moment is left UN-normalized (a
    * correlation coefficient needs sqrt — float — and the ARGMAX over
    * lags is invariant to the shared positive scale, so the integer
    * form decides the same question bit-stably; cf. [[Analytics.qCorrMoments]]'
    * two-pass centered recipe).
    *
    * Shape: both series gap-fill over the COMMON hour span (quiet
    * hours are real zeros, not missing pairs); means are one scalar
    * agg broadcast back; the lag fan-out is ×7 on the |hours|-sized
    * pre-aggregate, never on events; the final agg is combinable on
    * the lag. Integer-exact: counts are nonnegative so the floor
    * means are engine-identical, and products of centered counts
    * cannot overflow (|hours| × max-count² bounded far under 2^63). */
  def xcorr(spark: SparkSession, sfDir: String, maxLag: Int = 3): DataFrame = {
    val hourUs = 3600000000L
    val ev = Tables.events(spark, sfDir)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        expr(s"unix_micros(date_trunc('hour', ts)) div $hourUs").as("h"))
    val counts = ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"))
    val span = ev.groupBy(col("event_type"))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .agg(max(col("lo")).as("lo"), min(col("hi")).as("hi"))
    val spine = span.select(explode(sequence(col("lo"), col("hi"))).as("h"))
    def series(t: String) = spine
      .join(counts.where(col("event_type") === t).select(col("h"), col("n")),
        Seq("h"), "left")
      .select(col("h"), coalesce(col("n"), lit(0L)).as("n"))
    val a = series("click")
    val b = series("purchase")
    val means = a.agg(expr("sum(n) div count(1)").as("ma")).crossJoin(
      b.agg(expr("sum(n) div count(1)").as("mb")))
    val lagged = a.select(col("h"), col("n").as("na"),
        explode(sequence(lit(-maxLag.toLong), lit(maxLag.toLong))).as("lag"))
      .join(b.select(col("h").as("hb"), col("n").as("nb")),
        col("hb") === col("h") + col("lag"))
    lagged.crossJoin(broadcast(means))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("na") - col("ma")) * (col("nb") - col("mb"))).as("sxy"))
      .orderBy(col("lag"))
  }

  /** §2#172 AUTOCORRELATION function (ACF) at lags 1..maxLag per
    * event_type over the gap-filled hourly count series — the
    * periodicity detector behind seasonality choices ([[seasonal]]
    * assumes a 24 h cycle; the ACF is how you find out it IS 24):
    * `sac(lag) = Σ(n_t−μ)(n_{t−lag}−μ)` with the full-series second
    * moment `m2 = Σ(n_t−μ)²` as the lag-0 normalizer, both exact
    * integers around the integer mean (same centered-moment recipe as
    * [[xcorr]] / q_corr_moments — no float ACF to diverge on; the
    * consumer divides sac/m2 at display time).
    *
    * Shape: everything after the per-hour pre-aggregate runs on
    * |types|×|hours| rows — the lag fan-out (×maxLag) and the
    * self-join at `h − lag` touch the tiny series, never the events
    * that built it; μ and m2 are broadcast. At 100 TB the hourly
    * pre-agg is the only pass over the feed. */
  def autocorr(spark: SparkSession, sfDir: String, maxLag: Int = 6): DataFrame = {
    val hourUs = 3600000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr(s"unix_micros(date_trunc('hour', ts)) div $hourUs").as("h"))
    val counts = ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"))
    val spine = ev.groupBy(col("event_type"))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("h"))
    val g = spine.join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), coalesce(col("n"), lit(0L)).as("n"))
    val mu = g.groupBy(col("event_type"))
      .agg(expr("sum(n) div count(1)").as("mu"))
    val m2 = g.join(broadcast(mu), "event_type")
      .groupBy(col("event_type"), col("mu"))
      .agg(sum((col("n") - col("mu")) * (col("n") - col("mu"))).as("m2"))
    val fan = g.select(col("event_type"), col("h"), col("n").as("na"),
        explode(sequence(lit(1L), lit(maxLag.toLong))).as("lag"))
      .withColumn("h_want", col("h") - col("lag"))
    // equi-join on (event_type, h − lag): hash join, no per-type cross
    fan.join(g.select(col("event_type").as("et_b"), col("h").as("hb"),
          col("n").as("nb")),
        col("et_b") === col("event_type") && col("hb") === col("h_want"))
      .join(broadcast(m2), Seq("event_type"))
      .groupBy(col("event_type"), col("lag"), col("mu"), col("m2"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("na") - col("mu")) * (col("nb") - col("mu"))).as("sac"))
      .select(col("event_type"), col("lag"), col("n_pairs"),
        col("sac"), col("m2"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** §2#130 seasonal decomposition by hour-of-day: the gap-filled
    * hourly series splits into a 24-slot seasonal profile (integer mean
    * count per (event_type, hour-of-day), quiet hours counted as 0 so
    * the profile is honest) and a residual `n − seasonal_n` per hour —
    * classic seasonal-naive decomposition, the step before any
    * calendar-aware anomaly rule ([[anomaly]]'s trailing-window test is
    * season-blind; this one knows 3 AM is always quiet). All-integer:
    * the seasonal mean is `sum div count` over nonnegative operands.
    *
    * Shape: two map-side-combinable aggregates (per-hour counts, then
    * per-slot sums) + a broadcast-tiny profile join back (|types|×24
    * rows); the spine is the same distributed calendar as [[gapFill]].
    * Residuals can be negative — they are differences of counts, not
    * divisions, so no floor-semantics divergence. */
  def seasonal(spark: SparkSession, sfDir: String): DataFrame = {
    val hourUs = 3600000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr(s"unix_micros(date_trunc('hour', ts)) div $hourUs").as("h"))
    val counts = ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"))
    val spine = ev.groupBy(col("event_type"))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("h"))
    val g = spine.join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n"), lit(0L)).as("n"),
        pmod(col("h"), lit(24L)).as("hod"))
    val profile = g.groupBy(col("event_type"), col("hod"))
      .agg(sum(col("n")).as("s"), count(lit(1)).as("c"))
      .select(col("event_type"), col("hod"), expr("s div c").as("seasonal_n"))
    g.join(broadcast(profile), Seq("event_type", "hod"))
      .select(col("event_type"), col("h").as("hour_idx"), col("hod"),
        col("n"), col("seasonal_n"),
        (col("n") - col("seasonal_n")).as("residual"))
      .orderBy(col("event_type"), col("hour_idx"))
  }

  /** §2#124 linear interpolation over the gap-filled hourly series:
    * quiet hours get the integer weighted average of the nearest
    * observed neighbors, `(pv·(nh−h) + nv·(h−ph)) div (nh−ph)` — the
    * standard time-series imputation step before modeling. Hours
    * before the first / after the last observation stay NULL
    * (`src='edge'`): extrapolation is a policy choice, not data.
    *
    * Numerics: event values are nonnegative (values in cents ≥ 0), so
    * numerator and denominator are both nonnegative and `div` ==
    * floor == trunc in every engine — no float lerp, no negative-
    * division semantics to diverge on. Shape: the spine + neighbor
    * lookup is ONE window pass per direction over the per-hour
    * pre-aggregate (|types|×|hours| rows — tiny next to the events
    * that built it), partitioned by event_type; constant per-row
    * frame state, no whole-group buffering. */
  def interpolate(spark: SparkSession, sfDir: String): DataFrame = {
    val hourUs = 3600000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr(s"unix_micros(date_trunc('hour', ts)) div $hourUs").as("h"),
        cents(col("value")).as("v_c"))
    val obs = ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"), sum(col("v_c")).as("sum_c"))
    val spine = ev.groupBy(col("event_type"))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("h"))
    val g = spine.join(obs, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n"), lit(0L)).as("n"), col("sum_c"))
      .withColumn("h_obs", when(col("n") > 0, col("h")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val after = w.rowsBetween(1, Window.unboundedFollowing)
    g.withColumn("ph", last(col("h_obs"), ignoreNulls = true).over(before))
      .withColumn("pv", last(col("sum_c"), ignoreNulls = true).over(before))
      .withColumn("nh", first(col("h_obs"), ignoreNulls = true).over(after))
      .withColumn("nv", first(col("sum_c"), ignoreNulls = true).over(after))
      .withColumn("filled_c",
        when(col("n") > 0, col("sum_c"))
          .when(col("ph").isNotNull && col("nh").isNotNull,
            expr("(pv * (nh - h) + nv * (h - ph)) div (nh - ph)")))
      .withColumn("src",
        when(col("n") > 0, lit("obs"))
          .when(col("filled_c").isNotNull, lit("interp"))
          .otherwise(lit("edge")))
      .select(col("event_type"), col("h").as("hour_idx"), col("n"),
        col("filled_c"), col("src"))
      .orderBy(col("event_type"), col("hour_idx"))
  }

  /** §2#148 integer EWMA smoothing over the gap-filled hourly series —
    * the exponentially-weighted baseline every alerting rule compares
    * against (trailing-average [[anomaly]] forgets linearly; EWMA
    * forgets geometrically). α = 1/8 in milli-units:
    * `s_0 = 1000·n_0`, `s_t = (7·s_{t-1} + 1000·n_t) div 8` — every
    * operand nonnegative, so `div` == floor in both engines and no
    * float accumulation can diverge.
    *
    * Shape: an EWMA is an inherently SEQUENTIAL recurrence, so the
    * engine does the one thing that parallelizes: compact the corpus
    * to per-(type, hour) counts first (map-side combinable — the only
    * shuffle events pay), then fold each series with a higher-order
    * `aggregate` over its sorted array. The fold's group is
    * CALENDAR-bounded (|hours| per type — ~9k rows/series-year no
    * matter how many events an hour holds), the same boundedness
    * argument as [[seasonal]]; series fold in parallel across types.
    * At 100 TB the recurrence cost is unchanged — only the
    * pre-aggregation grows, and that is the combinable part. Oracle:
    * DuckDB computes the identical recurrence by recursive CTE. */
  def ewma(spark: SparkSession, sfDir: String): DataFrame = {
    val step = // milli-scaled recurrence; acc.prev < 0 marks "first row"
      "CASE WHEN acc.prev < 0 THEN 1000 * x.n " +
        "ELSE (7 * acc.prev + 1000 * x.n) div 8 END"
    gapFill(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("hour_us"), col("n"))))
        .as("series"))
      .select(col("event_type"), expr(
        s"""inline(aggregate(
           |  series,
           |  struct(
           |    CAST(-1 AS BIGINT) AS prev,
           |    CAST(array() AS
           |      array<struct<hour_us:bigint,n:bigint,ewma_milli:bigint>>)
           |      AS out),
           |  (acc, x) -> struct(
           |    CAST(($step) AS BIGINT) AS prev,
           |    array_append(acc.out, named_struct(
           |      'hour_us', x.hour_us, 'n', x.n,
           |      'ewma_milli', CAST(($step) AS BIGINT))) AS out),
           |  acc -> acc.out))""".stripMargin))
      .orderBy(col("event_type"), col("hour_us"))
  }

  /** §2#149 CUSUM change-point detection over the gap-filled hourly
    * series: the hour where the cumulative deviation from the series
    * mean peaks — the classic "when did the level shift?" probe (Page
    * 1954's CUSUM, offline form). All-integer: the centered prefix
    * `C_t = T·P_t − t·S` (T hours, S total, P_t prefix sum) is the
    * mean-centered CUSUM scaled by T — scaling by the positive
    * constant T preserves the argmax and removes the float mean.
    * Verdict per type: the argmax hour of |C_t| (ties → earliest),
    * with milli-scaled before/after means quantifying the shift.
    *
    * Shape: corpus → per-hour counts (one combinable shuffle), totals
    * broadcast back, ONE unbounded-preceding window over the
    * |hours|-sized series for P_t (constant reducer state), and a
    * map-side-combinable `max_by` argmax — never a sort of the series,
    * never raw events in a window. */
  def changepoint(spark: SparkSession, sfDir: String): DataFrame = {
    val hourUs = 3600000000L
    val g = gapFill(spark, sfDir)
    val totals = g.groupBy(col("event_type"))
      .agg(count(lit(1)).as("t_hours"), sum(col("n")).as("s_total"),
        min(col("hour_us")).as("lo"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("p", sum(col("n")).over(w))
      .join(broadcast(totals), "event_type")
      .withColumn("t", expr(s"(hour_us - lo) div $hourUs + 1"))
      .withColumn("c", abs(col("t_hours") * col("p") - col("t") * col("s_total")))
      .groupBy(col("event_type"))
      .agg(
        max_by(struct(col("hour_us"), col("t"), col("c"), col("p")),
          struct(col("c"), (-col("t")).as("nt"))).as("cp"),
        max(col("t_hours")).as("n_hours"),
        max(col("s_total")).as("s_total"))
      .select(col("event_type"),
        col("cp.hour_us").as("cp_hour_us"),
        col("cp.t").as("cp_idx"),
        col("cp.c").as("cusum_abs"),
        expr("1000 * cp.p div cp.t").as("mean_before_milli"),
        expr("CASE WHEN cp.t < n_hours THEN " +
          "1000 * (s_total - cp.p) div (n_hours - cp.t) END")
          .as("mean_after_milli"),
        col("n_hours"))
      .orderBy(col("event_type"))
  }

  /** §2#159 perceptual DOWNSAMPLING of the hourly series — the
    * largest-triangle family (Steinarsson 2013, the LTTB thesis;
    * one-bucket variant): keep, per daily bucket, the hour whose
    * triangle with its immediate neighbors has the largest area — on a
    * unit-spaced series that area reduces to the integer DISCRETE
    * CURVATURE `|n_prev + n_next − 2·n|`, so the op keeps spikes,
    * drops, and kinks and discards the straight runs a dashboard can
    * interpolate. 24× smaller series, visually faithful — the standard
    * pre-render compaction for monitoring UIs. Missing neighbors at
    * the series edges count 0 (quiet outside the span), keeping the
    * formula total and engine-identical.
    *
    * Shape: curvature is a ±1-row window over the |hours|-sized
    * pre-aggregate (constant reducer state), bucket argmax is a
    * map-side-combinable `max_by` (ties → earliest hour) — the raw
    * corpus only ever pays its one compaction shuffle. */
  def downsample(spark: SparkSession, sfDir: String,
      bucketHours: Int = 24): DataFrame = {
    val hourUs = 3600000000L
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_us"))
    gapFill(spark, sfDir)
      .withColumn("area2", abs(
        coalesce(lag(col("n"), 1).over(w), lit(0L)) +
          coalesce(lead(col("n"), 1).over(w), lit(0L)) - lit(2L) * col("n")))
      .withColumn("lo", min(col("hour_us")).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("bucket", expr(s"(hour_us - lo) div $hourUs div $bucketHours"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(
        max_by(struct(col("hour_us"), col("n"), col("area2")),
          struct(col("area2"), -col("hour_us"))).as("sel"),
        count(lit(1)).as("n_hours_in_bucket"))
      .select(col("event_type"), col("bucket"),
        col("sel.hour_us").as("sel_hour_us"), col("sel.n").as("sel_n"),
        col("sel.area2").as("area2"), col("n_hours_in_bucket"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** §2#143 event-time lateness profile — the measurement that SIZES a
    * watermark: for each event, how far its event time trails the
    * maximum event time already seen in its key's feed (commit order =
    * event_id, the arrival order a streaming consumer observes;
    * per-user frontier, the per-key analogue of Structured Streaming's
    * watermark frontier). The per-type histogram (on-time / ≤1min /
    * ≤1h / later, plus the max) is exactly what you read before
    * choosing `withWatermark("ts", <delay>)`: the bucket that covers
    * your loss tolerance is the delay to configure.
    *
    * Shape: one hash exchange on user_id for the running-max window
    * (per-key frontier — never a global sort), then a map-side-
    * combinable aggregate on event_type (|types| rows out). At 100 TB
    * the window state is O(1) per user (a running max), and the
    * exchange is the same partitioning every per-user op shares. */
  def lateness(spark: SparkSession, sfDir: String): DataFrame =
    latenessFrom(Tables.events(spark, sfDir))

  /** Core of [[lateness]] over any `(event_id, ts, user_id,
    * event_type)` frame. */
  def latenessFrom(events: DataFrame): DataFrame = {
    val minUs = 60000000L
    val hourUs = 3600000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val late = events
      .select(col("event_type"),
        (max(unix_micros(col("ts"))).over(w) - unix_micros(col("ts")))
          .as("late_us"))
    late.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") === 0L, 1L).otherwise(0L)).as("on_time"),
        sum(when(col("late_us") > 0L && col("late_us") <= minUs, 1L)
          .otherwise(0L)).as("late_1m"),
        sum(when(col("late_us") > minUs && col("late_us") <= hourUs, 1L)
          .otherwise(0L)).as("late_1h"),
        sum(when(col("late_us") > hourUs, 1L).otherwise(0L)).as("late_more"),
        max(col("late_us")).as("max_late_us"))
      .orderBy(col("event_type"))
  }

  /** §2#207 DAU / WAU / STICKINESS — the engagement dashboard's
    * headline series: per day, distinct daily actives, distinct
    * trailing-7-day actives, and DAU·1000/WAU (the stickiness ratio
    * product teams track; 1000‰ = every weekly user shows up daily).
    * The trailing-window distinct is computed WITHOUT a distinct-over-
    * range window (which neither engine does): each (user, day) row
    * contributes itself to the 7 forward days, so WAU(d) = distinct
    * users in [d−6, d] becomes a 7× explode + distinct + count —
    * exact, shuffle keyed on (user, day), identical integer logic on
    * both engines. Cost: 7× the (user, day) DISTINCT frame — already
    * collapsed from the raw feed, so the explosion never touches
    * events. */
  def dauWau(spark: SparkSession, sfDir: String): DataFrame = {
    val dayUs = 86400000000L
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"unix_micros(ts) div $dayUs").as("day"))
      .distinct()
      .cut
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6L)).as("wday"))
      .distinct()
      .groupBy(col("wday").as("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        expr("dau * 1000 div wau").as("stickiness_pm"))
      .orderBy(col("day"))
  }

  /** §2#196 COHORT RETENTION MATRIX — the classic product-analytics
    * triangle: users grouped by their FIRST-activity week (the
    * cohort), each cell = how many of that cohort were active `offset`
    * weeks later, as a count and a per-mille of the cohort's size
    * (offset 0 is the cohort itself, 1000‰ by construction — kept as
    * the sanity diagonal). The aggregate twin is ts_retention (#79,
    * week-over-week); the matrix is what growth teams actually read,
    * because it separates product change (columns) from cohort quality
    * (rows).
    *
    * Shape: one (user, week) distinct pass, one per-user min for the
    * cohort (both map-side-combinable on user_id), a join back on
    * user_id, then a |cohorts|×|offsets|-bounded aggregate + a
    * broadcast-joined cohort-size table. The events feed is never
    * windowed or sorted. */
  def cohortMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val weekUs = 7L * 24 * 3600000000L
    val uw = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr(s"unix_micros(ts) div $weekUs").as("wk"))
      .distinct()
    val cohort = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    val sizes = cohort.groupBy(col("cohort_wk"))
      .agg(count(lit(1)).as("cohort_size"))
    uw.join(cohort, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_wk")
      .select(col("cohort_wk"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        expr("n_active * 1000 div cohort_size").as("retention_pm"))
      .orderBy(col("cohort_wk"), col("week_offset"))
  }

  /** §2#189 LINEAR TREND per event type — ordinary least squares over
    * the hourly counts, in the suite's exact-integer style: instead of
    * `regr_slope` (whose double accumulation ORDER differs between a
    * partial-agg engine and a sequential one — a genuine cross-engine
    * rounding seam), the four OLS sufficient statistics Σx, Σy, Σxy,
    * Σx² are summed as LONGS (exact, order-free, map-side-combinable),
    * and slope / intercept / next-hour forecast each come out of ONE
    * closed-form division on those integers:
    *
    *   slope      = (nΣxy − ΣxΣy) / D            (µ-counts per hour)
    *   intercept  = (ΣyΣx² − ΣxΣxy) / D          (milli-counts)
    *   forecast   = (ΣyΣx² − ΣxΣxy + (nΣxy − ΣxΣy)·x*) / D
    *   with D = nΣx² − (Σx)², x* = the hour after the last observed
    *
    * so both engines round the SAME two longs and the hash compare is
    * exact. x is the hour index relative to the GLOBAL min hour (the
    * broadcast 1-row scalar) — relative indexing keeps every product
    * within long range (absolute epoch-hours would push ΣyΣx² past
    * 2^63).
    *
    * Shape at 100 TB: one map-side-combined (type, hour) count, one
    * |types|-row stats agg, a broadcast scalar — the raw feed is never
    * sorted or windowed. */
  def trend(spark: SparkSession, sfDir: String): DataFrame = {
    val hourUs = 3600000000L
    val counts = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr(s"unix_micros(date_trunc('hour', ts)) div $hourUs").as("h"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("y"))
    val minH = counts.agg(min(col("h")).as("h0"))
    val stats = counts.crossJoin(broadcast(minH))
      .withColumn("x", col("h") - col("h0"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), max(col("x")).as("xmax"))
      .where(col("n") >= 2L)
    stats.select(col("event_type"), col("n").as("n_hours"),
        round(lit(1000000.0) * (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
          .cast("long").as("slope_e6"),
        round(lit(1000.0) * (col("sy") * col("sxx") - col("sx") * col("sxy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
          .cast("long").as("intercept_e3"),
        round(lit(1000.0) *
          (col("sy") * col("sxx") - col("sx") * col("sxy") +
            (col("n") * col("sxy") - col("sx") * col("sy")) * (col("xmax") + 1L)) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
          .cast("long").as("forecast_next_e3"))
      .orderBy(col("event_type"))
  }

  /** §2#242 BURSTINESS via the index of dispersion (Fano factor,
    * variance-to-mean of the per-hour event counts INCLUDING the
    * empty hours of the user's active span): a Poisson visitor reads
    * ≈ 1000‰, a human's diurnal rhythm somewhat above, and a
    * scripted crawler either far above (burst-sleep loops) or far
    * below (metronome schedulers) — the classic traffic-shape screen
    * that rate thresholds (#230 is the enforcement side) can't see.
    * Empty hours matter: over only the NONEMPTY hours a burst-sleep
    * bot looks Poisson; over the span it doesn't — and the zeros are
    * FREE to include, since with Σ over nonempty hours and n = span,
    * Σx and Σx² are unchanged by zero terms.
    *
    * Exact integers: dispersion = ((n·Σx² − S²) div (S·(n−1)))
    * per-mille with the usual greatest(·,1) guards (single-hour
    * spans report 0 — no variance to speak of). The per-mille is
    * formed as `1000·q + (1000·rem) div den` (q/rem = the raw
    * quotient/remainder) — exactly floor(1000·num/den) WITHOUT
    * forming 1000·num, which overflows BIGINT for a genuinely hot
    * key (10⁶ events in one hour over a decade-long span puts
    * span·Σx² near 10¹⁷; ×1000 crosses 2⁶³ — the same split
    * [[Sampling.sampleEpochs]] uses for its budget). num itself
    * stays safe while span·Σx² < 2⁶³ — a per-user HOURLY count
    * table pushing that bound is itself the anomaly.
    *
    * Shape: one map-side-combinable (user, hour) count — the only
    * corpus-sized shuffle — then a combinable per-user agg. */
  def dispersion(spark: SparkSession, sfDir: String): DataFrame =
    dispersionOf(Tables.events(spark, sfDir))

  /** [[dispersion]] over any (user_id, ts) frame. */
  def dispersionOf(events: DataFrame): DataFrame = {
    val hourUs = 3600000000L
    events
      .select(col("user_id"),
        expr(s"unix_micros(date_trunc('hour', ts)) div $hourUs").as("h"))
      .groupBy(col("user_id"), col("h"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("user_id"))
      .agg((max(col("h")) - min(col("h")) + 1L).as("span_hours"),
        count(lit(1)).as("active_hours"),
        sum(col("x")).as("n_events"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("num", expr("span_hours * sxx - n_events * n_events"))
      .withColumn("den", expr("greatest(n_events * (span_hours - 1), 1)"))
      .select(col("user_id"), col("span_hours"), col("active_hours"),
        col("n_events"),
        expr("1000 * (num div den) + (1000 * (num % den)) div den")
          .as("dispersion_pm"))
      .orderBy(col("user_id"))
  }

  /** §2#268 CALENDAR PROFILE — the day-of-week × hour-of-day activity
    * matrix (the ops heatmap behind capacity planning and anomaly
    * baselines: "is Tuesday 14:00 normally this quiet?"): per cell,
    * event count, integer-cents value, and the cell's share of total
    * traffic in ‰. Calendar fields derive from epoch µs by pure
    * integer arithmetic — dow = (days since epoch + 4) mod 7
    * (1970-01-01 was a Thursday; 0 = Sunday), hour = hours mod 24 —
    * so both engines compute the identical UTC cell with no locale /
    * week-origin seam (Spark dayofweek and DuckDB dayofweek disagree
    * on numbering; arithmetic doesn't).
    *
    * Shape: one ≤168-group map-side-combined aggregate + a broadcast
    * scalar. Scan-bound at any scale. */
  def calendarProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.events(spark, sfDir)
      .select(unix_micros(col("ts")).as("us"), cents(col("value")).as("v_c"))
      .select(expr("(us div 86400000000 + 4) % 7").as("dow"),
        expr("(us div 3600000000) % 24").as("hour"), col("v_c"))
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_events"), sum(col("v_c")).as("value_c"))
    val total = cells.agg(sum(col("n_events")).as("t"))
    cells.crossJoin(broadcast(total))
      .select(col("dow"), col("hour"), col("n_events"), col("value_c"),
        expr("1000 * n_events div t").as("share_pm"))
      .orderBy(col("dow"), col("hour"))
  }

  /** §2#281 PURCHASE-GAP HISTOGRAM — the repeat-cycle report behind
    * replenishment marketing and churn definitions ("a customer is
    * churned after X× their typical gap"): consecutive same-user
    * purchase gaps, folded into a log₂ histogram of whole minutes
    * (bucket 0 = under a minute, b ≥ 1 = [2^(b−1), 2^b) minutes — the
    * StreamLateness bucket convention), with each bucket's share ‰.
    * The distribution's knee is the natural churn cutoff.
    *
    * Shape: purchase filter pushes to the scan, one per-user lag
    * window over each user's purchases, one ≤64-group combinable
    * count + broadcast scalar. Gaps are ordered-nonnegative by the
    * window order, so the minute div is #243-safe. */
  def purchaseGaps(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val buckets = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(expr("(us - prev) div 60000000").as("gap_min"))
      .select(expr("CASE WHEN gap_min <= 0 THEN 0 " +
        "ELSE length(bin(gap_min)) END").cast("long").as("log2_gap_min"))
      .groupBy(col("log2_gap_min")).agg(count(lit(1)).as("n_gaps"))
    val total = buckets.agg(sum(col("n_gaps")).as("t"))
    buckets.crossJoin(broadcast(total))
      .select(col("log2_gap_min"), col("n_gaps"),
        expr("1000 * n_gaps div t").as("share_pm"))
      .orderBy(col("log2_gap_min"))
  }

  /** §2#278 MAX DRAWDOWN — the classic risk statistic (peak-to-trough
    * of a running balance; Magdon-Ismail et al. 2004 made its
    * distribution canonical) per user: daily net cents folded into a
    * running balance, tracked against its running peak; the report
    * carries days active, final and peak balance, and the worst
    * peak-to-trough drop — the exposure number a credit/fraud model
    * keys on. All-integer: drawdown_c = max(running_max − balance) ≥ 0
    * by construction.
    *
    * Shape: one (user, day) combinable sum (the corpus shuffle), two
    * per-user windows over each user's ≤|days| daily ledger (cumsum +
    * running max — never over raw events), one per-user aggregate. */
  def drawdown(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        cents(col("value")).as("v_c"))
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("v_c")).as("net_c"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("bal", sum(col("net_c")).over(w))
      .withColumn("peak", max(col("bal")).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("net_c")).as("final_balance_c"), // = the last bal
        max(col("peak")).as("peak_balance_c"),
        max(col("peak") - col("bal")).as("max_drawdown_c"))
      .orderBy(col("user_id"))
  }

  /** §2#275 WEEK-OVER-WEEK CHANGE — the trend ledger behind every
    * "up/down X% vs last week" dashboard number: per (event_type,
    * epoch week), event count + integer-cents value, each with its
    * previous-week value and the signed WoW delta in ‰. The change
    * ratio of a SIGNED delta is the #243 seam (Spark div truncates,
    * DuckDB // floors — they disagree below zero), so the ‰ is
    * computed sign-split: ±(1000·|Δ| div prev) — floor of a
    * non-negative quotient in both engines, sign reapplied by CASE.
    * Weeks with no predecessor (first week per type) carry NULL-free
    * sentinel −1 ‰ and prev = 0.
    *
    * Shape: one ≤(|types|·|weeks|)-group combinable aggregate (the
    * only corpus-sized shuffle), one lag window PER TYPE over that
    * ledger — never over the corpus. */
  def wowChange(spark: SparkSession, sfDir: String): DataFrame = {
    val weekly = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 604800000000").as("week"),
        cents(col("value")).as("v_c"))
      .groupBy(col("event_type"), col("week"))
      .agg(count(lit(1)).as("n"), sum(col("v_c")).as("value_c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("week"))
    weekly
      .withColumn("n_prev", lag(col("n"), 1).over(w))
      .select(col("event_type"), col("week"), col("n"), col("value_c"),
        coalesce(col("n_prev"), lit(0L)).as("n_prev"),
        expr("""CASE WHEN n_prev IS NULL THEN -1
               |  WHEN n >= n_prev THEN 1000 * (n - n_prev) div greatest(n_prev, 1)
               |  ELSE -(1000 * (n_prev - n) div n_prev) END""".stripMargin)
          .as("wow_pm"))
      .orderBy(col("event_type"), col("week"))
  }

  /** §2#276 SESSION CONCURRENCY — peak simultaneous sessions per UTC
    * day, by the classic sweep-line: every session contributes +1 at
    * its start and −1 at its end; the running sum's maximum is the
    * exact peak (the capacity number a connection pool / licensing /
    * autoscaler is sized against). Sessions are the #14 lag+cumsum
    * sessions (same 30-min gap rule, oracle shares the CTE).
    *
    * The sweep needs a TIME-ORDERED prefix sum — a global sort at
    * corpus scale — so sessions are first CLIPPED AT DAY BOUNDARIES
    * (a session [s,e] splits into per-day segments; fanout = days
    * spanned, ~1 for 30-min-gap sessions) and the sweep runs PER DAY:
    * embarrassingly parallel across days, each day's window over that
    * day's segment endpoints only. Ties order +1 before −1 (delta
    * DESC), so a session starting exactly when another ends counts as
    * overlap — the inclusive-interval convention; the per-day MAX is
    * invariant to permutation within equal (us, delta) groups, so the
    * row-frame cumsum is deterministic across engines and partition
    * counts.
    *
    * Shape: one sessionize window (the corpus shuffle), ≤2·segments
    * sweep points, per-day windows, one ≤|days| aggregate. */
  def sessionConcurrency(spark: SparkSession, sfDir: String): DataFrame = {
    val dayUs = 86400000000L
    val sessions = StreamOps.sessionize(spark, sfDir)
      .select(col("start_us"), col("end_us"))
    val segments = sessions
      .select(col("start_us"), col("end_us"),
        explode(sequence(expr(s"start_us div $dayUs"),
          expr(s"end_us div $dayUs"))).as("day"))
      .select(col("day"),
        greatest(col("start_us"), expr(s"day * $dayUs")).as("ss"),
        least(col("end_us"), expr(s"(day + 1) * $dayUs - 1")).as("se"))
    val points = segments.select(col("day"), col("ss").as("us"),
        lit(1L).as("delta"))
      .unionByName(segments.select(col("day"), col("se").as("us"),
        lit(-1L).as("delta")))
    val sweep = Window.partitionBy(col("day"))
      .orderBy(col("us"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    points.withColumn("run", sum(col("delta")).over(sweep))
      .groupBy(col("day"))
      .agg(expr("count(1) div 2") // two sweep points per segment
          .as("n_segments"),
        max(col("run")).as("peak_concurrency"))
      .orderBy(col("day"))
  }

  /** §2#269 GROWTH ACCOUNTING — the daily new/returning/cumulative
    * user ledger (the startup-metrics standard, e.g. the Social
    * Capital framework): per epoch day, distinct active users, users
    * seen for the FIRST time ever, returning = active − new, the
    * running total of distinct users ever seen, and the raw event
    * count. First-seen is a per-user min — one user-grain aggregate,
    * no day² self-join; the cumulative sum runs over the ≤|days|
    * ledger, never the corpus.
    *
    * Shape: one (day, user) combinable dedup count (the corpus
    * shuffle), one user-grain min, two ≤|days| aggregates + one
    * window over the ledger. */
  def growthAccounting(spark: SparkSession, sfDir: String): DataFrame = {
    val du = Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        col("user_id"))
      .groupBy(col("day"), col("user_id")).agg(count(lit(1)).as("n_ev"))
    val daily = du.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"), sum(col("n_ev")).as("n_events"))
    val firstSeen = du.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    daily.join(firstSeen, Seq("day"), "left")
      .na.fill(0L, Seq("new_users"))
      .withColumn("cum_users",
        sum(col("new_users")).over(Window.orderBy(col("day"))))
      .select(col("day"), col("dau"), col("new_users"),
        (col("dau") - col("new_users")).as("returning_users"),
        col("cum_users"), col("n_events"))
      .orderBy(col("day"))
  }
}
