package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Temporal join operators Spark lacks as built-ins (§2.3 extensions).
  *
  * Both are expressed shuffle-once-on-the-key, never as nested-loop
  * joins: the as-of join is a tagged-union + running `last` window (one
  * shuffle on user_id); the range join buckets time so candidates are
  * bucket-local (one shuffle on (user, bucket)) — at 100 TB neither
  * degenerates into a cross product.
  */
object Temporal {

  /** §2#38 as-of join: each purchase event matched to the most recent
    * strictly-prior click of the same user. Union-tag + running-last
    * window — the standard scalable as-of formulation. */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("last_click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_click_us",
        last(when(col("event_type") === "click", col("us")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase" && col("last_click_id").isNotNull)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("us").as("purchase_us"), col("last_click_id"), col("last_click_us"),
        (col("us") - col("last_click_us")).as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  /** §2#132 the NATIVE twin of [[asofJoin]]: the same purchases-to-
    * last-prior-click match through the custom [[graft.plans.AsOfJoin]]
    * physical operator (hash-cluster + sort per side, then an O(1)-
    * memory streaming merge) instead of the union-tag window. Shares
    * q_asof_join's DuckDB oracle bit-for-bit — the strongest possible
    * check a custom join operator can get. */
  def asofNative(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("us"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("us"))
    graft.plans.AsOfJoin.ofDF(purchases, clicks,
        Seq("user_id", "purchase_id", "purchase_us",
          "last_click_id", "last_click_us"))
      .withColumn("gap_us", col("purchase_us") - col("last_click_us"))
      .orderBy(col("purchase_id"))
  }

  /** §2#162 LEFT OUTER as-of join through the custom operator: every
    * purchase emits — matched to its last strictly-prior click, or
    * with NULL click columns when the user never clicked before (the
    * "unattributed purchase" rows an attribution report must count,
    * which the inner form silently drops). Same single-pass O(1)-state
    * merge, one extra branch; the physical operator's `outer` flag is
    * the only difference, and the DuckDB oracle is the windowed LEFT
    * formulation — the custom plan and the engine's declarative twin
    * hash-match on both the matched AND unmatched rows. */
  def asofLeftNative(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("us"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("us"))
    graft.plans.AsOfJoin.ofDF(purchases, clicks,
        Seq("user_id", "purchase_id", "purchase_us",
          "last_click_id", "last_click_us"), outer = true)
      .withColumn("gap_us", col("purchase_us") - col("last_click_us"))
      .withColumn("attributed",
        when(col("last_click_id").isNotNull, 1L).otherwise(0L))
      .orderBy(col("purchase_id"))
  }

  /** §2#181 NEAREST-direction as-of join (pandas merge_asof
    * direction='nearest'): each purchase matched to the closest click
    * in EITHER direction — the sensor-fusion/attribution variant where
    * "the click just after" beats "the click hours before". Completes
    * the direction trio: backward (#38/#132), backward-outer (#162),
    * nearest (here).
    *
    * Same shuffle-once shape as the backward form: ONE window
    * ordering per user serves both directions (running `last` over
    * the preceding frame, running `first` over the following frame —
    * no second shuffle, both frames stream over the same sort), then
    * a per-row argmin of the two gaps. Ties (equal gaps, including
    * the 0/0 same-instant case) break BACKWARD — deterministic and
    * matching the backward family's bias. */
  def asofNearest(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val back = ord.rowsBetween(Window.unboundedPreceding, -1)
    val fwd = ord.rowsBetween(1, Window.unboundedFollowing)
    def clickCol(c: String): org.apache.spark.sql.Column =
      when(col("event_type") === "click", col(c))
    ev
      .withColumn("b_id", last(clickCol("event_id"), ignoreNulls = true).over(back))
      .withColumn("b_us", last(clickCol("us"), ignoreNulls = true).over(back))
      .withColumn("f_id", first(clickCol("event_id"), ignoreNulls = true).over(fwd))
      .withColumn("f_us", first(clickCol("us"), ignoreNulls = true).over(fwd))
      .where(col("event_type") === "purchase" &&
        (col("b_id").isNotNull || col("f_id").isNotNull))
      .withColumn("gap_b", col("us") - col("b_us"))
      .withColumn("gap_f", col("f_us") - col("us"))
      .withColumn("use_back", col("f_id").isNull ||
        (col("b_id").isNotNull && col("gap_b") <= col("gap_f")))
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("us").as("purchase_us"),
        when(col("use_back"), col("b_id")).otherwise(col("f_id"))
          .as("nearest_click_id"),
        when(col("use_back"), col("b_us")).otherwise(col("f_us"))
          .as("nearest_click_us"),
        when(col("use_back"), col("gap_b")).otherwise(col("gap_f"))
          .as("gap_us"),
        when(col("use_back"), lit("backward")).otherwise(lit("forward"))
          .as("direction"))
      .orderBy(col("purchase_id"))
  }

  /** §2#39 bucketed range join: unordered pairs of same-user events
    * within 5 minutes of each other. Each left row fans out to its
    * 3 candidate time buckets (prev/self/next); the join key is
    * (user, bucket), then the exact |Δt| ≤ 5min predicate filters —
    * work scales with bucket occupancy, not |events|². */
  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val windowUs = 300000000L // 5 min
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("bucket", expr(s"us div $windowUs"))
    val a = ev.select(col("user_id"), col("event_id").as("id_a"),
        col("us").as("us_a"),
        explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("jb"))
    val b = ev.select(col("user_id"), col("event_id").as("id_b"),
      col("us").as("us_b"), col("bucket").as("jb"))
    a.join(b, Seq("user_id", "jb"))
      .where(col("id_a") < col("id_b") &&
        abs(col("us_b") - col("us_a")) <= windowUs)
      .select(col("user_id"), col("id_a"), col("id_b"),
        abs(col("us_b") - col("us_a")).as("gap_us"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** §2#252 SCD2 LOOKUP — the temporal-join half of slowly-changing
    * dimensions (Kimball DWH toolkit ch.5; cdc_scd2 #72 BUILDS the
    * versions, this op READS them the way every fact load does): each
    * purchase event is enriched with the version of the user's click
    * dimension valid AT the purchase instant (valid_from ≤ ts <
    * valid_to). Versions partition each user's timeline, so the range
    * join matches at most one version per fact — row count is exactly
    * |purchases|, misses (no click yet / never) carry version −1.
    *
    * Shape: versions derive from one per-user window over click
    * events (user-bounded partitions); the fact⋈version range join is
    * an equi-join on user_id with the range in the residual — per-user
    * fanout = that user's versions, never corpus². At warehouse scale
    * the dimension side is the small one: broadcast when it fits,
    * co-bucket on user_id when not (the §5 bucketed-join recipe). */
  def scd2Lookup(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        graft.functions.Fns.cents(col("value")).as("value_c"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from_us"), col("dim_eid"))
    val dim = e.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("dim_eid"),
        col("us").as("valid_from_us"), col("value_c").as("dim_value_c"))
      .withColumn("valid_to_us",
        coalesce(lead(col("valid_from_us"), 1).over(byUser),
          lit(Long.MaxValue)))
      .withColumn("dim_version_n", row_number().over(byUser).cast("long"))
    val facts = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("us"))
    facts.join(dim,
        facts("user_id") === dim("user_id") &&
          col("valid_from_us") <= col("us") && col("us") < col("valid_to_us"),
        "left")
      .select(facts("user_id"), col("event_id"), col("us"),
        coalesce(col("dim_version_n"), lit(-1L)).as("dim_version_n"),
        coalesce(col("dim_value_c"), lit(-1L)).as("dim_value_c"),
        when(col("dim_eid").isNull, 0L).otherwise(1L).as("matched"))
      .orderBy(col("event_id"))
  }
}
