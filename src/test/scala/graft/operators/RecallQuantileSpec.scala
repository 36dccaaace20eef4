package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Verdict r4 tasks 7+8: a quantified recall floor for ann_lsh_topk and
  * a randomized-input equality property for the two exact-quantile
  * implementations.
  */
class RecallQuantileSpec extends SparkSuite {

  test("ann_lsh_topk recall@5 vs brute force meets the documented floor") {
    // This corpus is WORST-CASE for LSH: the true top-5 of a random
    // query sit at cosine 0.25-0.49 (near-orthogonal), where per-bit
    // sign agreement is only ~0.58-0.67. 16 tables x 6 bits x 2
    // lowest-margin multiprobes amplify that to 92% measured recall@5
    // (was 56% before multiprobe), with only the query side fanning
    // out x3 (real embedding clusters at cos>=0.8 recall >99% at the
    // same setting). Floor documented here: >= 70%.
    val exact = Similarity.bruteforceTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val approx = Similarity.lshTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val hits = exact.keys.toSeq
      .map(q => (approx.getOrElse(q, Set.empty) & exact(q)).size).sum
    val total = exact.values.map(_.size).sum
    info(s"ann_lsh_topk recall@5 = $hits/$total")
    assert(hits * 10 >= total * 7, s"recall@5 too low: $hits/$total")
  }

  test("ann_ivf_pq recall@5 vs brute force meets the documented floor") {
    // The composed index inherits BOTH loss sources: cell pruning
    // (nProbe 3 of 8) and PQ quantization — so its floor sits below
    // either parent's. Valid ranks + per-query k rows also asserted.
    val exact = Similarity.bruteforceTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val rows = Similarity.ivfPqTopk(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).sorted.toSeq === (1L to rs.length))
      assert(rs.length <= 5)
    }
    val approx = rows.map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val hits = exact.keys.toSeq
      .map(q => (approx.getOrElse(q, Set.empty) & exact(q)).size).sum
    val total = exact.values.map(_.size).sum
    info(s"ann_ivf_pq recall@5 = $hits/$total")
    assert(hits * 10 >= total * 4, s"recall@5 too low: $hits/$total")
  }

  test("property: quantilesSortRankOf == quantilesExactOf on randomized frames") {
    import spark.implicits._
    // 60 independent random groups in ONE frame = 60 property cases per
    // Spark job: sizes 1..40, 2-decimal values drawn from a SMALL domain
    // so ties (the histogram-compaction edge) are frequent; plus
    // adversarial shapes — singleton, pair, all-equal, n*q landing
    // exactly on an integer rank (no interpolation fraction).
    val rnd = new scala.util.Random(0xC0FFEE)
    val random = (1 to 60).flatMap { g =>
      val n = 1 + rnd.nextInt(40)
      val domain = 1 + rnd.nextInt(12) // small => heavy ties
      (1 to n).map(_ => (f"g$g%02d", (10 + rnd.nextInt(domain * 25)) / 4.0))
    }
    val edges = Seq(
      ("edge_singleton", 42.17),
      ("edge_pair_lo", 1.25), ("edge_pair_lo", 99.75),
      ("edge_allsame", 7.5), ("edge_allsame", 7.5), ("edge_allsame", 7.5),
      // n=11 -> (n-1)*0.5 = 5.0 and (n-1)*0.9 = 9.0: both ranks integral
      ("edge_exact_rank", 1.0), ("edge_exact_rank", 2.0), ("edge_exact_rank", 3.0),
      ("edge_exact_rank", 4.0), ("edge_exact_rank", 5.0), ("edge_exact_rank", 6.0),
      ("edge_exact_rank", 7.0), ("edge_exact_rank", 8.0), ("edge_exact_rank", 9.0),
      ("edge_exact_rank", 10.0), ("edge_exact_rank", 11.0))
    val gv = (random ++ edges).toDF("grp", "v")
    val exact = Analytics.quantilesExactOf(gv).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val sortRank = Analytics.quantilesSortRankOf(gv).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(sortRank.toSeq === exact.toSeq)
    assert(exact.length === 64) // 60 random + 4 edge groups all present
  }

  test("property: medianOfLongs == round(percentile(v, 0.5)) on randomized long frames") {
    import spark.implicits._
    // the r6 robust-stats rewrite rides on this helper; pin it to the
    // reference aggregate on the same adversarial shapes the sortrank
    // property uses — heavy ties, singletons, all-equal, odd/even sizes
    // (even => frac 0.5 midpoint interpolation), negative values (dev
    // columns are >= 0 but the helper shouldn't care)
    val rnd = new scala.util.Random(0xBEEF)
    val random = (1 to 60).flatMap { g =>
      val n = 1 + rnd.nextInt(40)
      val domain = 1 + rnd.nextInt(12)
      (1 to n).map(_ => (f"g$g%02d", (rnd.nextInt(domain * 25) - 30).toLong))
    }
    val edges = Seq(
      ("edge_singleton", 4217L),
      ("edge_pair_mid", 1L), ("edge_pair_mid", 2L), // midpoint 1.5 -> round 2
      ("edge_allsame", 7L), ("edge_allsame", 7L), ("edge_allsame", 7L),
      ("edge_neg", -5L), ("edge_neg", -3L), ("edge_neg", -1L), ("edge_neg", 10L))
    val gv = (random ++ edges).toDF("grp", "v")
    val viaPercentile = gv.groupBy(col("grp"))
      .agg(round(call_function("percentile", col("v"), lit(0.5)))
        .cast("long").as("median_c"))
      .orderBy(col("grp")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val viaHistogram = Analytics.medianOfLongs(gv)
      .orderBy(col("grp")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(viaHistogram.toSeq === viaPercentile.toSeq)
    assert(viaHistogram.length === 64)
  }
}
