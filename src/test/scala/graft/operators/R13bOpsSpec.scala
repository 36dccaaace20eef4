package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Specs for the round-13 second wave: DSIR importance scoring, CCNet
  * perplexity buckets, KMV source resemblance, zone-map pruning
  * comparison. */
class R13bOpsSpec extends SparkSuite {
  import spark.implicits._

  /** floor(4·log₂ q) as the engine computes it: length(bin(q⁴))−1,
    * i.e. the bit length of q⁴ minus one (0 for q ≤ 1). */
  private def surpQb(q: Long): Long = {
    val q4 = q * q * q * q
    if (q4 <= 0) 0L else 63L - java.lang.Long.numberOfLeadingZeros(q4)
  }

  test("sample_dsir: exact-integer law against a driver-side recompute") {
    // crafted corpus: target source's docs are all token T; the other
    // source's are all token X — maximal, sign-separable divergence
    val docs = Seq(
      (1L, "src0", "t t t t"),
      (2L, "src0", "t t x t"),
      (3L, "srcZ", "x x x x"),
      (4L, "srcZ", "x t x x"))
      .toDF("doc_id", "source", "text")
    val got = Sampling.sampleDsirOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // driver-side recompute of the exact spec: raw (T:10, X:6? no —
    // T appears 4+3+1=8, X appears 1+4+3=8), target = src0 slice
    val raw = Map("t" -> 8L, "x" -> 8L); val tgt = Map("t" -> 7L, "x" -> 1L)
    val (trn, ttn) = (raw.values.sum, tgt.values.sum)
    def sd(tok: String): Long =
      surpQb(math.min(trn / (raw(tok) + 1), 32767L)) -
        surpQb(math.min(ttn / (tgt(tok) + 1), 32767L))
    def logw(toks: Seq[String]): Long = toks.map(sd).sum
    assert(got(1L) === ((4L, logw(Seq.fill(4)("t")), 1L)))
    assert(got(3L) === ((4L, logw(Seq.fill(4)("x")), 0L)))
    assert(got(2L)._2 === logw(Seq("t", "t", "t", "x")))
    assert(got(4L)._2 === logw(Seq("t", "x", "x", "x")))
    // sign separation: pure-target doc keeps, pure-other doc drops
    assert(got(1L)._3 === 1L && got(3L)._3 === 0L)
  }

  test("sample_dsir: corpus laws — one row per doc, token conservation") {
    val out = Sampling.sampleDsir(spark, sf)
    val docs = graft.Tables.documents(spark, sf)
    assert(out.count() === docs.count())
    // n_tokens must equal the tokenizer's count (same split convention)
    val direct = docs.select(col("doc_id"),
      size(graft.functions.Fns.tokens(col("text"))).cast("long").as("n"))
    assert(out.join(direct, "doc_id")
      .where(col("n_tokens") =!= col("n")).count() === 0L)
    assert(out.where(col("keep") =!= (col("logw_qb") >= 0L).cast("long"))
      .count() === 0L)
  }

  test("text_ppl_buckets: the value-granular ntile law, ties never split") {
    val out = TextAnalysis.pplBuckets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val n = rows.length.toLong
      // brute-force recompute: bucket(v) = 1 + 3·|{ppl < v}| div n
      rows.foreach { case (_, _, v, b) =>
        val below = rows.count(_._3 < v).toLong
        assert(b === 1L + (3L * below) / n,
          s"$lang ppl=$v bucket $b != ntile-law value")
      }
      // ties share buckets by construction; buckets cover 1..3 only
      assert(rows.map(_._4).forall(b => b >= 1 && b <= 3))
    }
    // domain = docs with ≥ 2 tokens (the perplexity support)
    val withBigrams = graft.Tables.documents(spark, sf)
      .where(size(graft.functions.Fns.tokens(col("text"))) >= 2).count()
    assert(out.length.toLong === withBigrams)
  }

  test("q_kmv_jaccard: exact when sets are smaller than k (sketch = set)") {
    // two identical sources, one disjoint — n_shingles << k=256, so
    // the KMV estimate IS the exact Jaccard of the shingle-hash sets
    val docs = Seq(
      (1L, "sA", "a b c d e f"),
      (2L, "sB", "a b c d e f"),  // identical content to sA
      (3L, "sC", "p q r s t u"))  // disjoint content
      .toDF("doc_id", "source", "text")
    val crafted = Analytics.qKmvJaccardOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 6 tokens → 4 shingles per doc; identical sets → 1000‰, disjoint → 0
    assert(crafted(("sA", "sB")) === ((4L, 4L, 1000L)))
    assert(crafted(("sA", "sC"))._3 === 0L)
    assert(crafted(("sB", "sC"))._3 === 0L)
    // the operator on the real corpus: estimates live in bounds and
    // k_used never exceeds k
    val out = Analytics.qKmvJaccard(spark, sf)
    val k = Analytics.kmvK.toLong
    assert(out.where(col("k_used") > k || col("n_common") > col("k_used")
      || col("jaccard_pm") < 0 || col("jaccard_pm") > 1000
      || col("union_est") < col("k_used") - 1).count() === 0L)
    val nSrc = graft.Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    assert(out.count() === nSrc * (nSrc - 1) / 2, "every source pair")
  }

  test("pack_shelves: exact placement on crafted sizes, shelf laws") {
    def txt(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (1L, "s1", txt(100)), (2L, "s1", txt(100)), (3L, "s1", txt(100)),
      (4L, "s1", txt(100)), (5L, "s1", txt(100)), // band 128, 4 slots
      (6L, "s1", txt(300)),                       // band 512, 1 slot
      (7L, "s1", txt(600)),                       // oversize: band 1024
      (8L, "s1", txt(1)))                         // band 1
      .toDF("doc_id", "source", "text")
    val out = Sampling.packShelvesOf(docs, 512L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // (source, band, bin_id, slots, n_docs, load, used_pm)
    val byBand = out.groupBy(_._2)
    assert(out.map(_._5).sum === 8L, "every doc lands in exactly one bin")
    // band 128: docs 1-4 fill bin 0 (4 slots), doc 5 opens bin 1
    assert(byBand(128L).map(b => (b._3, b._5, b._6)).sorted.toSeq ===
      Seq((0L, 4L, 400L), (1L, 1L, 100L)))
    // band 512: one slot per bin
    assert(byBand(512L).head._5 === 1L && byBand(512L).head._6 === 300L)
    // oversize: own bin, visible over-capacity
    assert(byBand(1024L).head._7 > 1000L)
    assert(byBand(1L).head._6 === 1L)
    // corpus laws: bands are powers of two covering n; full bins ≥
    // half capacity (the harmonic shelf guarantee, non-oversize bands)
    val corpus = Sampling.packShelves(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    corpus.foreach { case (band, slots, nd, load) =>
      assert((band & (band - 1)) === 0L, s"band $band not a power of two")
      assert(nd <= slots)
      if (nd == slots)
        assert(2 * load >= slots * band,
          s"full shelf under half band mass: band=$band load=$load")
    }
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(corpus.map(_._3).sum === nDocs)
  }

  test("cdc_order_audit: inversions counted per key in commit order") {
    def ts(us: Long) = new java.sql.Timestamp(us / 1000L)
    // key 0: monotone; key 1: one regression of 5000 µs; key 33 (same
    // partition as key 1 mod 32): clean — partition rollup mixes them
    val events = Seq(
      (0L, 1L, 1000000L), (0L, 2L, 2000000L),
      (1L, 3L, 9000000L), (1L, 4L, 4000000L), (1L, 5L, 6000000L),
      (33L, 6L, 1000000L), (33L, 7L, 1000000L)) // equal ts: NOT an inversion
      .map { case (u, e, us) => (u, e, ts(us)) }
      .toDF("user_id", "event_id", "ts")
    val got = graft.cdc.Changefeed.orderAuditOf(events, 32).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got(0L) === ((1L, 2L, 0L, 0L, 1000L)))
    // partition 1 holds keys 1 and 33: 5 changes, 1 inversion, worst
    // regression 9s−4s = 5,000,000 µs
    assert(got(1L) === ((2L, 5L, 1L, 5000000L, 800L)))
  }

  test("dedup_lsh_tuning: production config's verified set = minhash_lsh output") {
    val rows = Dedup.lshTuning(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length === Dedup.lshTuningConfigs.length)
    rows.foreach { case (b, rr, t, cand, ver, prec) =>
      assert(b * rr === 96L, "bands × rows must cover the signature")
      assert(t === Dedup.lshTStarPm(b.toInt, rr.toInt))
      assert(ver <= cand && prec >= 0 && prec <= 1000)
    }
    // the (32, 3) row's verified count IS the #26 operator's output
    // size: same signatures, same bands, same est ≥ 0.5 verify (the
    // tuner's content keys vs #26's hashed keys cannot disagree on
    // the verified SET, only on pre-verify candidate bucketing)
    val prod = rows.find(_._1 == 32L).get
    assert(prod._5 === Dedup.minhashLsh(spark, sf).count())
  }

  test("q_countmin_err: never underestimates; probes are the exact top-20") {
    val out = Analytics.qCountminErr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nUsers = graft.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(out.length.toLong === math.min(20L, nUsers))
    out.foreach { case (_, exact, est, over) =>
      assert(est >= exact, "Count-Min must never underestimate")
      assert(over === est - exact)
    }
    // probe selection = exact top-20 by (count desc, user_id)
    val want = graft.Tables.events(spark, sf)
      .groupBy(col("user_id")).count()
      .orderBy(col("count").desc, col("user_id")).limit(20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map(r => r._1 -> r._2).toMap === want)
  }

  test("ts_dispersion: hand-computed Fano factors, span includes empty hours") {
    def ts(hour: Long, k: Long) = new java.sql.Timestamp(hour * 3600000L + k)
    val events = (
      // user 1: 2 events in hour 0, NONE in hour 1, 2 in hour 2 —
      // span 3, S=4, Σx²=8 → 1000·(3·8−16)/(4·2) = 1000 (the zeros
      // matter: over nonempty hours only it would read 0)
      Seq((1L, 0L), (1L, 0L), (1L, 2L), (1L, 2L)) ++
      // user 2: metronome 1/hour × 4 → dispersion 0
      Seq((2L, 0L), (2L, 1L), (2L, 2L), (2L, 3L)) ++
      // user 3: single hour → guard path, 0
      Seq((3L, 5L), (3L, 5L), (3L, 5L)))
      .zipWithIndex
      .map { case ((u, h), i) => (u, ts(h, i.toLong)) }
      .toDF("user_id", "ts")
    val got = TimeSeries.dispersionOf(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got(1L) === ((3L, 2L, 4L, 1000L)))
    assert(got(2L) === ((4L, 4L, 4L, 0L)))
    assert(got(3L) === ((1L, 1L, 3L, 0L)))
  }

  test("text_zipf_check: exact integer regression on a crafted frequency ladder") {
    // freqs 16/4/1 at ranks 1/2/3: x_hb = (0,2,3), y_hb = (8,4,0) →
    // num = sx·sy − n·sxy = 5·12 − 3·8 = 36, den = n·sxx − sx² =
    // 3·13 − 25 = 14 → 36000 div 14 = 2571
    val text = (Seq.fill(16)("a") ++ Seq.fill(4)("b") ++ Seq("c")).mkString(" ")
    val docs = Seq((1L, "sZ", text)).toDF("doc_id", "source", "text")
    val got = TextAnalysis.zipfCheckOf(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("sZ") === ((3L, 2571L)))
    // corpus law: per-mille slope is non-negative and bounded sanely
    val out = TextAnalysis.zipfCheck(spark, sf)
    assert(out.where(col("zipf_neg_slope_pm") < 0).count() === 0L)
    assert(out.count() === graft.Tables.documents(spark, sf)
      .select(col("source")).distinct().count())
  }

  test("graph_modularity: hand-computed Q on a crafted labeled graph") {
    val pairs = Seq((1L, 2L), (3L, 4L), (1L, 3L)).toDF("doc_a", "doc_b")
    val labels = Seq((1L, "X"), (2L, "X"), (3L, "Y"), (4L, "Y"))
      .toDF("doc_id", "lang")
    val got = Graph.modularityFrom(pairs, labels).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // m=3; e_X=1 (1-2), e_Y=1 (3-4); d_X = deg1+deg2 = 3, d_Y = 3;
    // q_c = 4·3·1 − 9 = 3 each; Q = 6/36 = 1/6 (hand: 2/3 − 2·(1/2)²)
    assert(got("X") === ((2L, 3L, 1L, 3L)))
    assert(got("Y") === ((2L, 3L, 1L, 3L)))
    assert(got("__ALL__") === ((4L, 6L, 2L, 6L)))
    // corpus: ALL row's d_sum = 2m and per-lang q_num sums to it
    val out = Graph.modularity(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val all = out("__ALL__")
    val per = out.filterNot(_._1 == "__ALL__").values
    assert(per.map(_._4).sum === all._4)
    assert(per.map(_._2).sum === all._2)
    assert(all._2 % 2 === 0L, "total degree mass must be even (2m)")
  }

  test("layout_prune_compare: tiling and pruning laws") {
    val rows = Layout.pruneCompare(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val layouts = rows.map(_._1).distinct.sorted
    assert(layouts === Array("hilbert", "x_sort", "y_sort", "zorder"))
    assert(rows.length === 4 * 40, "4 layouts × 40 probes")
    val total = graft.Tables.events(spark, sf).count()
    // the 16 width-64 x probes tile the x domain; x_sort files are
    // 16-wide and 64-aligned nest inside exactly one probe → the
    // probe sweep scans every row exactly once
    val xSortX = rows.filter(r => r._1 == "x_sort" && r._2 == "x")
    assert(xSortX.map(_._5).sum === total)
    val ySortY = rows.filter(r => r._1 == "y_sort" && r._2 == "y")
    assert(ySortY.map(_._5).sum === total)
    // curve files may straddle probe boundaries → sweeps can only
    // re-scan, never lose rows
    for (l <- Seq("zorder", "hilbert"); k <- Seq("x", "y"))
      assert(rows.filter(r => r._1 == l && r._2 == k).map(_._5).sum >= total,
        s"$l/$k sweep lost rows")
    // a sorted layout prunes its own dimension to ≤ 4 of 64 file slots
    assert(xSortX.forall(_._4 <= 4), "x_sort on x probes: ≤ 4 files")
    assert(ySortY.forall(_._4 <= 4), "y_sort on y probes: ≤ 4 files")
    // files_scanned ≤ files_total, rows ≥ 0 everywhere
    assert(rows.forall(r => r._4 <= r._6 && r._4 >= 0 && r._5 >= 0))
  }
}
