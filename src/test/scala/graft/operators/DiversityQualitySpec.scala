package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Specs for the round-9 third-session additions: compression-ratio
  * quality signal, MMR diversified re-rank, bitmap exact distinct,
  * ordered string aggregation. */
class DiversityQualitySpec extends SparkSuite {

  // ---------------------------------------------------------------- text

  test("text_compression_ratio: repetitive text compresses far below random") {
    import spark.implicits._
    val rep = ("lorem ipsum " * 400).trim // highly templated
    // deterministic pseudo-random alnum junk (LCG, no shared structure)
    val rnd = {
      var s = 123456789L
      val sb = new StringBuilder
      while (sb.length < rep.length) {
        s = s * 6364136223846793005L + 1442695040888963407L
        sb.append(((s >>> 33) % 36).toInt match {
          case d if d < 10 => ('0' + d).toChar
          case a => ('a' + a - 10).toChar
        })
      }
      sb.toString
    }
    val df = Seq((1L, rep), (2L, rnd), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatioOf(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (repRaw, repDef, repPm) = out(1L)
    val (rndRaw, _, rndPm) = out(2L)
    val (emptyRaw, _, _) = out(3L)
    assert(repRaw === rep.length.toLong && rndRaw === rnd.length.toLong)
    assert(repDef > 0L)
    // templated text compresses at least 2x better than random junk
    assert(repPm * 2 < rndPm, s"rep=$repPm rnd=$rndPm")
    // random alnum still compresses a little (6-bit alphabet) but stays high
    assert(rndPm > 500L)
    assert(emptyRaw === 0L) // empty doc: no crash, zero raw bytes
  }

  test("text_compression_ratio: sane bounds and full coverage on the corpus") {
    val docs = graft.Tables.documents(spark, sf)
    val out = TextAnalysis.compressionRatio(spark, sf).collect()
    assert(out.length.toLong === docs.count())
    out.foreach { r =>
      val (raw, defl, pm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(raw > 0L && defl > 0L)
      // DEFLATE never inflates text beyond the stored-block overhead
      assert(pm >= 1L && pm <= 1100L, s"doc ${r.getLong(0)}: ratio $pm")
    }
    // natural-language corpus: the bulk must actually compress
    val median = out.map(_.getLong(3)).sorted.apply(out.length / 2)
    assert(median < 900L, s"median ratio $median — corpus not compressing")
  }

  // ---------------------------------------------------------------- ann

  /** Driver-side exact replica of the operator's arithmetic: dot
    * products as sequential loops (same order as the codegen'd
    * DotProduct), relevance = round(cos*1e6), pairwise = floor(cos*1e6),
    * score = floorDiv(λ·rel − (1−λ)·red, 1000), ties by id. */
  test("ann_mmr_topk equals a driver-side greedy MMR recompute") {
    val k = 5; val nCand = 20; val lambdaPm = 700L
    val embs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val nrm = embs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    val expected = (0L until 10L).flatMap { qid =>
      val q = embs(qid); val qn = nrm(qid)
      val cands = embs.keys.filter(_ != qid).toSeq
        .map { id =>
          val rel = math.round(dot(q, embs(id)) / (qn * nrm(id)) * 1e6)
          (id, rel)
        }
        .sortBy { case (id, rel) => (-rel, id) }
        .take(nCand)
      def pairE6(a: Long, b: Long): Long =
        math.floor(dot(embs(a), embs(b)) / (nrm(a) * nrm(b)) * 1e6).toLong
      var selected = Vector.empty[Long]
      var remaining = cands
      (1 to k).map { rank =>
        val scoredBest = remaining.map { case (id, rel) =>
          val red = if (selected.isEmpty) 0L else selected.map(pairE6(id, _)).max
          (Math.floorDiv(lambdaPm * rel - (1000L - lambdaPm) * red, 1000L), id, rel)
        }.minBy { case (score, id, _) => (-score, id) }
        selected :+= scoredBest._2
        remaining = remaining.filterNot(_._1 == scoredBest._2)
        (qid, rank.toLong, scoredBest._2, scoredBest._1, scoredBest._3)
      }
    }.toSet
    val got = Similarity.mmrTopk(spark, sf, k, nCand, lambdaPm).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
  }

  test("ann_mmr_topk: λ=1 reduces to plain top-k; λ=0.7 actually diversifies") {
    val plain = Similarity.bruteforceTopk(spark, sf).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq).toMap
    // λ = 1000‰: the redundancy term vanishes, so greedy-by-relevance
    // (ties by id) IS the plain exact top-k, in the same order
    val reduced = Similarity.mmrTopk(spark, sf, lambdaPm = 1000L).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq).toMap
    assert(reduced.keySet === (0L until 10L).toSet)
    reduced.foreach { case (qid, ids) => assert(ids === plain(qid)) }
    // λ = 700‰: diversification must actually change something, and
    // rank 1 (no redundancy yet) stays the plain nearest neighbor
    val mmr = Similarity.mmrTopk(spark, sf).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq).toMap
    mmr.foreach { case (qid, ids) =>
      assert(ids.size === 5 && ids.distinct.size === 5)
      assert(ids.head === plain(qid).head)
    }
    assert(mmr.exists { case (qid, ids) => ids.toSet != plain(qid).toSet },
      "λ=0.7 never deviated from plain top-k — diversification inert")
  }

  // ---------------------------------------------------------------- dedup

  test("dedup_canonical: the keep list partitions the corpus, picks max quality") {
    val rows = Dedup.canonical(spark, sf).collect()
    val quality = TextAnalysis.quality(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(6)).toMap
    val clusters = Dedup.cluster(spark, sf).collect()
      .groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    // every cluster appears exactly once and membership counts add up
    assert(rows.map(_.getLong(0)).toSet === clusters.keySet)
    assert(rows.map(_.getLong(3)).sum === quality.size.toLong)
    rows.foreach { r =>
      val (cid, canon, q, n, dropped) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      val members = clusters(cid)
      assert(members.contains(canon) && n === members.size.toLong &&
        dropped === n - 1)
      assert(q === quality(canon))
      // argmax with min-id tiebreak
      val best = members.map(m => (quality(m), m))
        .minBy { case (qm, m) => (-qm, m) }
      assert(canon === best._2)
    }
  }

  // ---------------------------------------------------------------- image

  test("mm_image_entropy: flat fill reads 0, two equal levels read exactly 1 bit") {
    import spark.implicits._
    // PPM P6: header + raw RGB triples
    def ppm(w: Int, h: Int, px: Array[Byte]): Array[Byte] =
      (s"P6\n$w $h\n255\n".getBytes("US-ASCII")) ++ px
    val flat = ppm(4, 4, Array.fill(48)(100.toByte))        // one bin → H=0
    // half the pixels luma 0, half luma 255 → two equal bins → H=1 bit
    val twoLevel = ppm(4, 4,
      (Array.fill(24)(0.toByte) ++ Array.fill(24)(255.toByte)))
    val df = Seq((1L, flat), (2L, twoLevel),
      (3L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "blob")
    val rows = Multimodal.imageEntropyOf(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(rows(1L) === ((16L, 0L, "real")))
    assert(rows(2L) === ((16L, 1000L, "real")))
    assert(rows(3L)._3 === "stub")
    // corpus plumbing: one row per doc, entropy bounded by log2(16)
    val corpus = Multimodal.imageEntropy(spark, sf).collect()
    assert(corpus.length.toLong === graft.Tables.documents(spark, sf).count())
    corpus.foreach(r => assert(r.getLong(2) >= 0L && r.getLong(2) <= 4000L))
  }

  // ---------------------------------------------------------------- cdc

  test("cdc_fan_in: the merge frontier is the slowest source's, counts reconcile") {
    val rows = graft.cdc.Changefeed.fanIn(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L))
    val safeFrontier = rows.head.getLong(2)
    // one shared safe frontier = the MIN per-source frontier
    assert(rows.forall(_.getLong(2) === safeFrontier))
    assert(rows.map(_.getLong(1)).min === safeFrontier)
    rows.foreach { r =>
      val (frontier, total, nSafe, nHeld) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(frontier >= safeFrontier)
      assert(nSafe + nHeld === total)
      assert(nSafe > 0L)
    }
    // the slowest source holds nothing back — everything it has is safe
    val slowest = rows.filter(_.getLong(1) === safeFrontier)
    assert(slowest.nonEmpty && slowest.forall(_.getLong(5) === 0L))
  }

  // ---------------------------------------------------------------- graph

  test("graph_label_prop: bridged cliques split, a clique collapses, corpus runs") {
    import spark.implicits._
    // two 4-cliques {1..4} and {10..13} joined by ONE bridge edge 4–10
    def clique(ids: Seq[Long]) =
      for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ ((4L, 10L)))
      .toDF("doc_a", "doc_b")
    val got = Graph.labelPropFrom(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // each clique collapses to its min label; the bridge never outvotes
    Seq(1L, 2L, 3L, 4L).foreach(n => assert(got(n) === ((1L, 4L))))
    Seq(10L, 11L, 12L, 13L).foreach(n => assert(got(n) === ((10L, 4L))))
    // determinism: a second run is identical
    val again = Graph.labelPropFrom(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again === got)
    // real corpus: every candidate-graph node gets a community and
    // sizes are consistent
    val corpus = Graph.labelProp(spark, sf).collect()
    assert(corpus.nonEmpty)
    val byCommunity = corpus.groupBy(_.getLong(1))
    byCommunity.foreach { case (_, members) =>
      assert(members.forall(_.getLong(2) === members.length.toLong))
    }
  }

  // ---------------------------------------------------------------- audio

  test("mm_audio_snr: alternating levels read their exact deci-dB gap") {
    import spark.implicits._
    import TestWav.wav16
    // 8 kHz → 160-sample (20 ms) frames. 50 frames alternating constant
    // amplitude 1000 / 10: frame RMS is the amplitude itself, so
    // p10 = 10, p90 = 1000 and SNR = 20·log10(100) = 40.0 dB exactly.
    val alternating = (0 until 50).flatMap(f =>
      Seq.fill(160)(if (f % 2 == 0) 1000 else 10))
    val constant = Seq.fill(8000)(500) // one level → ≈ 0 dB
    val silence = Seq.fill(8000)(0)    // digital silence → 0/0
    val df = Seq(
      (1L, wav16(8000, alternating)),
      (2L, wav16(8000, constant)),
      (3L, wav16(8000, silence)),
      (4L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "blob")
    val rows = Multimodal.audioSnrOf(df).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toMap
    assert(rows(1L) === ((50L, 10L, 1000L, 400L, "real")))
    val (_, cLo, cHi, cSnr, _) = rows(2L)
    assert(cLo === 500L && cHi === 500L && cSnr === 0L)
    assert(rows(3L) === ((50L, 0L, 0L, 0L, "real"))) // silent but decodable
    assert(rows(4L)._5 === "stub")
    // zero floor with real signal: capped at 99.0 dB, not infinite
    val halfSilent = Seq.fill(4000)(0) ++ Seq.fill(4000)(2000)
    val capped = Multimodal.audioSnrOf(
      Seq((9L, wav16(8000, halfSilent))).toDF("doc_id", "blob")).collect()
    assert(capped.head.getLong(4) === 990L)
  }

  // ---------------------------------------------------------------- ts

  test("ts_autocorr: complete lag grid, shrinking pair counts, Cauchy-Schwarz bound") {
    val rows = TimeSeries.autocorr(spark, sf).collect()
    val byType = rows.groupBy(_.getString(0))
    assert(byType.nonEmpty)
    byType.foreach { case (_, rs) =>
      // lags 1..6, exactly once each
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to 6L))
      // each extra lag loses exactly one pair (the gap-filled series is
      // contiguous, so |pairs| = |hours| - lag)
      val pairsByLag = rs.map(r => r.getLong(1) -> r.getLong(2)).toMap
      (2L to 6L).foreach(l => assert(pairsByLag(l) === pairsByLag(l - 1) - 1))
      rs.foreach { r =>
        val (sac, m2) = (r.getLong(3), r.getLong(4))
        assert(m2 > 0L)
        // |Σ(a−μ)(b−μ)| over a pair subset is ≤ the full second moment
        assert(math.abs(sac) <= m2, s"|sac|=$sac > m2=$m2")
      }
    }
  }

  // ---------------------------------------------------------------- sql

  test("q_bitmap_distinct equals plain count(DISTINCT) exactly") {
    val expected = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Analytics.qBitmapDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(got.values.forall(_ > 0L))
  }

  test("q_bitmap_distinct: partial bitmap aggregation before the shuffle") {
    val plan = Analytics.qBitmapDistinct(spark, sf)
      .queryExecution.executedPlan.toString
    // two-level agg: partial bitmap_construct_agg runs map-side (before
    // its exchange), so the shuffle carries bitmaps, not raw ids
    assert(plan.contains("partial_bitmap_construct_agg"),
      s"no map-side partial bitmap aggregation in:\n$plan")
  }

  test("q_string_agg: rosters are the sorted exact membership") {
    val rows = Analytics.qStringAgg(spark, sf).collect()
    val expected = graft.Tables.customer(spark, sf)
      .join(graft.Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_name")).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getString(1)).sorted.mkString("|")).toMap
    assert(rows.map(_.getString(0)).toSet === expected.keySet)
    rows.foreach { r =>
      assert(r.getString(2) === expected(r.getString(0)))
      assert(r.getLong(1) === expected(r.getString(0)).split('|').length.toLong)
    }
  }
}
