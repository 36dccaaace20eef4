package graft.operators

import graft.SparkSuite
import graft.cdc.Changefeed
import org.apache.spark.sql.functions._

/** Specs for the round-5 additions: SCD2, Bloom incremental dedup,
  * corpus vocab, salient terms, salted join. */
class NewOpsSpec extends SparkSuite {

  test("cdc_scd2: intervals chain per PK, exactly one current version") {
    val rows = Changefeed.scd2(spark, sf).collect()
    val byPk = rows.groupBy(r => (r.getLong(0), r.getString(1)))
    val nEvents = graft.Tables.events(spark, sf).count()
    assert(rows.length.toLong === nEvents)
    byPk.foreach { case (_, vs) =>
      val sorted = vs.sortBy(_.getLong(2)) // version_n
      // versions are 1..n with no gaps
      assert(sorted.map(_.getLong(2)).toSeq === (1L to sorted.length.toLong))
      // each interval closes exactly where the next one opens
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(6) === b.getLong(5)) // valid_to == next valid_from
        case _ => ()
      }
      // every non-last interval is half-open and non-empty
      sorted.dropRight(1).foreach(r => assert(r.getLong(5) < r.getLong(6)))
      // exactly the last version is current (sentinel Long.MaxValue)
      assert(sorted.count(_.getLong(7) == 1L) === 1)
      assert(sorted.last.getLong(7) === 1L)
      assert(sorted.last.getLong(6) === Long.MaxValue)
    }
  }

  test("cdc_compact_tombstones: deleted PKs vanish, survivors match plain compact") {
    val plain = Changefeed.compact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val ts = Changefeed.compactTombstones(spark, sf).collect()
    assert(ts.nonEmpty && ts.length < plain.size) // some PKs were dropped
    ts.foreach { r =>
      val pk = (r.getLong(0), r.getString(1))
      // survivor's latest version is the same event plain compaction picks
      assert(plain(pk) === r.getLong(2))
      assert(r.getLong(2) % 97 != 0) // and it isn't a tombstone
    }
    // every dropped PK's latest event really is a tombstone
    val surviving = ts.map(r => (r.getLong(0), r.getString(1))).toSet
    plain.foreach { case (pk, lastId) =>
      if (!surviving.contains(pk)) assert(lastId % 97 === 0)
    }
  }

  test("cdc_payload_parse round-trips the envelope back to typed rows") {
    val parsed = Changefeed.payloadParse(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
        r.getLong(5), r.getLong(6))).toSet
    val original = graft.Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("value_cents"),
        coalesce(get_json_object(col("props"), "$.k").cast("long"), lit(-1L)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(parsed === original) // serialize → publish → parse is lossless
    assert(parsed.nonEmpty)
  }

  test("sample_temperature: alpha=1/2 flattens the mixture toward small sources") {
    val rows = Sampling.sampleTemperature(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nDocs, w, targetN, keepPm, nKept) =>
      assert(w === math.sqrt(nDocs.toDouble).toLong) // isqrt weight
      assert(keepPm >= 0 && keepPm <= 1000)
      assert(nKept <= nDocs)
      assert(targetN >= 0)
    }
    // the α<1 property: a strictly larger source never gets a larger
    // keep rate, and when sizes differ enough the rate strictly drops
    for (a <- rows; b <- rows if a._2 > b._2 * 2)
      assert(a._5 <= b._5,
        s"bigger source ${a._1} (${a._2} docs) out-rates ${b._1} (${b._2})")
    // the kept total lands in the neighborhood of the 500‰ budget
    // (hash-threshold rounding and the per-source cap both bite)
    val kept = rows.map(_._6).sum.toDouble
    val total = rows.map(_._2).sum.toDouble
    assert(kept / total > 0.35 && kept / total < 0.65,
      s"kept share ${kept / total} far from the 50% budget")
  }

  test("sample_mixture: per-source keep rates applied via consistent hash") {
    val rows = Sampling.sampleMixture(spark, sf).collect()
    assert(rows.length === 20) // one row per source
    rows.foreach { r =>
      val idx = r.getString(0).stripPrefix("src").toLong
      assert(r.getLong(1) === (idx * 53) % 900 + 100) // keep_pm formula
      assert(r.getLong(3) <= r.getLong(2))            // kept <= total
      // achieved rate lands near the target (small-sample noise aside)
      assert(math.abs(r.getLong(4) - r.getLong(1)) <= 350,
        s"${r.getString(0)}: achieved ${r.getLong(4)} vs target ${r.getLong(1)}")
    }
  }

  test("dedup_exact_normalized collapses at least as much as raw exact dedup") {
    val norm = Dedup.exactNormalized(spark, sf).collect()
    val raw = Dedup.exact(spark, sf).collect()
    val total = graft.Tables.documents(spark, sf).count()
    assert(norm.map(_.getLong(2)).sum === total) // every doc in one class
    assert(norm.length <= raw.length)            // normalization only merges
    norm.foreach(r => assert(r.getLong(3) >= 1L && r.getLong(3) <= r.getLong(2)))
  }

  test("dedup_incremental_bloom equals the exact incremental result") {
    val exact = Dedup.incremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = Dedup.bloomIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bloom === exact)
    assert(exact.nonEmpty)
  }

  test("text_vocab: top-50 by true corpus counts, deterministic order") {
    val got = TextAnalysis.vocab(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.length <= 50 && got.nonEmpty)
    // non-increasing counts, ties broken by token ascending
    got.sliding(2).foreach {
      case Array((ta, na), (tb, nb)) =>
        assert(na > nb || (na == nb && ta < tb))
      case _ => ()
    }
    // counts agree with an independent explode+count
    val truth = graft.Tables.documents(spark, sf)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .where(col("tok") =!= "").groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (tok, n) => assert(truth(tok) === n) }
    // and nothing outside the result beats the cutoff
    val cutoff = got.last
    truth.filterNot(kv => got.exists(_._1 == kv._1)).foreach { case (t, n) =>
      assert(n < cutoff._2 || (n == cutoff._2 && t > cutoff._1))
    }
  }

  test("text_salient_terms: <=3 ranked terms per doc, integer score exact") {
    val rows = TextAnalysis.salientTerms(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tf, df, score) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(score === tf * 1000000L / df)
      assert(df >= 1L && tf >= 1L)
    }
    rows.groupBy(_.getLong(0)).foreach { case (_, vs) =>
      val sorted = vs.sortBy(_.getLong(1))
      assert(sorted.length <= 3)
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length.toLong))
      // rank order follows (score desc, tok asc)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(5) > b.getLong(5) ||
            (a.getLong(5) == b.getLong(5) && a.getString(2) < b.getString(2)))
        case _ => ()
      }
    }
  }

  test("dedup_containment: bounded per-mille and dominates jaccard pairwise") {
    val rows = Dedup.containment(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) >= 500L && r.getLong(3) <= 1000L))
    // containment >= jaccard for every shared pair
    // (|A∩B|/min(|A|,|B|) >= |A∩B|/|A∪B| always)
    val jac = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    val shared = rows.flatMap(r =>
      jac.get((r.getLong(0), r.getLong(1))).map(j => (r.getLong(3), j)))
    assert(shared.nonEmpty)
    shared.foreach { case (c, j) => assert(c >= j) }
  }

  test("ann_pq_adc: valid ranks, decent recall vs exact brute force") {
    val got = Similarity.pqAdcTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.size.toLong))
      assert(rows.forall(_._2 != q))
    }
    // the ADC shortlist + exact re-rank recovers most of the true
    // top-5 even on this near-orthogonal corpus (measured: 86%)
    val exact = Similarity.bruteforceTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val approx = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = exact.keys.toSeq.map(q =>
      (approx.getOrElse(q, Set.empty) & exact(q)).size).sum
    val total = exact.values.map(_.size).sum
    info(s"ann_pq_adc recall@5 = $hits/$total")
    assert(hits * 10 >= total * 7, s"recall@5 too low: $hits/$total")
  }

  test("q_funnel_conversion: per-mille rates recompute from the funnel counts") {
    val r = Analytics.qFunnelConversion(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    val (s, c, f) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(s >= c && c >= f && f >= 0)
    assert(row.getLong(3) === c * 1000 / s)
    assert(row.getLong(4) === f * 1000 / math.max(c, 1))
    assert(row.getLong(5) === f * 1000 / s)
  }

  test("text_seqlen_histogram: docs land in their power-of-two bucket") {
    val rows = Analytics.textSeqlenHistogram(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      val b = r.getLong(0)
      assert(r.getLong(3) >= (1L << b) && r.getLong(4) < (1L << (b + 1)),
        s"bucket $b bounds violated: [${r.getLong(3)}, ${r.getLong(4)}]")
    }
  }

  test("ts_anomaly: flagged hours match a brute-force trailing-window recompute") {
    val sf01 = "/root/testdata/sf0.01" // sf0.001 has no qualifying spikes
    val flagged = TimeSeries.anomaly(spark, sf01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(flagged.nonEmpty)
    // brute force from the gap-filled series
    val series = TimeSeries.gapFill(spark, sf01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(v => (v._2, v._3)).toVector).toMap
    val brute = series.flatMap { case (typ, hours) =>
      hours.zipWithIndex.flatMap { case ((hourUs, n), i) =>
        val trail = hours.slice(math.max(0, i - 24), i)
        val (sumW, nW) = (trail.map(_._2).sum, trail.length.toLong)
        if (nW >= 12 && n >= 5 && n * nW > 3 * sumW)
          Some((typ, hourUs, n, sumW, nW))
        else None
      }
    }.toSet
    assert(flagged.toSet === brute)
  }

  test("cdc_table_router: per-table ledgers cover both feeds exactly") {
    val rows = Changefeed.tableRouter(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).distinct.sorted === Seq("events", "orders"))
    assert(rows.forall(r => r._2 >= 0 && r._2 < 8))
    val byTbl = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(byTbl("events") === Changefeed.changeRows(spark, sf).count())
    assert(byTbl("orders") ===
      graft.Tables.load(spark, sf, "orders").count())
  }

  test("cdc_resolved_batches: aligned windows, exact ledger, covered changes") {
    val f = 3600000000L
    val rows = graft.cdc.Changefeed.resolvedBatches(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.cdc.Changefeed.changeRows(spark, sf).count()
    // the cumulative ledger ends at the total change count
    assert(rows.last.getAs[Long]("cum_changes") === total)
    assert(rows.map(_.getAs[Long]("n_changes")).sum === total)
    var cum = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("window_end_us") % f === 0L) // cadence-aligned
      val last = r.getAs[Long]("last_change_us")
      val end = r.getAs[Long]("window_end_us")
      assert(last <= end && last > end - f) // batch watermark inside its window
      cum += r.getAs[Long]("n_changes")
      assert(r.getAs[Long]("cum_changes") === cum)
    }
  }

  test("q_unpivot: long format recomputes from the wide aggregate") {
    val rows = Analytics.qUnpivot(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val flags = rows.map(_._1).distinct
    assert(rows.length === flags.length * 3) // one row per (flag, measure)
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        graft.functions.Fns.cents(col("l_quantity")).as("q"))
      .groupBy("l_returnflag").agg(sum(col("q")).as("s")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    rows.filter(_._2 == "sum_qty_c").foreach { case (flag, _, v) =>
      assert(v === li(flag))
    }
  }

  test("q_exists_multi: the only-late-supplier set matches a driver recompute") {
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ord = graft.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .map(o => o._1 -> (o._2, o._3)).toMap
    val sup = graft.Tables.load(spark, sf, "supplier")
      .select(col("s_suppkey"), col("s_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byOrder = li.groupBy(_._1)
    val waits = byOrder.toSeq.flatMap { case (ok, ls) =>
      ord.get(ok).toSeq.flatMap { case (status, odUs) =>
        if (status != "F") Seq.empty
        else {
          val late = ls.filter(_._3 > odUs + 5184000000000L)
          val supps = ls.map(_._2).distinct
          late.filter { l =>
            supps.exists(_ != l._2) && // multi-supplier order
              !late.exists(_._2 != l._2) // and nobody else was late
          }
        }
      }
    }
    val expect = waits.groupBy(_._2).map { case (s, vs) =>
      (sup(s), vs.length.toLong) }
      .toSeq.sortBy { case (n, c) => (-c, n) }.take(20).toSet
    val got = Analytics.qExistsMulti(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("q_lateral_topn equals the window+filter formulation") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("price_c").desc, col("o_orderkey"))
    val viaWindow = graft.Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        graft.functions.Fns.cents(col("o_totalprice")).as("price_c"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("price_c"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val got = Analytics.qLateralTopn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === viaWindow)
    assert(got.nonEmpty)
  }

  test("q_recursive_chain: chain lengths match a driver-side recompute") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = ev.groupBy(_._1).map { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3)).map(_._2)
      var len = 1L
      var i = 1
      while (i < sorted.length && len < 50 &&
        sorted(i) - sorted(i - 1) <= 300000000L) { len += 1; i += 1 }
      (u, len)
    }.toSet
    val got = Analytics.qRecursiveChain(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("ts_ewma: recurrence matches a driver-side fold over the gap-filled series") {
    val series = TimeSeries.gapFill(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(v => (v._2, v._3)).toVector).toMap
    val expect = series.flatMap { case (typ, hours) =>
      var prev = -1L
      hours.map { case (hourUs, n) =>
        prev = if (prev < 0) 1000 * n else (7 * prev + 1000 * n) / 8
        (typ, hourUs, n, prev)
      }
    }.toSet
    val got = TimeSeries.ewma(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("ts_changepoint: argmax of |CUSUM| with earliest-hour tiebreak") {
    val series = TimeSeries.gapFill(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(v => (v._2, v._3)).toVector).toMap
    val expect = series.map { case (typ, hours) =>
      val tT = hours.length.toLong
      val s = hours.map(_._2).sum
      var p = 0L
      val cs = hours.zipWithIndex.map { case ((hourUs, n), i) =>
        p += n
        (hourUs, i + 1L, math.abs(tT * p - (i + 1) * s), p)
      }
      val best = cs.maxBy(c => (c._3, -c._2)) // max |C|, ties earliest t
      val after =
        if (best._2 < tT) Some(1000 * (s - best._4) / (tT - best._2)) else None
      (typ, best._1, best._2, best._3, 1000 * best._4 / best._2, after, tT)
    }.toSet
    val got = TimeSeries.changepoint(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)),
        r.getLong(6))).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("ts_downsample: per-bucket max-curvature point, recomputed driver-side") {
    val series = TimeSeries.gapFill(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(v => (v._2, v._3)).toVector).toMap
    val expect = series.flatMap { case (typ, hours) =>
      val lo = hours.head._1
      hours.zipWithIndex.map { case ((hourUs, n), i) =>
        val prev = if (i > 0) hours(i - 1)._2 else 0L
        val next = if (i < hours.length - 1) hours(i + 1)._2 else 0L
        val bucket = (hourUs - lo) / 3600000000L / 24L
        (typ, bucket, hourUs, n, math.abs(prev + next - 2 * n))
      }.groupBy(t => (t._1, t._2)).map { case ((t, b), pts) =>
        val sel = pts.maxBy(p => (p._5, -p._3))
        (t, b, sel._3, sel._4, sel._5, pts.length.toLong)
      }
    }.toSet
    val got = TimeSeries.downsample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === expect)
    assert(got.nonEmpty)
    // it IS a downsample: one point per bucket, ~24x smaller
    val hoursTotal = series.values.map(_.size).sum
    assert(got.size * 20 < hoursTotal)
  }

  test("ts_gap_fill: contiguous hour spine per type, counts preserved") {
    val rows = TimeSeries.gapFill(spark, sf).collect()
    val ev = graft.Tables.events(spark, sf)
    assert(rows.map(_.getLong(2)).sum === ev.count())
    rows.groupBy(_.getString(0)).foreach { case (_, vs) =>
      val hours = vs.map(_.getLong(1)).sorted
      // every hour between min and max present exactly once
      assert(hours.toSeq === (hours.head to hours.last by 3600000000L))
      // gap-filled zeros actually appear (the data has quiet hours)
      assert(vs.exists(_.getLong(2) == 0L) || hours.length == vs.count(_.getLong(2) > 0))
    }
  }

  test("ts_retention: offset-0 equals cohort size, offsets bounded by it") {
    val rows = TimeSeries.retention(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    val cohortSize = rows.collect { case ((c, 0L), n) => c -> n }
    assert(cohortSize.nonEmpty) // every cohort's first week is offset 0
    rows.foreach { case ((c, off), n) =>
      assert(off >= 0L)
      assert(n <= cohortSize.toMap.apply(c),
        s"cohort $c offset $off has $n > cohort size")
    }
  }

  test("ts_running_total: last row equals the user's full sum, <=5 rows") {
    val rows = TimeSeries.runningTotal(spark, sf).collect()
    val totals = graft.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(sum(round(col("value") * 100).cast("long")).as("t"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (uid, vs) =>
      val (total, nEvents) = totals(uid)
      val sorted = vs.sortBy(_.getLong(1))
      assert(sorted.length <= 5)
      assert(sorted.last.getLong(1) === nEvents) // seq of the final event
      assert(sorted.last.getLong(4) === total)   // cumulative == full sum
      // running total increments by exactly the row value
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.getLong(4) - a.getLong(4) === b.getLong(3))
        case _ => ()
      }
    }
  }

  test("pipeline_train_data: end-to-end stage invariants hold") {
    val rows = Pipeline.trainDataPipeline(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.length < total) // stages actually filtered
    rows.foreach { r =>
      assert(r.getLong(3) >= 10L)        // quality gate held
      assert(r.getLong(0) % 50 != 0L)    // no eval docs leaked
      assert(r.getLong(4) >= 0L)
      assert(r.getLong(5) <= r.getLong(6)) // bin range sane
      assert(r.getLong(5) === r.getLong(4) / 512L)
    }
    // per-source offsets are contiguous: each doc starts where the
    // previous one ended
    rows.groupBy(_.getString(1)).foreach { case (_, vs) =>
      val sorted = vs.sortBy(_.getLong(0))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(4) === a.getLong(4) + a.getLong(3))
        case _ => ()
      }
      assert(sorted.head.getLong(4) === 0L)
    }
  }

  test("q_skew_join_salted equals the unsalted join result") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("value_c"))
    val dim = ev.select(col("event_type")).distinct()
      .withColumn("type_weight", length(col("event_type")).cast("long"))
    val plain = ev.join(dim, "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value_c") * col("type_weight")).as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Analytics.qSkewJoinSalted(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("sample_weighted: matches driver-side bottom-k and skews toward big docs") {
    val got = Sampling.sampleWeighted(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = docs.map { case (id, nc) =>
      (id, nc, (id % 1000000007L) * 2654435761L % 1000000007L / math.max(nc, 1L)) }
      .sortBy(t => (t._3, t._1)).take(20).zipWithIndex
      .map { case ((id, nc, p), i) => (id, nc, p, i + 1L) }
    assert(got.toSeq === want.toSeq)
    // weighting works: the weighted sample's mean size beats the corpus mean
    val corpusMean = docs.map(_._2).sum / docs.length
    val sampleMean = got.map(_._2).sum / got.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean <= corpus mean $corpusMean")
  }

  test("text_rarity: planted duplicate docs score identically; rare tokens raise the score") {
    import spark.implicits._
    // doc 1 and 2 are exact copies (common tokens); doc 3 adds tokens
    // appearing ONLY in it — rarer vocabulary must raise its mean
    val common = (1 to 30).map(i => s"w${i % 10}").mkString(" ")
    val docs = Seq(
      (1L, common), (2L, common),
      (3L, common + " zzyzx qwfp vexing")).toDF("doc_id", "text")
    val scores = TextAnalysis.rarityOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(scores(1L) === scores(2L))
    assert(scores(3L)._3 > scores(1L)._3,
      s"rare-token doc mean ${scores(3L)._3} <= common-only mean ${scores(1L)._3}")
    assert(scores.valuesIterator.forall { case (_, _, mean) => mean >= 1 && mean <= 1000000 })
    // full-corpus run: sane bounds on every doc
    val corpus = TextAnalysis.rarity(spark, sf).collect()
    assert(corpus.length === graft.Tables.documents(spark, sf).count())
    assert(corpus.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= 1000000))
  }

  test("text_chunk_dedup: copied docs are 100% duplicated chunks, unique docs 0%") {
    import spark.implicits._
    val mk = (seed: Int) => (1 to 60).map(i => s"t${seed}_$i").mkString(" ")
    // 1+2 identical (60 tokens = 3 full chunks each), 3 unique, 4 shares
    // its FIRST 20-token chunk with doc 3's first chunk but not the rest
    val d3 = mk(3)
    val firstChunk = d3.split(" ").take(20).mkString(" ")
    val docs = Seq(
      (1L, mk(1)), (2L, mk(1)), (3L, d3),
      (4L, firstChunk + " " + (1 to 40).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val stats = TextAnalysis.chunkDedupOf(docs, 20).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(stats(1L) === ((3L, 3L, 1000L)))
    assert(stats(2L) === ((3L, 3L, 1000L)))
    assert(stats(3L) === ((3L, 1L, 333L))) // only its first chunk leaked into doc 4
    assert(stats(4L) === ((3L, 1L, 333L)))
    // full-corpus run: per-mille arithmetic internally consistent
    val corpus = TextAnalysis.chunkDedup(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(corpus.nonEmpty)
    corpus.foreach { case (n, nd, pm) => assert(nd <= n && pm === nd * 1000 / n) }
  }

  test("q_hll_union: union estimate tracks exact distinct within HLL error") {
    // gated output: (event_type, exact_users, est_ok)
    val rows = Analytics.qHllUnion(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (totals, perType) = rows.partition(_._1 == "__ALL__")
    assert(totals.length === 1 && perType.nonEmpty)
    rows.foreach { case (t, _, ok) => assert(ok === 1L, s"$t: est_ok=0") }
    // the union row's exact count is the true global distinct (not the
    // sum of per-type exacts — users appear under several types)
    val (_, totalExact, _) = totals.head
    assert(totalExact <= perType.map(_._2).sum)
    assert(totalExact >= perType.map(_._2).max)
    // raw estimates (recomputed: per-type sketches + their union) stay
    // within the tight HLL band — default lgConfigK=12 → rsd ~1.6%;
    // allow 5% + slack
    val e = graft.Tables.events(spark, sf).select(col("event_type"), col("user_id"))
    val per = e.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("exact"))
    val perRows = per
      .select(col("event_type"),
        hll_sketch_estimate(col("sk")).cast("long").as("est"), col("exact"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val unionEst = per
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).cast("long")).head().getLong(0)
    val globalExact = e.agg(countDistinct(col("user_id"))).head().getLong(0)
    (perRows :+ (("__ALL__", unionEst, globalExact))).foreach { case (t, est, exact) =>
      assert(math.abs(est - exact) <= exact / 20 + 2,
        s"$t: HLL est $est vs exact $exact")
    }
  }

  test("cdc_variant_extract matches the string-JSON extraction path") {
    val variant = graft.cdc.Changefeed.variantExtract(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val json = graft.cdc.Changefeed.jsonExtract(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(variant.map(v => (v._1, v._2)).toSeq === json.toSeq)
    assert(variant.forall(_._3 === -1L)) // missing path → typed null → sentinel
    assert(variant.nonEmpty)
  }

  test("ts_sliding_distinct: 24h union estimate tracks an exact recompute") {
    // gated output: (hour_us, hour_exact, exact_24h, n_hours_window, est_ok)
    val got = TimeSeries.slidingDistinct(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    // the exact trailing-24h distinct from the interval diff-array must
    // equal a naive time-range recompute from raw events
    val raw = graft.Tables.events(spark, sf)
      .select(date_trunc("hour", col("ts")).cast("long").as("hour_us"), col("user_id"))
      .collect().map(r => (r.getLong(0) * 1000000L, r.getLong(1)))
    got.foreach { case (h, hourExact, exact24, nw, estOk) =>
      val lo = h - 23L * 3600000000L
      val exact = raw.filter(t => t._1 >= lo && t._1 <= h).map(_._2).distinct.length
      assert(exact24 === exact.toLong, s"hour $h: exact_24h $exact24 vs $exact")
      val nwExact = got.map(_._1).count(x => x >= lo && x <= h)
      assert(nw === nwExact.toLong)
      assert(estOk === 1L, s"hour $h: est_ok=0")
      assert(exact24 >= hourExact) // window is a superset of the hour
    }
  }

  test("q_heavy_hitters: count-min never underestimates, overshoot within bound") {
    val rows = Analytics.qHeavyHitters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val n = rows.head._4
    rows.foreach { case (uid, exact, est, _, slack) =>
      assert(est >= exact, s"CM underestimated user $uid: $est < $exact")
      assert(slack === est - exact)
      // 4 rows × 1024 counters on this corpus: observed slack is tiny;
      // 3·N/w is the standard w.h.p. bound
      assert(slack <= 3 * n / 1024 + 1, s"user $uid slack $slack vs N=$n")
    }
    // determinism: the sketch is a commutative sum — rerun must match
    val again = Analytics.qHeavyHitters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(again.toSeq === rows.map(r => (r._1, r._3)).toSeq)
  }

  test("stream_session_native: session_window output == lag+cumsum sessionize bit-for-bit") {
    val native = StreamOps.sessionizeNative(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val manual = StreamOps.sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(native.toSeq === manual.toSeq)
    assert(native.nonEmpty)
  }

  test("q_ntile_decile: histogram-rank bands match a driver-side recompute") {
    val rows = Analytics.qNtileDecile(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // recompute the tie-sharing rank-band rule per type on the driver:
    // a run of equal values lands wholly in the decile of its first row
    val raw = graft.Tables.events(spark, sf)
      .select(col("event_type"), graft.functions.Fns.cents(col("value")))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = raw.groupBy(_._1).flatMap { case (t, vs) =>
      val n = vs.length.toLong
      val hist = vs.map(_._2).groupBy(identity).toSeq.sortBy(_._1)
      var before = 0L
      val banded = hist.map { case (v, run) =>
        val d = 1L + (10L * before) / n
        before += run.length
        (d, v, run.length.toLong)
      }
      banded.groupBy(_._1).map { case (d, xs) =>
        (t, d, xs.map(_._3).sum, xs.map(_._2).min, xs.map(_._2).max)
      }
    }.toSet
    assert(rows.toSet === expected)
    // bands ordered and value-DISJOINT (each distinct value in one band)
    rows.groupBy(_._1).foreach { case (_, ds) =>
      val byDecile = ds.sortBy(_._2)
      byDecile.foreach { case (_, d, _, lo, hi) =>
        assert(lo <= hi && d >= 1L && d <= 10L)
      }
      byDecile.sliding(2).foreach {
        case Array(a, b) => assert(a._5 < b._4)
        case _ => ()
      }
    }
  }

  test("q_corr_moments: centered moments match a driver-side exact computation") {
    val got = Analytics.qCorrMoments(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val raw = graft.Tables.events(spark, sf)
      .select(col("event_type"), graft.functions.Fns.cents(col("value")),
        hour(col("ts")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    raw.groupBy(_._1).foreach { case (t, xs) =>
      val n = xs.length.toLong
      val mx = xs.map(_._2).sum / n; val my = xs.map(_._3).sum / n
      val m2x = xs.map(v => (v._2 - mx) * (v._2 - mx)).sum
      val m2y = xs.map(v => (v._3 - my) * (v._3 - my)).sum
      val mxy = xs.map(v => (v._2 - mx) * (v._3 - my)).sum
      assert(got(t) === ((n, mx, my, m2x, m2y, mxy)))
    }
  }

  test("graph_triangles: K4 plus a pendant path counts exactly") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, each node in 3) + path 4-5-6 (none)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("doc_a", "doc_b")
    val got = Graph.trianglesFrom(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("graph_triangles: skewed star has no triangles, wheel hub does") {
    import spark.implicits._
    // star hub 0 with 20 leaves: no closing edges → no triangles;
    // add rim edges between consecutive leaves → each rim edge closes
    val star = (1L to 20L).map(i => (0L, i))
    val rim = (1L until 20L).map(i => (i, i + 1))
    assert(Graph.trianglesFrom(star.toDF("doc_a", "doc_b")).count() === 0)
    val wheel = Graph.trianglesFrom((star ++ rim).toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wheel(0L) === 19L) // hub sits in every rim triangle
    assert(wheel(1L) === 1L && wheel(10L) === 2L)
  }

  test("graph_kcore: crafted cores peel exactly") {
    import spark.implicits._
    // triangle {1,2,3} + tail 3-4-5: the 2-core is exactly the triangle
    val g1 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
    val core2 = Graph.kcoreFrom(g1.toDF("doc_a", "doc_b"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // K4 {1..4} + pendant chain: 3-core is exactly the K4...
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    val core3 = Graph.kcoreFrom(k4.toDF("doc_a", "doc_b"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core3 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // ...and the 4-core is empty
    assert(Graph.kcoreFrom(k4.toDF("doc_a", "doc_b"), 4).count() === 0L)
    // a star never has a 2-core no matter how big the hub degree
    val star = (1L to 30L).map(i => (0L, i))
    assert(Graph.kcoreFrom(star.toDF("doc_a", "doc_b"), 2).count() === 0L)
  }

  test("property: kcoreFrom == driver peeling on randomized graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xC04E)
    for (trial <- 0 until 3) {
      val n = 15 + rnd.nextInt(15)
      val edges = (for {
        i <- 0 until n; j <- (i + 1) until n
        if rnd.nextDouble() < 0.2
      } yield (i.toLong, j.toLong)).toVector
      val k = 2 + trial // k = 2, 3, 4
      var es = edges.toSet
      var done = false
      while (!done) {
        val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val pruned = es.filter(e => deg(e._1) >= k && deg(e._2) >= k)
        done = pruned == es; es = pruned
      }
      val expected = es.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = Graph.kcoreFrom(edges.toDF("doc_a", "doc_b"), k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial k=$k")
    }
  }

  test("property: trianglesFrom == brute force on randomized graphs") {
    import spark.implicits._
    // 8 random graphs of varied density in one frame (node ids offset
    // per graph so they are independent components): degree orientation,
    // wedge dedup, and the closing-edge join must reproduce the O(n³)
    // reference count exactly — including hub-heavy shapes where a
    // naive id-orientation would blow up the wedge fanout.
    val rnd = new scala.util.Random(0x7121A)
    val all = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val expected = scala.collection.mutable.Map[Long, Long]()
    for (g <- 0 until 8) {
      val n = 6 + rnd.nextInt(20)
      val p = 0.15 + rnd.nextDouble() * 0.5
      val base = g.toLong * 1000L
      val edges = for {
        i <- 0 until n; j <- (i + 1) until n
        if rnd.nextDouble() < p
      } yield (base + i, base + j)
      all ++= edges
      val es = edges.toSet
      for {
        i <- 0 until n; j <- (i + 1) until n; k <- (j + 1) until n
        if es((base + i, base + j)) && es((base + j, base + k)) &&
          es((base + i, base + k))
      } Seq(i, j, k).foreach { v =>
        expected(base + v) = expected.getOrElse(base + v, 0L) + 1L
      }
    }
    val got = Graph.trianglesFrom(all.toSeq.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected.toMap)
  }

  test("text_bpe_pairs: pairs are 2 chars, counts descend, real corpus pair leads") {
    val rows = TextAnalysis.bpePairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length === 20)
    assert(rows.forall(_._1.length == 2))
    assert(rows.map(_._2).sliding(2).forall { w => w.length < 2 || w(0) >= w(1) })
    // counts are corpus-scale, not accidental: top pair appears a lot
    assert(rows.head._2 > 100L)
  }

  test("layout_zorder: every file spans at most 128 of each 1024-wide dimension") {
    val rows = Layout.zorder(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) < 128L, s"x span too wide in $r")
      assert(r.getLong(5) - r.getLong(4) < 128L, s"y span too wide in $r")
    }
    // z ranges partition the curve: files are disjoint and ordered
    val zs = rows.map(r => (r.getLong(6), r.getLong(7)))
    zs.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0)._2 < w(1)._1)
    }
  }

  test("layout_hilbert: walk matches reference xy2d; files are compact and disjoint") {
    import spark.implicits._
    // reference xy2d (the standard iterative rotate/reflect walk)
    def xy2d(bits: Int, x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = 1L << (bits - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val rnd = new scala.util.Random(7)
    val pts = Seq.tabulate(500)(_ =>
      (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong)) ++
      Seq((0L, 0L), (1023L, 0L), (0L, 1023L), (1023L, 1023L))
    val got = Layout.hilbertIndex(pts.toDF("x", "y")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === xy2d(10, x, y), s"d mismatch at ($x,$y)")
    }

    val rows = Layout.hilbert(spark, sf).collect()
    assert(rows.nonEmpty)
    // contiguous d-ranges are compact blobs: a 16384-cell curve segment
    // can straddle one 128x128 quadrant boundary but never sprawl —
    // both spans bounded by 2x the quadrant side
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) < 256L, s"x span too wide in $r")
      assert(r.getLong(5) - r.getLong(4) < 256L, s"y span too wide in $r")
    }
    // d ranges partition the curve: files disjoint and ordered
    rows.map(r => (r.getLong(6), r.getLong(7))).sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0)._2 < w(1)._1)
    }
    // row conservation vs the events table
    assert(rows.map(_.getLong(1)).sum === graft.Tables.events(spark, sf).count())
  }

  test("layout_hilbert: consecutive distances are ADJACENT cells — exhaustively") {
    import spark.implicits._
    // THE Hilbert property (what zorder lacks): walk the ENTIRE
    // 1024×1024 grid, pair every d with d+1, assert the cells touch
    // (|Δx|+|Δy| == 1). Proven in-engine over all 2^20 cells — the
    // locality claim in §2#154 is exhaustive, not sampled.
    val grid = spark.range(0L, 1L << 20)
      .select((col("id") % 1024).as("x"), expr("id div 1024").as("y"))
    val d = Layout.hilbertIndex(grid)
    val bad = d.select(col("d"), col("x0"), col("y0"))
      .join(d.select((col("d") - 1).as("d"),
        col("x0").as("x1"), col("y0").as("y1")), "d")
      .where(abs(col("x0") - col("x1")) + abs(col("y0") - col("y1")) =!= 1)
      .count()
    assert(bad === 0L, s"$bad consecutive-d pairs are not adjacent")
    // and the walk is a bijection: 2^20 distinct distances
    assert(d.select(col("d")).distinct().count() === (1L << 20))
  }

  test("q_grouping_sets: each grouping matches its direct aggregate") {
    val rows = Analytics.qGroupingSets(spark, sf).collect()
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_linestatus"),
        graft.functions.Fns.cents(col("l_quantity")).as("q"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // gid 1 = by returnflag, gid 2 = by linestatus, gid 3 = grand total
    val byFlag = rows.filter(_.getLong(0) == 1L)
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(byFlag === li.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap)
    val byStatus = rows.filter(_.getLong(0) == 2L)
      .map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(byStatus === li.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap)
    val total = rows.filter(_.getLong(0) == 3L)
    assert(total.length === 1 && total(0).getLong(3) === li.map(_._3).sum)
    assert(rows.map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
  }

  test("cdc_snapshot_diff: statuses reconcile with a driver-side recompute") {
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        graft.functions.Fns.cents(col("value")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val cut = (evs.map(_._4).min + evs.map(_._4).max) / 2
    def latest(rows: Seq[(Long, String, Long, Long, Long)]) =
      rows.groupBy(r => (r._1, r._2)).view
        .mapValues(_.maxBy(r => (r._4, r._3))).toMap
    val b = latest(evs.toSeq)
    val a = latest(evs.toSeq.filter(_._4 <= cut))
    val expected = b.flatMap { case (pk, bv) =>
      a.get(pk) match {
        case None => Some(pk -> ("added", None, Some(bv._3)))
        case Some(av) if av._3 != bv._3 || av._5 != bv._5 =>
          Some(pk -> ("changed", Some(av._3), Some(bv._3)))
        case _ => None
      }
    }
    val got = Changefeed.snapshotDiff(spark, sf).collect().map { r =>
      (r.getLong(0), r.getString(1)) -> (r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))
    }.toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("cdc_dlq: exactly the injected corruptions route to the dead letter queue") {
    val rows = Changefeed.dlq(spark, sf).collect()
    val events = graft.Tables.events(spark, sf)
      .select(col("event_id")).collect().map(_.getLong(0))
    val bad = events.filter(_ % 97 == 0)
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === events.length.toLong)
    assert(rows.map(_.getLong(2)).sum === bad.length.toLong)
    // first bad id per partition is the min corrupted id of that partition
    rows.filter(!_.isNullAt(3)).foreach { r =>
      val part = r.getLong(0)
      assert(r.getLong(3) === bad.filter(_ % 32 == part).min)
    }
  }

  test("text_bigram_lm: word salad scores below natural repetition") {
    import spark.implicits._
    // 8 docs of identical prose (their bigrams dominate the corpus)
    // vs one doc using the same words in a scrambled, unseen order
    val prose = (1L to 8L).map(i => (i, "the cat sat on the mat " * 4))
    val salad = Seq((99L, "mat the on sat cat cat mat on the sat the"))
    val out = TextAnalysis.bigramLmFrom((prose ++ salad).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) > out(99L) * 2, s"prose ${out(1L)} !>> salad ${out(99L)}")
    val real = TextAnalysis.bigramLm(spark, sf).collect()
    assert(real.forall(r => r.getLong(2) > 0L && r.getLong(2) <= 1000000L))
  }

  test("text_perplexity: EQUALS integer brute force; salad above prose") {
    import spark.implicits._
    val prose = (1L to 8L).map(i => (i, "the cat sat on the mat " * 4))
    val salad = Seq((99L, "mat the on sat cat cat mat on the sat the"))
    val corpus = prose ++ salad
    val out = TextAnalysis.perplexityFrom(corpus.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute force with the same integer definition: q = n1 div n2 capped,
    // half-bit surprisal = floor(2*log2(q)) via leading zeros, mean in
    // millibits = 500*sum div n — the engine must match EXACTLY
    val toks = corpus.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val n1 = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong)
    val bgs = toks.map { case (id, ts) => id -> ts.zip(ts.tail) }
    val n2 = bgs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong)
    val want = bgs.filter(_._2.nonEmpty).map { case (id, bg) =>
      val hbs = bg.map { p =>
        val q = math.min(n1(p._1) / n2(p), 2147483647L)
        (63 - java.lang.Long.numberOfLeadingZeros(q * q)).toLong
      }
      (id, bg.size.toLong, 500L * hbs.sum / bg.size)
    }.sortBy(_._1)
    assert(out.toSeq === want)
    // the scrambled doc is MORE surprising than the stock prose
    val ppl = out.map(r => r._1 -> r._3).toMap
    assert(ppl(99L) > ppl(1L), s"salad ${ppl(99L)} !> prose ${ppl(1L)}")
    val real = TextAnalysis.perplexity(spark, sf).collect()
    assert(real.forall(r => r.getLong(2) >= 0L && r.getLong(2) <= 62000L))
  }

  test("text_token_entropy: EQUALS integer brute force; degenerate=0, uniform≈log2 n") {
    import spark.implicits._
    val docs = Seq(
      1L -> "a a a a a a a a",                      // single token: 0 bits
      2L -> "a b c d e f g h",                      // uniform 8: exactly 3 bits
      3L -> ("spam " * 99 + "ham"))                 // 99%-one-token skew
    val out = TextAnalysis.tokenEntropyFrom(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = docs.map { case (id, t) =>
      val c = t.trim.split("\\s+").toSeq.groupBy(identity).view.mapValues(_.size.toLong)
      val n = c.values.sum
      val s = c.values.map { ci =>
        val q = math.min(n / ci, 2147483647L)
        ci * (63 - java.lang.Long.numberOfLeadingZeros(q * q))
      }.sum
      (id, n, c.size.toLong, 500L * s / n)
    }.sortBy(_._1)
    assert(out.toSeq === want)
    val byId = out.map(r => r._1 -> r._4).toMap
    assert(byId(1L) === 0L)            // degenerate distribution
    assert(byId(2L) === 3000L)         // uniform 8 = exactly 3 bits
    assert(byId(3L) < 500L)            // heavy skew ≈ low entropy
    val real = TextAnalysis.tokenEntropy(spark, sf).collect()
    assert(real.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 62000L))
  }

  test("sample_epochs: conservation, caps, and the exact split-product share") {
    val rows = Sampling.sampleEpochs(spark, sf).collect()
    assert(rows.nonEmpty)
    val avail = rows.map(_.getLong(1)); val ideal = rows.map(_.getLong(3))
    val budget = 2L * avail.sum
    // shares were computed with the exact floor(b*w/sum_w) split —
    // recompute with BigInt (no overflow dodge needed at test scale)
    val w = avail.map(a => math.sqrt(a.toDouble).toLong)
    val wSum = w.sum
    rows.indices.foreach { i =>
      val want = (BigInt(budget) * w(i) / wSum).toLong
      assert(ideal(i) === want, s"share $i: ${ideal(i)} != $want")
    }
    // allocation never exceeds the budget and floor-rounding loses < |sources|
    assert(ideal.sum <= budget && budget - ideal.sum < rows.length.toLong)
    rows.foreach { r =>
      val (a, e, real, util) = (r.getLong(1), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(e >= 1 && e <= 4)
      assert(real <= r.getLong(3) && real <= e * a)
      // realized falls short of ideal ONLY when the epoch cap binds
      if (real < r.getLong(3)) assert(e === 4L && real === 4L * a)
      assert(util >= 0 && util <= 1000)
    }
  }

  test("sample_split: fractions near 90/5/5 and membership survives corpus growth") {
    val rows = Sampling.sampleSplit(spark, sf).collect()
    val bySplit = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
    val total = bySplit.values.sum.toDouble
    assert(math.abs(bySplit("train") / total - 0.9) < 0.05)
    assert(math.abs(bySplit("val") / total - 0.05) < 0.03)
    assert(math.abs(bySplit("test") / total - 0.05) < 0.03)
    // bucket thresholds actually held per split
    rows.foreach { r =>
      r.getString(1) match {
        case "train" => assert(r.getLong(4) < 900L)
        case "val" => assert(r.getLong(3) >= 900L && r.getLong(4) < 950L)
        case "test" => assert(r.getLong(3) >= 950L)
      }
    }
    // the no-leakage property: membership is a pure function of doc_id,
    // so a doc's split under a HALF corpus equals its split under the
    // full corpus (a random split would reshuffle everything)
    def splitOf(id: Long): String = {
      val b = (id % 1000000007L) * 2654435761L % 1000000007L % 1000L
      if (b < 900) "train" else if (b < 950) "val" else "test"
    }
    val ids = graft.Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val fullAssign = ids.map(id => id -> splitOf(id)).toMap
    ids.filter(_ % 2 == 0).foreach(id => assert(splitOf(id) === fullAssign(id)))
  }

  test("ts_xcorr equals a driver-side centered cross-moment recompute") {
    val hourUs = 3600000000L
    val evs = graft.Tables.events(spark, sf)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1) / hourUs))
    def counts(t: String) = evs.filter(_._1 == t).groupBy(_._2)
      .view.mapValues(_.size.toLong).toMap
    val (ca, cb) = (counts("click"), counts("purchase"))
    val lo = math.max(ca.keys.min, cb.keys.min)
    val hi = math.min(ca.keys.max, cb.keys.max)
    val span = (lo to hi).toVector
    val a = span.map(h => ca.getOrElse(h, 0L))
    val b = span.map(h => cb.getOrElse(h, 0L))
    val (ma, mb) = (a.sum / a.size, b.sum / b.size)
    val expected = (-3 to 3).map { k =>
      val pairs = span.indices.filter(i => i + k >= 0 && i + k < span.size)
      k.toLong -> (pairs.size.toLong,
        pairs.map(i => (a(i) - ma) * (b(i + k) - mb)).sum)
    }.toMap
    val got = TimeSeries.xcorr(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
    // full-overlap lag 0 covers the whole span; |lag|=3 loses 3 pairs
    assert(got(0L)._1 === span.size.toLong && got(3L)._1 === span.size - 3L)
  }

  test("ts_seasonal: profile is the floor mean, residuals rebalance within each slot") {
    val rows = TimeSeries.seasonal(spark, sf).collect()
    assert(rows.nonEmpty)
    // hod is h mod 24 and seasonal_n is constant within a (type, hod) slot
    rows.foreach(r => assert(r.getLong(2) === ((r.getLong(1) % 24) + 24) % 24))
    rows.groupBy(r => (r.getString(0), r.getLong(2))).foreach { case (_, slot) =>
      assert(slot.map(_.getLong(4)).distinct.length === 1)
      // floor-mean property: 0 <= sum(n) - c*seasonal == sum(residual) < c
      val resid = slot.map(_.getLong(5)).sum
      assert(resid >= 0L && resid < slot.length.toLong, s"slot residual $resid")
      // residual is n - seasonal on every row
      slot.foreach(r => assert(r.getLong(5) === r.getLong(3) - r.getLong(4)))
    }
  }

  test("ts_interpolate equals an exact driver-side piecewise recompute") {
    val hourUs = 3600000000L
    val evs = graft.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        graft.functions.Fns.cents(col("value")).as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1) / hourUs, r.getLong(2)))
    val expected = evs.groupBy(_._1).flatMap { case (t, xs) =>
      val sums = xs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val ns = xs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val (lo, hi) = (xs.map(_._2).min, xs.map(_._2).max)
      (lo to hi).map { h =>
        val n = ns.getOrElse(h, 0L)
        val filled: Option[Long] =
          if (n > 0) Some(sums(h))
          else {
            val ph = (lo until h).reverse.find(ns.contains)
            val nh = ((h + 1) to hi).find(ns.contains)
            for (p <- ph; q <- nh)
              yield (sums(p) * (q - h) + sums(q) * (h - p)) / (q - p)
          }
        val src = if (n > 0) "obs" else if (filled.isDefined) "interp" else "edge"
        (t, h) -> (n, filled, src)
      }
    }
    val got = TimeSeries.interpolate(spark, sf).collect().map { r =>
      (r.getString(0), r.getLong(1)) -> (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getString(4))
    }.toMap
    assert(got === expected)
  }

  test("ts_interpolate: observed rows keep sums, interp rows sit between neighbors") {
    val rows = TimeSeries.interpolate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, series) =>
      val s = series.sortBy(_.getLong(1))
      // every row is obs, interp, or edge; obs/interp have filled values
      s.foreach { r =>
        val src = r.getString(4)
        assert(Set("obs", "interp", "edge").contains(src))
        assert((src == "edge") === r.isNullAt(3))
      }
      // interp rows are bounded by the surrounding observed values
      val obsIdx = s.zipWithIndex.filter(_._1.getString(4) == "obs").map(_._2)
      s.zipWithIndex.filter(_._1.getString(4) == "interp").foreach { case (r, i) =>
        val lo = obsIdx.filter(_ < i).max; val hi = obsIdx.filter(_ > i).min
        val (a, b) = (s(lo).getLong(3), s(hi).getLong(3))
        assert(r.getLong(3) >= math.min(a, b) && r.getLong(3) <= math.max(a, b))
      }
    }
  }

  test("sample_cap_per_source: equals the window-rank recompute, runs on TopKPerKeyExec") {
    val got = Sampling.capPerSource(spark, sf)
    val rows = got.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // ground truth: quality join + driver-side rank, same tie rule
    val quality = TextAnalysis.quality(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(6)).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.map { case (id, _) => (id, quality(id)) }
        .sortBy { case (id, q) => (-q, id) }
        .take(20).zipWithIndex
        .map { case ((id, q), i) => (src, id, q, i + 1L) }
    }.sortBy(t => (t._1, t._4))
    assert(rows.toSeq === want)
    // every source is capped, none dropped entirely
    val perSource = rows.groupBy(_._1).view.mapValues(_.length)
    assert(perSource.values.forall(_ <= 20))
    assert(perSource.keySet === docs.map(_._2).toSet)
    // the plan runs the native bounded-buffer operator, not a window
    // sort over raw docs
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected TopKPerKeyExec:\n$plan")
    assert(!plan.contains("Window"), s"no WindowExec should remain:\n$plan")
  }

  test("ann_sq_topk: valid ranks, high recall vs exact brute force") {
    val got = Similarity.sqTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.size.toLong))
      assert(rows.forall(_._2 != q))
    }
    val exact = Similarity.bruteforceTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val approx = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(approx.keySet === exact.keySet)
    val hits = exact.keys.toSeq.map(q =>
      (approx.getOrElse(q, Set.empty) & exact(q)).size).sum
    val total = exact.values.map(_.size).sum
    info(s"ann_sq_topk recall@5 = $hits/$total")
    // SQ8 error is <= step/2 per dim — far tighter than PQ's subspace
    // centroids, so the bar sits above PQ's 70%
    assert(hits * 10 >= total * 8, s"recall@5 too low: $hits/$total")
  }

  test("ann_filtered_topk: neighbors honor the label filter; filter-first beats post-filter") {
    val labels = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Similarity.filteredTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got.nonEmpty)
    // every neighbor shares its query's label — the filter semantics
    got.foreach { case (q, n, lbl, _) =>
      assert(lbl === labels(q).toLong, s"query $q got off-label neighbor $n")
      assert(n !== q)
    }
    // ranks are contiguous from 1 per query
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1L to rows.size.toLong),
        s"query $q ranks not contiguous")
    }
    // filter-first ≠ post-filter: some query's filtered top-k includes a
    // neighbor the UNFILTERED top-k missed (post-filtering would have
    // dropped it and under-delivered)
    val unfiltered = Similarity.bruteforceTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val gained = got.exists { case (q, n, _, _) => !unfiltered(q).contains(n) }
    assert(gained, "filtered results never diverged from post-filtering " +
      "(corpus too label-pure for this spec to mean anything)")
  }

  test("ts_lateness: per-user frontier lateness lands in the right buckets") {
    import spark.implicits._
    val minUs = 60000000L
    val hourUs = 3600000000L
    // user 1 in commit order: frontier 1000s → a 50s-late event →
    // frontier advances → a 2h-late straggler
    // user 2: strictly increasing (all on time) — frontiers are per-user,
    // so user 1's straggler must not contaminate user 2
    val events = Seq(
      (1L, 1000 * 1000000L, 10L, "click"),
      (2L, 950 * 1000000L, 10L, "click"), // 50 s late → late_1m
      (3L, 2000 * 1000000L, 10L, "click"),
      (4L, 2000 * 1000000L - 2 * hourUs, 10L, "click"), // 2 h late → late_more
      (5L, 100 * 1000000L, 20L, "view"),
      (6L, 200 * 1000000L, 20L, "view"))
      .toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"))
    val got = TimeSeries.latenessFrom(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === Seq(
      ("click", 4L, 2L, 1L, 0L, 1L, 2 * hourUs),
      ("view", 2L, 2L, 0L, 0L, 0L, 0L)))
    // boundary pins: exactly 1 min late is late_1m; 1 min + 1 µs is late_1h
    val edge = Seq(
      (1L, 10 * hourUs, 1L, "a"), (2L, 10 * hourUs - minUs, 1L, "a"),
      (3L, 20 * hourUs, 2L, "b"), (4L, 20 * hourUs - minUs - 1L, 2L, "b"))
      .toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"))
    val e = TimeSeries.latenessFrom(edge).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4))).toSeq
    assert(e === Seq(("a", 1L, 0L), ("b", 0L, 1L)))
  }
}
