package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.Changefeed
import graft.operators.{Analytics, Dedup, Graph, Layout, Multimodal, Sampling, Similarity, TextAnalysis, TimeSeries}

/** Empirical scale-curve check for the dedup suite (SURVEY §5).
  *
  * The §5 scaling claims ("bucket-first candidate generation is
  * near-linear, never doc×doc") were design-argued; this measures them.
  * It builds a Kx corpus (default 10x) as a union of K perturbed copies
  * of the sf0.1 documents table — every alphanumeric token gets a
  * per-copy suffix, so each copy keeps the ORIGINAL's intra-copy
  * dup/near-dup structure while copies share no shingles and no exact
  * hashes with each other (corpus growth, not df inflation: per-shingle
  * document frequency stays constant, which is what real crawl growth
  * looks like after the df prefix filter) — then times
  * exact / ngram_jaccard / minhash_lsh / cluster at 1x and Kx with the
  * candidate memo invalidated per repetition, and prints one JSON line
  * with the time ratios. Near-linear ops should show ratio ≲ K + fixed
  * overhead; a quadratic candidate stage would show ~K².
  *
  * The 1x side is copy 0 of the SAME generator (not the raw table), so
  * both measurements read identically-shaped, identically-written
  * parquet. Output goes under target/scale (gitignored, inside the
  * repo).
  */
object ScaleCheck {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val outBase = "target/scale"
    val x1Dir = s"$outBase/x1"
    val xkDir = s"$outBase/x$k"
    writeCorpus(spark, sfDir, x1Dir, 1)
    writeCorpus(spark, sfDir, xkDir, k)

    // Each op gets (session, dir, scale) — `scale` is 1 on the 1× side
    // and K on the K× side, so ops whose documented 100 TB lever is a
    // corpus-proportional knob can actually TURN it here (semantic
    // dedup grows nCells ∝ corpus; everything else ignores it).
    val allOps: Seq[(String, (SparkSession, String, Int) => DataFrame)] = Seq(
      "dedup_exact" -> ((s: SparkSession, d: String, _: Int) =>
        Dedup.exact(s, d)),
      "dedup_ngram_jaccard" -> ((s: SparkSession, d: String, _: Int) =>
        Dedup.ngramJaccard(s, d)),
      // r10: the PPJoin prefix path — join volume bounded by prefix
      // collisions instead of df²; the perturbed copies keep df
      // constant, so expect the same ~K× band as the df-cap join
      "dedup_jaccard_prefix" -> ((s: SparkSession, d: String, _: Int) =>
        Dedup.jaccardPrefix(s, d)),
      // cross-source form: global df ordering, no source bucketing —
      // the perturbed copies share no shingles, so candidates stay
      // linear and this measures the global prefix machinery itself
      "dedup_jaccard_global" -> ((s: SparkSession, d: String, _: Int) =>
        Dedup.jaccardGlobal(s, d)),
      // BFS rides the CC labels + candidate graph; star-like clusters
      // keep rounds constant, so expect the candidate-family band
      "graph_bfs_dist" -> ((s: SparkSession, d: String, _: Int) =>
        Graph.bfsDist(s, d)),
      // pure combinable aggs + broadcast scalar — scan-speed band
      "ts_trend" -> ((s: SparkSession, d: String, _: Int) =>
        TimeSeries.trend(s, d)),
      // r10-2: shared time span → |weeks| constant, per-cell counts
      // grow; user universe grows (shifted ids), so the distinct pass
      // and cohort table grow ~K× at constant matrix size per cohort
      "ts_cohort_matrix" -> ((s: SparkSession, d: String, _: Int) =>
        TimeSeries.cohortMatrix(s, d)),
      // per-stage equi-joins on user_id; K× users at constant per-user
      // history → ~K×
      "q_funnel_windowed" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.qFunnelWindowed(s, d)),
      // histogram window over |distinct spend values| (value-range
      // bounded); the per-user agg is the only K×-growing stage
      "q_decile_lift" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.qDecileLift(s, d)),
      // 96 min-aggs over K× shingles + band probes ∝ increment size
      "dedup_incremental_minhash" -> ((s: SparkSession, d: String, _: Int) =>
        Dedup.incrementalMinhash(s, d)),
      "dedup_minhash_lsh" -> ((s: SparkSession, d: String, _: Int) =>
        Dedup.minhashLsh(s, d)),
      "dedup_cluster" -> ((s: SparkSession, d: String, _: Int) =>
        Dedup.cluster(s, d)),
      // SemDeDup with its documented scale lever engaged: nCells grows
      // ∝ corpus (8 → 8K), so per-cell pair work SHOULD stay constant
      // and the whole op track ~K× — this is the claim §5 makes about
      // the LAION-recipe shape, measured instead of argued
      "dedup_semantic" -> ((s: SparkSession, d: String, k: Int) =>
        Dedup.semantic(s, d, nCells = 8 * k)),
      // degree-oriented wedge join over the candidate graph: fanout is
      // bounded by arboricity, which the perturbed copies hold constant
      "graph_triangles" -> ((s: SparkSession, d: String, _: Int) =>
        Graph.triangles(s, d)),
      "graph_kcore" -> ((s: SparkSession, d: String, _: Int) =>
        Graph.kcore(s, d)),
      // text family: narrow maps + bounded aggregates — these should
      // track the data growth even more tightly than the dedup joins
      "text_normalize" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.normalize(s, d)),
      "text_chunk_dedup" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.chunkDedup(s, d)),
      "text_salient_terms" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.salientTerms(s, d)),
      "text_bpe_pairs" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.bpePairs(s, d)),
      "text_bigram_lm" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.bigramLm(s, d)),
      "text_decontaminate" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.decontaminate(s, d)),
      "text_gopher_rules" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.gopherRules(s, d)),
      // similarity family over the scaled embeddings corpus: brute
      // force reads the whole corpus per query (expected ~K×); LSH and
      // IVF probe buckets/cells whose sizes grow ∝ corpus at fixed
      // bits/cells (also ~K× — the scale LEVER is more bits/cells,
      // which this run holds constant by design)
      "ann_bruteforce_topk" -> ((s: SparkSession, d: String, _: Int) =>
        Similarity.bruteforceTopk(s, d)),
      "ann_lsh_topk" -> ((s: SparkSession, d: String, _: Int) =>
        Similarity.lshTopk(s, d)),
      "ann_ivf_topk" -> ((s: SparkSession, d: String, _: Int) =>
        Similarity.ivfTopk(s, d)),
      // label filter in the join condition: per-query candidates are the
      // label slice, so corpus growth at fixed label count should track
      // ~K× (slice grows ∝ corpus) with the broadcast query side fixed
      "ann_filtered_topk" -> ((s: SparkSession, d: String, _: Int) =>
        Similarity.filteredTopk(s, d)),
      // events-table family: snapshot-diff shuffles once on the PK and
      // its group COUNT grows ∝ corpus (constant group size — the
      // user_id shift below is what makes that true); schema-drift's
      // shuffle carries |tables|×|keys| rows regardless of feed size;
      // zorder is a narrow integer map + a 64-row stats agg
      "cdc_snapshot_diff" -> ((s: SparkSession, d: String, _: Int) =>
        Changefeed.snapshotDiff(s, d)),
      "cdc_schema_drift" -> ((s: SparkSession, d: String, _: Int) =>
        Changefeed.schemaDrift(s, d)),
      "layout_zorder" -> ((s: SparkSession, d: String, _: Int) =>
        Layout.zorder(s, d)),
      // r9 second-session additions. The time SPAN of the copies is
      // shared, so the hourly pre-aggregates' |hours| stays constant
      // while per-hour counts grow K× — exactly the claimed shape: the
      // combinable pre-agg absorbs growth, series folds/windows stay
      // fixed-size. recursive_chain's users multiply at constant chain
      // length, so recursion ROUNDS stay constant too.
      "ts_ewma" -> ((s: SparkSession, d: String, _: Int) =>
        TimeSeries.ewma(s, d)),
      "ts_changepoint" -> ((s: SparkSession, d: String, _: Int) =>
        TimeSeries.changepoint(s, d)),
      "q_recursive_chain" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.qRecursiveChain(s, d)),
      "cdc_resolved_batches" -> ((s: SparkSession, d: String, _: Int) =>
        Changefeed.resolvedBatches(s, d)),
      "cdc_table_router" -> ((s: SparkSession, d: String, _: Int) =>
        Changefeed.tableRouter(s, d)),
      "layout_hilbert" -> ((s: SparkSession, d: String, _: Int) =>
        Layout.hilbert(s, d)),
      // stub decode path: measures the mapPartitions plumbing + the
      // relational cut detection at K× blobs
      "mm_keyframes" -> ((s: SparkSession, d: String, _: Int) =>
        Multimodal.keyframes(s, d)),
      // cells/codebooks held constant (the production lever is growing
      // them ∝ corpus); probed-cell scan grows ∝ corpus → expect ~K×
      "ann_ivf_pq" -> ((s: SparkSession, d: String, _: Int) =>
        Similarity.ivfPqTopk(s, d)),
      // r9 third-session additions. compression_ratio is a pure narrow
      // map (expect ~K×, scan-speed); mmr's candidate stage grows ∝
      // corpus while the greedy stays |queries|×20 (expect ~K× from
      // the candidate scan alone); bitmap_distinct's shuffle is
      // |types|×|buckets| bitmaps — buckets grow with the id RANGE
      // (user_id shifts per copy), so the shuffle grows ∝ K but each
      // bitmap is ≤4 KB regardless of per-bucket row growth
      "text_compression_ratio" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.compressionRatio(s, d)),
      "ann_mmr_topk" -> ((s: SparkSession, d: String, _: Int) =>
        Similarity.mmrTopk(s, d)),
      "q_bitmap_distinct" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.qBitmapDistinct(s, d)),
      // autocorr: only the hourly pre-agg sees K× rows (shared span →
      // constant |hours|); label_prop: O(iters) joins over K× edges —
      // expect ~K× worst case, flatter while fixed rounds dominate
      "ts_autocorr" -> ((s: SparkSession, d: String, _: Int) =>
        TimeSeries.autocorr(s, d)),
      "graph_label_prop" -> ((s: SparkSession, d: String, _: Int) =>
        Graph.labelProp(s, d)),
      // levenshtein's DP cost ∝ candidate pairs (near-linear by §5);
      // canonical/funnel add the CC loop + argmax over the same graph;
      // asof_nearest is two window frames over one per-user sort
      "dedup_levenshtein" -> ((s: SparkSession, d: String, _: Int) =>
        Dedup.levenshteinVerify(s, d)),
      "dedup_canonical" -> ((s: SparkSession, d: String, _: Int) =>
        Dedup.canonical(s, d)),
      "pipeline_funnel" -> ((s: SparkSession, d: String, _: Int) =>
        graft.operators.Pipeline.curationFunnel(s, d)),
      "q_asof_nearest" -> ((s: SparkSession, d: String, _: Int) =>
        graft.operators.Temporal.asofNearest(s, d)),
      // r11: the bench's heavy five, decade-proofed. robust_stats is
      // three combinable agg passes over K× lineitem (scan-speed band);
      // recall_report pays truth + all four rungs per rep (memos
      // invalidated) — its growth is the SUM of the rung bands, which
      // are each ~K× at fixed bits/cells
      "q_robust_stats" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.qRobustStats(s, d)),
      "ann_recall_report" -> ((s: SparkSession, d: String, _: Int) =>
        Similarity.recallReport(s, d)),
      // r11 additions. cluster_star's rounds are O(log n) — with n
      // growing 10× the round count grows by ~3 fixed-cost rounds, so
      // expect the dedup-family band plus a small constant.
      // substring dedup/scrub: |corpus·w| long-hash explode + one
      // occurrence count — the df-join band. classifier: pure narrow
      // fold, scan-speed band. IVM: one PK shuffle + tiny ledger.
      "dedup_cluster_star" -> ((s: SparkSession, d: String, _: Int) =>
        Dedup.clusterStar(s, d)),
      "text_substring_dedup" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.substringDedup(s, d)),
      "text_substring_scrub" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.substringScrub(s, d)),
      "text_classifier_score" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.classifierScore(s, d)),
      "cdc_incremental_view" -> ((s: SparkSession, d: String, _: Int) =>
        Changefeed.incrementalView(s, d)),
      // r11b: trainer cost = one corpus-token agg + 8 vocab-sized
      // rounds; the perturbed copies multiply VOCAB by K (every token
      // gets a per-copy suffix), so this measures the trainer against
      // Heaps'-law vocab growth, the actual 100 TB axis. Encode adds
      // the corpus-side broadcast join — scan-speed band.
      "text_bpe_train" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.bpeTrain(s, d)),
      "text_bpe_encode" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.bpeEncode(s, d)),
      "dedup_simhash" -> ((s: SparkSession, d: String, _: Int) =>
        Dedup.simhash(s, d)),
      "dedup_winnowing" -> ((s: SparkSession, d: String, _: Int) =>
        Dedup.winnowing(s, d)),
      // r12: fuzzy decontamination — bench side stays 1/50th of the
      // corpus, so BOTH sig passes grow ~K× while the broadcast probe
      // stays bench-bounded; expect the minhash family band
      "text_decontaminate_fuzzy" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.decontaminateFuzzy(s, d)),
      // r12: perplexity — same two-count-table join family as
      // text_rarity/bigram_lm; expect the df-join band (count tables
      // grow with VOCAB under the per-copy suffixes, corpus side ~K×)
      "text_perplexity" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.perplexity(s, d)),
      // r12: entropy — one (doc,tok) count + one doc window; corpus-
      // linear with no join side at all — expect the narrow-agg band
      "text_token_entropy" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.tokenEntropy(s, d)),
      // r12: epoch allocation — one combinable token sum to |sources|
      // rows; pure scan-speed band
      "sample_epochs" -> ((s: SparkSession, d: String, _: Int) =>
        Sampling.sampleEpochs(s, d)),
      // r13: novelty — one explode + combinable min per shingle + hash
      // join back; per-copy suffixes grow the shingle space ~K× so the
      // min table grows with the corpus — expect the df-join band
      "text_ngram_novelty" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.ngramNovelty(s, d)),
      // r13: curriculum — quality is a narrow per-row pass, bands are
      // one combinable agg to ≤11 rows; pure scan-speed band
      "sample_curriculum" -> ((s: SparkSession, d: String, _: Int) =>
        Sampling.sampleCurriculum(s, d)),
      // r13: degree — rides the memoized candidate pairs (invalidated
      // per rep like the rest of the dedup family) + one count + one
      // doc-spine join; expect the candidate-generation band
      "graph_degree_dist" -> ((s: SparkSession, d: String, _: Int) =>
        Graph.degreeDist(s, d)),
      // r13b: DSIR — one combinable (doc,bucket) count (recomputed on
      // both sides of the bounded-broadcast join) + per-doc agg; the
      // bucket table is FIXED at 4096 rows at any scale — expect the
      // token-explode scan band (~K×)
      "sample_dsir" -> ((s: SparkSession, d: String, _: Int) =>
        Sampling.sampleDsir(s, d)),
      // r13b: CCNet buckets — the #221 perplexity plan + a BOUNDED
      // (lang, ppl-value) count table window + broadcast join back;
      // expect the perplexity band (its plan dominates)
      "text_ppl_buckets" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.pplBuckets(s, d)),
      // r13b: KMV — one distinct on (source, shingle-hash) + rank-≤-k
      // windows; pair work is |sources|²·2k regardless of corpus —
      // expect the shingle-explode band
      "q_kmv_jaccard" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.qKmvJaccard(s, d)),
      // r13b: prune compare — one events scan, 4-way explode of
      // (layout, file_id), combinable stats agg to ≤256 rows; pure
      // scan-speed band
      "layout_prune_compare" -> ((s: SparkSession, d: String, _: Int) =>
        Layout.pruneCompare(s, d)),
      // r13c: shelf packing — narrow token count + per-(source, band)
      // rank windows + combinable per-bin agg; scan-speed band
      "pack_shelves" -> ((s: SparkSession, d: String, _: Int) =>
        Sampling.packShelves(s, d)),
      // r13c: order audit — one per-key lag window over events + a
      // 32-row combinable agg; scan-speed band
      "cdc_order_audit" -> ((s: SparkSession, d: String, _: Int) =>
        graft.cdc.Changefeed.orderAudit(s, d)),
      // r13c: modularity — rides the memoized candidate pairs + two
      // label joins + a |langs|-row agg; candidate-generation band
      "graph_modularity" -> ((s: SparkSession, d: String, _: Int) =>
        Graph.modularity(s, d)),
      // r13d: banding sweep — one signature build (the minhash band)
      // + five banded equi-joins whose work ∝ collisions
      "dedup_lsh_tuning" -> ((s: SparkSession, d: String, _: Int) =>
        Dedup.lshTuning(s, d)),
      // r13d: count-min — combinable 1024-cell agg + TakeOrdered-20;
      // pure scan-speed band
      "q_countmin_err" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.qCountminErr(s, d)),
      // r13d: dispersion — one (user, hour) combinable count + per-
      // user agg; scan-speed band
      "ts_dispersion" -> ((s: SparkSession, d: String, _: Int) =>
        TimeSeries.dispersion(s, d)),
      // r13d: zipf — one (source, token) count + vocab-sized rank
      // windows; scan-speed band (vocab grows Heaps-slowly)
      "text_zipf_check" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.zipfCheck(s, d)),
      // r14: KN stats — bigram-TYPE distinct + vocab-sized joins; the
      // per-copy suffixes grow bigram types ~K×, so this measures the
      // type-table band (the bpe_train vocab-growth axis)
      "text_kn_stats" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.knStats(s, d)),
      // r14: syndication — (source, chunk-hash) distinct + a hash join
      // whose fanout is |sources|² per shared hash; chunk-explode band
      "text_syndication_matrix" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.syndicationMatrix(s, d)),
      // r14: neighbor jaccard — rides the memoized candidate pairs +
      // one wedge join (degree-bounded); candidate-generation band
      "graph_neighbor_jaccard" -> ((s: SparkSession, d: String, _: Int) =>
        Graph.neighborJaccard(s, d)),
      // r14: RFM — one user-grain agg + three ≤|users| value tables +
      // a 125-cell agg; user universe grows K× (shifted ids) so the
      // value-table windows grow ~K× at constant output
      "q_rfm_segments" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.qRfmSegments(s, d)),
      // r14: attribution — per-user 7-day-bounded purchase×touch join
      // + per-purchase windows; the funnel-family band
      "q_attribution" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.qAttribution(s, d)),
      // r14: skew report — one combinable per-key count + ≤64-row
      // histogram; scan-speed band
      "q_join_skew_report" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.qJoinSkewReport(s, d)),
      // r14: txn stats — one combinable (tbl, sort_us) count; the
      // shared time span keeps |commit instants| constant while
      // per-instant counts grow K× — scan-speed band
      "cdc_txn_stats" -> ((s: SparkSession, d: String, _: Int) =>
        Changefeed.txnStats(s, d)),
      // r14: scd2 lookup — per-user window over clicks + a per-user
      // range join; K× users at constant per-user history → ~K×
      "q_scd2_lookup" -> ((s: SparkSession, d: String, _: Int) =>
        graft.operators.Temporal.scd2Lookup(s, d)),
      // r14 wave 3. transitions/paths: one per-user window + bounded
      // aggregate — scan-speed band; coeff rides the memoized
      // candidate graph (wedge join, arboricity-bounded); pmi is the
      // kn_stats type-table band; calibration rebuilds sigs (96
      // min-aggs ∝ corpus) + candidate-bounded exact joins
      "q_markov_transitions" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.qMarkovTransitions(s, d)),
      "q_funnel_paths" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.qFunnelPaths(s, d)),
      "graph_clustering_coeff" -> ((s: SparkSession, d: String, _: Int) =>
        Graph.clusteringCoeff(s, d)),
      "text_pmi_collocations" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.pmiCollocations(s, d)),
      "dedup_minhash_calibration" -> ((s: SparkSession, d: String, _: Int) =>
        Dedup.minhashCalibration(s, d)),
      // r14 wave 4. basket: lineitem⋈part + per-order bounded pair
      // fanout — join-family band; benford/q6/calendar/growth: one
      // combinable agg over the scan (scan-speed band; growth adds a
      // (day,user) dedup shuffle ∝ corpus); adamic/assort ride the
      // memoized candidate pairs (wedge-join / moment bands); tvd is
      // the token-hash band (combinable (source,bucket) count, then
      // constant-size tables); gini is the value-table band (distinct
      // lengths grow Heaps-slowly); hot_keys is one combinable
      // (tbl,entity) count + |entities| rank window
      "q_basket_rules" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.qBasketRules(s, d)),
      "q_benford" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.qBenford(s, d)),
      "q6_forgone_revenue" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q6ForgoneRevenue(s, d)),
      "graph_adamic_adar" -> ((s: SparkSession, d: String, _: Int) =>
        Graph.adamicAdar(s, d)),
      "graph_assortativity" -> ((s: SparkSession, d: String, _: Int) =>
        Graph.assortativity(s, d)),
      "text_source_tvd" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.sourceTvd(s, d)),
      "text_length_gini" -> ((s: SparkSession, d: String, _: Int) =>
        TextAnalysis.lengthGini(s, d)),
      "cdc_hot_keys" -> ((s: SparkSession, d: String, _: Int) =>
        Changefeed.hotKeys(s, d)),
      "ts_calendar_profile" -> ((s: SparkSession, d: String, _: Int) =>
        TimeSeries.calendarProfile(s, d)),
      "ts_growth_accounting" -> ((s: SparkSession, d: String, _: Int) =>
        TimeSeries.growthAccounting(s, d)),
      // r14 wave 5. q13: shuffle left join + per-customer count (dims
      // stay, facts grow → per-customer counts grow K× at constant
      // customer universe); q4: fact⋈fact semi join band; ri_audit:
      // three anti joins; wow: ledger band (|weeks| constant, per-cell
      // counts grow); concurrency: sessionize window + per-day sweep
      "q13_custdist" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q13CustDist(s, d)),
      "q4_order_priority" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q4OrderPriority(s, d)),
      "q_ri_audit" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.qRiAudit(s, d)),
      "ts_wow_change" -> ((s: SparkSession, d: String, _: Int) =>
        TimeSeries.wowChange(s, d)),
      "ts_session_concurrency" -> ((s: SparkSession, d: String, _: Int) =>
        TimeSeries.sessionConcurrency(s, d)),
      // r14 wave 6. audience: user-grain set build + in-row pairs
      // (the basket band); drawdown: (user,day) sum + per-user ledger
      // windows; df_profile: shingle-count band (type table grows
      // ~K× with the per-copy suffixes)
      "q_audience_overlap" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.qAudienceOverlap(s, d)),
      "ts_drawdown" -> ((s: SparkSession, d: String, _: Int) =>
        TimeSeries.drawdown(s, d)),
      "dedup_df_profile" -> ((s: SparkSession, d: String, _: Int) =>
        Dedup.dfProfile(s, d)),
      // r14 wave 7. purchase gaps: pushed filter + per-user lag window
      // over purchases + ≤64-row histogram; scan-speed band
      "ts_purchase_gaps" -> ((s: SparkSession, d: String, _: Int) =>
        TimeSeries.purchaseGaps(s, d)),
      // r14 wave 8. q7: the fact⋈fact join band (lineitem⋈orders
      // both grow K×; dim maps constant)
      "q7_trade_matrix" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q7TradeMatrix(s, d)),
      // r15. q9: the q7 band — one fact⋈fact join (lineitem⋈orders,
      // both grow K×, per-copy keys never cross-match), dims
      // broadcast-pruned constant; q18: orderkey-grain roll-up grows
      // K× groups at constant group size, survivors ∝ K, top-100
      // constant
      "q9_part_profit" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q9PartProfit(s, d)),
      "q18_large_orders" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q18LargeOrders(s, d)),
      // r15 wave 2. q10: the q7 fact⋈fact band with both filters
      // pushed; q15: pushed-date scan + ≤|suppliers| combinable agg
      // (scan-speed band); q19: broadcast-envelope join, 1-row agg
      // (scan-speed band)
      "q10_returned_revenue" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q10ReturnedRevenue(s, d)),
      "q15_top_supplier" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q15TopSupplier(s, d)),
      "q19_disjunctive_revenue" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q19DisjunctiveRevenue(s, d)),
      // r15 wave 3. q8: the fact⋈fact band (family-pruned lineitem ⋈
      // orders); q14: broadcast-map scan band (1-row agg); q17: the
      // brand-pruned frame shuffles once at part grain (∝ brand's
      // K× lines); q22: anti-join band on the custkey projection
      "q8_market_share" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q8MarketShare(s, d)),
      "q14_promo_share" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q14PromoShare(s, d)),
      "q17_small_quantity" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q17SmallQuantity(s, d)),
      "q22_sales_opportunity" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q22SalesOpportunity(s, d)),
      // r16: the derived-supplement six. q2/q11/q16 read DIMS only
      // (part × 4 in-row rows + supplier) — writeCorpus holds dims
      // constant, so their absolute wall must stay FLAT at K× (any
      // growth is a leak of fact-side work into a dim-only plan);
      // q12/q21 are the fact⋈fact band (derivation in-row on the K×
      // lineitem scan, one orderkey shuffle); q20 is the pruned-fact
      // roll-up band (green-family lines grow K× at constant
      // (partkey,suppkey) group count)
      "q2_min_cost_supp" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q2MinCostSupp(s, d)),
      "q11_important_stock" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q11ImportantStock(s, d)),
      "q12_shipmode_priority" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q12ShipmodePriority(s, d)),
      "q16_supplier_counts" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q16SupplierCounts(s, d)),
      "q20_part_promotion" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q20PartPromotion(s, d)),
      "q21_late_suppliers" -> ((s: SparkSession, d: String, _: Int) =>
        Analytics.q21LateSuppliers(s, d)),
      // r16: cell health — corpus × broadcast-centroids score + one
      // vec-grain combinable argmax; the centroid-classify band (~K×
      // from the scored scan, output ≤|cells| at any scale)
      "ann_cell_health" -> ((s: SparkSession, d: String, _: Int) =>
        Similarity.cellHealth(s, d)))

    // SPARK_GRAFT_OPS=a,b,c restricts the run (default: everything) —
    // lets a round re-measure just its new ops without paying for the
    // whole suite again.
    val ops = sys.env.get("SPARK_GRAFT_OPS") match {
      case Some(names) =>
        val want = names.split(",").map(_.trim).filter(_.nonEmpty).toSet
        allOps.filter { case (n, _) => want(n) }
      case None => allOps
    }

    // JIT/codegen warmup on the small side only.
    ops.foreach { case (_, fn) => fn(spark, x1Dir, 1).count() }

    // Shuffle BYTES measured alongside wall time (r13 verdict #1):
    // bytes are plan-deterministic, so the first rep's listener delta
    // is exact; wall time still takes min-of-reps.
    val listener = ShuffleMetrics.install(spark)

    def measure(dir: String,
        scale: Int): (Map[String, Double], Map[String, IoSnapshot]) = {
      val io = scala.collection.mutable.HashMap.empty[String, IoSnapshot]
      val t = ops.map { case (name, fn) =>
        val times = (1 to reps).map { rep =>
          Dedup.invalidateCandidates(spark)
          Dedup.invalidateClusterLabels(spark)
          Dedup.invalidateMinhashSignatures(spark)
          Dedup.invalidateShingles(spark)
          Similarity.invalidateMemos(spark)
          Similarity.invalidateBaseMemos(spark)
          TextAnalysis.invalidateBpe(spark)
          spark.catalog.clearCache()
          val pre = if (rep == 1) Some(listener.snapshot(spark.sparkContext))
            else None
          val t0 = System.nanoTime()
          fn(spark, dir, scale).count()
          val dt = (System.nanoTime() - t0) / 1e9
          pre.foreach { p =>
            io(name) =
              listener.snapshot(spark.sparkContext, resetPeak = false) - p
          }
          dt
        }
        name -> times.min
      }.toMap
      (t, io.toMap)
    }

    val (t1, io1) = measure(x1Dir, 1)
    val (tk, iok) = measure(xkDir, k)
    def fmt(m: Map[String, Double]) = m.toSeq.sortBy(_._1)
      .map { case (n, v) => f""""$n":$v%.2f""" }.mkString("{", ",", "}")
    val ratios = t1.keys.toSeq.sorted
      .map(n => f""""$n":${tk(n) / t1(n)}%.1f""").mkString("{", ",", "}")
    def fmtIo(m: Map[String, IoSnapshot]) = m.toSeq.sortBy(_._1)
      .map { case (n, s) =>
        s""""$n":{"sr":${s.shuffleReadB},"sw":${s.shuffleWriteB},"spill":${s.spillB},"peak":${s.peakExecMemB}}"""
      }.mkString("{", ",", "}")
    val shuffleRatios = t1.keys.toSeq.sorted.map { n =>
      val b1 = math.max(io1.get(n).map(s => s.shuffleReadB + s.shuffleWriteB)
        .getOrElse(0L), 1L)
      val bk = iok.get(n).map(s => s.shuffleReadB + s.shuffleWriteB)
        .getOrElse(0L)
      shuffleRatioEntry(n, b1, bk, k)
    }.mkString("{", ",", "}")
    // The gate: ops whose 100 TB design claims a BOUNDED shuffle
    // (combinable aggregation to a fixed group count — sketches,
    // ledgers, reports; §5 calls these the scan-speed band) must show
    // sub-linear shuffle-byte growth. Everything else is reported but
    // not gated (their shuffles legitimately carry ~K× rows).
    // Membership is MEASURED, not assumed — the gate's first run (r14)
    // fired three times and each firing taught something:
    // q_robust_stats (5.6×) and q_countmin_err (6.9×) reclassified
    // OUT — their shuffles are value-/key-granular BY CONTRACT (exact
    // medians ship per-value count tables; the sketch-error report
    // ships exact per-key counts to compare the 1 KiB sketch
    // against), so bytes grow with distinct values: sub-linear in
    // TIME, linear in bytes, claim corrected at each op.
    // sample_curriculum (9.4×) exposed that its ONLY shuffle is
    // Tables.documentsPar's deliberate spread of the single-file test
    // corpus (parallelizing the quality regexes; a no-op choice on a
    // real multi-split table) — measured bytes = the documents table,
    // before AND after removing text_quality's output orderBy from
    // the consumer path (Catalyst had already eliminated that sort
    // under the aggregate; the qualityUnsorted seam stays because
    // join/TopK consumers don't get that rescue). Ops reading through
    // the spread are therefore gate-exempt on this corpus.
    val boundedShuffle = Set("ts_trend", "cdc_txn_stats",
      "sample_epochs", "layout_prune_compare",
      // r14 wave 4: fixed-group combinable aggs — 9 digits, 1 row,
      // ≤168 calendar cells; their shuffles are group-count-bounded
      // by contract
      "q_benford", "q6_forgone_revenue", "ts_calendar_profile",
      // r14 waves 5/6, admitted on MEASURED 1.0× byte ratios at 10×
      // AND a contract that holds without AQE's broadcast choices:
      // wow/gini ride ledgers whose group spaces (weeks × types,
      // distinct lengths) are corpus-growth-invariant.
      // q13/ri_audit also measured 1.0× but are NOT admitted: their
      // flat bytes are AQE broadcasting the dim side — at a scale
      // where that flips, byte growth is the join's legitimate
      // contract, not a regression. ts_growth_accounting (r15,
      // advisor) likewise NOT admitted: its (day,user) dedup shuffle
      // is user-granular by contract — writeCorpus shifts
      // user_id per copy, so distinct (day,user) groups (and their
      // bytes) legitimately grow K-fold; day-clustering compacts rows
      // per group, not the group count. Sub-linear in TIME (the
      // ledger window is ≤|days|), linear in dedup bytes — measured,
      // reported, not gated.
      "ts_wow_change", "text_length_gini")
    val violations = ShuffleMetrics.subLinearViolations(
      io1, iok, k, boundedShuffle.intersect(t1.keySet))
    violations.foreach { case (n, r) =>
      System.err.println(f"[scalecheck] SHUFFLE GATE FAIL $n: " +
        f"bytes grew $r%.1fx at ${k}x data (bounded-shuffle op; " +
        "a corpus-sized exchange shipped)")
    }
    println(s"""{"scale":$k,"x1_sec":${fmt(t1)},"x${k}_sec":${fmt(tk)},"ratio":$ratios,"x1_io":${fmtIo(io1)},"x${k}_io":${fmtIo(iok)},"shuffle_ratio":$shuffleRatios,"shuffle_gate_fail":${violations.size}}""")
    spark.stop()
    if (violations.nonEmpty) sys.exit(1)
  }

  /** One `"name":…` fragment of the shuffle-ratio JSON. r14 judge: a
    * ratio whose x1 side was a broadcast (AQE chose BHJ on the small
    * corpus, SMJ at xK — q4's 6234× had an 11 KB denominator) reads
    * as a violation until the reader digs up the absolutes, so any
    * super-K ratio carries `x1_bytes`/`xK_bytes` inline. */
  private[graft] def shuffleRatioEntry(n: String, b1: Long, bk: Long,
      k: Int): String = {
    val r = bk.toDouble / math.max(b1, 1L)
    if (r > k)
      f""""$n":{"ratio":$r%.1f,"x1_bytes":${math.max(b1, 1L)},"x${k}_bytes":$bk}"""
    else f""""$n":$r%.1f"""
  }

  /** Union of `copies` token-perturbed copies of documents.parquet.
    * Copy i: doc_id shifted into its own range; every alphanumeric
    * token suffixed with i, so cross-copy shingle/hash collisions are
    * structurally impossible while intra-copy structure is preserved. */
  private[graft] def writeCorpus(spark: SparkSession, sfDir: String,
      outDir: String, copies: Int): Unit = {
    val base = Tables.documents(spark, sfDir)
    val frames = (0 until copies).map { i =>
      base.select(
        (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
        regexp_replace(col("text"), "([A-Za-z0-9]+)", s"$$1$i").as("text"),
        col("lang"), col("source"))
        // full driver schema (lang/n_chars feed langid, stratified
        // sampling, weighted sampling, the train-data pipeline);
        // n_chars re-derived from the PERTURBED text so the length
        // column stays truthful
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    frames.reduce(_ unionAll _)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    // embeddings: vec_id shifted per copy, vectors verbatim (identical
    // FLOP cost per row; queries are vec_id<10, i.e. copy 0 only, so
    // the query set stays fixed while the corpus grows Kx)
    val emb = Tables.embeddings(spark, sfDir)
    (0 until copies).map { i =>
      emb.select((col("vec_id") + lit(i.toLong * 100000000L)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionAll _)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // events: event_id AND user_id shifted per copy, ts/value verbatim.
    // Shifting user_id means corpus growth adds NEW (user, type) groups
    // at constant group size — the real shape of a feed watching more
    // rows — so snapshot-diff's window partitions multiply rather than
    // deepen. ts passes through in whatever physical encoding the
    // driver's file carries (raw read; legacy conf below covers
    // nanos-era files), so the copy reads back through Tables.events'
    // schema-adaptive branch exactly like the driver's file does.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    (0 until copies).map { i =>
      val shift = lit(i.toLong * 100000000L)
      ev.select((col("event_id") + shift).as("event_id"), col("ts"),
        (col("user_id") + shift).as("user_id"), col("event_type"),
        col("value"), col("props"))
    }.reduce(_ unionAll _)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    // orders (for the multi-table router): o_orderkey shifted per copy
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    (0 until copies).map { i =>
      orders.withColumn("o_orderkey",
        col("o_orderkey") + lit(i.toLong * 100000000L))
    }.reduce(_ unionAll _)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    // lineitem (r11, for q_robust_stats): orderkey shifted per copy,
    // measures verbatim — per-group row counts grow K× at constant
    // group count (3 returnflags), the map-side-combine stress shape
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    (0 until copies).map { i =>
      li.withColumn("l_orderkey",
        col("l_orderkey") + lit(i.toLong * 100000000L))
    }.reduce(_ unionAll _)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    // dimensions (r14, for q_basket_rules / q13 / ri_audit / q7) —
    // verbatim, never copied (facts grow K×, dims stay; the K× facts
    // key their UNSHIFTED dim keys into the same universe, so per-dim
    // fact multiplicity grows K× — the real warehouse growth shape)
    Seq("part", "customer", "supplier", "nation", "region").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }
}

/** Build a COMPLETE 10-table K× corpus for a full-suite correctness
  * pass at true 10× scale (VERDICT r11 item 8): the five fact tables
  * via [[ScaleCheck.writeCorpus]]'s perturbed-copy generator, the five
  * dimension tables verbatim — facts grow K×, dims stay (the real
  * warehouse growth shape: 10× lineitem per part/supplier/customer,
  * with o_custkey intact so every join key still resolves). The output
  * dir then serves BOTH engines: graft.Verify dumps Spark results from
  * it and tools/check_oracle.py runs the same oracle SQL over the same
  * files in DuckDB — the correctness gate itself, exercised at 10×. */
object ScaleCorpus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val outDir = args.headOption.getOrElse("target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // µs timestamps on the wire so DuckDB reads the copy like the
      // original (INT96 would round-trip but muddy the comparison)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleCheck.writeCorpus(spark, sfDir, outDir, k)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    println(s"""{"corpus":"$outDir","scale":$k}""")
    spark.stop()
  }
}
