package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cdc.Changefeed
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2/§7.
  *
  * Every `queries` entry has a matching DuckDB `oracleSql` entry unless
  * the op is hash-/stream-based (non-SQL-expressible → rows-only check).
  * Oracle SQL mirrors the Spark computation op-for-op (same expression
  * association, per-row integer-cents money, scaled-integer ratios) so
  * hashes match byte-for-byte; see SURVEY.md §6.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Changefeed.envelope(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 CDC core
    "cdc_changefeed_rows" -> (Changefeed.changefeedRows _),
    "cdc_classify" -> (Changefeed.classify _),
    "cdc_envelope" -> (Changefeed.envelope _),
    "cdc_resolved_cursor" -> (Changefeed.resolvedCursor _),
    "cdc_cursor_store" -> (Changefeed.cursorStore _),
    "cdc_compact" -> (Changefeed.compact _),
    "cdc_json_extract" -> (Changefeed.jsonExtract _),
    "cdc_queue_partition" -> (Changefeed.queuePartition _),
    "cdc_apply" -> (Changefeed.applyChanges _),
    "cdc_scd2" -> (Changefeed.scd2 _),
    "cdc_compact_tombstones" -> (Changefeed.compactTombstones _),
    "cdc_payload_parse" -> (Changefeed.payloadParse _),
    "cdc_lag" -> (Changefeed.lagReport _),
    "cdc_incremental_view" -> (Changefeed.incrementalView _),
    "cdc_resolved_batches" -> (Changefeed.resolvedBatches _),
    "cdc_table_router" -> (Changefeed.tableRouter _),
    "cdc_fan_in" -> ((s: SparkSession, d: String) => Changefeed.fanIn(s, d)),
    "cdc_variant_extract" -> (Changefeed.variantExtract _),
    "cdc_schema_drift" -> (Changefeed.schemaDrift _),
    "cdc_dlq" -> (Changefeed.dlq _),
    "cdc_snapshot_diff" -> (Changefeed.snapshotDiff _),
    "cdc_resolved_gaps" -> ((s: SparkSession, d: String) => Changefeed.resolvedGaps(s, d)),
    "cdc_order_audit" -> ((s: SparkSession, d: String) => Changefeed.orderAudit(s, d)),
    "text_bigram_lm" -> (TextAnalysis.bigramLm _),
    "text_perplexity" -> (TextAnalysis.perplexity _),
    "text_token_entropy" -> (TextAnalysis.tokenEntropy _),
    "ts_interpolate" -> (TimeSeries.interpolate _),
    "ts_seasonal" -> (TimeSeries.seasonal _),
    "ts_xcorr" -> ((s: SparkSession, d: String) => TimeSeries.xcorr(s, d)),
    "ts_autocorr" -> ((s: SparkSession, d: String) => TimeSeries.autocorr(s, d)),
    "ts_ewma" -> (TimeSeries.ewma _),
    "ts_changepoint" -> (TimeSeries.changepoint _),
    "ts_downsample" -> ((s: SparkSession, d: String) => TimeSeries.downsample(s, d)),
    "q_window_range" -> (Analytics.qWindowRange _),
    "q_hll_union" -> (Analytics.qHllUnion _),
    "q_robust_stats" -> (Analytics.qRobustStats _),
    "ts_sliding_distinct" -> (TimeSeries.slidingDistinct _),
    "dedup_cluster" -> (Dedup.cluster _),
    "dedup_cluster_star" -> (Dedup.clusterStar _),
    "text_classifier_score" -> (TextAnalysis.classifierScore _),
    "text_substring_dedup" -> ((s, d) => TextAnalysis.substringDedup(s, d)),
    "text_substring_scrub" -> ((s, d) => TextAnalysis.substringScrub(s, d)),
    // §2.2 streaming analytics (batch twins)
    "stream_window_agg" -> (StreamOps.windowAgg _),
    "stream_sliding_agg" -> (StreamOps.slidingAgg _),
    "stream_sessionize" -> (StreamOps.sessionize _),
    "stream_dedup_by_key" -> (StreamOps.dedupByKey _),
    // §2.3 analytics core
    "q1_agg" -> (Analytics.q1Agg _),
    "q3_join_topk" -> (Analytics.q3JoinTopk _),
    "q5_multijoin" -> (Analytics.q5MultiJoin _),
    "q_window_topk" -> (Analytics.qWindowTopk _),
    "q_unpivot" -> (Analytics.qUnpivot _),
    "q_recursive_chain" -> (Analytics.qRecursiveChain _),
    "q_exists_multi" -> (Analytics.qExistsMulti _),
    "q_lateral_topn" -> (Analytics.qLateralTopn _),
    "q_topk_native" -> (Analytics.qTopkNative _),
    "q_rollup" -> (Analytics.qRollup _),
    "q_cube" -> (Analytics.qCube _),
    "q_grouping_sets" -> (Analytics.qGroupingSets _),
    "q_mode" -> (Analytics.qMode _),
    "layout_zorder" -> (Layout.zorder _),
    "layout_hilbert" -> (Layout.hilbert _),
    "layout_prune_compare" -> (Layout.pruneCompare _),
    "q_kmv_jaccard" -> (Analytics.qKmvJaccard _),
    "q_countmin_err" -> (Analytics.qCountminErr _),
    "q_conditional_pivot" -> (Analytics.qConditionalPivot _),
    "q_semi_anti" -> (Analytics.qSemiAnti _),
    "q_asof_join" -> (Temporal.asofJoin _),
    "q_asof_native" -> (Temporal.asofNative _),
    "q_asof_left" -> (Temporal.asofLeftNative _),
    "q_asof_nearest" -> (Temporal.asofNearest _),
    "q_range_join" -> (Temporal.rangeJoin _),
    "q_quantiles" -> (Analytics.qQuantiles _),
    "q_quantiles_approx" -> (Analytics.qQuantilesApprox _),
    "q_quantiles_sortrank" -> (Analytics.qQuantilesSortRank _),
    "q_approx_distinct" -> (Analytics.qApproxDistinct _),
    "q_salted_agg" -> (Analytics.qSaltedAgg _),
    "q_topk_values_agg" -> (Analytics.qTopkValuesAgg _),
    "q_funnel" -> (Analytics.qFunnel _),
    "q_funnel_conversion" -> (Analytics.qFunnelConversion _),
    "text_seqlen_histogram" -> (Analytics.textSeqlenHistogram _),
    "q_histogram" -> (Analytics.qHistogram _),
    "q_skew_join_salted" -> (Analytics.qSkewJoinSalted _),
    "q_exists_subquery" -> (Analytics.qExistsSubquery _),
    "q_scalar_subquery" -> (Analytics.qScalarSubquery _),
    "q_ntile_decile" -> (Analytics.qNtileDecile _),
    "q_corr_moments" -> (Analytics.qCorrMoments _),
    "q_bitmap_distinct" -> (Analytics.qBitmapDistinct _),
    "q_string_agg" -> (Analytics.qStringAgg _),
    "stream_session_native" -> (StreamOps.sessionizeNative _),
    "q_pivot_native" -> (Analytics.qPivotNative _),
    "q_intersect_except" -> (Analytics.qIntersectExcept _),
    "q_heavy_hitters" -> (Analytics.qHeavyHitters _),
    "graph_pagerank" -> ((s: SparkSession, d: String) => Graph.pagerank(s, d)),
    "graph_triangles" -> (Graph.triangles _),
    "graph_bfs_dist" -> ((s: SparkSession, d: String) => Graph.bfsDist(s, d)),
    "graph_degree_dist" -> ((s: SparkSession, d: String) => Graph.degreeDist(s, d)),
    "graph_modularity" -> (Graph.modularity _),
    "text_lang_confusion" -> (TextAnalysis.langConfusion _),
    "text_contamination_rate" -> ((s: SparkSession, d: String) => TextAnalysis.contaminationRate(s, d)),
    "dedup_report" -> (Dedup.report _),
    "ann_recall_report" -> ((s: SparkSession, d: String) => Similarity.recallReport(s, d)),
    "graph_kcore" -> ((s: SparkSession, d: String) => Graph.kcore(s, d)),
    "graph_label_prop" -> ((s: SparkSession, d: String) => Graph.labelProp(s, d)),
    "ts_ohlc" -> (TimeSeries.ohlc _),
    "dedup_winnowing" -> ((s: SparkSession, d: String) => Dedup.winnowing(s, d)),
    "ts_gap_fill" -> (TimeSeries.gapFill _),
    "ts_retention" -> (TimeSeries.retention _),
    "ts_running_total" -> (TimeSeries.runningTotal _),
    "ts_anomaly" -> (TimeSeries.anomaly _),
    "ts_lateness" -> (TimeSeries.lateness _),
    "ts_trend" -> (TimeSeries.trend _),
    "ts_cohort_matrix" -> (TimeSeries.cohortMatrix _),
    "ts_dau_wau" -> (TimeSeries.dauWau _),
    "ts_dispersion" -> (TimeSeries.dispersion _),
    "text_zipf_check" -> (TextAnalysis.zipfCheck _),
    "q_funnel_windowed" -> ((s: SparkSession, d: String) => Analytics.qFunnelWindowed(s, d)),
    "q_decile_lift" -> (Analytics.qDecileLift _),
    "dedup_incremental_minhash" -> (Dedup.incrementalMinhash _),
    "dedup_lsh_tuning" -> (Dedup.lshTuning _),
    "dedup_cluster_sizes" -> (Dedup.clusterSizes _),
    "dedup_threshold_sweep" -> ((s: SparkSession, d: String) => Dedup.thresholdSweep(s, d)),
    "pack_efficiency" -> ((s: SparkSession, d: String) => Sampling.packEfficiency(s, d)),
    // §2.4 dedup
    "dedup_exact" -> (Dedup.exact _),
    "dedup_exact_normalized" -> (Dedup.exactNormalized _),
    "dedup_incremental" -> (Dedup.incremental _),
    "dedup_incremental_bloom" -> (Dedup.bloomIncremental _),
    "dedup_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "dedup_containment" -> (Dedup.containment _),
    "dedup_levenshtein" -> (Dedup.levenshteinVerify _),
    "dedup_jaccard_prefix" -> ((s: SparkSession, d: String) => Dedup.jaccardPrefix(s, d)),
    "dedup_jaccard_global" -> ((s: SparkSession, d: String) => Dedup.jaccardGlobal(s, d)),
    "dedup_canonical" -> (Dedup.canonical _),
    "dedup_minhash_lsh" -> (Dedup.minhashLsh _),
    "dedup_simhash" -> (Dedup.simhash _),
    "dedup_embedding" -> (Dedup.embeddingNearDup _),
    "dedup_embedding_lsh" -> (Dedup.embeddingNearDupLsh _),
    "dedup_semantic" -> ((s: SparkSession, d: String) => Dedup.semantic(s, d)),
    "dedup_cluster_embed" -> ((s: SparkSession, d: String) => Dedup.clusterEmbed(s, d)),
    "sample_docs" -> ((s: SparkSession, d: String) => Sampling.sampleDocs(s, d)),
    "sample_stratified" -> (Sampling.sampleStratified _),
    "sample_split" -> (Sampling.sampleSplit _),
    "sample_cap_per_source" -> ((s: SparkSession, d: String) => Sampling.capPerSource(s, d)),
    "sample_mixture" -> (Sampling.sampleMixture _),
    "sample_epochs" -> ((s: SparkSession, d: String) => Sampling.sampleEpochs(s, d)),
    "sample_temperature" -> ((s: SparkSession, d: String) => Sampling.sampleTemperature(s, d)),
    "sample_curriculum" -> ((s: SparkSession, d: String) => Sampling.sampleCurriculum(s, d)),
    "sample_dsir" -> ((s: SparkSession, d: String) => Sampling.sampleDsir(s, d)),
    "pack_shelves" -> ((s: SparkSession, d: String) => Sampling.packShelves(s, d)),
    "pack_sequences" -> ((s: SparkSession, d: String) => Sampling.packSequences(s, d)),
    "pipeline_train_data" -> ((s: SparkSession, d: String) => Pipeline.trainDataPipeline(s, d)),
    "pipeline_funnel" -> (Pipeline.curationFunnel _),
    // §2.5 similarity search
    "ann_bruteforce_topk" -> ((s: SparkSession, d: String) => Similarity.bruteforceTopk(s, d)),
    "ann_lsh_topk" -> ((s: SparkSession, d: String) => Similarity.lshTopk(s, d)),
    "knn_label_vote" -> (Similarity.knnLabelVote _),
    "ann_centroid_classify" -> (Similarity.centroidClassify _),
    "ann_ivf_topk" -> ((s: SparkSession, d: String) => Similarity.ivfTopk(s, d)),
    "ann_ivf_kmeans" -> ((s: SparkSession, d: String) => Similarity.ivfKmeansTopk(s, d)),
    "ann_pq_adc" -> ((s: SparkSession, d: String) => Similarity.pqAdcTopk(s, d)),
    "ann_sq_topk" -> ((s: SparkSession, d: String) => Similarity.sqTopk(s, d)),
    "ann_ivf_pq" -> ((s: SparkSession, d: String) => Similarity.ivfPqTopk(s, d)),
    "ann_filtered_topk" -> ((s: SparkSession, d: String) => Similarity.filteredTopk(s, d)),
    "ann_range_search" -> ((s: SparkSession, d: String) => Similarity.rangeSearch(s, d)),
    "ann_cell_health" -> ((s: SparkSession, d: String) => Similarity.cellHealth(s, d)),
    "ann_cell_split" -> ((s: SparkSession, d: String) => Similarity.cellSplit(s, d)),
    "ann_mmr_topk" -> ((s: SparkSession, d: String) => Similarity.mmrTopk(s, d)),
    // §2.6 text analysis
    "text_tokens" -> (TextAnalysis.tokenCounts _),
    "text_quality" -> (TextAnalysis.quality _),
    "text_langid" -> (TextAnalysis.langId _),
    "text_normalize" -> (TextAnalysis.normalize _),
    "text_scrub_pii" -> (TextAnalysis.scrubPii _),
    "text_fingerprint" -> (TextAnalysis.fingerprint _),
    "text_decontaminate" -> ((s: SparkSession, d: String) => TextAnalysis.decontaminate(s, d)),
    "text_decontaminate_fuzzy" -> (TextAnalysis.decontaminateFuzzy _),
    "text_repetition" -> (TextAnalysis.repetition _),
    "text_vocab" -> ((s: SparkSession, d: String) => TextAnalysis.vocab(s, d)),
    "text_salient_terms" -> (TextAnalysis.salientTerms _),
    "text_rarity" -> (TextAnalysis.rarity _),
    "text_chunk_dedup" -> ((s: SparkSession, d: String) => TextAnalysis.chunkDedup(s, d)),
    "text_ngram_novelty" -> ((s: SparkSession, d: String) => TextAnalysis.ngramNovelty(s, d)),
    "text_ppl_buckets" -> (TextAnalysis.pplBuckets _),
    "text_bpe_pairs" -> (TextAnalysis.bpePairs _),
    "text_bpe_train" -> ((s: SparkSession, d: String) => TextAnalysis.bpeTrain(s, d)),
    "text_bpe_encode" -> ((s: SparkSession, d: String) => TextAnalysis.bpeEncode(s, d)),
    "text_gopher_rules" -> (TextAnalysis.gopherRules _),
    "text_compression_ratio" -> (TextAnalysis.compressionRatio _),
    "sample_weighted" -> ((s: SparkSession, d: String) => Sampling.sampleWeighted(s, d)),
    // §2.7 multimodal
    "mm_binary_meta" -> (Multimodal.binaryMeta _),
    "mm_decode_features" -> (Multimodal.decodeFeatures _),
    "mm_resize" -> ((s: SparkSession, d: String) => Multimodal.resize(s, d)),
    "mm_frame_sample" -> (Multimodal.frameSample _),
    "mm_keyframes" -> ((s: SparkSession, d: String) => Multimodal.keyframes(s, d)),
    "mm_image_histogram" -> (Multimodal.imageHistogram _),
    "mm_image_entropy" -> (Multimodal.imageEntropy _),
    "mm_phash_dedup" -> ((s: SparkSession, d: String) => Multimodal.phashDedup(s, d)),
    "mm_audio_features" -> (Multimodal.audioFeatures _),
    "mm_audio_segments" -> (Multimodal.audioSegments _),
    "mm_audio_resample" -> ((s: SparkSession, d: String) => Multimodal.audioResample(s, d)),
    "mm_audio_snr" -> (Multimodal.audioSnr _),
    // r14 additions
    "text_kn_stats" -> (TextAnalysis.knStats _),
    "text_syndication_matrix" -> (TextAnalysis.syndicationMatrix _),
    "graph_neighbor_jaccard" -> (Graph.neighborJaccard _),
    "q_rfm_segments" -> (Analytics.qRfmSegments _),
    "q_attribution" -> ((s: SparkSession, d: String) => Analytics.qAttribution(s, d)),
    "q_join_skew_report" -> (Analytics.qJoinSkewReport _),
    "cdc_txn_stats" -> (Changefeed.txnStats _),
    "q_scd2_lookup" -> (Temporal.scd2Lookup _),
    "q_markov_transitions" -> (Analytics.qMarkovTransitions _),
    "q_funnel_paths" -> (Analytics.qFunnelPaths _),
    "graph_clustering_coeff" -> (Graph.clusteringCoeff _),
    "text_pmi_collocations" -> ((s: SparkSession, d: String) => TextAnalysis.pmiCollocations(s, d)),
    "dedup_minhash_calibration" -> (Dedup.minhashCalibration _),
    // r14 wave 4
    "q_basket_rules" -> ((s: SparkSession, d: String) => Analytics.qBasketRules(s, d)),
    "q_benford" -> (Analytics.qBenford _),
    "q6_forgone_revenue" -> (Analytics.q6ForgoneRevenue _),
    "graph_adamic_adar" -> (Graph.adamicAdar _),
    "graph_assortativity" -> (Graph.assortativity _),
    "text_source_tvd" -> (TextAnalysis.sourceTvd _),
    "text_length_gini" -> (TextAnalysis.lengthGini _),
    "cdc_hot_keys" -> ((s: SparkSession, d: String) => Changefeed.hotKeys(s, d)),
    "ts_calendar_profile" -> (TimeSeries.calendarProfile _),
    "ts_growth_accounting" -> (TimeSeries.growthAccounting _),
    // r14 wave 5
    "q13_custdist" -> (Analytics.q13CustDist _),
    "q4_order_priority" -> ((s: SparkSession, d: String) => Analytics.q4OrderPriority(s, d)),
    "q_ri_audit" -> (Analytics.qRiAudit _),
    "ts_wow_change" -> (TimeSeries.wowChange _),
    "ts_session_concurrency" -> (TimeSeries.sessionConcurrency _),
    // r14 wave 6
    "q_audience_overlap" -> (Analytics.qAudienceOverlap _),
    "ts_drawdown" -> (TimeSeries.drawdown _),
    "dedup_df_profile" -> (Dedup.dfProfile _),
    "ts_purchase_gaps" -> (TimeSeries.purchaseGaps _),
    "q7_trade_matrix" -> (Analytics.q7TradeMatrix _),
    // r15: the remaining cheap TPC-H classics (r14 judge #4)
    "q9_part_profit" -> (Analytics.q9PartProfit _),
    "q18_large_orders" -> ((s: SparkSession, d: String) => Analytics.q18LargeOrders(s, d)),
    "q10_returned_revenue" -> (Analytics.q10ReturnedRevenue _),
    "q15_top_supplier" -> (Analytics.q15TopSupplier _),
    "q19_disjunctive_revenue" -> (Analytics.q19DisjunctiveRevenue _),
    "q8_market_share" -> ((s: SparkSession, d: String) => Analytics.q8MarketShare(s, d)),
    "q14_promo_share" -> (Analytics.q14PromoShare _),
    "q17_small_quantity" -> ((s: SparkSession, d: String) => Analytics.q17SmallQuantity(s, d)),
    "q22_sales_opportunity" -> (Analytics.q22SalesOpportunity _),
    // r16: TPC-H endgame — the six classics blocked on missing corpus
    // columns, unblocked by the DERIVED synthetic supplement
    // (Tables.partsupp / Tables.lineitemShip — the oracle derives the
    // identical columns, so all six stay hash-gated; r15 judge #2)
    "q2_min_cost_supp" -> ((s: SparkSession, d: String) => Analytics.q2MinCostSupp(s, d)),
    "q11_important_stock" -> ((s: SparkSession, d: String) => Analytics.q11ImportantStock(s, d)),
    "q12_shipmode_priority" -> (Analytics.q12ShipmodePriority _),
    "q16_supplier_counts" -> (Analytics.q16SupplierCounts _),
    "q20_part_promotion" -> ((s: SparkSession, d: String) => Analytics.q20PartPromotion(s, d)),
    "q21_late_suppliers" -> ((s: SparkSession, d: String) => Analytics.q21LateSuppliers(s, d))
  )

  // ---- shared oracle SQL fragments -------------------------------------

  /** Synthetic changefeed change rows from `events` (mirrors
    * Changefeed.changeRows). */
  // NOTE: fragments get spliced into outer strings that are ALSO
  // stripMargin'd — no continuation line here may start with '|'.
  private val chCte =
    """ch AS (
      |  SELECT event_id, epoch_us(ts) AS sort_us, 'events' AS tbl,
      |    '[' || CAST(event_id AS VARCHAR) || ']' AS key,
      |    '{"after": {"event_id": ' || CAST(event_id AS VARCHAR) ||
      |      ', "ts_us": ' || CAST(epoch_us(ts) AS VARCHAR) ||
      |      ', "user_id": ' || CAST(user_id AS VARCHAR) ||
      |      ', "event_type": "' || event_type ||
      |      '", "value_cents": ' || CAST(CAST(round(value*100,0) AS BIGINT) AS VARCHAR) ||
      |      ', "k": ' || coalesce(json_extract_string(props,'$.k'),'null') ||
      |      '}}' AS value
      |  FROM events)""".stripMargin

  /** The engine's resolved cadence, interpolated so the oracles can
    * never silently diverge from `Changefeed.defaultResolvedFrequencyUs`
    * (the minhashPermSql single-source-of-truth pattern). */
  private val freqUs: Long = graft.cdc.Changefeed.defaultResolvedFrequencyUs

  /** Synthetic resolved-cursor rows (mirrors Changefeed.resolvedRows:
    * bucket end = us − us % f + f, epoch-aligned like the engine). */
  private val rsCte =
    s"""rs AS (
      |  SELECT DISTINCT epoch_us(ts) - epoch_us(ts) % $freqUs + $freqUs AS sort_us,
      |    CAST(NULL AS VARCHAR) AS tbl, CAST(NULL AS VARCHAR) AS key,
      |    '{"resolved": "' || CAST(epoch_us(ts) - epoch_us(ts) % $freqUs + $freqUs AS VARCHAR) ||
      |      '.0000000000"}' AS value
      |  FROM events)""".stripMargin

  private val envelopeExpr =
    """'{"table":"' || tbl || '","key":"' || key || '","value":' || value || '}'"""

  /** Per-row integer cents (mirrors Fns.cents). */
  private def cents(x: String) = s"CAST(round(($x)*100,0) AS BIGINT)"

  /** Word tokens + 3-gram shingle set (mirrors Fns.tokens/shingles). */
  private val shCte =
    """d AS (
      |  SELECT doc_id, source,
      |    list_distinct(list_transform(generate_series(1, greatest(len(toks)-2,1)),
      |      i -> array_to_string(toks[i:i+2], ' '))) AS sh
      |  FROM (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS toks
      |        FROM documents))""".stripMargin

  /** Shared by the three iterative-graph oracles: the same-source
    * shingle-overlap pair frame (bit-identical to Dedup.candidatePairs
    * — pinned by the sql-green dedup_ngram_jaccard/graph_bfs_dist that
    * consume the identical CTE) and its bidirected edge view.
    * MATERIALIZED: the unrolled rounds below reference these many
    * times, and DuckDB would otherwise inline the shingle join once
    * per reference. */
  private val graphEdgesCte =
    s"""$shCte,
       |pairs AS MATERIALIZED (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
       |ed AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs)""".stripMargin

  /** text_bpe_train/_encode oracle CTE chain: the engine's k BPE merge
    * rounds unrolled — w0 is the word-frequency vocab in the double-
    * spaced symbol encoding; each round counts adjacent pairs, picks
    * the argmax under (cnt DESC, x, y), and applies the SAME literal
    * replace the engine uses (both engines scan the original left to
    * right and continue after each match — exact greedy). Lines carry
    * no `|` margin: the fragment is interpolated into stripMargin'd
    * strings. */
  private def bpeOracleCtes(k: Int, src: String): String = {
    val sb = new StringBuilder
    sb.append(
      s"""w0 AS MATERIALIZED (SELECT tok, n,
'  ' || regexp_replace(tok, '(.)', '\\1  ', 'g') AS s FROM (
SELECT tok, count(*) AS n FROM (
SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM $src)
GROUP BY 1))""")
    for (r <- 1 to k) sb.append(
      s""",
p$r AS (SELECT pr.x AS x, pr.y AS y, sum(n) AS cnt FROM (
SELECT n, unnest(list_transform(range(1, len(sy)),
  i -> {'x': sy[i], 'y': sy[i+1]})) AS pr
FROM (SELECT n, string_split(trim(s), '  ') AS sy FROM w${r - 1}))
GROUP BY 1, 2),
m$r AS MATERIALIZED (SELECT x, y, cnt FROM p$r ORDER BY cnt DESC, x, y LIMIT 1),
w$r AS MATERIALIZED (SELECT tok, n,
replace(s, ' ' || x || '  ' || y || ' ', ' ' || x || y || ' ') AS s
FROM w${r - 1} CROSS JOIN m$r)""")
    sb.toString
  }

  /** graph_pagerank oracle: the engine's fixed-iteration ALL-INTEGER
    * PageRank unrolled — each round is one CTE (recursive CTEs can't
    * aggregate over the recursive relation in standard SQL, and the
    * iteration count is a compile-time constant anyway). Integer `//`
    * here ≡ Spark's `div` on the non-negative ranks. */
  private def pagerankOracle(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT n.doc_id,
         |    CAST(150000000 + (85 * coalesce(s.in_sum, 0)) // 100 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.b AS doc_id, sum(r.pr // e.out_deg) AS in_sum
         |    FROM edd e JOIN r${i - 1} r ON r.doc_id = e.a GROUP BY 1) s
         |  USING (doc_id))""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphEdgesCte,
       |deg AS MATERIALIZED (SELECT a, count(*) AS out_deg FROM ed GROUP BY 1),
       |edd AS MATERIALIZED (SELECT ed.a, ed.b, deg.out_deg FROM ed JOIN deg USING (a)),
       |nodes AS MATERIALIZED (SELECT a AS doc_id FROM deg),
       |r0 AS (SELECT doc_id, CAST(1000000000 AS BIGINT) AS pr FROM nodes),
       |$rounds
       |SELECT doc_id, pr AS rank_e9 FROM r$iters ORDER BY doc_id""".stripMargin
  }

  /** graph_label_prop oracle: the deterministic synchronous variant
    * unrolled — per round, neighbor votes plus the self-vote, argmax
    * by (votes desc, label asc) via row_number. */
  private def labelPropOracle(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT doc_id, label FROM (
         |    SELECT doc_id, label,
         |      row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, label) AS rk
         |    FROM (SELECT doc_id, label, count(*) AS n FROM (
         |      SELECT e.b AS doc_id, l.label FROM ed e JOIN l${i - 1} l ON l.doc_id = e.a
         |      UNION ALL SELECT doc_id, label FROM l${i - 1})
         |    GROUP BY 1, 2))
         |  WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphEdgesCte,
       |nodes AS MATERIALIZED (SELECT DISTINCT a AS doc_id FROM ed),
       |l0 AS (SELECT doc_id, doc_id AS label FROM nodes),
       |$rounds,
       |sizes AS (SELECT label, count(*) AS community_size FROM l$iters GROUP BY 1)
       |SELECT l.doc_id, l.label AS community,
       |  CAST(s.community_size AS BIGINT) AS community_size
       |FROM l$iters l JOIN sizes s USING (label) ORDER BY l.doc_id""".stripMargin
  }

  /** graph_kcore oracle: peel-to-fixpoint unrolled with headroom —
    * each extra round past convergence is the identity, so `rounds`
    * only needs to EXCEED the true peeling depth (single digits on
    * this corpus; 24 is generous and cheap on the materialized edge
    * frame). */
  private def kcoreOracle(rounds: Int, k: Int): String = {
    val rs = (1 to rounds).map { i =>
      s"""k$i AS MATERIALIZED (
         |  SELECT d FROM (SELECT doc_a AS d FROM e${i - 1}
         |                 UNION ALL SELECT doc_b FROM e${i - 1})
         |  GROUP BY 1 HAVING count(*) >= $k),
         |e$i AS MATERIALIZED (
         |  SELECT doc_a, doc_b FROM e${i - 1}
         |  WHERE doc_a IN (SELECT d FROM k$i) AND doc_b IN (SELECT d FROM k$i))""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphEdgesCte,
       |e0 AS (SELECT doc_a, doc_b FROM pairs),
       |$rs
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS core_deg FROM (
       |  SELECT doc_a AS doc_id FROM e$rounds UNION ALL SELECT doc_b FROM e$rounds)
       |GROUP BY 1 HAVING count(*) >= $k ORDER BY doc_id""".stripMargin
  }

  /** Sequential double cosine similarity in micro-units (mirrors
    * Fns.cosine + Fns.scaled). */
  private def cosE6(a: String, b: String) =
    s"""CAST(round(
       |  list_sum(list_transform(generate_series(1, len($a)), i -> $a[i]*$b[i]))
       |  / (sqrt(list_sum(list_transform($a, v -> v*v)))
       |     * sqrt(list_sum(list_transform($b, v -> v*v))))
       |  * 1000000, 0) AS BIGINT)""".stripMargin

  private val embBase =
    """base AS (SELECT vec_id, label,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings)""".stripMargin

  /** Shared by q_asof_join (window formulation) and q_asof_native
    * (custom physical operator) — both must hash-match this. */
  private val asofLeftOracle =
    """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
      |  FROM events WHERE event_type IN ('click','purchase')),
      |w AS (SELECT *,
      |  last_value(CASE WHEN event_type='click' THEN event_id END IGNORE NULLS) OVER
      |    (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_id,
      |  last_value(CASE WHEN event_type='click' THEN us END IGNORE NULLS) OVER
      |    (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_us
      | FROM ev)
      |SELECT user_id, event_id AS purchase_id, us AS purchase_us,
      |  last_click_id, last_click_us, us - last_click_us AS gap_us,
      |  CAST(CASE WHEN last_click_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS attributed
      |FROM w WHERE event_type='purchase'
      |ORDER BY purchase_id""".stripMargin

  private val asofOracle =
    """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
      |  FROM events WHERE event_type IN ('click','purchase')),
      |w AS (SELECT *,
      |  last_value(CASE WHEN event_type='click' THEN event_id END IGNORE NULLS) OVER
      |    (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_id,
      |  last_value(CASE WHEN event_type='click' THEN us END IGNORE NULLS) OVER
      |    (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_us
      | FROM ev)
      |SELECT user_id, event_id AS purchase_id, us AS purchase_us,
      |  last_click_id, last_click_us, us - last_click_us AS gap_us
      |FROM w WHERE event_type='purchase' AND last_click_id IS NOT NULL
      |ORDER BY purchase_id""".stripMargin

  /** Corpus ∪ planted near-dup variants (doc_id+1e6, last 3 tokens
    * dropped) — mirrors Dedup.corpusWithPlants; shared by the
    * simhash/minhash/winnowing oracles. Lines deliberately carry no
    * `|` margin: the fragment is interpolated into stripMargin'd
    * strings. */
  private val plantedCorpusSql: String =
    """t0 AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
c AS (SELECT doc_id, toks FROM t0 UNION ALL
      SELECT doc_id + 1000000 AS doc_id, toks[1:greatest(len(toks)-3,1)] AS toks
      FROM t0 WHERE doc_id % 10 = 0)"""

  /** Distinct md5-mod-2^31 3-shingle hashes per doc over a (doc_id,
    * toks) CTE named `c` — mirrors Fns.shingleMd5Hashes(toks, 3). */
  private def shingleHashCte(src: String): String =
    s"""sh AS (SELECT DISTINCT doc_id,
  ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483648 AS h
  FROM (SELECT doc_id, unnest(list_transform(
    range(1, greatest(len(toks) - 2, 1) + 1),
    i -> array_to_string(toks[i:i+2], ' '))) AS s FROM $src))"""

  /** The 96 MinHash permutation constants as a VALUES list — generated
    * from the SAME Fns.minhashA/minhashB the engine uses, so the two
    * sides cannot drift. */
  private val minhashPermSql: String = (0 until 96)
    .map(i => s"(${i}, ${graft.functions.Fns.minhashA(i)}, ${graft.functions.Fns.minhashB(i)})")
    .mkString(", ")

  /** MinHash signature + band-key CTEs over `sh` (expects `perm` too):
    * per-(doc, i) permutation minima and per-band joined keys. */
  private val minhashSigCtes: String =
    """s AS MATERIALIZED (SELECT doc_id, i, min((a * h + b) % 2147483647) AS m
  FROM sh CROSS JOIN perm GROUP BY 1, 2),
bnd AS (SELECT doc_id, i // 3 AS band,
  string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bkey
  FROM s GROUP BY 1, 2)"""

  def oracleSql: Map[String, String] = Map(
    // r11b rows→sql upgrades: the md5+affine replayable hash family
    // lets DuckDB recompute MinHash/SimHash/winnowing signatures
    // bit-for-bit (see Fns.shingleMd5Hashes/affineHash/md5Hash60)
    "dedup_simhash" ->
      s"""WITH $plantedCorpusSql,
         |tok AS (SELECT doc_id, unnest(toks) AS tk FROM c),
         |h AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS hv FROM tok),
         |v AS (SELECT doc_id, j, sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
         |  FROM h CROSS JOIN (SELECT unnest(range(60)) AS j) bits GROUP BY 1, 2),
         |sig AS (SELECT doc_id,
         |  CAST(sum(CASE WHEN vote > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS sig
         |  FROM v GROUP BY 1)
         |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |  CAST(bit_count(xor(x.sig, y.sig)) AS BIGINT) AS hamming
         |FROM sig x JOIN sig y ON x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.sig, y.sig)) <= 8
         |ORDER BY doc_a, doc_b""".stripMargin,

    // fuzzy decontamination: same replayable signature basis, bench
    // side = doc_id % 50 = 0 (the #66 convention), paraphrased plants
    // at a corpus-DERIVED offset (smallest multiple of 50 past
    // max(doc_id) — a constant collides once ids outgrow it, e.g. the
    // 10× corpus's +1e8 copy ranges); threshold est ≥ 700‰ ⟺
    // neq·1000 ≥ 67200
    "text_decontaminate_fuzzy" ->
      s"""WITH ofs AS (SELECT ((max(doc_id) // 50) + 1) * 50 AS o FROM documents),
         |c0 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
         |c AS (SELECT doc_id, toks FROM c0
         |  UNION ALL SELECT doc_id + (SELECT o FROM ofs), toks[1:greatest(len(toks)-3, 1)]
         |  FROM c0 WHERE doc_id % 50 = 0),
         |${shingleHashCte("c")},
         |perm AS (SELECT * FROM (VALUES $minhashPermSql) p(i, a, b)),
         |$minhashSigCtes,
         |cand AS (SELECT DISTINCT t.doc_id, b.doc_id AS bench_doc
         |  FROM bnd t JOIN bnd b ON t.band = b.band AND t.bkey = b.bkey
         |  WHERE (t.doc_id % 50 <> 0 OR t.doc_id >= (SELECT o FROM ofs))
         |    AND b.doc_id % 50 = 0 AND b.doc_id < (SELECT o FROM ofs)),
         |eq AS (SELECT cand.doc_id, cand.bench_doc,
         |  count(*) FILTER (WHERE sa.m = sb.m) AS neq
         |  FROM cand JOIN s sa ON sa.doc_id = cand.doc_id
         |  JOIN s sb ON sb.doc_id = cand.bench_doc AND sb.i = sa.i GROUP BY 1, 2),
         |sc AS (SELECT doc_id, bench_doc, CAST(neq * 1000 // 96 AS BIGINT) AS est_pm
         |  FROM eq WHERE neq * 1000 >= 67200),
         |w AS (SELECT *, max(est_pm) OVER (PARTITION BY doc_id) AS mx FROM sc)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bench_matches,
         |  CAST(min(bench_doc) FILTER (WHERE est_pm = mx) AS BIGINT) AS best_bench_id,
         |  CAST(max(est_pm) AS BIGINT) AS best_est_pm
         |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_minhash_lsh" ->
      s"""WITH $plantedCorpusSql,
         |${shingleHashCte("c")},
         |perm AS (SELECT * FROM (VALUES $minhashPermSql) p(i, a, b)),
         |$minhashSigCtes,
         |pr AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bnd x JOIN bnd y
         |  ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
         |eq AS (SELECT pr.doc_a, pr.doc_b, count(*) FILTER (WHERE sa.m = sb.m) AS neq
         |  FROM pr JOIN s sa ON sa.doc_id = pr.doc_a
         |  JOIN s sb ON sb.doc_id = pr.doc_b AND sb.i = sa.i GROUP BY 1, 2)
         |SELECT doc_a, doc_b, CAST(neq * 1000 // 96 AS BIGINT) AS est_jaccard_pm
         |FROM eq WHERE neq * 1000 >= 48000 ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_lsh_tuning" -> {
      val cfgs = graft.operators.Dedup.lshTuningConfigs
      val bndCtes = cfgs.map { case (b, r) =>
        s"""bnd$b AS MATERIALIZED (SELECT doc_id, i // $r AS band,
           |  string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bkey
           |  FROM s GROUP BY 1, 2)""".stripMargin
      }.mkString(",\n")
      val blocks = cfgs.map { case (b, r) =>
        val t = graft.operators.Dedup.lshTStarPm(b, r)
        s"""SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band,
           |  CAST($t AS BIGINT) AS t_star_pm,
           |  CAST(count(*) AS BIGINT) AS n_candidates,
           |  CAST(coalesce(sum(CASE WHEN mt >= 48 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_verified,
           |  CAST(1000 * coalesce(sum(CASE WHEN mt >= 48 THEN 1 ELSE 0 END), 0)
           |    // greatest(count(*), 1) AS BIGINT) AS precision_pm
           |FROM (
           |  SELECT sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) AS mt
           |  FROM (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           |        FROM bnd$b x JOIN bnd$b y
           |        ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id) c2
           |  JOIN s sa ON sa.doc_id = c2.doc_a
           |  JOIN s sb ON sb.doc_id = c2.doc_b AND sb.i = sa.i
           |  GROUP BY c2.doc_a, c2.doc_b)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $plantedCorpusSql,
         |${shingleHashCte("c")},
         |perm AS (SELECT * FROM (VALUES $minhashPermSql) p(i, a, b)),
         |$minhashSigCtes,
         |$bndCtes
         |SELECT * FROM ($blocks) ORDER BY bands DESC""".stripMargin
    },

    "dedup_incremental_minhash" ->
      s"""WITH t0 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
         |${shingleHashCte("t0")},
         |perm AS (SELECT * FROM (VALUES $minhashPermSql) p(i, a, b)),
         |$minhashSigCtes,
         |cand AS (SELECT DISTINCT b.doc_id, e.doc_id AS matched
         |  FROM bnd b JOIN bnd e ON b.band = e.band AND b.bkey = e.bkey
         |  WHERE b.doc_id % 5 = 4 AND e.doc_id % 5 <> 4),
         |eq AS (SELECT c.doc_id, c.matched, count(*) FILTER (WHERE sa.m = sb.m) AS neq
         |  FROM cand c JOIN s sa ON sa.doc_id = c.doc_id
         |  JOIN s sb ON sb.doc_id = c.matched AND sb.i = sa.i GROUP BY 1, 2),
         |ver AS (SELECT doc_id, min(matched) AS matched_doc_id FROM eq
         |  WHERE neq * 1000 >= 48000 GROUP BY 1)
         |SELECT t0.doc_id,
         |  CAST(CASE WHEN ver.matched_doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_near_dup,
         |  COALESCE(ver.matched_doc_id, -1) AS matched_doc_id
         |FROM t0 LEFT JOIN ver USING (doc_id) WHERE t0.doc_id % 5 = 4
         |ORDER BY t0.doc_id""".stripMargin,

    "dedup_winnowing" ->
      s"""WITH $plantedCorpusSql,
         |hs AS (SELECT doc_id, list_transform(
         |    range(1, greatest(len(toks) - 3, 1) + 1),
         |    i -> ('0x' || substr(md5(array_to_string(toks[i:i+3], ' ')), 1, 15))::BIGINT) AS hs
         |  FROM c),
         |fp AS (SELECT DISTINCT doc_id, unnest(list_transform(
         |    range(1, greatest(len(hs) - 3, 1) + 1),
         |    i -> list_min(hs[i:i+3]))) AS fp FROM hs),
         |rare AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 128),
         |pr AS (SELECT f.doc_id, f.fp FROM fp f JOIN rare USING (fp))
         |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
         |FROM pr x JOIN pr y ON x.fp = y.fp AND x.doc_id < y.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY doc_a, doc_b""".stripMargin,

    // r11 rows→sql upgrades: the engine's fixed-iteration integer graph
    // ops replayed as unrolled CTE rounds
    "graph_pagerank" -> pagerankOracle(6),
    "graph_label_prop" -> labelPropOracle(8),
    "graph_kcore" -> kcoreOracle(24, 2),

    // the CM grid commutes (counter sums), so the oracle reproduces the
    // ESTIMATES exactly: cell_r(x) = low10((x*seed_r) mod 2^64) XOR
    // low10(x >>> 31), and low10 of the wrapped product is
    // ((x%1024)*(seed_r%1024))%1024 because 1024 | 2^64 — the seeds
    // appear below reduced mod 1024 (21, 847, 505, 965)
    "q_heavy_hitters" ->
      """WITH e AS (SELECT user_id FROM events),
        |c AS MATERIALIZED (SELECT user_id,
        |  xor(((user_id % 1024) * 21) % 1024, (user_id >> 31) & 1023) AS c0,
        |  xor(((user_id % 1024) * 847) % 1024, (user_id >> 31) & 1023) AS c1,
        |  xor(((user_id % 1024) * 505) % 1024, (user_id >> 31) & 1023) AS c2,
        |  xor(((user_id % 1024) * 965) % 1024, (user_id >> 31) & 1023) AS c3
        |  FROM e),
        |g0 AS (SELECT c0, count(*) AS n FROM c GROUP BY 1),
        |g1 AS (SELECT c1, count(*) AS n FROM c GROUP BY 1),
        |g2 AS (SELECT c2, count(*) AS n FROM c GROUP BY 1),
        |g3 AS (SELECT c3, count(*) AS n FROM c GROUP BY 1),
        |kk AS (SELECT unnest(generate_series(0, 9)) AS user_id),
        |kc AS (SELECT user_id,
        |  (user_id * 21) % 1024 AS c0, (user_id * 847) % 1024 AS c1,
        |  (user_id * 505) % 1024 AS c2, (user_id * 965) % 1024 AS c3 FROM kk),
        |est AS (SELECT kc.user_id, least(g0.n, g1.n, g2.n, g3.n) AS est_n
        |  FROM kc JOIN g0 USING (c0) JOIN g1 USING (c1)
        |  JOIN g2 USING (c2) JOIN g3 USING (c3)),
        |ex AS (SELECT user_id, count(*) AS exact_n FROM e
        |  WHERE user_id BETWEEN 0 AND 9 GROUP BY 1),
        |tot AS (SELECT count(*) AS n_total FROM e)
        |SELECT ex.user_id, CAST(ex.exact_n AS BIGINT) AS exact_n,
        |  CAST(est.est_n AS BIGINT) AS est_n,
        |  CAST(tot.n_total AS BIGINT) AS n_total,
        |  CAST(est.est_n - ex.exact_n AS BIGINT) AS slack
        |FROM ex JOIN est USING (user_id) CROSS JOIN tot
        |ORDER BY ex.user_id""".stripMargin,

    // md5-based polynomial rolling hash, replayed with list_reduce;
    // list_prepend(0, …) supplies the engine's zero init
    "text_fingerprint" ->
      """WITH t AS (SELECT doc_id,
        |  string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |h AS (SELECT doc_id, len(toks) AS n_tokens,
        |  list_transform(toks,
        |    tk -> ('0x' || substr(md5(tk), 1, 15))::BIGINT % 2147483648) AS hs
        |  FROM t)
        |SELECT doc_id,
        |  CAST(list_reduce(list_prepend(0, hs),
        |    (a, b) -> (a * 1000003 + b) % 2147483648) AS BIGINT) AS fingerprint,
        |  CAST(n_tokens AS BIGINT) AS n_tokens
        |FROM h ORDER BY doc_id""".stripMargin,

    // exact trailing-24h distinct brute-forced over the tiny hour
    // frame (the engine computes it with the interval diff-array; both
    // are THE SAME exact quantity); est_ok asserts the HLL estimate
    // lands within ±10% of it
    "ts_sliding_distinct" ->
      """WITH h AS (SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
        |  user_id FROM events),
        |hh AS MATERIALIZED (SELECT hi, count(DISTINCT user_id) AS hour_exact
        |  FROM h GROUP BY 1),
        |ex AS (SELECT w.hi, count(DISTINCT h.user_id) AS exact_24h
        |  FROM hh w JOIN h ON h.hi BETWEEN w.hi - 23 AND w.hi GROUP BY 1),
        |nh AS (SELECT a.hi, count(*) AS n_hours_window
        |  FROM hh a JOIN hh b ON b.hi BETWEEN a.hi - 23 AND a.hi GROUP BY 1)
        |SELECT CAST(hh.hi * 3600000000 AS BIGINT) AS hour_us,
        |  CAST(hh.hour_exact AS BIGINT) AS hour_exact,
        |  CAST(ex.exact_24h AS BIGINT) AS exact_24h,
        |  CAST(nh.n_hours_window AS BIGINT) AS n_hours_window,
        |  CAST(1 AS BIGINT) AS est_ok
        |FROM hh JOIN ex USING (hi) JOIN nh USING (hi)
        |ORDER BY hour_us""".stripMargin,

    "q_approx_distinct" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(1 AS BIGINT) AS est_ok
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    // IVM ledger: per-PK lag gives each change's superseded value; the
    // running view is a prefix sum over the batch×type ledger — all
    // integer, both engines
    "cdc_incremental_view" ->
      s"""WITH v AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
         |  ${cents("value")} AS c FROM events),
         |l AS (SELECT *, lag(c) OVER (PARTITION BY user_id, event_type
         |  ORDER BY us, event_id) AS prev_c FROM v),
         |d AS (SELECT us - us % $freqUs + $freqUs AS batch_us, event_type,
         |  CASE WHEN prev_c IS NULL THEN 1 ELSE 0 END AS dc,
         |  c - coalesce(prev_c, 0) AS ds FROM l),
         |b AS (SELECT batch_us, event_type, CAST(sum(dc) AS BIGINT) AS d_count,
         |  CAST(sum(ds) AS BIGINT) AS d_sum_c FROM d GROUP BY 1, 2)
         |SELECT CAST(batch_us AS BIGINT) AS batch_us, event_type, d_count, d_sum_c,
         |  CAST(sum(d_count) OVER w AS BIGINT) AS view_count,
         |  CAST(sum(d_sum_c) OVER w AS BIGINT) AS view_sum_c
         |FROM b WINDOW w AS (PARTITION BY event_type ORDER BY batch_us)
         |ORDER BY event_type, batch_us""".stripMargin,

    // duplicated-span detection: identical per-token md5-60bit hashes
    // + length-8 polynomial window hashes mod 2^31 on both engines;
    // the interval union is a lead() over each doc's dup window starts
    "text_substring_dedup" ->
      """WITH t AS (SELECT doc_id,
        |  string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |b AS (SELECT doc_id, len(toks) AS n,
        |  list_transform(toks,
        |    tk -> ('0x' || substr(md5(tk), 1, 15))::BIGINT % 2147483648) AS hs
        |  FROM t),
        |wi AS (SELECT doc_id, n,
        |  unnest(CASE WHEN n >= 8
        |    THEN generate_series(1, CAST(n AS INT) - 7) ELSE [] END) AS i
        |  FROM b),
        |wh AS (SELECT w.doc_id, w.i,
        |  list_reduce(list_prepend(0, b.hs[w.i:w.i+7]),
        |    (a, h) -> (a * 1000003 + h) % 2147483648) AS h
        |  FROM wi w JOIN b ON b.doc_id = w.doc_id),
        |dup AS (SELECT h FROM wh GROUP BY h HAVING count(*) >= 2),
        |d AS (SELECT doc_id, i FROM wh WHERE h IN (SELECT h FROM dup)),
        |c AS (SELECT doc_id, least(8, coalesce(
        |    lead(i) OVER (PARTITION BY doc_id ORDER BY i) - i, 8)) AS contrib
        |  FROM d),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows,
        |  CAST(sum(contrib) AS BIGINT) AS dup_tokens FROM c GROUP BY 1)
        |SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens,
        |  coalesce(agg.n_dup_windows, 0) AS n_dup_windows,
        |  coalesce(agg.dup_tokens, 0) AS dup_tokens,
        |  CAST(coalesce(agg.dup_tokens, 0) * 1000 // greatest(b.n, 1) AS BIGINT) AS dup_pm
        |FROM b LEFT JOIN agg USING (doc_id) ORDER BY b.doc_id""".stripMargin,

    // the removal half: keep token j iff no duplicated window start s
    // covers it (DuckDB lambdas index 1-based, matching wi's i)
    "text_substring_scrub" ->
      """WITH t AS (SELECT doc_id,
        |  string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |b AS (SELECT doc_id, toks, len(toks) AS n,
        |  list_transform(toks,
        |    tk -> ('0x' || substr(md5(tk), 1, 15))::BIGINT % 2147483648) AS hs
        |  FROM t),
        |wi AS (SELECT doc_id, n,
        |  unnest(CASE WHEN n >= 8
        |    THEN generate_series(1, CAST(n AS INT) - 7) ELSE [] END) AS i
        |  FROM b),
        |wh AS (SELECT w.doc_id, w.i,
        |  list_reduce(list_prepend(0, b.hs[w.i:w.i+7]),
        |    (a, h) -> (a * 1000003 + h) % 2147483648) AS h
        |  FROM wi w JOIN b ON b.doc_id = w.doc_id),
        |dup AS (SELECT h FROM wh GROUP BY h HAVING count(*) >= 2),
        |d AS (SELECT doc_id, i FROM wh WHERE h IN (SELECT h FROM dup)),
        |st AS (SELECT doc_id, list_sort(list(i)) AS starts FROM d GROUP BY 1),
        |k AS (SELECT b.doc_id, b.n,
        |  CASE WHEN st.starts IS NULL THEN b.toks
        |       ELSE list_filter(b.toks, (x, j) ->
        |         len(list_filter(st.starts, s -> j >= s AND j <= s + 7)) = 0)
        |  END AS kept
        |  FROM b LEFT JOIN st USING (doc_id))
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  coalesce(array_to_string(kept, ' '), '') AS scrubbed_text
        |FROM k ORDER BY doc_id""".stripMargin,

    // same weight formula on both engines: md5-60bit → 2^15 bucket →
    // Knuth multiply, double mod → [0,2000]; nonnegative fold keeps
    // integer division floor ≡ truncation across engines
    "text_classifier_score" ->
      """WITH t AS (SELECT doc_id,
        |  string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |s AS (SELECT doc_id, len(toks) AS n_tokens,
        |  list_sum(list_transform(toks, tk ->
        |    ((('0x' || substr(md5(tk), 1, 15))::BIGINT % 32768)
        |      * 2654435761) % 1000003 % 2001)) AS sum_w
        |  FROM t)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(sum_w // greatest(n_tokens, 1) - 1000 AS BIGINT) AS score_pm,
        |  CAST(CASE WHEN sum_w // greatest(n_tokens, 1) >= 1000
        |    THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_quantiles_approx" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(1 AS BIGINT) AS p50_ok, CAST(1 AS BIGINT) AS p90_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_hll_union" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  CAST(1 AS BIGINT) AS est_ok
        |FROM events GROUP BY 1
        |UNION ALL
        |SELECT '__ALL__', CAST(count(DISTINCT user_id) AS BIGINT),
        |  CAST(1 AS BIGINT) FROM events
        |ORDER BY event_type""".stripMargin,

    "cdc_changefeed_rows" ->
      s"""WITH $chCte, $rsCte
         |SELECT sort_us, tbl, key, value FROM (
         |  SELECT sort_us, tbl, key, value FROM ch
         |  UNION ALL SELECT sort_us, tbl, key, value FROM rs)
         |ORDER BY sort_us, coalesce(key,'')""".stripMargin,

    "cdc_classify" ->
      s"""WITH $chCte, $rsCte,
         |f AS (SELECT sort_us, tbl, key FROM ch UNION ALL SELECT sort_us, tbl, key FROM rs)
         |SELECT CASE WHEN tbl IS NULL AND key IS NULL THEN 'cursor' ELSE 'change' END AS row_type,
         |  count(*) AS n, min(sort_us) AS first_us, max(sort_us) AS last_us
         |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_envelope" ->
      s"""WITH $chCte
         |SELECT event_id, $envelopeExpr AS payload FROM ch ORDER BY event_id""".stripMargin,

    "cdc_resolved_cursor" ->
      s"""WITH $rsCte
         |SELECT max(CAST(split_part(json_extract_string(value,'$$.resolved'),'.',1) AS BIGINT)) AS max_resolved_us,
         |  count(*) AS n_resolved FROM rs""".stripMargin,

    "cdc_cursor_store" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn FROM e)
        |SELECT user_id, event_id AS cursor_event_id, us AS cursor_ts_us
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "cdc_compact" ->
      s"""WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
         |  ${cents("value")} AS value_cents FROM events),
         |r AS (SELECT *,
         |  row_number() OVER (PARTITION BY user_id, event_type ORDER BY us DESC, event_id DESC) AS rn,
         |  count(*) OVER (PARTITION BY user_id, event_type) AS n_versions FROM e)
         |SELECT user_id, event_type, event_id AS last_event_id,
         |  value_cents AS last_value_cents, CAST(n_versions AS BIGINT) AS n_versions
         |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "cdc_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |FROM events WHERE json_extract_string(props,'$.k') IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "cdc_queue_partition" ->
      s"""WITH $chCte,
         |p AS (SELECT event_id % 32 AS part_id,
         |  CAST(length($envelopeExpr) AS BIGINT) AS bytes FROM ch)
         |SELECT part_id, count(*) AS n_messages, CAST(sum(bytes) AS BIGINT) AS total_bytes
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_apply" ->
      s"""WITH ev AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
         |  ${cents("value")} AS value_cents, ts FROM events),
         |base AS (SELECT user_id, event_type, event_id, us, value_cents, 'base' AS origin FROM (
         |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY us DESC, event_id DESC) AS rn
         |  FROM ev WHERE ts < TIMESTAMP '2024-07-01 00:00:00') WHERE rn = 1),
         |delta AS (SELECT user_id, event_type, event_id, us, value_cents, 'delta' AS origin
         |  FROM ev WHERE ts >= TIMESTAMP '2024-07-01 00:00:00'),
         |merged AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY us DESC, event_id DESC) AS rn
         |  FROM (SELECT * FROM base UNION ALL SELECT * FROM delta))
         |SELECT user_id, event_type, event_id, us, value_cents, origin
         |FROM merged WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "cdc_payload_parse" ->
      s"""WITH $chCte,
         |env AS (SELECT event_id AS oid, $envelopeExpr AS payload FROM ch)
         |SELECT json_extract_string(payload, '$$.table') AS src_table,
         |  CAST(json_extract_string(payload, '$$.value.after.event_id') AS BIGINT) AS event_id,
         |  CAST(json_extract_string(payload, '$$.value.after.ts_us') AS BIGINT) AS ts_us,
         |  CAST(json_extract_string(payload, '$$.value.after.user_id') AS BIGINT) AS user_id,
         |  json_extract_string(payload, '$$.value.after.event_type') AS event_type,
         |  CAST(json_extract_string(payload, '$$.value.after.value_cents') AS BIGINT) AS value_cents,
         |  coalesce(CAST(json_extract_string(payload, '$$.value.after.k') AS BIGINT), -1) AS k
         |FROM env ORDER BY event_id""".stripMargin,

    "cdc_lag" ->
      s"""WITH $chCte, $rsCte,
         |cur AS (SELECT max(CAST(split_part(json_extract_string(value,'$$.resolved'),'.',1) AS BIGINT)) AS max_resolved_us FROM rs)
         |SELECT event_id % 32 AS part_id, count(*) AS n_messages,
         |  max(sort_us) AS last_published_us,
         |  (SELECT max_resolved_us FROM cur) AS max_resolved_us,
         |  (SELECT max_resolved_us FROM cur) - max(sort_us) AS lag_us
         |FROM ch GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_table_router" ->
      """WITH u AS (
        |  SELECT 'events' AS tbl, event_id AS id, epoch_us(ts) AS sort_us FROM events
        |  UNION ALL
        |  SELECT 'orders', o_orderkey, epoch_us(o_orderdate) FROM orders)
        |SELECT tbl, id % 8 AS part_id, count(*) AS n_messages,
        |  min(sort_us) AS first_us, max(sort_us) AS last_us
        |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "cdc_fan_in" ->
      """WITH e AS (SELECT ((user_id % 4) + 4) % 4 AS source_id, epoch_us(ts) AS us FROM events),
        |per AS (SELECT source_id, max(us) AS frontier_us, count(*) AS n_total
        |  FROM e GROUP BY 1),
        |g AS (SELECT min(frontier_us) AS safe_frontier_us FROM per),
        |s AS (SELECT source_id, safe_frontier_us,
        |  CAST(sum(CASE WHEN us <= safe_frontier_us THEN 1 ELSE 0 END) AS BIGINT) AS n_safe
        |  FROM e CROSS JOIN g GROUP BY 1, 2)
        |SELECT per.source_id, per.frontier_us, s.safe_frontier_us,
        |  per.n_total, s.n_safe, per.n_total - s.n_safe AS n_held
        |FROM per JOIN s ON per.source_id = s.source_id
        |ORDER BY per.source_id""".stripMargin,

    "cdc_resolved_batches" ->
      s"""WITH $chCte,
         |b AS (SELECT sort_us - (sort_us % $freqUs) + $freqUs AS window_end_us,
         |  key, sort_us FROM ch),
         |a AS (SELECT window_end_us, count(*) AS n_changes, min(key) AS first_key,
         |  max(key) AS last_key, max(sort_us) AS last_change_us FROM b GROUP BY 1)
         |SELECT window_end_us, n_changes, first_key, last_key, last_change_us,
         |  CAST(sum(n_changes) OVER (ORDER BY window_end_us
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_changes
         |FROM a ORDER BY window_end_us""".stripMargin,

    "q_robust_stats" ->
      s"""WITH x AS (SELECT l_returnflag AS grp, ${cents("l_extendedprice")} AS x_c FROM lineitem),
         |med AS (SELECT grp, CAST(round(quantile_cont(CAST(x_c AS DOUBLE), 0.5), 0) AS BIGINT) AS median_c
         |  FROM x GROUP BY 1),
         |dev AS (SELECT x.grp, median_c, abs(x_c - median_c) AS dev_c FROM x JOIN med USING (grp)),
         |mad AS (SELECT grp, median_c,
         |  CAST(round(quantile_cont(CAST(dev_c AS DOUBLE), 0.5), 0) AS BIGINT) AS mad_c
         |  FROM dev GROUP BY 1, 2)
         |SELECT dev.grp AS l_returnflag, dev.median_c, mad_c, count(*) AS n,
         |  CAST(sum(CASE WHEN dev_c > 5 * mad_c THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM dev JOIN mad ON dev.grp = mad.grp AND dev.median_c = mad.median_c
         |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    "q_lateral_topn" ->
      """SELECT c.c_custkey, t.o_orderkey, t.price_c, t.rk
        |FROM customer c,
        |LATERAL (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_c,
        |    CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
        |  FROM orders o WHERE o.o_custkey = c.c_custkey
        |  ORDER BY price_c DESC, o_orderkey LIMIT 2) t
        |ORDER BY c.c_custkey, t.rk""".stripMargin,

    "q_exists_multi" ->
      """SELECT s.s_name, count(*) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND epoch_us(l1.l_shipdate) > epoch_us(o.o_orderdate) + 5184000000000
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND epoch_us(l3.l_shipdate) > epoch_us(o.o_orderdate) + 5184000000000)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin,

    "q_recursive_chain" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, rn, us, CAST(1 AS BIGINT) AS chain_len
        |  FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.rn, e.us, r.chain_len + 1
        |  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
        |  WHERE e.us - r.us <= 300000000 AND r.chain_len < 50)
        |SELECT user_id, CAST(max(chain_len) AS BIGINT) AS chain_len
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_unpivot" ->
      s"""WITH a AS (SELECT l_returnflag,
         |  CAST(sum(${cents("l_quantity")}) AS BIGINT) AS sum_qty_c,
         |  CAST(sum(${cents("l_extendedprice")}) AS BIGINT) AS sum_price_c,
         |  CAST(sum(${cents("l_discount")}) AS BIGINT) AS sum_disc_c
         |  FROM lineitem GROUP BY 1)
         |SELECT l_returnflag, 'sum_qty_c' AS measure, sum_qty_c AS total_c FROM a
         |UNION ALL SELECT l_returnflag, 'sum_price_c', sum_price_c FROM a
         |UNION ALL SELECT l_returnflag, 'sum_disc_c', sum_disc_c FROM a
         |ORDER BY l_returnflag, measure""".stripMargin,

    "cdc_variant_extract" ->
      """SELECT event_id, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k,
        |  CAST(-1 AS BIGINT) AS absent_k
        |FROM events WHERE json_extract_string(props,'$.k') IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "q_window_range" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
         |  ${cents("value")} AS value_c FROM events)
         |SELECT user_id, event_id, us, value_c,
         |  CAST(sum(value_c) OVER w AS BIGINT) AS sum_5min_c,
         |  count(*) OVER w AS n_5min
         |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us
         |  RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, us, event_id""".stripMargin,

    "cdc_compact_tombstones" ->
      s"""WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
         |  ${cents("value")} AS value_cents,
         |  CAST(CASE WHEN event_id % 97 = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_delete
         |  FROM events),
         |r AS (SELECT *,
         |  row_number() OVER (PARTITION BY user_id, event_type ORDER BY us DESC, event_id DESC) AS rn,
         |  count(*) OVER (PARTITION BY user_id, event_type) AS n_versions,
         |  CAST(sum(is_delete) OVER (PARTITION BY user_id, event_type) AS BIGINT) AS n_deletes
         |  FROM e)
         |SELECT user_id, event_type, event_id AS last_event_id,
         |  value_cents AS last_value_cents, n_versions, n_deletes
         |FROM r WHERE rn = 1 AND is_delete = 0
         |ORDER BY user_id, event_type""".stripMargin,

    "cdc_scd2" ->
      s"""WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
         |  ${cents("value")} AS value_cents FROM events),
         |r AS (SELECT user_id, event_type, event_id, us, value_cents,
         |  coalesce(lead(us) OVER (PARTITION BY user_id, event_type ORDER BY us, event_id),
         |    9223372036854775807) AS valid_to_us,
         |  CAST(row_number() OVER (PARTITION BY user_id, event_type ORDER BY us, event_id) AS BIGINT) AS version_n
         |  FROM e)
         |SELECT user_id, event_type, version_n, event_id, value_cents,
         |  us AS valid_from_us, valid_to_us,
         |  CAST(CASE WHEN valid_to_us = 9223372036854775807 THEN 1 ELSE 0 END AS BIGINT) AS is_current
         |FROM r ORDER BY user_id, event_type, version_n""".stripMargin,

    // dedup_cluster_star is the Kiveris star-contraction CC — a
    // DIFFERENT O(log n)-round algorithm that must land on the SAME
    // fixpoint (cluster id = component-minimum doc_id), so it shares
    // dedup_cluster's oracle verbatim: the hash gate itself proves the
    // two implementations agree
    "dedup_cluster_star" ->
      s"""WITH RECURSIVE $shCte,
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(doc, lab) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.doc)
         |SELECT doc AS doc_id, min(lab) AS cluster_id
         |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_cluster" ->
      s"""WITH RECURSIVE $shCte,
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(doc, lab) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.doc)
         |SELECT doc AS doc_id, min(lab) AS cluster_id
         |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,

    // cluster-representative embedding dedup: the lexical-CC labels
    // (dedup_cluster's recursive reach, verbatim) pick one
    // representative per family (the component-minimum doc_id, whose
    // embedding row is vec_id = cluster_id — ids align 1:1); the
    // merge worklist ranks representative pairs by cosine
    "dedup_cluster_embed" ->
      s"""WITH RECURSIVE $shCte,
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(doc, lab) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.doc),
         |cl AS (SELECT doc AS doc_id, min(lab) AS cluster_id
         |  FROM reach GROUP BY 1),
         |sizes AS (SELECT cluster_id, count(*) AS n_docs FROM cl GROUP BY 1),
         |$embBase,
         |reps AS (SELECT s.cluster_id, s.n_docs, b.label, b.emb
         |  FROM sizes s JOIN base b ON b.vec_id = s.cluster_id)
         |SELECT x.cluster_id AS cluster_a, y.cluster_id AS cluster_b,
         |  x.n_docs AS docs_a, y.n_docs AS docs_b,
         |  ${cosE6("x.emb", "y.emb")} AS cos_e6
         |FROM reps x JOIN reps y
         |  ON x.label = y.label AND x.cluster_id < y.cluster_id
         |ORDER BY cos_e6 DESC, cluster_a, cluster_b LIMIT 50""".stripMargin,

    "dedup_cluster_sizes" ->
      s"""WITH RECURSIVE $shCte,
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(doc, lab) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.doc),
         |cl AS (SELECT doc AS doc_id, min(lab) AS cluster_id
         |  FROM reach GROUP BY 1),
         |cs AS (SELECT cluster_id, count(*) AS cluster_size FROM cl GROUP BY 1)
         |SELECT cluster_size, count(*) AS n_clusters,
         |  cluster_size * count(*) AS n_docs
         |FROM cs GROUP BY 1 ORDER BY 1""".stripMargin,

    // three recursive CC passes over threshold-filtered edge subsets
    // of ONE scored pair frame; integer threshold compares both sides
    "dedup_threshold_sweep" ->
      s"""WITH RECURSIVE $shCte,
         |pj AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS i,
         |    CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS u
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
         |e5 AS (SELECT doc_a AS a, doc_b AS b FROM pj WHERE i*1000 >= 500*u
         |  UNION ALL SELECT doc_b, doc_a FROM pj WHERE i*1000 >= 500*u),
         |r5(doc, lab) AS (SELECT doc_id, doc_id FROM documents
         |  UNION SELECT e.b, r.lab FROM r5 r JOIN e5 e ON e.a = r.doc),
         |g5 AS (SELECT count(*) AS sz FROM
         |  (SELECT doc, min(lab) AS lab FROM r5 GROUP BY 1) GROUP BY lab),
         |e7 AS (SELECT doc_a AS a, doc_b AS b FROM pj WHERE i*1000 >= 700*u
         |  UNION ALL SELECT doc_b, doc_a FROM pj WHERE i*1000 >= 700*u),
         |r7(doc, lab) AS (SELECT doc_id, doc_id FROM documents
         |  UNION SELECT e.b, r.lab FROM r7 r JOIN e7 e ON e.a = r.doc),
         |g7 AS (SELECT count(*) AS sz FROM
         |  (SELECT doc, min(lab) AS lab FROM r7 GROUP BY 1) GROUP BY lab),
         |e9 AS (SELECT doc_a AS a, doc_b AS b FROM pj WHERE i*1000 >= 900*u
         |  UNION ALL SELECT doc_b, doc_a FROM pj WHERE i*1000 >= 900*u),
         |r9(doc, lab) AS (SELECT doc_id, doc_id FROM documents
         |  UNION SELECT e.b, r.lab FROM r9 r JOIN e9 e ON e.a = r.doc),
         |g9 AS (SELECT count(*) AS sz FROM
         |  (SELECT doc, min(lab) AS lab FROM r9 GROUP BY 1) GROUP BY lab),
         |s AS (
         |  SELECT CAST(500 AS BIGINT) AS threshold_pm,
         |    CAST(coalesce(count(*), 0) AS BIGINT) AS n_multi_clusters,
         |    CAST(coalesce(sum(sz), 0) AS BIGINT) AS n_dup_docs
         |  FROM g5 WHERE sz >= 2
         |  UNION ALL SELECT CAST(700 AS BIGINT),
         |    CAST(coalesce(count(*), 0) AS BIGINT),
         |    CAST(coalesce(sum(sz), 0) AS BIGINT) FROM g7 WHERE sz >= 2
         |  UNION ALL SELECT CAST(900 AS BIGINT),
         |    CAST(coalesce(count(*), 0) AS BIGINT),
         |    CAST(coalesce(sum(sz), 0) AS BIGINT) FROM g9 WHERE sz >= 2)
         |SELECT threshold_pm, n_multi_clusters, n_dup_docs,
         |  n_dup_docs - n_multi_clusters AS n_would_drop
         |FROM s ORDER BY threshold_pm""".stripMargin,

    "pack_efficiency" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start FROM t),
        |p AS (SELECT source, n_tokens,
        |  CAST((tok_start + n_tokens - 1) // 512 AS BIGINT) AS bin_end FROM c),
        |s AS (SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  max(bin_end) + 1 AS n_bins FROM p GROUP BY 1)
        |SELECT source, n_docs, total_tokens, n_bins,
        |  n_bins * 512 AS capacity_tokens,
        |  (n_bins * 512 - total_tokens) * 1000 // (n_bins * 512) AS waste_pm
        |FROM s ORDER BY source""".stripMargin,

    "stream_window_agg" ->
      s"""SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
         |  count(*) AS n, CAST(sum(${cents("value")}) AS BIGINT) AS sum_value_c
         |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "stream_sliding_agg" ->
      s"""WITH e AS (SELECT event_type, epoch_us(ts) AS us,
         |  ${cents("value")} AS v FROM events),
         |w AS (SELECT event_type, v,
         |  (us - us % 900000000) - 900000000 * k AS win_start_us
         |  FROM e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k))
         |SELECT win_start_us, event_type, count(*) AS n,
         |  CAST(sum(v) AS BIGINT) AS sum_value_c
         |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "stream_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |d AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us FROM e),
        |s AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session FROM d),
        |g AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM s)
        |SELECT user_id, session_id, count(*) AS n_events, min(us) AS start_us, max(us) AS end_us
        |FROM g GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "stream_dedup_by_key" ->
      """WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY us, event_id) AS rn FROM e)
        |SELECT user_id, event_type, event_id AS first_event_id, us AS first_us
        |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q1_agg" ->
      s"""WITH l AS (SELECT l_returnflag, l_linestatus,
         |  ${cents("l_quantity")} AS qty_c,
         |  ${cents("l_extendedprice")} AS price_c,
         |  ${cents("l_extendedprice*(1-l_discount)")} AS disc_price_c,
         |  ${cents("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS charge_c,
         |  ${cents("l_discount")} AS disc_c
         |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
         |SELECT l_returnflag, l_linestatus,
         |  CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
         |  CAST(sum(price_c) AS BIGINT) AS sum_base_price_c,
         |  CAST(sum(disc_price_c) AS BIGINT) AS sum_disc_price_c,
         |  CAST(sum(charge_c) AS BIGINT) AS sum_charge_c,
         |  CAST(round(CAST(sum(qty_c) AS DOUBLE)/count(*),0) AS BIGINT) AS avg_qty_c,
         |  CAST(round(CAST(sum(price_c) AS DOUBLE)/count(*),0) AS BIGINT) AS avg_price_c,
         |  CAST(round(CAST(sum(disc_c) AS DOUBLE)/count(*),0) AS BIGINT) AS avg_disc_c,
         |  count(*) AS count_order
         |FROM l GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q3_join_topk" ->
      s"""SELECT l.l_orderkey, epoch_us(o.o_orderdate) AS o_orderdate_us,
         |  CAST(sum(${cents("l.l_extendedprice*(1-l.l_discount)")}) AS BIGINT) AS revenue_c
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |WHERE c.c_mktsegment = 'BUILDING'
         |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1,2 ORDER BY revenue_c DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_multijoin" ->
      s"""SELECT n.n_name,
         |  CAST(sum(${cents("l.l_extendedprice*(1-l.l_discount)")}) AS BIGINT) AS revenue_c,
         |  count(*) AS n_items
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |WHERE r.r_name IN ('ASIA','EUROPE')
         |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
         |GROUP BY 1 ORDER BY revenue_c DESC, n_name""".stripMargin,

    "q_window_topk" ->
      s"""WITH bp AS (SELECT l_suppkey, l_partkey,
         |  CAST(sum(${cents("l_extendedprice*(1-l_discount)")}) AS BIGINT) AS revenue_c
         |  FROM lineitem GROUP BY 1,2),
         |r AS (SELECT *, row_number() OVER (PARTITION BY l_suppkey ORDER BY revenue_c DESC, l_partkey) AS rk FROM bp)
         |SELECT l_suppkey, l_partkey, revenue_c, CAST(rk AS BIGINT) AS rk
         |FROM r WHERE rk <= 3 ORDER BY l_suppkey, rk""".stripMargin,

    "q_topk_native" ->
      s"""WITH bp AS (SELECT l_suppkey, l_partkey,
         |  CAST(sum(${cents("l_extendedprice*(1-l_discount)")}) AS BIGINT) AS revenue_c
         |  FROM lineitem GROUP BY 1,2),
         |r AS (SELECT *, row_number() OVER (PARTITION BY l_suppkey ORDER BY revenue_c DESC, l_partkey) AS rk FROM bp)
         |SELECT l_suppkey, l_partkey, revenue_c, CAST(rk AS BIGINT) AS rk
         |FROM r WHERE rk <= 3 ORDER BY l_suppkey, rk""".stripMargin,

    "q_rollup" ->
      s"""SELECT coalesce(l_returnflag,'ALL') AS returnflag,
         |  coalesce(l_linestatus,'ALL') AS linestatus,
         |  CAST(sum(${cents("l_quantity")}) AS BIGINT) AS sum_qty_c,
         |  CAST(sum(${cents("l_extendedprice")}) AS BIGINT) AS sum_price_c,
         |  count(*) AS n
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY 1,2""".stripMargin,

    "q_cube" ->
      s"""SELECT coalesce(l_returnflag,'ALL') AS returnflag,
         |  coalesce(l_linestatus,'ALL') AS linestatus,
         |  CAST(sum(${cents("l_quantity")}) AS BIGINT) AS sum_qty_c,
         |  count(*) AS n
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY 1,2""".stripMargin,

    "q_conditional_pivot" ->
      s"""SELECT user_id,
         |  CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         |  CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
         |  CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
         |  CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
         |  CAST(sum(CASE WHEN event_type='purchase' THEN ${cents("value")} ELSE 0 END) AS BIGINT) AS purchase_cents,
         |  count(*) AS n_events
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_semi_anti" ->
      """WITH ok AS (SELECT DISTINCT o_custkey FROM orders)
        |SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |  CAST(sum(CASE WHEN ok.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
        |  CAST(sum(CASE WHEN ok.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_without_orders
        |FROM customer c LEFT JOIN ok ON c.c_custkey = ok.o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_asof_join" -> asofOracle,
    "q_asof_left" -> asofLeftOracle,

    "q_asof_nearest" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |  FROM events WHERE event_type IN ('click','purchase')),
        |w AS (SELECT *,
        |  last_value(CASE WHEN event_type='click' THEN event_id END IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS b_id,
        |  last_value(CASE WHEN event_type='click' THEN us END IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS b_us,
        |  first_value(CASE WHEN event_type='click' THEN event_id END IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS f_id,
        |  first_value(CASE WHEN event_type='click' THEN us END IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS f_us
        | FROM ev),
        |p AS (SELECT *, us - b_us AS gap_b, f_us - us AS gap_f,
        |  (f_id IS NULL OR (b_id IS NOT NULL AND us - b_us <= f_us - us)) AS use_back
        |  FROM w WHERE event_type='purchase' AND (b_id IS NOT NULL OR f_id IS NOT NULL))
        |SELECT user_id, event_id AS purchase_id, us AS purchase_us,
        |  CASE WHEN use_back THEN b_id ELSE f_id END AS nearest_click_id,
        |  CASE WHEN use_back THEN b_us ELSE f_us END AS nearest_click_us,
        |  CASE WHEN use_back THEN gap_b ELSE gap_f END AS gap_us,
        |  CASE WHEN use_back THEN 'backward' ELSE 'forward' END AS direction
        |FROM p ORDER BY purchase_id""".stripMargin,
    // the custom physical operator must reproduce the declarative
    // formulation's oracle EXACTLY — same SQL, bit-for-bit
    "q_asof_native" -> asofOracle,

    "q_range_join" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events)
        |SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |  abs(b.us - a.us) AS gap_us
        |FROM ev a JOIN ev b ON a.user_id = b.user_id
        |  AND a.event_id < b.event_id AND abs(b.us - a.us) <= 300000000
        |ORDER BY id_a, id_b""".stripMargin,

    "q_topk_values_agg" ->
      s"""SELECT l_returnflag,
         |  array_to_string((list(DISTINCT ${cents("l_extendedprice")}
         |    ORDER BY ${cents("l_extendedprice")} DESC))[1:5], ',') AS top5_price_c,
         |  count(*) AS n
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS signup_us FROM e WHERE event_type='signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.us) AS click_us FROM e JOIN s1 ON e.user_id = s1.user_id
        |  AND e.us > s1.signup_us WHERE e.event_type='click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.us) AS purchase_us FROM e JOIN s2 ON e.user_id = s2.user_id
        |  AND e.us > s2.click_us WHERE e.event_type='purchase' GROUP BY 1)
        |SELECT (SELECT count(*) FROM s1) AS n_signup,
        |  (SELECT count(*) FROM s2) AS n_signup_click,
        |  (SELECT count(*) FROM s3) AS n_full_funnel""".stripMargin,

    "q_funnel_conversion" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS signup_us FROM e WHERE event_type='signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.us) AS click_us FROM e JOIN s1 ON e.user_id = s1.user_id
        |  AND e.us > s1.signup_us WHERE e.event_type='click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.us) AS purchase_us FROM e JOIN s2 ON e.user_id = s2.user_id
        |  AND e.us > s2.click_us WHERE e.event_type='purchase' GROUP BY 1),
        |c AS (SELECT (SELECT count(*) FROM s1) AS n_signup,
        |  (SELECT count(*) FROM s2) AS n_signup_click,
        |  (SELECT count(*) FROM s3) AS n_full_funnel)
        |SELECT n_signup, n_signup_click, n_full_funnel,
        |  n_signup_click * 1000 // n_signup AS click_conv_pm,
        |  n_full_funnel * 1000 // greatest(n_signup_click, 1) AS purchase_conv_pm,
        |  n_full_funnel * 1000 // n_signup AS overall_conv_pm
        |FROM c""".stripMargin,

    "text_seqlen_histogram" ->
      """WITH t AS (SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
        |  FROM documents)
        |SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS log2_bucket,
        |  count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS total_tokens,
        |  min(n) AS min_tokens, max(n) AS max_tokens
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_histogram" ->
      """SELECT event_type, least(CAST(floor(value/50) AS BIGINT), 9) AS bucket, count(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q_salted_agg" ->
      s"""SELECT event_type, count(*) AS n,
         |  CAST(sum(${cents("value")}) AS BIGINT) AS sum_value_c
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "ts_gap_fill" ->
      """WITH ev AS (SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hour_us FROM events),
        |c AS (SELECT event_type, hour_us, count(*) AS n FROM ev GROUP BY 1, 2),
        |sp AS (SELECT event_type, unnest(generate_series(lo, hi, 3600000000)) AS hour_us
        |  FROM (SELECT event_type, min(hour_us) AS lo, max(hour_us) AS hi FROM ev GROUP BY 1))
        |SELECT sp.event_type, sp.hour_us, coalesce(c.n, 0) AS n
        |FROM sp LEFT JOIN c ON sp.event_type = c.event_type AND sp.hour_us = c.hour_us
        |ORDER BY sp.event_type, sp.hour_us""".stripMargin,

    "ts_anomaly" ->
      """WITH ev AS (SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hour_us FROM events),
        |c AS (SELECT event_type, hour_us, count(*) AS n FROM ev GROUP BY 1, 2),
        |sp AS (SELECT event_type, unnest(generate_series(lo, hi, 3600000000)) AS hour_us
        |  FROM (SELECT event_type, min(hour_us) AS lo, max(hour_us) AS hi FROM ev GROUP BY 1)),
        |g AS (SELECT sp.event_type, sp.hour_us, coalesce(c.n, 0) AS n
        |  FROM sp LEFT JOIN c ON sp.event_type = c.event_type AND sp.hour_us = c.hour_us),
        |f AS (SELECT event_type, hour_us, n,
        |  coalesce(CAST(sum(n) OVER tw AS BIGINT), 0) AS sum_w,
        |  count(n) OVER tw AS n_w
        |  FROM g WINDOW tw AS (PARTITION BY event_type ORDER BY hour_us
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hour_us, n, sum_w, n_w FROM f
        |WHERE n_w >= 12 AND n >= 5 AND n * n_w > 3 * sum_w
        |ORDER BY event_type, hour_us""".stripMargin,

    "ts_retention" ->
      """WITH act AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
        |coh AS (SELECT user_id, min(week) AS cohort_week FROM act GROUP BY 1)
        |SELECT coh.cohort_week, act.week - coh.cohort_week AS week_offset,
        |  count(*) AS n_active_users
        |FROM act JOIN coh USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "ts_ewma" ->
      """WITH RECURSIVE ev AS (SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hour_us FROM events),
        |c AS (SELECT event_type, hour_us, count(*) AS n FROM ev GROUP BY 1, 2),
        |sp AS (SELECT event_type, unnest(generate_series(lo, hi, 3600000000)) AS hour_us
        |  FROM (SELECT event_type, min(hour_us) AS lo, max(hour_us) AS hi FROM ev GROUP BY 1)),
        |g AS (SELECT sp.event_type, sp.hour_us, coalesce(c.n, 0) AS n,
        |  ROW_NUMBER() OVER (PARTITION BY sp.event_type ORDER BY sp.hour_us) AS rn
        |  FROM sp LEFT JOIN c ON sp.event_type = c.event_type AND sp.hour_us = c.hour_us),
        |r AS (
        |  SELECT event_type, rn, hour_us, n, 1000 * n AS ewma_milli FROM g WHERE rn = 1
        |  UNION ALL
        |  SELECT g.event_type, g.rn, g.hour_us, g.n,
        |    (7 * r.ewma_milli + 1000 * g.n) // 8
        |  FROM r JOIN g ON g.event_type = r.event_type AND g.rn = r.rn + 1)
        |SELECT event_type, hour_us, n, ewma_milli FROM r
        |ORDER BY event_type, hour_us""".stripMargin,

    "ts_downsample" ->
      """WITH ev AS (SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hour_us FROM events),
        |c AS (SELECT event_type, hour_us, count(*) AS n FROM ev GROUP BY 1, 2),
        |sp AS (SELECT event_type, unnest(generate_series(lo, hi, 3600000000)) AS hour_us
        |  FROM (SELECT event_type, min(hour_us) AS lo, max(hour_us) AS hi FROM ev GROUP BY 1)),
        |g AS (SELECT sp.event_type, sp.hour_us, coalesce(c.n, 0) AS n
        |  FROM sp LEFT JOIN c ON sp.event_type = c.event_type AND sp.hour_us = c.hour_us),
        |a AS (SELECT event_type, hour_us, n,
        |  abs(coalesce(lag(n) OVER w, 0) + coalesce(lead(n) OVER w, 0) - 2 * n) AS area2,
        |  (hour_us - min(hour_us) OVER (PARTITION BY event_type)) // 3600000000 // 24 AS bucket
        |  FROM g WINDOW w AS (PARTITION BY event_type ORDER BY hour_us)),
        |r AS (SELECT event_type, bucket, hour_us, n, area2,
        |  count(*) OVER (PARTITION BY event_type, bucket) AS n_hours_in_bucket,
        |  ROW_NUMBER() OVER (PARTITION BY event_type, bucket
        |    ORDER BY area2 DESC, hour_us ASC) AS rk
        |  FROM a)
        |SELECT event_type, bucket, hour_us AS sel_hour_us, n AS sel_n, area2,
        |  n_hours_in_bucket
        |FROM r WHERE rk = 1 ORDER BY event_type, bucket""".stripMargin,

    "ts_changepoint" ->
      """WITH ev AS (SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hour_us FROM events),
        |c AS (SELECT event_type, hour_us, count(*) AS n FROM ev GROUP BY 1, 2),
        |sp AS (SELECT event_type, unnest(generate_series(lo, hi, 3600000000)) AS hour_us
        |  FROM (SELECT event_type, min(hour_us) AS lo, max(hour_us) AS hi FROM ev GROUP BY 1)),
        |g AS (SELECT sp.event_type, sp.hour_us, coalesce(c.n, 0) AS n
        |  FROM sp LEFT JOIN c ON sp.event_type = c.event_type AND sp.hour_us = c.hour_us),
        |t AS (SELECT event_type, count(*) AS t_hours, CAST(sum(n) AS BIGINT) AS s_total,
        |  min(hour_us) AS lo FROM g GROUP BY 1),
        |p AS (SELECT g.event_type, g.hour_us, g.n,
        |  CAST(sum(g.n) OVER (PARTITION BY g.event_type ORDER BY g.hour_us) AS BIGINT) AS p,
        |  (g.hour_us - t.lo) // 3600000000 + 1 AS t_idx, t.t_hours, t.s_total
        |  FROM g JOIN t ON g.event_type = t.event_type)
        |SELECT event_type, hour_us AS cp_hour_us, t_idx AS cp_idx,
        |  abs(t_hours * p - t_idx * s_total) AS cusum_abs,
        |  1000 * p // t_idx AS mean_before_milli,
        |  CASE WHEN t_idx < t_hours
        |    THEN 1000 * (s_total - p) // (t_hours - t_idx) END AS mean_after_milli,
        |  t_hours AS n_hours
        |FROM p
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
        |  ORDER BY abs(t_hours * p - t_idx * s_total) DESC, t_idx ASC) = 1
        |ORDER BY event_type""".stripMargin,

    "ts_running_total" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
         |  ${cents("value")} AS value_c FROM events),
         |r AS (SELECT user_id, event_id, us, value_c,
         |  CAST(sum(value_c) OVER (PARTITION BY user_id ORDER BY us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c,
         |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS seq_n,
         |  row_number() OVER (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS from_end
         |  FROM e)
         |SELECT user_id, seq_n, event_id, value_c, running_c
         |FROM r WHERE from_end <= 5 ORDER BY user_id, seq_n""".stripMargin,

    // the salted join is result-identical to the plain dim join
    "q_skew_join_salted" ->
      s"""WITH dim AS (SELECT event_type, CAST(length(event_type) AS BIGINT) AS type_weight
         |  FROM (SELECT DISTINCT event_type FROM events))
         |SELECT e.event_type, count(*) AS n,
         |  CAST(sum(${cents("e.value")} * dim.type_weight) AS BIGINT) AS weighted_cents
         |FROM events e JOIN dim USING (event_type)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_exists_subquery" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT p.p_brand, count(*) AS n_small,
        |  CAST(sum(CAST(round(l1.l_extendedprice*100, 0) AS BIGINT)) AS BIGINT) AS sum_price_c
        |FROM lineitem l1 JOIN part p ON p.p_partkey = l1.l_partkey
        |WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |  AND CAST(round(l1.l_quantity*100, 0) AS BIGINT) * 5 *
        |      (SELECT count(*) FROM lineitem l2
        |       WHERE l2.l_partkey = l1.l_partkey)
        |    < (SELECT CAST(sum(CAST(round(l3.l_quantity*100, 0) AS BIGINT)) AS BIGINT)
        |       FROM lineitem l3 WHERE l3.l_partkey = l1.l_partkey)
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin,

    "q_pivot_native" ->
      s"""SELECT user_id,
         |  CAST(coalesce(sum(CASE WHEN event_type='click' THEN ${cents("value")} END), 0) AS BIGINT) AS click_c,
         |  CAST(coalesce(sum(CASE WHEN event_type='view' THEN ${cents("value")} END), 0) AS BIGINT) AS view_c,
         |  CAST(coalesce(sum(CASE WHEN event_type='signup' THEN ${cents("value")} END), 0) AS BIGINT) AS signup_c,
         |  CAST(coalesce(sum(CASE WHEN event_type='error' THEN ${cents("value")} END), 0) AS BIGINT) AS error_c,
         |  CAST(coalesce(sum(CASE WHEN event_type='purchase' THEN ${cents("value")} END), 0) AS BIGINT) AS purchase_c
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "ts_ohlc" ->
      s"""WITH e AS (SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hour_us,
         |  epoch_us(ts) AS us, event_id, ${cents("value")} AS value_c FROM events),
         |r AS (SELECT *,
         |  row_number() OVER (PARTITION BY event_type, hour_us ORDER BY us, event_id) AS rn_a,
         |  row_number() OVER (PARTITION BY event_type, hour_us ORDER BY us DESC, event_id DESC) AS rn_d
         |  FROM e)
         |SELECT event_type, hour_us,
         |  max(CASE WHEN rn_a = 1 THEN value_c END) AS open_c,
         |  max(value_c) AS high_c, min(value_c) AS low_c,
         |  max(CASE WHEN rn_d = 1 THEN value_c END) AS close_c,
         |  count(*) AS n, CAST(sum(value_c) AS BIGINT) AS volume_c
         |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_intersect_except" ->
      """WITH c96 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
        |c97 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM c96 INTERSECT SELECT * FROM c97)
        |UNION ALL
        |SELECT o_custkey, 'only_1996' AS tag FROM (SELECT * FROM c96 EXCEPT SELECT * FROM c97)
        |ORDER BY tag, o_custkey""".stripMargin,

    "q_ntile_decile" ->
      s"""WITH h AS (SELECT event_type, ${cents("value")} AS value_c, count(*) AS cnt
         |  FROM events GROUP BY 1, 2),
         |r AS (SELECT event_type, value_c, cnt,
         |  sum(cnt) OVER (PARTITION BY event_type ORDER BY value_c) - cnt AS cum_before,
         |  sum(cnt) OVER (PARTITION BY event_type) AS n_grp
         |  FROM h)
         |SELECT event_type, CAST(1 + (10 * cum_before) // n_grp AS BIGINT) AS decile,
         |  CAST(sum(cnt) AS BIGINT) AS n, min(value_c) AS lo_c, max(value_c) AS hi_c
         |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_corr_moments" ->
      s"""WITH e AS (SELECT event_type, ${cents("value")} AS x,
         |  CAST(hour(ts) AS BIGINT) AS y FROM events),
         |m AS (SELECT event_type, count(*) AS n,
         |  CAST(sum(x) // count(*) AS BIGINT) AS mx,
         |  CAST(sum(y) // count(*) AS BIGINT) AS my
         |  FROM e GROUP BY 1)
         |SELECT e.event_type, m.n, m.mx AS mean_x_c, m.my AS mean_y,
         |  CAST(sum((x - mx) * (x - mx)) AS BIGINT) AS m2x,
         |  CAST(sum((y - my) * (y - my)) AS BIGINT) AS m2y,
         |  CAST(sum((x - mx) * (y - my)) AS BIGINT) AS mxy
         |FROM e JOIN m USING (event_type)
         |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,

    // the Spark side counts via bitmap OR-aggregation; the oracle is
    // the plain exact distinct — identical integers prove the bitmap
    // path exact
    "q_bitmap_distinct" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_string_agg" ->
      """SELECT n_name, count(*) AS n_customers,
        |  string_agg(c_name, '|' ORDER BY c_name) AS roster
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "stream_session_native" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |d AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us FROM e),
        |s AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session FROM d),
        |g AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM s)
        |SELECT user_id, session_id, count(*) AS n_events, min(us) AS start_us, max(us) AS end_us
        |FROM g GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q_quantiles" ->
      """SELECT l_returnflag,
        |  CAST(round(quantile_cont(l_extendedprice, 0.5)*100, 0) AS BIGINT) AS p50_price_c,
        |  CAST(round(quantile_cont(l_extendedprice, 0.9)*100, 0) AS BIGINT) AS p90_price_c,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // the distributed-exact variant computes the very same number
    "q_quantiles_sortrank" ->
      """SELECT l_returnflag,
        |  CAST(round(quantile_cont(l_extendedprice, 0.5)*100, 0) AS BIGINT) AS p50_price_c,
        |  CAST(round(quantile_cont(l_extendedprice, 0.9)*100, 0) AS BIGINT) AS p90_price_c,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS canonical_doc_id, count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_exact_normalized" ->
      """WITH d AS (SELECT doc_id,
        |  md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
        |    '\s+', ' ', 'g')) AS norm_hash,
        |  md5(text) AS raw_hash FROM documents)
        |SELECT norm_hash, min(doc_id) AS canonical_doc_id, count(*) AS n_dups,
        |  CAST(count(DISTINCT raw_hash) AS BIGINT) AS n_raw_variants
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_incremental" ->
      """WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
        |ex AS (SELECT h, min(doc_id) AS canonical FROM d WHERE doc_id % 5 <> 4 GROUP BY h)
        |SELECT d.doc_id,
        |  CAST(CASE WHEN ex.canonical IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dup,
        |  COALESCE(ex.canonical, -1) AS canonical_doc_id
        |FROM d LEFT JOIN ex USING (h) WHERE d.doc_id % 5 = 4
        |ORDER BY d.doc_id""".stripMargin,

    // Bloom pre-filter + exact verify ≡ the exact incremental result
    // (false positives are re-verified by the hash join, false
    // negatives are impossible) — so the oracle is the same query.
    "dedup_incremental_bloom" ->
      """WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
        |ex AS (SELECT h, min(doc_id) AS canonical FROM d WHERE doc_id % 5 <> 4 GROUP BY h)
        |SELECT d.doc_id,
        |  CAST(CASE WHEN ex.canonical IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dup,
        |  COALESCE(ex.canonical, -1) AS canonical_doc_id
        |FROM d LEFT JOIN ex USING (h) WHERE d.doc_id % 5 = 4
        |ORDER BY d.doc_id""".stripMargin,

    "cdc_resolved_gaps" ->
      """WITH rs AS (SELECT DISTINCT
        |  epoch_us(ts) - epoch_us(ts) % 600000000 + 600000000 AS sort_us
        |  FROM events),
        |g AS (SELECT sort_us,
        |  lag(sort_us, 1) OVER (ORDER BY sort_us) AS prev_us FROM rs)
        |SELECT prev_us, sort_us AS next_us, sort_us - prev_us AS gap_us,
        |  (sort_us - prev_us) // 600000000 - 1 AS missed_ticks
        |FROM g WHERE prev_us IS NOT NULL AND sort_us - prev_us > 600000000
        |ORDER BY prev_us""".stripMargin,
    "cdc_snapshot_diff" ->
      s"""WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
         |  ${cents("value")} AS value_cents FROM events),
         |cut AS (SELECT (min(us) + max(us)) // 2 AS cut FROM e),
         |b AS (SELECT user_id, event_type, event_id AS b_event_id,
         |  value_cents AS b_value_cents FROM (
         |    SELECT *, row_number() OVER (PARTITION BY user_id, event_type
         |      ORDER BY us DESC, event_id DESC) AS rn FROM e)
         |  WHERE rn = 1),
         |a AS (SELECT user_id, event_type, event_id AS a_event_id,
         |  value_cents AS a_value_cents FROM (
         |    SELECT e.*, row_number() OVER (PARTITION BY user_id, event_type
         |      ORDER BY us DESC, event_id DESC) AS rn
         |    FROM e, cut WHERE e.us <= cut.cut)
         |  WHERE rn = 1),
         |d AS (SELECT coalesce(b.user_id, a.user_id) AS user_id,
         |  coalesce(b.event_type, a.event_type) AS event_type,
         |  CASE WHEN a_event_id IS NULL THEN 'added'
         |       WHEN b_event_id IS NULL THEN 'removed'
         |       WHEN a_event_id <> b_event_id
         |            OR a_value_cents <> b_value_cents THEN 'changed'
         |       ELSE 'same' END AS status,
         |  a_event_id, a_value_cents, b_event_id, b_value_cents
         |  FROM b FULL OUTER JOIN a
         |    ON b.user_id = a.user_id AND b.event_type = a.event_type)
         |SELECT * FROM d WHERE status <> 'same'
         |ORDER BY user_id, event_type""".stripMargin,
    "cdc_dlq" ->
      s"""WITH $chCte,
         |w AS (SELECT event_id,
         |  CASE WHEN event_id % 97 = 0 THEN substr(value, 1, length(value) - 3)
         |       ELSE value END AS wire
         |  FROM ch),
         |c AS (SELECT event_id % 32 AS part_id, event_id,
         |  CASE WHEN json_valid(wire)
         |       THEN json_extract_string(wire, '$$.after.event_id') IS NOT NULL
         |       ELSE false END AS ok
         |  FROM w)
         |SELECT part_id,
         |  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
         |  CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_dlq,
         |  min(CASE WHEN NOT ok THEN event_id END) AS first_bad_event_id
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_bigram_lm" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |p AS (SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i+1] AS bg
        |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-1)) AS i
        |        FROM t WHERE len(toks) >= 2)),
        |u AS (SELECT w1, count(*) AS n1 FROM (SELECT unnest(toks) AS w1 FROM t) GROUP BY 1),
        |b AS (SELECT bg, count(*) AS n2 FROM p GROUP BY 1),
        |s AS (SELECT doc_id, (1000000 * n2) // n1 AS score
        |  FROM p JOIN b USING (bg) JOIN u USING (w1))
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(score) // count(*) AS BIGINT) AS coherence_ppm
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_perplexity" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |p AS (SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i+1] AS bg
        |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-1)) AS i
        |        FROM t WHERE len(toks) >= 2)),
        |u AS (SELECT w1, count(*) AS n1 FROM (SELECT unnest(toks) AS w1 FROM t) GROUP BY 1),
        |b AS (SELECT bg, count(*) AS n2 FROM p GROUP BY 1),
        |s AS (SELECT doc_id,
        |    length(bin(least(n1 // n2, 2147483647) * least(n1 // n2, 2147483647))) - 1 AS hb
        |  FROM p JOIN b USING (bg) JOIN u USING (w1))
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST((500 * sum(hb)) // count(*) AS BIGINT) AS ppl_millibits
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_token_entropy" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
        |w AS (SELECT doc_id, c,
        |    CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n FROM c),
        |s AS (SELECT doc_id, c, n,
        |    length(bin(least(n // c, 2147483647) * least(n // c, 2147483647))) - 1 AS hb
        |  FROM w)
        |SELECT doc_id, max(n) AS n_tokens, count(*) AS n_distinct,
        |  CAST((500 * sum(c * hb)) // max(n) AS BIGINT) AS entropy_millibits
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_mode" ->
      s"""WITH c AS (SELECT event_type, ${cents("value")} AS v_c, count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |r AS (SELECT *, row_number() OVER (
         |  PARTITION BY event_type ORDER BY n DESC, v_c ASC) AS rn FROM c)
         |SELECT event_type, v_c AS mode_c, n AS mode_n
         |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "q_grouping_sets" ->
      s"""SELECT CAST(grouping(l_returnflag)*2 + grouping(l_linestatus) AS BIGINT) AS gid,
         |  coalesce(l_returnflag, 'ALL') AS returnflag,
         |  coalesce(l_linestatus, 'ALL') AS linestatus,
         |  CAST(sum(${cents("l_quantity")}) AS BIGINT) AS sum_qty_c, count(*) AS n
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY 1, 2, 3""".stripMargin,
    "layout_zorder" ->
      s"""WITH b AS (SELECT user_id % 1024 AS x,
         |  (epoch_us(date_trunc('hour', ts)) // 3600000000) % 1024 AS y FROM events),
         |z AS (SELECT x, y, ${graft.operators.Layout.zorderOracleExpr} AS z FROM b)
         |SELECT z // 16384 AS file_id, count(*) AS n,
         |  min(x) AS x_lo, max(x) AS x_hi, min(y) AS y_lo, max(y) AS y_hi,
         |  min(z) AS z_lo, max(z) AS z_hi
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    "layout_hilbert" ->
      s"""WITH ${graft.operators.Layout.hilbertOracleCtes(
        """SELECT user_id % 1024 AS x0,
          |  (epoch_us(date_trunc('hour', ts)) // 3600000000) % 1024 AS y0,
          |  user_id % 1024 AS x,
          |  (epoch_us(date_trunc('hour', ts)) // 3600000000) % 1024 AS y,
          |  CAST(0 AS BIGINT) AS d FROM events""".stripMargin)}
         |SELECT d // 16384 AS file_id, count(*) AS n,
         |  min(x0) AS x_lo, max(x0) AS x_hi, min(y0) AS y_lo, max(y0) AS y_hi,
         |  min(d) AS d_lo, max(d) AS d_hi
         |FROM h10 GROUP BY 1 ORDER BY 1""".stripMargin,
    "layout_prune_compare" ->
      s"""WITH ${graft.operators.Layout.hilbertOracleCtes(
        """SELECT user_id % 1024 AS x0,
          |  (epoch_us(date_trunc('hour', ts)) // 3600000000) % 1024 AS y0,
          |  user_id % 1024 AS x,
          |  (epoch_us(date_trunc('hour', ts)) // 3600000000) % 1024 AS y,
          |  CAST(0 AS BIGINT) AS d FROM events""".stripMargin)},
         |p0 AS (SELECT x0, y0, d, x0 AS x, y0 AS y FROM h10),
         |pts AS (SELECT x0, y0, d, ${graft.operators.Layout.zorderOracleExpr} AS z FROM p0),
         |st AS (SELECT layout, file_id, count(*) AS n,
         |    min(x0) AS x_lo, max(x0) AS x_hi, min(y0) AS y_lo, max(y0) AS y_hi
         |  FROM (SELECT unnest(['x_sort', 'y_sort', 'zorder', 'hilbert']) AS layout,
         |      unnest([x0 // 16, y0 // 16, z // 16384, d // 16384]) AS file_id, x0, y0
         |    FROM pts)
         |  GROUP BY 1, 2),
         |pb AS (SELECT * FROM (VALUES ${graft.operators.Layout.probesOracleValues})
         |  AS t(kind, probe_id, px_lo, px_hi, py_lo, py_hi))
         |SELECT layout, kind, CAST(probe_id AS BIGINT) AS probe_id,
         |  CAST(sum(CASE WHEN x_lo <= px_hi AND x_hi >= px_lo
         |    AND y_lo <= py_hi AND y_hi >= py_lo THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
         |  CAST(sum(CASE WHEN x_lo <= px_hi AND x_hi >= px_lo
         |    AND y_lo <= py_hi AND y_hi >= py_lo THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
         |  CAST(count(*) AS BIGINT) AS files_total
         |FROM st CROSS JOIN pb
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_countmin_err" -> {
      val perm = (0 until graft.operators.Analytics.cmDepth)
        .map(j => s"($j, ${graft.functions.Fns.minhashA(j)}, ${graft.functions.Fns.minhashB(j)})")
        .mkString(", ")
      val w = graft.operators.Analytics.cmWidth
      s"""WITH e AS (SELECT user_id,
         |  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2147483648 AS h
         |  FROM events),
         |p AS (SELECT * FROM (VALUES $perm) p(j, a, b)),
         |cj AS (SELECT j, ((a * h + b) % 2147483647) % $w AS cell, count(*) AS n
         |  FROM e CROSS JOIN p GROUP BY 1, 2),
         |ex AS (SELECT user_id, count(*) AS exact_n FROM events GROUP BY 1),
         |pr AS (SELECT user_id, exact_n FROM (SELECT *,
         |    row_number() OVER (ORDER BY exact_n DESC, user_id) AS rn FROM ex)
         |  WHERE rn <= 20),
         |pc AS (SELECT pr.user_id, pr.exact_n, p.j,
         |    ((p.a * e2.h + p.b) % 2147483647) % $w AS cell
         |  FROM pr JOIN (SELECT DISTINCT user_id, h FROM e) e2 USING (user_id)
         |  CROSS JOIN p)
         |SELECT user_id, exact_n, CAST(min(n) AS BIGINT) AS est_n,
         |  CAST(min(n) - exact_n AS BIGINT) AS overest_n
         |FROM pc JOIN cj USING (j, cell)
         |GROUP BY 1, 2 ORDER BY user_id""".stripMargin
    },

    "q_kmv_jaccard" ->
      s"""WITH t AS (SELECT source, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
         |du AS (SELECT DISTINCT source,
         |  ('0x' || substr(md5(array_to_string(toks[i:i+2], ' ')), 1, 15))::BIGINT % 2147483648 AS h
         |  FROM (SELECT source, toks,
         |    unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS i FROM t)),
         |sk AS (SELECT source, h FROM (SELECT source, h,
         |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM du)
         |  WHERE rn <= ${graft.operators.Analytics.kmvK}),
         |ty AS (SELECT DISTINCT source FROM sk),
         |pr AS (SELECT a.source AS src_a, b.source AS src_b
         |  FROM ty a JOIN ty b ON a.source < b.source),
         |u AS (SELECT src_a, src_b, h,
         |    max(CASE WHEN s.source = src_a THEN 1 ELSE 0 END) AS in_a,
         |    max(CASE WHEN s.source = src_b THEN 1 ELSE 0 END) AS in_b
         |  FROM pr JOIN sk s ON s.source = src_a OR s.source = src_b
         |  GROUP BY 1, 2, 3),
         |uk AS (SELECT * FROM (SELECT u.*,
         |    row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn FROM u)
         |  WHERE rn <= ${graft.operators.Analytics.kmvK})
         |SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS k_used,
         |  CAST(sum(in_a * in_b) AS BIGINT) AS n_common,
         |  CAST(1000 * sum(in_a * in_b) // count(*) AS BIGINT) AS jaccard_pm,
         |  CAST(((count(*) - 1) * 2147483648) // greatest(max(h), 1) AS BIGINT) AS union_est
         |FROM uk GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "cdc_schema_drift" ->
      s"""WITH $chCte,
         |k AS (SELECT tbl, sort_us, unnest(json_keys(value, '$$.after')) AS key FROM ch),
         |inv AS (SELECT tbl, key, count(*) AS n,
         |  min(sort_us) AS first_seen_us, max(sort_us) AS last_seen_us
         |  FROM k GROUP BY 1, 2),
         |b AS (SELECT tbl, min(sort_us) AS t_lo, max(sort_us) AS t_hi FROM ch GROUP BY 1)
         |SELECT inv.tbl, key, n, first_seen_us, last_seen_us,
         |  CASE WHEN first_seen_us > t_lo THEN 'added'
         |       WHEN last_seen_us < t_hi THEN 'removed'
         |       ELSE 'stable' END AS status
         |FROM inv JOIN b ON inv.tbl = b.tbl
         |ORDER BY inv.tbl, key""".stripMargin,
    "ts_lateness" ->
      """WITH l AS (SELECT event_type,
        |  max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - epoch_us(ts) AS late_us
        |  FROM events)
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN late_us = 0 THEN 1 ELSE 0 END) AS BIGINT) AS on_time,
        |  CAST(sum(CASE WHEN late_us > 0 AND late_us <= 60000000 THEN 1 ELSE 0 END) AS BIGINT) AS late_1m,
        |  CAST(sum(CASE WHEN late_us > 60000000 AND late_us <= 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS late_1h,
        |  CAST(sum(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS late_more,
        |  max(late_us) AS max_late_us
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,

    // OLS sufficient statistics summed as exact integers on both
    // engines; slope/intercept/forecast are each ONE rounded division
    // of identical longs — no float-accumulation seam (deliberately
    // NOT regr_slope, whose double accumulation order differs between
    // a partial-agg engine and a sequential one)
    "ts_trend" ->
      """WITH c AS (SELECT event_type,
        |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS h, count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT min(h) AS h0 FROM c),
        |s AS (SELECT event_type, count(*) AS n, sum(h - h0) AS sx,
        |  sum(y) AS sy, sum((h - h0) * y) AS sxy,
        |  sum((h - h0) * (h - h0)) AS sxx, max(h - h0) AS xmax
        |  FROM c CROSS JOIN m GROUP BY 1 HAVING count(*) >= 2)
        |SELECT event_type, n AS n_hours,
        |  CAST(round(1000000.0 * (n*sxy - sx*sy) / (n*sxx - sx*sx), 0) AS BIGINT) AS slope_e6,
        |  CAST(round(1000.0 * (sy*sxx - sx*sxy) / (n*sxx - sx*sx), 0) AS BIGINT) AS intercept_e3,
        |  CAST(round(1000.0 * (sy*sxx - sx*sxy + (n*sxy - sx*sy) * (xmax + 1)) / (n*sxx - sx*sx), 0) AS BIGINT) AS forecast_next_e3
        |FROM s ORDER BY event_type""".stripMargin,

    "ts_cohort_matrix" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |  epoch_us(ts) // 604800000000 AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY 1),
        |sz AS (SELECT cohort_wk, count(*) AS cohort_size FROM c GROUP BY 1),
        |m AS (SELECT c.cohort_wk, uw.wk - c.cohort_wk AS week_offset,
        |  count(*) AS n_active
        |  FROM uw JOIN c ON uw.user_id = c.user_id GROUP BY 1, 2)
        |SELECT m.cohort_wk, m.week_offset, m.n_active, sz.cohort_size,
        |  m.n_active * 1000 // sz.cohort_size AS retention_pm
        |FROM m JOIN sz ON m.cohort_wk = sz.cohort_wk
        |ORDER BY 1, 2""".stripMargin,

    // trailing-7d distinct via forward 7x explode of the (user, day)
    // distinct frame — identical integer logic both engines
    "ts_dau_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |  epoch_us(ts) // 86400000000 AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
        |wau AS (SELECT wday AS day, count(*) AS wau FROM
        |  (SELECT DISTINCT user_id, unnest(generate_series(day, day + 6)) AS wday
        |   FROM ud) GROUP BY 1)
        |SELECT dau.day, dau.dau, wau.wau,
        |  dau.dau * 1000 // wau.wau AS stickiness_pm
        |FROM dau JOIN wau ON dau.day = wau.day
        |ORDER BY dau.day""".stripMargin,

    // greedy earliest-chain with a per-step 24h deadline — identical
    // join-with-window construction on both engines
    "q_funnel_windowed" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t1 FROM e
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.us) AS t2 FROM e JOIN s1
        |  ON e.user_id = s1.user_id AND e.us > s1.t1
        |  AND e.us <= s1.t1 + 86400000000
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.us) AS t3 FROM e JOIN s2
        |  ON e.user_id = s2.user_id AND e.us > s2.t2
        |  AND e.us <= s2.t2 + 86400000000
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT (SELECT count(*) FROM s1) AS n_signup,
        |  (SELECT count(*) FROM s2) AS n_click_in_window,
        |  (SELECT count(*) FROM s3) AS n_purchase_in_window,
        |  (SELECT count(*) FROM s2) * 1000 // (SELECT count(*) FROM s1) AS click_conv_pm,
        |  (SELECT count(*) FROM s3) * 1000 // greatest((SELECT count(*) FROM s2), 1) AS purchase_conv_pm""".stripMargin,

    // users collapse to a spend histogram before the one global
    // window, so the window frame is |distinct spend values|; lift is
    // integer end-to-end (rate_pm then rate*1000 div overall)
    "q_decile_lift" ->
      s"""WITH u AS (SELECT user_id,
         |  CAST(sum(${cents("value")}) AS BIGINT) AS spend_c,
         |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
         |  FROM events GROUP BY 1),
         |h AS (SELECT spend_c, count(*) AS n_u,
         |  CAST(sum(converted) AS BIGINT) AS n_conv FROM u GROUP BY 1),
         |d AS (SELECT *,
         |  sum(n_u) OVER (ORDER BY spend_c) AS cum,
         |  sum(n_u) OVER () AS n_tot FROM h),
         |g AS (SELECT CAST(1 + (10 * (cum - n_u)) // n_tot AS BIGINT) AS decile,
         |  sum(n_u) AS n_users, sum(n_conv) AS n_converted
         |  FROM d GROUP BY 1),
         |o AS (SELECT CAST(sum(converted) AS BIGINT) * 1000 // count(*)
         |  AS overall_conv_pm FROM u)
         |SELECT decile, CAST(n_users AS BIGINT) AS n_users,
         |  CAST(n_converted AS BIGINT) AS n_converted,
         |  CAST(n_converted * 1000 // n_users AS BIGINT) AS conv_pm,
         |  CAST((n_converted * 1000 // n_users) * 1000
         |    // greatest(overall_conv_pm, 1) AS BIGINT) AS lift_pm
         |FROM g CROSS JOIN o ORDER BY decile""".stripMargin,
    "ts_interpolate" ->
      s"""WITH ev AS (SELECT event_type, epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
         |  ${cents("value")} AS v_c FROM events),
         |o AS (SELECT event_type, h, count(*) AS n, CAST(sum(v_c) AS BIGINT) AS sum_c
         |  FROM ev GROUP BY 1, 2),
         |sp AS (SELECT event_type, unnest(generate_series(lo, hi)) AS h
         |  FROM (SELECT event_type, min(h) AS lo, max(h) AS hi FROM ev GROUP BY 1)),
         |g AS (SELECT sp.event_type, sp.h, coalesce(o.n, 0) AS n, o.sum_c
         |  FROM sp LEFT JOIN o ON sp.event_type = o.event_type AND sp.h = o.h),
         |f AS (SELECT event_type, h, n, sum_c,
         |  last_value(CASE WHEN n > 0 THEN h END IGNORE NULLS) OVER wb AS ph,
         |  last_value(sum_c IGNORE NULLS) OVER wb AS pv,
         |  first_value(CASE WHEN n > 0 THEN h END IGNORE NULLS) OVER wa AS nh,
         |  first_value(sum_c IGNORE NULLS) OVER wa AS nv
         |  FROM g WINDOW
         |    wb AS (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |    wa AS (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
         |SELECT event_type, h AS hour_idx, n,
         |  CASE WHEN n > 0 THEN sum_c
         |       WHEN ph IS NOT NULL AND nh IS NOT NULL
         |         THEN (pv * (nh - h) + nv * (h - ph)) // (nh - ph) END AS filled_c,
         |  CASE WHEN n > 0 THEN 'obs'
         |       WHEN ph IS NOT NULL AND nh IS NOT NULL THEN 'interp'
         |       ELSE 'edge' END AS src
         |FROM f ORDER BY event_type, hour_idx""".stripMargin,
    "sample_split" ->
      """WITH b AS (SELECT source,
        |  (doc_id % 1000000007) * 2654435761 % 1000000007 % 1000 AS bucket
        |  FROM documents),
        |s AS (SELECT source, bucket,
        |  CASE WHEN bucket < 900 THEN 'train'
        |       WHEN bucket < 950 THEN 'val' ELSE 'test' END AS split
        |  FROM b)
        |SELECT source, split, count(*) AS n,
        |  min(bucket) AS bucket_lo, max(bucket) AS bucket_hi
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // same quality formula as text_quality's oracle; the cap is a
    // per-source quality-ranked row_number (the TopKPerKey semantics:
    // quality DESC, doc_id ASC)
    "sample_cap_per_source" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(round(len(regexp_extract_all(text, '[^a-z0-9\s]')) * 1.0 / greatest(length(text),1) * 1000, 0) AS BIGINT) AS punct_pm,
        |  CAST(round(len(list_filter(toks, tk -> list_contains(['the','a','of','and','to','in','is','it','for','on'], tk))) * 1.0 / greatest(len(toks),1) * 1000, 0) AS BIGINT) AS stopword_pm,
        |  CAST(round(len(list_distinct(toks)) * 1.0 / greatest(len(toks),1) * 1000, 0) AS BIGINT) AS uniq_pm
        |FROM t),
        |q AS (SELECT doc_id, greatest(least(stopword_pm + uniq_pm - punct_pm, 1000), 0) AS quality_pm FROM m),
        |s AS (SELECT d.source, q.doc_id, q.quality_pm FROM documents d JOIN q USING (doc_id)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY quality_pm DESC, doc_id) AS rk FROM s)
        |SELECT source, doc_id, quality_pm, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 20 ORDER BY source, rk""".stripMargin,
    "ts_xcorr" ->
      """WITH ev AS (SELECT event_type,
        |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS h FROM events
        |  WHERE event_type IN ('click','purchase')),
        |c AS (SELECT event_type, h, count(*) AS n FROM ev GROUP BY 1, 2),
        |span AS (SELECT max(lo) AS lo, min(hi) AS hi FROM (
        |  SELECT event_type, min(h) AS lo, max(h) AS hi FROM ev GROUP BY 1)),
        |sp AS (SELECT unnest(generate_series(lo, hi)) AS h FROM span),
        |a AS (SELECT sp.h, coalesce(c.n, 0) AS n FROM sp
        |  LEFT JOIN c ON c.event_type = 'click' AND c.h = sp.h),
        |b AS (SELECT sp.h, coalesce(c.n, 0) AS n FROM sp
        |  LEFT JOIN c ON c.event_type = 'purchase' AND c.h = sp.h),
        |m AS (SELECT (SELECT CAST(sum(n) AS BIGINT) // count(*) FROM a) AS ma,
        |             (SELECT CAST(sum(n) AS BIGINT) // count(*) FROM b) AS mb),
        |l AS (SELECT a.h, a.n AS na, lag FROM a
        |  CROSS JOIN (SELECT unnest(generate_series(-3, 3)) AS lag))
        |SELECT lag, count(*) AS n_pairs,
        |  CAST(sum((na - ma) * (b.n - mb)) AS BIGINT) AS sxy
        |FROM l JOIN b ON b.h = l.h + l.lag CROSS JOIN m
        |GROUP BY lag ORDER BY lag""".stripMargin,

    "ts_autocorr" ->
      """WITH ev AS (SELECT event_type,
        |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS h FROM events),
        |c AS (SELECT event_type, h, count(*) AS n FROM ev GROUP BY 1, 2),
        |sp AS (SELECT event_type, unnest(generate_series(lo, hi)) AS h
        |  FROM (SELECT event_type, min(h) AS lo, max(h) AS hi FROM ev GROUP BY 1)),
        |g AS (SELECT sp.event_type, sp.h, coalesce(c.n, 0) AS n
        |  FROM sp LEFT JOIN c ON sp.event_type = c.event_type AND sp.h = c.h),
        |m AS (SELECT event_type, CAST(sum(n) // count(*) AS BIGINT) AS mu
        |  FROM g GROUP BY 1),
        |v AS (SELECT g.event_type, mu,
        |  CAST(sum((n - mu) * (n - mu)) AS BIGINT) AS m2
        |  FROM g JOIN m ON g.event_type = m.event_type GROUP BY 1, 2),
        |f AS (SELECT event_type, h, n AS na, lag
        |  FROM g CROSS JOIN (SELECT unnest(generate_series(1, 6)) AS lag))
        |SELECT f.event_type, CAST(f.lag AS BIGINT) AS lag,
        |  count(*) AS n_pairs,
        |  CAST(sum((f.na - v.mu) * (b.n - v.mu)) AS BIGINT) AS sac, v.m2
        |FROM f JOIN g b ON b.event_type = f.event_type AND b.h = f.h - f.lag
        |JOIN v ON v.event_type = f.event_type
        |GROUP BY 1, 2, 5 ORDER BY 1, 2""".stripMargin,
    "ts_seasonal" ->
      """WITH ev AS (SELECT event_type,
        |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS h FROM events),
        |c AS (SELECT event_type, h, count(*) AS n FROM ev GROUP BY 1, 2),
        |sp AS (SELECT event_type, unnest(generate_series(lo, hi)) AS h
        |  FROM (SELECT event_type, min(h) AS lo, max(h) AS hi FROM ev GROUP BY 1)),
        |g AS (SELECT sp.event_type, sp.h, coalesce(c.n, 0) AS n, sp.h % 24 AS hod
        |  FROM sp LEFT JOIN c ON sp.event_type = c.event_type AND sp.h = c.h),
        |p AS (SELECT event_type, hod,
        |  CAST(sum(n) AS BIGINT) // count(*) AS seasonal_n
        |  FROM g GROUP BY 1, 2)
        |SELECT g.event_type, g.h AS hour_idx, g.hod, g.n,
        |  CAST(p.seasonal_n AS BIGINT) AS seasonal_n,
        |  CAST(g.n - p.seasonal_n AS BIGINT) AS residual
        |FROM g JOIN p ON g.event_type = p.event_type AND g.hod = p.hod
        |ORDER BY g.event_type, hour_idx""".stripMargin,
    "graph_triangles" ->
      s"""WITH $shCte,
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
         |t AS (
         |  SELECT p1.doc_a AS x, p1.doc_b AS y, p2.doc_b AS z
         |  FROM p p1
         |  JOIN p p2 ON p2.doc_a = p1.doc_b
         |  JOIN p p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b),
         |c AS (SELECT unnest([x, y, z]) AS doc_id FROM t)
         |SELECT doc_id, count(*) AS n_tri FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // multi-source BFS — roots are the per-component canonicals (the
    // CC labels); the recursive form explores (doc, hops) pairs with a
    // hop guard matching the engine's maxHops cap, then min(hops) is
    // the BFS distance
    "graph_bfs_dist" ->
      s"""WITH RECURSIVE $shCte,
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(doc, lab) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.doc),
         |clusters AS (SELECT doc AS doc_id, min(lab) AS cluster_id
         |  FROM reach GROUP BY 1),
         |bfs(doc, hops) AS (
         |  SELECT DISTINCT cluster_id, CAST(0 AS BIGINT) FROM clusters
         |  UNION
         |  SELECT e.b, b.hops + 1 FROM bfs b JOIN edges e ON e.a = b.doc
         |  WHERE b.hops < 20)
         |SELECT c.doc_id, c.cluster_id, min(b.hops) AS hops
         |FROM clusters c JOIN bfs b ON b.doc = c.doc_id
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "graph_degree_dist" ->
      s"""WITH $shCte,
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
         |deg AS (SELECT doc, CAST(count(*) AS BIGINT) AS degree FROM
         |  (SELECT doc_a AS doc FROM pairs UNION ALL SELECT doc_b FROM pairs)
         |  GROUP BY 1)
         |SELECT d0.doc_id, coalesce(g.degree, 0) AS degree
         |FROM documents d0 LEFT JOIN deg g ON g.doc = d0.doc_id
         |ORDER BY d0.doc_id""".stripMargin,
    "graph_modularity" ->
      s"""WITH $shCte,
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
         |lp AS (SELECT da.lang AS lang_a, db.lang AS lang_b
         |  FROM pairs JOIN documents da ON da.doc_id = pairs.doc_a
         |             JOIN documents db ON db.doc_id = pairs.doc_b),
         |ei AS (SELECT lang_a AS lang, CAST(count(*) AS BIGINT) AS e_in
         |  FROM lp WHERE lang_a = lang_b GROUP BY 1),
         |ds AS (SELECT lang, CAST(count(*) AS BIGINT) AS d_sum FROM
         |  (SELECT lang_a AS lang FROM lp UNION ALL SELECT lang_b FROM lp)
         |  GROUP BY 1),
         |nd AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY 1),
         |per AS (SELECT nd.lang, nd.n_docs,
         |  coalesce(ds.d_sum, 0) AS d_sum, coalesce(ei.e_in, 0) AS e_in,
         |  4 * m.m * coalesce(ei.e_in, 0)
         |    - coalesce(ds.d_sum, 0) * coalesce(ds.d_sum, 0) AS q_num
         |  FROM nd LEFT JOIN ds ON ds.lang = nd.lang
         |          LEFT JOIN ei ON ei.lang = nd.lang, m)
         |SELECT lang, n_docs, d_sum, e_in, CAST(q_num AS BIGINT) AS q_num FROM per
         |UNION ALL
         |SELECT '__ALL__', CAST(sum(n_docs) AS BIGINT), CAST(sum(d_sum) AS BIGINT),
         |  CAST(sum(e_in) AS BIGINT), CAST(sum(q_num) AS BIGINT) FROM per
         |ORDER BY lang""".stripMargin,

    "text_bpe_pairs" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
        |i AS (
        |  SELECT tok, unnest(generate_series(1, len(tok)-1)) AS i
        |  FROM t WHERE len(tok) >= 2)
        |SELECT substr(tok, CAST(i AS INT), 2) AS pair, count(*) AS n
        |FROM i GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    // the full k-round trainer: unrolled merge CTEs (see bpeOracleCtes)
    "text_bpe_train" -> {
      val unions = (1 to 8).map(r =>
        s"SELECT CAST($r AS BIGINT) AS round, x AS left_sym, y AS right_sym, " +
          s"x || y AS merged, CAST(cnt AS BIGINT) AS pair_count FROM m$r")
        .mkString("\nUNION ALL\n")
      s"WITH ${bpeOracleCtes(8, "documents")}\n$unions\nORDER BY round"
    },

    "text_bpe_encode" ->
      s"""WITH ${bpeOracleCtes(8, "documents")},
v AS (SELECT tok, len(string_split(trim(s), '  ')) AS n_syms_tok,
  length(tok) AS n_chars_tok FROM w8),
d AS (SELECT doc_id,
  unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents)
SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(n_chars_tok) AS BIGINT) AS n_chars,
  CAST(sum(n_syms_tok) AS BIGINT) AS n_syms,
  CAST(sum(n_syms_tok) * 1000 // greatest(sum(n_chars_tok), 1) AS BIGINT)
    AS syms_per_kchar
FROM d JOIN v USING (tok) GROUP BY 1 ORDER BY d.doc_id""",
    "dedup_ngram_jaccard" ->
      s"""WITH $shCte
         |SELECT doc_a, doc_b, inter_n, union_n,
         |  CAST(round(inter_n * 1000.0 / union_n, 0) AS BIGINT) AS jaccard_pm
         |FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter_n,
         |    CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS union_n
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id)
         |WHERE inter_n > 0 ORDER BY doc_a, doc_b""".stripMargin,

    // same pair frame THRESHOLDED at jaccard >= 0.5 — the Spark side
    // reaches it through the PPJoin prefix filter, so identical output
    // proves the prefix pruning lossless; the threshold compares
    // integers (inter*1000 >= 500*union), no rounding seam
    "dedup_jaccard_prefix" ->
      s"""WITH $shCte
         |SELECT doc_a, doc_b, inter_n, union_n,
         |  CAST(round(inter_n * 1000.0 / union_n, 0) AS BIGINT) AS jaccard_pm
         |FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter_n,
         |    CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS union_n
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id)
         |WHERE inter_n * 1000 >= 500 * union_n ORDER BY doc_a, doc_b""".stripMargin,

    // the CROSS-SOURCE form: no source restriction at all — the
    // engine's prefix filter reaches the same thresholded pair set
    // without ever fanning out on globally-hot shingles
    "dedup_jaccard_global" ->
      s"""WITH $shCte
         |SELECT doc_a, doc_b, inter_n, union_n,
         |  CAST(round(inter_n * 1000.0 / union_n, 0) AS BIGINT) AS jaccard_pm
         |FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter_n,
         |    CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS union_n
         |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
         |WHERE inter_n * 1000 >= 500 * union_n ORDER BY doc_a, doc_b""".stripMargin,

    // the funnel composes three existing oracle pieces: raw count,
    // the Gopher keep set, and the canonical keep set (recursive CC +
    // quality argmax) — stage 3 is their conjunction
    "pipeline_funnel" ->
      s"""WITH RECURSIVE $shCte,
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(doc, lab) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.doc),
         |cl AS (SELECT doc AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY 1),
         |t AS (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
         |q AS (SELECT doc_id, greatest(least(
         |    CAST(round(len(list_filter(toks, tk -> list_contains(['the','a','of','and','to','in','is','it','for','on'], tk))) * 1.0 / greatest(len(toks),1) * 1000, 0) AS BIGINT)
         |  + CAST(round(len(list_distinct(toks)) * 1.0 / greatest(len(toks),1) * 1000, 0) AS BIGINT)
         |  - CAST(round(len(regexp_extract_all(text, '[^a-z0-9\\s]')) * 1.0 / greatest(length(text),1) * 1000, 0) AS BIGINT), 1000), 0) AS quality_pm FROM t),
         |rk AS (SELECT cl.cluster_id, cl.doc_id,
         |  row_number() OVER (PARTITION BY cluster_id ORDER BY quality_pm DESC, cl.doc_id) AS rn
         |  FROM cl JOIN q USING (doc_id)),
         |can AS (SELECT doc_id FROM rk WHERE rn = 1),
         |gw AS (SELECT doc_id, toks,
         |  list_transform(generate_series(1, greatest(len(toks)-2,1)),
         |    i -> array_to_string(toks[i:i+2], ' ')) AS wins FROM t),
         |gm AS (SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(floor(list_sum(list_transform(toks, tk -> length(tk))) * 1000.0 / greatest(len(toks),1)) AS BIGINT) AS mwl,
         |  CAST(floor(len(list_filter(toks, tk -> regexp_matches(tk, '[a-zA-Z]'))) * 1000.0 / greatest(len(toks),1)) AS BIGINT) AS alpha_pm,
         |  CAST(len(list_filter(toks, tk -> list_contains(['the','a','of','and','to','in','is','it','for','on'], tk))) AS BIGINT) AS n_stop,
         |  CAST(floor((len(wins) - len(list_distinct(wins))) * 1000.0 / len(wins)) AS BIGINT) AS dup3
         |FROM gw),
         |gk AS (SELECT doc_id FROM gm
         |  WHERE n_tokens BETWEEN 50 AND 100000 AND mwl BETWEEN 3000 AND 10000
         |    AND alpha_pm >= 800 AND n_stop >= 2 AND dup3 <= 300),
         |u AS (
         |  SELECT CAST(1 AS BIGINT) AS stage_idx, 'raw' AS stage, count(*) AS n_docs FROM documents
         |  UNION ALL SELECT 2, 'quality_filter', count(*) FROM gk
         |  UNION ALL SELECT 3, 'dedup_canonical', count(*) FROM gk JOIN can USING (doc_id))
         |SELECT stage_idx, stage, n_docs,
         |  CAST(coalesce(lag(n_docs) OVER (ORDER BY stage_idx) - n_docs, 0) AS BIGINT) AS n_dropped_from_prev
         |FROM u ORDER BY stage_idx""".stripMargin,

    // clusters = the recursive-CTE CC (dedup_cluster's oracle); the
    // canonical pick is the quality argmax via a window rank
    "dedup_canonical" ->
      s"""WITH RECURSIVE $shCte,
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(doc, lab) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.doc),
         |cl AS (SELECT doc AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY 1),
         |t AS (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
         |q AS (SELECT doc_id, greatest(least(
         |    CAST(round(len(list_filter(toks, tk -> list_contains(['the','a','of','and','to','in','is','it','for','on'], tk))) * 1.0 / greatest(len(toks),1) * 1000, 0) AS BIGINT)
         |  + CAST(round(len(list_distinct(toks)) * 1.0 / greatest(len(toks),1) * 1000, 0) AS BIGINT)
         |  - CAST(round(len(regexp_extract_all(text, '[^a-z0-9\\s]')) * 1.0 / greatest(length(text),1) * 1000, 0) AS BIGINT), 1000), 0) AS quality_pm FROM t),
         |r AS (SELECT cl.cluster_id, cl.doc_id, q.quality_pm,
         |  row_number() OVER (PARTITION BY cluster_id ORDER BY quality_pm DESC, cl.doc_id) AS rn
         |  FROM cl JOIN q USING (doc_id)),
         |m AS (SELECT cluster_id, count(*) AS n_members FROM r GROUP BY 1)
         |SELECT r.cluster_id, r.doc_id AS canonical_doc_id,
         |  r.quality_pm AS canonical_quality_pm,
         |  m.n_members, m.n_members - 1 AS n_dropped
         |FROM r JOIN m USING (cluster_id) WHERE rn = 1
         |ORDER BY r.cluster_id""".stripMargin,

    // pairs are the same same-source shared-shingle candidates as
    // jaccard; both engines implement unit-cost Levenshtein, so the
    // distances cross-check exactly
    "dedup_levenshtein" ->
      s"""WITH $shCte
         |SELECT doc_a, doc_b, lev, max_len,
         |  CAST(round((1 - lev * 1.0 / greatest(max_len, 1)) * 1000, 0) AS BIGINT) AS sim_pm
         |FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS lev,
         |    CAST(greatest(len(ta.text), len(tb.text)) AS BIGINT) AS max_len
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         |  JOIN documents ta ON ta.doc_id = a.doc_id
         |  JOIN documents tb ON tb.doc_id = b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) > 0)
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_containment" ->
      s"""WITH $shCte
         |SELECT doc_a, doc_b, inter_n, containment_pm FROM (
         |  SELECT doc_a, doc_b, inter_n,
         |    CAST(round(inter_n * 1000.0 / least(n_a, n_b), 0) AS BIGINT) AS containment_pm
         |  FROM (
         |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |      CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter_n,
         |      CAST(len(a.sh) AS BIGINT) AS n_a, CAST(len(b.sh) AS BIGINT) AS n_b
         |    FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id)
         |  WHERE inter_n > 0)
         |WHERE containment_pm >= 500 ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_embedding" ->
      s"""WITH $embBase,
         |corpus AS (SELECT * FROM base
         |  UNION ALL SELECT vec_id + 1000000 AS vec_id, label, emb FROM base WHERE vec_id < 100)
         |SELECT vec_a, vec_b, cos_e6 FROM (
         |  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         |    ${cosE6("x.emb", "y.emb")} AS cos_e6
         |  FROM corpus x JOIN corpus y ON x.label = y.label AND x.vec_id < y.vec_id)
         |WHERE cos_e6 >= 950000 ORDER BY vec_a, vec_b""".stripMargin,

    "sample_docs" ->
      """WITH h AS (SELECT source, doc_id,
        |  (doc_id % 1000000007) * 2654435761 % 1000000007 AS h FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn FROM h)
        |SELECT source, doc_id, h, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 10 ORDER BY source, rn""".stripMargin,

    "sample_stratified" ->
      """SELECT doc_id, lang, source,
        |  (doc_id % 1000000007) * 2654435761 % 1000000007 % 1000 AS bucket,
        |  CAST(CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 400 WHEN 'fr' THEN 400
        |    WHEN 'es' THEN 400 WHEN 'zh' THEN 400 ELSE 0 END AS BIGINT) AS rate_pm
        |FROM documents
        |WHERE (doc_id % 1000000007) * 2654435761 % 1000000007 % 1000 <
        |  CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 400 WHEN 'fr' THEN 400
        |    WHEN 'es' THEN 400 WHEN 'zh' THEN 400 ELSE 0 END
        |ORDER BY doc_id""".stripMargin,

    // end-to-end composed pipeline: normalize → dedup(norm) → quality →
    // decontaminate → stratified sample → pack. Mirrors each stage's
    // oracle expression verbatim; windows as strings (≡ Spark's window
    // hashes — set ops agree absent 64-bit collisions).
    "pipeline_train_data" ->
      """WITH n AS (SELECT doc_id, source, lang,
        |  regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
        |    '\s+', ' ', 'g') AS norm_text FROM documents),
        |c AS (SELECT *, row_number() OVER (PARTITION BY md5(norm_text) ORDER BY doc_id) AS rn FROM n),
        |d AS (SELECT doc_id, source, lang,
        |  string_split_regex(trim(norm_text), '\s+') AS toks FROM c WHERE rn = 1),
        |q AS (SELECT * FROM d WHERE len(toks) >= 10),
        |wins AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(toks)-3,1)),
        |  i -> array_to_string(toks[i:i+3], ' ')) AS ws FROM q),
        |bench AS (SELECT DISTINCT unnest(ws) AS w FROM wins WHERE doc_id % 50 = 0),
        |hits AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_id, unnest(ws) AS w FROM wins WHERE doc_id % 50 <> 0) t
        |  JOIN bench USING (w)),
        |clean AS (SELECT * FROM q WHERE doc_id % 50 <> 0
        |  AND doc_id NOT IN (SELECT doc_id FROM hits)),
        |samp AS (SELECT * FROM clean
        |  WHERE (doc_id % 1000000007) * 2654435761 % 1000000007 % 1000 <
        |    CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 400 WHEN 'fr' THEN 400
        |      WHEN 'es' THEN 400 WHEN 'zh' THEN 400 ELSE 0 END),
        |packed AS (SELECT doc_id, source, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  coalesce(CAST(sum(len(toks)) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS tok_start
        |  FROM samp)
        |SELECT doc_id, source, lang, n_tokens, tok_start,
        |  tok_start // 512 AS bin_start,
        |  (tok_start + n_tokens - 1) // 512 AS bin_end
        |FROM packed ORDER BY doc_id""".stripMargin,

    "sample_mixture" ->
      """WITH d AS (SELECT source,
        |  (doc_id % 1000000007) * 2654435761 % 1000000007 % 1000 AS bucket,
        |  (CAST(substr(source, 4) AS BIGINT) * 53) % 900 + 100 AS keep_pm
        |  FROM documents)
        |SELECT source, keep_pm, count(*) AS n_total,
        |  CAST(sum(CASE WHEN bucket < keep_pm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(round(sum(CASE WHEN bucket < keep_pm THEN 1 ELSE 0 END) * 1000.0 / count(*), 0) AS BIGINT) AS achieved_pm
        |FROM d GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // epoch allocation: the same split-product floor(b*w/sum_w) as the
    // engine — neither side may form b*w (BIGINT overflow at scale)
    "sample_epochs" ->
      """WITH per AS (SELECT source,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS avail_toks
        |  FROM documents GROUP BY 1),
        |w AS (SELECT source, avail_toks,
        |    CAST(floor(sqrt(avail_toks)) AS BIGINT) AS w FROM per),
        |t AS (SELECT *, CAST(greatest(sum(w) OVER (), 1) AS BIGINT) AS ws,
        |    CAST(sum(avail_toks) OVER () AS BIGINT) * 2 AS budget FROM w),
        |i AS (SELECT *,
        |    (budget // ws) * w + ((budget % ws) * w) // ws AS ideal_toks
        |  FROM t),
        |e AS (SELECT *,
        |    least(greatest(ideal_toks + avail_toks - 1, 0) // greatest(avail_toks, 1), 4) AS epochs FROM i)
        |SELECT source, avail_toks,
        |  CAST(1000 * w // ws AS BIGINT) AS weight_pm,
        |  CAST(ideal_toks AS BIGINT) AS ideal_toks,
        |  CAST(epochs AS BIGINT) AS epochs,
        |  CAST(least(ideal_toks, epochs * avail_toks) AS BIGINT) AS realized_toks,
        |  CAST(1000 * least(ideal_toks, epochs * avail_toks) // greatest(ideal_toks, 1) AS BIGINT) AS util_pm
        |FROM e ORDER BY source""".stripMargin,

    "sample_temperature" ->
      """WITH d AS (SELECT doc_id, source FROM documents),
        |c AS (SELECT source, count(*) AS n_docs,
        |  CAST(floor(sqrt(count(*))) AS BIGINT) AS w FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |  CAST(sum(w) AS BIGINT) AS w_total FROM c),
        |r AS (SELECT source, n_docs, w,
        |  n_total * 500 // 1000 * w // w_total AS target_n,
        |  least(1000, 1000 * (n_total * 500 // 1000 * w // w_total) // n_docs) AS keep_pm
        |  FROM c CROSS JOIN t),
        |b AS (SELECT source,
        |  (doc_id % 1000000007) * 2654435761 % 1000000007 % 1000 AS bucket FROM d)
        |SELECT r.source, n_docs, w, target_n, keep_pm,
        |  CAST(sum(CASE WHEN bucket < keep_pm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM b JOIN r ON b.source = r.source
        |GROUP BY 1, 2, 3, 4, 5 ORDER BY 1""".stripMargin,

    "ann_bruteforce_topk" ->
      s"""WITH $embBase,
         |q AS (SELECT vec_id AS query_id, emb AS q_emb FROM base WHERE vec_id < 10),
         |sims AS (SELECT q.query_id, b.vec_id AS neighbor_id,
         |    ${cosE6("q.q_emb", "b.emb")} AS cos_e6
         |  FROM base b CROSS JOIN q WHERE b.vec_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_e6 DESC, neighbor_id) AS rk FROM sims)
         |SELECT query_id, neighbor_id, cos_e6, CAST(rk AS BIGINT) AS "rank"
         |FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "ann_range_search" ->
      s"""WITH $embBase,
         |q AS (SELECT vec_id AS query_id, emb AS q_emb FROM base WHERE vec_id < 10),
         |sims AS (SELECT q.query_id, b.vec_id AS neighbor_id,
         |    ${cosE6("q.q_emb", "b.emb")} AS cos_e6
         |  FROM base b CROSS JOIN q WHERE b.vec_id <> q.query_id)
         |SELECT query_id, neighbor_id, cos_e6
         |FROM sims WHERE cos_e6 >= 200000
         |ORDER BY query_id, neighbor_id""".stripMargin,

    "ann_filtered_topk" ->
      s"""WITH $embBase,
         |q AS (SELECT vec_id AS query_id, label AS q_label, emb AS q_emb
         |  FROM base WHERE vec_id < 10),
         |sims AS (SELECT q.query_id, b.vec_id AS neighbor_id,
         |    CAST(b.label AS BIGINT) AS label,
         |    ${cosE6("q.q_emb", "b.emb")} AS cos_e6
         |  FROM base b JOIN q ON b.label = q.q_label AND b.vec_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_e6 DESC, neighbor_id) AS rk FROM sims)
         |SELECT query_id, neighbor_id, label, cos_e6, CAST(rk AS BIGINT) AS "rank"
         |FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "knn_label_vote" ->
      s"""WITH $embBase,
         |q AS (SELECT vec_id AS query_id, label AS actual_label, emb AS q_emb
         |  FROM base WHERE vec_id < 50),
         |sims AS (SELECT q.query_id, q.actual_label, b.label,
         |    ${cosE6("q.q_emb", "b.emb")} AS cos_e6
         |  FROM base b CROSS JOIN q WHERE b.vec_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_e6 DESC, label) AS rk FROM sims),
         |votes AS (SELECT query_id, actual_label, label, count(*) AS n_votes
         |  FROM r WHERE rk <= 10 GROUP BY 1,2,3),
         |v AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY n_votes DESC, label) AS vr FROM votes)
         |SELECT query_id, CAST(label AS BIGINT) AS predicted_label,
         |  CAST(actual_label AS BIGINT) AS actual_label,
         |  CAST(CASE WHEN label = actual_label THEN 1 ELSE 0 END AS BIGINT) AS correct
         |FROM v WHERE vr = 1 ORDER BY query_id""".stripMargin,

    "ann_cell_health" ->
      s"""WITH $embBase,
         |cent AS (
         |  SELECT label AS cell, list(m ORDER BY dim) AS c_emb
         |  FROM (SELECT label, i AS dim, avg(emb[i]) AS m
         |        FROM base CROSS JOIN generate_series(1, 64) AS t(i)
         |        GROUP BY 1, 2)
         |  GROUP BY 1),
         |assigned AS (SELECT vec_id, cell,
         |  1000000 - cell_cos AS resid_e6 FROM (
         |  SELECT b.vec_id, c.cell,
         |    ${cosE6("b.emb", "c.c_emb")} AS cell_cos,
         |    row_number() OVER (PARTITION BY b.vec_id
         |      ORDER BY ${cosE6("b.emb", "c.c_emb")} DESC, c.cell) AS ark
         |  FROM base b CROSS JOIN cent c) WHERE ark = 1),
         |h AS (SELECT CAST(cell AS BIGINT) AS cell,
         |  CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(sum(resid_e6) AS BIGINT) AS rsum FROM assigned GROUP BY 1),
         |t AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS total,
         |  CAST(count(*) AS BIGINT) AS n_cells FROM h)
         |SELECT cell, n_vecs,
         |  CAST(1000 * n_vecs // total AS BIGINT) AS share_pm,
         |  CAST(rsum // n_vecs AS BIGINT) AS mean_resid_e6,
         |  CAST(CASE WHEN n_vecs * n_cells > 2 * total
         |    OR rsum // n_vecs > 500000 THEN 1 ELSE 0 END AS BIGINT)
         |    AS rebuild
         |FROM h CROSS JOIN t ORDER BY cell""".stripMargin,

    "ann_ivf_topk" ->
      s"""WITH $embBase,
         |cent AS (
         |  SELECT label AS cell, list(m ORDER BY dim) AS c_emb
         |  FROM (SELECT label, i AS dim, avg(emb[i]) AS m
         |        FROM base CROSS JOIN generate_series(1, 64) AS t(i)
         |        GROUP BY 1, 2)
         |  GROUP BY 1),
         |scored AS (SELECT b.vec_id, b.emb, c.cell,
         |    ${cosE6("b.emb", "c.c_emb")} AS cell_cos
         |  FROM base b CROSS JOIN cent c),
         |assigned AS (SELECT vec_id, emb, cell FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cell_cos DESC, cell) AS ark
         |  FROM scored) WHERE ark = 1),
         |qprobe AS (SELECT vec_id AS query_id, emb AS q_emb, cell FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cell_cos DESC, cell) AS prk
         |  FROM scored WHERE vec_id < 10) WHERE prk <= 3),
         |sims AS (SELECT q.query_id, a.vec_id AS neighbor_id, a.cell,
         |    ${cosE6("q.q_emb", "a.emb")} AS cos_e6
         |  FROM assigned a JOIN qprobe q ON a.cell = q.cell WHERE a.vec_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_e6 DESC, neighbor_id) AS rk FROM sims)
         |SELECT query_id, neighbor_id, CAST(cell AS BIGINT) AS cell, cos_e6,
         |  CAST(rk AS BIGINT) AS "rank"
         |FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "ann_centroid_classify" ->
      s"""WITH $embBase,
         |cent AS (
         |  SELECT label AS c_label, list(m ORDER BY dim) AS c_emb
         |  FROM (SELECT label, i AS dim, avg(emb[i]) AS m
         |        FROM base CROSS JOIN generate_series(1, 64) AS t(i)
         |        GROUP BY 1, 2)
         |  GROUP BY 1),
         |q AS (SELECT vec_id, label AS actual_label, emb FROM base WHERE vec_id < 50),
         |scored AS (SELECT q.vec_id, q.actual_label, c.c_label,
         |    ${cosE6("q.emb", "c.c_emb")} AS cos_e6
         |  FROM q CROSS JOIN cent c),
         |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_e6 DESC, c_label) AS rk FROM scored)
         |SELECT vec_id, CAST(c_label AS BIGINT) AS predicted_label,
         |  CAST(actual_label AS BIGINT) AS actual_label, cos_e6
         |FROM r WHERE rk = 1 ORDER BY vec_id""".stripMargin,

    "text_tokens" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks FROM documents)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpeish
        |FROM t ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(round(len(regexp_extract_all(text, '[^a-z0-9\s]')) * 1.0 / greatest(length(text),1) * 1000, 0) AS BIGINT) AS punct_pm,
        |  CAST(round(len(list_filter(toks, tk -> list_contains(['the','a','of','and','to','in','is','it','for','on'], tk))) * 1.0 / greatest(len(toks),1) * 1000, 0) AS BIGINT) AS stopword_pm,
        |  CAST(round(len(list_distinct(toks)) * 1.0 / greatest(len(toks),1) * 1000, 0) AS BIGINT) AS uniq_pm
        |FROM t)
        |SELECT *, greatest(least(stopword_pm + uniq_pm - punct_pm, 1000), 0) AS quality_pm
        |FROM m ORDER BY doc_id""".stripMargin,

    "text_ngram_novelty" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |  ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
        |  FROM (SELECT doc_id, unnest(list_transform(
        |    range(1, greatest(len(toks) - 2, 1) + 1),
        |    i -> array_to_string(toks[i:i+2], ' '))) AS s FROM t)),
        |f AS (SELECT h, min(doc_id) AS first_doc FROM sh GROUP BY 1)
        |SELECT sh.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  CAST(1000 * sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) // count(*) AS BIGINT) AS novelty_pm
        |FROM sh JOIN f ON f.h = sh.h
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "sample_curriculum" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(round(len(regexp_extract_all(text, '[^a-z0-9\s]')) * 1.0 / greatest(length(text),1) * 1000, 0) AS BIGINT) AS punct_pm,
        |  CAST(round(len(list_filter(toks, tk -> list_contains(['the','a','of','and','to','in','is','it','for','on'], tk))) * 1.0 / greatest(len(toks),1) * 1000, 0) AS BIGINT) AS stopword_pm,
        |  CAST(round(len(list_distinct(toks)) * 1.0 / greatest(len(toks),1) * 1000, 0) AS BIGINT) AS uniq_pm
        |FROM t),
        |q AS (SELECT n_tokens, greatest(least(stopword_pm + uniq_pm - punct_pm, 1000), 0) AS quality_pm FROM m),
        |b AS (SELECT least(quality_pm // 100, 9) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(min(quality_pm) AS BIGINT) AS min_pm,
        |  CAST(max(quality_pm) AS BIGINT) AS max_pm
        |  FROM q GROUP BY 1)
        |SELECT bucket, n_docs, n_tokens, min_pm, max_pm,
        |  CAST(sum(n_tokens) OVER (ORDER BY bucket DESC) AS BIGINT) AS cum_tokens_from_top
        |FROM b ORDER BY bucket""".stripMargin,

    "sample_dsir" -> {
      val b = graft.operators.Sampling.dsirBuckets
      s"""WITH t AS (SELECT doc_id, source,
         |  unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents),
         |c AS (SELECT doc_id, source,
         |  ('0x' || substr(md5(tok), 1, 15))::BIGINT % $b AS b, count(*) AS c
         |  FROM t GROUP BY 1, 2, 3),
         |bt AS (SELECT b, CAST(sum(c) AS BIGINT) AS nr,
         |  CAST(sum(CASE WHEN source = 'src0' THEN c ELSE 0 END) AS BIGINT) AS nt
         |  FROM c GROUP BY 1),
         |tt AS (SELECT CAST(sum(nr) AS BIGINT) AS trn, CAST(sum(nt) AS BIGINT) AS ttn FROM bt),
         |qq AS (SELECT b, least(trn // (nr + 1), 32767) AS qr,
         |  least(ttn // (nt + 1), 32767) AS qt FROM bt, tt),
         |sd AS (SELECT b, (length(bin(qr * qr * qr * qr)) - 1)
         |  - (length(bin(qt * qt * qt * qt)) - 1) AS sd FROM qq)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(sum(c * sd) AS BIGINT) AS logw_qb,
         |  CAST(CASE WHEN sum(c * sd) >= 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM c JOIN sd USING (b) GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "pack_shelves" ->
      """WITH t AS (SELECT source, doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n FROM documents),
        |b AS (SELECT source, doc_id, n,
        |  CASE WHEN n <= 1 THEN 1 ELSE (CAST(1 AS BIGINT) << length(bin(n - 1))) END AS band
        |  FROM t),
        |s AS (SELECT *, greatest(512 // band, 1) AS slots,
        |  row_number() OVER (PARTITION BY source, band ORDER BY doc_id) AS rn FROM b),
        |g AS (SELECT source, band, slots, n, (rn - 1) // slots AS bin_id FROM s)
        |SELECT source, CAST(band AS BIGINT) AS band, CAST(bin_id AS BIGINT) AS bin_id,
        |  CAST(max(slots) AS BIGINT) AS slots, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS load_toks,
        |  CAST(1000 * sum(n) // 512 AS BIGINT) AS used_pm
        |FROM g GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "ts_dispersion" ->
      """WITH c AS (SELECT user_id,
        |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS h, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT user_id, max(h) - min(h) + 1 AS span_hours,
        |  CAST(count(*) AS BIGINT) AS active_hours,
        |  CAST(sum(x) AS BIGINT) AS n_events,
        |  CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM c GROUP BY 1),
        |q AS (SELECT *, span_hours * sxx - n_events * n_events AS num,
        |  greatest(n_events * (span_hours - 1), 1) AS den FROM a)
        |SELECT user_id, CAST(span_hours AS BIGINT) AS span_hours, active_hours,
        |  n_events,
        |  CAST(1000 * (num // den) + (1000 * (num % den)) // den AS BIGINT) AS dispersion_pm
        |FROM q ORDER BY user_id""".stripMargin,

    "text_zipf_check" ->
      s"""WITH f AS (SELECT source, tok, count(*) AS f FROM
        |  (SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        |   FROM documents) GROUP BY 1, 2),
        |r AS (SELECT source,
        |  length(bin(r * r)) - 1 AS x,
        |  length(bin(least(f, 2147483647) * least(f, 2147483647))) - 1 AS y
        |  FROM (SELECT source, f,
        |    row_number() OVER (PARTITION BY source ORDER BY f DESC, tok) AS r
        |    FROM f)
        |  WHERE r <= ${graft.operators.TextAnalysis.zipfRankCap}),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM r GROUP BY 1)
        |SELECT source, n_types,
        |  CAST(1000 * greatest(sx * sy - n_types * sxy, 0)
        |    // greatest(n_types * sxx - sx * sx, 1) AS BIGINT) AS zipf_neg_slope_pm
        |FROM a ORDER BY source""".stripMargin,

    "cdc_order_audit" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |l AS (SELECT user_id, us,
        |  lag(us) OVER (PARTITION BY user_id ORDER BY event_id) AS prev FROM e),
        |r AS (SELECT user_id % 32 AS part_id, user_id,
        |  CASE WHEN prev IS NOT NULL AND prev > us THEN prev - us ELSE 0 END AS reg FROM l)
        |SELECT part_id, CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys,
        |  CAST(count(*) AS BIGINT) AS n_changes,
        |  CAST(sum(CASE WHEN reg > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_inversions,
        |  CAST(max(reg) AS BIGINT) AS max_regress_us,
        |  CAST(1000 * (count(*) - sum(CASE WHEN reg > 0 THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS ordered_pm
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_ppl_buckets" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |p AS (SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i+1] AS bg
        |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-1)) AS i
        |        FROM t WHERE len(toks) >= 2)),
        |u AS (SELECT w1, count(*) AS n1 FROM (SELECT unnest(toks) AS w1 FROM t) GROUP BY 1),
        |b AS (SELECT bg, count(*) AS n2 FROM p GROUP BY 1),
        |s AS (SELECT doc_id,
        |    length(bin(least(n1 // n2, 2147483647) * least(n1 // n2, 2147483647))) - 1 AS hb
        |  FROM p JOIN b USING (bg) JOIN u USING (w1)),
        |ppl AS (SELECT doc_id, CAST((500 * sum(hb)) // count(*) AS BIGINT) AS ppl_millibits
        |  FROM s GROUP BY 1),
        |pl AS (SELECT ppl.doc_id, d.lang, ppl.ppl_millibits
        |  FROM ppl JOIN documents d USING (doc_id)),
        |vt AS (SELECT lang, ppl_millibits, count(*) AS nv FROM pl GROUP BY 1, 2),
        |cuts AS (SELECT lang, ppl_millibits,
        |    1 + (3 * (CAST(sum(nv) OVER (PARTITION BY lang ORDER BY ppl_millibits) AS BIGINT) - nv))
        |      // CAST(sum(nv) OVER (PARTITION BY lang) AS BIGINT) AS bucket
        |  FROM vt)
        |SELECT pl.doc_id, pl.lang, pl.ppl_millibits, CAST(bucket AS BIGINT) AS bucket
        |FROM pl JOIN cuts USING (lang, ppl_millibits) ORDER BY doc_id""".stripMargin,

    // Spark casts the double score to long by TRUNCATION; DuckDB CAST
    // rounds-half-even — hence the explicit floor() on every score.
    "text_langid" ->
      """WITH t AS (SELECT doc_id, lang AS labeled_lang,
        |  string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |sc AS (
        |  SELECT doc_id, labeled_lang, 'en' AS lang,
        |    CAST(len(list_filter(toks, tk -> list_contains(['the','a','and','of','to','fast','slow','small','big'], tk))) * 1000 // greatest(len(toks),1) AS BIGINT) AS score_pm FROM t
        |  UNION ALL SELECT doc_id, labeled_lang, 'de',
        |    CAST(len(list_filter(toks, tk -> list_contains(['der','die','das','und','ist','schnell','klein'], tk))) * 1000 // greatest(len(toks),1) AS BIGINT) FROM t
        |  UNION ALL SELECT doc_id, labeled_lang, 'fr',
        |    CAST(len(list_filter(toks, tk -> list_contains(['le','la','et','est','vite','petit','grand'], tk))) * 1000 // greatest(len(toks),1) AS BIGINT) FROM t
        |  UNION ALL SELECT doc_id, labeled_lang, 'es',
        |    CAST(len(list_filter(toks, tk -> list_contains(['el','la','y','es','rapido','pequeno','grande'], tk))) * 1000 // greatest(len(toks),1) AS BIGINT) FROM t
        |  UNION ALL SELECT doc_id, labeled_lang, 'zh',
        |    CAST(len(list_filter(toks, tk -> list_contains(['de','shi','he','kuai','xiao','da'], tk))) * 1000 // greatest(len(toks),1) AS BIGINT) FROM t),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_pm DESC, lang DESC) AS rk FROM sc)
        |SELECT doc_id, labeled_lang, lang AS predicted_lang, score_pm
        |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    // the same scorer, folded into a confusion matrix: counts +
    // per-label row shares (integer div on both engines)
    "text_lang_confusion" ->
      """WITH t AS (SELECT doc_id, lang AS labeled_lang,
        |  string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |sc AS (
        |  SELECT doc_id, labeled_lang, 'en' AS lang,
        |    CAST(len(list_filter(toks, tk -> list_contains(['the','a','and','of','to','fast','slow','small','big'], tk))) * 1000 // greatest(len(toks),1) AS BIGINT) AS score_pm FROM t
        |  UNION ALL SELECT doc_id, labeled_lang, 'de',
        |    CAST(len(list_filter(toks, tk -> list_contains(['der','die','das','und','ist','schnell','klein'], tk))) * 1000 // greatest(len(toks),1) AS BIGINT) FROM t
        |  UNION ALL SELECT doc_id, labeled_lang, 'fr',
        |    CAST(len(list_filter(toks, tk -> list_contains(['le','la','et','est','vite','petit','grand'], tk))) * 1000 // greatest(len(toks),1) AS BIGINT) FROM t
        |  UNION ALL SELECT doc_id, labeled_lang, 'es',
        |    CAST(len(list_filter(toks, tk -> list_contains(['el','la','y','es','rapido','pequeno','grande'], tk))) * 1000 // greatest(len(toks),1) AS BIGINT) FROM t
        |  UNION ALL SELECT doc_id, labeled_lang, 'zh',
        |    CAST(len(list_filter(toks, tk -> list_contains(['de','shi','he','kuai','xiao','da'], tk))) * 1000 // greatest(len(toks),1) AS BIGINT) FROM t),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_pm DESC, lang DESC) AS rk FROM sc),
        |m AS (SELECT labeled_lang, lang AS predicted_lang FROM r WHERE rk = 1),
        |c AS (SELECT labeled_lang, predicted_lang, count(*) AS n_docs FROM m GROUP BY 1, 2)
        |SELECT labeled_lang, predicted_lang, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_docs * 1000 // sum(n_docs) OVER (PARTITION BY labeled_lang) AS BIGINT) AS share_pm
        |FROM c ORDER BY 1, 2""".stripMargin,

    "dedup_report" ->
      """WITH h AS (SELECT source, md5(text) AS eh,
        |  md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS nh
        |  FROM documents),
        |s AS (SELECT source, count(*) AS n_docs,
        |  count(DISTINCT eh) AS n_exact_classes,
        |  count(DISTINCT nh) AS n_norm_classes
        |  FROM h GROUP BY 1)
        |SELECT source, n_docs, n_exact_classes, n_norm_classes,
        |  (n_docs - n_exact_classes) * 1000 // n_docs AS exact_dup_pm,
        |  (n_docs - n_norm_classes) * 1000 // n_docs AS norm_dup_pm
        |FROM s ORDER BY source""".stripMargin,

    "text_normalize" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g') AS norm_text,
        |  CAST(length(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS BIGINT) AS n_chars_norm
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_scrub_pii" ->
      """WITH s AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed
        |  FROM documents)
        |SELECT doc_id, scrubbed,
        |  CAST(length(scrubbed) - length(regexp_replace(scrubbed, '<EMAIL>|<PHONE>', '', 'g')) AS BIGINT) AS redacted_chars
        |FROM s ORDER BY doc_id""".stripMargin,

    "pack_sequences" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start FROM t)
        |SELECT doc_id, source, n_tokens, CAST(tok_start AS BIGINT) AS tok_start,
        |  CAST(tok_start // 512 AS BIGINT) AS bin_start,
        |  CAST((tok_start + n_tokens - 1) // 512 AS BIGINT) AS bin_end
        |FROM c ORDER BY doc_id""".stripMargin,

    // 4-token windows; Spark matches xxhash64 window hashes, the oracle
    // matches the window STRINGS — identical up to 2^-64 collisions
    "text_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |d AS (SELECT doc_id, list_distinct(list_transform(
        |  generate_series(1, greatest(len(toks)-3,1)),
        |  i -> array_to_string(toks[i:i+3], ' '))) AS sh FROM t),
        |bench AS (SELECT DISTINCT unnest(sh) AS s FROM d WHERE doc_id % 50 = 0),
        |corpus AS (SELECT doc_id, unnest(sh) AS s FROM d WHERE doc_id % 50 <> 0)
        |SELECT doc_id, count(*) AS n_hits
        |FROM corpus JOIN bench USING (s)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the graded form: every corpus doc with its overlap rate
    "text_contamination_rate" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |d AS (SELECT doc_id, list_distinct(list_transform(
        |  generate_series(1, greatest(len(toks)-3,1)),
        |  i -> array_to_string(toks[i:i+3], ' '))) AS sh FROM t),
        |bench AS (SELECT DISTINCT unnest(sh) AS s FROM d WHERE doc_id % 50 = 0),
        |corpus AS (SELECT doc_id, unnest(sh) AS s FROM d WHERE doc_id % 50 <> 0),
        |w AS (SELECT doc_id, count(*) AS n_windows FROM corpus GROUP BY 1),
        |h AS (SELECT doc_id, count(*) AS n_hits
        |  FROM corpus JOIN bench USING (s) GROUP BY 1)
        |SELECT w.doc_id, w.n_windows,
        |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  coalesce(h.n_hits, 0) * 1000 // w.n_windows AS overlap_pm
        |FROM w LEFT JOIN h ON w.doc_id = h.doc_id
        |ORDER BY w.doc_id""".stripMargin,

    "text_gopher_rules" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |w AS (SELECT doc_id, toks,
        |  list_transform(generate_series(1, greatest(len(toks)-2,1)),
        |    i -> array_to_string(toks[i:i+2], ' ')) AS wins FROM t),
        |m AS (SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(floor(list_sum(list_transform(toks, tk -> length(tk))) * 1000.0 / greatest(len(toks),1)) AS BIGINT) AS mean_word_len_pm,
        |  CAST(floor(len(list_filter(toks, tk -> regexp_matches(tk, '[a-zA-Z]'))) * 1000.0 / greatest(len(toks),1)) AS BIGINT) AS alpha_pm,
        |  CAST(len(list_filter(toks, tk -> list_contains(['the','a','of','and','to','in','is','it','for','on'], tk))) AS BIGINT) AS n_stop,
        |  CAST(floor((len(wins) - len(list_distinct(wins))) * 1000.0 / len(wins)) AS BIGINT) AS dup_3gram_pm
        |FROM w),
        |v AS (SELECT *,
        |  CASE WHEN n_tokens < 50 OR n_tokens > 100000 THEN 'word_count'
        |       WHEN mean_word_len_pm < 3000 OR mean_word_len_pm > 10000 THEN 'mean_word_length'
        |       WHEN alpha_pm < 800 THEN 'alpha_words'
        |       WHEN n_stop < 2 THEN 'stop_words'
        |       WHEN dup_3gram_pm > 300 THEN 'repetition'
        |       ELSE '' END AS first_fail
        |FROM m)
        |SELECT doc_id, n_tokens, mean_word_len_pm, alpha_pm, n_stop, dup_3gram_pm,
        |  first_fail, CAST(CASE WHEN first_fail = '' THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM v ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |w AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  list_transform(generate_series(1, greatest(len(toks)-2,1)),
        |    i -> array_to_string(toks[i:i+2], ' ')) AS wins FROM t),
        |tri AS (SELECT doc_id, n_tokens, CAST(len(wins) AS BIGINT) AS total_3g,
        |  CAST(len(list_distinct(wins)) AS BIGINT) AS distinct_3g FROM w),
        |top AS (SELECT doc_id, max(c) AS top_tok_n FROM (
        |  SELECT doc_id, tok, count(*) AS c FROM (
        |    SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY doc_id, tok)
        |  GROUP BY doc_id)
        |SELECT tri.doc_id, n_tokens,
        |  CAST(floor((total_3g - distinct_3g) * 1000.0 / total_3g) AS BIGINT) AS dup_3gram_pm,
        |  CAST(floor(top_tok_n * 1000.0 / greatest(n_tokens, 1)) AS BIGINT) AS top_tok_pm
        |FROM tri JOIN top ON tri.doc_id = top.doc_id ORDER BY tri.doc_id""".stripMargin,

    "text_vocab" ->
      """SELECT tok, count(*) AS n FROM (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok FROM documents)
        |WHERE tok <> '' GROUP BY tok ORDER BY n DESC, tok LIMIT 50""".stripMargin,

    "text_salient_terms" ->
      """WITH t2 AS (SELECT doc_id, tok FROM (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents) WHERE tok <> ''),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t2 GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM t2) GROUP BY 1),
        |s AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df, tf.tf * 1000000 // df.df AS score
        |  FROM tf JOIN df USING (tok)),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS BIGINT) AS rk
        |  FROM s)
        |SELECT doc_id, rk, tok, tf, df, score FROM r WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,

    "text_rarity" ->
      """WITH t2 AS (SELECT DISTINCT doc_id, tok FROM (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents) WHERE tok <> ''),
        |df AS (SELECT tok, count(*) AS df FROM t2 GROUP BY 1)
        |SELECT doc_id, count(*) AS n_distinct,
        |  CAST(sum(1000000 // df) AS BIGINT) AS rarity_sum,
        |  CAST(sum(1000000 // df) // count(*) AS BIGINT) AS rarity_mean
        |FROM t2 JOIN df USING (tok) GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_chunk_dedup" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |c0 AS (SELECT doc_id, list_transform(
        |  generate_series(1, greatest(len(toks)//20, 1)),
        |  i -> md5(array_to_string(toks[((i-1)*20+1):((i-1)*20+20)], ' '))) AS hs FROM d),
        |c AS (SELECT doc_id, unnest(hs) AS h FROM c0),
        |dp AS (SELECT h, count(DISTINCT doc_id) AS nd FROM c GROUP BY 1)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        |  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT) AS dup_pm
        |FROM c JOIN dp USING (h) GROUP BY 1 ORDER BY 1""".stripMargin,

    "sample_weighted" ->
      """WITH h AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |  (doc_id % 1000000007) * 2654435761 % 1000000007 // greatest(n_chars, 1) AS priority
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (ORDER BY priority, doc_id) AS rn FROM h)
        |SELECT doc_id, n_chars, priority, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 20 ORDER BY rn""".stripMargin,

    "mm_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  md5(text) AS md5_hex,
        |  base64(CAST(substr(text,1,6) AS BLOB)) AS header_b64
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_kn_stats" ->
      """WITH t AS (SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |p AS (SELECT DISTINCT toks[i] AS w1, toks[i+1] AS w2
        |  FROM (SELECT toks, unnest(generate_series(1, len(toks)-1)) AS i
        |        FROM t WHERE len(toks) >= 2)),
        |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS f
        |  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
        |l AS (SELECT w2 AS tok, CAST(count(*) AS BIGINT) AS lt FROM p GROUP BY 1),
        |r AS (SELECT w1 AS tok, CAST(count(*) AS BIGINT) AS rt FROM p GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM p)
        |SELECT tok, f, CAST(coalesce(lt, 0) AS BIGINT) AS left_types,
        |  CAST(coalesce(rt, 0) AS BIGINT) AS right_types,
        |  CAST(1000000 * coalesce(lt, 0) // nt AS BIGINT) AS cont_ppm
        |FROM uni LEFT JOIN l USING (tok) LEFT JOIN r USING (tok) CROSS JOIN n
        |WHERE f >= 50 ORDER BY tok""".stripMargin,

    "text_syndication_matrix" ->
      """WITH d AS (SELECT source, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |c0 AS (SELECT source, list_transform(
        |  generate_series(1, greatest(len(toks)//20, 1)),
        |  i -> md5(array_to_string(toks[((i-1)*20+1):((i-1)*20+20)], ' '))) AS hs FROM d),
        |s1 AS (SELECT DISTINCT source, unnest(hs) AS h FROM c0),
        |ps AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM s1 GROUP BY 1),
        |sh AS (SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS ns
        |  FROM s1 a JOIN s1 b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2)
        |SELECT sa AS source_a, sb AS source_b, ns AS n_shared,
        |  pa.n AS types_a, pb.n AS types_b,
        |  CAST(1000 * ns // (pa.n + pb.n - ns) AS BIGINT) AS jaccard_pm
        |FROM sh JOIN ps pa ON pa.source = sa JOIN ps pb ON pb.source = sb
        |ORDER BY 1, 2""".stripMargin,

    "graph_neighbor_jaccard" ->
      s"""WITH $shCte,
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
         |adj AS (SELECT doc_a AS u, doc_b AS v FROM p
         |  UNION ALL SELECT doc_b, doc_a FROM p),
         |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
         |com AS (SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS c
         |  FROM p JOIN adj x ON x.u = p.doc_a
         |  JOIN adj y ON y.u = p.doc_b AND y.v = x.v
         |  GROUP BY 1, 2)
         |SELECT p.doc_a, p.doc_b,
         |  CAST(coalesce(c, 0) AS BIGINT) AS common_nbrs,
         |  CAST(da.deg + db.deg - coalesce(c, 0) AS BIGINT) AS union_nbrs,
         |  CAST(1000 * coalesce(c, 0) // (da.deg + db.deg - coalesce(c, 0)) AS BIGINT) AS jaccard_pm
         |FROM p LEFT JOIN com USING (doc_a, doc_b)
         |JOIN deg da ON da.u = p.doc_a JOIN deg db ON db.u = p.doc_b
         |ORDER BY 1, 2""".stripMargin,

    "q_rfm_segments" ->
      s"""WITH u AS (SELECT user_id, max(epoch_us(ts)) AS r_us,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS f_n,
         |  CAST(sum(${cents("value")}) AS BIGINT) AS m_c
         |  FROM events GROUP BY 1),
         |rq AS (SELECT r_us, count(*) AS cnt FROM u GROUP BY 1),
         |rs AS (SELECT r_us, CAST(1 + (5 * (CAST(sum(cnt) OVER (ORDER BY r_us) AS BIGINT) - cnt))
         |  // CAST(sum(cnt) OVER () AS BIGINT) AS BIGINT) AS r_score FROM rq),
         |fq AS (SELECT f_n, count(*) AS cnt FROM u GROUP BY 1),
         |fs AS (SELECT f_n, CAST(1 + (5 * (CAST(sum(cnt) OVER (ORDER BY f_n) AS BIGINT) - cnt))
         |  // CAST(sum(cnt) OVER () AS BIGINT) AS BIGINT) AS f_score FROM fq),
         |mq AS (SELECT m_c, count(*) AS cnt FROM u GROUP BY 1),
         |ms AS (SELECT m_c, CAST(1 + (5 * (CAST(sum(cnt) OVER (ORDER BY m_c) AS BIGINT) - cnt))
         |  // CAST(sum(cnt) OVER () AS BIGINT) AS BIGINT) AS m_score FROM mq)
         |SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_users,
         |  CAST(sum(m_c) AS BIGINT) AS segment_spend_c
         |FROM u JOIN rs USING (r_us) JOIN fs USING (f_n) JOIN ms USING (m_c)
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_attribution" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         |  ${cents("value")} AS value_c FROM events),
         |p AS (SELECT user_id, event_id AS p_eid, us AS p_us, value_c FROM e
         |  WHERE event_type = 'purchase'),
         |t AS (SELECT user_id, event_id AS t_eid, us AS t_us,
         |  event_type AS channel FROM e WHERE event_type <> 'purchase'),
         |c AS (SELECT p.user_id, p.p_eid, t.t_eid, t.t_us, t.channel
         |  FROM p JOIN t USING (user_id)
         |  WHERE t.t_us < p.p_us AND t.t_us > p.p_us - 604800000000),
         |k AS (SELECT *,
         |  row_number() OVER (PARTITION BY user_id, p_eid ORDER BY t_us, t_eid) AS rk_first,
         |  row_number() OVER (PARTITION BY user_id, p_eid ORDER BY t_us DESC, t_eid DESC) AS rk_last
         |  FROM c),
         |fi AS (SELECT p_eid, channel AS first_ch FROM k WHERE rk_first = 1),
         |la AS (SELECT p_eid, channel AS last_ch FROM k WHERE rk_last = 1),
         |a AS (SELECT coalesce(first_ch, 'direct') AS first_ch,
         |  coalesce(last_ch, 'direct') AS last_ch, value_c
         |  FROM p LEFT JOIN fi USING (p_eid) LEFT JOIN la USING (p_eid)),
         |bf AS (SELECT first_ch AS channel, CAST(count(*) AS BIGINT) AS nf FROM a GROUP BY 1),
         |bl AS (SELECT last_ch AS channel, CAST(count(*) AS BIGINT) AS nl,
         |  CAST(sum(value_c) AS BIGINT) AS rev FROM a GROUP BY 1)
         |SELECT channel, CAST(coalesce(nf, 0) AS BIGINT) AS n_first_touch,
         |  CAST(coalesce(nl, 0) AS BIGINT) AS n_last_touch,
         |  CAST(coalesce(rev, 0) AS BIGINT) AS last_touch_rev_c
         |FROM bf FULL OUTER JOIN bl USING (channel) ORDER BY channel""".stripMargin,

    "q_join_skew_report" ->
      """WITH m AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS m
        |  FROM lineitem GROUP BY 1),
        |b AS (SELECT CAST(length(bin(m)) - 1 AS BIGINT) AS log2_bucket,
        |  CAST(count(*) AS BIGINT) AS n_keys, CAST(sum(m) AS BIGINT) AS n_rows,
        |  CAST(max(m) AS BIGINT) AS max_mult FROM m GROUP BY 1),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS t_keys,
        |  CAST(sum(m) AS BIGINT) AS t_rows, CAST(max(m) AS BIGINT) AS t_max FROM m)
        |SELECT log2_bucket, n_keys, n_rows, max_mult,
        |  CAST(1000 * CAST(sum(n_rows) OVER (ORDER BY log2_bucket) AS BIGINT) // t_rows AS BIGINT) AS cum_rows_pm,
        |  CAST(1000 * t_max * t_keys // t_rows AS BIGINT) AS skew_factor_pm
        |FROM b CROSS JOIN tt ORDER BY 1""".stripMargin,

    "cdc_txn_stats" ->
      """WITH u AS (
        |  SELECT 'events' AS tbl, epoch_us(ts) AS sort_us FROM events
        |  UNION ALL
        |  SELECT 'orders', epoch_us(o_orderdate) FROM orders),
        |t AS (SELECT tbl, sort_us, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY 1, 2)
        |SELECT tbl, CAST(count(*) AS BIGINT) AS n_txns,
        |  CAST(sum(n) AS BIGINT) AS n_changes,
        |  CAST(max(n) AS BIGINT) AS max_txn_rows,
        |  CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS multi_row_txns,
        |  CAST(1000 * (count(*) - sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS singleton_pm
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_markov_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |p AS (SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_type
        |  FROM e),
        |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM c GROUP BY 1)
        |SELECT from_type, to_type, n, n_from,
        |  CAST(1000 * n // n_from AS BIGINT) AS p_pm
        |FROM c JOIN f USING (from_type) ORDER BY 1, 2""".stripMargin,

    "q_funnel_paths" ->
      """WITH e AS (SELECT user_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |u AS (SELECT user_id,
        |  max(CASE WHEN rn = 1 THEN event_type END) AS e1,
        |  max(CASE WHEN rn = 2 THEN event_type END) AS e2,
        |  max(CASE WHEN rn = 3 THEN event_type END) AS e3
        |  FROM e WHERE rn <= 3 GROUP BY 1)
        |SELECT coalesce(e1, '-') || '>' || coalesce(e2, '-') || '>' || coalesce(e3, '-') AS path,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "graph_clustering_coeff" ->
      s"""WITH $shCte,
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
         |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS degree FROM
         |  (SELECT doc_a AS u FROM p UNION ALL SELECT doc_b FROM p) GROUP BY 1),
         |ed AS (SELECT CASE WHEN da.degree <= db.degree THEN p.doc_a ELSE p.doc_b END AS lo,
         |  CASE WHEN da.degree <= db.degree THEN p.doc_b ELSE p.doc_a END AS hi
         |  FROM p JOIN deg da ON da.u = p.doc_a JOIN deg db ON db.u = p.doc_b),
         |t AS (SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
         |  FROM ed e1 JOIN ed e2 ON e1.lo = e2.lo AND e1.hi < e2.hi
         |  JOIN p ON p.doc_a = e1.hi AND p.doc_b = e2.hi),
         |tc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri FROM
         |  (SELECT unnest([x, y, z]) AS doc_id FROM t) GROUP BY 1)
         |SELECT dd.doc_id, CAST(coalesce(degree, 0) AS BIGINT) AS degree,
         |  CAST(coalesce(n_tri, 0) AS BIGINT) AS n_tri,
         |  CAST(2000 * coalesce(n_tri, 0)
         |    // greatest(coalesce(degree, 0) * (coalesce(degree, 0) - 1), 1) AS BIGINT) AS coeff_pm
         |FROM (SELECT doc_id FROM documents) dd
         |LEFT JOIN deg ON deg.u = dd.doc_id LEFT JOIN tc USING (doc_id)
         |ORDER BY dd.doc_id""".stripMargin,

    "text_pmi_collocations" ->
      """WITH t AS (SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |p AS (SELECT toks[i] AS w1, toks[i+1] AS w2
        |  FROM (SELECT toks, unnest(generate_series(1, len(toks)-1)) AS i
        |        FROM t WHERE len(toks) >= 2)),
        |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy FROM p
        |  GROUP BY 1, 2 HAVING count(*) >= 20),
        |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM (SELECT unnest(toks) AS tok FROM t))
        |SELECT w1, w2, c_xy, ua.c AS c_x, ub.c AS c_y,
        |  CAST((length(bin(least(c_xy, 2147483647) * least(c_xy, 2147483647))) - 1)
        |    + (length(bin(least(n_tokens, 2147483647) * least(n_tokens, 2147483647))) - 1)
        |    - (length(bin(least(ua.c, 2147483647) * least(ua.c, 2147483647))) - 1)
        |    - (length(bin(least(ub.c, 2147483647) * least(ub.c, 2147483647))) - 1) AS BIGINT) AS pmi_hb
        |FROM bc JOIN uni ua ON ua.tok = bc.w1 JOIN uni ub ON ub.tok = bc.w2
        |CROSS JOIN nt ORDER BY 1, 2""".stripMargin,

    "dedup_minhash_calibration" ->
      s"""WITH $plantedCorpusSql,
         |${shingleHashCte("c")},
         |perm AS (SELECT * FROM (VALUES $minhashPermSql) p(i, a, b)),
         |$minhashSigCtes,
         |pr AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bnd x JOIN bnd y
         |  ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
         |eq AS (SELECT pr.doc_a, pr.doc_b, count(*) FILTER (WHERE sa.m = sb.m) AS neq
         |  FROM pr JOIN s sa ON sa.doc_id = pr.doc_a
         |  JOIN s sb ON sb.doc_id = pr.doc_b AND sb.i = sa.i GROUP BY 1, 2),
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
         |iv AS (SELECT pr.doc_a, pr.doc_b, CAST(count(*) AS BIGINT) AS inter_n
         |  FROM pr JOIN sh a ON a.doc_id = pr.doc_a
         |  JOIN sh b ON b.doc_id = pr.doc_b AND b.h = a.h GROUP BY 1, 2),
         |pe AS (SELECT CAST(neq * 1000 // 96 AS BIGINT) AS est_pm,
         |  CAST(1000 * coalesce(inter_n, 0)
         |    // greatest(sa.n_sh + sb.n_sh - coalesce(inter_n, 0), 1) AS BIGINT) AS exact_pm
         |  FROM eq LEFT JOIN iv USING (doc_a, doc_b)
         |  JOIN sz sa ON sa.doc_id = eq.doc_a JOIN sz sb ON sb.doc_id = eq.doc_b)
         |SELECT CAST((est_pm - exact_pm + 1000) // 100 AS BIGINT) AS err_bucket,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(est_pm) // count(*) AS BIGINT) AS avg_est_pm,
         |  CAST(sum(exact_pm) // count(*) AS BIGINT) AS avg_exact_pm
         |FROM pe GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_scd2_lookup" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         |  ${cents("value")} AS value_c FROM events),
         |d AS (SELECT user_id, event_id AS dim_eid, us AS valid_from_us,
         |  value_c AS dim_value_c,
         |  coalesce(lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id),
         |    9223372036854775807) AS valid_to_us,
         |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS dim_version_n
         |  FROM e WHERE event_type = 'click'),
         |f AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'purchase')
         |SELECT f.user_id, f.event_id, f.us,
         |  CAST(coalesce(dim_version_n, -1) AS BIGINT) AS dim_version_n,
         |  CAST(coalesce(dim_value_c, -1) AS BIGINT) AS dim_value_c,
         |  CAST(CASE WHEN dim_eid IS NULL THEN 0 ELSE 1 END AS BIGINT) AS matched
         |FROM f LEFT JOIN d ON d.user_id = f.user_id
         |  AND d.valid_from_us <= f.us AND f.us < d.valid_to_us
         |ORDER BY f.event_id""".stripMargin,

    "q_basket_rules" ->
      """WITH ob AS (SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |tt AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders FROM ob),
        |pb AS (SELECT brand, CAST(count(*) AS BIGINT) AS c FROM ob GROUP BY 1),
        |pr AS (SELECT a.brand AS brand_a, b.brand AS brand_b,
        |  CAST(count(*) AS BIGINT) AS c_ab
        |  FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
        |  GROUP BY 1, 2 HAVING count(*) >= 10)
        |SELECT brand_a, brand_b, c_ab, ca.c AS c_a, cb.c AS c_b,
        |  CAST(1000 * c_ab // n_orders AS BIGINT) AS support_pm,
        |  CAST(1000 * c_ab // ca.c AS BIGINT) AS conf_pm,
        |  CAST(((1000 * c_ab // ca.c) * n_orders) // cb.c AS BIGINT) AS lift_pm
        |FROM pr JOIN pb ca ON ca.brand = brand_a JOIN pb cb ON cb.brand = brand_b
        |CROSS JOIN tt ORDER BY 1, 2""".stripMargin,

    "q_benford" ->
      s"""WITH c AS (SELECT ${cents("o_totalprice")} AS c FROM orders
         |  WHERE ${cents("o_totalprice")} > 0),
         |dg AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         |  CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1),
         |tt AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM dg),
         |bf AS (SELECT * FROM (VALUES (1, 301), (2, 176), (3, 125), (4, 97),
         |  (5, 79), (6, 67), (7, 58), (8, 51), (9, 46)) b(digit, exp_pm))
         |SELECT CAST(bf.digit AS BIGINT) AS digit,
         |  CAST(coalesce(n, 0) AS BIGINT) AS n,
         |  CAST(1000 * coalesce(n, 0) // t AS BIGINT) AS obs_pm,
         |  CAST(exp_pm AS BIGINT) AS exp_pm,
         |  CAST(abs(1000 * coalesce(n, 0) // t - exp_pm) AS BIGINT) AS dev_pm
         |FROM bf LEFT JOIN dg ON dg.digit = bf.digit CROSS JOIN tt
         |ORDER BY 1""".stripMargin,

    "q6_forgone_revenue" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(coalesce(sum(${cents("l_extendedprice * l_discount")}), 0) AS BIGINT) AS forgone_revenue_c,
         |  CAST(coalesce(sum(${cents("l_quantity")}), 0) AS BIGINT) AS sum_qty_c
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07
         |  AND l_quantity < 24.0""".stripMargin,

    "graph_adamic_adar" ->
      s"""WITH $shCte,
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
         |adj AS (SELECT doc_a AS u, doc_b AS v FROM p
         |  UNION ALL SELECT doc_b, doc_a FROM p),
         |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
         |aw AS (SELECT adj.u, adj.v,
         |  CAST(1000 // greatest(length(bin(dg.deg)) - 1, 1) AS BIGINT) AS w
         |  FROM adj JOIN deg dg ON dg.u = adj.v),
         |sc AS (SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS c,
         |  CAST(sum(x.w) AS BIGINT) AS aa
         |  FROM p JOIN aw x ON x.u = p.doc_a
         |  JOIN adj y ON y.u = p.doc_b AND y.v = x.v
         |  GROUP BY 1, 2)
         |SELECT p.doc_a, p.doc_b,
         |  CAST(coalesce(c, 0) AS BIGINT) AS common_nbrs,
         |  CAST(coalesce(aa, 0) AS BIGINT) AS aa_milli
         |FROM p LEFT JOIN sc USING (doc_a, doc_b)
         |ORDER BY 1, 2""".stripMargin,

    "graph_assortativity" ->
      s"""WITH $shCte,
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
         |adj AS (SELECT doc_a AS u, doc_b AS v FROM p
         |  UNION ALL SELECT doc_b, doc_a FROM p),
         |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
         |ed AS (SELECT ds.deg AS deg_src, dd.deg AS deg_dst FROM adj
         |  JOIN deg ds ON ds.u = adj.u JOIN deg dd ON dd.u = adj.v),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n_dir_edges,
         |  CAST(sum(deg_src) // count(*) AS BIGINT) AS mean_src_deg,
         |  CAST(sum(deg_dst) // count(*) AS BIGINT) AS mean_dst_deg FROM ed)
         |SELECT n_dir_edges, mean_src_deg, mean_dst_deg,
         |  CAST(sum((deg_src - mean_src_deg) * (deg_src - mean_src_deg)) AS BIGINT) AS m2x,
         |  CAST(sum((deg_dst - mean_dst_deg) * (deg_dst - mean_dst_deg)) AS BIGINT) AS m2y,
         |  CAST(sum((deg_src - mean_src_deg) * (deg_dst - mean_dst_deg)) AS BIGINT) AS mxy
         |FROM ed CROSS JOIN m GROUP BY 1, 2, 3""".stripMargin,

    "text_source_tvd" -> {
      val b = graft.operators.Sampling.dsirBuckets
      s"""WITH t AS (SELECT source,
         |  unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents),
         |c AS (SELECT source, ('0x' || substr(md5(tok), 1, 15))::BIGINT % $b AS b,
         |  CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1, 2),
         |d AS (SELECT source, b, CAST(1000000 * c
         |  // CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS BIGINT) AS p_ppm FROM c),
         |mg AS (SELECT source, CAST(sum(p_ppm) AS BIGINT) AS sp FROM d GROUP BY 1),
         |sp AS (SELECT a.source AS source_a, b.source AS source_b,
         |  a.sp AS sp_a, b.sp AS sp_b FROM mg a JOIN mg b ON a.source < b.source),
         |ov AS (SELECT a.source AS source_a, b.source AS source_b,
         |  CAST(sum(least(a.p_ppm, b.p_ppm)) AS BIGINT) AS s_min,
         |  CAST(count(*) AS BIGINT) AS cb
         |  FROM d a JOIN d b ON a.b = b.b AND a.source < b.source GROUP BY 1, 2)
         |SELECT source_a, source_b,
         |  CAST(coalesce(cb, 0) AS BIGINT) AS common_buckets,
         |  CAST((sp_a + sp_b - 2 * coalesce(s_min, 0)) // 2 AS BIGINT) AS tvd_ppm
         |FROM sp LEFT JOIN ov USING (source_a, source_b)
         |ORDER BY 1, 2""".stripMargin
    },

    "text_length_gini" ->
      """WITH h AS (SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |k AS (SELECT source, v, c,
        |  CAST(sum(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cum FROM h)
        |SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
        |  CAST(sum(v * c) AS BIGINT) AS sum_chars,
        |  CAST(1000 * (sum(v * c * (2 * cum - c + 1)) - (sum(c) + 1) * sum(v * c))
        |    // greatest(sum(c) * sum(v * c), 1) AS BIGINT) AS gini_pm
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_hot_keys" ->
      """WITH u AS (SELECT 'events' AS tbl, user_id AS entity FROM events
        |  UNION ALL SELECT 'orders', o_custkey FROM orders),
        |c AS (SELECT tbl, entity, CAST(count(*) AS BIGINT) AS n_changes
        |  FROM u GROUP BY 1, 2),
        |tt AS (SELECT tbl, CAST(sum(n_changes) AS BIGINT) AS t FROM c GROUP BY 1),
        |r AS (SELECT tbl, entity, n_changes,
        |  CAST(row_number() OVER (PARTITION BY tbl ORDER BY n_changes DESC, entity) AS BIGINT) AS rank
        |  FROM c)
        |SELECT r.tbl, rank, CAST(entity AS BIGINT) AS entity, n_changes,
        |  CAST(1000 * n_changes // tt.t AS BIGINT) AS share_pm
        |FROM r JOIN tt ON tt.tbl = r.tbl WHERE rank <= 10
        |ORDER BY 1, 2""".stripMargin,

    "ts_calendar_profile" ->
      s"""WITH e AS (SELECT epoch_us(ts) AS us, ${cents("value")} AS v_c FROM events),
         |c AS (SELECT (us // 86400000000 + 4) % 7 AS dow,
         |  (us // 3600000000) % 24 AS hour,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(v_c) AS BIGINT) AS value_c FROM e GROUP BY 1, 2),
         |tt AS (SELECT CAST(sum(n_events) AS BIGINT) AS t FROM c)
         |SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
         |  n_events, value_c,
         |  CAST(1000 * n_events // t AS BIGINT) AS share_pm
         |FROM c CROSS JOIN tt ORDER BY 1, 2""".stripMargin,

    "ts_growth_accounting" ->
      """WITH du AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id,
        |  CAST(count(*) AS BIGINT) AS n_ev FROM events GROUP BY 1, 2),
        |d AS (SELECT day, CAST(count(*) AS BIGINT) AS dau,
        |  CAST(sum(n_ev) AS BIGINT) AS n_events FROM du GROUP BY 1),
        |f AS (SELECT min_day AS day, CAST(count(*) AS BIGINT) AS new_users FROM (
        |  SELECT user_id, min(day) AS min_day FROM du GROUP BY 1) GROUP BY 1)
        |SELECT CAST(d.day AS BIGINT) AS day, dau,
        |  CAST(coalesce(new_users, 0) AS BIGINT) AS new_users,
        |  CAST(dau - coalesce(new_users, 0) AS BIGINT) AS returning_users,
        |  CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY d.day) AS BIGINT) AS cum_users,
        |  n_events
        |FROM d LEFT JOIN f ON f.day = d.day ORDER BY d.day""".stripMargin,

    "q13_custdist" ->
      """WITH pc AS (SELECT c_custkey, CAST(count(o_custkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY 1)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM pc GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |    AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) + 7776000000000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_ri_audit" ->
      """WITH e1 AS (SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
        |  CAST(count(*) AS BIGINT) AS n_child,
        |  CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS n_orphans
        |  FROM lineitem LEFT JOIN orders ON o_orderkey = l_orderkey),
        |e2 AS (SELECT 'lineitem.l_partkey->part',
        |  CAST(count(*) AS BIGINT),
        |  CAST(count(*) FILTER (WHERE p_partkey IS NULL) AS BIGINT)
        |  FROM lineitem LEFT JOIN part ON p_partkey = l_partkey),
        |e3 AS (SELECT 'orders.o_custkey->customer',
        |  CAST(count(*) AS BIGINT),
        |  CAST(count(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT)
        |  FROM orders LEFT JOIN customer ON c_custkey = o_custkey)
        |SELECT fk_edge, n_child, n_orphans,
        |  CAST(1000 * n_orphans // greatest(n_child, 1) AS BIGINT) AS orphan_pm
        |FROM (SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3)
        |ORDER BY fk_edge""".stripMargin,

    "ts_wow_change" ->
      s"""WITH wk AS (SELECT event_type, epoch_us(ts) // 604800000000 AS week,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(${cents("value")}) AS BIGINT) AS value_c
         |  FROM events GROUP BY 1, 2),
         |lg AS (SELECT *, lag(n) OVER (PARTITION BY event_type ORDER BY week) AS np
         |  FROM wk)
         |SELECT event_type, CAST(week AS BIGINT) AS week, n, value_c,
         |  CAST(coalesce(np, 0) AS BIGINT) AS n_prev,
         |  CAST(CASE WHEN np IS NULL THEN -1
         |    WHEN n >= np THEN 1000 * (n - np) // greatest(np, 1)
         |    ELSE -(1000 * (np - n) // np) END AS BIGINT) AS wow_pm
         |FROM lg ORDER BY 1, 2""".stripMargin,

    "ts_session_concurrency" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |d AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us FROM e),
        |s AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session FROM d),
        |g AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM s),
        |sess AS (SELECT min(us) AS start_us, max(us) AS end_us FROM g
        |  GROUP BY user_id, session_id),
        |seg0 AS (SELECT start_us, end_us,
        |  unnest(generate_series(start_us // 86400000000, end_us // 86400000000)) AS day
        |  FROM sess),
        |seg AS (SELECT day, greatest(start_us, day * 86400000000) AS ss,
        |  least(end_us, (day + 1) * 86400000000 - 1) AS se FROM seg0),
        |pts AS (SELECT day, ss AS us, 1 AS delta FROM seg
        |  UNION ALL SELECT day, se, -1 FROM seg),
        |run AS (SELECT day, CAST(sum(delta) OVER (PARTITION BY day ORDER BY us, delta DESC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run FROM pts)
        |SELECT CAST(day AS BIGINT) AS day,
        |  CAST(count(*) // 2 AS BIGINT) AS n_segments,
        |  CAST(max(run) AS BIGINT) AS peak_concurrency
        |FROM run GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_audience_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1),
        |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  CAST(count(*) AS BIGINT) AS n_both
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n_both, pa.n AS n_a, pb.n AS n_b,
        |  CAST(1000 * n_both // (pa.n + pb.n - n_both) AS BIGINT) AS jaccard_pm
        |FROM pr JOIN pt pa ON pa.event_type = type_a
        |JOIN pt pb ON pb.event_type = type_b
        |ORDER BY 1, 2""".stripMargin,

    "ts_drawdown" ->
      s"""WITH daily AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         |  CAST(sum(${cents("value")}) AS BIGINT) AS net_c
         |  FROM events GROUP BY 1, 2),
         |r AS (SELECT user_id, day, net_c,
         |  CAST(sum(net_c) OVER (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS bal
         |  FROM daily),
         |r2 AS (SELECT user_id, net_c, bal,
         |  CAST(max(bal) OVER (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak
         |  FROM r)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
         |  CAST(sum(net_c) AS BIGINT) AS final_balance_c,
         |  CAST(max(peak) AS BIGINT) AS peak_balance_c,
         |  CAST(max(peak - bal) AS BIGINT) AS max_drawdown_c
         |FROM r2 GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_df_profile" ->
      """WITH shx AS (SELECT unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks)-2, 1)),
        |    i -> array_to_string(toks[i:i+2], ' ')))) AS sh
        |  FROM (SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents)),
        |d AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM shx GROUP BY 1),
        |b AS (SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS log2_df,
        |  CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(df) AS BIGINT) AS n_postings,
        |  CAST(sum(df * (df - 1) // 2) AS BIGINT) AS pair_mass FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(pair_mass) AS BIGINT) AS tm FROM b)
        |SELECT log2_df, n_shingles, n_postings, pair_mass,
        |  CAST(1000 * pair_mass // greatest(tm, 1) AS BIGINT) AS pair_mass_pm
        |FROM b CROSS JOIN t ORDER BY 1""".stripMargin,

    "ts_purchase_gaps" ->
      """WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |  WHERE event_type = 'purchase'),
        |g AS (SELECT (us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id))
        |  // 60000000 AS gap_min FROM p),
        |b AS (SELECT CAST(CASE WHEN gap_min <= 0 THEN 0
        |    ELSE length(bin(gap_min)) END AS BIGINT) AS log2_gap_min,
        |  CAST(count(*) AS BIGINT) AS n_gaps
        |  FROM g WHERE gap_min IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(sum(n_gaps) AS BIGINT) AS t FROM b)
        |SELECT log2_gap_min, n_gaps,
        |  CAST(1000 * n_gaps // t AS BIGINT) AS share_pm
        |FROM b CROSS JOIN t ORDER BY 1""".stripMargin,

    "q7_trade_matrix" ->
      s"""SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         |  CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(${cents("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS revenue_c
         |FROM lineitem
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN nation ns ON ns.n_nationkey = s_nationkey
         |JOIN nation nc ON nc.n_nationkey = c_nationkey
         |WHERE s_nationkey <> c_nationkey
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q9_part_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(sum(${cents("l_extendedprice * (1 - l_discount)")}
         |    - ${cents("p_retailprice")} * CAST(l_quantity AS BIGINT) // 10) AS BIGINT)
         |    AS profit_c
         |FROM lineitem
         |JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN nation ON n_nationkey = s_nationkey
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q18_large_orders" ->
      s"""WITH big AS (SELECT l_orderkey,
         |  CAST(sum(l_quantity) AS BIGINT) AS total_qty
         |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
         |SELECT c_name, c_custkey, o_orderkey,
         |  epoch_us(o_orderdate) AS od_us,
         |  ${cents("o_totalprice")} AS totalprice_c, total_qty
         |FROM big
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |ORDER BY totalprice_c DESC, o_orderkey LIMIT 100""".stripMargin,

    "q10_returned_revenue" ->
      s"""WITH r AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(${cents("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
         |    AS revenue_c
         |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         |  WHERE l_returnflag = 'R'
         |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
         |  GROUP BY 1)
         |SELECT c_custkey, c_name, n_name,
         |  ${cents("c_acctbal")} AS acctbal_c, n_lines, revenue_c
         |FROM r JOIN customer ON c_custkey = o_custkey
         |JOIN nation ON n_nationkey = c_nationkey
         |ORDER BY revenue_c DESC, c_custkey LIMIT 20""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (SELECT l_suppkey,
         |  CAST(sum(${cents("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
         |    AS total_revenue_c
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_revenue_c
         |FROM rev JOIN supplier ON s_suppkey = l_suppkey
         |WHERE total_revenue_c = (SELECT max(total_revenue_c) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q19_disjunctive_revenue" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(coalesce(sum(${cents("l_extendedprice * (1 - l_discount)")}), 0)
         |    AS BIGINT) AS revenue_c
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |    AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |    AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q8_market_share" ->
      s"""WITH v AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  ${cents("l_extendedprice * (1 - l_discount)")} AS rev_c,
         |  CASE WHEN s_nationkey = (SELECT n_nationkey FROM nation
         |    WHERE n_name = 'NATION_1') THEN 1 ELSE 0 END AS is_nation
         |  FROM lineitem
         |  JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY'
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation cn ON cn.n_nationkey = c_nationkey
         |  JOIN region ON r_regionkey = cn.n_regionkey AND r_name = 'AMERICA'
         |  JOIN supplier ON s_suppkey = l_suppkey)
         |SELECT o_year,
         |  CAST(sum(CASE WHEN is_nation = 1 THEN rev_c ELSE 0 END) AS BIGINT)
         |    AS nation_rev_c,
         |  CAST(sum(rev_c) AS BIGINT) AS total_rev_c,
         |  CAST(1000 * sum(CASE WHEN is_nation = 1 THEN rev_c ELSE 0 END)
         |    // sum(rev_c) AS BIGINT) AS mkt_share_pm
         |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,

    "q14_promo_share" ->
      s"""SELECT
         |  CAST(sum(CASE WHEN p_type = 'PROMO'
         |    THEN ${cents("l_extendedprice * (1 - l_discount)")} ELSE 0 END)
         |    AS BIGINT) AS promo_rev_c,
         |  CAST(sum(${cents("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
         |    AS total_rev_c,
         |  CAST(1000 * sum(CASE WHEN p_type = 'PROMO'
         |    THEN ${cents("l_extendedprice * (1 - l_discount)")} ELSE 0 END)
         |    // sum(${cents("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
         |    AS promo_pm
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'""".stripMargin,

    "q17_small_quantity" ->
      s"""WITH bl AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         |  ${cents("l_extendedprice")} AS price_c
         |  FROM lineitem JOIN part ON p_partkey = l_partkey
         |  WHERE p_brand = 'Brand#12'),
         |pp AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(qty) AS BIGINT) AS sum_qty FROM bl GROUP BY 1),
         |f AS (SELECT price_c FROM bl JOIN pp USING (l_partkey)
         |  WHERE 5 * qty * n < sum_qty)
         |SELECT CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(coalesce(sum(price_c), 0) AS BIGINT) AS revenue_c,
         |  CAST(coalesce(sum(price_c), 0) // 7 AS BIGINT) AS avg_yearly_c
         |FROM f""".stripMargin,

    "q22_sales_opportunity" ->
      s"""WITH c AS (SELECT c_custkey, c_nationkey,
         |  ${cents("c_acctbal")} AS bal_c FROM customer),
         |t AS (SELECT CAST(sum(bal_c) // count(*) AS BIGINT) AS thr_c
         |  FROM c WHERE bal_c > 0)
         |SELECT n_name, CAST(count(*) AS BIGINT) AS n_custs,
         |  CAST(sum(bal_c) AS BIGINT) AS total_bal_c
         |FROM c CROSS JOIN t
         |JOIN nation ON n_nationkey = c_nationkey
         |WHERE bal_c > thr_c
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // r16: the derived-supplement six — each oracle re-derives
    // partsupp / the ship columns from the same parquet inputs via the
    // shared CTE fragments (Tables.partsuppSql / lineitemShipSql), so
    // the gate compares full query semantics INCLUDING the derivation
    "q2_min_cost_supp" ->
      s"""WITH ${Tables.partsuppSql},
         |es AS (SELECT s_suppkey, s_name, n_name,
         |  ${cents("s_acctbal")} AS acctbal_c
         |  FROM supplier JOIN nation ON n_nationkey = s_nationkey
         |  JOIN region ON r_regionkey = n_regionkey
         |  WHERE r_name = 'EUROPE'),
         |cand AS (SELECT * FROM partsupp JOIN es ON s_suppkey = ps_suppkey
         |  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'),
         |mc AS (SELECT ps_partkey AS mk, min(ps_supplycost_c) AS min_cost_c
         |  FROM cand GROUP BY 1)
         |SELECT DISTINCT acctbal_c, s_name, n_name, ps_partkey AS p_partkey,
         |  p_brand, ps_supplycost_c
         |FROM cand JOIN mc ON ps_partkey = mk
         |  AND ps_supplycost_c = min_cost_c
         |ORDER BY acctbal_c DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,

    "q11_important_stock" ->
      s"""WITH ${Tables.partsuppSql},
         |held AS (SELECT ps_partkey,
         |  ps_supplycost_c * ps_availqty AS v FROM partsupp
         |  WHERE ps_suppkey IN (SELECT s_suppkey FROM supplier
         |    JOIN nation ON n_nationkey = s_nationkey
         |    WHERE n_name = 'NATION_3')),
         |t AS (SELECT CAST(sum(v) AS BIGINT) AS total_c FROM held),
         |pp AS (SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS value_c
         |  FROM held GROUP BY 1)
         |SELECT ps_partkey, value_c FROM pp CROSS JOIN t
         |WHERE value_c * 10000 > total_c
         |ORDER BY value_c DESC, ps_partkey""".stripMargin,

    "q12_shipmode_priority" ->
      s"""WITH ${Tables.lineitemShipSql}
         |SELECT l_shipmode,
         |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM lineitem_ship JOIN orders ON o_orderkey = l_orderkey
         |WHERE l_shipmode IN ('MAIL', 'SHIP')
         |  AND l_commit_us < l_receipt_us
         |  AND epoch_us(l_shipdate) < l_commit_us
         |  AND l_receipt_us >= 788918400000000
         |  AND l_receipt_us < 820454400000000
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q16_supplier_counts" ->
      s"""WITH ${Tables.partsuppSql}
         |SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
         |  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
         |FROM partsupp
         |WHERE p_brand <> 'Brand#12' AND p_type <> 'PROMO'
         |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
         |    WHERE s_suppkey % 7 = 3)
         |GROUP BY 1, 2, 3
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q20_part_promotion" ->
      s"""WITH fp AS (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%'),
         |st AS (SELECT l_partkey, l_suppkey,
         |  CAST(sum(l_quantity) AS BIGINT) AS shipped_qty,
         |  ${Tables.availqtySql("l_partkey", "l_suppkey")} AS availqty
         |  FROM lineitem
         |  WHERE l_partkey IN (SELECT p_partkey FROM fp)
         |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
         |  GROUP BY 1, 2),
         |t AS (SELECT CAST(sum(shipped_qty) AS BIGINT) AS tot_shipped,
         |  CAST(sum(availqty) AS BIGINT) AS tot_avail FROM st),
         |ex AS (SELECT DISTINCT l_suppkey FROM st CROSS JOIN t
         |  WHERE availqty * tot_shipped > shipped_qty * tot_avail)
         |SELECT s_suppkey, s_name FROM supplier
         |JOIN nation ON n_nationkey = s_nationkey
         |WHERE n_name = 'NATION_3'
         |  AND s_suppkey IN (SELECT l_suppkey FROM ex)
         |ORDER BY s_name""".stripMargin,

    "q21_late_suppliers" ->
      s"""WITH ${Tables.lineitemShipSql},
         |li AS (SELECT l_orderkey, l_suppkey,
         |  CASE WHEN l_receipt_us > l_commit_us THEN 1 ELSE 0 END AS late
         |  FROM lineitem_ship),
         |po AS (SELECT l_orderkey,
         |  count(DISTINCT l_suppkey) AS n_supps,
         |  count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END)
         |    AS n_late_supps,
         |  max(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp,
         |  CAST(sum(late) AS BIGINT) AS ll FROM li GROUP BY 1),
         |surv AS (SELECT * FROM po WHERE n_supps > 1 AND n_late_supps = 1
         |  AND l_orderkey IN (SELECT o_orderkey FROM orders
         |    WHERE o_orderstatus = 'F'))
         |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait,
         |  CAST(sum(ll) AS BIGINT) AS late_lines
         |FROM surv JOIN supplier ON s_suppkey = late_supp
         |JOIN nation ON n_nationkey = s_nationkey
         |WHERE n_name = 'NATION_3'
         |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin
  )

  /** Shared structural gate for the ANN top-k rungs: every query holds
    * exactly k=5 ranked rows (ranks 1..5, no duplicate neighbors), the
    * reported score is a valid e6 cosine, and rows are ordered by the
    * score they claim to be ranked by. */
  private def annRungCheck(score: String): String =
    s"""SELECT 'rank_shape' AS chk, query_id FROM result GROUP BY query_id
       HAVING count(*) <> 5 OR min(rank) <> 1 OR max(rank) <> 5
          OR count(DISTINCT rank) <> 5 OR count(DISTINCT neighbor_id) <> 5
       UNION ALL
       SELECT 'score_range', query_id FROM result
       WHERE $score < -1000000 OR $score > 1000000
       UNION ALL
       SELECT 'rank_monotone', query_id FROM (
         SELECT query_id, $score AS s,
                lag($score) OVER (PARTITION BY query_id ORDER BY rank) AS p
         FROM result) WHERE p IS NOT NULL AND s > p"""

  /** STRUCTURAL gates for the rows-kind queries (no value oracle is
    * possible — float geometry, JVM codec bytes — but SHAPE is still
    * checkable): DuckDB SQL over the view `result` (the Verify dump
    * for that query) plus the sf tables; every returned row is a NAMED
    * violation, so zero rows = pass. Dumped by Verify as
    * rows_checks.json next to oracle_sql.json; tools/check_oracle.py
    * runs them in the same pass as the hash gates. This narrows the
    * rows-kind trust gap from "non-empty" to "shape-verified":
    * cardinalities tie back to the SOURCE tables (16·|docs| histogram
    * rows, one row per document, plants all dropped), orderings and
    * bounds are pinned, and per-mille ratios are recomputed. */
  def rowsChecks: Map[String, String] = Map(
    "ann_lsh_topk" -> annRungCheck("cos_e6"),
    "ann_ivf_kmeans" -> annRungCheck("cos_e6"),
    "ann_pq_adc" -> annRungCheck("cos_e6"),
    "ann_sq_topk" -> annRungCheck("cos_e6"),
    "ann_ivf_pq" -> annRungCheck("cos_e6"),

    "ann_mmr_topk" ->
      """SELECT 'rank_shape' AS chk, query_id FROM result GROUP BY query_id
        |HAVING count(*) <> 5 OR min(rank) <> 1 OR max(rank) <> 5
        |   OR count(DISTINCT rank) <> 5 OR count(DISTINCT neighbor_id) <> 5
        |UNION ALL
        |SELECT 'rel_range', query_id FROM result
        |WHERE rel_e6 < -1000000 OR rel_e6 > 1000000
        |UNION ALL
        |SELECT 'first_is_most_relevant', query_id FROM (
        |  SELECT query_id,
        |         max_by(rel_e6, -rank) AS first_rel, max(rel_e6) AS max_rel
        |  FROM result GROUP BY query_id) WHERE first_rel <> max_rel""".stripMargin,

    "ann_recall_report" ->
      """SELECT 'four_rungs' AS chk, CAST(NULL AS VARCHAR) AS method
        |FROM result HAVING count(*) <> 4
        |UNION ALL
        |SELECT 'methods', method FROM result
        |WHERE method NOT IN ('lsh', 'ivf', 'ivf_pq', 'sq8')
        |UNION ALL
        |SELECT 'recall_identity', method FROM result
        |WHERE n_hits < 0 OR n_hits > n_truth
        |   OR recall_pm <> n_hits * 1000 // n_truth
        |UNION ALL
        |SELECT 'floor', method FROM result
        |WHERE recall_pm > 1000
        |   OR (method = 'lsh'    AND recall_pm < 700)
        |   OR (method = 'ivf'    AND recall_pm < 300)
        |   OR (method = 'ivf_pq' AND recall_pm < 300)
        |   OR (method = 'sq8'    AND recall_pm < 700)""".stripMargin,

    "ann_cell_split" ->
      """SELECT 'two_children' AS chk, CAST(NULL AS BIGINT) AS cell
        |FROM result WHERE parent <> -1
        |HAVING count(*) <> 2 OR count(DISTINCT cell) <> 2
        |   OR count(DISTINCT parent) <> 1
        |UNION ALL
        |SELECT 'mass_conserved', CAST(NULL AS BIGINT) FROM result
        |HAVING CAST(sum(n_vecs) AS BIGINT) <>
        |  (SELECT count(*) FROM embeddings)
        |UNION ALL
        |SELECT 'parent_retired', cell FROM result
        |WHERE cell IN (SELECT parent FROM result WHERE parent <> -1)
        |UNION ALL
        |SELECT 'parent_is_a_label', parent FROM result
        |WHERE parent <> -1 AND parent NOT IN
        |  (SELECT CAST(label AS BIGINT) FROM embeddings)
        |UNION ALL
        |SELECT 'child_ids_fresh', cell FROM result
        |WHERE parent <> -1 AND cell <=
        |  (SELECT max(CAST(label AS BIGINT)) FROM embeddings)
        |UNION ALL
        |SELECT 'untouched_are_labels', cell FROM result
        |WHERE parent = -1 AND cell NOT IN
        |  (SELECT CAST(label AS BIGINT) FROM embeddings)
        |UNION ALL
        |SELECT 'resid_bounds', cell FROM result
        |WHERE n_vecs < 1 OR mean_resid_e6 < 0 OR mean_resid_e6 > 2000000""".stripMargin,

    "dedup_semantic" ->
      """SELECT 'corpus_partition' AS chk, CAST(NULL AS BIGINT) AS vec_id
        |FROM result HAVING count(*) <>
        |  (SELECT count(*) + 100 FROM embeddings)
        |  OR count(DISTINCT vec_id) <> count(*)
        |UNION ALL
        |SELECT 'kept_domain', vec_id FROM result WHERE kept NOT IN (0, 1)
        |UNION ALL
        |SELECT 'plants_dropped', vec_id FROM result
        |WHERE vec_id >= 1000000 AND kept <> 0
        |UNION ALL
        |SELECT 'originals_kept', vec_id FROM result
        |WHERE vec_id < 100 AND kept <> 1""".stripMargin,

    "dedup_embedding_lsh" ->
      """SELECT 'canonical_order' AS chk, vec_a FROM result
        |WHERE vec_a >= vec_b
        |UNION ALL
        |SELECT 'plant_pairs_found', CAST(v AS BIGINT) FROM (
        |  SELECT unnest(generate_series(0, 99)) AS v) plants
        |WHERE NOT EXISTS (SELECT 1 FROM result
        |  WHERE vec_a = v AND vec_b = v + 1000000 AND cos_e6 >= 999990)""".stripMargin,

    "text_compression_ratio" ->
      """SELECT 'one_row_per_doc' AS chk, d.doc_id FROM documents d
        |FULL OUTER JOIN result r ON d.doc_id = r.doc_id
        |WHERE d.doc_id IS NULL OR r.doc_id IS NULL
        |UNION ALL
        |SELECT 'raw_bytes_exact', r.doc_id FROM result r JOIN documents d
        |ON d.doc_id = r.doc_id
        |WHERE r.raw_bytes <> octet_length(CAST(d.text AS BLOB))
        |UNION ALL
        |SELECT 'ratio_identity', doc_id FROM result
        |WHERE deflate_bytes <= 0
        |   OR ratio_pm <> deflate_bytes * 1000 // greatest(raw_bytes, 1)""".stripMargin,

    "mm_decode_features" ->
      """SELECT 'one_row_per_doc' AS chk, d.doc_id FROM documents d
        |FULL OUTER JOIN result r ON d.doc_id = r.doc_id
        |WHERE d.doc_id IS NULL OR r.doc_id IS NULL
        |UNION ALL
        |SELECT 'dims_positive', doc_id FROM result
        |WHERE width < 1 OR height < 1 OR n_frames < 1""".stripMargin,

    "mm_resize" ->
      """SELECT 'one_row_per_doc' AS chk, d.doc_id FROM documents d
        |FULL OUTER JOIN result r ON d.doc_id = r.doc_id
        |WHERE d.doc_id IS NULL OR r.doc_id IS NULL
        |UNION ALL
        |SELECT 'thumb_dims', doc_id FROM result
        |WHERE out_w <> 32 OR out_h <> 32""".stripMargin,

    "mm_frame_sample" ->
      """SELECT 'all_docs_sampled' AS chk, d.doc_id FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM result r WHERE r.doc_id = d.doc_id)
        |UNION ALL
        |SELECT 'frame_idx_unique', doc_id FROM result
        |GROUP BY doc_id, frame_idx HAVING count(*) > 1
        |UNION ALL
        |SELECT 'luma_range', doc_id FROM result
        |WHERE frame_idx < 0 OR mean_luma < -1 OR mean_luma > 255""".stripMargin,

    "mm_phash_dedup" ->
      """SELECT 'canonical_order' AS chk, doc_a FROM result
        |WHERE doc_a >= doc_b
        |UNION ALL
        |SELECT 'hamming_range', doc_a FROM result
        |WHERE hamming < 0 OR hamming > 64""".stripMargin,

    "mm_audio_features" ->
      """SELECT 'one_row_per_doc' AS chk, d.doc_id FROM documents d
        |FULL OUTER JOIN result r ON d.doc_id = r.doc_id
        |WHERE d.doc_id IS NULL OR r.doc_id IS NULL
        |UNION ALL
        |SELECT 'signal_bounds', doc_id FROM result
        |WHERE channels < 1 OR sample_rate <= 0 OR n_samples < 0
        |   OR rms < 0 OR rms > peak""".stripMargin,

    "mm_audio_segments" ->
      """SELECT 'interval_valid' AS chk, doc_id FROM result
        |WHERE start_ms < 0 OR start_ms >= end_ms OR seg_idx < 0 OR mean_rms < 0
        |UNION ALL
        |SELECT 'non_overlapping', doc_id FROM (
        |  SELECT doc_id, start_ms,
        |         lag(end_ms) OVER (PARTITION BY doc_id ORDER BY seg_idx) AS pe
        |  FROM result) WHERE pe IS NOT NULL AND start_ms < pe""".stripMargin,

    "mm_audio_resample" ->
      """SELECT 'one_row_per_doc' AS chk, d.doc_id FROM documents d
        |FULL OUTER JOIN result r ON d.doc_id = r.doc_id
        |WHERE d.doc_id IS NULL OR r.doc_id IS NULL
        |UNION ALL
        |SELECT 'rate_conservation', doc_id FROM result
        |WHERE rate_in <= 0 OR rate_out <= 0
        |   OR abs(n_out * rate_in - n_in * rate_out) >= rate_in""".stripMargin,

    "mm_audio_snr" ->
      """SELECT 'one_row_per_doc' AS chk, d.doc_id FROM documents d
        |FULL OUTER JOIN result r ON d.doc_id = r.doc_id
        |WHERE d.doc_id IS NULL OR r.doc_id IS NULL
        |UNION ALL
        |SELECT 'nonneg', doc_id FROM result
        |WHERE n_frames < 0 OR noise_rms < 0 OR signal_rms < 0 OR src IS NULL""".stripMargin,

    "mm_image_histogram" ->
      """SELECT 'sixteen_bins_per_doc' AS chk, d.doc_id FROM documents d
        |LEFT JOIN (SELECT doc_id, count(*) AS nb, min(bin) AS mn, max(bin) AS mx,
        |             count(DISTINCT bin) AS nd, sum(n_px) AS px,
        |             min(src) AS s FROM result GROUP BY doc_id) h
        |ON d.doc_id = h.doc_id
        |WHERE h.doc_id IS NULL OR nb <> 16 OR mn <> 0 OR mx <> 15 OR nd <> 16
        |UNION ALL
        |SELECT 'row_count', CAST(NULL AS BIGINT) FROM result
        |HAVING count(*) <> 16 * (SELECT count(*) FROM documents)
        |UNION ALL
        |SELECT 'stub_rows_zeroed', doc_id FROM (
        |  SELECT doc_id, min(src) AS s, sum(n_px) AS px, min(n_px) AS mnp
        |  FROM result GROUP BY doc_id)
        |WHERE mnp < 0 OR (s = 'stub' AND px <> 0) OR (s <> 'stub' AND px <= 0)""".stripMargin,

    "mm_image_entropy" ->
      """SELECT 'one_row_per_doc' AS chk, d.doc_id FROM documents d
        |FULL OUTER JOIN result r ON d.doc_id = r.doc_id
        |WHERE d.doc_id IS NULL OR r.doc_id IS NULL
        |UNION ALL
        |SELECT 'entropy_bounds', doc_id FROM result
        |WHERE n_px < 0 OR entropy_mb < 0 OR entropy_mb > 4000
        |   OR (src = 'stub' AND entropy_mb <> 0)""".stripMargin,

    "mm_keyframes" ->
      """SELECT 'all_docs_covered' AS chk, d.doc_id FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM result r WHERE r.doc_id = d.doc_id)
        |UNION ALL
        |SELECT 'first_frame_kept', doc_id FROM (
        |  SELECT doc_id, min_by(reason, frame_idx) AS r0, min(frame_idx) AS f0
        |  FROM result GROUP BY doc_id) WHERE f0 <> 0 OR r0 <> 'first'
        |UNION ALL
        |SELECT 'bounds', doc_id FROM result
        |WHERE frame_idx < 0 OR mean_luma < -1 OR mean_luma > 255
        |   OR delta_luma < 0 OR delta_luma > 255 OR reason IS NULL""".stripMargin
  )
}
