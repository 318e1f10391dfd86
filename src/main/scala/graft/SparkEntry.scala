package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.multimodal.MultimodalOps
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator appears twice: a Spark implementation in
  * `queries` and a DuckDB-equivalent SQL in `oracleSql` with IDENTICAL
  * output column names (the driver sorts columns by name before
  * hashing). Non-SQL-expressible ops omit the oracle entry (driver
  * falls back to a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reference workloads re-expressed (SURVEY.md §2.2)
    "word_count"      -> (TextOps.wordCount _),
    "mr_word_count"   -> (graft.mr.MrQueries.mrWordCount _),
    "grep"            -> (TextOps.grep _),
    "distinct_tokens" -> (TextOps.distinctTokens _),
    // Relational surface (SURVEY.md §2.3 EXT)
    "q1_pricing"        -> (RelationalOps.q1Pricing _),
    "q3_top_revenue"    -> (RelationalOps.q3TopRevenue _),
    "q5_region_revenue" -> (RelationalOps.q5RegionRevenue _),
    "join_semi"         -> (RelationalOps.semiJoinCustomers _),
    "join_anti"         -> (RelationalOps.antiJoinCustomers _),
    "join_outer_stats"  -> (RelationalOps.outerJoinOrderStats _),
    "agg_stats"         -> (RelationalOps.aggStatsByPriority _),
    "monthly_orders"    -> (RelationalOps.monthlyOrders _),
    "top_orders"        -> (RelationalOps.topOrders _),
    "agg_percentiles"   -> (RelationalOps.percentiles _),
    "q14_promo"         -> (RelationalOps.promoRevenue _),
    "q6_forecast"       -> (RelationalOps.q6Forecast _),
    "agg_histogram"     -> (RelationalOps.histQuantity _),
    "agg_approx"        -> (RelationalOps.approxSketches _),
    "validate_lineitem" -> (RelationalOps.validateLineitem _),
    "set_ops"           -> (RelationalOps.setOpsSegments _),
    "rollup_revenue"    -> (RelationalOps.rollupRevenue _),
    "cube_revenue"      -> (RelationalOps.cubeRevenue _),
    "unpivot_revenue"   -> (RelationalOps.unpivotRevenue _),
    "agg_mode"          -> (RelationalOps.modeOrderStatus _),
    "q18_large_volume"  -> (RelationalOps.q18LargeVolume _),
    "window_order_rank" -> (RelationalOps.windowOrderRank _),
    "join_full_outer"   -> (RelationalOps.fullOuterNation _),
    "join_bucketed"     -> (ScaleOps.bucketedOrderStats _),
    "agg_salted"        -> (ScaleOps.saltedTypeRevenue _),
    "agg_salted_collect" -> (ScaleOps.saltedLangDocs _),
    "join_salted"       -> (ScaleOps.saltedJoinAboveMean _),
    "layout_zorder"     -> (ScaleOps.zorderKeys _),
    "join_bloom"        -> (ScaleOps.bloomJoinRevenue _),
    "pivot_status"      -> (RelationalOps.pivotStatus _),
    // Events (windows / sessionization / JSON / distinct)
    "evt_hourly"       -> (EventOps.hourly _),
    "evt_sessions"     -> (EventOps.sessions _),
    "evt_overlap"      -> (EventOps.sessionOverlap _),
    "evt_json"         -> (EventOps.jsonExtract _),
    "evt_daily_active" -> (EventOps.dailyActive _),
    "evt_gap_fill"     -> (EventOps.gapFillDaily _),
    "agg_hll_merge"    -> (EventOps.hllWeekly _),
    "evt_asof"         -> (AsOfOps.eventAsOfPurchase _),
    "evt_funnel"       -> (EventOps.funnel _),
    "evt_retention"    -> (EventOps.retention _),
    "evt_rolling"      -> (EventOps.rolling7d _),
    "evt_dow_profile"  -> (EventOps.dowProfile _),
    "evt_prune"        -> (EventOps.prunedWindow _),
    "evt_dpp"          -> (EventOps.dppTopDays _),
    // Structured Streaming under the hash gate: the watermark-window
    // pipeline driven to completion; oracle = the batch twin SQL
    "stream_hourly"    -> (graft.streaming.EventStreams.streamHourly _),
    "stream_sessions"  -> (graft.streaming.EventStreams.streamSessions _),
    "stream_dedup"     -> (graft.streaming.EventStreams.streamDedup _),
    "stream_attribution" -> (graft.streaming.EventStreams.streamAttribution _),
    // Deduplication suite (training-data pipeline extensions)
    "dedup_exact"         -> (DedupOps.dedupExact _),
    "dedup_minhash"       -> (DedupOps.dedupMinhash _),
    "graph_pagerank"      -> (GraphOps.pagerank _),
    "graph_triangles"     -> (GraphOps.triangles _),
    "dedup_simhash"       -> (DedupOps.dedupSimhash _),
    "dedup_ngram_jaccard" -> (DedupOps.dedupNgramJaccard _),
    "dedup_embedding"     -> (DedupOps.dedupEmbedding _),
    "dedup_embedding_lsh" -> (SimilarityOps.dedupEmbeddingLsh _),
    "dedup_semantic"      -> (SimilarityOps.dedupSemantic _),
    "dedup_clusters"      -> (DedupOps.dedupClusters _),
    "agg_minhash_sig"     -> (DedupOps.groupMinhashSig _),
    "sample_hash"         -> (DedupOps.sampleHash _),
    "dedup_editdist"      -> (DedupOps.dedupEditDistance _),
    "agg_corr"            -> (RelationalOps.corrQtyPrice _),
    // Similarity search
    "sim_brute_topk" -> (SimilarityOps.bruteTopK _),
    "sim_ann_lsh"    -> (SimilarityOps.annLsh _),
    "sim_ann_ivf"    -> (SimilarityOps.annIvf _),
    "sim_quantize"   -> (SimilarityOps.quantizeError _),
    "knn_label"      -> (SimilarityOps.knnLabel _),
    // Text analysis
    "text_token_stats" -> (TextAnalysisOps.tokenStats _),
    "text_lang_id"     -> (TextAnalysisOps.langId _),
    "text_quality"     -> (TextAnalysisOps.qualityScore _),
    "text_fingerprint" -> (TextAnalysisOps.fingerprint _),
    "text_winnow"      -> (TextAnalysisOps.winnow _),
    "text_lang_ngram"  -> (TextAnalysisOps.langIdNgram _),
    "text_corpus_stats" -> (TextAnalysisOps.corpusStats _),
    "text_bigram_pmi"   -> (TextAnalysisOps.topBigramsPmi _),
    "text_gopher_rules" -> (TextAnalysisOps.gopherRules _),
    "text_tfidf"        -> (TextAnalysisOps.tfidf _),
    "agg_topk_sketch"   -> (TextAnalysisOps.topkSketch _),
    "agg_cms"           -> (TextAnalysisOps.cmsEstimates _),
    // Training-data preparation (chunking / decontamination /
    // sampling / packing / incremental ingest / centroids)
    "text_chunk"        -> (TrainingPrepOps.textChunk _),
    "decontaminate"     -> (TrainingPrepOps.decontaminate _),
    "sample_stratified" -> (TrainingPrepOps.sampleStratified _),
    "text_pack"         -> (TrainingPrepOps.textPack _),
    "dedup_incremental" -> (TrainingPrepOps.dedupIncremental _),
    "emb_centroid"      -> (TrainingPrepOps.embCentroid _),
    "shard_manifest"    -> (TrainingPrepOps.shardManifest _),
    // Corpus curation (span dedup / source mixing / importance scores)
    "dedup_span"   -> (CurationOps.dedupSpan _),
    "mix_weights"  -> (CurationOps.mixWeights _),
    "score_dsir"   -> (CurationOps.scoreDsir _),
    "score_ppl"    -> (CurationOps.scorePerplexity _),
    "curate_pipeline" -> (CurationOps.curatePipeline _),
    // Non-parquet sources under the gate: documents staged as
    // JSONL/CSV, read back via Formats' explicit-schema readers,
    // column-covering fingerprint aggregate (the oracle replays it off
    // raw parquet — equality proves the round trip lost nothing)
    "src_jsonl" -> (graft.sources.SourceQueries.jsonlDocStats _),
    "src_csv"   -> (graft.sources.SourceQueries.csvDocStats _),
    // Multimodal binary-column plumbing: real WAV/BMP/PNG/JPEG/AVI
    // decode, MP3 frame walks with bit-exact side-info parse, and
    // H.264 NAL walks (only spectral synthesis — MP3 Huffman/MDCT,
    // H.264 CABAC — is out of scope; see graft.multimodal)
    "mm_features" -> (MultimodalOps.mmFeatures _),
    "mm_wav"      -> (MultimodalOps.mmWav _),
    "mm_bmp"      -> (MultimodalOps.mmBmp _),
    "mm_png"      -> (MultimodalOps.mmPng _),
    "mm_jpeg"     -> (MultimodalOps.mmJpeg _),
    "mm_mp3"      -> (MultimodalOps.mmMp3 _),
    "mm_h264"     -> (MultimodalOps.mmH264 _),
    "mm_avi"      -> (MultimodalOps.mmAvi _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "word_count"        -> TextOps.wordCountSql,
    "mr_word_count"     -> TextOps.wordCountSql, // MR engine, same contract
    "grep"              -> TextOps.grepSql,
    "distinct_tokens"   -> TextOps.distinctTokensSql,
    "q1_pricing"        -> RelationalOps.q1PricingSql,
    "q3_top_revenue"    -> RelationalOps.q3TopRevenueSql,
    "q5_region_revenue" -> RelationalOps.q5RegionRevenueSql,
    "join_semi"         -> RelationalOps.semiJoinCustomersSql,
    "join_anti"         -> RelationalOps.antiJoinCustomersSql,
    "join_outer_stats"  -> RelationalOps.outerJoinOrderStatsSql,
    "agg_stats"         -> RelationalOps.aggStatsByPrioritySql,
    "monthly_orders"    -> RelationalOps.monthlyOrdersSql,
    "top_orders"        -> RelationalOps.topOrdersSql,
    "agg_percentiles"   -> RelationalOps.percentilesSql,
    "q14_promo"         -> RelationalOps.promoRevenueSql,
    "q6_forecast"       -> RelationalOps.q6ForecastSql,
    "agg_histogram"     -> RelationalOps.histQuantitySql,
    "validate_lineitem" -> RelationalOps.validateLineitemSql,
    // agg_approx: the oracle recomputes the exact companions and
    // asserts the within-bound sketch flags TRUE (sketch internals are
    // engine-specific; the bounds are not)
    "agg_approx"        -> RelationalOps.approxSketchesSql,
    "set_ops"           -> RelationalOps.setOpsSegmentsSql,
    "rollup_revenue"    -> RelationalOps.rollupRevenueSql,
    "cube_revenue"      -> RelationalOps.cubeRevenueSql,
    "unpivot_revenue"   -> RelationalOps.unpivotRevenueSql,
    "agg_mode"          -> RelationalOps.modeOrderStatusSql,
    "q18_large_volume"  -> RelationalOps.q18LargeVolumeSql,
    "window_order_rank" -> RelationalOps.windowOrderRankSql,
    "join_full_outer"   -> RelationalOps.fullOuterNationSql,
    "join_bucketed"     -> ScaleOps.bucketedOrderStatsSql,
    "agg_salted"        -> ScaleOps.saltedTypeRevenueSql,
    "agg_salted_collect" -> ScaleOps.saltedLangDocsSql,
    "join_salted"       -> ScaleOps.saltedJoinAboveMeanSql,
    "layout_zorder"     -> ScaleOps.zorderKeysSql,
    "join_bloom"        -> ScaleOps.bloomJoinRevenueSql,
    "pivot_status"      -> RelationalOps.pivotStatusSql,
    "evt_hourly"        -> EventOps.hourlySql,
    "evt_gap_fill"      -> EventOps.gapFillDailySql,
    "agg_hll_merge"     -> EventOps.hllWeeklySql,
    "stream_hourly"     -> EventOps.hourlySql,
    "stream_sessions"   -> graft.streaming.EventStreams.streamSessionsSql,
    "stream_dedup"      -> graft.streaming.EventStreams.streamDedupSql,
    "stream_attribution" -> graft.streaming.EventStreams.streamAttributionSql,
    "evt_sessions"      -> EventOps.sessionsSql,
    "evt_overlap"       -> EventOps.sessionOverlapSql,
    "evt_json"          -> EventOps.jsonExtractSql,
    "evt_daily_active"  -> EventOps.dailyActiveSql,
    "evt_asof"          -> AsOfOps.eventAsOfPurchaseSql,
    "evt_funnel"        -> EventOps.funnelSql,
    "evt_retention"     -> EventOps.retentionSql,
    "evt_rolling"       -> EventOps.rolling7dSql,
    "evt_dow_profile"   -> EventOps.dowProfileSql,
    "evt_prune"         -> EventOps.prunedWindowSql,
    "evt_dpp"           -> EventOps.dppTopDaysSql,
    "src_jsonl"         -> graft.sources.SourceQueries.docStatsSql,
    "src_csv"           -> graft.sources.SourceQueries.docStatsSql,
    "dedup_exact"         -> DedupOps.dedupExactSql,
    "dedup_minhash"       -> DedupOps.dedupMinhashSql,
    "graph_pagerank"      -> GraphOps.pagerankSql,
    "graph_triangles"     -> GraphOps.trianglesSql,
    "dedup_simhash"       -> DedupOps.dedupSimhashSql,
    "dedup_ngram_jaccard" -> DedupOps.dedupNgramJaccardSql,
    "dedup_embedding"     -> DedupOps.dedupEmbeddingSql,
    "dedup_embedding_lsh" -> SimilarityOps.dedupEmbeddingLshSql,
    "dedup_semantic"      -> SimilarityOps.dedupSemanticSql,
    "dedup_clusters"      -> DedupOps.dedupClustersSql,
    "agg_minhash_sig"     -> DedupOps.groupMinhashSigSql,
    "sample_hash"         -> DedupOps.sampleHashSql,
    "dedup_editdist"      -> DedupOps.dedupEditDistanceSql,
    "agg_corr"            -> RelationalOps.corrQtyPriceSql,
    "sim_brute_topk"      -> SimilarityOps.bruteTopKSql,
    "sim_quantize"        -> SimilarityOps.quantizeErrorSql,
    // approximate ANN, but deterministically indexed (md5 planes /
    // quantized Lloyd's) — the oracles replay the identical index
    "sim_ann_lsh"         -> SimilarityOps.annLshSql,
    "sim_ann_ivf"         -> SimilarityOps.annIvfSql,
    "knn_label"           -> SimilarityOps.knnLabelSql,
    "text_token_stats" -> TextAnalysisOps.tokenStatsSql,
    "text_lang_id"     -> TextAnalysisOps.langIdSql,
    "text_quality"     -> TextAnalysisOps.qualityScoreSql,
    "text_fingerprint" -> TextAnalysisOps.fingerprintSql,
    "text_winnow"      -> TextAnalysisOps.winnowSql,
    "text_lang_ngram"  -> TextAnalysisOps.langIdNgramSql,
    "text_corpus_stats" -> TextAnalysisOps.corpusStatsSql,
    "text_bigram_pmi"   -> TextAnalysisOps.topBigramsPmiSql,
    "text_gopher_rules" -> TextAnalysisOps.gopherRulesSql,
    "text_tfidf"        -> TextAnalysisOps.tfidfSql,
    "agg_topk_sketch"   -> TextAnalysisOps.topkSketchSql,
    "agg_cms"           -> TextAnalysisOps.cmsEstimatesSql,
    "text_chunk"        -> TrainingPrepOps.textChunkSql,
    "decontaminate"     -> TrainingPrepOps.decontaminateSql,
    "sample_stratified" -> TrainingPrepOps.sampleStratifiedSql,
    "text_pack"         -> TrainingPrepOps.textPackSql,
    "dedup_incremental" -> TrainingPrepOps.dedupIncrementalSql,
    "emb_centroid"      -> TrainingPrepOps.embCentroidSql,
    "shard_manifest"    -> TrainingPrepOps.shardManifestSql,
    "dedup_span"        -> CurationOps.dedupSpanSql,
    "mix_weights"       -> CurationOps.mixWeightsSql,
    "score_dsir"        -> CurationOps.scoreDsirSql,
    "score_ppl"         -> CurationOps.scorePerplexitySql,
    "curate_pipeline"   -> CurationOps.curatePipelineSql,
    "mm_features"      -> MultimodalOps.mmFeaturesSql,
    "mm_wav"           -> MultimodalOps.mmWavSql,
    "mm_bmp"           -> MultimodalOps.mmBmpSql,
    "mm_png"           -> MultimodalOps.mmPngSql,
    "mm_jpeg"          -> MultimodalOps.mmJpegSql,
    "mm_mp3"           -> MultimodalOps.mmMp3Sql,
    "mm_h264"          -> MultimodalOps.mmH264Sql,
    "mm_avi"           -> MultimodalOps.mmAviSql,
  )
}
