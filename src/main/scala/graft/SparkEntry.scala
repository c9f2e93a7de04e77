package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, LlmQueries, ReferenceQueries, StreamParity}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry pairs a Spark implementation (graft.queries.*) with ANSI SQL
  * the driver runs in DuckDB over the same parquet tables. Column names and
  * types are aliased identically on both sides (the driver hash-compares
  * after sorting columns by name). Determinism rules: money sums go through
  * DECIMAL(18,2); latest-per-key and top-k ties break on a unique id; no
  * wall-clock timestamps in verified columns.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The end-to-end corpus-curation pipeline: MinHash near-dup removal +
    * quality filter + language filter, composed from the library operators.
    */
  def entry(spark: SparkSession): DataFrame =
    LlmQueries.curationPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "basic_filter_extract" -> (ReferenceQueries.basicFilterExtract _),
    "ktable_latest"        -> (ReferenceQueries.ktableLatest _),
    "ktable_filter_view"   -> (ReferenceQueries.ktableFilterView _),
    "running_sum"          -> (ReferenceQueries.runningSum _),
    "agg_count_reduce"     -> (ReferenceQueries.aggCountReduce _),
    "stream_table_join"    -> (ReferenceQueries.streamTableJoin _),
    "interval_join"        -> (ReferenceQueries.intervalJoin _),
    "branch_merge"         -> (ReferenceQueries.branchMerge _),
    "windowed_agg"         -> (ReferenceQueries.windowedAgg _),
    "error_tolerant_parse" -> (ReferenceQueries.errorTolerantParse _),
    "error_deadletter_split" -> (ReferenceQueries.errorDeadletterSplit _),
    "flatmap_tokens"       -> (ReferenceQueries.flatmapTokens _),
    "session_agg"          -> (ReferenceQueries.sessionAgg _),
    "sliding_agg"          -> (ReferenceQueries.slidingAgg _),
    "json_roundtrip"       -> (ReferenceQueries.jsonRoundtrip _),
    "asof_join"            -> (ReferenceQueries.asofJoin _),
    "interval_join_left"   -> (ReferenceQueries.intervalJoinLeft _),
    "processor_total"      -> (ReferenceQueries.processorTotal _),
    // LLM data-pipeline operators (SURVEY.md §2.9)
    "dedup_exact"          -> (LlmQueries.dedupExact _),
    "dedup_exact_keyed"    -> (AnalyticsQueries.dedupExactKeyed _),
    "ngram_jaccard"        -> (LlmQueries.ngramJaccard _),
    "dedup_best_keeper"    -> (LlmQueries.dedupBestKeeper _),
    "minhash_lsh"          -> (LlmQueries.minhashLsh _),
    "dup_clusters"         -> (LlmQueries.dupClusters _),
    "split_no_leakage"     -> (LlmQueries.splitNoLeakage _),
    "training_corpus"      -> (LlmQueries.trainingCorpus _),
    "bag_jaccard"          -> (LlmQueries.bagJaccard _),
    "minhash_weighted"     -> (LlmQueries.minhashWeighted _),
    "simhash_neardup"      -> (LlmQueries.simhashNeardup _),
    "neardup_incremental"  -> (LlmQueries.neardupIncremental _),
    "ann_topk"             -> (LlmQueries.annTopk _),
    "embed_neardup"        -> (LlmQueries.embedNeardup _),
    "ann_lsh"              -> (LlmQueries.annLsh _),
    "ann_lsh_multiprobe"   -> (LlmQueries.annLshMultiprobe _),
    "ivf_neardup"          -> (LlmQueries.ivfNeardup _),
    "ivf_kmeans_neardup"   -> (LlmQueries.ivfKmeansNeardup _),
    "ivf_multiprobe_neardup" -> (LlmQueries.ivfMultiprobeNeardup _),
    "lang_id"              -> (LlmQueries.langId _),
    "quality_score"        -> (LlmQueries.qualityScore _),
    "token_count"          -> (LlmQueries.tokenCount _),
    "doc_chunks"           -> (LlmQueries.docChunks _),
    "chunk_dedup"          -> (LlmQueries.chunkDedup _),
    "decontaminate"        -> (LlmQueries.decontaminate _),
    "doc_fingerprint"      -> (LlmQueries.docFingerprint _),
    "repetition_score"     -> (LlmQueries.repetitionScore _),
    "pii_count"            -> (LlmQueries.piiCount _),
    "pii_redact"           -> (LlmQueries.piiRedact _),
    "sample_stratified"    -> (LlmQueries.sampleStratified _),
    "lm_fluency"           -> (LlmQueries.lmFluency _),
    "tfidf"                -> (LlmQueries.tfidf _),
    "top_tokens_per_lang"  -> (LlmQueries.topTokensPerLang _),
    "token_spectrum"       -> (LlmQueries.tokenSpectrum _),
    "embed_centroids"      -> (LlmQueries.embedCentroids _),
    "embed_quantize"       -> (LlmQueries.embedQuantize _),
    "multimodal_meta"      -> (LlmQueries.multimodalMeta _),
    "multimodal_frames"    -> (LlmQueries.multimodalFrames _),
    "curation_pipeline"    -> (LlmQueries.curationPipeline _),
    // analytic coverage (sorts/top-k, set ops, rollup, distinct)
    "q1_pricing"           -> (AnalyticsQueries.q1Pricing _),
    "topk_orders_per_cust" -> (AnalyticsQueries.topkOrdersPerCust _),
    "topk_orders_heap"     -> (AnalyticsQueries.topkOrdersHeap _),
    "revenue_by_segment"   -> (AnalyticsQueries.revenueBySegment _),
    "set_ops"              -> (AnalyticsQueries.setOps _),
    "sql_surface"          -> (AnalyticsQueries.sqlSurface _),
    "rollup_revenue"       -> (AnalyticsQueries.rollupRevenue _),
    "cube_revenue"         -> (AnalyticsQueries.cubeRevenue _),
    "distinct_users"       -> (AnalyticsQueries.distinctUsers _),
    "approx_distinct_kmv"  -> (AnalyticsQueries.approxDistinctKmv _),
    "value_quantiles"      -> (AnalyticsQueries.valueQuantiles _),
    "value_histogram"      -> (AnalyticsQueries.valueHistogram _),
    "skew_salted_join"     -> (AnalyticsQueries.skewSaltedJoin _),
    "bucketed_join"        -> (AnalyticsQueries.bucketedJoin _),
    "bloom_pruned_join"    -> (AnalyticsQueries.bloomPrunedJoin _),
    "pivot_revenue"        -> (AnalyticsQueries.pivotRevenue _),
    "cumulative_spend"     -> (AnalyticsQueries.cumulativeSpend _),
    "full_outer_activity"  -> (AnalyticsQueries.fullOuterActivity _),
    "sample_per_source"    -> (AnalyticsQueries.samplePerSource _),
    "table_profile"        -> (AnalyticsQueries.tableProfile _),
    // streaming EXECUTION under the oracle: real StreamingQuery runs
    // (file stream → IncrementalExecution → streaming sink), compared
    // against the same batch oracle SQL (queries/StreamParity.scala)
    "curation_stream_parity"    -> (StreamParity.curationStreamParity _),
    "running_sum_stream_parity" -> (StreamParity.runningSumStreamParity _),
    "windowed_agg_stream_parity" -> (StreamParity.windowedAggStreamParity _),
    "interval_join_stream_parity" -> (StreamParity.intervalJoinStreamParity _),
    "error_parse_stream_parity"  -> (StreamParity.errorTolerantParseStreamParity _),
    "session_agg_stream_parity"  -> (StreamParity.sessionAggStreamParity _),
    "processor_stream_parity"    -> (StreamParity.processorStreamParity _),
    "neardup_stream_parity"     -> (StreamParity.neardupStreamParity _),
    // approximate sketch — engine-specific values, rows-only check (no oracle)
    "approx_distinct_users" -> (AnalyticsQueries.approxDistinctUsers _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "basic_filter_extract" -> ReferenceQueries.basicFilterExtractSql,
    "ktable_latest"        -> ReferenceQueries.ktableLatestSql,
    "ktable_filter_view"   -> ReferenceQueries.ktableFilterViewSql,
    "running_sum"          -> ReferenceQueries.runningSumSql,
    "agg_count_reduce"     -> ReferenceQueries.aggCountReduceSql,
    "stream_table_join"    -> ReferenceQueries.streamTableJoinSql,
    "interval_join"        -> ReferenceQueries.intervalJoinSql,
    "branch_merge"         -> ReferenceQueries.branchMergeSql,
    "windowed_agg"         -> ReferenceQueries.windowedAggSql,
    "error_tolerant_parse" -> ReferenceQueries.errorTolerantParseSql,
    "error_deadletter_split" -> ReferenceQueries.errorDeadletterSplitSql,
    "flatmap_tokens"       -> ReferenceQueries.flatmapTokensSql,
    "session_agg"          -> ReferenceQueries.sessionAggSql,
    "sliding_agg"          -> ReferenceQueries.slidingAggSql,
    "json_roundtrip"       -> ReferenceQueries.jsonRoundtripSql,
    "asof_join"            -> ReferenceQueries.asofJoinSql,
    "interval_join_left"   -> ReferenceQueries.intervalJoinLeftSql,
    "processor_total"      -> ReferenceQueries.processorTotalSql,
    "dedup_exact"          -> LlmQueries.dedupExactSql,
    "dedup_exact_keyed"    -> AnalyticsQueries.dedupExactKeyedSql,
    "ngram_jaccard"        -> LlmQueries.ngramJaccardSql,
    "dedup_best_keeper"    -> LlmQueries.dedupBestKeeperSql,
    "minhash_lsh"          -> LlmQueries.minhashLshSql,
    "dup_clusters"         -> LlmQueries.dupClustersSql,
    "split_no_leakage"     -> LlmQueries.splitNoLeakageSql,
    "training_corpus"      -> LlmQueries.trainingCorpusSql,
    "bag_jaccard"          -> LlmQueries.bagJaccardSql,
    "minhash_weighted"     -> LlmQueries.minhashWeightedSql,
    "simhash_neardup"      -> LlmQueries.simhashNeardupSql,
    "neardup_incremental"  -> LlmQueries.neardupIncrementalSql,
    "ann_topk"             -> LlmQueries.annTopkSql,
    "embed_neardup"        -> LlmQueries.embedNeardupSql,
    "ann_lsh"              -> LlmQueries.annLshSql,
    "ann_lsh_multiprobe"   -> LlmQueries.annLshMultiprobeSql,
    "ivf_neardup"          -> LlmQueries.ivfNeardupSql,
    "ivf_kmeans_neardup"   -> LlmQueries.ivfKmeansNeardupSql,
    "ivf_multiprobe_neardup" -> LlmQueries.ivfMultiprobeNeardupSql,
    "lang_id"              -> LlmQueries.langIdSql,
    "quality_score"        -> LlmQueries.qualityScoreSql,
    "token_count"          -> LlmQueries.tokenCountSql,
    "doc_chunks"           -> LlmQueries.docChunksSql,
    "chunk_dedup"          -> LlmQueries.chunkDedupSql,
    "decontaminate"        -> LlmQueries.decontaminateSql,
    "doc_fingerprint"      -> LlmQueries.docFingerprintSql,
    "repetition_score"     -> LlmQueries.repetitionScoreSql,
    "pii_count"            -> LlmQueries.piiCountSql,
    "pii_redact"           -> LlmQueries.piiRedactSql,
    "sample_stratified"    -> LlmQueries.sampleStratifiedSql,
    "lm_fluency"           -> LlmQueries.lmFluencySql,
    "tfidf"                -> LlmQueries.tfidfSql,
    "top_tokens_per_lang"  -> LlmQueries.topTokensPerLangSql,
    "token_spectrum"       -> LlmQueries.tokenSpectrumSql,
    "embed_centroids"      -> LlmQueries.embedCentroidsSql,
    "embed_quantize"       -> LlmQueries.embedQuantizeSql,
    "multimodal_meta"      -> LlmQueries.multimodalMetaSql,
    "multimodal_frames"    -> LlmQueries.multimodalFramesSql,
    "curation_pipeline"    -> LlmQueries.curationPipelineSql,
    "q1_pricing"           -> AnalyticsQueries.q1PricingSql,
    "topk_orders_per_cust" -> AnalyticsQueries.topkOrdersPerCustSql,
    "topk_orders_heap"     -> AnalyticsQueries.topkOrdersHeapSql,
    "revenue_by_segment"   -> AnalyticsQueries.revenueBySegmentSql,
    "set_ops"              -> AnalyticsQueries.setOpsSql,
    "sql_surface"          -> AnalyticsQueries.sqlSurfaceSql,
    "rollup_revenue"       -> AnalyticsQueries.rollupRevenueSql,
    "cube_revenue"         -> AnalyticsQueries.cubeRevenueSql,
    "distinct_users"       -> AnalyticsQueries.distinctUsersSql,
    "approx_distinct_kmv"  -> AnalyticsQueries.approxDistinctKmvSql,
    "value_quantiles"      -> AnalyticsQueries.valueQuantilesSql,
    "value_histogram"      -> AnalyticsQueries.valueHistogramSql,
    "skew_salted_join"     -> AnalyticsQueries.skewSaltedJoinSql,
    "bucketed_join"        -> AnalyticsQueries.bucketedJoinSql,
    "bloom_pruned_join"    -> AnalyticsQueries.bloomPrunedJoinSql,
    "pivot_revenue"        -> AnalyticsQueries.pivotRevenueSql,
    "cumulative_spend"     -> AnalyticsQueries.cumulativeSpendSql,
    "full_outer_activity"  -> AnalyticsQueries.fullOuterActivitySql,
    "sample_per_source"    -> AnalyticsQueries.samplePerSourceSql,
    "table_profile"        -> AnalyticsQueries.tableProfileSql,
    // streaming-execution parity rows share the batch twins' oracles:
    // converged streaming state must equal the batch recompute
    "curation_stream_parity"    -> LlmQueries.perRowCurationSql,
    "running_sum_stream_parity" -> ReferenceQueries.runningSumSql,
    "windowed_agg_stream_parity" -> ReferenceQueries.windowedAggSql,
    "interval_join_stream_parity" -> ReferenceQueries.intervalJoinSql,
    "error_parse_stream_parity"  -> ReferenceQueries.errorTolerantParseSql,
    "session_agg_stream_parity"  -> ReferenceQueries.sessionAggSql,
    "processor_stream_parity"    ->
      """SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS total_cents
        |FROM events GROUP BY user_id""".stripMargin,
    "neardup_stream_parity"     -> LlmQueries.neardupIncrementalSql,
  )
}
