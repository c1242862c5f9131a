package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2 / §7.3 / §7.5. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pricing_summary" -> Relational.pricingSummary,
    "q_top_orders" -> Relational.topOrders,
    "q_cust_nation_join" -> Relational.custNationJoin,
    "q_order_lineitem_join" -> Relational.orderLineitemJoin,
    "q_semi_anti" -> Relational.semiAnti,
    "q_window_rank" -> Relational.windowRank,
    "q_rollup" -> Relational.rollupAgg,
    "q_distinct" -> Relational.distinctAgg,
    "q_approx_distinct" -> Relational.approxDistinct,
    "q_setops" -> Relational.setOps,
    "q_scalar_funcs" -> Relational.scalarFuncs,
    "q_date_funcs" -> Relational.dateFuncs,
    "q_events_sessionize" -> Relational.eventsSessionize,
    "q_json_extract" -> Relational.jsonExtract,
    "q_cube" -> Relational.cubeAgg,
    "q_percentiles" -> Relational.percentiles,
    "q_approx_percentiles" -> Relational.approxPercentiles,
    "q_array_funcs" -> Relational.arrayFuncs,
    "q_pivot" -> Relational.pivotAgg,
    "q_shipping_priority" -> Relational.shippingPriority,
    "q_local_supplier_volume" -> Relational.localSupplierVolume,
    "q_map_funcs" -> Relational.mapFuncs,
    "q_unpivot" -> Relational.unpivotFuncs,
    "q_regex_funcs" -> Relational.regexFuncs,
    "q_string_distance" -> Relational.stringDistance,
    "q_grouping_sets" -> Advanced.groupingSetsAgg,
    "q_window_battery" -> Advanced.windowBattery,
    "q_subqueries" -> Advanced.subqueries,
    "q_subqueries_in" -> Advanced.subqueriesIn,
    "q_skew_join" -> Relational.skewJoin,
    // LLM-pipeline extensions (SURVEY.md §7.5): dedup + text analysis
    "q_dedup_exact" -> Dedup.dedupExact,
    "q_dedup_minhash" -> Dedup.dedupMinhash,
    "q_dedup_simhash" -> Dedup.dedupSimhash,
    "q_dedup_ngram_jaccard" -> Dedup.dedupNgramJaccard,
    "q_dedup_embedding" -> Dedup.dedupEmbedding,
    "q_dedup_canonical" -> Dedup.dedupCanonical,
    "q_dedup_clusters" -> Dedup.nearDupClusters,
    "q_text_stats" -> TextAnalysis.textStats,
    "q_token_count" -> TextAnalysis.tokenCount,
    "q_quality_score" -> TextAnalysis.qualityScore,
    "q_lang_id" -> TextAnalysis.langId,
    "q_doc_fingerprint" -> TextAnalysis.docFingerprint,
    "q_tfidf" -> TextAnalysis.tfidf,
    "q_text_normalize" -> TextAnalysis.textNormalize,
    "q_pii_redact" -> TextAnalysis.piiRedact,
    "q_train_split" -> Sampling.trainSplit,
    "q_stratified_sample" -> Sampling.stratifiedSample,
    "q_repetition_stats" -> Curation.repetitionStats,
    "q_chunk_tokens" -> Curation.chunkTokens,
    "q_contamination" -> Curation.contamination,
    "q_pack_sequences" -> Curation.packSequences,
    "q_knn_brute" -> Similarity.knnBrute,
    "q_ann_lsh" -> Similarity.annLsh,
    "q_ann_ivf" -> Similarity.annIvf,
    "q_asof_join" -> AsOf.eventOrderAsof,
    "q_range_join" -> AsOf.eventOrdersNearby,
    "q_media_catalog" -> Multimodal.mediaCatalog,
    "q_media_features" -> Multimodal.mediaFeatures,
    "q_frame_sample" -> Multimodal.frameSample,
  )
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_pricing_summary" -> Relational.pricingSummarySql,
    "q_top_orders" -> Relational.topOrdersSql,
    "q_cust_nation_join" -> Relational.custNationJoinSql,
    "q_order_lineitem_join" -> Relational.orderLineitemJoinSql,
    "q_semi_anti" -> Relational.semiAntiSql,
    "q_window_rank" -> Relational.windowRankSql,
    "q_rollup" -> Relational.rollupAggSql,
    "q_distinct" -> Relational.distinctAggSql,
    // q_approx_distinct: HLL sketch — not oracle-matchable, rows-only check.
    "q_setops" -> Relational.setOpsSql,
    "q_scalar_funcs" -> Relational.scalarFuncsSql,
    "q_date_funcs" -> Relational.dateFuncsSql,
    "q_events_sessionize" -> Relational.eventsSessionizeSql,
    "q_json_extract" -> Relational.jsonExtractSql,
    "q_cube" -> Relational.cubeAggSql,
    "q_percentiles" -> Relational.percentilesSql,
    "q_array_funcs" -> Relational.arrayFuncsSql,
    "q_pivot" -> Relational.pivotAggSql,
    "q_shipping_priority" -> Relational.shippingPrioritySql,
    "q_local_supplier_volume" -> Relational.localSupplierVolumeSql,
    "q_map_funcs" -> Relational.mapFuncsSql,
    "q_unpivot" -> Relational.unpivotFuncsSql,
    "q_string_distance" -> Relational.stringDistanceSql,
    "q_grouping_sets" -> Advanced.groupingSetsAggSql,
    "q_window_battery" -> Advanced.windowBatterySql,
    "q_subqueries" -> Advanced.subqueriesSql,
    "q_subqueries_in" -> Advanced.subqueriesInSql,
    "q_skew_join" -> Relational.skewJoinSql,
    "q_lang_id" -> TextAnalysis.langIdSql,
    "q_tfidf" -> TextAnalysis.tfidfSql,
    "q_text_normalize" -> TextAnalysis.textNormalizeSql,
    "q_pii_redact" -> TextAnalysis.piiRedactSql,
    "q_train_split" -> Sampling.trainSplitSql,
    "q_stratified_sample" -> Sampling.stratifiedSampleSql,
    "q_repetition_stats" -> Curation.repetitionStatsSql,
    "q_chunk_tokens" -> Curation.chunkTokensSql,
    "q_contamination" -> Curation.contaminationSql,
    "q_pack_sequences" -> Curation.packSequencesSql,
    "q_regex_funcs" -> Relational.regexFuncsSql,
    "q_dedup_exact" -> Dedup.dedupExactSql,
    "q_dedup_canonical" -> Dedup.dedupCanonicalSql,
    // q_dedup_minhash / q_dedup_simhash / q_dedup_ngram_jaccard /
    // q_doc_fingerprint: sketch ops built on Spark's xxhash64 hash
    // family — not SQL-expressible in DuckDB → rows-only check;
    // invariants pinned by DedupSpec/TextAnalysisSpec.
    "q_text_stats" -> TextAnalysis.textStatsSql,
    "q_token_count" -> TextAnalysis.tokenCountSql,
    "q_quality_score" -> TextAnalysis.qualityScoreSql,
    // q_ann_lsh: hyperplane family derives from Spark's xxhash64 →
    // rows-only check; recall vs q_knn_brute pinned by SimilaritySpec.
    "q_knn_brute" -> Similarity.knnBruteSql,
    // q_media_features: byte-level stub decode → rows-only check;
    // determinism + ranges pinned by MultimodalSpec.
    "q_asof_join" -> AsOf.eventOrderAsofSql,
    "q_range_join" -> AsOf.eventOrdersNearbySql,
    "q_media_catalog" -> Multimodal.mediaCatalogSql,
    "q_frame_sample" -> Multimodal.frameSampleSql,
  )
}
