package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Corpus, Dedup, IndexStore, Multimodal, Observe, Pairing, ProductQuant, Relational, Similarity, Sources, Temporal, TextAnalysis, Tpch}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a declarative DataFrame plan over the
  * driver's parquet testdata; entries in [[oracleSql]] are the equivalent
  * ANSI SQL the driver runs in DuckDB for the hash-compare. Column names,
  * types, row order, and floating-point arithmetic are aligned between the
  * two (see graft.operators.Det for the fixed-point/decimal determinism
  * schemes).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: the whole
    * reference pipeline (pair → window → final emission) as one plan. */
  def entry(spark: SparkSession): DataFrame =
    Pairing.facilityInfoByMinute(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.3. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reference pipeline (SURVEY.md §2.1 operators O1-O18)
    "q_rekey_project" -> (Pairing.rekeyProject _),
    "q_filter_notnull" -> (Pairing.filterNotNull _),
    "q_pair_match" -> (Pairing.pairMatch _),
    "q_pair_match_join" -> (Pairing.pairMatchJoin _),
    "q_pair_ttl" -> (Pairing.pairTtl _),
    "q_pair_typed" -> (graft.operators.TypedPairing.pairTyped _),
    "q_facility_info_by_minute" -> (Pairing.facilityInfoByMinute _),
    "q_tumbling_agg" -> (Pairing.tumblingAgg _),
    "q_json_get" -> (Pairing.jsonGet _),
    "q_json_emit" -> (Pairing.jsonEmit _),
    "q_from_json" -> (Pairing.fromJson _),
    "q_pair_groups" -> (Pairing.pairGroups _),
    // Generalized relational surface (SURVEY.md §2.3)
    "q_scan_project" -> (Relational.scanProject _),
    "q_filter_pred" -> (Relational.filterPred _),
    "q_hash_join" -> (Relational.hashJoin _),
    "q_multi_join" -> (Relational.multiJoin _),
    "q_broadcast_join" -> (Relational.broadcastJoin _),
    "q_semi_join" -> (Relational.semiJoin _),
    "q_anti_join" -> (Relational.antiJoin _),
    "q_outer_join" -> (Relational.outerJoin _),
    "q_full_outer" -> (Relational.fullOuter _),
    "q_cross_join" -> (Relational.crossJoin _),
    "q_shuffle_hash_join" -> (Relational.shuffleHashJoin _),
    "q_tpch_q6" -> (Relational.tpchQ6 _),
    "q_tpch_q3" -> (Relational.tpchQ3 _),
    "q_tpch_q5" -> (Relational.tpchQ5 _),
    "q_tpch_q2" -> (Tpch.q2Shape _),
    "q_tpch_q4" -> (Tpch.q4Shape _),
    "q_tpch_q7" -> (Tpch.q7 _),
    "q_tpch_q10" -> (Tpch.q10 _),
    "q_tpch_q12" -> (Tpch.q12Shape _),
    "q_tpch_q14" -> (Tpch.q14 _),
    "q_tpch_q15" -> (Tpch.q15 _),
    "q_tpch_q18" -> (Tpch.q18 _),
    "q_tpch_q19" -> (Tpch.q19 _),
    "q_tpch_q22" -> (Tpch.q22Shape _),
    "q_tpch_q13" -> (Tpch.q13Shape _),
    "q_tpch_q17" -> (Tpch.q17Shape _),
    "q_tpch_q21" -> (Tpch.q21Shape _),
    "q_tpch_q8" -> (Tpch.q8 _),
    "q_tpch_q9" -> (Tpch.q9Shape _),
    "q_nullsafe_join" -> (Relational.nullsafeJoin _),
    "q_pagerank" -> (graft.operators.Graph.pagerank _),
    "q_anomaly_zscore" -> (graft.operators.Analytics.anomalyZscore _),
    "q_ewma_smooth" -> (graft.operators.Analytics.ewmaSmooth _),
    "q_skyline" -> (graft.operators.Scale.skyline _),
    "q_funnel" -> (graft.operators.Analytics.funnel _),
    "q_retention" -> (graft.operators.Analytics.retention _),
    "q_agg_q1" -> (Relational.aggQ1 _),
    "q_agg_distinct" -> (Relational.aggDistinct _),
    "q_rollup" -> (Relational.rollup _),
    "q_cube" -> (Relational.cube _),
    "q_grouping_sets" -> (Relational.groupingSets _),
    "q_window_rank" -> (Relational.windowRank _),
    "q_topk_custom" -> (Relational.topKCustom _),
    "q_window_running" -> (Relational.windowRunning _),
    "q_window_leadlag" -> (Relational.windowLeadLag _),
    "q_monthly_rollup" -> (Relational.monthlyRollup _),
    "q_sort_limit" -> (Relational.sortLimit _),
    "q_union" -> (Relational.union _),
    "q_intersect" -> (Relational.intersect _),
    "q_except" -> (Relational.except _),
    "q_intersect_all" -> (Relational.intersectAll _),
    "q_except_all" -> (Relational.exceptAll _),
    "q_scalar_funcs" -> (Relational.scalarFuncs _),
    "q_array_ops" -> (Relational.arrayOps _),
    "q_approx_distinct" -> (Relational.approxDistinct _),
    "q_approx_quantile" -> (Relational.approxQuantile _),
    "q_percentiles" -> (Relational.percentiles _),
    "q_stats_agg" -> (Relational.statsAgg _),
    "q_lateral_explode" -> (Relational.lateralExplode _),
    // scalar-function catalogs (operators.Catalog)
    "q_case_when" -> (graft.operators.Catalog.caseWhen _),
    "q_regex_funcs" -> (graft.operators.Catalog.regexFuncs _),
    "q_date_funcs" -> (graft.operators.Catalog.dateFuncs _),
    "q_bitwise" -> (graft.operators.Catalog.bitwise _),
    // aggregation / window / join surface (operators.Analytics)
    "q_map_funcs" -> (graft.operators.Catalog.mapFuncs _),
    "q_array_lambda" -> (graft.operators.Catalog.arrayLambda _),
    "q_explode_outer" -> (graft.operators.Catalog.explodeOuter _),
    "q_sequence_fill" -> (graft.operators.Analytics.sequenceFill _),
    "q_stats_pop" -> (graft.operators.Analytics.statsPop _),
    "q_grouping_id" -> (graft.operators.Analytics.groupingId _),
    "q_quantile_disc" -> (graft.operators.Analytics.quantileDisc _),
    "q_collect_set" -> (graft.operators.Analytics.collectSet _),
    "q_window_ignorenulls" -> (graft.operators.Analytics.windowIgnoreNulls _),
    "q_try_funcs" -> (graft.operators.Analytics.tryFuncs _),
    "q_udf_demo" -> (graft.operators.UdfSurface.udfDemo _),
    "q_udaf_demo" -> (graft.operators.UdfSurface.udafDemo _),
    "q_minmax_by" -> (graft.operators.Analytics.minmaxBy _),
    "q_count_if" -> (graft.operators.Analytics.countIf _),
    "q_string_agg" -> (graft.operators.Analytics.stringAgg _),
    "q_union_by_name" -> (graft.operators.Analytics.unionByName _),
    "q_histogram" -> (graft.operators.Analytics.histogram _),
    "q_having" -> (graft.operators.Analytics.having _),
    "q_global_agg" -> (graft.operators.Analytics.globalAgg _),
    "q_in_subquery" -> (graft.operators.Analytics.inSubquery _),
    "q_exists_subquery" -> (graft.operators.Analytics.existsSubquery _),
    "q_window_percent" -> (graft.operators.Analytics.windowPercent _),
    "q_window_range" -> (graft.operators.Analytics.windowRange _),
    "q_dedup_keepfirst" -> (graft.operators.Analytics.dedupKeepFirst _),
    "q_gaps_islands" -> (graft.operators.Analytics.gapsIslands _),
    "q_hash_sample" -> (graft.operators.Analytics.hashSample _),
    "q_range_join" -> (graft.operators.Analytics.rangeJoin _),
    "q_range_join_custom" -> (graft.operators.Analytics.rangeJoinCustom _),
    // LLM-pipeline extensions (SURVEY.md §7.1.5): text analysis
    "q_text_stats" -> (TextAnalysis.textStats _),
    "q_zipf_fit" -> (TextAnalysis.zipfFit _),
    "q_token_count" -> (TextAnalysis.tokenCount _),
    "q_lang_id" -> (TextAnalysis.langId _),
    "q_quality_score" -> (TextAnalysis.qualityScore _),
    "q_doc_fingerprint" -> (TextAnalysis.docFingerprint _),
    "q_text_normalize" -> (TextAnalysis.textNormalize _),
    "q_dedup_norm" -> (TextAnalysis.dedupNormalized _),
    "q_edit_distance" -> (TextAnalysis.editDistance _),
    "q_tfidf" -> (TextAnalysis.tfidf _),
    "q_array_setops" -> (graft.operators.Catalog.arraySetOps _),
    "q_hash_encode" -> (graft.operators.Catalog.hashEncode _),
    "q_variant_json" -> (graft.operators.Catalog.variantJson _),
    // training-corpus prep (chunking, scrubbing, pooling, funnel)
    "q_doc_chunks" -> (Corpus.docChunks _),
    "q_pii_scrub" -> (Corpus.piiScrub _),
    "q_vec_centroid" -> (Corpus.vecCentroid _),
    "q_corpus_funnel" -> (Corpus.corpusFunnel _),
    "q_stratified_sample" -> (Corpus.stratifiedSample _),
    "q_data_split" -> (Corpus.dataSplit _),
    "q_agg_pushdown" -> (graft.operators.Scale.aggPushdown _),
    "q_bloom_join" -> (graft.operators.Scale.bloomJoin _),
    "q_zorder_layout" -> (graft.operators.Scale.zorderLayout _),
    "q_upsert_merge" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
      graft.operators.Scale.upsertMerge(s, d)),
    "q_table_checksum" -> (graft.operators.Scale.tableChecksum _),
    "q_incremental_agg" -> (graft.operators.Scale.incrementalAgg _),
    "q_heavy_hitters" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
      graft.operators.Scale.heavyHitters(s, d)),
    "q_repetition_stats" -> (Corpus.repetitionStats _),
    "q_contamination" -> (Corpus.contamination _),
    "q_seq_pack" -> (Corpus.seqPack _),
    "q_inverted_index" -> (Corpus.invertedIndex _),
    "q_bigram_lm" -> (Corpus.bigramLm _),
    "q_bigram_kn" -> (Corpus.bigramKn _),
    "q_bpe_fertility" -> (Corpus.bpeFertility _),
    "q_doc_perplexity" -> (Corpus.docPerplexity _),
    "q_vec_quantize" -> (Corpus.vecQuantize _),
    "q_winnow" -> (Corpus.winnow _),
    "q_boiler_ngrams" -> (Corpus.boilerNgrams _),
    "q_temp_sample" -> (Corpus.tempSample _),
    "q_ccnet_bucket" -> (Corpus.ccnetBucket _),
    "q_mix_weights" -> (Corpus.mixWeights _),
    "q_capped_sample" -> (Corpus.cappedSample _),
    "q_weighted_sample" -> (Corpus.weightedSample _),
    "q_train_shuffle" -> (Corpus.trainShuffle _),
    "q_corpus_build" -> (Corpus.corpusBuild _),
    "q_corpus_increment" -> (Corpus.corpusIncrement _),
    "q_corpus_increment2" -> (Corpus.corpusIncrement2 _),
    "q_corpus_apply" -> (Corpus.corpusApply _),
    "q_corpus_apply2" -> (Corpus.corpusApply2 _),
    "q_corpus_compact" -> (Corpus.corpusCompact _),
    "q_corpus_rebase" -> (Corpus.corpusRebase _),
    "q_store_vacuum" -> (graft.operators.Vacuum.storeVacuum _),
    "q_dedup_index_rebase" -> (graft.operators.IndexStore.dedupIndexRebase _),
    "q_tokenizer_drift" -> (Corpus.tokenizerDrift _),
    "q_tokenizer_drift2" -> (Corpus.tokenizerDrift2 _),
    "q_domain_stats" -> (TextAnalysis.domainStats _),
    "q_pmi_phrases" -> (Corpus.pmiPhrases _),
    "q_token_entropy" -> (Corpus.tokenEntropy _),
    "q_block_dedup" -> (Corpus.blockDedup _),
    "q_substring_dedup" -> (Corpus.substringDedup _),
    "q_substring_dedup_delta" -> ((s, d) => Corpus.substringDedupDelta(s, d)),
    "q_substring_dedup_delta2" -> (Corpus.substringDedupDelta2 _),
    "q_increment_run" -> (Corpus.incrementRun _),
    "q_increment_run2" -> (Corpus.incrementRun2 _),
    "q_bpe_merges" -> (Corpus.bpeMerges _),
    "q_bpe_apply" -> (Corpus.bpeApply _),
    "q_vocab_coverage" -> (Corpus.vocabCoverage _),
    "q_vocab_coverage_bpe" -> (Corpus.vocabCoverageBpe _),
    "q_seq_pack_bpe" -> (Corpus.seqPackBpe _),
    "q_wordpiece_merges" -> (Corpus.wordpieceMerges _),
    "q_unigram_lm" -> (Corpus.unigramLm _),
    "q_dsir_weights" -> (Corpus.dsirWeights _),
    "q_quality_logit" -> (TextAnalysis.qualityLogit _),
    // deduplication
    "q_dedup_exact" -> (Dedup.exact _),
    "q_dedup_index_persist" -> (IndexStore.dedupIndexPersist _),
    "q_dedup_index_update" -> (IndexStore.dedupIndexUpdate _),
    "q_dedup_index_update2" -> (IndexStore.dedupIndexUpdate2 _),
    "q_dedup_index_compact" -> (IndexStore.dedupIndexCompact _),
    "q_semdedup" -> (Dedup.semDedup _),
    "q_neardup_purge" -> (Dedup.neardupPurge _),
    "q_dedup_cluster" -> (Dedup.dedupCluster _),
    "q_dedup_ngram" -> (Dedup.ngramJaccard _),
    "q_dedup_minhash" -> (Dedup.minhashLsh _),
    "q_dedup_minhash_md5" -> (Dedup.minhashLshMd5 _),
    "q_minhash_accuracy" -> (Dedup.minhashAccuracy _),
    "q_dedup_simhash" -> (Dedup.simhash _),
    "q_dedup_simhash_md5" -> (Dedup.simhashMd5 _),
    "q_dedup_embedding" -> (Dedup.embeddingCosine _),
    // similarity search
    "q_similarity_knn" -> (Similarity.knn _),
    "q_similarity_lsh" -> (Similarity.lsh _),
    "q_similarity_ivf" -> (Similarity.ivf _),
    "q_knn_join" -> (Similarity.knnJoin _),
    "q_knn_join_cell" -> (Similarity.knnJoinCell _),
    "q_knn_join_salted" -> (Similarity.knnJoinSalted _),
    "q_knn_join_recall" -> (Similarity.knnJoinRecall _),
    "q_ann_filtered" -> (Similarity.annFiltered _),
    "q_knn_classify" -> (Similarity.knnClassify _),
    "q_hard_negatives" -> (Similarity.hardNegatives _),
    "q_matryoshka_recall" -> (Similarity.matryoshkaRecall _),
    "q_hybrid_search" -> (Similarity.hybridSearch _),
    "q_hybrid_weighted" -> (Similarity.hybridWeighted _),
    "q_hybrid_parity" -> (Similarity.hybridParity _),
    "q_bm25_topk" -> (Similarity.bm25TopK _),
    "q_ann_recall" -> (Similarity.annRecall _),
    "q_range_search" -> (Similarity.rangeSearch _),
    "q_srp_recall" -> (Similarity.srpRecall _),
    "q_bq_recall" -> (Similarity.bqRecall _),
    "q_bq_persist" -> (Similarity.bqPersist _),
    "q_mmr_rerank" -> (Similarity.mmrRerank _),
    "q_sq_recall" -> (Similarity.sqRecall _),
    "q_lsh_recall" -> (Similarity.lshRecall _),
    "q_ivfsq_recall" -> (Similarity.ivfSqRecall _),
    "q_ivf_cell_stats" -> (Similarity.ivfCellStats _),
    "q_index_persist" -> (Similarity.indexPersist _),
    "q_embed_stats" -> (Similarity.embedStats _),
    "q_index_refresh" -> (Similarity.indexRefresh _),
    "q_pq_recall" -> (ProductQuant.pqRecall _),
    "q_ivfpq_recall" -> (ProductQuant.ivfPqRecall _),
    "q_ivfpq_rerank" -> (ProductQuant.ivfPqRerank _),
    "q_pq_persist" -> (ProductQuant.pqPersist _),
    "q_pq_refresh" -> (ProductQuant.pqRefresh _),
    "q_crossmodal_join" -> (Similarity.crossmodalJoin _),
    // multimodal columns
    "q_media_meta" -> (Multimodal.mediaMeta _),
    "q_media_frames" -> (Multimodal.mediaFrames _),
    "q_media_features" -> (Multimodal.mediaFeatures _),
    "q_media_histdup" -> (Multimodal.mediaHistDup _),
    "q_media_dedup" -> (Multimodal.mediaDedup _),
    // reshaping + subqueries + extended scalar catalogs
    "q_pivot" -> (graft.operators.Reshape.pivot _),
    "q_unpivot" -> (graft.operators.Reshape.unpivot _),
    "q_scalar_subquery" -> (graft.operators.Reshape.scalarSubquery _),
    "q_null_funcs" -> (graft.operators.Reshape.nullFuncs _),
    "q_string_funcs" -> (graft.operators.Reshape.stringFuncs _),
    // scale techniques with correctness oracles
    "q_salted_join" -> (graft.operators.Scale.saltedJoin _),
    "q_partition_pruning" -> (graft.operators.Scale.partitionPruning _),
    "q_bucketed_join" -> (graft.operators.Scale.bucketedJoin _),
    // temporal: as-of join + the full window family
    "q_asof_join" -> (Temporal.asofJoin _),
    "q_scd2_history" -> (Temporal.scd2History _),
    "q_interpolate" -> (Temporal.interpolate _),
    "q_window_sliding" -> (Temporal.slidingWindow _),
    "q_window_session" -> (Temporal.sessionWindow _),
    "q_recursive_cte" -> (Temporal.recursiveCte _),
    // file source/sink round trips
    "q_source_json" -> (Sources.jsonRoundtrip _),
    "q_source_csv" -> (Sources.csvRoundtrip _),
    "q_source_orc" -> (Sources.orcRoundtrip _),
    "q_source_merge_schema" -> (Sources.mergeSchemaRoundtrip _),
    "q_source_text" -> (Sources.textRoundtrip _),
    // streaming variants — real Structured Streaming queries over a
    // MemoryStream source, executed synchronously (SURVEY.md §2.3 s_*)
    "q_observe_metrics" -> (Observe.observeMetrics _),
    "s_pair_match" -> (graft.streaming.EventPairing.sPairMatch _),
    "s_pair_match_tws" -> (graft.streaming.PairingTws.sPairMatchTws _),
    "s_user_stats_tws" -> (graft.streaming.PairingTws.sUserStatsTws _),
    "s_ingest_time" -> (graft.streaming.IngestTime.sIngestTime _),
    "s_tumbling_agg" -> (graft.streaming.WindowedAgg.sTumblingAgg _),
    "s_pipeline" -> (graft.streaming.JoinedPipeline.sPipeline _),
    "s_join_outer" -> (graft.streaming.JoinedPipeline.sJoinOuter _),
    "s_sliding_agg" -> (graft.streaming.MoreStreaming.sSlidingAgg _),
    "s_session" -> (graft.streaming.MoreStreaming.sSession _),
    "s_dedup" -> (graft.streaming.MoreStreaming.sDedup _),
    "s_stream_static" -> (graft.streaming.MoreStreaming.sStreamStatic _),
    "s_complete_agg" -> (graft.streaming.MoreStreaming.sCompleteAgg _),
    "s_foreach_sink" -> (graft.streaming.MoreStreaming.sForeachSink _),
    "s_upsert_sink" -> (graft.streaming.MoreStreaming.sUpsertSink _),
    "s_file_source" -> (graft.streaming.MoreStreaming.sFileSource _),
    "s_quality_gate" -> (graft.streaming.MoreStreaming.sQualityGate _),
    "s_update_mode" -> (graft.streaming.MoreStreaming.sUpdateMode _),
    "s_vector_ingest" -> (graft.streaming.StreamingIndex.sVectorIngest _),
    "s_pq_ingest" -> (graft.streaming.StreamingIndex.sPqIngest _),
    "s_ivfpq_serve" -> (graft.streaming.StreamingIndex.sIvfPqServe _),
    "s_neardup_gate" -> (graft.streaming.StreamingIndex.sNeardupGate _),
    "s_substring_gate" -> (graft.streaming.StreamingIndex.sSubstringGate _),
    "s_substring_gate_upd" -> (graft.streaming.StreamingIndex.sSubstringGateUpd _),
    "s_neardup_gate_upd" -> (graft.streaming.StreamingIndex.sNeardupGateUpd _),
    "s_substring_gate_upd2" -> (graft.streaming.StreamingIndex.sSubstringGateUpd2 _),
    "s_neardup_gate_upd2" -> (graft.streaming.StreamingIndex.sNeardupGateUpd2 _),
    "s_corpus_ingest" -> (graft.streaming.StreamingIndex.sCorpusIngest _),
    "s_arrival_dedup" -> (graft.streaming.ArrivalDedup.sArrivalDedup _),
    "s_lm_drift" -> (graft.streaming.LmDrift.sLmDrift _),
    "s_domain_stats" -> (graft.streaming.DomainHealth.sDomainStats _),
    "s_bq_serve" -> (graft.streaming.StreamingIndex.sBqServe _),
    "s_ann_serve" -> (graft.streaming.StreamingIndex.sAnnServe _),
    "s_filtered_serve" -> (graft.streaming.StreamingIndex.sFilteredServe _),
    "s_index_swap" -> (graft.streaming.StreamingIndex.sIndexSwap _),
    "s_swap_inflight" -> (graft.streaming.StreamingIndex.sSwapInflight _),
  )

  /** DuckDB VALUES list kept in sync with TextAnalysis.lexicon. */
  private def lexiconValues: String =
    TextAnalysis.lexicon
      .map { case (t, l) => s"('$t','$l')" }.mkString(", ")

  /** Shared oracle CTE: placed/fulfilled pairing on the events table
    * (user_id ≙ order.id, signup ≙ order.placed, purchase ≙
    * order.fulfilled — SURVEY.md §2.3). */
  private val pairsCte: String =
    """WITH pairs AS (
      |  SELECT user_id,
      |         min(CASE WHEN event_type='signup' THEN ts END) AS placed_ts,
      |         min(CASE WHEN event_type='purchase' THEN ts END) AS fulfilled_ts
      |  FROM events GROUP BY user_id),
      |complete AS (
      |  SELECT user_id, placed_ts, fulfilled_ts,
      |         epoch_ms(fulfilled_ts) - epoch_ms(placed_ts) AS processing_ms
      |  FROM pairs
      |  WHERE placed_ts IS NOT NULL AND fulfilled_ts IS NOT NULL)
      |""".stripMargin

  /** Twin oracle for q_hybrid_weighted (vecVote = 1, the literature
    * default) and q_hybrid_parity (vecVote = 2, the measured parity
    * point from FUSION_SWEEP.json): one CTE chain, one constant
    * scaling the vector leg's RRF vote — so the twins cannot drift
    * from each other, the q_ann_filtered nprobe-twin discipline.
    * Integer·double in DuckDB matches Spark's lit(2.0)·term exactly
    * (power-of-two scaling of the same IEEE division). */
  /** The default oracle world — [[graft.operators.Corpus.Generations]]
    * verbatim (the oracle SQL is static text; it cannot read the
    * session conf, so conf-world runs are out of the driver's oracle
    * scope by design — the world machinery is spec-covered instead). */
  private val OracleGens: Vector[String] = graft.operators.Corpus.Generations

  private def hybridWeightedOracleSql(vecVote: Int): String = {
    val vecTerm =
      if (vecVote == 1) "coalesce(CAST(1 AS DOUBLE) / (60 + v.vrank), 0)"
      else s"$vecVote * coalesce(CAST(1 AS DOUBLE) / (60 + v.vrank), 0)"
    s"WITH $ivfIndexCte,\n" +
      s"""panel AS (SELECT vec_id AS qid, v AS qv FROM e
        |          WHERE $panelWhereSql),
        |toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        |         FROM documents),
        |qt AS (SELECT p.qid, t.tok FROM toks t JOIN panel p ON t.doc_id = p.qid),
        |lexc AS (SELECT qt.qid, t.doc_id, CAST(count(*) AS BIGINT) AS overlap
        |         FROM toks t JOIN qt ON t.tok = qt.tok
        |         WHERE t.doc_id <> qt.qid GROUP BY 1, 2),
        |lex AS (SELECT qid, doc_id, lrank FROM (
        |          SELECT qid, doc_id,
        |                 row_number() OVER (PARTITION BY qid
        |                   ORDER BY overlap DESC, doc_id ASC) AS lrank
        |          FROM lexc) WHERE lrank <= 10),
        |dft AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY 1),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |qti AS (SELECT qt.qid, qt.tok,
        |               CAST(floor(ln(CAST(n_docs AS DOUBLE) / df) * 1000000 + 0.5)
        |                 AS BIGINT) AS idf_fp
        |        FROM qt JOIN dft ON qt.tok = dft.tok CROSS JOIN nd),
        |wc AS (SELECT qti.qid, t.doc_id, CAST(sum(idf_fp) AS BIGINT) AS w_fp
        |       FROM toks t JOIN qti ON t.tok = qti.tok
        |       WHERE t.doc_id <> qti.qid GROUP BY 1, 2),
        |wx AS (SELECT qid, doc_id, wrank FROM (
        |         SELECT qid, doc_id,
        |                row_number() OVER (PARTITION BY qid
        |                  ORDER BY w_fp DESC, doc_id ASC) AS wrank
        |         FROM wc) WHERE wrank <= 10),
        |probed AS (SELECT qid, cell FROM (
        |             SELECT p.qid, centroid_id AS cell,
        |                    row_number() OVER (PARTITION BY p.qid
        |                      ORDER BY ${cosSql("qv", "cv")} DESC,
        |                        centroid_id ASC) AS rn
        |             FROM panel p, cen) WHERE rn <= 2),
        |vecc AS (SELECT pr.qid, e.vec_id AS doc_id, ${cosSql("v", "qv")} AS cos
        |         FROM e JOIN cells ON e.vec_id = cells.vec_id
        |              JOIN probed pr ON cells.cell = pr.cell
        |              JOIN panel p ON p.qid = pr.qid
        |         WHERE e.vec_id <> pr.qid),
        |vec AS (SELECT qid, doc_id, vrank FROM (
        |          SELECT qid, doc_id,
        |                 row_number() OVER (PARTITION BY qid
        |                   ORDER BY cos DESC, doc_id ASC) AS vrank
        |          FROM vecc) WHERE vrank <= 10),
        |lw AS (SELECT coalesce(l.qid, w.qid) AS qid,
        |              coalesce(l.doc_id, w.doc_id) AS doc_id,
        |              l.lrank AS lrank, w.wrank AS wrank
        |       FROM lex l FULL OUTER JOIN wx w
        |         ON l.qid = w.qid AND l.doc_id = w.doc_id),
        |fused AS (SELECT coalesce(x.qid, v.qid) AS qid,
        |                 coalesce(x.doc_id, v.doc_id) AS doc_id,
        |                 coalesce(CAST(1 AS DOUBLE) / (60 + x.lrank), 0)
        |                   + coalesce(CAST(1 AS DOUBLE) / (60 + x.wrank), 0)
        |                   + $vecTerm AS rrf
        |          FROM lw x FULL OUTER JOIN vec v
        |            ON x.qid = v.qid AND x.doc_id = v.doc_id),
        |r AS (SELECT qid, doc_id, rrf,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY rrf DESC, doc_id ASC) AS rk
        |      FROM fused)
        |SELECT qid, doc_id, round(rrf, 6) AS rrf, CAST(rk AS INTEGER) AS rk
        |FROM r WHERE rk <= 5 ORDER BY qid, rk""".stripMargin
  }

  /** The BPE induction+application CTE chain shared by q_bpe_apply and
    * q_vocab_coverage_bpe (mirrors Corpus.bpeChain: the same
    * freq-weighted rule learning as the q_bpe_merges oracle, carrying
    * each distinct word through the folds so v3(w, syms) is the
    * word→BPE-tokens map). One definition so the two consumers cannot
    * drift from each other or from the induction oracle. */
  private val bpeChainCte: String = bpeChainCteOver("documents")

  /** [[bpeChainCte]] generalized over its source relation (any CTE
    * with a `text` column) — the corpus-build oracle learns the SAME
    * 3-round chain on its cleaned survivors, so the induction replay
    * has exactly one definition. */
  private def bpeChainCteOver(src: String, cp: String = ""): String = {
    def mergeRound(i: Int): String = {
      val prev = s"${cp}v${i - 1}"
      s"""${cp}p$i AS MATERIALIZED (SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |         SELECT freq,
        |                unnest([syms[j] FOR j IN range(1, len(syms))]) AS l,
        |                unnest([syms[j + 1] FOR j IN range(1, len(syms))]) AS r
        |         FROM $prev WHERE len(syms) >= 2)
        |       GROUP BY l, r),
        |${cp}b$i AS MATERIALIZED (SELECT l, r FROM ${cp}p$i ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
        |${cp}v$i AS MATERIALIZED (SELECT w, freq,
        |              CASE WHEN b.l IS NULL THEN syms ELSE
        |                list_reduce(list_prepend(CAST([] AS VARCHAR[]), [[s] FOR s IN syms]),
        |                  (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND x[1] = b.r
        |                              THEN acc[1:len(acc) - 1] || [acc[-1] || x[1]]
        |                              ELSE acc || x END)
        |              END AS syms
        |       FROM $prev LEFT JOIN ${cp}b$i b ON true)""".stripMargin
    }
    s"""${cp}v0 AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq, regexp_extract_all(w, '.') AS syms
      |       FROM (SELECT unnest(string_split(text, ' ')) AS w FROM $src)
      |       WHERE len(w) >= 1 GROUP BY w),
      |${mergeRound(1)},
      |${mergeRound(2)},
      |${mergeRound(3)}""".stripMargin
  }

  /** The BQ coding CTE chain (q_bq_recall / q_bq_persist / s_bq_serve —
    * ONE definition so the recall eval, the durable tier, and the
    * serving oracle replay the identical coder): exact 1e-6 longs,
    * per-dim corpus-mean thresholds (floor of one IEEE division),
    * strict-> bits packed msb-first into two 32-bit words. Exposes
    * e(vec_id, v), tx(vec_id, xs), td(d, t), thr(ts),
    * pc(vec_id, w0, w1). */
  private val bqCodedCte: String =
    """e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
      |tx AS (SELECT vec_id,
      |              [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) FOR x IN embedding] AS xs
      |       FROM embeddings),
      |td AS (SELECT d, CAST(floor(CAST(sum(xs[d]) AS DOUBLE) / count(*)) AS BIGINT) AS t
      |       FROM tx, range(1, 65) r(d) GROUP BY d),
      |thr AS (SELECT list(t ORDER BY d) AS ts FROM td),
      |pc AS (SELECT vec_id,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           [CASE WHEN xs[j] > ts[j] THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
      |            FOR j IN range(1, 33)]), (acc, b) -> acc * 2 + b) AS w0,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           [CASE WHEN xs[j] > ts[j] THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
      |            FOR j IN range(33, 65)]), (acc, b) -> acc * 2 + b) AS w1
      |       FROM tx, thr)""".stripMargin

  /** The quality-classifier feature+score CTE chain (s_quality_gate /
    * q_quality_logit / q_corpus_build — ONE definition so the batch
    * classifier, the streaming gate, and the composed pipeline replay
    * the identical exact-integer z_fp, mirroring TextAnalysis.logitZ):
    * over any `src` with (doc_id, lang, text), exposes
    * `${p}f`(doc_id, lang, text, n_tokens, z_fp). */
  private def zfpCteOver(src: String, p: String): String =
    s"""${p}t AS MATERIALIZED (SELECT doc_id, lang, text, string_split(text, ' ') AS ts FROM $src),
      |${p}f AS MATERIALIZED (SELECT doc_id, lang, text, CAST(len(ts) AS INT) AS n_tokens,
      |             -20000000 * CAST(len(ts) AS BIGINT)
      |               + 6 * CAST(len(ts) AS BIGINT)
      |                   * CAST(floor(ln(len(ts)) * 1000000 + 0.5) AS BIGINT)
      |               + 30000000 * CAST(len(list_filter(ts, x -> x IN ('the','a','of','and','is'))) AS BIGINT)
      |               - 10000000 * CAST(len(ts) - len(list_distinct(ts)) AS BIGINT) AS z_fp
      |      FROM ${p}t)""".stripMargin

  /** DuckDB expression for graft.functions.md5hash60($e): the first 15
    * md5 hex digits folded into a 60-bit BIGINT. */
  private def h60Sql(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
      |            [CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1
      |             FOR c IN regexp_extract_all(substring(md5($e), 1, 15), '.')]),
      |            (acc, x) -> acc * 16 + x)""".stripMargin

  /** q_corpus_build oracle — the FULL pipeline replay: gate →
    * keep-first → Jaccard + recursive-CTE near-dup purge → gram-
    * ownership substring clean → 3-round BPE fold over the CLEANED
    * vocabulary ([[bpeChainCteOver]] — one definition with the
    * standalone induction oracles) → tokenize → shard/rank/offset
    * layout → per-shard summary with both checksums and the funnel
    * constants. Stage fragments mirror the standalone oracles
    * (s_quality_gate's z_fp, q_neardup_purge's cluster chain,
    * q_substring_dedup's ownership chain, q_bpe_apply's tokenize
    * tail, q_train_shuffle's layout) over the previous stage's CTE. */
  private def corpusBuildSql: String = {
    val mod = "1152921504606846976"
    s"""WITH RECURSIVE
      |${corpusChainCteOver("documents")}
      |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |       CAST(max(last_bin) + 1 AS BIGINT) AS n_bins,
      |       min_by(doc_id, pos) AS first_doc, max_by(doc_id, pos) AS last_doc,
      |       CAST(sum(oh) % $mod AS BIGINT) AS order_checksum60,
      |       CAST(sum(ch) % $mod AS BIGINT) AS content_checksum60,
      |       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_input,
      |       (SELECT CAST(count(*) AS BIGINT) FROM cbg) AS n_gated,
      |       (SELECT CAST(count(*) AS BIGINT) FROM cbe) AS n_exact,
      |       (SELECT CAST(count(*) AS BIGINT) FROM cbu) AS n_unique
      |FROM cbp GROUP BY shard ORDER BY shard""".stripMargin
  }

  /** The full corpus-build chain CTEs over an arbitrary (doc_id, lang,
    * text) source — exposes cbc (cleaned survivors), b1..b3/v3 (the
    * learned tokenizer), cbr2 (layout rows), and cbp (per-row summary
    * terms). ONE definition shared by the q_corpus_build and
    * q_corpus_apply oracles (the apply run learns its chain on the
    * BASE split). */
  private def corpusChainCteOver(src: String): String =
    s"""${zfpCteOver(src, "cb")},
      |cbg AS MATERIALIZED (SELECT doc_id, lang, text FROM cbf WHERE z_fp >= 0),
      |cbe AS MATERIALIZED (SELECT doc_id, lang, text FROM (
      |          SELECT doc_id, lang, text,
      |                 min(doc_id) OVER (PARTITION BY md5(text)) AS mn
      |          FROM cbg) WHERE doc_id = mn),
      |cbsh AS MATERIALIZED (SELECT DISTINCT doc_id,
      |                unnest([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
      |                        FOR i IN range(1, len(ts) - 1)]) AS shingle
      |         FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM cbe)),
      |cbcnt AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM cbsh GROUP BY doc_id),
      |cbint AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |                 CAST(count(*) AS BIGINT) AS n_common
      |          FROM cbsh a JOIN cbsh b
      |            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |cbpr AS MATERIALIZED (SELECT doc_a, doc_b
      |         FROM cbint JOIN cbcnt ca ON ca.doc_id = doc_a
      |                    JOIN cbcnt cb2 ON cb2.doc_id = doc_b
      |         WHERE CAST(n_common AS DOUBLE) / (ca.n + cb2.n - n_common) >= 0.5),
      |cbed AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM cbpr
      |         UNION ALL SELECT doc_b, doc_a FROM cbpr),
      |cbreach(doc, lbl) AS (
      |  SELECT a, a FROM cbed
      |  UNION
      |  SELECT e.a, r.lbl FROM cbed e JOIN cbreach r ON r.doc = e.b),
      |cbcomp AS MATERIALIZED (SELECT doc AS doc_id, min(lbl) AS rep FROM cbreach GROUP BY doc),
      |cbu AS MATERIALIZED (SELECT e.doc_id, e.lang, e.text FROM cbe e LEFT JOIN cbcomp c USING (doc_id)
      |        WHERE c.rep IS NULL OR c.rep = e.doc_id),
      |cbtk AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS ts FROM cbu),
      |cbgr AS MATERIALIZED (SELECT doc_id, i - 1 AS pos,
      |                array_to_string(ts[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ') AS gtext
      |         FROM (SELECT doc_id, ts, unnest([i FOR i IN range(1, len(ts) - 6)]) AS i
      |               FROM cbtk WHERE len(ts) >= 8)),
      |cbgh AS MATERIALIZED (SELECT doc_id, pos, gtext, ${h60Sql("gtext")} AS h FROM cbgr),
      |cbhot AS MATERIALIZED (SELECT h FROM cbgh GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
      |cbcd AS MATERIALIZED (SELECT cbgh.doc_id, cbgh.pos, cbgh.gtext FROM cbgh JOIN cbhot USING (h)),
      |cbdup AS MATERIALIZED (SELECT gtext, min(doc_id) AS first_doc FROM cbcd
      |          GROUP BY gtext HAVING count(DISTINCT doc_id) >= 2),
      |cbdr AS MATERIALIZED (SELECT c.doc_id, c.pos FROM cbcd c JOIN cbdup d USING (gtext)
      |         WHERE c.doc_id <> d.first_doc),
      |cbcv AS MATERIALIZED (SELECT DISTINCT doc_id, pos + j AS tpos FROM cbdr, range(0, 8) r(j)),
      |cbtok AS MATERIALIZED (SELECT doc_id, i - 1 AS tpos, ts[CAST(i AS BIGINT)] AS tok
      |          FROM (SELECT doc_id, ts, unnest([i FOR i IN range(1, len(ts) + 1)]) AS i
      |                FROM cbtk)),
      |cbkept AS MATERIALIZED (SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.tpos) AS text
      |           FROM cbtok t LEFT JOIN cbcv c ON t.doc_id = c.doc_id AND t.tpos = c.tpos
      |           WHERE c.tpos IS NULL GROUP BY t.doc_id),
      |cbc AS MATERIALIZED (SELECT u.doc_id, u.lang, coalesce(k.text, '') AS text
      |        FROM cbu u LEFT JOIN cbkept k USING (doc_id)),
      |${bpeChainCteOver("cbc")},
      |cbwd AS MATERIALIZED (SELECT doc_id, wpos, w FROM (
      |  SELECT doc_id, i - 1 AS wpos, ws[CAST(i AS BIGINT)] AS w
      |  FROM (SELECT doc_id, ws, unnest([i FOR i IN range(1, len(ws) + 1)]) AS i
      |        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM cbc)))
      |  WHERE len(w) >= 1),
      |cbap AS MATERIALIZED (SELECT cbwd.doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |                CAST(sum(len(v3.syms)) AS BIGINT) AS n_tokens,
      |                md5(array_to_string(flatten(list(v3.syms ORDER BY cbwd.wpos)), ' ')) AS bpe_md5
      |         FROM cbwd JOIN v3 USING (w) GROUP BY cbwd.doc_id),
      |cbly AS MATERIALIZED (SELECT doc_id, n_words, n_tokens, bpe_md5,
      |                md5('sh#' || CAST(doc_id AS VARCHAR)) AS h FROM cbap),
      |cbr AS MATERIALIZED (SELECT CAST((strpos('0123456789abcdef', substring(h, 1, 1)) - 1)
      |                 % ${graft.operators.Corpus.TsShards} AS INT) AS shard,
      |               doc_id, n_tokens, bpe_md5, h
      |        FROM cbly),
      |cbr2 AS MATERIALIZED (SELECT shard, doc_id, n_tokens, bpe_md5,
      |               CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos,
      |               CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS start_off
      |         FROM cbr),
      |cbp AS MATERIALIZED (SELECT cbr2.shard, cbr2.pos, cbr2.doc_id, cbr2.n_tokens,
      |               (cbr2.start_off + cbr2.n_tokens - 1) // ${graft.operators.Corpus.BpePackBudget} AS last_bin,
      |               ${h60Sql("CAST(cbr2.doc_id AS VARCHAR) || '@' || CAST(cbr2.pos AS VARCHAR)")} AS oh,
      |               ${h60Sql("CAST(cbr2.doc_id AS VARCHAR) || '@' || CAST(cbr2.pos AS VARCHAR) || ':' || CAST(cbr2.start_off AS VARCHAR) || '#' || cbr2.bpe_md5 || '#' || md5(c.text)")} AS ch
      |        FROM cbr2 JOIN cbc c USING (doc_id))""".stripMargin

  /** Delta-substring CTEs (expect [[incrementCtes]]'s del/bas/v in
    * scope): expose adm (admitted arrivals), gd (delta gram
    * occurrences), gb (base gram texts), drp (dropped occurrences),
    * cov (covered token positions). Shared by the
    * q_substring_dedup_delta and q_increment_run oracles. */
  private def substringDeltaCtes: String =
    """adm AS MATERIALIZED (SELECT del.doc_id, del.text FROM del JOIN v USING (doc_id)
      |        WHERE v.reason = 'ok'),
      |td AS (SELECT doc_id, string_split(text, ' ') AS ts FROM adm),
      |gd AS (SELECT doc_id, i - 1 AS pos,
      |              array_to_string(ts[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ') AS gtext
      |       FROM (SELECT doc_id, ts, unnest([i FOR i IN range(1, len(ts) - 6)]) AS i
      |             FROM td WHERE len(ts) >= 8)),
      |tb AS (SELECT doc_id, string_split(text, ' ') AS ts FROM bas),
      |gb AS (SELECT DISTINCT array_to_string(ts[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ') AS gtext
      |       FROM (SELECT doc_id, ts, unnest([i FOR i IN range(1, len(ts) - 6)]) AS i
      |             FROM tb WHERE len(ts) >= 8)),
      |drb AS (SELECT doc_id, pos FROM gd JOIN gb USING (gtext)),
      |dpg AS (SELECT gtext, min(doc_id) AS first_doc
      |        FROM (SELECT DISTINCT doc_id, gtext FROM gd)
      |        GROUP BY gtext HAVING count(*) >= 2),
      |drd AS (SELECT g.doc_id, g.pos FROM gd g JOIN dpg USING (gtext)
      |        WHERE g.doc_id <> dpg.first_doc),
      |drp AS MATERIALIZED (SELECT DISTINCT doc_id, pos FROM
      |        (SELECT * FROM drb UNION ALL SELECT * FROM drd)),
      |cov AS MATERIALIZED (SELECT DISTINCT doc_id, pos + j AS tpos FROM drp, range(0, 8) r(j))""".stripMargin

  /** The incremental-admission verdict CTEs (q_corpus_increment oracle;
    * the q_corpus_apply oracle reuses them verbatim so the reported
    * verdicts and the applied merge replay the same rule). Exposes
    * del(doc_id, lang, text, z_fp) and v(doc_id, reason). */
  private def incrementCtes: String = incrementCtes(OracleGens)

  /** DuckDB literal list of a world's bucket holdout (sorted — the
    * historical ('e', 'f') ordering). */
  private def holdSql(gens: Vector[String]): String =
    gens.sorted.map(g => s"'$g'").mkString(", ")

  private def incrementCtes(gens: Vector[String]): String =
    s"""${zfpCteOver("documents", "cx")},
      |del AS MATERIALIZED (SELECT doc_id, lang, text, z_fp FROM cxf
      |        WHERE md5(CAST(doc_id AS VARCHAR))[1:1] = '${gens(0)}'),
      |bas AS MATERIALIZED (SELECT doc_id, text FROM cxf
      |        WHERE md5(CAST(doc_id AS VARCHAR))[1:1] NOT IN (${holdSql(gens)})),
      |dh AS MATERIALIZED (SELECT doc_id, z_fp, md5(text) AS h,
      |              min(doc_id) OVER (PARTITION BY md5(text)) AS mn FROM del),
      |bh AS MATERIALIZED (SELECT DISTINCT md5(text) AS h FROM bas),
      |shd AS MATERIALIZED (SELECT DISTINCT doc_id,
      |               unnest([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
      |                       FOR i IN range(1, len(ts) - 1)]) AS shingle
      |        FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM del)),
      |shb AS MATERIALIZED (SELECT DISTINCT doc_id,
      |               unnest([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
      |                       FOR i IN range(1, len(ts) - 1)]) AS shingle
      |        FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM bas)),
      |cd AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS na FROM shd GROUP BY 1),
      |cb AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS nb FROM shb GROUP BY 1),
      |ix AS MATERIALIZED (SELECT a.doc_id AS doc_id, b.doc_id AS bid,
      |              CAST(count(*) AS BIGINT) AS n_common
      |       FROM shd a JOIN shb b ON a.shingle = b.shingle GROUP BY 1, 2),
      |nbx AS MATERIALIZED (SELECT DISTINCT ix.doc_id
      |        FROM ix JOIN cd ON cd.doc_id = ix.doc_id
      |                JOIN cb ON cb.doc_id = ix.bid
      |        WHERE CAST(n_common AS DOUBLE) / (cd.na + cb.nb - n_common) >= 0.5),
      |ixd AS MATERIALIZED (SELECT a.doc_id AS doc_id, b.doc_id AS bid2,
      |              CAST(count(*) AS BIGINT) AS n_common
      |       FROM shd a JOIN shd b
      |         ON a.shingle = b.shingle AND a.doc_id > b.doc_id GROUP BY 1, 2),
      |nbd AS MATERIALIZED (SELECT DISTINCT ixd.doc_id
      |        FROM ixd JOIN cd ON cd.doc_id = ixd.doc_id
      |                 JOIN cd cd2 ON cd2.doc_id = ixd.bid2
      |        WHERE CAST(n_common AS DOUBLE) / (cd.na + cd2.na - n_common) >= 0.5),
      |v AS MATERIALIZED (SELECT dh.doc_id,
      |             CASE WHEN dh.z_fp < 0 THEN 'quality'
      |                  WHEN bh.h IS NOT NULL THEN 'exact_base'
      |                  WHEN dh.doc_id <> dh.mn THEN 'exact_delta'
      |                  WHEN nbx.doc_id IS NOT NULL THEN 'neardup'
      |                  WHEN nbd.doc_id IS NOT NULL THEN 'neardup_delta'
      |                  ELSE 'ok' END AS reason
      |      FROM dh LEFT JOIN bh ON dh.h = bh.h
      |              LEFT JOIN nbx ON nbx.doc_id = dh.doc_id
      |              LEFT JOIN nbd ON nbd.doc_id = dh.doc_id)""".stripMargin

  /** Generation-2 admission CTEs (expect [[incrementCtes]]'s cxf/del/
    * bas/v in scope): day 2's arriving batch (the 'e' split) screened
    * against the DAY-1 CORPUS STATE — bas ∪ adm1, base plus generation
    * 1's admissions — with the same verdict rules. Exposes adm1 (gen-1
    * admitted), del2, bas2 (the day-1 state), and v2 (gen-2 verdicts).
    * Shared by the q_corpus_increment2 / q_corpus_apply2 /
    * q_dedup_index_update2 / q_increment_run2 / s_*_gate_upd2
    * oracles. */
  private def increment2Ctes: String = increment2Ctes(OracleGens)

  private def increment2Ctes(gens: Vector[String]): String =
    s"""adm1 AS MATERIALIZED (SELECT del.doc_id, del.lang, del.text FROM del JOIN v USING (doc_id)
      |        WHERE v.reason = 'ok'),
      |del2 AS MATERIALIZED (SELECT doc_id, lang, text, z_fp FROM cxf
      |        WHERE md5(CAST(doc_id AS VARCHAR))[1:1] = '${gens(1)}'),
      |bas2 AS MATERIALIZED (SELECT doc_id, text FROM bas
      |        UNION ALL SELECT doc_id, text FROM adm1),
      |dh2 AS MATERIALIZED (SELECT doc_id, z_fp, md5(text) AS h,
      |              min(doc_id) OVER (PARTITION BY md5(text)) AS mn FROM del2),
      |bh2 AS MATERIALIZED (SELECT DISTINCT md5(text) AS h FROM bas2),
      |shd2 AS MATERIALIZED (SELECT DISTINCT doc_id,
      |               unnest([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
      |                       FOR i IN range(1, len(ts) - 1)]) AS shingle
      |        FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM del2)),
      |shb2 AS MATERIALIZED (SELECT DISTINCT doc_id,
      |               unnest([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
      |                       FOR i IN range(1, len(ts) - 1)]) AS shingle
      |        FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM bas2)),
      |cd2 AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS na FROM shd2 GROUP BY 1),
      |cb2 AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS nb FROM shb2 GROUP BY 1),
      |ix2 AS MATERIALIZED (SELECT a.doc_id AS doc_id, b.doc_id AS bid,
      |              CAST(count(*) AS BIGINT) AS n_common
      |       FROM shd2 a JOIN shb2 b ON a.shingle = b.shingle GROUP BY 1, 2),
      |nbx2 AS MATERIALIZED (SELECT DISTINCT ix2.doc_id
      |        FROM ix2 JOIN cd2 ON cd2.doc_id = ix2.doc_id
      |                 JOIN cb2 ON cb2.doc_id = ix2.bid
      |        WHERE CAST(n_common AS DOUBLE) / (cd2.na + cb2.nb - n_common) >= 0.5),
      |ixd2 AS MATERIALIZED (SELECT a.doc_id AS doc_id, b.doc_id AS bid2,
      |              CAST(count(*) AS BIGINT) AS n_common
      |       FROM shd2 a JOIN shd2 b
      |         ON a.shingle = b.shingle AND a.doc_id > b.doc_id GROUP BY 1, 2),
      |nbd2 AS MATERIALIZED (SELECT DISTINCT ixd2.doc_id
      |        FROM ixd2 JOIN cd2 ON cd2.doc_id = ixd2.doc_id
      |                  JOIN cd2 cdb ON cdb.doc_id = ixd2.bid2
      |        WHERE CAST(n_common AS DOUBLE) / (cd2.na + cdb.na - n_common) >= 0.5),
      |vg2 AS MATERIALIZED (SELECT dh2.doc_id,
      |             CASE WHEN dh2.z_fp < 0 THEN 'quality'
      |                  WHEN bh2.h IS NOT NULL THEN 'exact_base'
      |                  WHEN dh2.doc_id <> dh2.mn THEN 'exact_delta'
      |                  WHEN nbx2.doc_id IS NOT NULL THEN 'neardup'
      |                  WHEN nbd2.doc_id IS NOT NULL THEN 'neardup_delta'
      |                  ELSE 'ok' END AS reason
      |      FROM dh2 LEFT JOIN bh2 ON dh2.h = bh2.h
      |               LEFT JOIN nbx2 ON nbx2.doc_id = dh2.doc_id
      |               LEFT JOIN nbd2 ON nbd2.doc_id = dh2.doc_id)""".stripMargin

  /** Generation-2 delta-substring CTEs (expect incrementCtes +
    * increment2Ctes in scope): adm2/gd2/gb2/drp2/cov2 — the
    * [[substringDeltaCtes]] shapes with the base side = bas2 (base ∪
    * day-1 admissions, the frozen day-1 corpus state). */
  private def substringDelta2Ctes: String =
    """adm2 AS MATERIALIZED (SELECT del2.doc_id, del2.text FROM del2 JOIN vg2 USING (doc_id)
      |        WHERE vg2.reason = 'ok'),
      |td2 AS (SELECT doc_id, string_split(text, ' ') AS ts FROM adm2),
      |gd2 AS (SELECT doc_id, i - 1 AS pos,
      |              array_to_string(ts[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ') AS gtext
      |       FROM (SELECT doc_id, ts, unnest([i FOR i IN range(1, len(ts) - 6)]) AS i
      |             FROM td2 WHERE len(ts) >= 8)),
      |tb2 AS (SELECT doc_id, string_split(text, ' ') AS ts FROM bas2),
      |gb2 AS (SELECT DISTINCT array_to_string(ts[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ') AS gtext
      |       FROM (SELECT doc_id, ts, unnest([i FOR i IN range(1, len(ts) - 6)]) AS i
      |             FROM tb2 WHERE len(ts) >= 8)),
      |drb2 AS (SELECT doc_id, pos FROM gd2 JOIN gb2 USING (gtext)),
      |dpg2 AS (SELECT gtext, min(doc_id) AS first_doc
      |        FROM (SELECT DISTINCT doc_id, gtext FROM gd2)
      |        GROUP BY gtext HAVING count(*) >= 2),
      |drd2 AS (SELECT g.doc_id, g.pos FROM gd2 g JOIN dpg2 USING (gtext)
      |        WHERE g.doc_id <> dpg2.first_doc),
      |drp2 AS MATERIALIZED (SELECT DISTINCT doc_id, pos FROM
      |        (SELECT * FROM drb2 UNION ALL SELECT * FROM drd2)),
      |cov2 AS MATERIALIZED (SELECT DISTINCT doc_id, pos + j AS tpos FROM drp2, range(0, 8) r(j))""".stripMargin

  /** One frozen-rule application round (the q_corpus_apply oracle's
    * delta-side rewrite): rewrite `prev`'s syms with the base chain's
    * round winner `b` — the SAME list_reduce fold the induction rounds
    * use, but over an already-learned rule. */
  private def applyRuleSql(prev: String, out: String, b: String): String =
    s"""$out AS MATERIALIZED (SELECT w, freq,
      |       CASE WHEN b.l IS NULL THEN syms ELSE
      |         list_reduce(list_prepend(CAST([] AS VARCHAR[]), [[s] FOR s IN syms]),
      |           (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND x[1] = b.r
      |                       THEN acc[1:len(acc) - 1] || [acc[-1] || x[1]]
      |                       ELSE acc || x END)
      |       END AS syms
      |FROM $prev LEFT JOIN $b b ON true)""".stripMargin

  /** The q_corpus_apply CTE stack, through `allp` (the merged run-0/
    * run-1 terms) — shared with [[corpusApply2Sql]], which chains
    * generation 2 on top of it. */
  private def corpusApplyCtes: String = corpusApplyCtes(OracleGens)

  private def corpusApplyCtes(gens: Vector[String]): String = {
    val budget = graft.operators.Corpus.BpePackBudget
    val shards = graft.operators.Corpus.TsShards
    s"""
      |absrc AS MATERIALIZED (SELECT doc_id, lang, text FROM documents
      |          WHERE md5(CAST(doc_id AS VARCHAR))[1:1] NOT IN (${holdSql(gens)})),
      |${corpusChainCteOver("absrc")},
      |${incrementCtes(gens)},
      |adm AS MATERIALIZED (SELECT del.doc_id, del.lang, del.text FROM del JOIN v USING (doc_id)
      |        WHERE v.reason = 'ok'),
      |dv0 AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq, regexp_extract_all(w, '.') AS syms
      |        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM adm)
      |        WHERE len(w) >= 1 GROUP BY w),
      |${applyRuleSql("dv0", "dv1", "b1")},
      |${applyRuleSql("dv1", "dv2", "b2")},
      |${applyRuleSql("dv2", "dv3", "b3")},
      |dwd AS MATERIALIZED (SELECT doc_id, wpos, w FROM (
      |  SELECT doc_id, i - 1 AS wpos, ws[CAST(i AS BIGINT)] AS w
      |  FROM (SELECT doc_id, ws, unnest([i FOR i IN range(1, len(ws) + 1)]) AS i
      |        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM adm)))
      |  WHERE len(w) >= 1),
      |dap AS MATERIALIZED (SELECT dwd.doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |               CAST(sum(len(dv3.syms)) AS BIGINT) AS n_tokens,
      |               md5(array_to_string(flatten(list(dv3.syms ORDER BY dwd.wpos)), ' ')) AS bpe_md5
      |        FROM dwd JOIN dv3 USING (w) GROUP BY dwd.doc_id),
      |dly AS MATERIALIZED (SELECT doc_id, n_tokens, bpe_md5,
      |               md5('sh#' || CAST(doc_id AS VARCHAR)) AS h FROM dap),
      |dsr AS MATERIALIZED (SELECT CAST((strpos('0123456789abcdef', substring(h, 1, 1)) - 1)
      |                 % $shards AS INT) AS shard, doc_id, n_tokens, bpe_md5, h
      |        FROM dly),
      |bsh AS MATERIALIZED (SELECT shard, CAST(count(*) AS BIGINT) AS bc2,
      |               CAST(sum(n_tokens) AS BIGINT) AS bt2
      |        FROM cbr2 GROUP BY shard),
      |dr2 AS MATERIALIZED (SELECT dsr.shard, dsr.doc_id, dsr.n_tokens, dsr.bpe_md5,
      |               coalesce(bsh.bc2, 0) +
      |                 CAST(row_number() OVER (PARTITION BY dsr.shard ORDER BY dsr.h, dsr.doc_id) AS BIGINT) AS pos,
      |               coalesce(bsh.bt2, 0) +
      |                 CAST(sum(dsr.n_tokens) OVER (PARTITION BY dsr.shard ORDER BY dsr.h, dsr.doc_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - dsr.n_tokens AS BIGINT) AS start_off
      |        FROM dsr LEFT JOIN bsh USING (shard)),
      |dp AS MATERIALIZED (SELECT dr2.shard, dr2.pos, dr2.doc_id, dr2.n_tokens,
      |              (dr2.start_off + dr2.n_tokens - 1) // $budget AS last_bin,
      |              ${h60Sql("CAST(dr2.doc_id AS VARCHAR) || '@' || CAST(dr2.pos AS VARCHAR)")} AS oh,
      |              ${h60Sql("CAST(dr2.doc_id AS VARCHAR) || '@' || CAST(dr2.pos AS VARCHAR) || ':' || CAST(dr2.start_off AS VARCHAR) || '#' || dr2.bpe_md5 || '#' || md5(a.text)")} AS ch
      |       FROM dr2 JOIN adm a USING (doc_id)),
      |allp AS MATERIALIZED (SELECT shard, pos, doc_id, n_tokens, last_bin, oh, ch, 0 AS run FROM cbp
      |         UNION ALL
      |         SELECT shard, pos, doc_id, n_tokens, last_bin, oh, ch, 1 FROM dp)""".stripMargin
  }

  /** q_corpus_apply oracle — base chain over the BASE split, the
    * shared admission verdicts, the frozen 3-round application to the
    * delta's own vocabulary, the appended per-shard layout, and the
    * merged summary. */
  private def corpusApplySql: String = {
    val mod = "1152921504606846976"
    s"""WITH RECURSIVE
      |$corpusApplyCtes
      |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |       CAST(max(last_bin) + 1 AS BIGINT) AS n_bins,
      |       min_by(doc_id, pos) AS first_doc, max_by(doc_id, pos) AS last_doc,
      |       CAST(sum(oh) % $mod AS BIGINT) AS order_checksum60,
      |       CAST(sum(ch) % $mod AS BIGINT) AS content_checksum60,
      |       CAST(count(CASE WHEN run = 0 THEN 1 END) AS BIGINT) AS n_base,
      |       CAST(count(CASE WHEN run = 1 THEN 1 END) AS BIGINT) AS n_added
      |FROM allp GROUP BY shard ORDER BY shard""".stripMargin
  }

  /** q_corpus_apply2 oracle — the gen-1 apply CTEs, then generation
    * 2's admission (v2 over base ∪ adm1), the SAME frozen rules
    * applied to day 2's admitted vocabulary, and the chained layout:
    * positions/offsets continue from the run-0 ∪ run-1 shard totals. */
  /** The q_corpus_apply2 CTE stack through `allp3` (runs 0/1/2) —
    * shared with the q_corpus_compact oracle, whose product is the
    * same merged chain re-laid as one store. */
  private def corpusApply2Ctes: String = corpusApply2Ctes(OracleGens)

  private def corpusApply2Ctes(gens: Vector[String]): String = {
    val budget = graft.operators.Corpus.BpePackBudget
    val shards = graft.operators.Corpus.TsShards
    s"""${corpusApplyCtes(gens)},
      |${increment2Ctes(gens)},
      |adm2a AS MATERIALIZED (SELECT del2.doc_id, del2.text FROM del2 JOIN vg2 USING (doc_id)
      |        WHERE vg2.reason = 'ok'),
      |ev0 AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq, regexp_extract_all(w, '.') AS syms
      |        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM adm2a)
      |        WHERE len(w) >= 1 GROUP BY w),
      |${applyRuleSql("ev0", "ev1", "b1")},
      |${applyRuleSql("ev1", "ev2", "b2")},
      |${applyRuleSql("ev2", "ev3", "b3")},
      |ewd AS MATERIALIZED (SELECT doc_id, wpos, w FROM (
      |  SELECT doc_id, i - 1 AS wpos, ws[CAST(i AS BIGINT)] AS w
      |  FROM (SELECT doc_id, ws, unnest([i FOR i IN range(1, len(ws) + 1)]) AS i
      |        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM adm2a)))
      |  WHERE len(w) >= 1),
      |eap AS MATERIALIZED (SELECT ewd.doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |               CAST(sum(len(ev3.syms)) AS BIGINT) AS n_tokens,
      |               md5(array_to_string(flatten(list(ev3.syms ORDER BY ewd.wpos)), ' ')) AS bpe_md5
      |        FROM ewd JOIN ev3 USING (w) GROUP BY ewd.doc_id),
      |ely AS MATERIALIZED (SELECT doc_id, n_tokens, bpe_md5,
      |               md5('sh#' || CAST(doc_id AS VARCHAR)) AS h FROM eap),
      |esr AS MATERIALIZED (SELECT CAST((strpos('0123456789abcdef', substring(h, 1, 1)) - 1)
      |                 % $shards AS INT) AS shard, doc_id, n_tokens, bpe_md5, h
      |        FROM ely),
      |psh AS MATERIALIZED (SELECT shard, CAST(count(*) AS BIGINT) AS pc,
      |               CAST(sum(n_tokens) AS BIGINT) AS pt
      |        FROM allp GROUP BY shard),
      |er2 AS MATERIALIZED (SELECT esr.shard, esr.doc_id, esr.n_tokens, esr.bpe_md5,
      |               coalesce(psh.pc, 0) +
      |                 CAST(row_number() OVER (PARTITION BY esr.shard ORDER BY esr.h, esr.doc_id) AS BIGINT) AS pos,
      |               coalesce(psh.pt, 0) +
      |                 CAST(sum(esr.n_tokens) OVER (PARTITION BY esr.shard ORDER BY esr.h, esr.doc_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - esr.n_tokens AS BIGINT) AS start_off
      |        FROM esr LEFT JOIN psh USING (shard)),
      |ep AS MATERIALIZED (SELECT er2.shard, er2.pos, er2.doc_id, er2.n_tokens,
      |              (er2.start_off + er2.n_tokens - 1) // $budget AS last_bin,
      |              ${h60Sql("CAST(er2.doc_id AS VARCHAR) || '@' || CAST(er2.pos AS VARCHAR)")} AS oh,
      |              ${h60Sql("CAST(er2.doc_id AS VARCHAR) || '@' || CAST(er2.pos AS VARCHAR) || ':' || CAST(er2.start_off AS VARCHAR) || '#' || er2.bpe_md5 || '#' || md5(a.text)")} AS ch
      |       FROM er2 JOIN adm2a a USING (doc_id)),
      |allp3 AS MATERIALIZED (SELECT shard, pos, doc_id, n_tokens, last_bin, oh, ch, run FROM allp
      |         UNION ALL
      |         SELECT shard, pos, doc_id, n_tokens, last_bin, oh, ch, 2 FROM ep)""".stripMargin
  }

  private def corpusApply2Sql: String = {
    val mod = "1152921504606846976"
    s"""WITH RECURSIVE
      |$corpusApply2Ctes
      |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |       CAST(max(last_bin) + 1 AS BIGINT) AS n_bins,
      |       min_by(doc_id, pos) AS first_doc, max_by(doc_id, pos) AS last_doc,
      |       CAST(sum(oh) % $mod AS BIGINT) AS order_checksum60,
      |       CAST(sum(ch) % $mod AS BIGINT) AS content_checksum60,
      |       CAST(count(CASE WHEN run = 0 THEN 1 END) AS BIGINT) AS n_base,
      |       CAST(count(CASE WHEN run = 1 THEN 1 END) AS BIGINT) AS n_added,
      |       CAST(count(CASE WHEN run = 2 THEN 1 END) AS BIGINT) AS n_added2
      |FROM allp3 GROUP BY shard ORDER BY shard""".stripMargin
  }

  /** q_corpus_compact oracle — the SAME chained replay as the apply2
    * oracle, summarized WITHOUT the run split (the compacted store is
    * one relation): a hash match proves the rewrite lost and reordered
    * nothing. */
  private def corpusCompactSql: String = {
    val mod = "1152921504606846976"
    s"""WITH RECURSIVE
      |$corpusApply2Ctes
      |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |       CAST(max(last_bin) + 1 AS BIGINT) AS n_bins,
      |       min_by(doc_id, pos) AS first_doc, max_by(doc_id, pos) AS last_doc,
      |       CAST(sum(oh) % $mod AS BIGINT) AS order_checksum60,
      |       CAST(sum(ch) % $mod AS BIGINT) AS content_checksum60
      |FROM allp3 GROUP BY shard ORDER BY shard""".stripMargin
  }

  /** q_corpus_rebase oracle — the full lifecycle-cycle replay in the
    * rebase world ((d,e,f) holdout): cycle 1's chained apply CTEs
    * (runs 0/1/2 — [[corpusApply2Ctes]] parameterized), then cycle 2's
    * PRODUCT-TEXT screen: ptx is exactly the loaded compacted store's
    * text column (cleaned base texts for layout docs, verbatim
    * admitted deltas), bucket-'d' arrivals screen against it with the
    * shared verdict rules, the admitted docs tokenize under the SAME
    * frozen b1..b3 rules the compaction shipped, and the layout
    * continues from the run-0/1/2 shard totals — the compacted store's
    * totals, by the r15 content-identity proof. Summarized with the
    * cycle-2 run split (n_base = compacted rows, n_added = rebase
    * delta). */
  /** The rebase world's cycle-2 screen CTEs (shared by the
    * q_corpus_rebase and q_dedup_index_rebase oracles): ptx = the
    * loaded compacted product's text column, del3/vg3/adm3 = the
    * bucket-'d' arrivals' product-text verdicts and admissions. */
  private def rebaseScreenCtes(gens: Vector[String]): String =
    s"""ptx AS MATERIALIZED (SELECT c.doc_id, c.text FROM cbc c JOIN cbap USING (doc_id)
      |        UNION ALL SELECT doc_id, text FROM adm
      |        UNION ALL SELECT doc_id, text FROM adm2a),
      |del3 AS MATERIALIZED (SELECT doc_id, lang, text, z_fp FROM cxf
      |        WHERE md5(CAST(doc_id AS VARCHAR))[1:1] = '${gens(2)}'),
      |dh3 AS MATERIALIZED (SELECT doc_id, z_fp, md5(text) AS h,
      |              min(doc_id) OVER (PARTITION BY md5(text)) AS mn FROM del3),
      |bh3 AS MATERIALIZED (SELECT DISTINCT md5(text) AS h FROM ptx),
      |shd3 AS MATERIALIZED (SELECT DISTINCT doc_id,
      |               unnest([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
      |                       FOR i IN range(1, len(ts) - 1)]) AS shingle
      |        FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM del3)),
      |shb3 AS MATERIALIZED (SELECT DISTINCT doc_id,
      |               unnest([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
      |                       FOR i IN range(1, len(ts) - 1)]) AS shingle
      |        FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM ptx)),
      |cd3 AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS na FROM shd3 GROUP BY 1),
      |cb3 AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS nb FROM shb3 GROUP BY 1),
      |ix3 AS MATERIALIZED (SELECT a.doc_id AS doc_id, b.doc_id AS bid,
      |              CAST(count(*) AS BIGINT) AS n_common
      |       FROM shd3 a JOIN shb3 b ON a.shingle = b.shingle GROUP BY 1, 2),
      |nbx3 AS MATERIALIZED (SELECT DISTINCT ix3.doc_id
      |        FROM ix3 JOIN cd3 ON cd3.doc_id = ix3.doc_id
      |                 JOIN cb3 ON cb3.doc_id = ix3.bid
      |        WHERE CAST(n_common AS DOUBLE) / (cd3.na + cb3.nb - n_common) >= 0.5),
      |ixd3 AS MATERIALIZED (SELECT a.doc_id AS doc_id, b.doc_id AS bid2,
      |              CAST(count(*) AS BIGINT) AS n_common
      |       FROM shd3 a JOIN shd3 b
      |         ON a.shingle = b.shingle AND a.doc_id > b.doc_id GROUP BY 1, 2),
      |nbd3 AS MATERIALIZED (SELECT DISTINCT ixd3.doc_id
      |        FROM ixd3 JOIN cd3 ON cd3.doc_id = ixd3.doc_id
      |                  JOIN cd3 cdc ON cdc.doc_id = ixd3.bid2
      |        WHERE CAST(n_common AS DOUBLE) / (cd3.na + cdc.na - n_common) >= 0.5),
      |vg3 AS MATERIALIZED (SELECT dh3.doc_id,
      |             CASE WHEN dh3.z_fp < 0 THEN 'quality'
      |                  WHEN bh3.h IS NOT NULL THEN 'exact_base'
      |                  WHEN dh3.doc_id <> dh3.mn THEN 'exact_delta'
      |                  WHEN nbx3.doc_id IS NOT NULL THEN 'neardup'
      |                  WHEN nbd3.doc_id IS NOT NULL THEN 'neardup_delta'
      |                  ELSE 'ok' END AS reason
      |      FROM dh3 LEFT JOIN bh3 ON dh3.h = bh3.h
      |               LEFT JOIN nbx3 ON nbx3.doc_id = dh3.doc_id
      |               LEFT JOIN nbd3 ON nbd3.doc_id = dh3.doc_id),
      |adm3 AS MATERIALIZED (SELECT del3.doc_id, del3.text FROM del3 JOIN vg3 USING (doc_id)
      |        WHERE vg3.reason = 'ok')""".stripMargin

  private def corpusRebaseSql: String = {
    val budget = graft.operators.Corpus.BpePackBudget
    val shards = graft.operators.Corpus.TsShards
    val mod = "1152921504606846976"
    val gens = graft.operators.Corpus.RebaseGens
    s"""WITH RECURSIVE
      |${corpusApply2Ctes(gens)},
      |${rebaseScreenCtes(gens)},
      |fv0 AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq, regexp_extract_all(w, '.') AS syms
      |        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM adm3)
      |        WHERE len(w) >= 1 GROUP BY w),
      |${applyRuleSql("fv0", "fv1", "b1")},
      |${applyRuleSql("fv1", "fv2", "b2")},
      |${applyRuleSql("fv2", "fv3", "b3")},
      |fwd AS MATERIALIZED (SELECT doc_id, wpos, w FROM (
      |  SELECT doc_id, i - 1 AS wpos, ws[CAST(i AS BIGINT)] AS w
      |  FROM (SELECT doc_id, ws, unnest([i FOR i IN range(1, len(ws) + 1)]) AS i
      |        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM adm3)))
      |  WHERE len(w) >= 1),
      |fap AS MATERIALIZED (SELECT fwd.doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |               CAST(sum(len(fv3.syms)) AS BIGINT) AS n_tokens,
      |               md5(array_to_string(flatten(list(fv3.syms ORDER BY fwd.wpos)), ' ')) AS bpe_md5
      |        FROM fwd JOIN fv3 USING (w) GROUP BY fwd.doc_id),
      |fly AS MATERIALIZED (SELECT doc_id, n_tokens, bpe_md5,
      |               md5('sh#' || CAST(doc_id AS VARCHAR)) AS h FROM fap),
      |fsr AS MATERIALIZED (SELECT CAST((strpos('0123456789abcdef', substring(h, 1, 1)) - 1)
      |                 % $shards AS INT) AS shard, doc_id, n_tokens, bpe_md5, h
      |        FROM fly),
      |psh3 AS MATERIALIZED (SELECT shard, CAST(count(*) AS BIGINT) AS pc,
      |               CAST(sum(n_tokens) AS BIGINT) AS pt
      |        FROM allp3 GROUP BY shard),
      |fr2 AS MATERIALIZED (SELECT fsr.shard, fsr.doc_id, fsr.n_tokens, fsr.bpe_md5,
      |               coalesce(psh3.pc, 0) +
      |                 CAST(row_number() OVER (PARTITION BY fsr.shard ORDER BY fsr.h, fsr.doc_id) AS BIGINT) AS pos,
      |               coalesce(psh3.pt, 0) +
      |                 CAST(sum(fsr.n_tokens) OVER (PARTITION BY fsr.shard ORDER BY fsr.h, fsr.doc_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - fsr.n_tokens AS BIGINT) AS start_off
      |        FROM fsr LEFT JOIN psh3 USING (shard)),
      |fp3 AS MATERIALIZED (SELECT fr2.shard, fr2.pos, fr2.doc_id, fr2.n_tokens,
      |              (fr2.start_off + fr2.n_tokens - 1) // $budget AS last_bin,
      |              ${h60Sql("CAST(fr2.doc_id AS VARCHAR) || '@' || CAST(fr2.pos AS VARCHAR)")} AS oh,
      |              ${h60Sql("CAST(fr2.doc_id AS VARCHAR) || '@' || CAST(fr2.pos AS VARCHAR) || ':' || CAST(fr2.start_off AS VARCHAR) || '#' || fr2.bpe_md5 || '#' || md5(a.text)")} AS ch
      |       FROM fr2 JOIN adm3 a USING (doc_id)),
      |allp4 AS MATERIALIZED (SELECT shard, pos, doc_id, n_tokens, last_bin, oh, ch, run FROM allp3
      |         UNION ALL
      |         SELECT shard, pos, doc_id, n_tokens, last_bin, oh, ch, 3 FROM fp3)
      |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |       CAST(max(last_bin) + 1 AS BIGINT) AS n_bins,
      |       min_by(doc_id, pos) AS first_doc, max_by(doc_id, pos) AS last_doc,
      |       CAST(sum(oh) % $mod AS BIGINT) AS order_checksum60,
      |       CAST(sum(ch) % $mod AS BIGINT) AS content_checksum60,
      |       CAST(count(CASE WHEN run <= 2 THEN 1 END) AS BIGINT) AS n_base,
      |       CAST(count(CASE WHEN run = 3 THEN 1 END) AS BIGINT) AS n_added
      |FROM allp4 GROUP BY shard ORDER BY shard""".stripMargin
  }

  /** q_store_vacuum oracle — the vacuum's proof columns are the
    * LOADED default-world compacted store's totals (the chained-replay
    * currency, aggregated without the shard split), and its invariant
    * columns are exact constants: 4 ensured lifecycle roots, and 0
    * displaced roots remaining in each family after the reclaim (the
    * post-condition the Spark side computes by re-scanning — a failed
    * delete breaks the match). */
  private def storeVacuumSql: String = {
    val mod = "1152921504606846976"
    s"""WITH RECURSIVE
      |$corpusApply2Ctes
      |SELECT CAST(4 AS BIGINT) AS live_roots,
      |       CAST(0 AS BIGINT) AS corpus_displaced_left,
      |       CAST(0 AS BIGINT) AS index_displaced_left,
      |       CAST(0 AS BIGINT) AS warehouse_displaced_left,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |       CAST(sum(oh) % $mod AS BIGINT) AS order_checksum60,
      |       CAST(sum(ch) % $mod AS BIGINT) AS content_checksum60
      |FROM allp3""".stripMargin
  }


  /** q_dedup_index_rebase oracle — the rebase world's chained replay
    * plus the cycle-2 screen CTEs, then the gram/band summary over
    * exactly ptx ∪ adm3: the compacted product's texts plus the
    * admitted day-3 arrivals — the content the cycle-2 gate pair must
    * hold. */
  private def dedupIndexRebaseSql: String = {
    val gens = graft.operators.Corpus.RebaseGens
    s"""WITH RECURSIVE
      |${corpusApply2Ctes(gens)},
      |${rebaseScreenCtes(gens)},
      |rau AS MATERIALIZED (SELECT doc_id, text FROM ptx
      |       UNION ALL SELECT doc_id, text FROM adm3),
      |${md5BandsCteOver("rau", "u")},
      |${indexSummaryTailSql("rau")}""".stripMargin
  }

  /** q_tokenizer_drift oracle — the base chain + admission + frozen
    * application shared with the apply oracle, plus a PREFIX-
    * instantiated fresh chain (`fz`) learned on cleaned-base ∪
    * admitted, compared per admitted word. */
  private def tokenizerDriftSql: String =
    s"""WITH RECURSIVE
      |absrc AS (SELECT doc_id, lang, text FROM documents
      |          WHERE md5(CAST(doc_id AS VARCHAR))[1:1] NOT IN ('e', 'f')),
      |${corpusChainCteOver("absrc")},
      |$incrementCtes,
      |adm AS MATERIALIZED (SELECT del.doc_id, del.lang, del.text FROM del JOIN v USING (doc_id)
      |        WHERE v.reason = 'ok'),
      |dv0 AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq, regexp_extract_all(w, '.') AS syms
      |        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM adm)
      |        WHERE len(w) >= 1 GROUP BY w),
      |${applyRuleSql("dv0", "dv1", "b1")},
      |${applyRuleSql("dv1", "dv2", "b2")},
      |${applyRuleSql("dv2", "dv3", "b3")},
      |uni AS MATERIALIZED (SELECT text FROM cbc UNION ALL SELECT text FROM adm),
      |${bpeChainCteOver("uni", "fz")},
      |cmpx AS MATERIALIZED (SELECT dv3.w, dv3.freq, dv3.syms AS f1, fzv3.syms AS f2
      |        FROM dv3 JOIN fzv3 USING (w)),
      |rc AS (SELECT CAST(
      |         (CASE WHEN (SELECT count(*) FROM b1) = (SELECT count(*) FROM fzb1)
      |               AND NOT EXISTS (SELECT 1 FROM b1 a, fzb1 f WHERE a.l <> f.l OR a.r <> f.r)
      |          THEN 0 ELSE 1 END) +
      |         (CASE WHEN (SELECT count(*) FROM b2) = (SELECT count(*) FROM fzb2)
      |               AND NOT EXISTS (SELECT 1 FROM b2 a, fzb2 f WHERE a.l <> f.l OR a.r <> f.r)
      |          THEN 0 ELSE 1 END) +
      |         (CASE WHEN (SELECT count(*) FROM b3) = (SELECT count(*) FROM fzb3)
      |               AND NOT EXISTS (SELECT 1 FROM b3 a, fzb3 f WHERE a.l <> f.l OR a.r <> f.r)
      |          THEN 0 ELSE 1 END) AS BIGINT) AS n_rules_changed)
      |SELECT CAST(count(*) AS BIGINT) AS n_distinct_words,
      |       CAST(count(CASE WHEN f1 <> f2 THEN 1 END) AS BIGINT) AS n_changed_words,
      |       CAST(sum(freq) AS BIGINT) AS occ_total,
      |       CAST(coalesce(sum(CASE WHEN f1 <> f2 THEN freq END), 0) AS BIGINT) AS occ_changed,
      |       round(CAST(coalesce(sum(CASE WHEN f1 <> f2 THEN freq END), 0) AS DOUBLE)
      |             / sum(freq), 6) AS changed_share,
      |       CAST(sum(freq * len(f1)) AS BIGINT) AS tokens_frozen,
      |       CAST(sum(freq * len(f2)) AS BIGINT) AS tokens_fresh,
      |       (SELECT n_rules_changed FROM rc) AS n_rules_changed
      |FROM cmpx""".stripMargin

  /** q_tokenizer_drift2 oracle — day 2's admitted vocabulary under the
    * frozen day-0 rules vs a fresh chain learned on cleaned-base ∪
    * a₁ ∪ a₂ (what a full rebuild would now see). */
  private def tokenizerDrift2Sql: String =
    s"""WITH RECURSIVE
      |absrc AS (SELECT doc_id, lang, text FROM documents
      |          WHERE md5(CAST(doc_id AS VARCHAR))[1:1] NOT IN ('e', 'f')),
      |${corpusChainCteOver("absrc")},
      |$incrementCtes,
      |$increment2Ctes,
      |adm2d AS MATERIALIZED (SELECT del2.doc_id, del2.text FROM del2 JOIN vg2 USING (doc_id)
      |        WHERE vg2.reason = 'ok'),
      |ev0 AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq, regexp_extract_all(w, '.') AS syms
      |        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM adm2d)
      |        WHERE len(w) >= 1 GROUP BY w),
      |${applyRuleSql("ev0", "ev1", "b1")},
      |${applyRuleSql("ev1", "ev2", "b2")},
      |${applyRuleSql("ev2", "ev3", "b3")},
      |uni AS MATERIALIZED (SELECT text FROM cbc
      |       UNION ALL SELECT text FROM adm1
      |       UNION ALL SELECT text FROM adm2d),
      |${bpeChainCteOver("uni", "fz")},
      |cmpx AS MATERIALIZED (SELECT ev3.w, ev3.freq, ev3.syms AS f1, fzv3.syms AS f2
      |        FROM ev3 JOIN fzv3 USING (w)),
      |rc AS (SELECT CAST(
      |         (CASE WHEN (SELECT count(*) FROM b1) = (SELECT count(*) FROM fzb1)
      |               AND NOT EXISTS (SELECT 1 FROM b1 a, fzb1 f WHERE a.l <> f.l OR a.r <> f.r)
      |          THEN 0 ELSE 1 END) +
      |         (CASE WHEN (SELECT count(*) FROM b2) = (SELECT count(*) FROM fzb2)
      |               AND NOT EXISTS (SELECT 1 FROM b2 a, fzb2 f WHERE a.l <> f.l OR a.r <> f.r)
      |          THEN 0 ELSE 1 END) +
      |         (CASE WHEN (SELECT count(*) FROM b3) = (SELECT count(*) FROM fzb3)
      |               AND NOT EXISTS (SELECT 1 FROM b3 a, fzb3 f WHERE a.l <> f.l OR a.r <> f.r)
      |          THEN 0 ELSE 1 END) AS BIGINT) AS n_rules_changed)
      |SELECT CAST(count(*) AS BIGINT) AS n_distinct_words,
      |       CAST(count(CASE WHEN f1 <> f2 THEN 1 END) AS BIGINT) AS n_changed_words,
      |       CAST(sum(freq) AS BIGINT) AS occ_total,
      |       CAST(coalesce(sum(CASE WHEN f1 <> f2 THEN freq END), 0) AS BIGINT) AS occ_changed,
      |       round(CAST(coalesce(sum(CASE WHEN f1 <> f2 THEN freq END), 0) AS DOUBLE)
      |             / sum(freq), 6) AS changed_share,
      |       CAST(sum(freq * len(f1)) AS BIGINT) AS tokens_frozen,
      |       CAST(sum(freq * len(f2)) AS BIGINT) AS tokens_fresh,
      |       (SELECT n_rules_changed FROM rc) AS n_rules_changed
      |FROM cmpx""".stripMargin

  /** The WordPiece induction CTE chain (q_wordpiece_merges oracle):
    * the [[bpeChainCte]] shape with the likelihood criterion — each
    * round's winner maximizes cnt/(c(l)·c(r)) over the current
    * unigram counts instead of the raw pair count. Scores are exact
    * integers folded through identical IEEE double ops in both
    * engines, tie-broken (l, r). */
  private val wpChainCte: String = {
    def wpRound(i: Int): String = {
      val prev = s"w${i - 1}"
      s"""wp$i AS (SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |         SELECT freq,
        |                unnest([syms[j] FOR j IN range(1, len(syms))]) AS l,
        |                unnest([syms[j + 1] FOR j IN range(1, len(syms))]) AS r
        |         FROM $prev WHERE len(syms) >= 2)
        |       GROUP BY l, r),
        |wu$i AS (SELECT sym, CAST(sum(freq) AS BIGINT) AS c1 FROM (
        |         SELECT freq, unnest(syms) AS sym FROM $prev)
        |       GROUP BY sym),
        |ws$i AS (SELECT p.l, p.r, p.cnt,
        |                CAST(p.cnt AS DOUBLE) /
        |                  (CAST(ul.c1 AS DOUBLE) * CAST(ur.c1 AS DOUBLE)) AS score
        |         FROM wp$i p JOIN wu$i ul ON ul.sym = p.l
        |              JOIN wu$i ur ON ur.sym = p.r),
        |wb$i AS (SELECT l, r, cnt, score FROM ws$i
        |         ORDER BY score DESC, l ASC, r ASC LIMIT 1),
        |w$i AS (SELECT w, freq,
        |              CASE WHEN b.l IS NULL THEN syms ELSE
        |                list_reduce(list_prepend(CAST([] AS VARCHAR[]), [[s] FOR s IN syms]),
        |                  (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND x[1] = b.r
        |                              THEN acc[1:len(acc) - 1] || [acc[-1] || x[1]]
        |                              ELSE acc || x END)
        |              END AS syms
        |       FROM $prev LEFT JOIN wb$i b ON true)""".stripMargin
    }
    s"""w0 AS (SELECT w, CAST(count(*) AS BIGINT) AS freq, regexp_extract_all(w, '.') AS syms
      |       FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |       WHERE len(w) >= 1 GROUP BY w),
      |${wpRound(1)},
      |${wpRound(2)},
      |${wpRound(3)}""".stripMargin
  }

  /** The unigram-LM (SentencePiece-style) induction CTE chain
    * (q_unigram_lm oracle), mirroring Corpus.unigramLm: substring
    * candidate pieces (≤4 chars, singles always kept, multi-char
    * gated at freq 2), two Viterbi passes, one hard-EM recount with
    * add-1 smoothing between them. The DP replays as a list_reduce
    * whose accumulator is a LIST of [score, −len] pairs (position =
    * len(acc)); the per-step max is a single `list_sort(...)[-1]`
    * (lexicographic: max score, then max −len = SHORTEST last piece —
    * the Spark side's array_max-on-struct tie rule) so the fold is
    * order-independent and single-reference. The backtrack
    * precomputes a pure `nxt` jump table and folds by UNCONDITIONAL
    * prepend (0-padded), because a lambda branch that returns the
    * accumulator unchanged is state-corrupting in DuckDB 1.0.0's
    * vectorized executor (measured: run-to-run nondeterministic
    * segmentations; the pure-prepend form is 5/5-run stable). */
  private val umChainCte: String = {
    def viterbi(lpRel: String, sfx: String): String =
      s"""umsc$sfx AS (SELECT w, freq, list({'j': j, 'i': i, 'lp': lp} ORDER BY j, i) AS sps
        |        FROM umsp JOIN $lpRel USING (p) GROUP BY w, freq),
        |umdp$sfx AS (SELECT w, freq,
        |  list_reduce(
        |    list_prepend([[CAST(0 AS BIGINT), CAST(0 AS BIGINT)]],
        |      list_transform(range(1, len(w) + 1),
        |        z -> [[CAST(0 AS BIGINT), CAST(0 AS BIGINT)]])),
        |    (acc, x) -> list_append(acc,
        |      list_sort(list_transform(list_filter(sps, sp -> sp.i = len(acc)),
        |        sp -> [acc[sp.j + 1][1] + sp.lp, sp.j - sp.i]))[-1])) AS dp
        |  FROM umsc$sfx),
        |umseg$sfx AS (SELECT w, freq, list_filter(
        |    list_transform(range(1, len(cuts)),
        |      k -> CASE WHEN cuts[k] < cuts[k + 1]
        |           THEN w[cuts[k] + 1 : cuts[k + 1]] END),
        |    x -> x IS NOT NULL) AS seg FROM (
        |  SELECT w, freq,
        |    list_reduce(
        |      list_prepend([CAST(len(w) AS BIGINT)],
        |        list_transform(range(1, len(w) + 1), z -> [CAST(0 AS BIGINT)])),
        |      (acc, x) -> list_prepend(nxt[acc[1] + 1], acc)) AS cuts
        |  FROM (SELECT w, freq,
        |          list_transform(range(0, len(w) + 1),
        |            p -> CASE WHEN p <= 0 THEN CAST(0 AS BIGINT)
        |                 ELSE p + dp[p + 1][2] END) AS nxt
        |        FROM umdp$sfx)))""".stripMargin
    s"""umw AS (SELECT w, CAST(count(*) AS BIGINT) AS freq
      |       FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |       WHERE len(w) >= 1 GROUP BY w),
      |umsp AS (SELECT w, freq, sp.j AS j, sp.i AS i, sp.p AS p FROM (
      |  SELECT w, freq, unnest(flatten([[{'j': j, 'i': j + m, 'p': w[j + 1 : j + m]}
      |           FOR m IN range(1, least(4, len(w) - j) + 1)]
      |           FOR j IN range(0, len(w))])) AS sp
      |  FROM umw)),
      |umc0 AS (SELECT p, cnt FROM (
      |  SELECT p, CAST(sum(freq) AS BIGINT) AS cnt FROM umsp GROUP BY p)
      |  WHERE len(p) = 1 OR cnt >= 2),
      |umlp0 AS (SELECT p,
      |    CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
      |  - (SELECT CAST(floor(ln(CAST(sum(cnt) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
      |     FROM umc0) AS lp
      |  FROM umc0),
      |${viterbi("umlp0", "0")},
      |umc1 AS (SELECT p, CAST(coalesce(used, 0) + 1 AS BIGINT) AS cnt
      |         FROM umc0 LEFT JOIN (
      |           SELECT p, CAST(sum(freq) AS BIGINT) AS used
      |           FROM (SELECT freq, unnest(seg) AS p FROM umseg0) GROUP BY p) u
      |         USING (p)),
      |umlp1 AS (SELECT p,
      |    CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
      |  - (SELECT CAST(floor(ln(CAST(sum(cnt) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
      |     FROM umc1) AS lp
      |  FROM umc1),
      |${viterbi("umlp1", "1")}""".stripMargin
  }

  /** Rounded cosine on the 1e-6 grid — the IVF family's comparison
    * currency (drift-proof across engines). */
  private def cosSql(a: String, b: String): String =
    s"round(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"

  /** Shared recall-eval SQL pieces (q_ann_recall / q_sq_recall /
    * q_lsh_recall / q_ivfsq_recall): the panel predicate — every
    * panelStride-th vec_id at offset 17, with centroid-seed ids
    * excluded EXPLICITLY (Similarity.panelFilter: the offset alone
    * only guarantees seed-disjointness while both strides are
    * multiples of 50) — and the hits→summary fold. One definition so
    * the four recall oracles measure the identical panel and cannot
    * drift from each other. Both assume a CTE `e(vec_id, …)` holding
    * the full corpus and CTEs `exact(qid, vec_id)` /
    * `approx(qid, vec_id)` holding the two top-10 sets. */
  private val panelWhereSql =
    """vec_id % (SELECT greatest(50, count(*) // 20) FROM e) = 17
      |            AND vec_id % (SELECT greatest(50, CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT), count(*) // 65536) FROM e) <> 0""".stripMargin

  private val recallTailSql =
    """hits AS (SELECT x.qid, CAST(count(*) AS BIGINT) AS nx,
      |                CAST(count(a.vec_id) AS BIGINT) AS nh
      |         FROM exact x LEFT JOIN approx a ON a.qid = x.qid AND a.vec_id = x.vec_id
      |         GROUP BY x.qid)
      |SELECT 10 AS k, CAST(count(*) AS BIGINT) AS n_queries,
      |       CAST(sum(nx) AS BIGINT) AS n_exact, CAST(sum(nh) AS BIGINT) AS n_hit,
      |       round(CAST(sum(nh) AS DOUBLE) / sum(nx), 6) AS recall
      |FROM hits""".stripMargin

  /** Shared IVF-index CTE chain (q_similarity_ivf / q_ann_recall /
    * q_semdedup — ONE definition so the three oracles cannot drift from
    * each other or from Similarity.trainedCentroids): stride-seeded
    * centroids (stride = max(50, ⌊√n⌋, n/65536) — the √-law: nlist ∝ √n
    * under a 64Ki broadcast cap; IEEE sqrt is exactly rounded in both
    * engines for n < 2^52, so the stride replays bit-for-bit),
    * IvfIters Lloyd's rounds with scaled-long fixed-point means
    * (round(v[i]·1e6) per component — integer sums are order-exact, the
    * single double division replays bit-identically), then the final
    * argmax assignment. Exposes: e(vec_id, v), cen(centroid_id, cv) —
    * the trained set — asn(vec_id, centroid_id, cos), cells(vec_id,
    * cell). dims is fixed at 64 (the embeddings table's width). */
  private val ivfIndexCte: String = ivfIndexCteOver("embeddings")

  /** [[ivfIndexCte]] generalized over its source relation — the
    * refresh oracle trains the SAME chain on the pre-arrival corpus
    * subset (q_index_refresh), so the training replay has exactly one
    * definition. */
  private def ivfIndexCteOver(src: String, sfx: String = ""): String = {
    val iters = graft.operators.Similarity.IvfIters
    val sb = new StringBuilder
    sb ++= s"""e$sfx AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM $src),
              |cen${sfx}0 AS (SELECT vec_id AS centroid_id, v AS cv FROM e$sfx
              |         WHERE vec_id % (SELECT greatest(50, CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT), count(*) // 65536) FROM e$sfx) = 0),
              |""".stripMargin
    for (t <- 0 until iters) {
      sb ++= s"""asn$sfx$t AS (SELECT e$sfx.vec_id, centroid_id, ${cosSql("v", "cv")} AS cos FROM e$sfx, cen$sfx$t),
                |cell$sfx$t AS (SELECT vec_id, centroid_id AS cell FROM (
                |            SELECT vec_id, centroid_id,
                |                   row_number() OVER (PARTITION BY vec_id
                |                                      ORDER BY cos DESC, centroid_id DESC) AS rn
                |            FROM asn$sfx$t) WHERE rn = 1),
                |sum$sfx$t AS (SELECT cell, i, sum(CAST(round(v[i] * 1000000.0) AS BIGINT)) AS sx,
                |                 CAST(count(*) AS BIGINT) AS cnt
                |          FROM e$sfx JOIN cell$sfx$t USING (vec_id), range(1, 65) r(i)
                |          GROUP BY cell, i),
                |cen$sfx${t + 1} AS (SELECT cell AS centroid_id, list(sx / (1000000.0 * cnt) ORDER BY i) AS cv
                |          FROM sum$sfx$t GROUP BY cell),
                |""".stripMargin
    }
    sb ++= s"""cen$sfx AS (SELECT centroid_id, cv FROM cen$sfx$iters),
              |asn$sfx AS (SELECT e$sfx.vec_id, centroid_id, ${cosSql("v", "cv")} AS cos FROM e$sfx, cen$sfx),
              |cells$sfx AS (SELECT vec_id, centroid_id AS cell FROM (
              |           SELECT vec_id, centroid_id,
              |                  row_number() OVER (PARTITION BY vec_id
              |                                     ORDER BY cos DESC, centroid_id DESC) AS rn
              |           FROM asn$sfx) WHERE rn = 1)""".stripMargin
    sb.toString
  }

  /** Shared PQ-index CTE chain (q_pq_recall / q_ivfpq_recall — ONE
    * definition so the flat-PQ and IVF-PQ oracles replay the identical
    * training): 1e6-scaled subvectors, stride-seeded 16-code
    * per-subspace codebooks, one Lloyd's round in INTEGER squared-L2
    * (no rounding grid anywhere — the single mean division replays
    * bit-identically), then the final coding. Exposes ev(vec_id, xs),
    * sv(vec_id, sub, v), cb(sub, code, c), codes(vec_id, sub, code).
    * Does NOT define `e` — the flat oracle derives it from ev, the
    * composed oracle brings the float `e` from [[ivfIndexCte]]. */
  private val pqIndexCte: String = pqIndexCteOver("embeddings")

  /** [[pqIndexCte]] generalized over its source relation — the PQ
    * refresh oracle trains the SAME chain on the pre-arrival subset
    * (q_pq_refresh), so the training replay has one definition. */
  private def pqIndexCteOver(src: String): String =
    s"""ev AS (SELECT vec_id,
      |             [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) FOR x IN embedding] AS xs
      |      FROM $src),
      |sv AS (SELECT vec_id, s AS sub, list_slice(xs, s*8 + 1, s*8 + 8) AS v
      |       FROM ev, range(0, 8) r(s)),
      |cb0 AS (SELECT sub, vec_id AS code, v AS c FROM sv
      |        WHERE vec_id % (SELECT greatest(50, count(*) // 16) FROM ev) = 0),
      |pasn0 AS (SELECT sv.vec_id, sv.sub, code,
      |                CAST(list_sum([(v[i] - c[i]) * (v[i] - c[i]) FOR i IN range(1, 9)]) AS BIGINT) AS d2
      |         FROM sv JOIN cb0 USING (sub)),
      |pa0 AS (SELECT vec_id, sub, code FROM (
      |        SELECT vec_id, sub, code,
      |               row_number() OVER (PARTITION BY vec_id, sub
      |                                  ORDER BY d2 ASC, code ASC) AS rn
      |        FROM pasn0) WHERE rn = 1),
      |psum0 AS (SELECT sub, code, i, CAST(sum(v[i]) AS BIGINT) AS sx,
      |                CAST(count(*) AS BIGINT) AS cnt
      |         FROM sv JOIN pa0 USING (vec_id, sub), range(1, 9) r(i)
      |         GROUP BY 1, 2, 3),
      |cb AS (SELECT sub, code,
      |              list(CAST(round(CAST(sx AS DOUBLE) / cnt) AS BIGINT) ORDER BY i) AS c
      |       FROM psum0 GROUP BY 1, 2),
      |pasn1 AS (SELECT sv.vec_id, sv.sub, code,
      |                CAST(list_sum([(v[i] - c[i]) * (v[i] - c[i]) FOR i IN range(1, 9)]) AS BIGINT) AS d2
      |         FROM sv JOIN cb USING (sub)),
      |codes AS (SELECT vec_id, sub, code FROM (
      |           SELECT vec_id, sub, code,
      |                  row_number() OVER (PARTITION BY vec_id, sub
      |                                     ORDER BY d2 ASC, code ASC) AS rn
      |           FROM pasn1) WHERE rn = 1)""".stripMargin

  /** Shared composed-ADC CTE (q_ivfpq_recall / q_ivfpq_rerank — ONE
    * definition of the coarse+fine scoring): seed-disjoint panel over
    * the IVF chain's float `e`, per-query subvectors, float-cosine
    * probe of the trained centroids (top-2 cells), broadcast ADC
    * distance table, and the cell-pruned integer candidate scores.
    * Assumes [[ivfIndexCte]] (e, cen, cells) and [[pqIndexCte]] (sv,
    * cb, codes) precede it. Exposes panel(qid, pqv), psv(qid, sub,
    * qv), adc(qid, vec_id, dist). */
  private val ivfpqAdcCte: String =
    s"""panel AS (SELECT vec_id AS qid, v AS pqv FROM e
      |          WHERE $panelWhereSql),
      |psv AS (SELECT panel.qid, sv.sub, sv.v AS qv
      |        FROM sv JOIN panel ON sv.vec_id = panel.qid),
      |probed AS (SELECT qid, cell FROM (
      |             SELECT p.qid, centroid_id AS cell,
      |                    row_number() OVER (PARTITION BY p.qid
      |                      ORDER BY ${cosSql("pqv", "cv")} DESC,
      |                        centroid_id ASC) AS rn
      |             FROM panel p, cen) WHERE rn <= 2),
      |dt AS (SELECT qid, cb.sub, cb.code,
      |              CAST(list_sum([(qv[i] - c[i]) * (qv[i] - c[i]) FOR i IN range(1, 9)]) AS BIGINT) AS dq
      |       FROM psv JOIN cb ON psv.sub = cb.sub),
      |adc AS (SELECT dt.qid, codes.vec_id, CAST(sum(dq) AS BIGINT) AS dist
      |        FROM codes
      |        JOIN cells ON codes.vec_id = cells.vec_id
      |        JOIN probed pr ON cells.cell = pr.cell
      |        JOIN dt ON codes.sub = dt.sub AND codes.code = dt.code
      |               AND dt.qid = pr.qid
      |        GROUP BY 1, 2)""".stripMargin

  /** The PQ family's exact side — integer-L2 top-10 per panel query
    * over the subvector relations (assumes sv + psv defined). */
  private val pqExactSql: String =
    """exd AS (SELECT psv.qid, sv.vec_id,
      |               CAST(sum(list_sum([(sv.v[i] - qv[i]) * (sv.v[i] - qv[i]) FOR i IN range(1, 9)])) AS BIGINT) AS dist
      |        FROM sv JOIN psv ON sv.sub = psv.sub
      |        GROUP BY 1, 2),
      |exact AS (SELECT qid, vec_id FROM (
      |           SELECT qid, vec_id,
      |                  row_number() OVER (PARTITION BY qid
      |                                     ORDER BY dist ASC, vec_id ASC) AS rn
      |           FROM exd WHERE vec_id <> qid) WHERE rn <= 10),
      |""".stripMargin

  /** Shared md5-MinHash band CTE (q_dedup_minhash_md5 /
    * s_neardup_gate — ONE definition so the batch sketch oracle and
    * the streaming gate oracle cannot drift): 3-token shingles, two
    * 60-bit md5 parses per shingle, the Kirsch–Mitzenmacher family
    * h_j = h1 + j·(h2 >> 4), per-doc component minima, "m0:m1:m2:m3"
    * band keys. Exposes `bands(doc_id, band, band_key)`. */
  /** [[md5BandsCte]] over an arbitrary source relation with prefixed
    * CTE names (exposes `${p}bands`) — the composed ingest oracle
    * instantiates it twice: once over the arrival set (probe side),
    * once over `documents` (corpus side). No leading WITH, no trailing
    * separator; the caller composes. */
  private def md5BandsCteOver(src: String, p: String): String =
    s"""${p}toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM $src),
      |${p}sh AS (SELECT doc_id,
      |              unnest([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
      |                      FOR i IN range(1, len(ts) - 1)]) AS s
      |       FROM ${p}toks),
      |${p}hh AS (
      |  SELECT doc_id,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           [CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1
      |            FOR c IN regexp_extract_all(substring(md5(s || '#a'), 1, 15), '.')]),
      |           (acc, x) -> acc * 16 + x) AS h1,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           [CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1
      |            FOR c IN regexp_extract_all(substring(md5(s || '#b'), 1, 15), '.')]),
      |           (acc, x) -> acc * 16 + x) AS h2
      |  FROM ${p}sh),
      |${p}mins AS (
      |  SELECT doc_id, j, min(h1 + j * (h2 >> 4)) AS m
      |  FROM ${p}hh, range(0, 16) r(j) GROUP BY 1, 2),
      |${p}bands AS (
      |  SELECT doc_id, j // 4 AS band,
      |         string_agg(CAST(m AS VARCHAR), ':' ORDER BY j) AS band_key
      |  FROM ${p}mins GROUP BY 1, 2)""".stripMargin

  private val md5BandsCte: String =
    "WITH " + md5BandsCteOver("documents", "") + "\n"

  /** Shared oracle texts — streaming variants check the SAME SQL as
    * their batch twins (one place to fix a boundary semantic). */
  private val tumblingAggSql: String =
    """SELECT event_type,
      |       epoch_ms(time_bucket(INTERVAL 1 minute, ts)) AS window_start_ms,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val slidingAggSql: String =
    """SELECT event_type,
      |       epoch_ms(time_bucket(INTERVAL 1 minute, ts) - k * INTERVAL 1 minute) AS window_start_ms,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value
      |FROM events, range(0, 2) r(k)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val sessionWindowSql: String =
    """WITH e AS (
      |  SELECT user_id, ts,
      |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |              OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 5 minute
      |              THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |g AS (
      |  SELECT user_id, ts,
      |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |                        ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM e)
      |SELECT user_id, epoch_ms(min(ts)) AS session_start_ms,
      |       CAST(count(*) AS BIGINT) AS n_events, epoch_ms(max(ts)) AS last_ms
      |FROM g GROUP BY user_id, grp ORDER BY 1, 2""".stripMargin

  private val runningAggSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       epoch_ms(min(ts)) AS first_ms, epoch_ms(max(ts)) AS last_ms
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** DuckDB equivalents for the hash-compare (driver-run). Omitted keys
    * (approximate / non-SQL-expressible ops) get a rows-only check. */
  /** Shared by q_knn_join_cell and q_knn_join_salted: the salted
    * variant is the same celled top-k under the same total order —
    * only the physical tiling differs. */
  private val knnJoinCellSql: String =
    s"""WITH $ivfIndexCte,
      |cand AS (
      |  SELECT ea.vec_id AS vec_id, eb.vec_id AS neighbor,
      |         ${cosSql("ea.v", "eb.v")} AS cos_sim
      |  FROM e ea JOIN cells ca ON ea.vec_id = ca.vec_id
      |       JOIN cells cb ON ca.cell = cb.cell
      |       JOIN e eb ON eb.vec_id = cb.vec_id AND eb.vec_id <> ea.vec_id),
      |ranked AS (
      |  SELECT vec_id, neighbor, cos_sim,
      |         CAST(row_number() OVER (PARTITION BY vec_id
      |           ORDER BY cos_sim DESC, neighbor ASC) AS INT) AS rk
      |  FROM cand)
      |SELECT vec_id, neighbor, cos_sim, rk
      |FROM ranked WHERE rk <= 3 ORDER BY vec_id, rk""".stripMargin

  /** The base ∪ a₁ ∪ a₂ index-summary replay — the shared oracle of
    * q_dedup_index_update2 AND q_dedup_index_compact (the compaction
    * changes layout only, never content). */
  /** The gram/band index-summary SQL tail over a (doc_id, text) doc
    * CTE `src` (expects `ubands` from md5BandsCteOver(src, "u") in
    * scope) — shared by the update/update2 union replays and the
    * rebase index oracle. */
  private def indexSummaryTailSql(src: String): String =
    s"""ut2 AS (SELECT doc_id, string_split(text, ' ') AS ts2 FROM $src),
      |ug AS (SELECT DISTINCT doc_id,
      |              array_to_string(ts2[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ') AS gtext
      |       FROM (SELECT doc_id, ts2, unnest([i FOR i IN range(1, len(ts2) - 6)]) AS i
      |             FROM ut2 WHERE len(ts2) >= 8)),
      |ugh AS (SELECT doc_id, ${h60Sql("gtext")} AS h FROM ug),
      |ubh AS (SELECT doc_id, band, band_key, ${h60Sql("band_key")} AS kh FROM ubands),
      |ugrow AS (SELECT 'grams' AS index_name, CAST(count(*) AS BIGINT) AS n_rows,
      |                CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |                CAST(count(DISTINCT h) AS BIGINT) AS n_keys,
      |                CAST(bit_xor((h % 1000003) * 1009 + (doc_id % 1009)) AS BIGINT) AS checksum
      |         FROM ugh),
      |ubrow AS (SELECT 'bands' AS index_name, CAST(count(*) AS BIGINT) AS n_rows,
      |                CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |                CAST(count(DISTINCT band_key) AS BIGINT) AS n_keys,
      |                CAST(bit_xor((kh % 1000003) * 1009 + (doc_id % 1009) + band) AS BIGINT) AS checksum
      |         FROM ubh)
      |SELECT * FROM ubrow UNION ALL SELECT * FROM ugrow ORDER BY index_name""".stripMargin

  private def dedupIndexUnion2Sql: String = (s"WITH $incrementCtes,\n$increment2Ctes,\n" +
      """au AS MATERIALIZED (SELECT doc_id, text FROM bas2
        |       UNION ALL
        |       SELECT del2.doc_id, del2.text FROM del2 JOIN vg2 USING (doc_id)
        |       WHERE vg2.reason = 'ok'),
        |""".stripMargin +
      md5BandsCteOver("au", "u") + ",\n" +
      indexSummaryTailSql("au"))

  def oracleSql: Map[String, String] = Map(
    "q_rekey_project" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, event_id, event_type,
        |       epoch_ms(ts) AS ts_ms, value, props
        |FROM events ORDER BY event_id""".stripMargin,
    "q_filter_notnull" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE props IS NOT NULL AND value > 100.0 ORDER BY event_id""".stripMargin,
    "q_pair_match" -> (pairsCte +
      """SELECT user_id, epoch_ms(placed_ts) AS placed_ms,
        |       epoch_ms(fulfilled_ts) AS fulfilled_ms, processing_ms
        |FROM complete ORDER BY user_id""".stripMargin),
    "q_pair_match_join" ->
      """SELECT p.user_id AS user_id, p.event_id AS placed_event_id,
        |       f.event_id AS fulfilled_event_id,
        |       epoch_ms(f.ts) - epoch_ms(p.ts) AS gap_ms
        |FROM events p JOIN events f ON p.user_id = f.user_id
        |WHERE p.event_type='signup' AND f.event_type='purchase' AND f.ts >= p.ts
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_pair_typed" -> (pairsCte +
      """SELECT user_id, epoch_ms(placed_ts) AS placed_ms,
        |       epoch_ms(fulfilled_ts) AS fulfilled_ms, processing_ms
        |FROM complete ORDER BY user_id""".stripMargin),
    "q_pair_ttl" -> (pairsCte +
      """SELECT user_id, epoch_ms(placed_ts) AS placed_ms,
        |       epoch_ms(fulfilled_ts) AS fulfilled_ms, processing_ms
        |FROM complete WHERE abs(processing_ms) <= 86400000
        |ORDER BY user_id""".stripMargin),
    "q_facility_info_by_minute" -> (pairsCte +
      """SELECT user_id % 10 AS facility_id,
        |       epoch_ms(time_bucket(INTERVAL 1 minute, fulfilled_ts) + INTERVAL 1 minute) AS event_timestamp,
        |       CAST(count(*) AS BIGINT) AS processing_count,
        |       CAST(sum(processing_ms) AS BIGINT) AS processing_ms
        |FROM complete GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "q_tumbling_agg" -> tumblingAggSql,
    "q_json_get" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_json_emit" ->
      """SELECT event_id,
        |       to_json(struct_pack(event_id := event_id, event_type := event_type,
        |                           user_id := user_id)) AS js
        |FROM events ORDER BY event_id""".stripMargin,
    "q_from_json" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k,
        |       props IS NULL AS props_missing
        |FROM events ORDER BY event_id""".stripMargin,
    "q_pair_groups" -> (pairsCte +
      """SELECT user_id, epoch_ms(placed_ts) AS placed_ms,
        |       epoch_ms(fulfilled_ts) AS fulfilled_ms, processing_ms
        |FROM complete ORDER BY user_id""".stripMargin),
    "q_case_when" ->
      """SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small'
        |            WHEN o_totalprice < 150000.0 THEN 'medium'
        |            ELSE 'large' END AS tier,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
        |       CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_regex_funcs" ->
      """SELECT c_custkey,
        |       CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS INTEGER) AS cust_num,
        |       regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
        |       regexp_matches(c_name, '^Customer#') AS is_canonical,
        |       CAST(len(regexp_extract_all(c_mktsegment, '[AEIOU]')) AS INTEGER) AS seg_vowels
        |FROM customer ORDER BY 1""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |       CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
        |       CAST(week(o_orderdate) AS INTEGER) AS order_week,
        |       CAST(isodow(o_orderdate) - 1 AS INTEGER) AS order_wd,
        |       epoch_ms(CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)) AS month_end_ms,
        |       epoch_ms(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP)) AS plus3m_ms,
        |       epoch_ms(CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP)) AS plus30d_ms
        |FROM orders ORDER BY 1""".stripMargin,
    "q_bitwise" ->
      """SELECT o_orderkey,
        |       o_orderkey & 255 AS low_byte,
        |       o_orderkey | 4096 AS with_flag,
        |       xor(o_orderkey, 255) AS flipped,
        |       o_orderkey << 3 AS shl3,
        |       o_orderkey >> 2 AS shr2,
        |       CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
        |FROM orders ORDER BY 1""".stripMargin,
    "q_map_funcs" ->
      """SELECT event_id,
        |       map_extract(MAP {'t': event_type, 'u': CAST(user_id AS VARCHAR)}, 't')[1] AS t_val,
        |       map_extract(MAP {'t': event_type, 'u': CAST(user_id AS VARCHAR)}, 'u')[1] AS u_val,
        |       CAST(cardinality(MAP {'t': event_type, 'u': CAST(user_id AS VARCHAR)}) AS INTEGER) AS n_keys
        |FROM events ORDER BY event_id""".stripMargin,
    "q_array_lambda" ->
      """SELECT vec_id,
        |       CAST(len(list_filter(embedding, x -> x > 0.0)) AS INTEGER) AS n_pos,
        |       list_max(list_transform(embedding, x -> abs(x))) AS max_abs,
        |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |         [CAST(x AS DOUBLE) FOR x IN embedding]), (acc, x) -> acc + x) AS sum_all
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_explode_outer" ->
      """SELECT event_id, CAST(unnest(range(1, event_id % 3 + 1)) AS INTEGER) AS slot
        |FROM events WHERE event_id % 3 <> 0
        |UNION ALL
        |SELECT event_id, NULL FROM events WHERE event_id % 3 = 0
        |ORDER BY event_id, slot NULLS FIRST""".stripMargin,
    "q_sequence_fill" ->
      """WITH bounds AS (SELECT date_trunc('month', min(o_orderdate)) AS lo,
        |                       date_trunc('month', max(o_orderdate)) AS hi
        |                FROM orders),
        |spine AS (SELECT unnest(range(lo, hi + INTERVAL 1 MONTH, INTERVAL 1 MONTH)) AS m
        |          FROM bounds),
        |monthly AS (SELECT date_trunc('month', o_orderdate) AS m,
        |                   CAST(count(*) AS BIGINT) AS n
        |            FROM orders GROUP BY 1)
        |SELECT epoch_ms(spine.m) AS month_ms, COALESCE(monthly.n, 0) AS n_orders
        |FROM spine LEFT JOIN monthly ON spine.m = monthly.m
        |ORDER BY 1""".stripMargin,
    "q_stats_pop" ->
      """SELECT o_orderpriority,
        |       round(var_pop(o_totalprice), 2) AS vp,
        |       round(stddev_pop(o_totalprice), 4) AS sp,
        |       round(covar_pop(o_totalprice, CAST(o_custkey AS DOUBLE)), 2) AS cvp,
        |       round(covar_samp(o_totalprice, CAST(o_custkey AS DOUBLE)), 2) AS cvs,
        |       round(regr_slope(o_totalprice, CAST(o_custkey AS DOUBLE)), 6) AS slope,
        |       round(regr_r2(o_totalprice, CAST(o_custkey AS DOUBLE)), 6) AS r2
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_ignorenulls" ->
      """SELECT c_mktsegment, c_custkey,
        |       CASE WHEN c_acctbal >= 0.0 THEN c_acctbal END AS v,
        |       last_value(CASE WHEN c_acctbal >= 0.0 THEN c_acctbal END IGNORE NULLS)
        |         OVER (PARTITION BY c_mktsegment ORDER BY c_custkey
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_known
        |FROM customer ORDER BY 1, 2""".stripMargin,
    "q_try_funcs" ->
      """SELECT event_id,
        |       value / NULLIF(CAST(user_id % 3 AS DOUBLE), 0.0) AS safe_div,
        |       CASE WHEN regexp_matches(event_type, '^[0-9]+$')
        |            THEN TRY_CAST(event_type AS INTEGER) END AS parsed_type
        |FROM events ORDER BY event_id""".stripMargin,
    "q_udf_demo" ->
      """SELECT o_orderkey,
        |       CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_rank,
        |       o_orderstatus || '-' || CAST(o_orderkey % 1000 AS VARCHAR) AS order_tag
        |FROM orders ORDER BY 1""".stripMargin,
    "q_udaf_demo" ->
      """SELECT l_returnflag,
        |       (CAST(sum(CAST(floor(l_extendedprice * l_quantity * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0)
        |         / (CAST(sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0) AS weighted_avg_price,
        |       CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_grouping_id" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
        |       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
        |       CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
        |       CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_quantile_disc" ->
      """SELECT o_orderpriority,
        |       quantile_disc(o_totalprice, 0.5) AS p50_disc,
        |       quantile_disc(o_totalprice, 0.9) AS p90_disc,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_collect_set" ->
      """SELECT o_orderpriority,
        |       array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
        |       CAST(len(list_distinct(list(o_orderstatus))) AS INTEGER) AS n_statuses
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_minmax_by" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rb,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rw
        |  FROM orders)
        |SELECT b.o_orderpriority,
        |       b.o_orderkey AS best_order, b.o_totalprice AS best_price,
        |       w.o_orderkey AS worst_order, w.o_totalprice AS worst_price
        |FROM (SELECT * FROM r WHERE rb = 1) b
        |JOIN (SELECT * FROM r WHERE rw = 1) w USING (o_orderpriority)
        |ORDER BY 1""".stripMargin,
    "q_count_if" ->
      """SELECT c_mktsegment,
        |       CAST(count(*) AS BIGINT) AS n_custs,
        |       CAST(count(*) FILTER (WHERE c_acctbal < 0.0) AS BIGINT) AS n_delinquent,
        |       CAST(count(*) FILTER (WHERE c_acctbal > 5000.0) AS BIGINT) AS n_affluent,
        |       CAST(count(*) FILTER (WHERE c_acctbal < 0.0) AS DOUBLE) / count(*) AS delinquent_share
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_string_agg" ->
      """SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations,
        |       string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_union_by_name" ->
      """WITH u AS (
        |  SELECT event_id, user_id, value FROM events WHERE event_type = 'signup'
        |  UNION ALL BY NAME
        |  SELECT value, event_id FROM events WHERE event_type = 'purchase')
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(user_id) AS BIGINT) AS n_with_user,
        |       CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value
        |FROM u""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 60000.0), 9) AS INTEGER) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_having" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS spend
        |FROM orders GROUP BY 1 HAVING count(*) >= 15 ORDER BY 1""".stripMargin,
    "q_global_agg" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_qty,
        |       epoch_ms(min(l_shipdate)) AS first_ship_ms,
        |       epoch_ms(max(l_shipdate)) AS last_ship_ms
        |FROM lineitem""".stripMargin,
    "q_in_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |  AND o_custkey NOT IN (SELECT c_custkey FROM customer
        |                        WHERE c_acctbal < 0.0)
        |ORDER BY 1""".stripMargin,
    "q_exists_subquery" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
        |ORDER BY 1""".stripMargin,
    "q_window_percent" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd,
        |       nth_value(c_custkey, 2) OVER (
        |         PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_poorest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_acctbal, c_custkey""".stripMargin,
    "q_window_range" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS day,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |         PARTITION BY o_custkey
        |         ORDER BY CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
        |         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_spend
        |FROM orders ORDER BY 1, 3, 2""".stripMargin,
    "q_dedup_keepfirst" ->
      """WITH h AS (
        |  SELECT doc_id, lang, n_chars,
        |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
        |         CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS group_size
        |  FROM documents)
        |SELECT doc_id, lang, n_chars, group_size FROM h WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "q_gaps_islands" ->
      """WITH g AS (
        |  SELECT o_orderkey,
        |         o_orderkey - row_number() OVER (ORDER BY o_orderkey) AS grp
        |  FROM orders WHERE o_orderstatus = 'O')
        |SELECT min(o_orderkey) AS island_start, max(o_orderkey) AS island_end,
        |       CAST(count(*) AS BIGINT) AS n_orders
        |FROM g GROUP BY grp ORDER BY 1""".stripMargin,
    "q_hash_sample" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_sampled,
        |       CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sampled_value
        |FROM orders WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('p00_small', 0.0, 100.0), ('p01_mid', 100.0, 250.0),
        |  ('p02_large', 250.0, 500.0), ('p03_huge', 500.0, 1e9))
        |SELECT band, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value
        |FROM events JOIN bands ON value >= lo AND value < hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_range_join_custom" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('p00_small', 0.0, 100.0), ('p01_mid', 100.0, 250.0),
        |  ('p02_large', 250.0, 500.0), ('p03_huge', 500.0, 1e9))
        |SELECT band, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value
        |FROM events JOIN bands ON value >= lo AND value < hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY 1, 2, 3, 4""".stripMargin,
    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
        |       epoch_ms(l_shipdate) AS shipdate_ms
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_quantity < 25.0 AND l_returnflag IN ('A', 'R')
        |ORDER BY 1, 2, 3, 4, 5""".stripMargin,
    "q_hash_join" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY 1""".stripMargin,
    "q_multi_join" ->
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_broadcast_join" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY 1""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY 1""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY 1""".stripMargin,
    "q_outer_join" ->
      """SELECT o_orderkey, CAST(count(l_orderkey) AS BIGINT) AS n_lines,
        |       COALESCE(CAST(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0, 0.0) AS revenue
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cross_join" ->
      """SELECT n_name, r_name FROM nation CROSS JOIN region
        |ORDER BY 1, 2""".stripMargin,
    "q_full_outer" ->
      """WITH rich AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000.0),
        |cnt AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1)
        |SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_acctbal, n_orders
        |FROM rich FULL JOIN cnt ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "q_shuffle_hash_join" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tpch_q6" ->
      """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0""".stripMargin,
    "q_tpch_q3" ->
      """SELECT l_orderkey,
        |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
        |       epoch_ms(o_orderdate) AS orderdate_ms
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name,
        |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_tpch_q2" ->
      """WITH offers AS (
        |  SELECT p_partkey, p_brand, p_size, l_suppkey, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'PROMO' AND p_size <= 10)
        |SELECT DISTINCT p_partkey, p_brand, p_size, s_suppkey, s_name,
        |       l_extendedprice AS min_price
        |FROM offers o JOIN supplier ON l_suppkey = s_suppkey
        |WHERE l_extendedprice = (SELECT min(l_extendedprice) FROM offers m
        |                         WHERE m.p_partkey = o.p_partkey)
        |ORDER BY p_partkey, s_suppkey""".stripMargin,
    "q_tpch_q4" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_lines
        |FROM (SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |             CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |             l_extendedprice, l_discount
        |      FROM lineitem
        |      JOIN orders   ON l_orderkey = o_orderkey
        |      JOIN supplier ON l_suppkey = s_suppkey
        |      JOIN nation sn ON s_nationkey = sn.n_nationkey
        |      JOIN customer ON o_custkey = c_custkey
        |      JOIN nation cn ON c_nationkey = cn.n_nationkey
        |      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |        AND l_shipdate < TIMESTAMP '1998-01-01'
        |        AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        |          OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l_linestatus,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tpch_q14" ->
      """SELECT promo_revenue, total_revenue,
        |       promo_revenue * 100.0 / total_revenue AS promo_share_pct
        |FROM (SELECT
        |  CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))
        |        ELSE CAST(0 AS DECIMAL(25,8)) END) AS DECIMAL(38,6)) AS DOUBLE) AS promo_revenue,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |    AND l_shipdate < TIMESTAMP '1997-10-01')""".stripMargin,
    "q_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q22" ->
      """WITH pool AS (SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        |              WHERE c_nationkey < 10 AND c_acctbal > 0.0),
        |a AS (SELECT CAST(sum(CAST(floor(c_acctbal * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 / count(c_acctbal) AS avg_bal
        |      FROM pool)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
        |       CAST(sum(CAST(floor(c_acctbal * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS totacctbal
        |FROM pool, a
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey AS b_orderkey,
        |         CAST(sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum_qty > 180.0)
        |SELECT c_custkey, c_name, o_orderkey, epoch_ms(o_orderdate) AS orderdate_ms,
        |       o_totalprice, sum_qty
        |FROM orders JOIN big ON o_orderkey = b_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_tpch_q13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_tpch_q17" ->
      """WITH pl AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#1' AND p_size = 5),
        |th AS (
        |  SELECT l_partkey AS a_partkey,
        |         0.2 * (CAST(sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 / count(l_quantity)) AS qmax
        |  FROM pl GROUP BY 1)
        |SELECT CAST(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 / 7.0 AS avg_yearly
        |FROM pl JOIN th ON l_partkey = a_partkey
        |WHERE l_quantity < qmax""".stripMargin,
    "q_tpch_q8" ->
      """SELECT o_year, nation_volume, total_volume,
        |       nation_volume / total_volume AS mkt_share
        |FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |       CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_1'
        |             THEN CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))
        |             ELSE CAST(0 AS DECIMAL(25,8)) END) AS DECIMAL(38,6)) AS DOUBLE) AS nation_volume,
        |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE) AS total_volume
        |  FROM (SELECT l_extendedprice, l_discount, o_orderdate, n2.n_name AS supp_nation
        |        FROM lineitem
        |        JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |        JOIN orders ON l_orderkey = o_orderkey
        |        JOIN customer ON o_custkey = c_custkey
        |        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |        JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |        JOIN supplier ON l_suppkey = s_suppkey
        |        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |          AND o_orderdate < TIMESTAMP '1997-01-01')
        |  GROUP BY 1)
        |ORDER BY o_year""".stripMargin,
    "q_tpch_q9" ->
      """SELECT nation, o_year,
        |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))
        |                     - CAST(p_retailprice AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_profit,
        |       CAST(count(*) AS BIGINT) AS n_lines
        |FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |             l_extendedprice, l_discount, l_quantity, p_retailprice
        |      FROM lineitem
        |      JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |      JOIN orders ON l_orderkey = o_orderkey
        |      JOIN supplier ON l_suppkey = s_suppkey
        |      JOIN nation ON s_nationkey = n_nationkey)
        |GROUP BY 1, 2 ORDER BY nation ASC, o_year DESC""".stripMargin,
    "q_tpch_q21" ->
      """WITH sg AS (
        |  SELECT l_orderkey, l_suppkey,
        |         CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY 1, 2)
        |SELECT s_name, CAST(sum(n_late) AS BIGINT) AS numwait
        |FROM sg l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE l1.n_late > 0
        |  AND n_name = 'NATION_1'
        |  AND EXISTS (SELECT 1 FROM sg l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM sg l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.n_late > 0)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin,
    "q_tpch_q19" ->
      """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1.0 AND 20.0)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10.0 AND 30.0)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        |       AND l_quantity BETWEEN 20.0 AND 40.0)""".stripMargin,
    "q_nullsafe_join" ->
      """WITH l AS (SELECT o_orderkey AS k_l,
        |                  CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |                       ELSE o_orderkey % 7 END AS b_l
        |           FROM orders WHERE o_orderkey % 97 = 0),
        |r AS (SELECT o_orderkey AS k_r,
        |             CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |                  ELSE o_orderkey % 7 END AS b_r
        |      FROM orders WHERE o_orderkey % 89 = 0)
        |SELECT coalesce(CAST(b_l AS VARCHAR), 'NULL') AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_pairs, min(k_l) AS min_k
        |FROM l JOIN r ON b_l IS NOT DISTINCT FROM b_r
        |GROUP BY b_l ORDER BY bucket""".stripMargin,
    "q_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS p
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT c AS src, p AS dst FROM pairs
        |          UNION ALL SELECT p AS src, c AS dst FROM pairs),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
        |r0 AS (SELECT src AS node, 1000000000000 // n AS rank FROM deg, nn),
        |r1 AS (SELECT e.dst AS node,
        |              CAST(150000000000 // nn.n + (85 * sum(r.rank // dg.d)) // 100 AS BIGINT) AS rank
        |       FROM edges e JOIN r0 r ON e.src = r.node
        |       JOIN deg dg ON dg.src = e.src CROSS JOIN nn
        |       GROUP BY e.dst, nn.n),
        |r2 AS (SELECT e.dst AS node,
        |              CAST(150000000000 // nn.n + (85 * sum(r.rank // dg.d)) // 100 AS BIGINT) AS rank
        |       FROM edges e JOIN r1 r ON e.src = r.node
        |       JOIN deg dg ON dg.src = e.src CROSS JOIN nn
        |       GROUP BY e.dst, nn.n),
        |r3 AS (SELECT e.dst AS node,
        |              CAST(150000000000 // nn.n + (85 * sum(r.rank // dg.d)) // 100 AS BIGINT) AS rank
        |       FROM edges e JOIN r2 r ON e.src = r.node
        |       JOIN deg dg ON dg.src = e.src CROSS JOIN nn
        |       GROUP BY e.dst, nn.n)
        |SELECT node, rank,
        |       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind
        |FROM r3 ORDER BY rank DESC, node LIMIT 20""".stripMargin,
    "q_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        |v AS (SELECT user_id,
        |             min(CASE WHEN event_type = 'view' THEN ts_ms END) AS t_view
        |      FROM ev GROUP BY 1),
        |sg AS (SELECT e.user_id, v.t_view,
        |              min(CASE WHEN e.event_type = 'signup' AND e.ts_ms >= v.t_view
        |                       THEN e.ts_ms END) AS t_signup
        |       FROM ev e JOIN v ON e.user_id = v.user_id GROUP BY 1, 2),
        |p AS (SELECT e.user_id, s.t_view, s.t_signup,
        |             min(CASE WHEN e.event_type = 'purchase' AND e.ts_ms >= s.t_signup
        |                      THEN e.ts_ms END) AS t_purchase
        |      FROM ev e JOIN sg s ON e.user_id = s.user_id GROUP BY 1, 2, 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |       CAST(count(t_view) AS BIGINT) AS n_viewed,
        |       CAST(count(t_signup) AS BIGINT) AS n_signed_up,
        |       CAST(count(t_purchase) AS BIGINT) AS n_purchased
        |FROM p""".stripMargin,
    "q_retention" ->
      """WITH ev AS (SELECT user_id, epoch_ms(ts) // 604800000 AS week FROM events),
        |f AS (SELECT user_id, min(week) AS cohort FROM ev GROUP BY 1)
        |SELECT cohort, week - cohort AS "offset",
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM ev e JOIN f USING (user_id)
        |WHERE week - cohort <= 8
        |GROUP BY cohort, week - cohort ORDER BY 1, 2""".stripMargin,
    "q_anomaly_zscore" ->
      """WITH st AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_v,
        |         CAST(sum(CAST(floor(value * value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_v2
        |  FROM events GROUP BY 1),
        |m AS (SELECT event_type, sum_v / n AS mean_v,
        |             sqrt(sum_v2 / n - (sum_v / n) * (sum_v / n)) AS sd_v
        |      FROM st)
        |SELECT e.event_id, e.event_type, e.value,
        |       round((e.value - m.mean_v) / m.sd_v, 6) AS z
        |FROM events e JOIN m USING (event_type)
        |WHERE m.sd_v > 0.0 AND abs(e.value - m.mean_v) > m.sd_v * 3.0
        |ORDER BY e.event_id""".stripMargin,
    "q_ewma_smooth" ->
      """WITH base AS (
        |  SELECT event_type, date_trunc('minute', ts) AS minute,
        |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS svl
        |  FROM events GROUP BY 1, 2),
        |taps AS (
        |  SELECT event_type, minute, svl,
        |         svl * 128
        |           + coalesce(lag(svl, 1) OVER w * 64, 0)
        |           + coalesce(lag(svl, 2) OVER w * 32, 0)
        |           + coalesce(lag(svl, 3) OVER w * 16, 0)
        |           + coalesce(lag(svl, 4) OVER w * 8, 0)
        |           + coalesce(lag(svl, 5) OVER w * 4, 0)
        |           + coalesce(lag(svl, 6) OVER w * 2, 0)
        |           + coalesce(lag(svl, 7) OVER w * 1, 0) AS num,
        |         128 + (CASE WHEN lag(svl, 1) OVER w IS NULL THEN 0 ELSE 64 END)
        |             + (CASE WHEN lag(svl, 2) OVER w IS NULL THEN 0 ELSE 32 END)
        |             + (CASE WHEN lag(svl, 3) OVER w IS NULL THEN 0 ELSE 16 END)
        |             + (CASE WHEN lag(svl, 4) OVER w IS NULL THEN 0 ELSE 8 END)
        |             + (CASE WHEN lag(svl, 5) OVER w IS NULL THEN 0 ELSE 4 END)
        |             + (CASE WHEN lag(svl, 6) OVER w IS NULL THEN 0 ELSE 2 END)
        |             + (CASE WHEN lag(svl, 7) OVER w IS NULL THEN 0 ELSE 1 END) AS den
        |  FROM base
        |  WINDOW w AS (PARTITION BY event_type ORDER BY minute))
        |SELECT event_type, epoch_ms(minute) AS minute_ms,
        |       CAST(svl AS DOUBLE) / 10000.0 AS raw_value,
        |       round(CAST(num AS DOUBLE) / CAST(den * 10000 AS DOUBLE), 6) AS ewma
        |FROM taps ORDER BY event_type, minute_ms""".stripMargin,
    "q_skyline" ->
      """WITH base AS (
        |  SELECT s_suppkey, s_name, s_acctbal,
        |         CAST(sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS volume
        |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |  GROUP BY 1, 2, 3)
        |SELECT s_suppkey, s_name, s_acctbal, volume
        |FROM base b
        |WHERE NOT EXISTS (SELECT 1 FROM base t
        |                  WHERE t.s_suppkey <> b.s_suppkey
        |                    AND t.s_acctbal >= b.s_acctbal AND t.volume >= b.volume
        |                    AND (t.s_acctbal > b.s_acctbal OR t.volume > b.volume))
        |ORDER BY s_suppkey""".stripMargin,
    "q_agg_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_qty,
        |       CAST(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_base_price,
        |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
        |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4)) * CAST(1.0 + l_tax AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
        |       CAST(sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 / count(l_quantity) AS avg_qty,
        |       CAST(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 / count(l_extendedprice) AS avg_price,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_agg_distinct" ->
      """SELECT o_orderpriority,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
        |       CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rollup" ->
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_custs,
        |       CAST(sum(CAST(floor(c_acctbal * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_price
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_topk_custom" ->
      """SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS orderdate_ms,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders ORDER BY 1, 3, 2""".stripMargin,
    "q_window_leadlag" ->
      """SELECT o_custkey, o_orderkey,
        |       lag(o_totalprice) OVER w AS prev_price,
        |       lead(o_totalprice) OVER w AS next_price,
        |       first_value(o_totalprice) OVER w AS first_price,
        |       CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY 1, 2""".stripMargin,
    "q_monthly_rollup" ->
      """SELECT epoch_ms(date_trunc('month', o_orderdate)) AS month_ms,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_source_orc" ->
      """SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms, value
        |FROM events ORDER BY event_id""".stripMargin,
    "q_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 10""".stripMargin,
    "q_union" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        |UNION ALL
        |SELECT c_custkey FROM customer WHERE c_acctbal > 0.0
        |ORDER BY c_custkey""".stripMargin,
    "q_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 0.0
        |ORDER BY c_custkey""".stripMargin,
    "q_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 0.0
        |ORDER BY c_custkey""".stripMargin,
    "q_intersect_all" ->
      """SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
        |INTERSECT ALL
        |SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY l_orderkey""".stripMargin,
    "q_except_all" ->
      """SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
        |EXCEPT ALL
        |SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY l_orderkey""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        |       upper(o_orderpriority) AS prio_upper,
        |       substring(o_orderpriority, 1, 1) AS prio_code,
        |       o_orderstatus || '/' || o_orderpriority AS status_prio,
        |       CAST(year(o_orderdate) AS INTEGER) AS order_year,
        |       CAST(month(o_orderdate) AS INTEGER) AS order_month,
        |       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_epoch_start,
        |       CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        |       abs(o_totalprice - 150000.0) AS price_dev
        |FROM orders ORDER BY 1""".stripMargin,
    "q_array_ops" ->
      """SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
        |       CAST(embedding[1] AS DOUBLE) AS first_val,
        |       ((((0.0 + CAST(embedding[1] AS DOUBLE)) + CAST(embedding[2] AS DOUBLE))
        |         + CAST(embedding[3] AS DOUBLE)) + CAST(embedding[4] AS DOUBLE)) AS head4_sum
        |FROM embeddings ORDER BY 1""".stripMargin,
    // q_approx_distinct: omitted — approximate sketch, rows-only check.
    "q_percentiles" ->
      """SELECT o_orderpriority,
        |       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stats_agg" ->
      """SELECT o_orderpriority,
        |       round(stddev_samp(o_totalprice), 4) AS sd,
        |       round(var_samp(o_totalprice), 2) AS vr,
        |       round(corr(o_totalprice, CAST(o_custkey AS DOUBLE)), 6) AS cr
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_lateral_explode" ->
      """SELECT slot, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT CAST(unnest(range(0, o_orderkey % 3 + 1)) AS INTEGER) AS slot
        |  FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_text_stats" ->
      """SELECT lang, term, cnt FROM (
        |  SELECT lang, term, CAST(count(*) AS BIGINT) AS cnt,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY count(*) DESC, term) AS rn
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY lang, term)
        |WHERE rn <= 3 ORDER BY lang, cnt DESC, term""".stripMargin,
    // the Zipf head regression: exact snapped ln terms, HUGEINT sums
    // (≡ Spark's DECIMAL(38,0) — both exact integers), ONE identical
    // IEEE expression per output over the exact sums
    "q_zipf_fit" ->
      """WITH cnt AS MATERIALIZED (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE len(w) >= 1 GROUP BY w),
        |head AS MATERIALIZED (
        |  SELECT c, CAST(row_number() OVER (ORDER BY c DESC, w ASC) AS BIGINT) AS rank
        |  FROM cnt ORDER BY c DESC, w ASC LIMIT 1000),
        |xy AS (SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS x,
        |              CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS y
        |       FROM head),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_fit,
        |             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |             sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
        |             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
        |             sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
        |      FROM xy)
        |SELECT n_fit,
        |       round(CAST(n_fit * sxy - sx * sy AS DOUBLE) /
        |             CAST(n_fit * sxx - sx * sx AS DOUBLE), 6) AS slope,
        |       round((CAST(sy AS DOUBLE) - CAST(n_fit * sxy - sx * sy AS DOUBLE) /
        |             CAST(n_fit * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |             / CAST(n_fit AS DOUBLE) / 1000000.0, 6) AS intercept,
        |       round(CAST(n_fit * sxy - sx * sy AS DOUBLE) /
        |             CAST(n_fit * sxx - sx * sx AS DOUBLE) *
        |             (CAST(n_fit * sxy - sx * sy AS DOUBLE) /
        |             CAST(n_fit * syy - sy * sy AS DOUBLE)), 6) AS r2
        |FROM s""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS bpe_tokens,
        |       n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_id" -> (
      s"WITH lex(term, lg) AS (VALUES $lexiconValues),\n" +
      """toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |hits AS (SELECT doc_id, lg, CAST(count(*) AS BIGINT) AS hits
        |         FROM toks JOIN lex USING (term) GROUP BY 1, 2),
        |best AS (SELECT doc_id, lg, hits,
        |                row_number() OVER (PARTITION BY doc_id
        |                                   ORDER BY hits DESC, lg) AS rn
        |         FROM hits)
        |SELECT d.doc_id AS doc_id, d.lang AS lang,
        |       COALESCE(b.lg, 'und') AS lang_pred,
        |       COALESCE(b.hits, CAST(0 AS BIGINT)) AS hits
        |FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
        |  ON d.doc_id = b.doc_id
        |ORDER BY 1""".stripMargin),
    "q_quality_score" ->
      """WITH q AS (
        |  SELECT doc_id, n_chars,
        |         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |         CAST(len([t FOR t IN string_split(text, ' ')
        |                   IF t IN ('the','a','of','and','is')]) AS INTEGER) AS n_stop
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |       CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_token_len,
        |       CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
        |       (CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens) * 0.1
        |         + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.5 AS quality
        |FROM q ORDER BY doc_id""".stripMargin,
    "q_tfidf" ->
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM terms GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term,
        |         round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |ranked AS (SELECT doc_id, term, score,
        |                  CAST(row_number() OVER (PARTITION BY doc_id
        |                                          ORDER BY score DESC, term) AS INTEGER) AS rn
        |           FROM scored)
        |SELECT doc_id, term, score, rn FROM ranked WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin,
    "q_edit_distance" ->
      """WITH d AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
        |             text[1:40] AS prefix FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(levenshtein(a.prefix, b.prefix) AS INT) AS dist
        |FROM d a JOIN d b ON a.lang = b.lang AND a.n_tokens = b.n_tokens
        |                 AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.prefix, b.prefix) <= 30
        |ORDER BY 1, 2""".stripMargin,
    "q_doc_fingerprint" ->
      """SELECT doc_id,
        |       list_reduce(
        |         list_prepend(CAST(0 AS BIGINT),
        |           [CAST(ascii(c) AS BIGINT) FOR c IN regexp_extract_all(text, '.')]),
        |         (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS n_docs,
        |       min(doc_id) AS first_doc_id
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // the durable dedup-index round trip: DuckDB replays the gram
    // windows and the md5-band chain and summarizes with the same
    // counts + bit_xor checksums the Spark side computes FROM THE
    // LOADED bucketed tables — equality means the persisted buckets
    // carry exactly the index the session pins serve
    "q_dedup_index_persist" -> (md5BandsCte.trim + ",\n" +
      """dtoks AS (SELECT doc_id, string_split(text, ' ') AS ts2 FROM documents),
        |dg AS (SELECT DISTINCT doc_id,
        |              array_to_string(ts2[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ') AS gtext
        |       FROM (SELECT doc_id, ts2, unnest([i FOR i IN range(1, len(ts2) - 6)]) AS i
        |             FROM dtoks WHERE len(ts2) >= 8)),
        |dgh AS (SELECT doc_id,
        |          list_reduce(list_prepend(CAST(0 AS BIGINT),
        |            [CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1
        |             FOR c IN regexp_extract_all(substring(md5(gtext), 1, 15), '.')]),
        |            (acc, x) -> acc * 16 + x) AS h
        |        FROM dg),
        |dbh AS (SELECT doc_id, band, band_key,
        |          list_reduce(list_prepend(CAST(0 AS BIGINT),
        |            [CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1
        |             FOR c IN regexp_extract_all(substring(md5(band_key), 1, 15), '.')]),
        |            (acc, x) -> acc * 16 + x) AS kh
        |        FROM bands),
        |grow AS (SELECT 'grams' AS index_name, CAST(count(*) AS BIGINT) AS n_rows,
        |                CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |                CAST(count(DISTINCT h) AS BIGINT) AS n_keys,
        |                CAST(bit_xor((h % 1000003) * 1009 + (doc_id % 1009)) AS BIGINT) AS checksum
        |         FROM dgh),
        |brow AS (SELECT 'bands' AS index_name, CAST(count(*) AS BIGINT) AS n_rows,
        |                CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |                CAST(count(DISTINCT band_key) AS BIGINT) AS n_keys,
        |                CAST(bit_xor((kh % 1000003) * 1009 + (doc_id % 1009) + band) AS BIGINT) AS checksum
        |         FROM dbh)
        |SELECT * FROM brow UNION ALL SELECT * FROM grow ORDER BY index_name""".stripMargin),
    // the normalization rule chain VERBATIM (NFC → lower → whitespace-run
    // collapse on the explicit [ \t\n\r] class → trim); q_dedup_norm
    // reuses the same chain in front of the q_dedup_exact aggregation
    "q_text_normalize" ->
      """SELECT doc_id,
        |       trim(regexp_replace(lower(nfc_normalize(text)), '[ \t\n\r]+', ' ', 'g')) AS norm_text,
        |       (trim(regexp_replace(lower(nfc_normalize(text)), '[ \t\n\r]+', ' ', 'g')) <> text) AS changed
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_dedup_norm" ->
      """SELECT md5(trim(regexp_replace(lower(nfc_normalize(text)), '[ \t\n\r]+', ' ', 'g'))) AS norm_hash,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       min(doc_id) AS first_doc_id,
        |       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_raw_variants
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_array_setops" ->
      """WITH t AS (
        |  SELECT o_orderkey,
        |         [x FOR x IN range(o_orderkey % 4, o_orderkey % 4 + 4)] AS a,
        |         [x FOR x IN range(o_orderkey % 7, o_orderkey % 7 + 4)] AS b
        |  FROM orders)
        |SELECT o_orderkey,
        |       coalesce(array_to_string(list_sort(list_distinct(list_concat(a, b))), ','), '') AS u,
        |       coalesce(array_to_string(list_sort(list_distinct([x FOR x IN a IF list_contains(b, x)])), ','), '') AS i,
        |       coalesce(array_to_string(list_sort(list_distinct([x FOR x IN a IF NOT list_contains(b, x)])), ','), '') AS e,
        |       len([x FOR x IN a IF list_contains(b, x)]) > 0 AS overlaps,
        |       coalesce(array_to_string(list_transform(list_zip(a, b), x -> x[1] + x[2]), ','), '') AS z
        |FROM t ORDER BY o_orderkey""".stripMargin,
    "q_hash_encode" ->
      """SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex,
        |       to_base64(encode(text[1:12])) AS prefix_b64,
        |       text[1:12] AS prefix_roundtrip,
        |       to_hex(doc_id) AS id_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_variant_json" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.missing') AS INT) AS missing_int,
        |       false AS is_null_variant
        |FROM events WHERE props IS NOT NULL ORDER BY event_id""".stripMargin,
    "q_doc_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |c AS (SELECT doc_id, tk,
        |             unnest([s FOR s IN range(0, greatest(len(tk), 1), 24)]) AS start
        |      FROM t)
        |SELECT doc_id, CAST(start // 24 AS INT) AS chunk_id,
        |       array_to_string(tk[CAST(start + 1 AS INT):CAST(start + 32 AS INT)], ' ') AS chunk_text,
        |       CAST(least(32, len(tk) - start) AS INT) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q_pii_scrub" ->
      """SELECT event_id,
        |       regexp_replace(regexp_replace(props,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |         '[0-9]+', '<NUM>', 'g') AS scrubbed,
        |       CAST(len(regexp_extract_all(props,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |       CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT) AS n_nums
        |FROM events WHERE props IS NOT NULL ORDER BY event_id""".stripMargin,
    "q_vec_centroid" ->
      """SELECT label, CAST(i - 1 AS INT) AS dim,
        |       CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS centroid,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM embeddings, range(1, 65) r(i)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_stratified_sample" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
        |       min(doc_id) AS first_doc_id
        |FROM documents
        |WHERE CASE WHEN lang = 'en' THEN md5(CAST(doc_id AS VARCHAR))[1:1] = '0'
        |           ELSE md5(CAST(doc_id AS VARCHAR))[1:1] IN ('0','1','2','3') END
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_data_split" ->
      """SELECT CASE md5(CAST(doc_id AS VARCHAR))[1:1]
        |         WHEN 'e' THEN 'valid' WHEN 'f' THEN 'test' ELSE 'train' END AS split,
        |       lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_domain_stats" -> (s"WITH ${zfpCteOver("documents", "dm")},\n" +
      """b AS (SELECT d.source, d.lang, f.n_tokens AS n_toks, f.z_fp, md5(d.text) AS h
        |      FROM documents d JOIN dmf f USING (doc_id)),
        |g AS (SELECT source, lang, n_toks, z_fp, h,
        |             count(*) OVER (PARTITION BY source, h) AS grp FROM b)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN z_fp >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gated,
        |       round(CAST(sum(CASE WHEN z_fp >= 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS gate_rate,
        |       CAST(sum(CASE WHEN grp >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        |       round(CAST(sum(CASE WHEN grp >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS dup_rate
        |FROM g GROUP BY source ORDER BY source""".stripMargin),
    "q_corpus_increment" -> (s"WITH $incrementCtes\n" +
      """SELECT doc_id, (reason = 'ok') AS admitted, reason
        |FROM v ORDER BY doc_id""".stripMargin),
    // generation 2: day 2's batch ('e') screened against the DAY-1
    // corpus state (base ∪ generation 1's admissions) — the chained
    // nightly loop
    "q_corpus_increment2" -> (s"WITH $incrementCtes,\n$increment2Ctes\n" +
      """SELECT doc_id, (reason = 'ok') AS admitted, reason
        |FROM vg2 ORDER BY doc_id""".stripMargin),
    "q_corpus_apply" -> corpusApplySql,
    "q_corpus_apply2" -> corpusApply2Sql,
    "q_corpus_compact" -> corpusCompactSql,
    "q_corpus_rebase" -> corpusRebaseSql,
    "q_store_vacuum" -> storeVacuumSql,
    "q_dedup_index_rebase" -> dedupIndexRebaseSql,
    "q_tokenizer_drift" -> tokenizerDriftSql,
    "q_tokenizer_drift2" -> tokenizerDrift2Sql,
    "q_corpus_funnel" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
        |       CAST(count(CASE WHEN n_chars >= 100 THEN 1 END) AS BIGINT) AS n_minlen,
        |       CAST(count(CASE WHEN n_chars >= 100
        |                       AND len(string_split(text, ' ')) >= 20 THEN 1 END) AS BIGINT) AS n_tokenized,
        |       CAST(count(DISTINCT CASE WHEN n_chars >= 100
        |                       AND len(string_split(text, ' ')) >= 20 THEN md5(text) END) AS BIGINT) AS n_deduped
        |FROM documents""".stripMargin,
    "q_agg_pushdown" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
        |       min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
        |FROM lineitem""".stripMargin,
    "q_zorder_layout" -> {
      // the same 16-term interleave the Spark side builds, generated
      // from the same loop so the two can't drift
      val zTerms = (0 until 8).map(i =>
        s"(((xb >> $i) & 1) << ${2 * i}) + (((yb >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH b AS (SELECT least(user_id >> 3, 255) AS xb,
         |             least(CAST(floor(value / 4.0) AS BIGINT), 255) AS yb
         |           FROM events),
         |z AS (SELECT xb, yb, ($zTerms) AS zv FROM b)
         |SELECT zv >> 6 AS z_block, CAST(count(*) AS BIGINT) AS n,
         |       min(xb) AS x_min, max(xb) AS x_max,
         |       min(yb) AS y_min, max(yb) AS y_max
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "q_bloom_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(SUM(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 180000.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_upsert_merge" ->
      """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS price FROM orders),
        |ch AS (
        |  SELECT CASE WHEN o_orderkey % 10 = 2 THEN o_orderkey + 100000000
        |              ELSE o_orderkey END AS k,
        |         CASE WHEN o_orderkey % 10 = 1 THEN 'D' ELSE 'U' END AS op,
        |         o_totalprice + 100.0 AS new_price
        |  FROM orders WHERE o_orderkey % 10 <= 2),
        |m AS (
        |  SELECT coalesce(b.k, c.k) AS k,
        |         CASE WHEN c.op = 'D' THEN NULL
        |              ELSE coalesce(c.new_price, b.price) END AS merged_price,
        |         CASE WHEN c.op IS NULL THEN 'keep'
        |              WHEN c.op = 'D' THEN 'delete'
        |              WHEN b.price IS NULL THEN 'insert'
        |              ELSE 'update' END AS action
        |  FROM base b FULL OUTER JOIN ch c ON b.k = c.k)
        |SELECT action, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(floor(merged_price * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
        |         / 10000.0 AS sum_price,
        |       min(k) AS min_k, max(k) AS max_k
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_table_checksum" ->
      """WITH h AS (
        |  SELECT CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           [CAST(strpos('0123456789abcdef', ch) AS BIGINT) - 1
        |            FOR ch IN regexp_extract_all(substring(md5(
        |              l_orderkey || '|' || l_linenumber || '|' ||
        |              CAST(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS VARCHAR)
        |              || '|' || l_returnflag || '|' || l_linestatus), 1, 15), '.')]),
        |           (acc, x) -> acc * 16 + x) AS BIGINT) AS h
        |  FROM lineitem)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(h) % 1152921504606846976 AS BIGINT) AS checksum60
        |FROM h""".stripMargin,
    "q_incremental_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
        |         / 10000.0 AS sum_value,
        |       min(value) AS min_value, max(value) AS max_value,
        |       CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
        |         / 10000.0 / count(*) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM t)
        |SELECT term, CAST(count(*) AS BIGINT) AS cnt, total
        |FROM t, tot GROUP BY term, total
        |HAVING count(*) * 41 > total ORDER BY term""".stripMargin,
    "q_repetition_stats" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |b AS (SELECT doc_id, CAST(len(tk) AS INT) AS n_tokens,
        |             round(1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 6)
        |               AS dup_token_frac
        |      FROM t),
        |g AS (SELECT doc_id, unnest([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))]) AS gram
        |      FROM t),
        |gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
        |tg AS (SELECT doc_id, max(c) AS top_n, sum(c) AS n_grams FROM gc GROUP BY 1)
        |SELECT b.doc_id, b.n_tokens, b.dup_token_frac,
        |       coalesce(round(CAST(tg.top_n AS DOUBLE) / tg.n_grams, 6), 0.0) AS top_gram_frac,
        |       (b.dup_token_frac > 0.6 OR
        |        coalesce(round(CAST(tg.top_n AS DOUBLE) / tg.n_grams, 6), 0.0) > 0.1) AS flagged
        |FROM b LEFT JOIN tg USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_contamination" ->
      """WITH t AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR))[1:1] AS h,
        |             string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT doc_id, h,
        |              unnest([array_to_string(tk[i:i+7], ' ')
        |                      FOR i IN range(1, greatest(len(tk) - 6, 2))]) AS shingle
        |       FROM t),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE h = 'f')
        |SELECT sh.doc_id, CAST(count(DISTINCT sh.shingle) AS BIGINT) AS n_contam
        |FROM sh JOIN bench USING (shingle) WHERE sh.h <> 'f'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_seq_pack" ->
      """WITH t AS (SELECT lang, doc_id,
        |             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |           FROM documents),
        |c AS (SELECT lang, doc_id, n_tokens,
        |             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
        |      FROM t)
        |SELECT lang, doc_id, n_tokens,
        |       CAST(end_off - n_tokens AS BIGINT) AS start_off,
        |       CAST((end_off - n_tokens) // 256 AS BIGINT) AS first_bin,
        |       CAST((end_off - 1) // 256 AS BIGINT) AS last_bin
        |FROM c ORDER BY lang, doc_id""".stripMargin,
    "q_seq_pack_bpe" ->
      (s"WITH $bpeChainCte,\n" +
      """wl AS (SELECT w, CAST(len(syms) AS BIGINT) AS n_sym FROM v3),
        |t AS (SELECT d.lang, d.doc_id, CAST(sum(n_sym) AS BIGINT) AS n_tokens
        |      FROM (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS w
        |            FROM documents) d
        |      JOIN wl USING (w) GROUP BY 1, 2),
        |c AS (SELECT lang, doc_id, n_tokens,
        |             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
        |      FROM t)
        |SELECT lang, doc_id, n_tokens,
        |       CAST(end_off - n_tokens AS BIGINT) AS start_off,
        |""".stripMargin +
      s"""       CAST((end_off - n_tokens) // ${Corpus.BpePackBudget} AS BIGINT) AS first_bin,
        |       CAST((end_off - 1) // ${Corpus.BpePackBudget} AS BIGINT) AS last_bin
        |FROM c ORDER BY lang, doc_id""".stripMargin),
    "q_wordpiece_merges" ->
      (s"WITH $wpChainCte\n" +
      """SELECT * FROM (
        |  SELECT 1 AS round, l AS lhs, r AS rhs, cnt AS pair_count,
        |         CAST(floor(score * 1e12 + 0.5) AS BIGINT) AS score_e12 FROM wb1
        |  UNION ALL
        |  SELECT 2, l, r, cnt, CAST(floor(score * 1e12 + 0.5) AS BIGINT) FROM wb2
        |  UNION ALL
        |  SELECT 3, l, r, cnt, CAST(floor(score * 1e12 + 0.5) AS BIGINT) FROM wb3)
        |ORDER BY round""".stripMargin),
    "q_unigram_lm" ->
      (s"WITH $umChainCte,\n" +
      """wd AS (SELECT doc_id, wpos, w FROM (
        |  SELECT doc_id, i - 1 AS wpos, ws[CAST(i AS BIGINT)] AS w
        |  FROM (SELECT doc_id, ws, unnest([i FOR i IN range(1, len(ws) + 1)]) AS i
        |        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)))
        |  WHERE len(w) >= 1),
        |uj AS (SELECT wd.doc_id, wd.wpos, umseg1.seg FROM wd JOIN umseg1 USING (w))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |       CAST(sum(len(seg)) AS BIGINT) AS n_um_tokens,
        |       md5(array_to_string(flatten(list(seg ORDER BY wpos)), ' ')) AS um_md5
        |FROM uj GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "q_dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           [CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1
        |            FOR c IN regexp_extract_all(substring(md5(w), 1, 6), '.')]),
        |           (acc, x) -> acc * 16 + x) % 256 AS b
        |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |        FROM documents)),
        |raw AS (SELECT b, CAST(count(*) AS BIGINT) AS cnt_r FROM toks GROUP BY b),
        |tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS cnt_t FROM toks
        |        WHERE lang = 'en' GROUP BY b),
        |tot AS (SELECT (SELECT CAST(sum(cnt_r) AS BIGINT) FROM raw) AS tot_r,
        |               (SELECT CAST(coalesce(sum(cnt_t), 0) AS BIGINT) FROM tgt) AS tot_t),
        |ratio AS (
        |  SELECT b,
        |         CAST(floor(ln(CAST(coalesce(cnt_t, 0) + 1 AS DOUBLE)
        |           / (tot_t + 256)) * 1000000 + 0.5) AS BIGINT)
        |       - CAST(floor(ln(CAST(cnt_r + 1 AS DOUBLE)
        |           / (tot_r + 256)) * 1000000 + 0.5) AS BIGINT) AS lr_e6
        |  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot)
        |SELECT t.doc_id, t.lang, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(lr_e6) AS DOUBLE) / 1000000.0 / count(*) AS dsir_logw
        |FROM toks t JOIN ratio USING (b)
        |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin,
    "q_inverted_index" ->
      """WITH dt AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        |            FROM documents)
        |SELECT term, CAST(count(*) AS BIGINT) AS df,
        |       array_to_string(list_sort(list(doc_id))[1:8], ',') AS postings
        |FROM dt GROUP BY term ORDER BY term""".stripMargin,
    "q_bigram_lm" ->
      """WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
        |g AS (SELECT unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2 FROM t),
        |big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM g GROUP BY 1, 2),
        |uni AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM g GROUP BY 1)
        |SELECT big.w1, big.w2, big.c12,
        |       round(CAST(big.c12 AS DOUBLE) / uni.c1, 6) AS p
        |FROM big JOIN uni USING (w1)
        |ORDER BY big.c12 DESC, big.w1, big.w2 LIMIT 50""".stripMargin,
    // Kneser-Ney: decimal literals enter as CAST(0.75 AS DOUBLE) — a
    // bare 0.75 parses as DECIMAL in DuckDB and the mixed arithmetic
    // would promote differently (the vecQuantize trap)
    "q_bigram_kn" ->
      """WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
        |g AS (SELECT unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2 FROM t),
        |big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM g GROUP BY 1, 2),
        |uni AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM g GROUP BY 1),
        |t1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS t1 FROM big GROUP BY 1),
        |t2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS t2 FROM big GROUP BY 1),
        |ta AS (SELECT CAST(count(*) AS BIGINT) AS tall FROM big)
        |SELECT big.w1, big.w2, big.c12,
        |       round(greatest(CAST(big.c12 AS DOUBLE) - CAST(0.75 AS DOUBLE),
        |                      CAST(0 AS DOUBLE)) / uni.c1
        |             + CAST(0.75 AS DOUBLE) * CAST(t1.t1 AS DOUBLE) / uni.c1
        |               * (CAST(t2.t2 AS DOUBLE) / ta.tall), 6) AS p_kn
        |FROM big JOIN uni USING (w1) JOIN t1 USING (w1) JOIN t2 USING (w2)
        |     CROSS JOIN ta
        |ORDER BY big.c12 DESC, big.w1, big.w2 LIMIT 50""".stripMargin,
    "q_doc_perplexity" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |g AS (SELECT doc_id, unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2 FROM t),
        |big AS (SELECT w1, w2, count(*) AS c12 FROM g GROUP BY 1, 2),
        |uni AS (SELECT w1, count(*) AS c1 FROM g GROUP BY 1),
        |lm AS (SELECT w1, w2, CAST(c12 AS DOUBLE) / c1 AS p FROM big JOIN uni USING (w1))
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |       CAST(sum(CAST(floor(-ln(p) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
        |         / 1000000.0 / count(*) AS avg_neg_logp
        |FROM g JOIN lm USING (w1, w2) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ccnet_bucket" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |g AS (SELECT doc_id, unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2 FROM t),
        |big AS (SELECT w1, w2, count(*) AS c12 FROM g GROUP BY 1, 2),
        |uni AS (SELECT w1, count(*) AS c1 FROM g GROUP BY 1),
        |lm AS (SELECT w1, w2, CAST(c12 AS DOUBLE) / c1 AS p FROM big JOIN uni USING (w1)),
        |ppl AS (
        |  SELECT g.doc_id,
        |         CAST(sum(CAST(floor(-ln(p) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
        |           / 1000000.0 / count(*) AS avg_neg_logp
        |  FROM g JOIN lm USING (w1, w2) GROUP BY 1),
        |b AS (
        |  SELECT ppl.doc_id, d.lang, ppl.avg_neg_logp,
        |         CAST(ntile(3) OVER (PARTITION BY d.lang
        |           ORDER BY ppl.avg_neg_logp, ppl.doc_id) AS INT) AS bucket
        |  FROM ppl JOIN documents d ON d.doc_id = ppl.doc_id)
        |SELECT doc_id, lang, avg_neg_logp, bucket,
        |       CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |            ELSE 'tail' END AS tier
        |FROM b ORDER BY doc_id""".stripMargin,
    "q_mix_weights" ->
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM per),
        |sh AS (
        |  SELECT source, n_docs, n_tokens,
        |         round(CAST(n_tokens AS DOUBLE) / tot_tokens, 6) AS share,
        |         round(sqrt(round(CAST(n_tokens AS DOUBLE) / tot_tokens, 6)), 6) AS w_raw
        |  FROM per, tot),
        |ws AS (SELECT sum(CAST(w_raw AS DECIMAL(28,6))) AS w_sum FROM sh)
        |SELECT source, n_docs, n_tokens, share,
        |       round(w_raw / CAST(w_sum AS DOUBLE), 6) AS mix_weight,
        |       round(round(w_raw / CAST(w_sum AS DOUBLE), 6) / share, 6) AS boost
        |FROM sh, ws ORDER BY source""".stripMargin,
    "q_capped_sample" ->
      """WITH u AS (SELECT doc_id, source,
        |                  md5('cap#' || CAST(doc_id AS VARCHAR)) AS u
        |           FROM documents),
        |r AS (SELECT source, doc_id, u,
        |             CAST(row_number() OVER (PARTITION BY source
        |               ORDER BY u, doc_id) AS INT) AS rk
        |      FROM u)
        |SELECT source, rk, doc_id, u FROM r WHERE rk <= 5
        |ORDER BY source, rk""".stripMargin,
    "q_token_entropy" ->
      """WITH c AS (
        |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |             CAST(count(*) AS BIGINT) AS n_distinct, list(c) AS cs
        |      FROM c GROUP BY 1),
        |e AS (SELECT doc_id, n, n_distinct,
        |             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |               [CAST(floor(-(CAST(x AS DOUBLE) / n) *
        |                      ln(CAST(x AS DOUBLE) / n) * 1e9 + 0.5) AS BIGINT)
        |                FOR x IN cs]),
        |               (acc, t) -> acc + t) AS DOUBLE) / 1e9 AS entropy
        |      FROM a)
        |SELECT doc_id, n, n_distinct, entropy,
        |       CASE WHEN n_distinct = 1 THEN 0.0
        |            ELSE round(entropy / ln(CAST(n AS DOUBLE)), 6) END AS norm_entropy
        |FROM e ORDER BY doc_id""".stripMargin,
    "q_pmi_phrases" ->
      """WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
        |uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c
        |       FROM (SELECT unnest(tk) AS w FROM t) GROUP BY 1),
        |tu AS (SELECT CAST(sum(c) AS BIGINT) AS tu FROM uc),
        |g AS (SELECT unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2
        |      FROM t WHERE len(tk) >= 2),
        |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM g GROUP BY 1, 2),
        |tb AS (SELECT CAST(sum(c12) AS BIGINT) AS tb FROM bg)
        |SELECT bg.w1, bg.w2, bg.c12,
        |       CAST(floor(ln(CAST(bg.c12 AS DOUBLE) * tu.tu * tu.tu /
        |         (CAST(tb.tb AS DOUBLE) * u1.c * u2.c)) * 1000000 + 0.5) AS DOUBLE)
        |         / 1000000.0 AS pmi
        |FROM bg JOIN uc u1 ON u1.w = bg.w1 JOIN uc u2 ON u2.w = bg.w2, tu, tb
        |WHERE bg.c12 >= 5
        |ORDER BY pmi DESC, bg.w1, bg.w2 LIMIT 30""".stripMargin,
    "q_vec_quantize" ->
      """WITH t AS (SELECT vec_id, embedding,
        |             greatest(list_max([abs(CAST(x AS DOUBLE)) FOR x IN embedding]), 1e-30) AS max_abs
        |           FROM embeddings),
        |e AS (SELECT vec_id, embedding, max_abs,
        |        [least(greatest(round(CAST(x AS DOUBLE) * (CAST(127 AS DOUBLE) / max_abs)),
        |                        CAST(-127 AS DOUBLE)), CAST(127 AS DOUBLE)) FOR x IN embedding] AS q
        |      FROM t)
        |SELECT vec_id, CAST(len(embedding) AS INT) AS n_dims,
        |       round(CAST(127 AS DOUBLE) / max_abs, 6) AS scale_r,
        |       CAST(list_sum([CAST(v AS BIGINT) FOR v IN q]) AS BIGINT) AS q_sum,
        |       CAST(list_sum([CAST(floor((CAST(embedding[i] AS DOUBLE) - q[i] / (CAST(127 AS DOUBLE) / max_abs)) *
        |                                 (CAST(embedding[i] AS DOUBLE) - q[i] / (CAST(127 AS DOUBLE) / max_abs)) * 1e9 + 0.5) AS BIGINT)
        |                      FOR i IN range(1, len(embedding) + 1)]) AS DOUBLE)
        |         / 1e9 / len(embedding) AS mse
        |FROM e ORDER BY vec_id""".stripMargin,
    "q_winnow" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        |              WHERE len(string_split(text, ' ')) >= 5),
        |kg AS (SELECT doc_id, ts, len(ts) - 4 AS n_kg,
        |              unnest([i FOR i IN range(1, len(ts) - 3)]) AS i
        |       FROM toks),
        |h AS (SELECT doc_id, n_kg, i - 1 AS pos,
        |             list_reduce(list_prepend(CAST(0 AS BIGINT),
        |               [CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1
        |                FOR c IN regexp_extract_all(
        |                  substring(md5(array_to_string(ts[CAST(i AS BIGINT):CAST(i + 4 AS BIGINT)], ' ')), 1, 15), '.')]),
        |               (acc, x) -> acc * 16 + x) AS hv
        |      FROM kg),
        |wm AS (SELECT doc_id, pos, n_kg,
        |              min(hv) OVER (PARTITION BY doc_id ORDER BY pos
        |                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |       FROM h),
        |fps AS (SELECT DISTINCT doc_id, fp FROM wm WHERE pos <= greatest(n_kg - 4, 0))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
        |       min(fp) AS min_fp, max(fp) AS max_fp
        |FROM fps GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_boiler_ngrams" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        |              WHERE len(string_split(text, ' ')) >= 4),
        |g AS (SELECT DISTINCT doc_id,
        |             unnest([array_to_string(ts[i:i+3], ' ')
        |                     FOR i IN range(1, len(ts) - 2)]) AS gram
        |      FROM toks),
        |df AS (SELECT gram, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY 1),
        |tot AS (SELECT count(*) AS n_docs FROM documents),
        |per AS (SELECT doc_id,
        |               CAST(count(*) AS BIGINT) AS n_grams,
        |               CAST(count(*) FILTER (WHERE df.df >= 3 AND df.df * 50 >= tot.n_docs) AS BIGINT) AS n_boiler
        |        FROM g JOIN df USING (gram), tot
        |        GROUP BY 1)
        |SELECT doc_id, n_grams, n_boiler,
        |       round(CAST(n_boiler AS DOUBLE) / n_grams, 6) AS boiler_frac
        |FROM per ORDER BY doc_id""".stripMargin,
    "q_temp_sample" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_total FROM documents GROUP BY 1),
        |r AS (SELECT lang, n_total,
        |             sqrt(CAST(n_total AS DOUBLE) / (SELECT max(n_total) FROM c)) AS rate
        |      FROM c),
        |u AS (SELECT d.lang, d.doc_id,
        |             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |               [CAST(strpos('0123456789abcdef', ch) AS BIGINT) - 1
        |                FOR ch IN regexp_extract_all(
        |                  substring(md5('t#' || CAST(doc_id AS VARCHAR)), 1, 15), '.')]),
        |               (acc, x) -> acc * 16 + x) AS DOUBLE)
        |               / 1152921504606846976.0 AS uu
        |      FROM documents d)
        |SELECT r.lang, r.n_total, CAST(count(*) AS BIGINT) AS n_kept,
        |       round(r.rate, 6) AS rate_r
        |FROM u JOIN r USING (lang)
        |WHERE uu < r.rate
        |GROUP BY r.lang, r.n_total, r.rate
        |ORDER BY r.lang""".stripMargin,
    "q_weighted_sample" ->
      ("""WITH u AS (SELECT doc_id, lang, n_chars,
        |         (CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |            [CAST(strpos('0123456789abcdef', ch) AS BIGINT) - 1
        |             FOR ch IN regexp_extract_all(
        |               substring(md5('ws#' || CAST(doc_id AS VARCHAR)), 1, 15), '.')]),
        |            (acc, x) -> acc * 16 + x) AS DOUBLE) + 0.5)
        |           / 1152921504606846976.0 AS uu
        |       FROM documents WHERE n_chars > 0),
        |k AS (SELECT doc_id, lang, n_chars,
        |        CAST(floor(ln(uu) / CAST(n_chars AS DOUBLE) * 1e15 + 0.5) AS BIGINT) AS es_key_fp
        |      FROM u),
        |r AS (SELECT doc_id, lang, n_chars, es_key_fp,
        |        CAST(row_number() OVER (PARTITION BY lang
        |          ORDER BY es_key_fp DESC, doc_id) AS INT) AS rk FROM k)
        |""".stripMargin +
      s"""SELECT doc_id, lang, n_chars, es_key_fp, rk FROM r WHERE rk <= ${Corpus.WsK}
        |ORDER BY lang, rk""".stripMargin),
    "q_train_shuffle" ->
      ("""WITH s AS (SELECT doc_id, md5('sh#' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |sh AS (SELECT doc_id, h,
        |""".stripMargin +
      s"""         CAST((strpos('0123456789abcdef', substring(h, 1, 1)) - 1) % ${Corpus.TsShards} AS INT) AS shard
        |       FROM s),""".stripMargin + "\n" +
      """
        |r AS (SELECT shard, doc_id,
        |        CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
        |      FROM sh),
        |p AS (SELECT shard, doc_id, pos,
        |        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          [CAST(strpos('0123456789abcdef', ch) AS BIGINT) - 1
        |           FOR ch IN regexp_extract_all(substring(md5(
        |             CAST(doc_id AS VARCHAR) || '@' || CAST(pos AS VARCHAR)), 1, 15), '.')]),
        |          (acc, x) -> acc * 16 + x) AS BIGINT) AS ph
        |      FROM r)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |       min_by(doc_id, pos) AS first_doc, max_by(doc_id, pos) AS last_doc,
        |       CAST(sum(ph) % 1152921504606846976 AS BIGINT) AS order_checksum60
        |FROM p GROUP BY shard ORDER BY shard""".stripMargin),
    "q_corpus_build" -> corpusBuildSql,
    "s_quality_gate" ->
      (s"WITH ${zfpCteOver("documents", "qg")}\n" +
      """SELECT doc_id, n_tokens, z_fp FROM qgf WHERE z_fp >= 0
        |ORDER BY doc_id""".stripMargin),
    "q_quality_logit" ->
      (s"WITH ${zfpCteOver("documents", "ql")}\n" +
      """SELECT doc_id, n_tokens, z_fp,
        |       round(1.0 / (1.0 + exp(-CAST(z_fp AS DOUBLE) / (n_tokens * 1e7))), 6) AS p_keep,
        |       z_fp >= 0 AS keep
        |FROM qlf ORDER BY doc_id""".stripMargin),
    "q_bpe_apply" ->
      (s"WITH $bpeChainCte,\n" +
      """wd AS (SELECT doc_id, i - 1 AS wpos, ws[CAST(i AS BIGINT)] AS w
        |       FROM (SELECT doc_id, ws, unnest([i FOR i IN range(1, len(ws) + 1)]) AS i
        |             FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))),
        |j AS (SELECT wd.doc_id, wd.wpos, v3.syms FROM wd JOIN v3 USING (w))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |       CAST(sum(len(syms)) AS BIGINT) AS n_bpe_tokens,
        |       md5(array_to_string(flatten(list(syms ORDER BY wpos)), ' ')) AS bpe_md5
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "q_bpe_fertility" ->
      (s"WITH $bpeChainCte,\n" +
      """ft AS (SELECT x.lang, x.doc_id, len(v3.syms) AS npieces
        |       FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |             FROM documents) x
        |       JOIN v3 USING (w))
        |SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       CAST(count(*) AS BIGINT) AS n_words,
        |       CAST(sum(npieces) AS BIGINT) AS n_bpe_tokens,
        |       round(CAST(sum(npieces) AS DOUBLE) / count(*), 6) AS fertility
        |FROM ft GROUP BY lang ORDER BY lang""".stripMargin),
    "q_vocab_coverage_bpe" ->
      (s"WITH $bpeChainCte,\n" +
      """bt AS (SELECT x.lang, unnest(v3.syms) AS t
        |       FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents) x
        |       JOIN v3 USING (w)),
        |voc AS (SELECT t, 1 AS iv FROM (
        |          SELECT t, count(*) AS c FROM bt GROUP BY t
        |          ORDER BY c DESC, t ASC LIMIT 32))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(count(*) FILTER (WHERE voc.iv IS NULL) AS BIGINT) AS n_oov,
        |       round(CAST(count(*) FILTER (WHERE voc.iv IS NULL) AS DOUBLE)
        |             / count(*), 6) AS oov_rate
        |FROM bt LEFT JOIN voc ON bt.t = voc.t
        |GROUP BY lang ORDER BY lang""".stripMargin),
    "q_vocab_coverage" ->
      """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
        |v AS (SELECT w, 1 AS iv FROM (
        |        SELECT w, count(*) AS c FROM t GROUP BY w
        |        ORDER BY c DESC, w ASC LIMIT 32))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(count(*) FILTER (WHERE v.iv IS NULL) AS BIGINT) AS n_oov,
        |       round(CAST(count(*) FILTER (WHERE v.iv IS NULL) AS DOUBLE)
        |             / count(*), 6) AS oov_rate
        |FROM t LEFT JOIN v ON t.w = v.w
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_bpe_merges" ->
      """WITH v0 AS (SELECT CAST(count(*) AS BIGINT) AS freq, regexp_extract_all(w, '.') AS syms
        |            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |            GROUP BY w),
        |p1 AS (SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |         SELECT freq,
        |                unnest([syms[i] FOR i IN range(1, len(syms))]) AS l,
        |                unnest([syms[i + 1] FOR i IN range(1, len(syms))]) AS r
        |         FROM v0 WHERE len(syms) >= 2)
        |       GROUP BY l, r),
        |b1 AS (SELECT l, r, cnt FROM p1 ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
        |v1 AS (SELECT freq,
        |              CASE WHEN b.l IS NULL THEN syms ELSE
        |                list_reduce(list_prepend(CAST([] AS VARCHAR[]), [[s] FOR s IN syms]),
        |                  (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND x[1] = b.r
        |                              THEN acc[1:len(acc) - 1] || [acc[-1] || x[1]]
        |                              ELSE acc || x END)
        |              END AS syms
        |       FROM v0 LEFT JOIN b1 b ON true),
        |p2 AS (SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |         SELECT freq,
        |                unnest([syms[i] FOR i IN range(1, len(syms))]) AS l,
        |                unnest([syms[i + 1] FOR i IN range(1, len(syms))]) AS r
        |         FROM v1 WHERE len(syms) >= 2)
        |       GROUP BY l, r),
        |b2 AS (SELECT l, r, cnt FROM p2 ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
        |v2 AS (SELECT freq,
        |              CASE WHEN b.l IS NULL THEN syms ELSE
        |                list_reduce(list_prepend(CAST([] AS VARCHAR[]), [[s] FOR s IN syms]),
        |                  (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND x[1] = b.r
        |                              THEN acc[1:len(acc) - 1] || [acc[-1] || x[1]]
        |                              ELSE acc || x END)
        |              END AS syms
        |       FROM v1 LEFT JOIN b2 b ON true),
        |p3 AS (SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |         SELECT freq,
        |                unnest([syms[i] FOR i IN range(1, len(syms))]) AS l,
        |                unnest([syms[i + 1] FOR i IN range(1, len(syms))]) AS r
        |         FROM v2 WHERE len(syms) >= 2)
        |       GROUP BY l, r),
        |b3 AS (SELECT l, r, cnt FROM p3 ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)
        |SELECT CAST(1 AS INT) AS round, l AS lhs, r AS rhs, cnt AS pair_count FROM b1
        |UNION ALL
        |SELECT CAST(2 AS INT), l, r, cnt FROM b2
        |UNION ALL
        |SELECT CAST(3 AS INT), l, r, cnt FROM b3
        |ORDER BY round""".stripMargin,
    "q_block_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |bl AS (SELECT doc_id, ts,
        |              unnest([i FOR i IN range(1, CAST(ceil(len(ts) / 16.0) AS BIGINT) + 1)]) AS i
        |       FROM toks),
        |b AS (SELECT doc_id, i - 1 AS bpos,
        |             array_to_string(ts[CAST((i - 1) * 16 + 1 AS BIGINT):CAST(i * 16 AS BIGINT)], ' ') AS btext
        |      FROM bl),
        |own AS (SELECT btext, count(DISTINCT doc_id) AS bdf, min(doc_id) AS first_doc
        |        FROM b GROUP BY btext)
        |SELECT b.doc_id AS doc_id,
        |       CAST(count(*) AS BIGINT) AS n_blocks,
        |       CAST(count(*) FILTER (WHERE NOT (bdf = 1 OR b.doc_id = first_doc)) AS BIGINT) AS n_dropped,
        |       md5(coalesce(string_agg(btext, ' ' ORDER BY bpos)
        |                      FILTER (WHERE bdf = 1 OR b.doc_id = first_doc), '')) AS clean_md5
        |FROM b JOIN own USING (btext)
        |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin,
    "q_substring_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |g AS (SELECT doc_id, i - 1 AS pos,
        |             array_to_string(ts[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ') AS gtext
        |      FROM (SELECT doc_id, ts, unnest([i FOR i IN range(1, len(ts) - 6)]) AS i
        |            FROM toks WHERE len(ts) >= 8)),
        |gh AS (SELECT doc_id, pos, gtext,
        |              list_reduce(list_prepend(CAST(0 AS BIGINT),
        |                [CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1
        |                 FOR c IN regexp_extract_all(substring(md5(gtext), 1, 15), '.')]),
        |                (acc, x) -> acc * 16 + x) AS h
        |       FROM g),
        |hot AS (SELECT h FROM gh GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |cand AS (SELECT gh.doc_id, gh.pos, gh.gtext FROM gh JOIN hot USING (h)),
        |dup AS (SELECT gtext, min(doc_id) AS first_doc FROM cand
        |        GROUP BY gtext HAVING count(DISTINCT doc_id) >= 2),
        |drp AS (SELECT c.doc_id, c.pos FROM cand c JOIN dup d USING (gtext)
        |        WHERE c.doc_id <> d.first_doc),
        |cov AS (SELECT DISTINCT doc_id, pos + j AS tpos FROM drp, range(0, 8) r(j)),
        |sp AS (SELECT doc_id,
        |              CAST(sum(CASE WHEN prev IS NULL OR tpos - prev > 1
        |                            THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
        |              CAST(count(*) AS BIGINT) AS n_dropped_tokens
        |       FROM (SELECT doc_id, tpos,
        |                    lag(tpos) OVER (PARTITION BY doc_id ORDER BY tpos) AS prev
        |             FROM cov)
        |       GROUP BY doc_id),
        |ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY doc_id),
        |nd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup FROM drp GROUP BY doc_id),
        |tok AS (SELECT doc_id, i - 1 AS tpos, ts[CAST(i AS BIGINT)] AS tok
        |        FROM (SELECT doc_id, ts, unnest([i FOR i IN range(1, len(ts) + 1)]) AS i
        |              FROM toks)),
        |kept AS (SELECT t.doc_id, md5(string_agg(t.tok, ' ' ORDER BY t.tpos)) AS clean_md5
        |         FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.tpos = c.tpos
        |         WHERE c.tpos IS NULL GROUP BY t.doc_id)
        |SELECT d.doc_id AS doc_id,
        |       coalesce(ng.n_grams, 0) AS n_grams,
        |       coalesce(nd.n_dup, 0) AS n_dup,
        |       coalesce(sp.n_spans, 0) AS n_spans,
        |       coalesce(sp.n_dropped_tokens, 0) AS n_dropped_tokens,
        |       coalesce(k.clean_md5, md5('')) AS clean_md5
        |FROM documents d LEFT JOIN ng USING (doc_id) LEFT JOIN nd USING (doc_id)
        |     LEFT JOIN sp USING (doc_id) LEFT JOIN kept k USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // the increment-regime substring tier: admitted arrivals owned
    // against the FROZEN base (text equality directly — the engine's
    // two-tier hash/text chain is an optimization with the same rows)
    "q_substring_dedup_delta" -> (s"WITH $incrementCtes,\n$substringDeltaCtes,\n" +
      """sp AS (SELECT doc_id,
        |              CAST(sum(CASE WHEN prev IS NULL OR tpos - prev > 1
        |                            THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
        |              CAST(count(*) AS BIGINT) AS n_dropped_tokens
        |       FROM (SELECT doc_id, tpos,
        |                    lag(tpos) OVER (PARTITION BY doc_id ORDER BY tpos) AS prev
        |             FROM cov)
        |       GROUP BY doc_id),
        |ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM gd GROUP BY doc_id),
        |nd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup FROM drp GROUP BY doc_id),
        |tok AS (SELECT doc_id, i - 1 AS tpos, ts[CAST(i AS BIGINT)] AS tok
        |        FROM (SELECT doc_id, ts, unnest([i FOR i IN range(1, len(ts) + 1)]) AS i
        |              FROM td)),
        |kept AS (SELECT t.doc_id, md5(string_agg(t.tok, ' ' ORDER BY t.tpos)) AS clean_md5
        |         FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.tpos = c.tpos
        |         WHERE c.tpos IS NULL GROUP BY t.doc_id)
        |SELECT a.doc_id AS doc_id,
        |       coalesce(ng.n_grams, 0) AS n_grams,
        |       coalesce(nd.n_dup, 0) AS n_dup,
        |       coalesce(sp.n_spans, 0) AS n_spans,
        |       coalesce(sp.n_dropped_tokens, 0) AS n_dropped_tokens,
        |       coalesce(k.clean_md5, md5('')) AS clean_md5
        |FROM adm a LEFT JOIN ng USING (doc_id) LEFT JOIN nd USING (doc_id)
        |     LEFT JOIN sp USING (doc_id) LEFT JOIN kept k USING (doc_id)
        |ORDER BY doc_id""".stripMargin),
    // generation 2 of the delta substring tier: day-2 admitted spans
    // owned against the frozen base ∪ day-1 admissions
    "q_substring_dedup_delta2" -> (s"WITH $incrementCtes,\n$increment2Ctes,\n$substringDelta2Ctes,\n" +
      """sp AS (SELECT doc_id,
        |              CAST(sum(CASE WHEN prev IS NULL OR tpos - prev > 1
        |                            THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
        |              CAST(count(*) AS BIGINT) AS n_dropped_tokens
        |       FROM (SELECT doc_id, tpos,
        |                    lag(tpos) OVER (PARTITION BY doc_id ORDER BY tpos) AS prev
        |             FROM cov2)
        |       GROUP BY doc_id),
        |ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM gd2 GROUP BY doc_id),
        |nd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup FROM drp2 GROUP BY doc_id),
        |tok AS (SELECT doc_id, i - 1 AS tpos, ts[CAST(i AS BIGINT)] AS tok
        |        FROM (SELECT doc_id, ts, unnest([i FOR i IN range(1, len(ts) + 1)]) AS i
        |              FROM td2)),
        |kept AS (SELECT t.doc_id, md5(string_agg(t.tok, ' ' ORDER BY t.tpos)) AS clean_md5
        |         FROM tok t LEFT JOIN cov2 c ON t.doc_id = c.doc_id AND t.tpos = c.tpos
        |         WHERE c.tpos IS NULL GROUP BY t.doc_id)
        |SELECT a.doc_id AS doc_id,
        |       coalesce(ng.n_grams, 0) AS n_grams,
        |       coalesce(nd.n_dup, 0) AS n_dup,
        |       coalesce(sp.n_spans, 0) AS n_spans,
        |       coalesce(sp.n_dropped_tokens, 0) AS n_dropped_tokens,
        |       coalesce(k.clean_md5, md5('')) AS clean_md5
        |FROM adm2 a LEFT JOIN ng USING (doc_id) LEFT JOIN nd USING (doc_id)
        |     LEFT JOIN sp USING (doc_id) LEFT JOIN kept k USING (doc_id)
        |ORDER BY doc_id""".stripMargin),
    // the composed nightly increment: every column from first
    // principles over the SHARED CTE sets; equality with the
    // Spark row (which reads each stage's LOADED product) proves the
    // four increment products mutually consistent
    "q_increment_run" -> ("WITH RECURSIVE\n" +
      """absrc AS MATERIALIZED (SELECT doc_id, lang, text FROM documents
        |          WHERE md5(CAST(doc_id AS VARCHAR))[1:1] NOT IN ('e', 'f')),
        |""".stripMargin +
      corpusChainCteOver("absrc") + ",\n" +
      s"$incrementCtes,\n$substringDeltaCtes,\n" +
      """au AS MATERIALIZED (SELECT doc_id, text FROM bas
        |       UNION ALL SELECT doc_id, text FROM adm)
        |SELECT CAST((SELECT count(*) FROM del) AS BIGINT) AS n_delta,
        |       CAST((SELECT count(*) FROM v WHERE reason = 'ok') AS BIGINT) AS n_admitted,
        |       CAST((SELECT count(*) FROM v WHERE reason = 'quality') AS BIGINT) AS n_quality,
        |       CAST((SELECT count(*) FROM v WHERE reason = 'exact_base') AS BIGINT) AS n_exact_base,
        |       CAST((SELECT count(*) FROM v WHERE reason = 'exact_delta') AS BIGINT) AS n_exact_delta,
        |       CAST((SELECT count(*) FROM v WHERE reason = 'neardup') AS BIGINT) AS n_neardup,
        |       CAST((SELECT count(*) FROM v WHERE reason = 'neardup_delta') AS BIGINT) AS n_neardup_delta,
        |       CAST((SELECT count(*) FROM cbr2) AS BIGINT) AS n_base_docs,
        |       CAST((SELECT count(*) FROM adm) AS BIGINT) AS n_applied,
        |       CAST((SELECT count(*) FROM au WHERE len(string_split(text, ' ')) >= 8) AS BIGINT) AS gram_docs_upd,
        |       CAST((SELECT count(*) FROM au WHERE len(string_split(text, ' ')) >= 3) AS BIGINT) AS band_docs_upd,
        |       CAST((SELECT count(*) FROM drp) AS BIGINT) AS sub_dropped_grams,
        |       CAST((SELECT count(*) FROM cov) AS BIGINT) AS sub_dropped_tokens""".stripMargin),
    // day 2 of the composed increment: the chained invariants from
    // first principles over the gen-1 + gen-2 CTE sets
    "q_increment_run2" -> ("WITH RECURSIVE\n" +
      """absrc AS MATERIALIZED (SELECT doc_id, lang, text FROM documents
        |          WHERE md5(CAST(doc_id AS VARCHAR))[1:1] NOT IN ('e', 'f')),
        |""".stripMargin +
      corpusChainCteOver("absrc") + ",\n" +
      s"$incrementCtes,\n$increment2Ctes,\n$substringDelta2Ctes,\n" +
      """au2 AS MATERIALIZED (SELECT doc_id, text FROM bas2
        |       UNION ALL SELECT doc_id, text FROM adm2)
        |SELECT CAST((SELECT count(*) FROM del2) AS BIGINT) AS n_delta2,
        |       CAST((SELECT count(*) FROM vg2 WHERE reason = 'ok') AS BIGINT) AS n_admitted2,
        |       CAST((SELECT count(*) FROM vg2 WHERE reason = 'quality') AS BIGINT) AS n_quality2,
        |       CAST((SELECT count(*) FROM vg2 WHERE reason = 'exact_base') AS BIGINT) AS n_exact_base2,
        |       CAST((SELECT count(*) FROM vg2 WHERE reason = 'exact_delta') AS BIGINT) AS n_exact_delta2,
        |       CAST((SELECT count(*) FROM vg2 WHERE reason = 'neardup') AS BIGINT) AS n_neardup2,
        |       CAST((SELECT count(*) FROM vg2 WHERE reason = 'neardup_delta') AS BIGINT) AS n_neardup_delta2,
        |       CAST((SELECT count(*) FROM cbr2) + (SELECT count(*) FROM adm1) AS BIGINT) AS n_prior_docs,
        |       CAST((SELECT count(*) FROM adm2) AS BIGINT) AS n_applied2,
        |       CAST((SELECT count(*) FROM au2 WHERE len(string_split(text, ' ')) >= 8) AS BIGINT) AS gram_docs_upd2,
        |       CAST((SELECT count(*) FROM au2 WHERE len(string_split(text, ' ')) >= 3) AS BIGINT) AS band_docs_upd2,
        |       CAST((SELECT count(*) FROM drp2) AS BIGINT) AS sub_dropped_grams2,
        |       CAST((SELECT count(*) FROM cov2) AS BIGINT) AS sub_dropped_tokens2""".stripMargin),
    "q_semdedup" ->
      (s"WITH $ivfIndexCte,\n" +
      """m AS (SELECT e.vec_id, cell, v FROM e JOIN cells USING (vec_id)),
        |red AS (SELECT DISTINCT a.cell, a.vec_id
        |        FROM m a JOIN m b ON a.cell = b.cell AND b.vec_id < a.vec_id
        |        WHERE round(list_dot_product(a.v, b.v)
        |                    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.35)
        |SELECT m.cell AS cell, CAST(count(*) AS BIGINT) AS n_vecs,
        |       CAST(count(r.vec_id) AS BIGINT) AS n_redundant
        |FROM m LEFT JOIN red r ON m.cell = r.cell AND m.vec_id = r.vec_id
        |GROUP BY m.cell ORDER BY cell""".stripMargin),
    "q_minhash_accuracy" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |sh AS (SELECT doc_id,
        |              unnest([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
        |                      FOR i IN range(1, len(ts) - 1)]) AS s
        |       FROM toks),
        |hh AS (
        |  SELECT doc_id,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           [CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1
        |            FOR c IN regexp_extract_all(substring(md5(s || '#a'), 1, 15), '.')]),
        |           (acc, x) -> acc * 16 + x) AS h1,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           [CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1
        |            FOR c IN regexp_extract_all(substring(md5(s || '#b'), 1, 15), '.')]),
        |           (acc, x) -> acc * 16 + x) AS h2
        |  FROM sh),
        |mins AS (
        |  SELECT doc_id, j, min(h1 + j * (h2 >> 4)) AS m
        |  FROM hh, range(0, 16) r(j) GROUP BY 1, 2),
        |bands AS (
        |  SELECT doc_id, j // 4 AS band,
        |         string_agg(CAST(m AS VARCHAR), ':' ORDER BY j) AS band_key
        |  FROM mins GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |agree AS (
        |  SELECT c.doc_a, c.doc_b,
        |         CAST(count(*) FILTER (WHERE ma.m = mb.m) AS BIGINT) AS k_eq
        |  FROM cand c JOIN mins ma ON ma.doc_id = c.doc_a
        |              JOIN mins mb ON mb.doc_id = c.doc_b AND ma.j = mb.j
        |  GROUP BY 1, 2),
        |dsh AS (SELECT DISTINCT doc_id, s FROM sh),
        |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM dsh GROUP BY 1),
        |inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |                 CAST(count(*) AS BIGINT) AS n_common
        |          FROM dsh x JOIN dsh y ON x.s = y.s AND x.doc_id < y.doc_id
        |          GROUP BY 1, 2)
        |SELECT c.doc_a AS doc_a, c.doc_b AS doc_b,
        |       k_eq / 16.0 AS est_jaccard,
        |       round(coalesce(n_common, 0) / (ca.n + cb.n - coalesce(n_common, 0)), 6) AS true_jaccard,
        |       round(abs(k_eq / 16.0
        |                 - coalesce(n_common, 0) / (ca.n + cb.n - coalesce(n_common, 0))), 6) AS abs_err
        |FROM cand c JOIN agree USING (doc_a, doc_b)
        |     LEFT JOIN inter USING (doc_a, doc_b)
        |     JOIN cnt ca ON ca.doc_id = c.doc_a
        |     JOIN cnt cb ON cb.doc_id = c.doc_b
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_dedup_cluster" ->
      """WITH RECURSIVE toksc AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |              unnest([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
        |                      FOR i IN range(1, len(ts) - 1)]) AS shingle
        |       FROM toksc),
        |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |                 CAST(count(*) AS BIGINT) AS n_common
        |          FROM sh a JOIN sh b
        |            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b
        |  FROM inter JOIN cnt ca ON ca.doc_id = doc_a
        |             JOIN cnt cb ON cb.doc_id = doc_b
        |  WHERE CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) >= 0.5),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(doc, lbl) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.doc = e.b)
        |SELECT doc AS doc_id, min(lbl) AS cluster_rep FROM reach GROUP BY doc
        |ORDER BY doc_id""".stripMargin,
    "q_neardup_purge" ->
      """WITH RECURSIVE toksc AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |              unnest([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
        |                      FOR i IN range(1, len(ts) - 1)]) AS shingle
        |       FROM toksc),
        |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |                 CAST(count(*) AS BIGINT) AS n_common
        |          FROM sh a JOIN sh b
        |            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b
        |  FROM inter JOIN cnt ca ON ca.doc_id = doc_a
        |             JOIN cnt cb ON cb.doc_id = doc_b
        |  WHERE CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) >= 0.5),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(doc, lbl) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.doc = e.b),
        |comp AS (SELECT doc AS doc_id, min(lbl) AS cluster_rep FROM reach GROUP BY doc),
        |allc AS (SELECT d.doc_id, coalesce(c.cluster_rep, d.doc_id) AS rep
        |         FROM documents d LEFT JOIN comp c USING (doc_id)),
        |sz AS (SELECT rep, CAST(count(*) AS BIGINT) AS cluster_size FROM allc GROUP BY rep)
        |SELECT allc.doc_id AS doc_id, rep, cluster_size,
        |       (allc.doc_id <> rep) AS purged
        |FROM allc JOIN sz USING (rep) ORDER BY doc_id""".stripMargin,
    "q_dedup_ngram" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |              unnest([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
        |                      FOR i IN range(1, len(ts) - 1)]) AS shingle
        |       FROM toks),
        |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |                 CAST(count(*) AS BIGINT) AS n_common
        |          FROM sh a JOIN sh b
        |            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |       round(CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common), 6) AS jaccard
        |FROM inter JOIN cnt ca ON ca.doc_id = doc_a
        |           JOIN cnt cb ON cb.doc_id = doc_b
        |WHERE CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) >= 0.5
        |ORDER BY 1, 2""".stripMargin,
    // q_dedup_minhash / q_dedup_simhash: omitted — engine-specific
    // (xxhash64 / SimHash64) hashing; deterministic for the rows-only
    // check, pinned by specs, and the *_md5 portable variants below
    // carry full oracles for the same pipeline shapes.
    // the incrementally-extended tables verify against a FULL-REBUILD
    // replay over base ∪ admitted (append ≡ rebuild: doc-keyed postings,
    // disjoint doc sets), with the persist row's summary currency
    "q_dedup_index_update" -> (s"WITH $incrementCtes,\n" +
      """au AS MATERIALIZED (SELECT doc_id, text FROM bas
        |       UNION ALL
        |       SELECT del.doc_id, del.text FROM del JOIN v USING (doc_id)
        |       WHERE v.reason = 'ok'),
        |""".stripMargin +
      md5BandsCteOver("au", "u") + ",\n" +
      indexSummaryTailSql("au")),
    // the CHAINED generation-2 tables: one more day of the same
    // lifecycle — the replay is a full rebuild over base ∪ a₁ ∪ a₂
    // (apply∘apply ≡ rebuild-over-union: doc-keyed postings, disjoint
    // doc sets, iterated)
    "q_dedup_index_update2" -> dedupIndexUnion2Sql,
    // the compacted tables hold the SAME content re-laid as one write:
    // the oracle is the update2 replay verbatim
    "q_dedup_index_compact" -> dedupIndexUnion2Sql,
    "q_dedup_minhash_md5" -> (md5BandsCte +
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_bands
        |FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    // the gate view is the SYMMETRIC expansion of the candidate pairs:
    // for each arriving doc, every EXISTING doc it band-collides with
    "s_neardup_gate" -> (md5BandsCte +
      """SELECT a.doc_id AS doc_id, b.doc_id AS dup_id
        |FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id <> b.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    // the exact tier of the same admission path: symmetric exact-gram
    // collision pairs over the batch substring oracle's gram windows
    "s_substring_gate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |g AS (SELECT DISTINCT doc_id,
        |             array_to_string(ts[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ') AS gtext
        |      FROM (SELECT doc_id, ts, unnest([i FOR i IN range(1, len(ts) - 6)]) AS i
        |            FROM toks WHERE len(ts) >= 8))
        |SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS dup_id
        |FROM g a JOIN g b ON a.gtext = b.gtext AND a.doc_id <> b.doc_id
        |ORDER BY doc_id, dup_id""".stripMargin,
    // the increment-regime gate: arrivals (all docs) probe the UPDATED
    // durable index — base split UNION admitted delta arrivals (the
    // shared admission CTEs), never the full corpus
    "s_substring_gate_upd" -> (s"WITH $incrementCtes,\n" +
      """au AS MATERIALIZED (SELECT doc_id, text FROM bas
        |       UNION ALL
        |       SELECT del.doc_id, del.text FROM del JOIN v USING (doc_id)
        |       WHERE v.reason = 'ok'),
        |ta AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |ga AS (SELECT DISTINCT doc_id,
        |              array_to_string(ts[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ') AS gtext
        |       FROM (SELECT doc_id, ts, unnest([i FOR i IN range(1, len(ts) - 6)]) AS i
        |             FROM ta WHERE len(ts) >= 8)),
        |tu AS (SELECT doc_id, string_split(text, ' ') AS ts FROM au),
        |gu AS (SELECT DISTINCT doc_id,
        |              array_to_string(ts[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ') AS gtext
        |       FROM (SELECT doc_id, ts, unnest([i FOR i IN range(1, len(ts) - 6)]) AS i
        |             FROM tu WHERE len(ts) >= 8))
        |SELECT DISTINCT a.doc_id AS doc_id, c.doc_id AS dup_id
        |FROM ga a JOIN gu c ON a.gtext = c.gtext AND a.doc_id <> c.doc_id
        |ORDER BY doc_id, dup_id""".stripMargin),
    // generation 2 of the increment-regime gate: arrivals probe the
    // TWICE-extended index — base ∪ admitted₁ ∪ admitted₂
    "s_substring_gate_upd2" -> (s"WITH $incrementCtes,\n$increment2Ctes,\n" +
      """au AS MATERIALIZED (SELECT doc_id, text FROM bas2
        |       UNION ALL
        |       SELECT del2.doc_id, del2.text FROM del2 JOIN vg2 USING (doc_id)
        |       WHERE vg2.reason = 'ok'),
        |ta AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |ga AS (SELECT DISTINCT doc_id,
        |              array_to_string(ts[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ') AS gtext
        |       FROM (SELECT doc_id, ts, unnest([i FOR i IN range(1, len(ts) - 6)]) AS i
        |             FROM ta WHERE len(ts) >= 8)),
        |tu AS (SELECT doc_id, string_split(text, ' ') AS ts FROM au),
        |gu AS (SELECT DISTINCT doc_id,
        |              array_to_string(ts[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ') AS gtext
        |       FROM (SELECT doc_id, ts, unnest([i FOR i IN range(1, len(ts) - 6)]) AS i
        |             FROM tu WHERE len(ts) >= 8))
        |SELECT DISTINCT a.doc_id AS doc_id, c.doc_id AS dup_id
        |FROM ga a JOIN gu c ON a.gtext = c.gtext AND a.doc_id <> c.doc_id
        |ORDER BY doc_id, dup_id""".stripMargin),
    // its sketch-tier twin over the same generation-2 state
    "s_neardup_gate_upd2" -> (s"WITH $incrementCtes,\n$increment2Ctes,\n" +
      """au AS MATERIALIZED (SELECT doc_id, text FROM bas2
        |       UNION ALL
        |       SELECT del2.doc_id, del2.text FROM del2 JOIN vg2 USING (doc_id)
        |       WHERE vg2.reason = 'ok'),
        |""".stripMargin +
      md5BandsCteOver("documents", "a") + ",\n" +
      md5BandsCteOver("au", "u") + "\n" +
      """SELECT a.doc_id AS doc_id, u.doc_id AS dup_id
        |FROM abands a JOIN ubands u
        |  ON a.band = u.band AND a.band_key = u.band_key AND a.doc_id <> u.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    // the sketch-tier twin: arrival bands probe the base ∪ admitted
    // md5-band chain (the same admission CTEs select the union)
    "s_neardup_gate_upd" -> (s"WITH $incrementCtes,\n" +
      """au AS MATERIALIZED (SELECT doc_id, text FROM bas
        |       UNION ALL
        |       SELECT del.doc_id, del.text FROM del JOIN v USING (doc_id)
        |       WHERE v.reason = 'ok'),
        |""".stripMargin +
      md5BandsCteOver("documents", "a") + ",\n" +
      md5BandsCteOver("au", "u") + "\n" +
      """SELECT a.doc_id AS doc_id, u.doc_id AS dup_id
        |FROM abands a JOIN ubands u
        |  ON a.band = u.band AND a.band_key = u.band_key AND a.doc_id <> u.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    // the composed admission path: the union of the five tiers' batch
    // replays over the ARRIVAL set (corpus + the novel re-sent burst) —
    // the quality z_fp CTE, the md5/gram/band arrival-probes-corpus
    // pairs (each fragment identical to its standalone oracle's shape),
    // and the novel-content keep-first tier (content the corpus already
    // holds is the 'exact' tier's business — the precedence rule)
    "s_corpus_ingest" -> ("""WITH arrv AS (
      |  SELECT doc_id, lang, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000000, lang,
      |         'novel resend payload ' || CAST(doc_id AS VARCHAR)
      |  FROM documents WHERE md5(CAST(doc_id AS VARCHAR))[1:1] = '0'
      |  UNION ALL
      |  SELECT doc_id + 200000000, lang,
      |         'novel resend payload ' || CAST(doc_id AS VARCHAR)
      |  FROM documents WHERE md5(CAST(doc_id AS VARCHAR))[1:1] = '0'),
      |""".stripMargin +
      zfpCteOver("arrv", "ci") + ",\n" +
      md5BandsCteOver("arrv", "a") + ",\n" +
      md5BandsCteOver("documents", "c") + ",\n" +
      """sta AS (SELECT doc_id, string_split(text, ' ') AS ts2 FROM arrv),
        |sga AS (SELECT DISTINCT doc_id,
        |              array_to_string(ts2[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ') AS gtext
        |       FROM (SELECT doc_id, ts2, unnest([i FOR i IN range(1, len(ts2) - 6)]) AS i
        |             FROM sta WHERE len(ts2) >= 8)),
        |stc AS (SELECT doc_id, string_split(text, ' ') AS ts2 FROM documents),
        |sgc AS (SELECT DISTINCT doc_id,
        |              array_to_string(ts2[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ') AS gtext
        |       FROM (SELECT doc_id, ts2, unnest([i FOR i IN range(1, len(ts2) - 6)]) AS i
        |             FROM stc WHERE len(ts2) >= 8)),
        |flags AS (
        |  SELECT doc_id, 'quality' AS reason FROM cif WHERE z_fp < 0
        |  UNION ALL
        |  SELECT DISTINCT a.doc_id, 'exact' FROM arrv a JOIN documents b
        |    ON md5(a.text) = md5(b.text) AND a.doc_id <> b.doc_id
        |  UNION ALL
        |  SELECT DISTINCT a.doc_id, 'substring' FROM sga a JOIN sgc b
        |    ON a.gtext = b.gtext AND a.doc_id <> b.doc_id
        |  UNION ALL
        |  SELECT DISTINCT a.doc_id, 'neardup' FROM abands a JOIN cbands b
        |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id <> b.doc_id
        |  UNION ALL
        |  SELECT doc_id, 'exact_arrival' FROM (
        |    SELECT a.doc_id, min(a.doc_id) OVER (PARTITION BY md5(a.text)) AS mn
        |    FROM arrv a WHERE NOT EXISTS
        |      (SELECT 1 FROM documents d2 WHERE md5(d2.text) = md5(a.text)))
        |  WHERE doc_id <> mn)
        |SELECT doc_id, reason FROM flags ORDER BY doc_id, reason""".stripMargin),
    // the drift monitor: the q_doc_perplexity LM + snap scheme rolled
    // up per 60 s ingest window (ts = 86400 + doc_id, so the window key
    // is a floor-divide of doc_id); unseen count is identically 0 here
    // (arrivals replay the LM's own corpus — the fixture spec drives
    // the non-zero branch) but the column is the alarm
    // per-source ingest health at window grain: the q_domain_stats
    // rollup bucketed by the rig's ts = 86400 + doc_id second stamps
    "s_domain_stats" -> (s"WITH ${zfpCteOver("documents", "ds")}\n" +
      """SELECT CAST((86400 + d.doc_id) // 60 * 60000 AS BIGINT) AS window_start_ms,
        |       d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(f.n_tokens) AS BIGINT) AS n_tokens,
        |       CAST(count(CASE WHEN f.z_fp >= 0 THEN 1 END) AS BIGINT) AS n_pass,
        |       round(CAST(count(CASE WHEN f.z_fp >= 0 THEN 1 END) AS DOUBLE) / count(*), 6) AS pass_rate
        |FROM documents d JOIN dsf f USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "s_lm_drift" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |g AS (SELECT doc_id, unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2 FROM t),
        |big AS (SELECT w1, w2, count(*) AS c12 FROM g GROUP BY 1, 2),
        |uni AS (SELECT w1, count(*) AS c1 FROM g GROUP BY 1),
        |lm AS (SELECT w1, w2, CAST(c12 AS DOUBLE) / c1 AS p FROM big JOIN uni USING (w1))
        |SELECT ((86400 + g.doc_id) // 60) * 60000 AS window_start_ms,
        |       CAST(count(*) AS BIGINT) AS n_grams,
        |       CAST(0 AS BIGINT) AS n_unseen,
        |       CAST(sum(CAST(floor(-ln(p) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
        |         / 1000000.0 / count(*) AS avg_neg_logp
        |FROM g JOIN lm USING (w1, w2) GROUP BY 1 ORDER BY 1""".stripMargin,
    // the cross-arrival tier in isolation: the corpus replayed as an
    // ingest run plus the '0'-bucket re-sent block — keep-first over
    // the arrival order, which IS id order (re-sent ids sit above
    // ResentBase), so min(doc_id) per content group
    "s_arrival_dedup" ->
      """WITH arrv AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000000, text FROM documents
        |  WHERE md5(CAST(doc_id AS VARCHAR))[1:1] = '0'),
        |f AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS mn FROM arrv)
        |SELECT doc_id, mn AS first_doc FROM f WHERE doc_id <> mn
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_simhash_md5" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |h AS (SELECT doc_id,
        |             list_reduce(list_prepend(CAST(0 AS BIGINT),
        |               [CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1
        |                FOR c IN regexp_extract_all(substring(md5(t), 1, 15), '.')]),
        |               (acc, x) -> acc * 16 + x) AS hv
        |      FROM toks),
        |bits AS (SELECT doc_id, j,
        |                CASE WHEN sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) >= 0
        |                     THEN CAST(1 AS BIGINT) << j ELSE 0 END AS bit
        |         FROM h, range(0, 60) r(j) GROUP BY doc_id, j),
        |sig AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS sig FROM bits GROUP BY doc_id),
        |chunks AS (SELECT doc_id, sig, c,
        |                  (sig >> (c * 15)) & 32767 AS chunk_val
        |           FROM sig, range(0, 4) r(c)),
        |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |                 CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
        |          FROM chunks a JOIN chunks b
        |            ON a.c = b.c AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3
        |ORDER BY 1, 2""".stripMargin,
    // byte-TRUE stats via hex(encode(text)) — a per-codepoint ascii()
    // formulation would silently agree only on pure-ASCII corpora
    "q_media_features" ->
      """WITH b AS (
        |  SELECT doc_id, source, octet_length(encode(text)) AS nb,
        |         [list_reduce(list_prepend(CAST(0 AS BIGINT),
        |            [CAST(strpos('0123456789ABCDEF', c) AS BIGINT) - 1
        |             FOR c IN regexp_extract_all(hex(encode(text))[i*2+1:i*2+2], '.')]),
        |            (acc, x) -> acc * 16 + x)
        |          FOR i IN range(0, octet_length(encode(text)))] AS bytes
        |  FROM documents)
        |SELECT doc_id,
        |       CASE WHEN source = 'src0' THEN 'image'
        |            WHEN source = 'src1' THEN 'audio'
        |            ELSE 'video' END AS media_type,
        |       CAST(nb AS INTEGER) AS n_bytes,
        |       CASE WHEN nb = 0 THEN 0.0
        |            ELSE CAST(list_sum(bytes) AS DOUBLE) / nb END AS mean_byte,
        |       CAST(len(list_distinct(bytes)) AS INTEGER) AS n_distinct_bytes
        |FROM b ORDER BY doc_id""".stripMargin,
    "q_similarity_lsh" ->
      """WITH planes AS (
        |  SELECT j, [((i * 31 + j * 17) % 101) / 50.5 - 1.0 FOR i IN range(0, 64)] AS p
        |  FROM range(0, 4) r(j)),
        |e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
        |b AS (SELECT vec_id, v,
        |             CAST(sum(CASE WHEN list_dot_product(v, p) >= 0.0
        |                           THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
        |      FROM e, planes GROUP BY vec_id, v),
        |q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0)
        |SELECT b.vec_id AS vec_id, b.bucket AS bucket,
        |       round(list_dot_product(v, qv)
        |             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
        |FROM b, q WHERE b.bucket = q.qb AND b.vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "q_ann_recall" ->
      (s"WITH $ivfIndexCte,\n" +
      s"""panel AS (SELECT vec_id AS qid, v AS qv FROM e
        |          WHERE $panelWhereSql),
        |""".stripMargin +
      """exact AS (SELECT qid, vec_id FROM (
        |            SELECT p.qid, e.vec_id,
        |                   row_number() OVER (PARTITION BY p.qid
        |                     ORDER BY round(list_dot_product(v, qv)
        |                       / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) DESC,
        |                       e.vec_id ASC) AS rn
        |            FROM e, panel p WHERE e.vec_id <> p.qid) WHERE rn <= 10),
        |probed AS (SELECT qid, cell FROM (
        |             SELECT p.qid, centroid_id AS cell,
        |                    row_number() OVER (PARTITION BY p.qid
        |                      ORDER BY round(list_dot_product(qv, cv)
        |                        / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) DESC,
        |                        centroid_id ASC) AS rn
        |             FROM panel p, cen) WHERE rn <= 2),
        |approx AS (SELECT qid, vec_id FROM (
        |             SELECT pr.qid, e.vec_id,
        |                    row_number() OVER (PARTITION BY pr.qid
        |                      ORDER BY round(list_dot_product(v, qv)
        |                        / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) DESC,
        |                        e.vec_id ASC) AS rn
        |             FROM e JOIN cells ON e.vec_id = cells.vec_id
        |                    JOIN probed pr ON cells.cell = pr.cell
        |                    JOIN panel p ON p.qid = pr.qid
        |             WHERE e.vec_id <> pr.qid) WHERE rn <= 10),
        |""".stripMargin + recallTailSql),
    "q_range_search" ->
      (s"WITH $ivfIndexCte,\n" +
      s"""panel AS (SELECT vec_id AS qid, v AS qv FROM e
        |          WHERE $panelWhereSql),
        |exact AS (SELECT p.qid, e.vec_id FROM e, panel p
        |          WHERE e.vec_id <> p.qid
        |            AND round(list_dot_product(v, qv)
        |              / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6)
        |                >= CAST(${graft.operators.Similarity.RangeTau} AS DOUBLE)),
        |probed AS (SELECT qid, cell FROM (
        |             SELECT p.qid, centroid_id AS cell,
        |                    row_number() OVER (PARTITION BY p.qid
        |                      ORDER BY round(list_dot_product(qv, cv)
        |                        / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) DESC,
        |                        centroid_id ASC) AS rn
        |             FROM panel p, cen) WHERE rn <= 2),
        |found AS (SELECT pr.qid, e.vec_id
        |          FROM e JOIN cells ON e.vec_id = cells.vec_id
        |                 JOIN probed pr ON cells.cell = pr.cell
        |                 JOIN panel p ON p.qid = pr.qid
        |          WHERE e.vec_id <> pr.qid
        |            AND round(list_dot_product(v, qv)
        |              / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6)
        |                >= CAST(${graft.operators.Similarity.RangeTau} AS DOUBLE)),
        |hits AS (SELECT x.qid, CAST(count(*) AS BIGINT) AS nx,
        |                CAST(count(f.vec_id) AS BIGINT) AS nh
        |         FROM exact x LEFT JOIN found f ON f.qid = x.qid AND f.vec_id = x.vec_id
        |         GROUP BY x.qid)
        |SELECT CAST(${graft.operators.Similarity.RangeTau} AS DOUBLE) AS tau,
        |       CAST(count(*) AS BIGINT) AS n_queries,
        |       CAST(sum(nx) AS BIGINT) AS n_exact, CAST(sum(nh) AS BIGINT) AS n_found,
        |       round(CAST(sum(nh) AS DOUBLE) / sum(nx), 6) AS range_recall
        |FROM hits""".stripMargin),
    "q_srp_recall" ->
      (s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
        |ev AS (SELECT vec_id,
        |              [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) FOR x IN embedding] AS xs
        |       FROM embeddings),
        |panel AS (SELECT vec_id AS qid, v AS qv FROM e
        |          WHERE $panelWhereSql),
        |proj AS (SELECT vec_id,
        |                [CAST(list_sum([CASE WHEN (i * 31 + j * 17) % 101 >= 51
        |                                     THEN xs[i + 1] ELSE -xs[i + 1] END
        |                                FOR i IN range(0, 64)]) AS BIGINT)
        |                 FOR j IN range(0, ${graft.operators.Similarity.SrpDims})] AS p
        |         FROM ev),
        |exact AS (SELECT qid, vec_id FROM (
        |            SELECT p.qid, e.vec_id,
        |                   row_number() OVER (PARTITION BY p.qid
        |                     ORDER BY round(list_dot_product(v, qv)
        |                       / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) DESC,
        |                       e.vec_id ASC) AS rn
        |            FROM e, panel p WHERE e.vec_id <> p.qid) WHERE rn <= 10),
        |pq AS (SELECT qid, p AS q FROM proj JOIN panel ON vec_id = qid),
        |approx AS (SELECT qid, vec_id FROM (
        |             SELECT pq.qid, c.vec_id,
        |                    row_number() OVER (PARTITION BY pq.qid
        |                      ORDER BY round(CAST(list_sum([c.p[k] * pq.q[k] FOR k IN range(1, ${graft.operators.Similarity.SrpDims + 1})]) AS DOUBLE)
        |                        / (sqrt(CAST(list_sum([c.p[k] * c.p[k] FOR k IN range(1, ${graft.operators.Similarity.SrpDims + 1})]) AS DOUBLE))
        |                         * sqrt(CAST(list_sum([pq.q[k] * pq.q[k] FOR k IN range(1, ${graft.operators.Similarity.SrpDims + 1})]) AS DOUBLE))), 6) DESC,
        |                        c.vec_id ASC) AS rn
        |             FROM proj c, pq WHERE c.vec_id <> pq.qid) WHERE rn <= 10),
        |hits AS (SELECT x.qid, CAST(count(*) AS BIGINT) AS nx,
        |                CAST(count(a.vec_id) AS BIGINT) AS nh
        |         FROM exact x LEFT JOIN approx a ON a.qid = x.qid AND a.vec_id = x.vec_id
        |         GROUP BY x.qid)
        |SELECT ${graft.operators.Similarity.SrpDims} AS proj_dims, 10 AS k,
        |       CAST(count(*) AS BIGINT) AS n_queries,
        |       CAST(sum(nx) AS BIGINT) AS n_exact, CAST(sum(nh) AS BIGINT) AS n_hit,
        |       round(CAST(sum(nh) AS DOUBLE) / sum(nx), 6) AS recall
        |FROM hits""".stripMargin),
    "q_bq_recall" ->
      (s"WITH $bqCodedCte,\n" +
      s"""panel AS (SELECT vec_id AS qid, v AS qv, w0 AS qw0, w1 AS qw1
        |          FROM e JOIN pc USING (vec_id)
        |          WHERE $panelWhereSql),
        |""".stripMargin +
      s"""exact AS (SELECT qid, vec_id FROM (
        |            SELECT p.qid, e.vec_id,
        |                   row_number() OVER (PARTITION BY p.qid
        |                     ORDER BY round(list_dot_product(v, qv)
        |                       / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) DESC,
        |                       e.vec_id ASC) AS rn
        |            FROM e, panel p WHERE e.vec_id <> p.qid) WHERE rn <= 10),
        |cand AS (SELECT qid, vec_id FROM (
        |           SELECT p.qid, c.vec_id,
        |                  row_number() OVER (PARTITION BY p.qid
        |                    ORDER BY (bit_count(xor(c.w0, p.qw0)) + bit_count(xor(c.w1, p.qw1))) ASC,
        |                      c.vec_id ASC) AS rn
        |           FROM pc c, panel p WHERE c.vec_id <> p.qid)
        |         WHERE rn <= ${graft.operators.Similarity.BqRerank}),
        |approx AS (SELECT qid, vec_id FROM (
        |             SELECT cd.qid, cd.vec_id,
        |                    row_number() OVER (PARTITION BY cd.qid
        |                      ORDER BY round(list_dot_product(e.v, p.qv)
        |                        / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(p.qv, p.qv))), 6) DESC,
        |                        cd.vec_id ASC) AS rn
        |             FROM cand cd JOIN e ON e.vec_id = cd.vec_id
        |             JOIN panel p ON p.qid = cd.qid) WHERE rn <= 10),
        |hits AS (SELECT x.qid, CAST(count(*) AS BIGINT) AS nx,
        |                CAST(count(a.vec_id) AS BIGINT) AS nh
        |         FROM exact x LEFT JOIN approx a ON a.qid = x.qid AND a.vec_id = x.vec_id
        |         GROUP BY x.qid)
        |SELECT 64 AS bits, ${graft.operators.Similarity.BqRerank} AS rerank_r, 10 AS k,
        |       CAST(count(*) AS BIGINT) AS n_queries,
        |       CAST(sum(nx) AS BIGINT) AS n_exact, CAST(sum(nh) AS BIGINT) AS n_hit,
        |       round(CAST(sum(nh) AS DOUBLE) / sum(nx), 6) AS recall
        |FROM hits""".stripMargin),
    // the BQ durable tier verifies against the SAME coding chain —
    // all-integer, so round-trip identity needs no IEEE argument
    "q_bq_persist" ->
      (s"WITH $bqCodedCte,\n" +
      """a AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs,
        |              CAST(bit_xor((vec_id % 1000003) * 1009 + (w0 % 1009) * 31 + (w1 % 1009)) AS BIGINT) AS code_checksum
        |       FROM pc),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_dims,
        |             CAST(bit_xor(xor(d * 4000037, t)) AS BIGINT) AS thr_checksum
        |      FROM td)
        |SELECT n_vecs, code_checksum, n_dims, thr_checksum FROM a, t""".stripMargin),
    // the BQ serving tier: Hamming-top-R shortlist, exact-rescored
    // top-1 per panel query — the q_bq_recall cand chain's serve view
    "s_bq_serve" ->
      (s"WITH $bqCodedCte,\n" +
      s"""panel AS (SELECT vec_id AS qid, v AS qv, w0 AS qw0, w1 AS qw1
        |          FROM e JOIN pc USING (vec_id)
        |          WHERE $panelWhereSql),
        |cand AS (SELECT qid, vec_id FROM (
        |           SELECT p.qid, c.vec_id,
        |                  row_number() OVER (PARTITION BY p.qid
        |                    ORDER BY (bit_count(xor(c.w0, p.qw0)) + bit_count(xor(c.w1, p.qw1))) ASC,
        |                      c.vec_id ASC) AS rn
        |           FROM pc c, panel p WHERE c.vec_id <> p.qid)
        |         WHERE rn <= ${graft.operators.Similarity.BqRerank})
        |SELECT qid, vec_id, cos AS cos_sim FROM (
        |  SELECT cd.qid, cd.vec_id,
        |         round(list_dot_product(e.v, p.qv)
        |           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(p.qv, p.qv))), 6) AS cos,
        |         row_number() OVER (PARTITION BY cd.qid
        |           ORDER BY round(list_dot_product(e.v, p.qv)
        |             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(p.qv, p.qv))), 6) DESC,
        |             cd.vec_id ASC) AS rn
        |  FROM cand cd JOIN e ON e.vec_id = cd.vec_id
        |       JOIN panel p ON p.qid = cd.qid) WHERE rn = 1
        |ORDER BY qid""".stripMargin),
    "q_mmr_rerank" -> {
      val lam = graft.operators.Similarity.MmrLambda
      val mu = graft.operators.Similarity.MmrMu
      val sl = graft.operators.Similarity.MmrShortlist
      val cos = "round(list_dot_product(%s, %s) / (sqrt(list_dot_product(%s, %s)) * sqrt(list_dot_product(%s, %s))), 6)"
      val head =
        s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
          |panel AS (SELECT vec_id AS qid, v AS qv FROM e
          |          WHERE $panelWhereSql),
          |sl AS (SELECT qid, vec_id, rel FROM (
          |         SELECT p.qid, e.vec_id,
          |                ${cos.format("v", "qv", "v", "v", "qv", "qv")} AS rel,
          |                row_number() OVER (PARTITION BY p.qid
          |                  ORDER BY ${cos.format("v", "qv", "v", "v", "qv", "qv")} DESC,
          |                    e.vec_id ASC) AS rn
          |         FROM e, panel p WHERE e.vec_id <> p.qid) WHERE rn <= $sl),
          |sims AS (SELECT s1.qid, s1.vec_id AS a, s2.vec_id AS b,
          |                ${cos.format("ea.v", "eb.v", "ea.v", "ea.v", "eb.v", "eb.v")} AS sim
          |         FROM sl s1 JOIN sl s2 ON s1.qid = s2.qid AND s1.vec_id <> s2.vec_id
          |         JOIN e ea ON ea.vec_id = s1.vec_id
          |         JOIN e eb ON eb.vec_id = s2.vec_id),
          |acc1 AS (SELECT qid, 1 AS pos, vec_id, $lam * rel AS score FROM (
          |           SELECT qid, vec_id, rel,
          |                  row_number() OVER (PARTITION BY qid
          |                    ORDER BY rel DESC, vec_id ASC) AS rn
          |           FROM sl) WHERE rn = 1),
          |""".stripMargin
      val rounds = (2 to graft.operators.Similarity.MmrK).map { t =>
        s"""sel$t AS (SELECT qid, $t AS pos, vec_id, score FROM (
          |          SELECT c.qid, c.vec_id, $lam * c.rel - $mu * m.maxsim AS score,
          |                 row_number() OVER (PARTITION BY c.qid
          |                   ORDER BY ($lam * c.rel - $mu * m.maxsim) DESC,
          |                     c.vec_id ASC) AS rn
          |          FROM sl c
          |          JOIN (SELECT s.qid, s.a AS vec_id, max(s.sim) AS maxsim
          |                FROM sims s JOIN acc${t - 1} p
          |                  ON s.qid = p.qid AND s.b = p.vec_id
          |                GROUP BY 1, 2) m
          |            ON c.qid = m.qid AND c.vec_id = m.vec_id
          |          WHERE NOT EXISTS (SELECT 1 FROM acc${t - 1} p
          |                            WHERE p.qid = c.qid AND p.vec_id = c.vec_id))
          |         WHERE rn = 1),
          |acc$t AS (SELECT qid, pos, vec_id, score FROM acc${t - 1}
          |          UNION ALL SELECT qid, pos, vec_id, score FROM sel$t),
          |""".stripMargin
      }.mkString
      // strip the final trailing ",\n" before the terminal SELECT
      head + rounds.stripSuffix(",\n") + "\n" +
        s"""SELECT qid, pos, vec_id, round(score, 6) AS score
          |FROM acc${graft.operators.Similarity.MmrK}
          |ORDER BY qid, pos""".stripMargin
    },
    "q_sq_recall" ->
      ("""WITH t AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v,
        |             greatest(list_max([abs(CAST(x AS DOUBLE)) FOR x IN embedding]), 1e-30) AS max_abs
        |           FROM embeddings),
        |e AS (SELECT vec_id, v,
        |        [least(greatest(round(x * (CAST(127 AS DOUBLE) / max_abs)),
        |                        CAST(-127 AS DOUBLE)), CAST(127 AS DOUBLE)) FOR x IN v] AS code
        |      FROM t),
        |""".stripMargin +
      s"""panel AS (SELECT vec_id AS qid, v AS qv, code AS qc FROM e
        |          WHERE $panelWhereSql),
        |""".stripMargin +
      """exact AS (SELECT qid, vec_id FROM (
        |            SELECT p.qid, e.vec_id,
        |                   row_number() OVER (PARTITION BY p.qid
        |                     ORDER BY round(list_dot_product(v, qv)
        |                       / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) DESC,
        |                       e.vec_id ASC) AS rn
        |            FROM e, panel p WHERE e.vec_id <> p.qid) WHERE rn <= 10),
        |approx AS (SELECT qid, vec_id FROM (
        |             SELECT p.qid, e.vec_id,
        |                    row_number() OVER (PARTITION BY p.qid
        |                      ORDER BY list_dot_product(code, qc)
        |                        / (sqrt(list_dot_product(code, code)) * sqrt(list_dot_product(qc, qc))) DESC,
        |                        e.vec_id ASC) AS rn
        |             FROM e, panel p WHERE e.vec_id <> p.qid) WHERE rn <= 10),
        |""".stripMargin + recallTailSql),
    "q_lsh_recall" ->
      ("""WITH planes AS (
        |  SELECT j, [((i * 31 + j * 17) % 101) / 50.5 - 1.0 FOR i IN range(0, 64)] AS p
        |  FROM range(0, 4) r(j)),
        |e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
        |b AS (SELECT vec_id, v,
        |             CAST(sum(CASE WHEN list_dot_product(v, p) >= 0.0
        |                           THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
        |      FROM e, planes GROUP BY vec_id, v),
        |""".stripMargin +
      s"""panel AS (SELECT vec_id AS qid, v AS qv, bucket AS qb FROM b
        |          WHERE $panelWhereSql),
        |""".stripMargin +
      """exact AS (SELECT qid, vec_id FROM (
        |            SELECT p.qid, e.vec_id,
        |                   row_number() OVER (PARTITION BY p.qid
        |                     ORDER BY round(list_dot_product(v, qv)
        |                       / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) DESC,
        |                       e.vec_id ASC) AS rn
        |            FROM e, panel p WHERE e.vec_id <> p.qid) WHERE rn <= 10),
        |approx AS (SELECT qid, vec_id FROM (
        |             SELECT p.qid, b.vec_id,
        |                    row_number() OVER (PARTITION BY p.qid
        |                      ORDER BY round(list_dot_product(v, qv)
        |                        / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) DESC,
        |                        b.vec_id ASC) AS rn
        |             FROM b JOIN panel p ON b.bucket = p.qb
        |             WHERE b.vec_id <> p.qid) WHERE rn <= 10),
        |""".stripMargin + recallTailSql),
    "q_ivfsq_recall" ->
      (s"WITH $ivfIndexCte,\n" +
      """t AS (SELECT vec_id, v, greatest(list_max([abs(x) FOR x IN v]), 1e-30) AS max_abs FROM e),
        |c AS (SELECT vec_id, v,
        |        [least(greatest(round(x * (CAST(127 AS DOUBLE) / max_abs)),
        |                        CAST(-127 AS DOUBLE)), CAST(127 AS DOUBLE)) FOR x IN v] AS code
        |      FROM t),
        |""".stripMargin +
      s"""panel AS (SELECT vec_id AS qid, v AS qv, code AS qc FROM c
        |          WHERE $panelWhereSql),
        |""".stripMargin +
      """exact AS (SELECT qid, vec_id FROM (
        |            SELECT p.qid, e.vec_id,
        |                   row_number() OVER (PARTITION BY p.qid
        |                     ORDER BY round(list_dot_product(v, qv)
        |                       / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) DESC,
        |                       e.vec_id ASC) AS rn
        |            FROM e, panel p WHERE e.vec_id <> p.qid) WHERE rn <= 10),
        |probed AS (SELECT qid, cell FROM (
        |             SELECT p.qid, centroid_id AS cell,
        |                    row_number() OVER (PARTITION BY p.qid
        |                      ORDER BY round(list_dot_product(qv, cv)
        |                        / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) DESC,
        |                        centroid_id ASC) AS rn
        |             FROM panel p, cen) WHERE rn <= 2),
        |approx AS (SELECT qid, vec_id FROM (
        |             SELECT pr.qid, c.vec_id,
        |                    row_number() OVER (PARTITION BY pr.qid
        |                      ORDER BY list_dot_product(code, qc)
        |                        / (sqrt(list_dot_product(code, code)) * sqrt(list_dot_product(qc, qc))) DESC,
        |                        c.vec_id ASC) AS rn
        |             FROM c JOIN cells ON c.vec_id = cells.vec_id
        |                    JOIN probed pr ON cells.cell = pr.cell
        |                    JOIN panel p ON p.qid = pr.qid
        |             WHERE c.vec_id <> pr.qid) WHERE rn <= 10),
        |""".stripMargin + recallTailSql),
    "q_ivf_cell_stats" ->
      (s"WITH $ivfIndexCte,\n" +
      """sz AS (SELECT cell, CAST(count(*) AS BIGINT) AS sz FROM cells GROUP BY cell)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells, CAST(sum(sz) AS BIGINT) AS n_vecs,
        |       CAST(min(sz) AS BIGINT) AS min_cell, CAST(max(sz) AS BIGINT) AS max_cell,
        |       round(CAST(sum(sz) AS DOUBLE) / count(*), 6) AS avg_cell,
        |       round(CAST(max(sz) * count(*) AS DOUBLE) / sum(sz), 6) AS imbalance
        |FROM sz""".stripMargin),
    // the persisted-index round trip and the streaming ingest both
    // verify against the SAME trained chain the in-memory index uses:
    // a loaded index (or a streamed assignment) is correct iff it is
    // value-identical to that chain
    // per-dim drift monitor: HUGEINT sums over the exact 1e-6 longs
    // (≡ Spark's DECIMAL(38,0)); mean/std one shared IEEE expression
    "q_embed_stats" ->
      """WITH xs AS MATERIALIZED (
        |  SELECT CAST(d AS INT) AS dim,
        |         CAST(round(CAST(embedding[d] AS DOUBLE) * 1000000.0) AS BIGINT) AS x
        |  FROM embeddings, range(1, 65) r(d)),
        |a AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |             min(x) AS mnx, max(x) AS mxx,
        |             sum(CAST(x AS HUGEINT)) AS sx,
        |             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
        |      FROM xs GROUP BY dim)
        |SELECT dim, n,
        |       CAST(mnx AS DOUBLE) / 1000000.0 AS min_v,
        |       CAST(mxx AS DOUBLE) / 1000000.0 AS max_v,
        |       round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6) AS mean_v,
        |       round(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / CAST(n AS DOUBLE) / 1000000.0, 6) AS std_v
        |FROM a ORDER BY dim""".stripMargin,
    "q_index_persist" ->
      (s"WITH $ivfIndexCte,\n" +
      """a AS (SELECT CAST(count(DISTINCT cell) AS BIGINT) AS n_cells,
        |              CAST(count(*) AS BIGINT) AS n_vecs,
        |              CAST(bit_xor((vec_id % 1000003) * 1009 + (cell % 1009)) AS BIGINT) AS asn_checksum
        |       FROM cells),
        |c AS (SELECT CAST(sum(CAST(round(cv[i] * 1000000.0) AS BIGINT)) AS BIGINT) AS cen_checksum
        |      FROM cen, range(1, 65) r(i))
        |SELECT n_cells, n_vecs, asn_checksum, cen_checksum FROM a, c""".stripMargin),
    "s_vector_ingest" ->
      (s"WITH $ivfIndexCte\n" +
      """SELECT vec_id, cell FROM cells ORDER BY vec_id""".stripMargin),
    // the PQ durable tier verifies against the SAME training chain —
    // all-integer, so round-trip identity needs no IEEE argument
    "q_pq_persist" ->
      (s"WITH $pqIndexCte,\n" +
      """a AS (SELECT CAST(count(*) AS BIGINT) AS n_code_rows,
        |              CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
        |              CAST(bit_xor((vec_id % 1000003) * 1009 + sub * 131 + (code % 1009)) AS BIGINT) AS code_checksum
        |       FROM codes),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n_cb_components,
        |             CAST(sum(c[i]) AS BIGINT) AS cb_checksum
        |      FROM cb, range(1, 9) r(i))
        |SELECT n_code_rows, n_vecs, code_checksum, n_cb_components, cb_checksum
        |FROM a, c""".stripMargin),
    // PQ refresh: frozen pre-arrival codebooks score both tiers; the
    // distortion averages are single divisions of exact integer sums
    "q_pq_refresh" ->
      (s"WITH ${pqIndexCteOver("(SELECT * FROM embeddings WHERE vec_id % 5 <> 3) pre")},\n" +
      """nev AS (SELECT vec_id,
        |              [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) FOR x IN embedding] AS xs
        |       FROM embeddings WHERE vec_id % 5 = 3),
        |nsv AS (SELECT vec_id, s AS sub, list_slice(xs, s*8 + 1, s*8 + 8) AS v
        |        FROM nev, range(0, 8) r(s)),
        |od AS (SELECT vec_id, sub,
        |              min(CAST(list_sum([(v[i] - c[i]) * (v[i] - c[i]) FOR i IN range(1, 9)]) AS BIGINT)) AS d2
        |       FROM sv JOIN cb USING (sub) GROUP BY 1, 2),
        |nd AS (SELECT vec_id, sub,
        |              min(CAST(list_sum([(v[i] - c[i]) * (v[i] - c[i]) FOR i IN range(1, 9)]) AS BIGINT)) AS d2
        |       FROM nsv JOIN cb USING (sub) GROUP BY 1, 2),
        |oa AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_old,
        |              round(CAST(sum(d2) AS DOUBLE) / count(DISTINCT vec_id), 6) AS avg_d2_old
        |       FROM od),
        |na AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_new,
        |              round(CAST(sum(d2) AS DOUBLE) / count(DISTINCT vec_id), 6) AS avg_d2_new
        |       FROM nd)
        |SELECT n_old, avg_d2_old, n_new, avg_d2_new FROM oa, na""".stripMargin),
    // streaming coder ≡ the batch coding relation, row for row
    "s_pq_ingest" ->
      (s"WITH $pqIndexCte\n" +
      """SELECT vec_id, CAST(sub AS INT) AS sub, code FROM codes
        |ORDER BY vec_id, sub""".stripMargin),
    // IVFPQ serving: the streamed probe + per-event ADC table + cell
    // join + top-1 must replay the composed batch chain exactly
    "s_ivfpq_serve" ->
      (s"WITH $ivfIndexCte,\n$pqIndexCte,\n$ivfpqAdcCte\n" +
      """SELECT qid, vec_id, dist FROM (
        |  SELECT qid, vec_id, dist,
        |         row_number() OVER (PARTITION BY qid
        |                            ORDER BY dist ASC, vec_id ASC) AS rn
        |  FROM adc WHERE vec_id <> qid) WHERE rn = 1
        |ORDER BY qid""".stripMargin),
    // PQ: the full pipeline — 1e6-scaled subvectors, stride-seeded
    // per-subspace codebooks, one Lloyd's round, coding, ADC ranking —
    // in INTEGER distances throughout, so training replays with no
    // rounding grid at all
    "q_pq_recall" ->
      (s"WITH $pqIndexCte,\n" +
      s"""e AS (SELECT vec_id FROM ev),
        |panel AS (SELECT vec_id AS qid FROM ev WHERE $panelWhereSql),
        |psv AS (SELECT panel.qid, sv.sub, sv.v AS qv
        |        FROM sv JOIN panel ON sv.vec_id = panel.qid),
        |dt AS (SELECT qid, cb.sub, cb.code,
        |              CAST(list_sum([(qv[i] - c[i]) * (qv[i] - c[i]) FOR i IN range(1, 9)]) AS BIGINT) AS dq
        |       FROM psv JOIN cb ON psv.sub = cb.sub),
        |adc AS (SELECT dt.qid, codes.vec_id, CAST(sum(dq) AS BIGINT) AS dist
        |        FROM codes JOIN dt ON codes.sub = dt.sub AND codes.code = dt.code
        |        GROUP BY 1, 2),
        |approx AS (SELECT qid, vec_id FROM (
        |            SELECT qid, vec_id,
        |                   row_number() OVER (PARTITION BY qid
        |                                      ORDER BY dist ASC, vec_id ASC) AS rn
        |            FROM adc WHERE vec_id <> qid) WHERE rn <= 10),
        |""".stripMargin + pqExactSql + recallTailSql),
    // IVFPQ: the composed coarse+fine oracle — probe via the shared
    // IVF CTE (float cosine, top-2 cells), rank via the shared PQ CTE
    // (integer ADC), exact side identical to flat PQ's
    "q_ivfpq_recall" ->
      (s"WITH $ivfIndexCte,\n$pqIndexCte,\n$ivfpqAdcCte,\n" +
      """approx AS (SELECT qid, vec_id FROM (
        |            SELECT qid, vec_id,
        |                   row_number() OVER (PARTITION BY qid
        |                                      ORDER BY dist ASC, vec_id ASC) AS rn
        |            FROM adc WHERE vec_id <> qid) WHERE rn <= 10),
        |""".stripMargin + pqExactSql + recallTailSql),
    // IVFPQ + refine: ADC top-50 shortlist, exact integer-L2 rerank of
    // the shortlist only, then top-10 — hits ≡ |shortlist ∩ true top-10|
    "q_ivfpq_rerank" ->
      (s"WITH $ivfIndexCte,\n$pqIndexCte,\n$ivfpqAdcCte,\n" +
      """short AS (SELECT qid, vec_id FROM (
        |           SELECT qid, vec_id,
        |                  row_number() OVER (PARTITION BY qid
        |                                     ORDER BY dist ASC, vec_id ASC) AS rn
        |           FROM adc WHERE vec_id <> qid) WHERE rn <= 50),
        |rer AS (SELECT short.qid, short.vec_id,
        |               CAST(sum(list_sum([(sv.v[i] - qv[i]) * (sv.v[i] - qv[i]) FOR i IN range(1, 9)])) AS BIGINT) AS dist
        |        FROM short
        |        JOIN sv ON sv.vec_id = short.vec_id
        |        JOIN psv ON psv.qid = short.qid AND psv.sub = sv.sub
        |        GROUP BY 1, 2),
        |approx AS (SELECT qid, vec_id FROM (
        |            SELECT qid, vec_id,
        |                   row_number() OVER (PARTITION BY qid
        |                                      ORDER BY dist ASC, vec_id ASC) AS rn
        |            FROM rer) WHERE rn <= 10),
        |""".stripMargin + pqExactSql + recallTailSql),
    // serving: probe argmax (cos DESC, centroid_id ASC) + in-cell
    // top-1 rerank (cos DESC, vec_id ASC), replayed per panel query
    "s_ann_serve" ->
      (s"WITH $ivfIndexCte,\n" +
      s"""panel AS (SELECT vec_id AS qid, v AS qv FROM e
        |          WHERE $panelWhereSql),
        |pcos AS (SELECT qid, centroid_id, ${cosSql("qv", "cv")} AS cos FROM panel, cen),
        |pr AS (SELECT qid, centroid_id AS cell FROM (
        |        SELECT qid, centroid_id,
        |               row_number() OVER (PARTITION BY qid
        |                                  ORDER BY cos DESC, centroid_id ASC) AS rn
        |        FROM pcos) WHERE rn = 1),
        |cand AS (SELECT pr.qid, e.vec_id, ${cosSql("v", "qv")} AS cos
        |         FROM pr JOIN cells ON cells.cell = pr.cell
        |                 JOIN e ON e.vec_id = cells.vec_id
        |                 JOIN panel ON panel.qid = pr.qid
        |         WHERE e.vec_id <> pr.qid)
        |SELECT qid, vec_id, cos AS cos_sim FROM (
        |  SELECT qid, vec_id, cos,
        |         row_number() OVER (PARTITION BY qid
        |                            ORDER BY cos DESC, vec_id ASC) AS rn
        |  FROM cand) WHERE rn = 1 ORDER BY qid""".stripMargin),
    "s_filtered_serve" ->
      (s"WITH $ivfIndexCte,\n" +
      s"""panel AS (SELECT vec_id AS qid, v AS qv FROM e
        |          WHERE $panelWhereSql),
        |pcos AS (SELECT qid, centroid_id, ${cosSql("qv", "cv")} AS cos FROM panel, cen),
        |pr AS (SELECT qid, centroid_id AS cell FROM (
        |        SELECT qid, centroid_id,
        |               row_number() OVER (PARTITION BY qid
        |                                  ORDER BY cos DESC, centroid_id ASC) AS rn
        |        FROM pcos) WHERE rn <= 2),
        |fc AS (SELECT e.vec_id, v FROM e
        |       JOIN embeddings emb ON e.vec_id = emb.vec_id
        |       WHERE emb.label = ${graft.operators.Similarity.FilterLabel}),
        |cand AS (SELECT pr.qid, fc.vec_id, ${cosSql("v", "qv")} AS cos
        |         FROM pr JOIN cells ON cells.cell = pr.cell
        |                 JOIN fc ON fc.vec_id = cells.vec_id
        |                 JOIN panel ON panel.qid = pr.qid
        |         WHERE fc.vec_id <> pr.qid)
        |SELECT qid, vec_id, cos AS cos_sim FROM (
        |  SELECT qid, vec_id, cos,
        |         row_number() OVER (PARTITION BY qid
        |                            ORDER BY cos DESC, vec_id ASC) AS rn
        |  FROM cand) WHERE rn = 1 ORDER BY qid""".stripMargin),
    // the refresh→serve handoff: BOTH training chains replay in one
    // query (the pre-arrival chain under suffixed CTE names), each
    // panel half served by its own index's probe + rerank
    "s_index_swap" ->
      (s"WITH ${ivfIndexCteOver("(SELECT * FROM embeddings WHERE vec_id % 5 <> 3) pre", "_pre")},\n" +
      s"$ivfIndexCte,\n" +
      s"""panel AS (SELECT vec_id AS qid, v AS qv FROM e
        |          WHERE $panelWhereSql),
        |pp AS (SELECT qid, qv, row_number() OVER (ORDER BY qid) AS pos FROM panel),
        |p1 AS (SELECT qid, qv FROM pp WHERE pos % 2 = 1),
        |p2 AS (SELECT qid, qv FROM pp WHERE pos % 2 = 0),
        |pc1 AS (SELECT qid, centroid_id, ${cosSql("qv", "cv")} AS cos FROM p1, cen_pre),
        |pr1 AS (SELECT qid, centroid_id AS cell FROM (
        |        SELECT qid, centroid_id,
        |               row_number() OVER (PARTITION BY qid
        |                                  ORDER BY cos DESC, centroid_id ASC) AS rn
        |        FROM pc1) WHERE rn = 1),
        |cand1 AS (SELECT pr1.qid, e_pre.vec_id, ${cosSql("v", "qv")} AS cos
        |          FROM pr1 JOIN cells_pre ON cells_pre.cell = pr1.cell
        |               JOIN e_pre ON e_pre.vec_id = cells_pre.vec_id
        |               JOIN p1 ON p1.qid = pr1.qid
        |          WHERE e_pre.vec_id <> pr1.qid),
        |r1 AS (SELECT 1 AS version, qid, vec_id, cos AS cos_sim FROM (
        |        SELECT qid, vec_id, cos,
        |               row_number() OVER (PARTITION BY qid
        |                                  ORDER BY cos DESC, vec_id ASC) AS rn
        |        FROM cand1) WHERE rn = 1),
        |pc2 AS (SELECT qid, centroid_id, ${cosSql("qv", "cv")} AS cos FROM p2, cen),
        |pr2 AS (SELECT qid, centroid_id AS cell FROM (
        |        SELECT qid, centroid_id,
        |               row_number() OVER (PARTITION BY qid
        |                                  ORDER BY cos DESC, centroid_id ASC) AS rn
        |        FROM pc2) WHERE rn = 1),
        |cand2 AS (SELECT pr2.qid, e.vec_id, ${cosSql("v", "qv")} AS cos
        |          FROM pr2 JOIN cells ON cells.cell = pr2.cell
        |               JOIN e ON e.vec_id = cells.vec_id
        |               JOIN p2 ON p2.qid = pr2.qid
        |          WHERE e.vec_id <> pr2.qid),
        |r2 AS (SELECT 2 AS version, qid, vec_id, cos AS cos_sim FROM (
        |        SELECT qid, vec_id, cos,
        |               row_number() OVER (PARTITION BY qid
        |                                  ORDER BY cos DESC, vec_id ASC) AS rn
        |        FROM cand2) WHERE rn = 1)
        |SELECT version, qid, vec_id, cos_sim
        |FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
        |ORDER BY version, qid""".stripMargin),
    // same two training chains as s_index_swap; the panel splits into
    // CONTIGUOUS qid-rank thirds (1-based rank r served by v1 iff
    // 3r <= n — mirrored verbatim in sSwapInflight): v1 answers the
    // first third, v2 (the retrained chain, resumed from v1's
    // checkpoint) the in-flight middle and post-swap last thirds
    "s_swap_inflight" ->
      (s"WITH ${ivfIndexCteOver("(SELECT * FROM embeddings WHERE vec_id % 5 <> 3) pre", "_pre")},\n" +
      s"$ivfIndexCte,\n" +
      s"""panel AS (SELECT vec_id AS qid, v AS qv FROM e
        |          WHERE $panelWhereSql),
        |pp AS (SELECT qid, qv, row_number() OVER (ORDER BY qid) AS pos,
        |              count(*) OVER () AS np FROM panel),
        |p1 AS (SELECT qid, qv FROM pp WHERE 3 * pos <= np),
        |p2 AS (SELECT qid, qv FROM pp WHERE 3 * pos > np),
        |pc1 AS (SELECT qid, centroid_id, ${cosSql("qv", "cv")} AS cos FROM p1, cen_pre),
        |pr1 AS (SELECT qid, centroid_id AS cell FROM (
        |        SELECT qid, centroid_id,
        |               row_number() OVER (PARTITION BY qid
        |                                  ORDER BY cos DESC, centroid_id ASC) AS rn
        |        FROM pc1) WHERE rn = 1),
        |cand1 AS (SELECT pr1.qid, e_pre.vec_id, ${cosSql("v", "qv")} AS cos
        |          FROM pr1 JOIN cells_pre ON cells_pre.cell = pr1.cell
        |               JOIN e_pre ON e_pre.vec_id = cells_pre.vec_id
        |               JOIN p1 ON p1.qid = pr1.qid
        |          WHERE e_pre.vec_id <> pr1.qid),
        |r1 AS (SELECT 1 AS version, qid, vec_id, cos AS cos_sim FROM (
        |        SELECT qid, vec_id, cos,
        |               row_number() OVER (PARTITION BY qid
        |                                  ORDER BY cos DESC, vec_id ASC) AS rn
        |        FROM cand1) WHERE rn = 1),
        |pc2 AS (SELECT qid, centroid_id, ${cosSql("qv", "cv")} AS cos FROM p2, cen),
        |pr2 AS (SELECT qid, centroid_id AS cell FROM (
        |        SELECT qid, centroid_id,
        |               row_number() OVER (PARTITION BY qid
        |                                  ORDER BY cos DESC, centroid_id ASC) AS rn
        |        FROM pc2) WHERE rn = 1),
        |cand2 AS (SELECT pr2.qid, e.vec_id, ${cosSql("v", "qv")} AS cos
        |          FROM pr2 JOIN cells ON cells.cell = pr2.cell
        |               JOIN e ON e.vec_id = cells.vec_id
        |               JOIN p2 ON p2.qid = pr2.qid
        |          WHERE e.vec_id <> pr2.qid),
        |r2 AS (SELECT 2 AS version, qid, vec_id, cos AS cos_sim FROM (
        |        SELECT qid, vec_id, cos,
        |               row_number() OVER (PARTITION BY qid
        |                                  ORDER BY cos DESC, vec_id ASC) AS rn
        |        FROM cand2) WHERE rn = 1)
        |SELECT version, qid, vec_id, cos_sim
        |FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
        |ORDER BY version, qid""".stripMargin),
    // refresh: the SAME training chain over the pre-arrival subset
    // (frozen index), arrivals assigned by the same argmax window
    "q_index_refresh" ->
      (s"WITH ${ivfIndexCteOver("(SELECT * FROM embeddings WHERE vec_id % 5 <> 3) pre")},\n" +
      s"""newv AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
        |         FROM embeddings WHERE vec_id % 5 = 3),
        |nasn AS (SELECT newv.vec_id, centroid_id, ${cosSql("v", "cv")} AS cos FROM newv, cen),
        |ncells AS (SELECT vec_id, centroid_id AS cell FROM (
        |            SELECT vec_id, centroid_id,
        |                   row_number() OVER (PARTITION BY vec_id
        |                                      ORDER BY cos DESC, centroid_id DESC) AS rn
        |            FROM nasn) WHERE rn = 1),
        |osz AS (SELECT cell, CAST(count(*) AS BIGINT) AS sz FROM cells GROUP BY cell),
        |oa AS (SELECT CAST(sum(sz) AS BIGINT) AS n_old,
        |              CAST(count(*) AS BIGINT) AS n_cells_old,
        |              round(CAST(max(sz) * count(*) AS DOUBLE) / sum(sz), 6) AS imbalance_old
        |       FROM osz),
        |asz AS (SELECT cell, CAST(count(*) AS BIGINT) AS sz FROM (
        |          SELECT cell FROM cells UNION ALL SELECT cell FROM ncells) GROUP BY cell),
        |ab AS (SELECT CAST(sum(sz) AS BIGINT) AS n_all,
        |              CAST(count(*) AS BIGINT) AS n_cells_refreshed,
        |              round(CAST(max(sz) * count(*) AS DOUBLE) / sum(sz), 6) AS imbalance_refreshed
        |       FROM asz)
        |SELECT n_old, n_all - n_old AS n_new, n_cells_old, n_cells_refreshed,
        |       imbalance_old, imbalance_refreshed
        |FROM oa, ab""".stripMargin),
    "q_similarity_ivf" ->
      (s"WITH $ivfIndexCte,\n" +
      """probed AS (SELECT centroid_id AS cell FROM asn WHERE vec_id = 0
        |           ORDER BY cos DESC, centroid_id ASC LIMIT 2),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
        |SELECT e.vec_id AS vec_id, cells.cell AS cell,
        |       round(list_dot_product(v, qv)
        |             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
        |FROM e JOIN cells ON e.vec_id = cells.vec_id
        |       JOIN probed ON cells.cell = probed.cell
        |       CROSS JOIN q
        |WHERE e.vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin),
    "q_dedup_embedding" ->
      """WITH pairs AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |         sum(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS dot,
        |         sum(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)) AS na2,
        |         sum(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS nb2
        |  FROM embeddings a, embeddings b, range(1, 65) r(i)
        |  WHERE a.vec_id < b.vec_id
        |  GROUP BY 1, 2)
        |SELECT vec_a, vec_b, round(dot / (sqrt(na2) * sqrt(nb2)), 6) AS cos_sim
        |FROM pairs WHERE round(dot / (sqrt(na2) * sqrt(nb2)), 6) >= 0.9
        |ORDER BY 1, 2""".stripMargin,
    "q_similarity_knn" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |dots AS (
        |  SELECT e.vec_id,
        |         sum(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)) AS dot,
        |         sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)) AS na2,
        |         sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)) AS nq2
        |  FROM embeddings e, q, range(1, 65) r(i)
        |  WHERE e.vec_id <> 0
        |  GROUP BY e.vec_id)
        |SELECT vec_id, round(dot / (sqrt(na2) * sqrt(nq2)), 6) AS cos_sim
        |FROM dots ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin,
    "q_knn_join" ->
      """WITH dots AS (
        |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor,
        |         sum(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS dot,
        |         sum(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)) AS na2,
        |         sum(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS nb2
        |  FROM embeddings a, embeddings b, range(1, 65) r(i)
        |  WHERE a.vec_id <> b.vec_id
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT vec_id, neighbor,
        |         round(dot / (sqrt(na2) * sqrt(nb2)), 6) AS cos_sim,
        |         CAST(row_number() OVER (PARTITION BY vec_id
        |           ORDER BY round(dot / (sqrt(na2) * sqrt(nb2)), 6) DESC, neighbor)
        |           AS INT) AS rk
        |  FROM dots)
        |SELECT vec_id, neighbor, cos_sim, rk
        |FROM ranked WHERE rk <= 3 ORDER BY vec_id, rk""".stripMargin,
    "q_knn_join_cell" -> knnJoinCellSql,
    // identical semantics by construction (the salted tiling is an
    // execution-shape change only) — the ONE oracle covers both plans
    "q_knn_join_salted" -> knnJoinCellSql,
    "q_knn_join_recall" ->
      s"""WITH $ivfIndexCte,
        |exact AS (SELECT vec_id, neighbor FROM (
        |  SELECT ea.vec_id, eb.vec_id AS neighbor,
        |         row_number() OVER (PARTITION BY ea.vec_id
        |           ORDER BY ${cosSql("ea.v", "eb.v")} DESC, eb.vec_id ASC) AS rk
        |  FROM e ea JOIN e eb ON ea.vec_id <> eb.vec_id) WHERE rk <= 3),
        |celled AS (SELECT vec_id, neighbor FROM (
        |  SELECT ea.vec_id, eb.vec_id AS neighbor,
        |         row_number() OVER (PARTITION BY ea.vec_id
        |           ORDER BY ${cosSql("ea.v", "eb.v")} DESC, eb.vec_id ASC) AS rk
        |  FROM e ea JOIN cells ca ON ea.vec_id = ca.vec_id
        |       JOIN cells cb ON ca.cell = cb.cell
        |       JOIN e eb ON eb.vec_id = cb.vec_id AND eb.vec_id <> ea.vec_id)
        |  WHERE rk <= 3)
        |SELECT CAST(3 AS INTEGER) AS k, CAST(count(*) AS BIGINT) AS n_exact,
        |       CAST(count(c.neighbor) AS BIGINT) AS n_hit,
        |       round(CAST(count(c.neighbor) AS DOUBLE) / count(*), 6) AS recall
        |FROM exact x LEFT JOIN celled c
        |  ON x.vec_id = c.vec_id AND x.neighbor = c.neighbor""".stripMargin,
    "q_ann_filtered" ->
      (s"WITH $ivfIndexCte,\n" +
      s"""panel AS (SELECT vec_id AS qid, v AS qv FROM e
        |          WHERE $panelWhereSql),
        |np AS (SELECT CAST(x AS INTEGER) AS nprobe FROM (VALUES ${
          Similarity.FilteredNprobes.map(n => s"($n)").mkString(", ")}) t(x)),
        |fc AS (SELECT e.vec_id, v FROM e
        |       JOIN embeddings emb ON e.vec_id = emb.vec_id
        |       WHERE emb.label = ${Similarity.FilterLabel}),
        |""".stripMargin +
      s"""exact AS (SELECT qid, vec_id FROM (
        |            SELECT p.qid, fc.vec_id,
        |                   row_number() OVER (PARTITION BY p.qid
        |                     ORDER BY ${cosSql("v", "qv")} DESC,
        |                       fc.vec_id ASC) AS rn
        |            FROM fc, panel p WHERE fc.vec_id <> p.qid) WHERE rn <= 10),
        |probed AS (SELECT qid, cell, prank FROM (
        |             SELECT p.qid, centroid_id AS cell,
        |                    row_number() OVER (PARTITION BY p.qid
        |                      ORDER BY ${cosSql("qv", "cv")} DESC,
        |                        centroid_id ASC) AS prank
        |             FROM panel p, cen) WHERE prank <= ${Similarity.FilteredNprobes.max}),
        |apr AS (SELECT nprobe, qid, vec_id FROM (
        |          SELECT np.nprobe, pr.qid, fc.vec_id,
        |                 row_number() OVER (PARTITION BY np.nprobe, pr.qid
        |                   ORDER BY ${cosSql("v", "qv")} DESC,
        |                     fc.vec_id ASC) AS rn
        |          FROM fc JOIN cells ON fc.vec_id = cells.vec_id
        |               JOIN probed pr ON cells.cell = pr.cell
        |               JOIN panel p ON p.qid = pr.qid
        |               CROSS JOIN np
        |          WHERE pr.prank <= np.nprobe AND fc.vec_id <> pr.qid)
        |        WHERE rn <= 10),
        |xnp AS (SELECT np.nprobe, x.qid, x.vec_id FROM exact x CROSS JOIN np),
        |hits AS (SELECT x.nprobe, x.qid, CAST(count(*) AS BIGINT) AS nx,
        |                CAST(count(a.vec_id) AS BIGINT) AS nh
        |         FROM xnp x LEFT JOIN apr a ON a.nprobe = x.nprobe
        |              AND a.qid = x.qid AND a.vec_id = x.vec_id
        |         GROUP BY 1, 2)
        |SELECT nprobe, CAST(10 AS INTEGER) AS k,
        |       CAST(count(*) AS BIGINT) AS n_queries,
        |       CAST(sum(nx) AS BIGINT) AS n_exact,
        |       CAST(sum(nh) AS BIGINT) AS n_hit,
        |       round(CAST(sum(nh) AS DOUBLE) / sum(nx), 6) AS recall
        |FROM hits GROUP BY 1 ORDER BY 1""".stripMargin),
    "q_knn_classify" ->
      (s"WITH $ivfIndexCte,\n" +
      s"""lab AS (SELECT vec_id, label FROM embeddings),
        |top AS (SELECT vec_id, label, nb_label FROM (
        |  SELECT ea.vec_id, la.label, lb.label AS nb_label,
        |         row_number() OVER (PARTITION BY ea.vec_id
        |           ORDER BY ${cosSql("ea.v", "eb.v")} DESC, eb.vec_id ASC) AS rk
        |  FROM e ea JOIN cells ca ON ea.vec_id = ca.vec_id
        |       JOIN cells cb ON ca.cell = cb.cell
        |       JOIN e eb ON eb.vec_id = cb.vec_id AND eb.vec_id <> ea.vec_id
        |       JOIN lab la ON la.vec_id = ea.vec_id
        |       JOIN lab lb ON lb.vec_id = eb.vec_id) WHERE rk <= ${Similarity.ClassifyK}),
        |votes AS (SELECT vec_id, label, nb_label,
        |                 CAST(count(*) AS BIGINT) AS votes
        |          FROM top GROUP BY 1, 2, 3),
        |pred AS (SELECT vec_id, label, nb_label FROM (
        |           SELECT vec_id, label, nb_label,
        |                  row_number() OVER (PARTITION BY vec_id
        |                    ORDER BY votes DESC, nb_label ASC) AS vr
        |           FROM votes) WHERE vr = 1)
        |SELECT CAST(${Similarity.ClassifyK} AS INTEGER) AS k, CAST(count(*) AS BIGINT) AS n_scored,
        |       CAST(sum(CASE WHEN nb_label = label THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_correct,
        |       round(CAST(sum(CASE WHEN nb_label = label THEN 1 ELSE 0 END)
        |         AS DOUBLE) / count(*), 6) AS accuracy
        |FROM pred""".stripMargin),
    "q_hard_negatives" ->
      (s"WITH $ivfIndexCte,\n" +
      s"""lab AS (SELECT vec_id, label FROM embeddings),
        |cand AS (SELECT vec_id, anchor_label, neighbor, neg_label, cos_sim FROM (
        |  SELECT ea.vec_id, la.label AS anchor_label, eb.vec_id AS neighbor,
        |         lb.label AS neg_label, ${cosSql("ea.v", "eb.v")} AS cos_sim,
        |         row_number() OVER (PARTITION BY ea.vec_id
        |           ORDER BY ${cosSql("ea.v", "eb.v")} DESC, eb.vec_id ASC) AS rk
        |  FROM e ea JOIN cells ca ON ea.vec_id = ca.vec_id
        |       JOIN cells cb ON ca.cell = cb.cell
        |       JOIN e eb ON eb.vec_id = cb.vec_id AND eb.vec_id <> ea.vec_id
        |       JOIN lab la ON la.vec_id = ea.vec_id
        |       JOIN lab lb ON lb.vec_id = eb.vec_id) WHERE rk <= ${Similarity.ClassifyK}),
        |neg AS (SELECT vec_id, anchor_label, neighbor, neg_label, cos_sim,
        |               CAST(row_number() OVER (PARTITION BY vec_id
        |                 ORDER BY cos_sim DESC, neighbor ASC) AS INTEGER) AS neg_rk
        |        FROM cand WHERE neg_label <> anchor_label)
        |SELECT vec_id, anchor_label, neighbor, neg_label, cos_sim, neg_rk
        |FROM neg WHERE neg_rk <= ${Similarity.HardNegK} ORDER BY vec_id, neg_rk""".stripMargin),
    "q_matryoshka_recall" -> {
      def dimCte(dims: Int): String =
        s"""ax$dims AS (SELECT qid, vec_id FROM (
          |  SELECT qid, vec_id,
          |         row_number() OVER (PARTITION BY qid
          |           ORDER BY ${cosSql(s"v[1:$dims]", s"qv[1:$dims]")} DESC,
          |                    vec_id ASC) AS rn
          |  FROM pairs) WHERE rn <= 10)""".stripMargin
      def dimRow(dims: Int): String =
        s"""SELECT $dims AS dims, 10 AS k,
          |       CAST(count(DISTINCT x.qid) AS BIGINT) AS n_queries,
          |       CAST(count(*) AS BIGINT) AS n_exact,
          |       CAST(count(a.vec_id) AS BIGINT) AS n_hit,
          |       round(CAST(count(a.vec_id) AS DOUBLE) / count(*), 6) AS recall
          |FROM exact x LEFT JOIN ax$dims a
          |  ON a.qid = x.qid AND a.vec_id = x.vec_id""".stripMargin
      s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
        |           FROM embeddings),
        |panel AS (SELECT vec_id AS qid, v AS qv FROM e
        |          WHERE $panelWhereSql),
        |pairs AS (SELECT p.qid, e.vec_id, e.v, p.qv FROM e, panel p
        |          WHERE e.vec_id <> p.qid),
        |exact AS (SELECT qid, vec_id FROM (
        |  SELECT qid, vec_id,
        |         row_number() OVER (PARTITION BY qid
        |           ORDER BY ${cosSql("v", "qv")} DESC, vec_id ASC) AS rn
        |  FROM pairs) WHERE rn <= 10),
        |${dimCte(8)},
        |${dimCte(16)},
        |${dimCte(32)}
        |SELECT * FROM (
        |${dimRow(8)}
        |UNION ALL
        |${dimRow(16)}
        |UNION ALL
        |${dimRow(32)})
        |ORDER BY dims""".stripMargin
    },
    "q_hybrid_search" ->
      (s"WITH $ivfIndexCte,\n" +
      s"""panel AS (SELECT vec_id AS qid, v AS qv FROM e
        |          WHERE $panelWhereSql),
        |toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        |         FROM documents),
        |qt AS (SELECT p.qid, t.tok FROM toks t JOIN panel p ON t.doc_id = p.qid),
        |lexc AS (SELECT qt.qid, t.doc_id, CAST(count(*) AS BIGINT) AS overlap
        |         FROM toks t JOIN qt ON t.tok = qt.tok
        |         WHERE t.doc_id <> qt.qid GROUP BY 1, 2),
        |lex AS (SELECT qid, doc_id, lrank FROM (
        |          SELECT qid, doc_id,
        |                 row_number() OVER (PARTITION BY qid
        |                   ORDER BY overlap DESC, doc_id ASC) AS lrank
        |          FROM lexc) WHERE lrank <= 10),
        |probed AS (SELECT qid, cell FROM (
        |             SELECT p.qid, centroid_id AS cell,
        |                    row_number() OVER (PARTITION BY p.qid
        |                      ORDER BY ${cosSql("qv", "cv")} DESC,
        |                        centroid_id ASC) AS rn
        |             FROM panel p, cen) WHERE rn <= 2),
        |vecc AS (SELECT pr.qid, e.vec_id AS doc_id, ${cosSql("v", "qv")} AS cos
        |         FROM e JOIN cells ON e.vec_id = cells.vec_id
        |              JOIN probed pr ON cells.cell = pr.cell
        |              JOIN panel p ON p.qid = pr.qid
        |         WHERE e.vec_id <> pr.qid),
        |vec AS (SELECT qid, doc_id, vrank FROM (
        |          SELECT qid, doc_id,
        |                 row_number() OVER (PARTITION BY qid
        |                   ORDER BY cos DESC, doc_id ASC) AS vrank
        |          FROM vecc) WHERE vrank <= 10),
        |fused AS (SELECT coalesce(l.qid, v.qid) AS qid,
        |                 coalesce(l.doc_id, v.doc_id) AS doc_id,
        |                 coalesce(CAST(1 AS DOUBLE) / (60 + l.lrank), 0)
        |                   + coalesce(CAST(1 AS DOUBLE) / (60 + v.vrank), 0) AS rrf
        |          FROM lex l FULL OUTER JOIN vec v
        |            ON l.qid = v.qid AND l.doc_id = v.doc_id),
        |r AS (SELECT qid, doc_id, rrf,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY rrf DESC, doc_id ASC) AS rk
        |      FROM fused)
        |SELECT qid, doc_id, round(rrf, 6) AS rrf, CAST(rk AS INTEGER) AS rk
        |FROM r WHERE rk <= 5 ORDER BY qid, rk""".stripMargin),
    "q_hybrid_weighted" -> hybridWeightedOracleSql(vecVote = 1),
    // BM25: idf enters as a 1e-6 fixed-point long (one libm ln per
    // distinct query token); the per-term double is a FIXED chain of
    // correctly-rounded IEEE ops on exact integers, snapped to the 1e-9
    // long grid BEFORE the per-(query, doc) sum — order-independent,
    // bit-identical cross-engine (the docPerplexity scheme)
    "q_bm25_topk" ->
      s"""WITH e AS (SELECT vec_id FROM embeddings),
        |panel AS (SELECT vec_id AS qid FROM e WHERE $panelWhereSql),
        |t0 AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |tr AS (SELECT doc_id, CAST(len(ts) AS INT) AS dl, unnest(ts) AS tok FROM t0),
        |tf AS (SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM tr GROUP BY 1, 2, 3),
        |dft AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |              CAST(sum(len(ts)) AS BIGINT) AS dl_sum FROM t0),
        |qi AS (SELECT DISTINCT p.qid, f.tok FROM tf f JOIN panel p ON f.doc_id = p.qid),
        |qidf AS (SELECT qid, qi.tok, n_docs, dl_sum,
        |                CAST(floor(ln((CAST(n_docs - df AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |                    / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1 AS DOUBLE))
        |                  * 1000000 + 0.5) AS BIGINT) AS idf_fp
        |         FROM qi JOIN dft ON qi.tok = dft.tok CROSS JOIN sc),
        |sco AS (SELECT q.qid, f.doc_id,
        |               CAST(sum(CAST(floor(
        |                 CAST(idf_fp AS DOUBLE) / 1000000.0
        |                 * (CAST(f.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
        |                 / (f.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
        |                     + CAST(0.75 AS DOUBLE)
        |                     * (CAST(f.dl * q.n_docs AS DOUBLE) / q.dl_sum)))
        |                 * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS bm25_fp
        |        FROM tf f JOIN qidf q ON f.tok = q.tok
        |        WHERE f.doc_id <> q.qid GROUP BY 1, 2),
        |r AS (SELECT qid, doc_id, bm25_fp,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY bm25_fp DESC, doc_id ASC) AS rk
        |      FROM sco)
        |SELECT qid, doc_id,
        |       round(CAST(bm25_fp AS DOUBLE) / 1000000000.0, 6) AS bm25,
        |       CAST(rk AS INTEGER) AS rk
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "q_hybrid_parity" -> hybridWeightedOracleSql(vecVote = 2),
    "q_crossmodal_join" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
        |         sum(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)) AS n2
        |  FROM embeddings, range(1, 65) r(i) GROUP BY 1, 2)
        |SELECT d.doc_id AS doc_id, d.lang AS lang, d.n_chars AS n_chars,
        |       n.dim AS dim, round(sqrt(n.n2), 6) AS l2_norm
        |FROM documents d JOIN n ON d.doc_id = n.vec_id
        |ORDER BY 1""".stripMargin,
    "q_media_meta" ->
      """SELECT doc_id,
        |       CASE WHEN source = 'src0' THEN 'image'
        |            WHEN source = 'src1' THEN 'audio'
        |            ELSE 'video' END AS media_type,
        |       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |       doc_id % 640 + 32 AS width, doc_id % 480 + 32 AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_media_frames" ->
      """SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |       md5(substring(text, CAST(i * 64 + 1 AS INTEGER), 64)) AS frame_md5
        |FROM documents, range(0, 4) r(i) ORDER BY 1, 2""".stripMargin,
    // exact payload dedup: md5 over the utf-8 payload bytes ≡ DuckDB
    // md5 over the ascii text; octet_length ≡ Spark length(binary)
    "q_media_dedup" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CASE WHEN source = 'src0' THEN 'image'
        |              WHEN source = 'src1' THEN 'audio'
        |              ELSE 'video' END AS media_type,
        |         md5(text) AS h, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |g AS (SELECT media_type, h, CAST(count(*) AS BIGINT) AS n_copies,
        |             max(n_bytes) AS n_bytes
        |      FROM m GROUP BY 1, 2)
        |SELECT media_type, CAST(count(*) AS BIGINT) AS n_distinct_payloads,
        |       CAST(sum(n_copies) AS BIGINT) AS n_media,
        |       CAST(count(CASE WHEN n_copies >= 2 THEN 1 END) AS BIGINT) AS n_dup_groups,
        |       CAST(sum((n_copies - 1) * n_bytes) AS BIGINT) AS bytes_saved
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_media_histdup" ->
      """WITH b AS (
        |  SELECT doc_id, ascii(ch) % 8 AS bin
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS ch
        |        FROM documents)),
        |c AS (SELECT doc_id, bin, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2),
        |grid AS (SELECT d.doc_id, r.i AS bin
        |         FROM (SELECT DISTINCT doc_id FROM documents) d, range(0, 8) r(i)),
        |fullc AS (SELECT g.doc_id, g.bin, coalesce(c.n, 0) AS n
        |          FROM grid g LEFT JOIN c ON c.doc_id = g.doc_id AND c.bin = g.bin),
        |hist AS (SELECT doc_id,
        |                string_agg(CAST(n AS VARCHAR), ',' ORDER BY bin) AS sig
        |         FROM fullc GROUP BY 1)
        |SELECT sig, CAST(count(*) AS BIGINT) AS n_media,
        |       min(doc_id) AS first_doc_id,
        |       array_to_string(list_sort(list(doc_id))[1:8], ',') AS members
        |FROM hist GROUP BY sig HAVING count(*) >= 2 ORDER BY sig""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS "O",
        |       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS "F",
        |       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS "P"
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_unpivot" ->
      """WITH p AS (
        |  SELECT o_orderpriority,
        |         CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
        |         CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
        |         CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
        |  FROM orders GROUP BY 1)
        |SELECT o_orderpriority, o_orderstatus, n_orders FROM (
        |  SELECT o_orderpriority, 'O' AS o_orderstatus, n_o AS n_orders FROM p
        |  UNION ALL
        |  SELECT o_orderpriority, 'F', n_f FROM p
        |  UNION ALL
        |  SELECT o_orderpriority, 'P', n_p FROM p)
        |ORDER BY 1, 2""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice,
        |       o_totalprice - (SELECT CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0
        |                              / count(o_totalprice) FROM orders) AS above_avg
        |FROM orders
        |WHERE o_totalprice > (SELECT CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0
        |                             / count(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q_null_funcs" ->
      """SELECT o_orderpriority,
        |       CAST(count(nullif(o_orderstatus, 'O')) AS BIGINT) AS n_nonnull,
        |       CAST(count(*) AS BIGINT) AS n_total,
        |       CAST(count(CASE WHEN nullif(o_orderstatus, 'O') IS NULL THEN 1 END) AS BIGINT) AS n_null,
        |       COALESCE(max(nullif(o_orderstatus, 'O')), '-') AS max_or_dash
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_string_funcs" ->
      """SELECT c_custkey,
        |       replace(c_name, 'Customer', 'Cust') AS short_name,
        |       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
        |       reverse(c_mktsegment) AS seg_rev,
        |       CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos,
        |       CAST(levenshtein(c_mktsegment, 'MACHINERY') AS INTEGER) AS seg_dist,
        |       CAST(length(c_name) AS INTEGER) AS name_len
        |FROM customer ORDER BY 1""".stripMargin,
    "q_salted_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_partition_pruning" ->
      """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value FROM events
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q_bucketed_join" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_asof_join" ->
      """SELECT p.user_id AS user_id, p.event_id AS purchase_event_id,
        |       epoch_ms(p.ts) AS purchase_ms, epoch_ms(s.ts) AS last_signup_ms,
        |       epoch_ms(p.ts) - epoch_ms(s.ts) AS since_signup_ms
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY 1, 2""".stripMargin,
    "q_scd2_history" ->
      """WITH s AS (SELECT user_id, ts, event_id, event_type,
        |                  lag(event_type) OVER (PARTITION BY user_id
        |                    ORDER BY ts, event_id) AS prev
        |           FROM events),
        |c AS (SELECT user_id, ts, event_id, event_type FROM s
        |      WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT user_id, event_type,
        |             CAST(row_number() OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS INTEGER) AS version,
        |             ts, lead(ts) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS valid_to_ts
        |      FROM c)
        |SELECT user_id, version, event_type AS attr,
        |       epoch_ms(ts) AS valid_from_ms,
        |       epoch_ms(valid_to_ts) AS valid_to_ms,
        |       valid_to_ts IS NULL AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,
    "q_interpolate" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms, arg_min(value, event_id) AS v
        |  FROM events GROUP BY 1, 2),
        |g0 AS (SELECT user_id, min(ts_ms) AS mn, max(ts_ms) AS mx FROM ev GROUP BY 1),
        |grid AS (
        |  SELECT user_id,
        |         unnest(generate_series((mn + 3599999) // 3600000,
        |                                mx // 3600000)) * 3600000 AS ts_ms,
        |         1 AS kind, CAST(NULL AS DOUBLE) AS v
        |  FROM g0 WHERE mx // 3600000 >= (mn + 3599999) // 3600000),
        |pts AS (SELECT user_id, ts_ms, 0 AS kind, v FROM ev
        |        UNION ALL SELECT user_id, ts_ms, kind, v FROM grid),
        |wv AS (
        |  SELECT user_id, ts_ms, kind,
        |         last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |           ORDER BY ts_ms, kind
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        |         last_value(CASE WHEN kind = 0 THEN ts_ms END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts_ms, kind
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
        |         first_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |           ORDER BY ts_ms, kind
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        |         first_value(CASE WHEN kind = 0 THEN ts_ms END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts_ms, kind
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
        |  FROM pts)
        |SELECT user_id, ts_ms,
        |       round(CASE WHEN prev_t = ts_ms THEN prev_v
        |                  ELSE prev_v + (next_v - prev_v) * (ts_ms - prev_t)
        |                         / (next_t - prev_t) END, 6) AS v_interp
        |FROM wv WHERE kind = 1 AND prev_t IS NOT NULL
        |  AND (next_t IS NOT NULL OR prev_t = ts_ms)
        |ORDER BY user_id, ts_ms""".stripMargin,
    "q_window_sliding" -> slidingAggSql,
    "q_window_session" -> sessionWindowSql,
    "q_recursive_cte" ->
      """WITH RECURSIVE spine(month_start) AS (
        |  SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) FROM orders
        |  UNION ALL
        |  SELECT CAST(month_start + INTERVAL 1 MONTH AS DATE) FROM spine
        |  WHERE month_start <
        |    (SELECT CAST(date_trunc('month', max(o_orderdate)) AS DATE) FROM orders)
        |),
        |monthly AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m, count(*) AS c
        |  FROM orders GROUP BY 1
        |)
        |SELECT sp.month_start, CAST(coalesce(m.c, 0) AS BIGINT) AS n_orders
        |FROM spine sp LEFT JOIN monthly m ON m.m = sp.month_start
        |ORDER BY sp.month_start""".stripMargin,
    "q_source_json" ->
      """SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms, value
        |FROM events ORDER BY event_id""".stripMargin,
    "q_source_csv" ->
      """SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms, value
        |FROM events ORDER BY event_id""".stripMargin,
    "q_source_merge_schema" ->
      """SELECT event_id, user_id,
        |       CASE WHEN event_id % 2 = 1 THEN value END AS value
        |FROM events ORDER BY event_id""".stripMargin,
    "q_source_text" ->
      "SELECT doc_id, text FROM documents ORDER BY doc_id",
    // streaming variants: one input batch ⇒ same results as the batch
    // analogs, so they share those oracles.
    "s_pair_match" -> (pairsCte +
      """SELECT user_id, epoch_ms(placed_ts) AS placed_ms,
        |       epoch_ms(fulfilled_ts) AS fulfilled_ms, processing_ms
        |FROM complete ORDER BY user_id""".stripMargin),
    "s_pair_match_tws" -> (pairsCte +
      """SELECT user_id, epoch_ms(placed_ts) AS placed_ms,
        |       epoch_ms(fulfilled_ts) AS fulfilled_ms, processing_ms
        |FROM complete ORDER BY user_id""".stripMargin),
    "s_user_stats_tws" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |       min(epoch_ms(ts)) AS first_ms, max(epoch_ms(ts)) AS last_ms,
        |       CAST(count(DISTINCT event_type) AS INT) AS n_types
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // C1 arrival-time windows: the oracle reproduces the rig's
    // deterministic arrival waves (wave = event_id mod 3) — the event
    // timestamp column is deliberately absent from the grouping.
    "s_ingest_time" ->
      """SELECT event_type,
        |       1767225600000 + ((event_id % 3) + 1) * 60000 AS window_end_ms,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_observe_metrics" ->
      """SELECT CAST(count(*) AS BIGINT) AS records,
        |       CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
        |       CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
        |       CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value
        |FROM events""".stripMargin,
    "s_tumbling_agg" -> tumblingAggSql,
    "s_sliding_agg" -> slidingAggSql,
    "s_session" -> sessionWindowSql,
    "s_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY 1, 2""".stripMargin,
    "s_complete_agg" -> runningAggSql,
    "s_update_mode" -> runningAggSql,
    "s_foreach_sink" ->
      """SELECT event_id, value FROM events WHERE value > 100.0
        |ORDER BY event_id""".stripMargin,
    "s_upsert_sink" ->
      """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS price FROM orders),
        |ch AS (
        |  SELECT CASE WHEN o_orderkey % 10 = 2 THEN o_orderkey + 100000000
        |              ELSE o_orderkey END AS k,
        |         CASE WHEN o_orderkey % 10 = 1 THEN 'D' ELSE 'U' END AS op,
        |         o_totalprice + 100.0 AS new_price
        |  FROM orders WHERE o_orderkey % 10 <= 2),
        |m AS (
        |  SELECT coalesce(b.k, c.k) AS k,
        |         coalesce(c.new_price, b.price) AS price
        |  FROM base b FULL OUTER JOIN ch c ON b.k = c.k
        |  WHERE c.op IS NULL OR c.op <> 'D')
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CAST(floor(price * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
        |         / 10000.0 AS sum_price,
        |       min(k) AS min_k, max(k) AS max_k
        |FROM m""".stripMargin,
    "s_file_source" -> tumblingAggSql,
    "s_stream_static" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('p00_small', 0.0, 100.0), ('p01_mid', 100.0, 250.0),
        |  ('p02_large', 250.0, 500.0), ('p03_huge', 500.0, 1e9))
        |SELECT event_id, band, value
        |FROM events JOIN bands ON value >= lo AND value < hi
        |ORDER BY event_id""".stripMargin,
    "s_pipeline" ->
      """WITH j AS (
        |  SELECT f.user_id % 10 AS facility_id, f.ts AS f_ts,
        |         epoch_ms(f.ts) - epoch_ms(p.ts) AS gap_ms
        |  FROM events p JOIN events f
        |    ON p.user_id = f.user_id
        |   AND p.event_type = 'signup' AND f.event_type = 'purchase'
        |   AND f.ts >= p.ts AND f.ts <= p.ts + INTERVAL 24 hours)
        |SELECT facility_id,
        |       epoch_ms(time_bucket(INTERVAL 1 minute, f_ts) + INTERVAL 1 minute) AS event_timestamp,
        |       CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(sum(gap_ms) AS BIGINT) AS total_gap_ms
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "s_join_outer" ->
      """WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'signup'),
        |f AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, epoch_ms(p.ts) AS placed_ms, epoch_ms(f.ts) AS fulfilled_ms
        |FROM p LEFT JOIN f
        |  ON p.user_id = f.user_id AND f.ts >= p.ts
        | AND f.ts <= p.ts + INTERVAL 24 HOURS
        |ORDER BY 1, 2, 3 NULLS FIRST""".stripMargin,
  )
}
