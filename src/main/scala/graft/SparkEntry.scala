package graft

import graft.analytics.{AsofJoin, Behavior, Graph, RangeJoin, Sketches, TimeSeries, Tpch}
import graft.core._
import graft.oracle.Sql
import graft.pipeline.{CorpusClean, Dedup, Multimodal, Similarity, TextAnalysis}
import graft.streaming.StreamSum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full extract→transform→record pipeline, all cache states.
    */
  def entry(spark: SparkSession): DataFrame =
    pipelineE2e(spark, "/root/testdata/sf0.001")

  /** Union of every cache's final state, normalized + deterministically
    * ordered ≙ the reference system's complete summarized output.
    * Built from the default text config through the cache-kind registry
    * (one persisted scan feeds every cache aggregation - see
    * `Pipeline.fromConfig`).
    */
  def pipelineE2e(spark: SparkSession, dir: String): DataFrame =
    Pipeline.fromConfig(spark, dir, Pipeline.defaultConfigText)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- streamsum core ----
    "ss_extract" -> ((s, d) => Transform.extract(s, d).orderBy("seq")),
    "ss_transform" -> ((s, d) =>
      Transform.transformed(s, d).orderBy(col("seq"), col("cache"))),
    "ss_cache_assoc" -> ((s, d) =>
      Caches.assocState(Transform.transformed(s, d))
        .orderBy(col("cache"), col("k"))),
    "ss_cache_lastn" -> ((s, d) =>
      Caches.lastnState(Transform.transformed(s, d))
        .orderBy(col("cache"), col("k"), col("rn"))),
    "ss_cache_count" -> ((s, d) =>
      Caches.countState(Transform.transformed(s, d))
        .orderBy(col("cache"), col("s"), col("a"), col("o"))),
    "ss_cache_keycount" -> ((s, d) =>
      Caches.keycountState(Transform.transformed(s, d)).orderBy(col("k"))),
    "ss_undo_assoc" -> ((s, d) =>
      Caches.undoAssocState(Transform.extract(s, d)).orderBy(col("k"))),
    "ss_undo_count" -> ((s, d) =>
      Caches.undoCountState(Transform.extract(s, d))
        .orderBy(col("s"), col("a"), col("o"))),
    "ss_undo_lastn" -> ((s, d) =>
      Caches.undoLastnState(Transform.extract(s, d))
        .orderBy(col("k"), col("rn"))),
    "ss_q_getcount" -> ((s, d) => CountQueries.getCount(s, d, 1L, "buy", 3L)),
    "ss_q_actions_for_subj" -> ((s, d) =>
      CountQueries.actionsForSubj(s, d).orderBy(col("s"), col("a"))),
    "ss_q_counts_for_subj_action" -> ((s, d) =>
      CountQueries.countsForSubjAction(s, d, Seq("buy", "err"))
        .orderBy(col("s"), col("o"))),
    "ss_q_sumcounts" -> ((s, d) =>
      CountQueries.sumCounts(s, d, Seq("buy")).orderBy(col("s"))),
    "ss_q_tuples_sorted" -> ((s, d) => CountQueries.tuplesSorted(s, d)),
    "ss_q_sort_variants" -> ((s, d) =>
      CountQueries.sortedVariants(s, d).orderBy(col("ordering"), col("rk"))),
    "ss_q_topk_per_subj" -> ((s, d) =>
      CountQueries.topKPerSubj(s, d).orderBy(col("s"), col("rk"))),
    "ss_q_topk_custom" -> ((s, d) => {
      val counts = Caches.countState(Transform.transformed(s, d))
        .drop("cache")
      graft.plans.TopK.perKey(counts, Seq("s"),
          Seq(("cnt", false), ("last_t", false), ("a", true), ("o", true)),
          3)
        .select(col("s"), col("a"), col("o"), col("cnt"), col("last_t"),
          col("rk"))
        .orderBy(col("s"), col("rk"))
    }),
    "ss_q_topk_dense" -> ((s, d) => CountQueries.topKDensePerSubj(s, d)),
    "ss_metrics" -> ((s, d) => CountQueries.metrics(s, d).orderBy("metric")),
    "ss_encode_output" -> ((s, d) =>
      CountQueries.encodeOutput(s, d).orderBy(col("seq"), col("cache"))),
    "ss_pipeline_e2e" -> ((s, d) => pipelineE2e(s, d)),
    "ss_stream_count" -> StreamSum.streamCountState _,
    "ss_stream_count_sink" -> StreamSum.streamCountSinkState _,
    "ss_stream_lastn_sink" -> StreamSum.streamLastnSinkState _,
    "ss_stream_lastn" -> ((s, d) => StreamSum.streamLastnState(s, d)),
    "ss_stream_windowed" -> StreamSum.streamWindowedCounts _,
    "ss_stream_assoc" -> StreamSum.streamAssocState _,
    "ss_stream_sessions" -> StreamSum.streamSessionWindows _,
    "ss_stream_dedup" -> StreamSum.streamDedup _,
    "ss_stream_join" -> StreamSum.streamStreamJoin _,
    "ss_stream_lastn_tws" -> ((s, d) => StreamSum.streamLastnTws(s, d)),
    "ss_stream_lsh_cand" -> StreamSum.streamLshCandidates _,
    "ss_stream_containment" -> StreamSum.streamContainment _,
    "ss_stream_ann_cand" -> StreamSum.streamAnnCandidates _,
    "ss_stream_semantic" -> StreamSum.streamSemantic _,
    "ss_stream_asof" -> StreamSum.streamAsof _,
    "ss_stream_attribution" -> StreamSum.streamAttribution _,
    "ss_stream_cohort" -> StreamSum.streamCohort _,
    "ss_stream_mix" -> StreamSum.streamMix _,
    "ss_stream_entropy" -> StreamSum.streamEntropy _,
    "ss_stream_zipf" -> StreamSum.streamZipf _,
    "ss_stream_bigram" -> StreamSum.streamBigramNll _,
    "ss_stream_resample" -> StreamSum.streamResample _,
    "ss_stream_resample_interp" -> StreamSum.streamResampleInterp _,
    "ss_stream_corr" -> StreamSum.streamCorr _,
    "ss_stream_decont" -> StreamSum.streamDecontaminate _,
    "ss_stream_quality" -> StreamSum.streamQuality _,
    "ss_stream_range_join" -> StreamSum.streamRangeJoin _,
    "ss_stream_hll" -> StreamSum.streamHll _,
    "ss_stream_cms" -> StreamSum.streamCms _,
    "ss_stream_qtile" -> StreamSum.streamQtile _,
    "ss_stream_span_scrub" -> StreamSum.streamSpanScrub _,
    "ss_stream_wsample" -> StreamSum.streamWeightedSample _,
    "ss_stream_kmv" -> StreamSum.streamKmv _,
    "ss_stream_qprune" -> StreamSum.streamQualityPrune _,
    "ss_stream_retention" -> StreamSum.streamKmvRetention _,
    "ss_stream_funnel" -> graft.streaming.FeatureStream.streamFunnel _,
    "ss_stream_ewma" -> graft.streaming.FeatureStream.streamEwma _,
    "ss_stream_anomaly" -> graft.streaming.FeatureStream.streamAnomaly _,
    "ss_stream_cooccur" -> graft.streaming.FeatureStream.streamCooccur _,
    "ss_stream_undo_count" -> StreamSum.streamUndoCountState _,
    "ss_stream_undo_assoc" -> StreamSum.streamUndoAssocState _,
    "ss_stream_keycount" -> StreamSum.streamKeycountState _,
    "ss_stream_undo_lastn" -> ((s, d) => StreamSum.streamUndoLastnState(s, d)),
    // ---- analytics / bench ----
    "q1_agg" -> Tpch.q1 _,
    "q4_semijoin" -> Tpch.q4SemiJoin _,
    "q3_join_agg" -> Tpch.q3 _,
    "q5_multijoin" -> Tpch.q5 _,
    "q_window" -> Tpch.qWindow _,
    "q_sessionize" -> Tpch.qSessionize _,
    "q_salt_agg" -> Tpch.qSaltAgg _,
    "q_rollup" -> Tpch.qRollup _,
    "q_cube" -> Tpch.qCube _,
    "q_pivot" -> Tpch.qPivot _,
    "q_stats_agg" -> Tpch.qStatsAgg _,
    "q_profile" -> Tpch.qProfile _,
    "q_asof_join" -> AsofJoin.qAsof _,
    "q_attribution" -> AsofJoin.qAttribution _,
    "q_resample" -> TimeSeries.qResample _,
    "q_resample_interp" -> TimeSeries.qResampleInterp _,
    "q_ewma" -> TimeSeries.qEwma _,
    "q_anomaly" -> TimeSeries.qAnomaly _,
    "q_funnel" -> Behavior.qFunnel _,
    "q_cohort" -> Behavior.qCohort _,
    "q_pagerank" -> Graph.qPagerank _,
    "q_cooccur" -> Graph.qCooccur _,
    "q_decay_count" -> TimeSeries.qDecayCount _,
    "q_trending" -> TimeSeries.qTrending _,
    "q_markov" -> Behavior.qMarkov _,
    "q_paths" -> Behavior.qPaths _,
    "ss_stream_topk" -> StreamSum.streamTopkPerSubj _,
    "ss_stream_paths" -> StreamSum.streamPaths _,
    "ss_stream_changepoint" -> StreamSum.streamChangepoint _,
    "rfm_store" -> graft.pipeline.SignatureStore.gatedRfm _,
    "q_seasonality" -> TimeSeries.qSeasonality _,
    "q_changepoint" -> TimeSeries.qChangepoint _,
    "q_histogram" -> Tpch.qHistogram _,
    "q_rfm" -> graft.analytics.Segmentation.qRfm _,
    "q_skyline" -> graft.analytics.Segmentation.qSkyline _,
    "q_grouping_sets" -> Tpch.qGroupingSets _,
    "pipe_token_budget" -> graft.pipeline.CorpusOps.tokenBudgetPack _,
    "ss_stream_markov" -> graft.streaming.FeatureStream.streamMarkov _,
    "markov_store" -> graft.pipeline.SignatureStore.gatedMarkov _,
    "ss_stream_decay" -> StreamSum.streamDecayCount _,
    "decay_store" -> graft.pipeline.SignatureStore.gatedDecay _,
    "graph_store" -> graft.pipeline.SignatureStore.gatedGraph _,
    "q_corr" -> Tpch.qCorr _,
    "q_range_join" -> RangeJoin.apply _,
    "q_hll_distinct" -> Sketches.qHllDistinct _,
    "q_kmv_jaccard" -> Sketches.qKmvJaccard _,
    "q_hll_sliding" -> Sketches.qHllSliding _,
    "q_kmv_retention" -> Sketches.qKmvRetention _,
    "q_cms_sliding" -> Sketches.qCmsSliding _,
    "q_cms_join_card" -> Sketches.qCmsJoinCard _,
    "q_cms_f2" -> Sketches.qCmsF2 _,
    "q_qtile_sliding" -> Sketches.qQtileSliding _,
    "q_cms_topk" -> Sketches.qCmsTopk _,
    "q_qtile_sketch" -> Sketches.qQtileSketch _,
    "q_quantile_exact" -> Sketches.qQuantileExact _,
    "ss_stream_rfm" -> StreamSum.streamRfm _,
    // production (sketch-only) faces: identical sketch state +
    // estimator, no exact adjunct in the plan - the deployment path
    // the bench measures
    "q_hll_distinct_prod" -> Sketches.qHllDistinctProd _,
    "q_hll_sliding_prod" -> Sketches.qHllSlidingProd _,
    "q_cms_topk_prod" -> Sketches.qCmsTopkProd _,
    "q_cms_sliding_prod" -> Sketches.qCmsSlidingProd _,
    "q_cms_join_card_prod" -> Sketches.qCmsJoinCardProd _,
    "q_cms_f2_prod" -> Sketches.qCmsF2Prod _,
    "q_kmv_jaccard_prod" -> Sketches.qKmvJaccardProd _,
    "q_kmv_retention_prod" -> Sketches.qKmvRetentionProd _,
    "txt_pii_scrub" -> TextAnalysis.piiScrub _,
    "txt_sample" -> ((s, d) => TextAnalysis.sample(s, d)),
    "txt_bpe_learn" -> TextAnalysis.bpeLearn _,
    // ---- dedup ----
    "dd_exact" -> Dedup.exact _,
    "dd_dup_spans" -> Dedup.dupSpans _,
    "dd_minhash_lsh" -> Dedup.minhashLsh _,
    "dd_ngram_jaccard" -> Dedup.ngramJaccard _,
    "dd_jaccard_prefix" -> Dedup.jaccardPrefix _,
    "dd_containment" -> Dedup.containment _,
    "dd_simhash" -> Dedup.simhashPairs _,
    "dd_clusters" -> Dedup.dupClusters _,
    // incremental-store faces: a fresh store catches up with the corpus
    // arriving as two appends, then must answer exactly like the
    // one-shot batch relation (shared oracle)
    "dd_store_candidates" -> graft.pipeline.SignatureStore.gatedCandidates _,
    "dd_store_jaccard_prefix" ->
      graft.pipeline.SignatureStore.gatedJaccardPrefix _,
    "dd_store_containment" ->
      graft.pipeline.SignatureStore.gatedContainment _,
    "dd_store_spans" -> graft.pipeline.SignatureStore.gatedDupSpans _,
    "lm_store_quality" -> graft.pipeline.SignatureStore.gatedQualityGate _,
    "lm_store_source_cap" -> graft.pipeline.SignatureStore.gatedSourceCap _,
    "session_store" -> graft.pipeline.SignatureStore.gatedSessions _,
    "cohort_store" -> graft.pipeline.SignatureStore.gatedCohort _,
    "lm2_store_bigram" -> graft.pipeline.SignatureStore.gatedBigramNll _,
    "layout_store" -> graft.pipeline.SignatureStore.gatedLayout _,
    "cms_store_topk" -> graft.pipeline.SignatureStore.gatedCmsTopk _,
    "kmv_store_jaccard" -> graft.pipeline.SignatureStore.gatedKmvJaccard _,
    "hll_store_distinct" -> graft.pipeline.SignatureStore.gatedHllDistinct _,
    "qtile_store" -> graft.pipeline.SignatureStore.gatedQtileSketch _,
    "ann_store_candidates" ->
      graft.pipeline.SignatureStore.gatedAnnCandidates _,
    "dd_embed_cosine" -> Similarity.embedCosinePairs _,
    "dd_semantic" -> Similarity.ddSemantic _,
    "dd_semantic_clusters" -> Similarity.ddSemanticClusters _,
    // ---- similarity search ----
    "ann_topk_brute" -> Similarity.annTopKBrute _,
    "ann_topk_quant" -> Similarity.annTopKQuant _,
    "ann_lsh_bucketed" -> Similarity.annLshBucketed _,
    "ann_ivf" -> Similarity.annIvf _,
    "ann_recall_eval" -> Similarity.annRecallEval _,
    "ann_ivf_kpp" -> Similarity.annIvfKpp _,
    "ann_ivf_adaptive" -> Similarity.annIvfAdaptive _,
    "ann_ivf_quant" -> Similarity.annIvfQuant _,
    "ann_ivf_pq" -> Similarity.annIvfPq _,
    "ann_knn_join" -> Similarity.annKnnJoin _,
    // ---- text analysis ----
    "txt_stats" -> TextAnalysis.stats _,
    "txt_langid" -> TextAnalysis.langid _,
    "txt_langid_eval" -> TextAnalysis.langidEval _,
    "txt_tokens" -> TextAnalysis.tokens _,
    "txt_fingerprint" -> TextAnalysis.fingerprint _,
    "txt_unigram_nll" -> TextAnalysis.unigramNll _,
    "txt_entropy" -> TextAnalysis.entropy _,
    "txt_hashfeat" -> TextAnalysis.hashfeat _,
    "txt_zipf" -> TextAnalysis.zipf _,
    "txt_tfidf" -> TextAnalysis.tfidf _,
    "txt_bigram_nll" -> TextAnalysis.bigramNll _,
    "txt_repetition" -> TextAnalysis.repetition _,
    // ---- multimodal plumbing ----
    "mm_binary_stats" -> Multimodal.binaryStats _,
    "mm_frame_sample" -> Multimodal.frameSample _,
    "mm_decode_batched" -> Multimodal.decodeBatched _,
    "mm_bmp_decode" -> Multimodal.bmpDecodeE2e _,
    "mm_wav_decode" -> Multimodal.wavDecodeE2e _,
    "mm_png_decode" -> Multimodal.pngDecodeE2e _,
    "mm_jpeg_decode" -> graft.pipeline.Jpeg.jpegDecodeE2e _,
    "mm_audio_features" -> Multimodal.audioFeatures _,
    "tfidf_store" -> graft.pipeline.SignatureStore.gatedTfidf _,
    // ---- corpus-level training-data ops ----
    "txt_vocab" -> graft.pipeline.CorpusOps.vocab _,
    // fixed shard count here so Spark and the generated oracle SQL
    // bucket identically; production callers omit it and get a
    // parallelism-scaled default
    "pipe_shuffle" -> ((s, d) => graft.pipeline.CorpusOps
      .shuffle(s, d, graft.pipeline.CorpusOps.oracleShards)),
    "pipe_pack" -> ((s, d) => graft.pipeline.CorpusOps
      .pack(s, d, graft.pipeline.CorpusOps.oracleShards)),
    "pipe_decontaminate" -> graft.pipeline.CorpusOps.decontaminate _,
    "pipe_decont_bloom" -> graft.pipeline.CorpusOps.decontaminateBloom _,
    "pipe_mix" -> graft.pipeline.CorpusOps.mix _,
    "pipe_source_cap" -> graft.pipeline.CorpusOps.sourceCap _,
    "pipe_split" -> graft.pipeline.CorpusOps.split _,
    "pipe_sample_weighted" -> graft.pipeline.CorpusOps.sampleWeighted _,
    "pipe_layout_zorder" -> graft.pipeline.Layout.zorder _,
    "txt_phrase_merge" -> TextAnalysis.phraseMerge _,
    "pipe_dedup_apply" -> Dedup.dedupApply _,
    "pipe_span_scrub" -> Dedup.spanScrub _,
    "pipe_quality_gate" -> ((s, d) => graft.pipeline.QualityGate(s, d)),
    "pipe_quality_prune" -> graft.pipeline.QualityGate.prune _,
    // ---- composed cleaning pipeline ----
    "pipe_corpus_clean" -> ((s, d) => CorpusClean(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "ss_extract" -> Sql.ssExtract,
    "ss_transform" -> Sql.ssTransform,
    "ss_cache_assoc" -> Sql.ssCacheAssoc,
    "ss_cache_lastn" -> Sql.ssCacheLastn,
    "ss_cache_count" -> Sql.ssCacheCount,
    "ss_cache_keycount" -> Sql.ssCacheKeycount,
    "ss_undo_assoc" -> Sql.ssUndoAssoc,
    "ss_undo_count" -> Sql.ssUndoCount,
    // the streaming retraction faces maintain the same state the batch
    // formulations compute, so one oracle checks both faces of each
    "ss_stream_undo_count" -> Sql.ssUndoCount,
    "ss_stream_undo_assoc" -> Sql.ssUndoAssoc,
    "ss_stream_keycount" -> Sql.ssCacheKeycount,
    "ss_stream_undo_lastn" -> Sql.ssUndoLastn(graft.core.Config.lastNSize),
    "ss_undo_lastn" -> Sql.ssUndoLastn(graft.core.Config.lastNSize),
    "ss_q_getcount" -> Sql.ssQGetcount(1L, "buy", 3L),
    "ss_q_actions_for_subj" -> Sql.ssQActionsForSubj,
    "ss_q_counts_for_subj_action" -> Sql.ssQCountsForSubjAction(Seq("buy", "err")),
    "ss_q_sumcounts" -> Sql.ssQSumcounts(Seq("buy")),
    "ss_q_tuples_sorted" -> Sql.ssQTuplesSorted,
    "ss_q_sort_variants" -> Sql.ssQSortVariants,
    "ss_q_topk_per_subj" -> Sql.ssQTopkPerSubj(3),
    "ss_q_topk_custom" -> Sql.ssQTopkPerSubj(3),
    "ss_q_topk_dense" -> Sql.ssQTopkDense(2),
    "ss_metrics" -> Sql.ssMetrics,
    "ss_encode_output" -> Sql.ssEncodeOutput,
    "ss_pipeline_e2e" -> Sql.ssPipelineE2e,
    "ss_stream_count" -> Sql.ssCacheCount,
    // the update-mode SnapshotCacheSink publish faces share the batch
    // cache oracles: published snapshot == the one-shot batch state
    "ss_stream_count_sink" -> Sql.ssCacheCount,
    "ss_stream_lastn_sink" -> Sql.ssCacheLastn,
    "ss_stream_lastn" -> Sql.ssCacheLastn,
    "ss_stream_windowed" -> Sql.ssStreamWindowed,
    "ss_stream_assoc" -> Sql.ssCacheAssoc,
    "ss_stream_sessions" -> Sql.ssStreamSessions,
    "ss_stream_dedup" -> Sql.ssStreamDedup,
    "ss_stream_join" -> Sql.ssStreamJoin,
    "ss_stream_lastn_tws" -> Sql.ssCacheLastn,
    "ss_stream_lsh_cand" -> Dedup.minhashLshSql,
    "ss_stream_containment" -> Dedup.containmentSql,
    "ss_stream_ann_cand" -> Similarity.annCandidatesSql,
    "ss_stream_semantic" -> Similarity.ddSemanticSql,
    "ss_stream_asof" -> graft.analytics.AsofJoin.qAsofSql,
    "ss_stream_attribution" -> graft.analytics.AsofJoin.qAttributionSql,
    "ss_stream_cohort" -> Behavior.qCohortSql,
    "ss_stream_mix" -> graft.pipeline.CorpusOps.mixSql,
    "ss_stream_bigram" -> TextAnalysis.bigramNllSql,
    "ss_stream_resample" -> TimeSeries.qResampleSql,
    "ss_stream_resample_interp" -> TimeSeries.qResampleInterpSql,
    "ss_stream_corr" -> Tpch.qCorrSql,
    "ss_stream_decont" -> graft.pipeline.CorpusOps.decontaminateSql,
    "q4_semijoin" -> Tpch.q4SemiJoinSql,
    "q1_agg" -> Tpch.q1Sql,
    "q3_join_agg" -> Tpch.q3Sql,
    "q5_multijoin" -> Tpch.q5Sql,
    "q_window" -> Tpch.qWindowSql,
    "q_sessionize" -> Tpch.qSessionizeSql,
    "q_salt_agg" -> Tpch.qSaltAggSql,
    "q_rollup" -> Tpch.qRollupSql,
    "q_cube" -> Tpch.qCubeSql,
    "q_pivot" -> Tpch.qPivotSql,
    "q_stats_agg" -> Tpch.qStatsAggSql,
    "q_profile" -> Tpch.qProfileSql,
    "q_asof_join" -> AsofJoin.qAsofSql,
    "q_attribution" -> AsofJoin.qAttributionSql,
    "q_resample" -> TimeSeries.qResampleSql,
    "q_resample_interp" -> TimeSeries.qResampleInterpSql,
    "q_ewma" -> TimeSeries.qEwmaSql,
    "q_anomaly" -> TimeSeries.qAnomalySql,
    "q_funnel" -> Behavior.qFunnelSql,
    "q_cohort" -> Behavior.qCohortSql,
    "q_pagerank" -> Graph.qPagerankSql,
    "q_cooccur" -> Graph.qCooccurSql,
    "q_decay_count" -> TimeSeries.qDecayCountSql,
    "q_trending" -> TimeSeries.qTrendingSql,
    "q_markov" -> Behavior.qMarkovSql,
    "q_paths" -> Behavior.qPathsSql,
    "ss_stream_topk" -> Sql.ssQTopkPerSubj(3),
    "ss_stream_paths" -> Behavior.qPathsSql,
    "ss_stream_changepoint" -> TimeSeries.qChangepointSql,
    "rfm_store" -> graft.analytics.Segmentation.qRfmSql,
    "q_seasonality" -> TimeSeries.qSeasonalitySql,
    "q_changepoint" -> TimeSeries.qChangepointSql,
    "q_histogram" -> Tpch.qHistogramSql,
    "q_rfm" -> graft.analytics.Segmentation.qRfmSql,
    "q_skyline" -> graft.analytics.Segmentation.qSkylineSql,
    "q_grouping_sets" -> Tpch.qGroupingSetsSql,
    "pipe_token_budget" -> graft.pipeline.CorpusOps.tokenBudgetSql,
    "ss_stream_markov" -> Behavior.qMarkovSql,
    "markov_store" -> Behavior.qMarkovSql,
    "ss_stream_decay" -> TimeSeries.qDecayCountSql,
    "decay_store" -> TimeSeries.qDecayCountSql,
    "graph_store" -> Graph.qPagerankSql,
    // streaming faces of the per-user feature operators share the
    // batch window formulations' oracles (same total event order)
    "ss_stream_funnel" -> Behavior.qFunnelSql,
    "ss_stream_ewma" -> TimeSeries.qEwmaSql,
    "ss_stream_anomaly" -> TimeSeries.qAnomalySql,
    "ss_stream_cooccur" -> Graph.qCooccurSql,
    "q_corr" -> Tpch.qCorrSql,
    "q_range_join" -> RangeJoin.sql,
    "q_hll_distinct" -> Sketches.qHllDistinctSql,
    "q_kmv_jaccard" -> Sketches.qKmvJaccardSql,
    "q_hll_sliding" -> Sketches.qHllSlidingSql,
    "q_kmv_retention" -> Sketches.qKmvRetentionSql,
    // streaming retention face shares the batch oracle
    "ss_stream_retention" -> Sketches.qKmvRetentionSql,
    "q_cms_sliding" -> Sketches.qCmsSlidingSql,
    "q_cms_join_card" -> Sketches.qCmsJoinCardSql,
    "q_cms_f2" -> Sketches.qCmsF2Sql,
    "q_qtile_sliding" -> Sketches.qQtileSlidingSql,
    // streaming KMV face shares the batch sketch oracle
    "ss_stream_kmv" -> Sketches.qKmvJaccardSql,
    "q_cms_topk" -> Sketches.qCmsTopkSql,
    "q_hll_distinct_prod" -> Sketches.qHllDistinctProdSql,
    "q_hll_sliding_prod" -> Sketches.qHllSlidingProdSql,
    "q_cms_topk_prod" -> Sketches.qCmsTopkProdSql,
    "q_cms_sliding_prod" -> Sketches.qCmsSlidingProdSql,
    "q_cms_join_card_prod" -> Sketches.qCmsJoinCardProdSql,
    "q_cms_f2_prod" -> Sketches.qCmsF2ProdSql,
    "q_kmv_jaccard_prod" -> Sketches.qKmvJaccardProdSql,
    "q_kmv_retention_prod" -> Sketches.qKmvRetentionProdSql,
    "ss_stream_range_join" -> RangeJoin.sql,
    "ss_stream_hll" -> Sketches.qHllDistinctSql,
    // the streaming counter matrix is the same state the batch sketch
    // aggregates, so one oracle checks both faces
    "ss_stream_cms" -> Sketches.qCmsTopkSql,
    "q_qtile_sketch" -> Sketches.qQtileSketchSql,
    "q_quantile_exact" -> Sketches.qQuantileExactSql,
    "ss_stream_rfm" -> graft.analytics.Segmentation.qRfmSql,
    "ss_stream_qtile" -> Sketches.qQtileSketchSql,
    "ss_stream_span_scrub" -> Dedup.spanScrubSql,
    "ann_ivf_quant" -> Similarity.annIvfQuantSql,
    "ann_ivf_pq" -> Similarity.annIvfPqSql,
    "txt_pii_scrub" -> TextAnalysis.piiScrubSql,
    "txt_sample" -> TextAnalysis.sampleSql(),
    "dd_exact" -> Dedup.exactSql,
    "dd_dup_spans" -> Dedup.dupSpansSql,
    "dd_minhash_lsh" -> Dedup.minhashLshSql,
    // the incremental stores maintain the same candidate relations the
    // batch queries compute, so each shares its batch oracle
    "dd_store_candidates" -> Dedup.minhashLshSql,
    "dd_store_jaccard_prefix" -> Dedup.jaccardPrefixSql,
    "dd_store_containment" -> Dedup.containmentSql,
    "dd_store_spans" -> Dedup.dupSpansSql,
    "lm_store_quality" -> graft.pipeline.QualityGate.sql,
    "lm_store_source_cap" -> graft.pipeline.CorpusOps.sourceCapSql,
    "session_store" -> Tpch.qSessionizeSql,
    "cohort_store" -> Behavior.qCohortSql,
    "lm2_store_bigram" -> TextAnalysis.bigramNllSql,
    "layout_store" -> graft.pipeline.Layout.zorderSql,
    // sketch stores share their batch faces' oracles
    "cms_store_topk" -> Sketches.qCmsTopkSql,
    "kmv_store_jaccard" -> Sketches.qKmvJaccardSql,
    "hll_store_distinct" -> Sketches.qHllDistinctSql,
    "qtile_store" -> Sketches.qQtileSketchSql,
    "ann_store_candidates" -> Similarity.annCandidatesSql,
    "dd_ngram_jaccard" -> Dedup.ngramJaccardSql,
    "dd_jaccard_prefix" -> Dedup.jaccardPrefixSql,
    "dd_containment" -> Dedup.containmentSql,
    "dd_simhash" -> Dedup.simhashPairsSql,
    "dd_clusters" -> Dedup.dupClustersSql,
    "dd_embed_cosine" -> Similarity.embedCosinePairsSql,
    "dd_semantic" -> Similarity.ddSemanticSql,
    "dd_semantic_clusters" -> Similarity.ddSemanticClustersSql,
    "ann_topk_brute" -> Similarity.annTopKBruteSql,
    "ann_topk_quant" -> Similarity.annTopKQuantSql,
    "ann_lsh_bucketed" -> Similarity.annLshBucketedSql,
    "ann_ivf" -> Similarity.annIvfSql,
    "ann_recall_eval" -> Similarity.annRecallEvalSql,
    "ann_ivf_kpp" -> Similarity.annIvfKppSql,
    "ann_ivf_adaptive" -> Similarity.annIvfAdaptiveSql,
    "ann_knn_join" -> Similarity.annKnnJoinSql,
    "txt_stats" -> TextAnalysis.statsSql,
    "txt_langid" -> TextAnalysis.langidSql,
    "txt_langid_eval" -> TextAnalysis.langidEvalSql,
    "txt_tokens" -> TextAnalysis.tokensSql,
    "txt_fingerprint" -> TextAnalysis.fingerprintSql,
    "txt_unigram_nll" -> TextAnalysis.unigramNllSql,
    "txt_entropy" -> TextAnalysis.entropySql,
    "txt_hashfeat" -> TextAnalysis.hashfeatSql,
    "txt_zipf" -> TextAnalysis.zipfSql,
    "ss_stream_entropy" -> TextAnalysis.entropySql,
    "ss_stream_zipf" -> TextAnalysis.zipfSql,
    "txt_tfidf" -> TextAnalysis.tfidfSql,
    "txt_bigram_nll" -> TextAnalysis.bigramNllSql,
    "txt_repetition" -> TextAnalysis.repetitionSql,
    "mm_binary_stats" -> Multimodal.binaryStatsSql,
    "mm_frame_sample" -> Multimodal.frameSampleSql,
    "mm_decode_batched" -> Multimodal.decodeBatchedSql,
    "mm_bmp_decode" -> Multimodal.bmpDecodeE2eSql,
    "mm_wav_decode" -> Multimodal.wavDecodeE2eSql,
    "mm_png_decode" -> Multimodal.pngDecodeE2eSql,
    "mm_jpeg_decode" -> graft.pipeline.Jpeg.jpegDecodeE2eSql,
    "mm_audio_features" -> Multimodal.audioFeaturesSql,
    "tfidf_store" -> TextAnalysis.tfidfSql,
    "txt_vocab" -> graft.pipeline.CorpusOps.vocabSql,
    "pipe_shuffle" -> graft.pipeline.CorpusOps.shuffleSql(),
    "pipe_mix" -> graft.pipeline.CorpusOps.mixSql,
    "pipe_source_cap" -> graft.pipeline.CorpusOps.sourceCapSql,
    "pipe_split" -> graft.pipeline.CorpusOps.splitSql,
    "pipe_sample_weighted" -> graft.pipeline.CorpusOps.sampleWeightedSql,
    // streaming admission face shares the batch sampling oracle
    "ss_stream_wsample" -> graft.pipeline.CorpusOps.sampleWeightedSql,
    "pipe_layout_zorder" -> graft.pipeline.Layout.zorderSql,
    "txt_phrase_merge" -> TextAnalysis.phraseMergeSql,
    "txt_bpe_learn" -> TextAnalysis.bpeLearnSql,
    "pipe_pack" -> graft.pipeline.CorpusOps.packSql(),
    "pipe_decontaminate" -> graft.pipeline.CorpusOps.decontaminateSql,
    "pipe_decont_bloom" -> graft.pipeline.CorpusOps.decontaminateSql,
    "pipe_dedup_apply" -> Dedup.dedupApplySql,
    "pipe_span_scrub" -> Dedup.spanScrubSql,
    "pipe_quality_gate" -> graft.pipeline.QualityGate.sql,
    "pipe_quality_prune" -> graft.pipeline.QualityGate.pruneSql,
    // streaming admission face shares the prune oracle
    "ss_stream_qprune" -> graft.pipeline.QualityGate.pruneSql,
    "ss_stream_quality" -> graft.pipeline.QualityGate.sql,
    "pipe_corpus_clean" -> CorpusClean.sql,
  )
}
