package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Central query registry: every implemented operator from SURVEY.md §2
  * gets a named query over the driver testdata plus (where ANSI-SQL-
  * expressible) a DuckDB oracle. Column names and row order match the
  * oracle exactly (aliased on both sides; every oracle-compared query ends
  * in a total-order sort).
  */
object Registry {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q01_watermark_last_id" -> ((s, d) => Incremental.watermarkLastId(s, d)),
    "q02_batch_counter" -> ((s, d) => Incremental.batchCounter(s, d)),
    "q03_incremental_batch" -> ((s, d) => Incremental.incrementalBatch(s, d)),
    "q04_insert_update_split" -> ((s, d) => Incremental.insertUpdateSplit(s, d)),
    "q05_semi_join" -> ((s, d) => Relational.semiJoin(s, d)),
    "q06_anti_join" -> ((s, d) => Relational.antiJoin(s, d)),
    "q07_enrich_broadcast" -> ((s, d) => Relational.enrichBroadcast(s, d)),
    "q08_delete_complement" -> ((s, d) => Incremental.deleteComplement(s, d)),
    "q09_topk" -> ((s, d) => Relational.topK(s, d)),
    "q10_key_registry" -> ((s, d) => Incremental.keyRegistryUnion(s, d)),
    "q11_first_per_key" -> ((s, d) => Incremental.firstPerKey(s, d)),
    "q12_window_analytics" -> ((s, d) => Relational.windowAnalytics(s, d)),
    "q13_rollup_orders" -> ((s, d) => Relational.rollupOrders(s, d)),
    "q14_ordered_fold_distinct" -> ((s, d) => Relational.orderedFoldDistinct(s, d)),
    "q15_set_ops" -> ((s, d) => Relational.setOps(s, d)),
    "q16_pricing_summary" -> ((s, d) => Analytics.pricingSummary(s, d)),
    "q17_shipping_priority" -> ((s, d) => Analytics.shippingPriority(s, d)),
    "q18_regional_revenue" -> ((s, d) => Analytics.regionalRevenue(s, d)),
    "q19_salted_agg" -> ((s, d) => Analytics.saltedAgg(s, d)),
    "q20_sessionize" -> ((s, d) => Sessionize.sessions(s, d)),
    "q21_asof_join" -> ((s, d) => AsOf.eventsAsOfOrders(s, d)),
    "q22_extract_multivalue" -> ((s, d) => TextOps.extractMultiValue(s, d)),
    "q23_merge_multivalue" -> ((s, d) => TextOps.mergeMultiValue(s, d)),
    "q24_doc_quality" -> ((s, d) => TextOps.docQuality(s, d)),
    "q25_lang_id" -> ((s, d) => TextOps.langId(s, d)),
    "q26_fingerprint_dedup" -> ((s, d) => TextOps.fingerprintDedup(s, d)),
    "q27_corpus_selection" -> ((s, d) => TextOps.corpusSelection(s, d)),
    "q28_exact_dedup" -> ((s, d) => Dedup.exactDedup(s, d)),
    "q29_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "q30_embedding_stats" -> ((s, d) => Similarity.embeddingStats(s, d)),
    // rows-only checks (hash/FP-dependent results are engine-specific,
    // so no exact ANSI oracle exists for these by construction)
    "q31_minhash_dedup" -> ((s, d) => Dedup.minhashCandidates(s, d)),
    "q32_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "q33_embedding_neardup" -> ((s, d) => Dedup.embeddingNearDup(s, d)),
    "q34_ann_bruteforce" -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "q35_ann_lsh" -> ((s, d) => Similarity.lshTopK(s, d)),
    "q36_streaming_window" -> ((s, d) => graft.streaming.StreamingOps.hourlyWindowCounts(s, d)),
    "q37_stateful_totals" -> ((s, d) => graft.streaming.StreamingOps.statefulUserTotals(s, d)),
    "q38_binary_meta" -> ((s, d) => Multimodal.binaryMeta(s, d)),
    "q39_frame_features" -> ((s, d) => Multimodal.frameFeatures(s, d)),
    "q40_upsert" -> ((s, d) => Upsert.conflictIgnoreUpsert(s, d)),
    "q41_update_write" -> ((s, d) => Upsert.columnReplacingUpdate(s, d)),
    "q42_replay" -> ((s, d) => Upsert.replayBeyondWatermark(s, d)),
    "q43_batch_log" -> ((s, d) => Upsert.batchLogFinish(s, d)),
    "q44_state_rebuild" -> ((s, d) => Upsert.stateRebuild(s, d)),
    "q45_cube" -> ((s, d) => Relational.cubeEvents(s, d)),
    "q46_distinct_exact" -> ((s, d) => Relational.distinctCounts(s, d)),
    "q47_approx_distinct" -> ((s, d) => Relational.approxDistinctCounts(s, d)),
    "q48_json_extract" -> ((s, d) => Incremental.jsonExtract(s, d)),
    "q49_keyset_page" -> ((s, d) => Incremental.keysetPage(s, d)),
    "q50_custom_source" -> ((s, d) => SqlSurface.customFeedScan(s, d)),
    "q51_slot_fold_agg" -> ((s, d) => SqlSurface.slotFoldAgg(s, d)),
    "q52_grouping_sets" -> ((s, d) => SqlSurface.groupingSets(s, d)),
    "q53_range_frame" -> ((s, d) => SqlSurface.rangeFrame(s, d)),
    "q54_mixed_case_normalize" -> ((s, d) => SqlSurface.mixedCaseNormalize(s, d)),
    "q55_pivot" -> ((s, d) => Relational.pivotEvents(s, d)),
    "q56_explode_tokens" -> ((s, d) => Relational.explodeTokens(s, d)),
    "q57_percentiles" -> ((s, d) => Relational.percentiles(s, d)),
    "q58_exact_stats" -> ((s, d) => Relational.exactStats(s, d)),
    "q59_salted_join" -> ((s, d) => Relational.saltedJoin(s, d)),
    "q60_topk_per_group" -> ((s, d) => Relational.topKPerGroup(s, d)),
    "q61_ranking_functions" -> ((s, d) => Relational.rankingFunctions(s, d)),
    // rows-only: FP-ranking ANN has no exact cross-engine oracle
    "q62_ann_ivf" -> ((s, d) => Similarity.ivfTopK(s, d)),
    "q63_edit_distance" -> ((s, d) => TextOps.editDistancePairs(s, d)),
    "q64_date_arithmetic" -> ((s, d) => TextOps.dateArithmetic(s, d)),
    "q65_jdbc_roundtrip" -> ((s, d) => graft.sources.Jdbc.roundTripSummary(s, d)),
    "q66_dup_clusters" -> ((s, d) => Dedup.dupClusters(s, d)),
    "q67_tfidf" -> ((s, d) => TextOps.tfidfTopTerms(s, d)),
    "q68_stratified_sample" -> ((s, d) => TextOps.stratifiedSample(s, d)),
    "q69_doc_chunks" -> ((s, d) => TextOps.chunkDocuments(s, d)),
    "q70_embedding_quantize" -> ((s, d) => Similarity.quantizeEmbeddings(s, d)),
    "q71_scd2_history" -> ((s, d) => Upsert.scd2History(s, d)),
    "q72_range_join" -> ((s, d) => Relational.rangeJoin(s, d)),
    "q73_weighted_mix" -> ((s, d) => TextOps.weightedMix(s, d)),
    "q74_stream_stream_join" -> ((s, d) =>
      graft.streaming.StreamingOps.streamStreamRangeJoin(s, d)),
    // r12 advice #6 fold: q102's md5 60-bit signatures, 4×15-bit
    // pigeonhole banding, exact Hamming verify — fully oracled. The
    // 64-bit xxhash kernel form (Dedup.simhashNearDup) stays as the
    // bit_count/xor production path, Wave2Spec-pinned vs relational
    "q75_simhash_neardup" -> ((s, d) => Dedup.simhashNearDupOracled(s, d)),
    "q76_stream_static_join" -> ((s, d) =>
      graft.streaming.StreamingOps.streamStaticEnrich(s, d)),
    "q77_streaming_dedup" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingDedup(s, d)),
    "q78_unpivot" -> ((s, d) => Relational.unpivotUserMetrics(s, d)),
    "q79_unigram_lm_score" -> ((s, d) => TextOps.unigramLmScore(s, d)),
    "q80_decontamination" -> ((s, d) => TextOps.decontamination(s, d)),
    "q81_approx_percentiles" -> ((s, d) => Relational.approxPercentiles(s, d)),
    "q82_pii_redaction" -> ((s, d) => TextOps.piiRedaction(s, d)),
    "q83_length_buckets" -> ((s, d) => TextOps.lengthBuckets(s, d)),
    "q84_sequence_packing" -> ((s, d) => TextOps.sequencePacking(s, d)),
    "q85_bucketed_join" -> ((s, d) => {
      Bucketed.writeBucketed(s, d); Bucketed.coLocatedOrderRevenue(s)
    }),
    // r12 advice #6 fold: the corpus/batch incremental split on the
    // md5 chain — the incremental candidate discipline itself is
    // hash-checked. incrementalMinhash (xxhash64 hot joins) stays as
    // the production form, Wave2Spec-pinned vs the persisted artifact
    "q86_incremental_dedup" -> ((s, d) =>
      Dedup.incrementalMinhashOracled(s, d)),
    "q87_quarantine_routing" -> ((s, d) => Incremental.quarantineRouting(s, d)),
    "q88_winnow_neardup" -> ((s, d) => Dedup.winnowNearDup(s, d)),
    "q89_stream_sessions" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingSessions(s, d)),
    "q90_user_activity_tws" -> ((s, d) =>
      graft.streaming.StreamingOps.userActivityTws(s, d)),
    "q91_cosine_neardup_exact" -> ((s, d) =>
      Similarity.cosineNearDupExact(s, d)),
    "q92_repetition_signals" -> ((s, d) => TextOps.repetitionSignals(s, d)),
    "q93_response_projection" -> ((s, d) =>
      Pipelines.responseProjection(s, d)),
    "q94_span_dedup" -> ((s, d) => Dedup.spanDedup(s, d)),
    "q95_minhash_oracled" -> ((s, d) => Dedup.minhashOracled(s, d)),
    "q96_ngram_novelty" -> ((s, d) => TextOps.ngramNovelty(s, d)),
    "q97_semdedup" -> ((s, d) => Similarity.semDedup(s, d)),
    "q98_bloom_pruned_join" -> ((s, d) => BloomPrune.bloomPrunedRevenue(s, d)),
    // rows-only: PQ codebooks are driver-trained Lloyd output — not
    // SQL-expressible; recall/exactness invariants live in PqSpec
    "q99_pq_ann" -> ((s, d) => Similarity.pqTopK(s, d)),
    // rows-only: same driver-trained models as q62/q99; PqSpec proves
    // nprobe = nlist reproduces the PQ-flat ranking exactly
    "q100_ivfpq_ann" -> ((s, d) => Similarity.ivfPqTopK(s, d)),
    "q101_shard_manifest" -> ((s, d) => TextOps.shardManifest(s, d)),
    "q102_simhash_oracled" -> ((s, d) => Dedup.simhashOracled(s, d)),
    "q103_format_roundtrip" -> ((s, d) =>
      graft.sources.Formats.formatRoundtrip(s, d)),
    "q104_label_centroids" -> ((s, d) => Similarity.labelCentroids(s, d)),
    "q105_centroid_classify" -> ((s, d) =>
      Similarity.centroidClassify(s, d)),
    "q106_gapfill" -> ((s, d) => Analytics.gapFillForwardFill(s, d)),
    // rows-only: the decode stage is the labeled codec stub; goldens
    // and pipeline invariants live in MultimodalSpec tests
    "q107_media_pipeline" -> ((s, d) => Multimodal.mediaPipeline(s, d)),
    // rows-only: bit-identical to q99 by construction (PqSpec asserts
    // full equality); the LUT path drops the join from the plan
    "q108_pq_lut_ann" -> ((s, d) => Similarity.pqTopKLut(s, d)),
    "q109_containment_dedup" -> ((s, d) => Dedup.containmentOracled(s, d)),
    "q110_token_budget" -> ((s, d) => TextOps.tokenBudgetSelection(s, d)),
    // r12 advice #6 fold: the TIGHT production banding (16 perms ×
    // 4 rows/band — spurious survival at jaccard⁴) on md5 arithmetic
    // with asymmetric containment verify. containmentCandidates
    // (xxhash64 + native sorted-intersect kernel) stays as the
    // hash-only-hot-join capacity path with its soundness spec
    "q111_containment_tight" -> ((s, d) =>
      Dedup.containmentTightOracled(s, d)),
    // r12 advice #6 fold: asymmetric containment on md5 winnow
    // fingerprint posting lists (q119's machinery) + md5 shingle-set
    // verify — fully oracled. containmentAsym (xxhash64 deque kernel)
    // stays as the production path; the embedded-short-in-long recall
    // test lives in DedupChainSpec
    "q112_containment_asym" -> ((s, d) =>
      Dedup.containmentAsymOracled(s, d)),
    // fully-oracled PQ twin: fixed md5-derived codebooks (no Lloyd) so
    // the PqEncode/PqAdc kernel arithmetic is hash-checked cross-engine
    "q113_pq_oracled" -> ((s, d) => Similarity.pqOracled(s, d)),
    // the APPLYING dedup: paragraph-level global first-occurrence keep
    // + byte-exact reassembly, hash-proven cross-engine
    "q114_paragraph_dedup" -> ((s, d) => Dedup.paragraphDedup(s, d)),
    // rows-only (xxhash64-seeded buckets, like q35): multi-probe LSH —
    // recall-vs-single-probe and never-beats-brute-force invariants in
    // Wave2Spec
    "q115_ann_multiprobe" -> ((s, d) => Similarity.lshMultiProbeTopK(s, d)),
    // r12 advice #6 fold: q145's md5 streaming band dedup in the
    // CAPPED-corpus regime (cap 2 — the quarantine FIRES on the
    // historical side, the streaming sibling of q241's capped batch
    // gate; batch/state sides keep the 64 no-op cap so the pair set
    // stays micro-batch-split-invariant). streamingBandDedup
    // (xxhash64) stays as the production form; StreamingSpec asserts
    // it equals the batch incremental path exactly
    "q116_streaming_band_dedup" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingBandDedupOracled(s, d,
        corpusCap = 2, opName = "band_dedup_md5_capped")),
    // snapshot audit: added/removed/changed/unchanged by content hash
    "q117_corpus_diff" -> ((s, d) => TextOps.corpusDiff(s, d)),
    // rows-only production twin of q97 (its oracle pins k=8): k scales
    // with the corpus so cluster-bounded pair work stays linear
    "q118_semdedup_scaled" -> ((s, d) => Similarity.semDedupScaled(s, d)),
    // oracled winnowing twin: md5 window-min fingerprints, the q88
    // posting-list pair shape hash-checked cross-engine
    "q119_winnow_oracled" -> ((s, d) => Dedup.winnowOracled(s, d)),
    // oracled IVF twin: fixed md5-nibble centroids, kernel assignment
    // + probe + in-cell ranking hash-checked cross-engine
    "q120_ivf_oracled" -> ((s, d) => Similarity.ivfOracled(s, d)),
    // oracled LSH twin: md5-nibble planes, sign-bucket + cosine
    // verification hash-checked cross-engine
    "q121_lsh_oracled" -> ((s, d) => Similarity.lshOracled(s, d)),
    // oracled media twin: whole-frame decode → sample → resize with
    // every intermediate dyadic-exact, so the pipeline arithmetic
    // hash-checks cross-engine (q107 keeps the ragged tail frame)
    "q122_media_oracled" -> ((s, d) => Multimodal.mediaPipelineOracled(s, d)),
    // frequency-threshold boilerplate removal: spans in >1 distinct
    // docs removed from ALL docs (C4-style), byte-exact reassembly
    "q123_boilerplate_removal" -> ((s, d) => Dedup.boilerplateRemoval(s, d)),
    // distributed Lloyd k-means: 2 full assign→update rounds + final
    // Euclidean assignment, exact via long fixed-point centroid sums
    "q124_kmeans" -> ((s, d) => Similarity.kmeansAssign(s, d)),
    // SemDeDup over the TRAINED k-means partition: q124's Lloyd
    // clustering feeding q97's greedy within-cluster prune
    "q125_semdedup_kmeans" -> ((s, d) => Similarity.semDedupKmeans(s, d)),
    // corpus vocabulary report: tf/df/coverage, top-k by tf — the
    // BPE-prep artifact and the df table behind stopword thresholds
    "q126_vocab_report" -> ((s, d) => TextOps.vocabReport(s, d)),
    // feature-hashing vectorizer (HashingTF shape): md5-nibble bucket
    // counts, entirely row-local — no vocabulary, no shuffle
    "q127_hashing_vectorizer" -> ((s, d) => TextOps.hashingVectorizer(s, d)),
    // streaming vocab maintenance: micro-batch tf/df merges into the
    // stored table; drained == batch vocab, oracle-checked
    "q128_streaming_vocab" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingVocab(s, d)),
    // bigram LM score: add-one smoothed mean log P(w2|w1) — flags
    // improbable word transitions unigram LMs cannot see
    "q129_bigram_lm_score" -> ((s, d) => TextOps.bigramLmScore(s, d)),
    // BM25 ranked retrieval: top-15 docs for a fixed term query,
    // row-local tf, broadcast df/stats, TakeOrderedAndProject top-k
    "q130_bm25_topk" -> ((s, d) => TextOps.bm25TopK(s, d)),
    // BPE tokenizer training: 3 merge rounds on the word-frequency
    // table + the segmentation they induce on the top-20 words
    "q131_bpe_merges" -> ((s, d) => TextOps.bpeMerges(s, d)),
    // Johnson–Lindenstrauss random projection: ±1 md5-derived matrix
    // over quantized vectors — exact integer arithmetic, row-local
    "q132_random_projection" -> ((s, d) => Similarity.randomProjection(s, d)),
    // PageRank power iteration in BIGINT fixed-point over the
    // customer↔supplier purchase graph — distributed rank vector
    "q133_pagerank" -> ((s, d) => Analytics.pageRank(s, d)),
    // tokenize the corpus with the q131-trained BPE: corpus words
    // joined to the vocab segmentation table (train→apply)
    "q134_bpe_tokenize" -> ((s, d) => TextOps.bpeTokenize(s, d)),
    // temperature mixing (α=0.5): sqrt-scaled language quotas +
    // deterministic hash-ranked selection within each language
    "q135_temperature_mix" -> ((s, d) => TextOps.temperatureMix(s, d)),
    // deterministic 80/10/10 hash split + exact-dup leakage flags
    // (val/test content hashes probed against the train side)
    "q136_dataset_split" -> ((s, d) => TextOps.datasetSplit(s, d)),
    // positional phrase search: query-term posting lists only, then
    // a (doc, pos+1) adjacency equi-join
    "q137_phrase_search" -> ((s, d) => TextOps.phraseSearch(s, d)),
    // ±2-window skip-gram PMI: row-local pair gen (self-zip_with),
    // integer-ranked top-k, single ln() per output row
    "q138_cooccurrence_pmi" -> ((s, d) => TextOps.cooccurrencePmi(s, d)),
    // per-source dataset card: volume + lang entropy (ordered fold)
    // + exact-dup ratio, one scan, two map-side aggs
    "q139_corpus_card" -> ((s, d) => TextOps.corpusCard(s, d)),
    // held-out perplexity: bigram LM trained on the q136 train split
    // only, scoring val/test — the leakage-free quality filter
    "q140_heldout_perplexity" -> ((s, d) => TextOps.heldoutPerplexity(s, d)),
    // curation funnel: per-stage doc/token survival (raw → exact
    // dedup → quality gate), three aggregate rows off one scan
    "q141_curation_funnel" -> ((s, d) => TextOps.curationFunnel(s, d)),
    // kNN leave-one-out eval: per-label 1-NN accuracy on the bounded
    // eval set, fixed-point neighbor rank
    "q142_knn_loo_eval" -> ((s, d) => Similarity.knnLooEval(s, d)),
    // daily event-rate anomaly: z vs own trailing 7-day window,
    // exact BIGINT window sums, one pinned double formula
    "q143_rate_anomaly" -> ((s, d) => Analytics.rateAnomaly(s, d)),
    // session conversion funnel: ordered view→click→purchase stages
    // anchored on exact min event ids
    "q144_session_funnel" -> ((s, d) => Sessionize.sessionFunnel(s, d)),
    // streaming twin of q95's md5 banding: the foreachBatch band-join
    // arithmetic is hash-checked cross-engine, not just batch-equal
    "q145_streaming_band_oracled" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingBandDedupOracled(s, d)),
    // q39's production shape: frame features row-local per doc (exact
    // integer byte-sums, serialized) — only exchange is the final sort
    "q146_frame_features_agg" -> ((s, d) =>
      Multimodal.frameFeaturesAgg(s, d)),
    // Efraimidis–Spirakis weighted sample with deterministic md5 draws
    "q147_weighted_sample" -> ((s, d) => TextOps.weightedSample(s, d)),
    // canonical-doc selection over the transitive closure of the q95
    // pair graph — CC cross-checked against a recursive-CTE oracle
    "q148_canonical_selection" -> ((s, d) => Dedup.canonicalSelection(s, d)),
    // streaming ANN-index maintenance: new vectors routed to the fixed
    // q120 md5-nibble coarse quantizer per micro-batch, oracled
    "q149_streaming_ivf_assign" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingIvfAssign(s, d)),
    // sketch-quality audit: signature-agreement estimate vs exact
    // Jaccard on every q95 candidate pair
    "q150_minhash_estimate" -> ((s, d) => Dedup.minhashEstimate(s, d)),
    // vector-space retrieval: full-norm tf-idf cosine, BM25's VSM twin
    "q151_tfidf_cosine_topk" -> ((s, d) => TextOps.tfidfCosineTopK(s, d)),
    // per-language fertility/compression of the trained q131 BPE
    "q152_tokenizer_fertility" -> ((s, d) =>
      TextOps.tokenizerFertility(s, d)),
    // n-gram contamination between the q136 held-out splits and train
    "q153_split_leakage_audit" -> ((s, d) =>
      TextOps.splitLeakageAudit(s, d)),
    // diversity-aware selection: greedy MMR over unit embeddings,
    // the whole trajectory oracled via unrolled CTE steps
    "q154_mmr_select" -> ((s, d) => Similarity.mmrSelect(s, d)),
    // per-source (domain) volume/dup-rate/lang-spread report
    "q155_source_report" -> ((s, d) => TextOps.sourceReport(s, d)),
    // CCNet-style head/middle/tail perplexity bucketing by rank terciles
    "q156_perplexity_buckets" -> ((s, d) =>
      TextOps.perplexityBuckets(s, d)),
    // streaming reservoir: per-batch A-ES scoring folded into a
    // persisted running top-k; drains to exactly the q147 answer
    "q157_streaming_weighted_sample" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingWeightedSample(s, d)),
    // per-source unigram KL drift vs the corpus mixture
    "q158_source_kl_drift" -> ((s, d) => TextOps.sourceKlDrift(s, d)),
    // trigram stupid-backoff LM: train-split model scores held-out docs
    "q159_trigram_backoff_score" -> ((s, d) =>
      TextOps.trigramBackoffScore(s, d)),
    // provenance view of near-duplication: q95 pairs by source pair
    "q160_source_dup_matrix" -> ((s, d) => Dedup.sourceDupMatrix(s, d)),
    // k furthest members of every trained q124 cluster
    "q161_cluster_outliers" -> ((s, d) => Similarity.clusterOutliers(s, d)),
    // dataset-card mix table: per-(split, lang) docs/tokens/shares
    "q162_mix_manifest" -> ((s, d) => TextOps.mixManifest(s, d)),
    // cross-family capstone: md5-LSH near-dup over media frame sets
    "q163_media_neardup" -> ((s, d) => Multimodal.mediaNearDup(s, d)),
    // safety gate: exact-token blocklist screen with hit tolerance
    "q164_blocklist_filter" -> ((s, d) => TextOps.blocklistFilter(s, d)),
    // per-split embedding-space coverage over the trained q124 clusters
    "q165_split_embedding_coverage" -> ((s, d) =>
      Similarity.splitEmbeddingCoverage(s, d)),
    // events analytics staple: first-activity cohort retention triangle
    "q166_retention_cohorts" -> ((s, d) =>
      Analytics.retentionCohorts(s, d)),
    // Lee et al.-style sliding-window exact-substring dedup with
    // byte-exact reassembly of the uncovered tokens
    "q167_window_dedup" -> ((s, d) => Dedup.windowDedup(s, d)),
    // embedding-space incremental screen: new batch vs the corpus
    // through the coarse quantizer's inverted lists
    "q169_incremental_semdedup" -> ((s, d) =>
      Similarity.incrementalSemDedup(s, d)),
    // near-dup decontamination: md5-LSH banding run cross-side over
    // the q136 split, exact-Jaccard verified
    "q170_neardup_decontamination" -> ((s, d) =>
      TextOps.neardupDecontamination(s, d)),
    // per-source token-budget sampling plan (epochs per source under
    // α=0.5 temperature flattening)
    "q171_token_budget_plan" -> ((s, d) => TextOps.tokenBudgetPlan(s, d)),
    // tokenizer-sizing curve: exact token-mass coverage of top-k types
    "q172_vocab_coverage" -> ((s, d) => TextOps.vocabCoverage(s, d)),
    // per-language unigram entropy / perplexity corpus-health table
    "q173_corpus_entropy" -> ((s, d) => TextOps.corpusEntropy(s, d)),
    // daily-crawl form of the window screen: batch windows vs the
    // historical window-hash artifact
    "q174_incremental_window_dedup" -> ((s, d) =>
      Dedup.incrementalWindowDedup(s, d)),
    // the same screen as a drained stream, widened by the state-append
    // rule: batch windows join corpus hashes AND the growing stream
    // min-doc state, so new-vs-new substrings dedup too
    "q175_streaming_window_dedup" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingWindowDedup(s, d)),
    // context-length sizing: exact per-cap truncation cost
    "q176_truncation_audit" -> ((s, d) => TextOps.truncationAudit(s, d)),
    // degenerate-repetition loop detector (longest same-token run)
    "q177_repetition_runs" -> ((s, d) => TextOps.repetitionRuns(s, d)),
    // band-bucket skew histogram: the QA table the hot-bucket cap
    // (Dedup.BandBucketCap) is tuned from
    "q168_band_skew_telemetry" -> ((s, d) =>
      Dedup.bandSkewTelemetry(s, d)),
    // GPT-style concat-and-chop packed-sequence audit (docs span
    // boundaries; q84 is the keep-whole-docs complement)
    "q178_packed_sequences" -> ((s, d) => TextOps.packedSequences(s, d)),
    // RAG-unit overlapping chunk explode with md5 content digests
    "q179_doc_chunking" -> ((s, d) => TextOps.docChunking(s, d)),
    // DSIR-style unigram log-likelihood-ratio data selection
    "q180_dsir_weights" -> ((s, d) => TextOps.dsirWeights(s, d)),
    // per-dimension embedding health profile (dead/collapsed dims)
    "q181_dim_profile" -> ((s, d) => Similarity.dimProfile(s, d)),
    // streaming per-source quality-acceptance ledger
    "q182_streaming_quality_gate" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingQualityGate(s, d)),
    // triangle census of the verified near-dup graph (degree-oriented)
    "q183_dup_graph_triangles" -> ((s, d) =>
      Analytics.dupGraphTriangles(s, d)),
    // Count-Min sketch grid + exact-count audit for top-k tokens
    "q184_count_min_sketch" -> ((s, d) =>
      TextOps.countMinHeavyHitters(s, d)),
    // the q80 eval-gram screen as a drained stream (fixed eval side)
    "q185_streaming_decontamination" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingDecontamination(s, d)),
    // cluster-size histogram + keep-one-per-cluster savings table
    "q186_dedup_yield" -> ((s, d) => Dedup.dedupYield(s, d)),
    // recall@k of the oracled IVF index vs the exact baseline
    "q187_ann_recall" -> ((s, d) => Similarity.annRecallReport(s, d)),
    // CUBE(source, lang) dataset card: every grouping level in one pass
    "q188_mix_cube" -> ((s, d) => TextOps.mixCube(s, d)),
    // daily top-k leaderboard with rank movement vs previous day
    "q189_event_trending" -> ((s, d) => Analytics.eventTrending(s, d)),
    // Zipf slope/intercept/R2 via closed-form distributed regression
    "q190_zipf_fit" -> ((s, d) => TextOps.zipfFit(s, d)),
    // EXACT similarity join via prefix filtering (no recall loss) —
    // the ppjoin-family alternative to q95's LSH banding
    "q191_prefix_filter_join" -> ((s, d) => Dedup.prefixFilterJoin(s, d)),
    // per-source KS drift of the length CDF vs the rest of the corpus
    "q192_length_ks_drift" -> ((s, d) => TextOps.lengthKsDrift(s, d)),
    // contract-then-solve incremental CC; oracle = full closure
    "q193_incremental_cc" -> ((s, d) => Dedup.incrementalCC(s, d)),
    // top-lift lexical signature per embedding label
    "q194_label_lexicon" -> ((s, d) => TextOps.labelLexicon(s, d)),
    // set overlap of the BM25 and TF-IDF top-15 result sets
    "q195_ranker_agreement" -> ((s, d) => TextOps.rankerAgreement(s, d)),
    // live duplicate-cluster labels: streaming band state + per-batch
    // contract-then-solve; drains to the full closure
    "q196_streaming_incremental_cc" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingIncrementalCC(s, d)),
    // S-curve recall planner over the observed verified-pair jaccards
    "q197_banding_planner" -> ((s, d) => Dedup.bandingPlanner(s, d)),
    // first-order Markov transition matrix over q20's sessions
    "q198_event_transitions" -> ((s, d) =>
      Sessionize.eventTransitions(s, d)),
    // stratified A-ES draw: k length-weighted docs per source
    "q199_grouped_weighted_sample" -> ((s, d) =>
      TextOps.groupedWeightedSample(s, d)),
    // exact per-source length deciles by rank arithmetic
    "q200_source_deciles" -> ((s, d) => TextOps.sourceDeciles(s, d)),
    // SCD2 history: versioned attribute rows with validity bounds
    "q201_scd2_history" -> ((s, d) => Sessionize.scd2History(s, d)),
    // point-in-time attribute resolution against the SCD2 history
    "q202_scd2_resolve" -> ((s, d) => Sessionize.scd2Resolve(s, d)),
    // streaming MERGE: the SCD2 history folded live, batch over batch
    "q203_streaming_scd2" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingScd2(s, d)),
    "q204_dup_graph_kcore" -> ((s, d) => Analytics.dupGraphKCore(s, d)),
    "q205_heaps_law" -> ((s, d) => TextOps.heapsLaw(s, d)),
    "q206_epoch_materialization" -> ((s, d) =>
      TextOps.epochMaterialization(s, d)),
    "q207_hard_negatives" -> ((s, d) => Similarity.hardNegatives(s, d)),
    "q208_ewma_anomaly" -> ((s, d) => Analytics.ewmaAnomaly(s, d)),
    "q209_dup_rate_ci" -> ((s, d) => Dedup.dupRateWilson(s, d)),
    "q210_streaming_ewma" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingEwmaAnomaly(s, d)),
    "q211_source_scorecard" -> ((s, d) => TextOps.sourceScorecard(s, d)),
    "q212_dup_graph_degrees" -> ((s, d) => Analytics.dupGraphDegrees(s, d)),
    "q213_streaming_heavy_hitters" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingHeavyHitters(s, d)),
    "q214_attribution" -> ((s, d) => Analytics.lastTouchAttribution(s, d)),
    "q215_streaming_attribution" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingAttribution(s, d)),
    "q216_greedy_decode" -> ((s, d) => TextOps.greedyDecode(s, d)),
    "q217_dup_aware_weights" -> ((s, d) => TextOps.dupAwareWeights(s, d)),
    "q218_split_leak_repair" -> ((s, d) => TextOps.splitLeakRepair(s, d)),
    "q219_length_mad_outliers" -> ((s, d) =>
      TextOps.lengthMadOutliers(s, d)),
    "q220_split_composition" -> ((s, d) =>
      TextOps.splitCompositionAudit(s, d)),
    // event-grain as-of attribution: the linear window plan, oracled
    // by the classic as-of JOIN formulation
    "q221_asof_attribution" -> ((s, d) =>
      Analytics.asOfAttributionEvents(s, d)),
    // HyperLogLog distinct-content estimate per source (md5 registers,
    // exact BIGINT harmonic sum — fully oracled) + exact audit
    "q222_hll_distinct" -> ((s, d) => TextOps.hllDistinct(s, d)),
    // the q222 sketch maintained per micro-batch and drained by
    // register-max merge (shares q222's oracle SQL verbatim)
    "q223_streaming_hll" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingHllDistinct(s, d)),
    // pairwise source-overlap: bottom-k minwise Jaccard estimate +
    // exact audit — the mix-planning overlap matrix
    "q224_source_overlap" -> ((s, d) => Dedup.sourceOverlapSketch(s, d)),
    // q174 with the corpus window-hash set as a stored parquet
    // artifact (built on first call, read thereafter). The registered
    // query passes a FRESH temp dir per invocation — deterministic,
    // but it means the oracled gate always exercises the build+write
    // path; the persisted-READ branch (artifact already present) is
    // covered by Wave6Spec's second-call test over a stable path.
    "q225_window_dedup_persisted" -> ((s, d) =>
      Dedup.incrementalWindowDedupPersisted(s, d,
        Caches.trackTempDir(java.nio.file.Files
          .createTempDirectory("graft_wintab_")).toString + "/windows")),
    // the whole dedup-and-filter pipeline as one audited 4-row table:
    // raw → exact dedup → near-dedup → quality gate
    "q226_curation_funnel" -> ((s, d) =>
      TextOps.curationPipelineFunnel(s, d)),
    // pairwise cosine between exact per-label centroid vectors — the
    // embedding-space overlap matrix
    "q227_label_centroid_matrix" -> ((s, d) =>
      Similarity.labelCentroidMatrix(s, d)),
    // the q224 bottom-k sketches maintained per micro-batch (KMV
    // merge) and drained to the batch matrix (shares q224's oracle)
    "q228_streaming_source_overlap" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingSourceOverlap(s, d)),
    // BM25 input relations (doclens + query-term postings) maintained
    // as streaming state; drain scores with q130's arithmetic
    "q229_streaming_bm25" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingBm25(s, d)),
    // langid-mislabel / language-invariant-boilerplate detector:
    // exact content hashes shared across language pairs
    "q230_cross_lingual_dups" -> ((s, d) =>
      Dedup.crossLingualDupMatrix(s, d)),
    // id-hash shard assignment audit: doc and token mass deviation
    // from uniform per shard
    "q231_shard_balance" -> ((s, d) => TextOps.shardBalanceAudit(s, d)),
    // filtered vector search: brute-force top-k with a label predicate
    // pushed into the corpus scan
    "q232_filtered_ann" -> ((s, d) => Similarity.filteredAnnTopK(s, d)),
    // q146's decode-on-arrival streaming twin: per-batch frame
    // features appended to compacted state, drained to the batch rows
    "q233_streaming_frame_features" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingFrameFeatures(s, d)),
    // the q222 sketch at (source, lang) cell grain; lang-cell register
    // max-merge reproduces the source sketch exactly
    "q234_hll_cells" -> ((s, d) => TextOps.hllDistinctCells(s, d)),
    // the reference's Redis-SET dedup (SADD + membership per batch) as
    // a drained stream: persisted hash registry, first-occurrence-wins
    "q235_streaming_exact_dedup" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingExactDedup(s, d)),
    // is the quality gate secretly a length filter? point-biserial r
    // per source from exact integer sufficient statistics
    "q236_length_quality_corr" -> ((s, d) =>
      TextOps.lengthQualityCorrelation(s, d)),
    // the embedding member of the decontamination family: held-out
    // vectors screened semantically against train via inverted lists
    "q237_embedding_decontamination" -> ((s, d) =>
      Similarity.embeddingDecontamination(s, d)),
    // q218's repair policy in embedding space: leaked held-out vectors
    // reassigned to train, per-split before/out/in/after audit
    "q238_embedding_leak_repair" -> ((s, d) =>
      Similarity.embeddingLeakRepair(s, d)),
    // in-engine trained quality classifier (the CCNet/fastText stage):
    // multinomial NB over token counts vs the q211 flag — integer
    // sufficient statistics, fixed-point log-odds, exact BIGINT scores
    "q239_nb_quality_train" -> ((s, d) => QualityModel.nbTrain(s, d)),
    "q240_nb_quality_apply" -> ((s, d) => QualityModel.nbApply(s, d)),
    // the q95 banding chain in the CAPPED regime (cap = 2, which
    // actually fires at the fixtures) — cross-engine parity of the
    // hot-bucket quarantine itself, not just the uncapped path
    "q241_minhash_capped" -> ((s, d) => Dedup.minhashCappedOracled(s, d)),
    // state-lifecycle health surfaced as a query: the q235 registry
    // drained over a 4-way id-range split with forced drain-time
    // compaction; the emitted rows_after is data-deterministic
    "q242_compaction_telemetry" -> ((s, d) =>
      graft.streaming.StreamingOps.compactionTelemetry(s, d)),
    // duplicated-substring length ladder: per rung w, does a doc share
    // a w-window with another doc — the window-size tuning table for
    // the q167 screen
    "q243_dup_substring_ladder" -> ((s, d) =>
      Dedup.dupSubstringLadder(s, d)),
    // tokenizer stability: the q131 merges trained on the historical
    // snapshot vs the full corpus, diffed rank by rank
    "q244_bpe_vocab_drift" -> ((s, d) => TextOps.bpeVocabDrift(s, d)),
    // the decontamination family rolled into one per-source table:
    // exact / lexical (q80 rule) / near-dup (q170 rule) leak rates
    "q245_contamination_scorecard" -> ((s, d) =>
      TextOps.contaminationScorecard(s, d)),
    // the q239 sufficient statistics maintained per micro-batch
    // (SUM-merge of batch-tagged count rows, compacted state); drain
    // runs q239's vocab+weight arithmetic (shares its oracle verbatim)
    "q246_streaming_nb_train" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingNbTrain(s, d)),
    // per-source confusion of the trained gate vs its weak label —
    // where the classifier generalizes past (FP) or under-fits (FN)
    // the rule it was trained on
    "q247_nb_confusion" -> ((s, d) => QualityModel.nbConfusion(s, d)),
    // calibration: 2-nat score bins vs empirical quality rate
    "q248_nb_calibration" -> ((s, d) => QualityModel.nbCalibration(s, d)),
    // U-shaped multi-touch attribution: purchase value split over the
    // preceding hour's clicks (40/40/20), exact micro-unit credits
    "q249_position_attribution" -> ((s, d) =>
      Analytics.positionAttribution(s, d)),
    // forward as-of: click → next-purchase latency, reverse-window
    // linear plan oracled by the classic join + argmin form
    "q250_conversion_latency" -> ((s, d) =>
      Analytics.conversionLatency(s, d)),
    // the q243 ladder maintained per micro-batch (append-only window
    // facts; order-insensitive rule) — shares q243's oracle verbatim
    "q251_streaming_dup_ladder" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingDupLadder(s, d)),
    // per-inverted-list balance of the 16-list md5-nibble quantizer —
    // the q231 shard discipline applied to the ANN index
    "q252_ivf_list_balance" -> ((s, d) => Similarity.ivfListBalance(s, d)),
    // recall@10 vs brute force swept over nprobe {1,2,4} — the probe
    // budget decision table, fully oracled on the fixed model
    "q253_multiprobe_recall_sweep" -> ((s, d) =>
      Similarity.multiprobeRecallSweep(s, d)),
    // realized pair mass + docs touched per Jaccard threshold — the
    // complement of q197's predicted-recall planner
    "q254_dedup_threshold_sweep" -> ((s, d) =>
      Dedup.dedupThresholdSweep(s, d)),
    // the q244 drift check applied to the MODEL: snapshot-trained vs
    // full-trained NB weights, token by token
    "q255_nb_model_drift" -> ((s, d) => QualityModel.nbModelDrift(s, d)),
    // q243's rung flags at source grain — which SOURCE needs the
    // window screen vs plain near-dup
    "q256_dup_ladder_by_source" -> ((s, d) =>
      Dedup.dupLadderBySource(s, d)),
    // retry-burst debounce: suppress same-(user, type) events within
    // the gap of the previous raw event — one keyed lag, exact micros
    "q257_event_debounce" -> ((s, d) => Analytics.eventDebounce(s, d)),
    // per-source deciles from a deterministic 25% md5 sample vs exact
    // — the decision table for the sampled quantile path at 100 TB
    "q258_sampled_deciles" -> ((s, d) => TextOps.sampledDecileAudit(s, d)),
    // cumulative distinct-user curve: exact first-seen prefix sum vs
    // cumulatively max-merged HLL registers, per day
    "q259_hll_user_curve" -> ((s, d) => Analytics.hllUserCurve(s, d)),
    // log2 histogram of same-(user, type) inter-event gaps — sizes the
    // debounce gap, session timeout and watermark delay
    "q260_event_gap_histogram" -> ((s, d) =>
      Analytics.eventGapHistogram(s, d)),
    // q257 per micro-batch: last-event state re-entry + gated count
    // ledger under the arrival contract — shares q257's oracle
    "q261_streaming_debounce" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingDebounce(s, d)),
    // q258 swept over nested sample rates 1/4 ⊃ 1/16 ⊃ 1/64 — the
    // per-source decision table for how cheap a quantile pass can get
    "q264_decile_sample_sweep" -> ((s, d) =>
      TextOps.decileSampleSweep(s, d)),
    // per-label centroid cosine between two deterministic md5 halves
    // — the embedding-space drift audit (q158/q244 in vector space)
    "q265_centroid_drift" -> ((s, d) => Similarity.centroidDrift(s, d)),
    // per from-type entropy/perplexity of q198's transition matrix —
    // behavioral predictability, rides the same sessionization sort
    "q266_transition_entropy" -> ((s, d) =>
      Sessionize.transitionEntropy(s, d)),
    // q260 per micro-batch: last-event anchors re-enter the lag, the
    // histogram sum/min/max-merges through a gated ledger — shares
    // q260's oracle
    "q262_streaming_gap_histogram" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingGapHistogram(s, d)),
    // q200 per micro-batch: the (source, n_chars) value histogram is
    // the mergeable sufficient statistic — shares q200's oracle
    "q263_streaming_deciles" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingDeciles(s, d)),
    // q104 per micro-batch: fixed-point long element sums sum-merge —
    // shares q104's oracle
    "q267_streaming_label_centroids" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingLabelCentroids(s, d)),
    // every 3-step session path, counted and totally ranked — the
    // second-order q198 (q144's funnel is one row of this table)
    "q268_event_path_trigrams" -> ((s, d) =>
      Sessionize.eventPathTrigrams(s, d)),
    // q198 per micro-batch: per-user last-event anchors + gated count
    // ledger — shares q198's oracle
    "q269_streaming_transitions" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingTransitions(s, d)),
    // q158 per micro-batch: (source, term) counts are the mergeable
    // sufficient statistic for KL(source‖corpus) — shares q158's oracle
    "q270_streaming_kl_drift" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingKlDrift(s, d)),
    // log2 histogram of events-per-session — sizes per-session state
    "q271_session_size_histogram" -> ((s, d) =>
      Sessionize.sessionSizeHistogram(s, d)),
    // q257's kept rate at four candidate gaps from one window pass —
    // the debounce-gap decision table
    "q272_debounce_gap_sweep" -> ((s, d) =>
      Analytics.debounceGapSweep(s, d)),
    // per-day new/retained/resurrected/churned user flows — one
    // lag+lead window over the (user, day) grain
    "q273_growth_accounting" -> ((s, d) =>
      Lifecycle.growthAccounting(s, d)),
    // RFM log2 cells: recency/frequency/exact-cents monetary binned
    // by the bit-length rule — no global ntile sort
    "q274_rfm_segments" -> ((s, d) => Lifecycle.rfmSegments(s, d)),
    // exact DAU vs trailing-7-day WAU per observed day — rolling
    // distinct via a 7x fan-out of the DAY grain, not the event grain
    "q275_dau_wau_stickiness" -> ((s, d) =>
      Lifecycle.dauWauStickiness(s, d)),
    // q166 per micro-batch: the (user, date) grain distinct-merges
    // (idempotent, order-insensitive) — shares q166's oracle
    "q276_streaming_retention" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingRetention(s, d)),
    // q144 per micro-batch: per-user session anchors + per-session
    // (tv, tc, tp) stage state under the arrival contract — shares
    // q144's oracle
    "q277_streaming_funnel" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingFunnel(s, d)),
    // exact stage-latency deciles for the q144 transitions — the
    // latency distribution q250's daily means cannot show
    "q278_funnel_latency_deciles" -> ((s, d) =>
      Sessionize.funnelLatencyDeciles(s, d)),
    // q274 per micro-batch: per-user (last_day, n_events, cents)
    // max/sum-merge through a gated ledger — shares q274's oracle
    "q279_streaming_rfm" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingRfm(s, d)),
    // cohort x age revenue + cumulative LTV per acquired user —
    // the money view of q166's triangle, exact cents
    "q280_cohort_ltv" -> ((s, d) => Lifecycle.cohortLtv(s, d)),
    // day-of-week baseline + residual z anomaly — the weekday-aware
    // upgrade of q143's trailing-window anomaly
    "q281_seasonal_baseline" -> ((s, d) =>
      Lifecycle.seasonalBaseline(s, d)),
    // funnel value by furthest stage — exclusive buckets partition
    // q144's s0; f2 is the abandoned-cart mass
    "q282_funnel_value_by_stage" -> ((s, d) =>
      Sessionize.funnelValueByStage(s, d)),
    // q271 per micro-batch: per-session event counts sum-merge
    // through the funnel-stages state — shares q271's oracle
    "q283_streaming_session_sizes" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingSessionSizes(s, d)),
    // q280 per micro-batch: (user, day, cents) sum-merge through a
    // gated ledger — shares q280's oracle
    "q284_streaming_cohort_ltv" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingCohortLtv(s, d)),
    // q278 per micro-batch: stage-timestamp state drains the exact
    // decile fold — shares q278's oracle
    "q285_streaming_funnel_latency" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingFunnelLatency(s, d)),
    // per-label simplified silhouette (O(n*k) centroid form) — the
    // vector-grain internal-validity score; negatives = label noise
    "q286_simplified_silhouette" -> ((s, d) =>
      Similarity.simplifiedSilhouette(s, d)),
    // exact ROC AUC: trained NB score vs the n_chars baseline — the
    // Mann-Whitney histogram fold, two-phase prefix sum
    "q287_nb_auc" -> ((s, d) => QualityModel.nbAuc(s, d)),
    // per-label deciles of the exact top1-top2 centroid margin — the
    // classifier-confidence profile behind q105's confusion counts
    "q288_centroid_margin_deciles" -> ((s, d) =>
      Similarity.centroidMarginDeciles(s, d)),
    // per-label Davies-Bouldin worst-pair ratio — which class pair is
    // the merge risk (the q286 companion index)
    "q289_davies_bouldin" -> ((s, d) => Similarity.daviesBouldin(s, d)),
    // per-day PEAK concurrent sessions — sweep-line +1/−1 boundaries,
    // intra-day running sum + day-grain carry (the capacity view the
    // per-day session counts cannot show)
    "q290_session_concurrency" -> ((s, d) =>
      Sessionize.sessionConcurrency(s, d)),
    // Kaplan-Meier tenure table: at-risk / churned / censored +
    // discrete hazard — the survival view of q273's churn flows
    "q291_survival_hazard" -> ((s, d) => Lifecycle.survivalHazard(s, d)),
    // integer CUSUM level-shift over DENSE daily counts (missing days
    // count 0) — accumulates persistent small shifts q143/q281 miss
    "q292_cusum_shift" -> ((s, d) => Lifecycle.cusumShift(s, d)),
    // referential orphan audit over every FK edge of the schema —
    // key-grain collapse + key-grain anti joins, #edges rows out
    "q293_fk_integrity" -> ((s, d) => Audit.fkIntegrity(s, d)),
    // join-key multiplicity/skew planner — the data-driven salting /
    // broadcast / AQE-skew decision table behind q19/q59
    "q294_join_key_skew" -> ((s, d) => Audit.joinKeySkew(s, d)),
    // q291 per micro-batch: per-user (first_day, last_day) spans
    // min/max-merge (idempotent) — shares q291's oracle
    "q295_streaming_survival" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingSurvival(s, d)),
    // q292 per micro-batch: (type, day, n) counts sum-merge through a
    // gated ledger; drain = the CUSUM finish — shares q292's oracle
    "q296_streaming_cusum" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingCusum(s, d)),
    // q281 per micro-batch off the SAME (type, day, n) state family
    // as q296 — one maintained fold, two anomaly reports
    "q297_streaming_seasonal" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingSeasonal(s, d)),
    // q290 per micro-batch: session endpoints min/max-merge through
    // the q277 funnel-stages state — shares q290's oracle
    "q298_streaming_concurrency" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingConcurrency(s, d)),
    // exact Gini concentration of events/cents/orders per key — the
    // tie-group rank identity + q205 two-phase prefix, decimal sums
    "q299_activity_gini" -> ((s, d) => Audit.activityGini(s, d)),
    // q273 per micro-batch: the (user, day) grain distinct-merges;
    // drain = the lag+lead growth split — shares q273's oracle
    "q300_streaming_growth" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingGrowth(s, d)),
    // q275 per micro-batch off the SAME (user, day) state family as
    // q300 — one maintained fold, two growth reports
    "q301_streaming_stickiness" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingStickiness(s, d)),
    // q234 per micro-batch: (source, lang) HLL registers max-merge
    // through compacted state — shares q234's oracle
    "q302_streaming_hll_cells" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingHllCells(s, d)),
    // q299 per micro-batch off the q279 rfm state family (per-user
    // n_events/cents sum-merge) + the static orders relation —
    // shares q299's oracle
    "q303_streaming_gini" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingGini(s, d)),
    // exact Lorenz curve deciles — the distribution behind q299's
    // scalar, off the same ranked value histogram
    "q304_lorenz_deciles" -> ((s, d) => Audit.lorenzDeciles(s, d)),
    // per-source bigram conditional entropy + perplexity — the
    // sequential-predictability health metric (boilerplate detector)
    "q305_bigram_entropy_rate" -> ((s, d) =>
      TextOps.bigramEntropyRate(s, d)),
    // q305 per micro-batch: (source, w1, w2) counts sum-merge —
    // shares q305's oracle
    "q306_streaming_bigram_entropy" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingBigramEntropy(s, d)),
    // per-source Simpson/HHI token concentration + effective vocab —
    // exact Σc/Σc² statistics, the power-mean companion of q173
    "q307_simpson_diversity" -> ((s, d) => TextOps.simpsonDiversity(s, d)),
    // q307 per micro-batch off the SAME (source, term) state grain as
    // q270 — one maintained fold, two lexical-health reports
    "q308_streaming_simpson" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingSimpson(s, d)),
    // q25's marker-word guesser scored against the lang label — the
    // confusion matrix behind the language filter
    "q309_langid_confusion" -> ((s, d) => TextOps.langIdConfusion(s, d)),
    // q184 per micro-batch: the exact (token, tf) grain sum-merges;
    // the 1024-cell grid rebuilds at drain — shares q184's oracle
    "q310_streaming_count_min" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingCountMin(s, d)),
    // q190 per micro-batch off the SAME (token, tf) grain as q310 —
    // one maintained fold, frequency sketch AND naturalness fit
    "q311_streaming_zipf" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingZipf(s, d)),
    // q173 per micro-batch: (lang, token) counts sum-merge — shares
    // q173's oracle
    "q312_streaming_corpus_entropy" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingCorpusEntropy(s, d)),
    // q309 per micro-batch: (lang, guess) cells sum-merge — shares
    // q309's oracle
    "q313_streaming_langid_confusion" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingLangIdConfusion(s, d)),
    // q205 per micro-batch: order-sensitive first-position min-merge
    // + a one-row token-offset ledger under the arrival contract —
    // shares q205's oracle
    "q314_streaming_heaps" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingHeaps(s, d)),
    // TPC-H Q4 shape: per priority, orders with a line shipped > 60
    // days after the order date + late rate
    "q315_late_priority" -> ((s, d) => Analytics.latePriority(s, d)),
    // TPC-H Q10 shape: top-20 customers by returned-line revenue
    "q316_returned_revenue" -> ((s, d) => Analytics.returnedRevenue(s, d)),
    // TPC-H Q14 shape: monthly PROMO revenue share, decimal-exact
    "q317_promo_share" -> ((s, d) => Analytics.promoShare(s, d)),
    // TPC-H Q15 shape: max-revenue suppliers over a fixed quarter
    // (full tie set — decimal equality is exact)
    "q318_top_supplier" -> ((s, d) => Analytics.topSupplier(s, d)),
    // TPC-H Q17 shape: small-quantity lines per brand; the half-of-
    // average threshold is cross-multiplied (no division anywhere)
    "q319_small_quantity_brand" -> ((s, d) =>
      Analytics.smallQuantityBrand(s, d)),
    // TPC-H Q1 per micro-batch: decimal cell sums merge exactly —
    // the incremental nightly-refresh form; shares q16's oracle
    "q320_streaming_pricing_summary" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingPricingSummary(s, d)),
    // TPC-H Q14 per micro-batch: month cells merge; static part dim
    // joins per batch (q76 discipline) — shares q317's oracle
    "q321_streaming_promo_share" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingPromoShare(s, d)),
    // TPC-H Q10 per micro-batch: customer cent sums merge; top-20 +
    // dims resolve at drain — shares q316's oracle
    "q322_streaming_returned_revenue" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingReturnedRevenue(s, d)),
    // TPC-H Q15 per micro-batch: supplier sums merge; the exact tie
    // set resolves at drain — shares q318's oracle
    "q323_streaming_top_supplier" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingTopSupplier(s, d)),
    // TPC-H Q4 per micro-batch: the late order set distinct-merges
    // (idempotent) — shares q315's oracle
    "q324_streaming_late_priority" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingLatePriority(s, d)),
    // NB operating-point table: confusion quadrant + P/R/F1 at each
    // score decile — exact integers, two-phase histogram prefix
    "q325_nb_pr_sweep" -> ((s, d) => QualityModel.nbPrSweep(s, d)),
    // Cohen's kappa for the NB gate and the q25 lang-id guesser —
    // chance-corrected agreement, one division, decimal products
    "q326_kappa_agreement" -> ((s, d) =>
      QualityModel.kappaAgreement(s, d)),
    // synchronous K-round label propagation over the dup graph —
    // deterministic (mode, ties to min), oracled round-for-round
    "q327_label_propagation" -> ((s, d) =>
      Analytics.labelPropagation(s, d)),
    // per (type, day) OHLC candlesticks: struct-min/max open/close,
    // exact decimal volume — the mergeable time-series rollup
    "q328_ohlc_daily" -> ((s, d) => Lifecycle.ohlcDaily(s, d)),
    // q328 per micro-batch: the OHLC statistic merges exactly —
    // shares q328's oracle
    "q329_streaming_ohlc" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingOhlc(s, d)),
    // smoothed log-odds distinctive terms per source (top-5) — the
    // term-level attribution behind q158's KL number
    "q330_distinctive_terms" -> ((s, d) =>
      TextOps.distinctiveTerms(s, d)),
    // q330 per micro-batch off the q270/q308 (source, term) grain —
    // shares q330's oracle
    "q331_streaming_distinctive" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingDistinctiveTerms(s, d)),
    // exact pairwise source-vocabulary Jaccard — the vocab view of
    // q224's shingle overlap
    "q332_vocab_jaccard" -> ((s, d) => TextOps.vocabJaccard(s, d)),
    // q332 per micro-batch (distinct at drain over the count state)
    // — shares q332's oracle
    "q333_streaming_vocab_jaccard" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingVocabJaccard(s, d)),
    // Benford first-digit audit of order totals / event values —
    // digit from the exact decimal string, χ² vs log10(1 + 1/d)
    "q334_benford_audit" -> ((s, d) => TextOps.benfordAudit(s, d)),
    // per-language balanced downsample (k = min class size) by a
    // deterministic md5 order — the sample itself hash-matches
    "q335_balanced_sample" -> ((s, d) => TextOps.balancedSample(s, d)),
    // WOE/IV of the length feature vs the q24 quality flag — the
    // feature-level predictiveness table next to q287's model AUC
    "q336_woe_iv" -> ((s, d) => QualityModel.woeIv(s, d)),
    // q336 per micro-batch: (bucket, y) cells sum-merge — shares
    // q336's oracle
    "q337_streaming_woe" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingWoe(s, d)),
    // stationary distribution of the q198 chain — K-round power
    // iteration with renormalization, oracled round-for-round
    "q338_markov_stationary" -> ((s, d) =>
      Sessionize.markovStationary(s, d)),
    // conversion rate per q274 RFM cell — the targeting table
    "q339_segment_conversion" -> ((s, d) =>
      Lifecycle.segmentConversion(s, d)),
    // TPC-H Q17 per micro-batch: (part, qty, brand) cells merge; the
    // corpus-wide threshold applies at drain — shares q319's oracle
    "q340_streaming_small_quantity" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingSmallQuantity(s, d)),
    // q334 per micro-batch (events digit cells merge; static orders
    // cells join at drain) — shares q334's oracle
    "q341_streaming_benford" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingBenford(s, d)),
    // q335 per micro-batch: the (lang, doc, h) index distinct-merges;
    // min-class-size and ranks fold at drain — shares q335's oracle
    "q342_streaming_balanced_sample" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingBalancedSample(s, d)),
    // q338 per micro-batch off the SAME transition-count state as
    // q269 — shares q338's oracle
    "q343_streaming_markov" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingMarkovStationary(s, d)),
    // q339 per micro-batch off the SAME rfm state as q279/q303 (the
    // purchase flag max-merges) — shares q339's oracle
    "q344_streaming_segment_conversion" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingSegmentConversion(s, d)),
    // r12 advice #5 — PII family over a deterministically planted
    // corpus (real detectors, oracled counts/bytes):
    // per-source incidence report
    "q345_pii_incidence" -> ((s, d) => Pii.piiIncidence(s, d)),
    // X1 extractPhones over a planted multi-value contact list
    "q346_pii_contact_extract" -> ((s, d) => Pii.contactExtract(s, d)),
    // detector pass over events.props + distinct exposed users
    "q347_pii_props_audit" -> ((s, d) => Pii.propsAudit(s, d)),
    // redacted-copy writer: scrubbed parquet + read-back manifest
    "q348_pii_redacted_copy" -> ((s, d) => Pii.redactedCopy(s, d)),
    // q345 per micro-batch: (source, kind) cells sum-merge — shares
    // q345's oracle
    "q349_streaming_pii_incidence" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingPiiIncidence(s, d)),
    // block 19 (r12 verdict #8): tokenizer health + scrub sizing
    // q244's BPE re-training off the maintained (w, split) word state
    // — shares q244's oracle
    "q350_streaming_bpe_drift" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingBpeDrift(s, d)),
    // batch word types absent from the snapshot vocabulary + OOV mass
    // — the cheap daily trigger for the expensive q244 re-train
    "q351_oov_pressure" -> ((s, d) => TextOps.oovPressure(s, d)),
    // q351 off the SAME (w, split) state grain as q350 — shares
    // q351's oracle
    "q352_streaming_oov_pressure" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingOovPressure(s, d)),
    // per-source scrub-job sizing: docs that change, spans, byte delta
    "q353_redaction_yield" -> ((s, d) => Pii.redactionYield(s, d)),
    // q353 off the SAME (source, kind) cells as q349 — shares q353's
    // oracle
    "q354_streaming_redaction_yield" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingRedactionYield(s, d)),
    // block 20 (r12 verdict #8): lineage/provenance over the versioned
    // ledgers — which batch fed which state version fed which report
    "q355_lineage_manifest" -> ((s, d) =>
      graft.streaming.Provenance.ledgerManifest(s, d)),
    // which micro-batch FIRST introduced each state key — min-merged
    // provenance riding the existing cell merge
    "q356_first_writer_provenance" -> ((s, d) =>
      graft.streaming.Provenance.firstWriterProvenance(s, d)),
    // q345's report + the (state_version, state_batch) it drained from
    "q357_report_lineage_binding" -> ((s, d) =>
      graft.streaming.Provenance.incidenceWithLineage(s, d)),
    // version-pinned time travel: the per-source state AS OF version 1
    "q358_state_asof_version" -> ((s, d) =>
      graft.streaming.Provenance.stateAsOfVersion(s, d)),
    // every ingested doc accounted for in the final state (full outer
    // join so one-sided keys surface)
    "q359_lineage_conservation" -> ((s, d) =>
      graft.streaming.Provenance.lineageConservation(s, d)),
    // block 21: split hygiene — the mix-mass table, the near-dup leak
    // matrix, the group-safe fix, its migration cost, a streaming twin
    "q360_split_mass" -> ((s, d) => Splits.splitMassReport(s, d)),
    // verified near-dup pairs by the split pair they straddle (rides
    // the shared dup-edge artifact)
    "q361_split_leakage_matrix" -> ((s, d) =>
      Splits.splitLeakageMatrix(s, d)),
    // assign by near-dup component: cross-split edges computed -> 0
    "q362_group_safe_split" -> ((s, d) => Splits.groupSafeSplit(s, d)),
    // what adopting the fix costs: the doc-hash -> group transition
    // matrix
    "q363_split_migration" -> ((s, d) => Splits.splitMigration(s, d)),
    // q360 off maintained (source, split, kind) cells — shares its SQL
    "q364_streaming_split_mass" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingSplitMass(s, d)),
    // block 22: the remaining classic decision-support shapes
    // TPC-H Q6: one filtered scan, one decimal sum — the canonical
    // pushdown row; discount band in integer cents
    "q365_forecast_revenue" -> ((s, d) => Analytics.forecastRevenue(s, d)),
    // TPC-H Q13: recent order-count histogram, zero bucket via left join
    "q366_order_count_distribution" -> ((s, d) =>
      Analytics.orderCountDistribution(s, d)),
    // TPC-H Q18: per-order quantity >= 250, customer resolved at drain
    "q367_large_volume_customers" -> ((s, d) =>
      Analytics.largeVolumeCustomers(s, d)),
    // TPC-H Q22: above-positive-mean balances with no recent orders;
    // the mean compares cross-multiplied (no division)
    "q368_idle_balance_audit" -> ((s, d) =>
      Analytics.idleBalanceAudit(s, d)),
    // Q6 per micro-batch: the single cell sum-merges — shares q365's
    "q369_streaming_forecast_revenue" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingForecastRevenue(s, d)),
    // Q18 per micro-batch: per-order sums merge across batch-spanning
    // orders — shares q367's
    "q370_streaming_large_volume" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingLargeVolume(s, d)),
    // block 23: TPC-H Q7/Q8/Q19 shapes + Q7/Q19 twins
    // Q7: cross-nation revenue within EUROPE by ship year (the classic
    // two-nation literal pair is vacuous on the synthetic fixture)
    "q371_volume_shipping" -> ((s, d) => Analytics.volumeShipping(s, d)),
    // Q8: supplier-nation revenue share for ASIA customers on PROMO
    // parts, per order year; ONE double division at the end
    "q372_market_share" -> ((s, d) => Analytics.marketShare(s, d)),
    // Q19: three OR'd (brand, size, quantity) bands — the disjunctive
    // pushdown shape, one (revenue, count) cell
    "q373_disjunctive_revenue" -> ((s, d) =>
      Analytics.disjunctiveRevenue(s, d)),
    // Q7 per micro-batch: nation-pair-year cells merge — shares q371's
    "q374_streaming_volume_shipping" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingVolumeShipping(s, d)),
    // Q19 per micro-batch: the single cell merges — shares q373's
    "q375_streaming_disjunctive_revenue" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingDisjunctiveRevenue(s, d)),
    // block 24: the declared data contract as queries — the audits a
    // training run is gated on
    // per (table, column) row/null counts, one aggregate pass per table
    "q376_completeness" -> ((s, d) => Audit.completeness(s, d)),
    // per declared key: rows/keys/dup keys (lineitem's composite key
    // is warn-grade: it genuinely does NOT hold on the fixture)
    "q377_key_uniqueness" -> ((s, d) => Audit.keyUniqueness(s, d)),
    // declared domain rules with severity; warn rules fire on the
    // fixture so the counts are non-vacuous
    "q378_domain_audit" -> ((s, d) => Audit.domainAudit(s, d)),
    // q376's documents rows per micro-batch (cells sum-merge)
    "q379_streaming_completeness" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingCompleteness(s, d)),
    // the one-row CI gate over all three audits: PASS iff zero
    // error-grade violations; warn findings report but never gate
    "q380_contract_gate" -> ((s, d) => Audit.contractGate(s, d)),
    // block 25: market-basket affinity — one (order, brand) grain
    // pair support + exact-integer lift (one double division at end)
    "q381_brand_affinity" -> ((s, d) => Basket.brandAffinity(s, d)),
    // symmetrized pairs ranked by lift within brand, top 3, ties
    // broken by partner name
    "q382_top_affinities" -> ((s, d) => Basket.topAffinities(s, d)),
    // distinct brands per order -> order-count histogram
    "q383_basket_sizes" -> ((s, d) => Basket.basketSizes(s, d)),
    // the (order, brand) grain distinct-merges per micro-batch —
    // shares q381's SQL
    "q384_streaming_brand_affinity" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingBrandAffinity(s, d)),
    // q383 off the same maintained state core — shares q383's SQL
    "q385_streaming_basket_sizes" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingBasketSizes(s, d)),
    // block 26: erasure / right-to-be-forgotten — the missing PII
    // lifecycle step (r13 verdict #1). Deterministic request:
    // doc_id % 37 == 0
    // blast radius per surface (documents / embeddings / dup-edge
    // artifact) — reads the shared artifact, never re-bands
    "q386_erasure_plan" -> ((s, d) =>
      graft.streaming.Erasure.erasurePlan(s, d)),
    // ledger rewrite: erased keys dropped as a NEW committed version,
    // tombstone-first; drained per source
    "q387_erasure_execute" -> ((s, d) =>
      graft.streaming.Erasure.erasureExecute(s, d)),
    // the version trail the request leaves: 3 batch prefixes + the
    // rewrite (same batch id, fewer rows)
    "q388_erasure_manifest" -> ((s, d) =>
      graft.streaming.Erasure.erasureManifest(s, d)),
    // post-erasure audit: state == retained, erased gone, full-outer
    "q389_erasure_conservation" -> ((s, d) =>
      graft.streaming.Erasure.erasureConservation(s, d)),
    // dup-edge artifact invalidation: fingerprint-driven rebuild over
    // the retained corpus + the exact edge-conservation identity
    "q390_erasure_artifact_rebuild" -> ((s, d) =>
      graft.streaming.Erasure.artifactRebuild(s, d)),
    // ANN index maintenance with deletes (r13 verdict #3): the q149
    // maintained lists + tombstone-first delete + compaction rewrite
    // per-list census after the delete (survivors + removed mass)
    "q391_ivf_delete_maintenance" -> ((s, d) =>
      graft.streaming.AnnMaintenance.ivfDeleteMaintenance(s, d)),
    // delete-then-query: top-10 nprobe=2 through the COMPACTED lists —
    // a surviving deleted vector would break the hash
    "q392_ivf_delete_then_query" -> ((s, d) =>
      graft.streaming.AnnMaintenance.deleteThenQuery(s, d)),
    // q380's CI gate off maintained documents state (all three audit
    // facets merge exactly) — shares q380's SQL
    "q393_streaming_contract_gate" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingContractGate(s, d)),
    // block 27: curriculum / data-ordering + curation budgeting
    // docs/tokens/share per fixed lexical-diversity band
    "q394_curriculum_phases" -> ((s, d) =>
      Curriculum.curriculumPhases(s, d)),
    // the deterministic pack order: per (phase, shard), (score,
    // doc_id)-ordered manifest with running token offset
    "q395_curriculum_manifest" -> ((s, d) =>
      Curriculum.curriculumManifest(s, d)),
    // greedy budgeted source selection (fractional-knapsack by quality
    // density), trajectory-oracled
    "q396_curation_optimizer" -> ((s, d) =>
      Curriculum.curationOptimizer(s, d)),
    // q394's cells sum-merge per micro-batch — shares q394's SQL
    "q397_streaming_curriculum_mass" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingCurriculumMass(s, d)),
    // q178's chop in curriculum order, per-shard boundary audit
    "q398_curriculum_packed" -> ((s, d) =>
      Curriculum.curriculumPacked(s, d)),
    // block 28: retrieval evaluation on label relevance (exact ground
    // truth, not an FP threshold)
    // P/R@10 per query, integer numerators
    "q399_retrieval_precision_recall" -> ((s, d) =>
      RetrievalEval.precisionRecall(s, d)),
    // first-relevant rank + reciprocal, per query (no FP mean)
    "q400_retrieval_mrr" -> ((s, d) => RetrievalEval.mrrTable(s, d)),
    // binary-gain NDCG@10 via fixed-order left folds
    "q401_retrieval_ndcg" -> ((s, d) => RetrievalEval.ndcgAt10(s, d)),
    // the q120 quantizer at nprobe=2 vs the brute top-10
    "q402_ivf_vs_brute" -> ((s, d) => RetrievalEval.ivfVsBrute(s, d)),
    // kNN majority-label prediction → confusion counts
    "q403_knn_confusion" -> ((s, d) => RetrievalEval.knnConfusion(s, d)),
    // block 29: user-scope erasure + retention (the reference's
    // user-keyed delete flows at GDPR scale; key % 97 == 0)
    // the FK cascade blast radius (customer → orders → lineitem →
    // events + contact exposure)
    "q404_user_cascade_plan" -> ((s, d) =>
      graft.streaming.UserErasure.cascadePlan(s, d)),
    // events registry ledger + USER tombstones (one tombstone row
    // kills every event the user ever produced, incl. late arrivals)
    "q405_user_erasure_execute" -> ((s, d) =>
      graft.streaming.UserErasure.userErasureExecute(s, d)),
    // the post-erasure certificate on the user surface
    "q406_user_erasure_certificate" -> ((s, d) =>
      graft.streaming.UserErasure.userErasureCertificate(s, d)),
    // time-based retention as a pure predicate rewrite (idempotent)
    "q407_retention_rewrite" -> ((s, d) =>
      graft.streaming.UserErasure.retentionRewrite(s, d)),
    // what the cascade deletes in value terms, per erased customer
    "q408_cascade_value_mass" -> ((s, d) =>
      graft.streaming.UserErasure.cascadeValueMass(s, d)),
    // block 30: join planning + derived-view retraction
    // per FK edge: volumes, key cardinality, skew, strategy rule
    "q409_join_stats_planner" -> ((s, d) =>
      JoinPlanner.joinStatsPlanner(s, d)),
    // Q1 cells after the cascade via a NEGATIVE delta merge — the
    // oracle recomputes over retained rows, hash equality proves the
    // delta algebra exact
    "q410_retractable_pricing" -> ((s, d) =>
      Retraction.retractablePricing(s, d)),
    // the distinct (order, brand) grain retracts by anti-join
    "q411_retractable_affinity" -> ((s, d) =>
      Retraction.retractableAffinity(s, d)),
    // block 31: cross-split n-gram contamination (benchmark
    // decontamination at w=15, the q174 window machinery over the
    // q136 split rule)
    // per source: train docs sharing a window with test + share
    "q412_contamination_matrix" -> ((s, d) =>
      Contamination.contaminationMatrix(s, d)),
    // the purge work list: leaked spans removed, kept text hashed
    "q413_contamination_purge" -> ((s, d) =>
      Contamination.contaminationPurge(s, d)),
    // per source: docs touched, token mass before/after/lost
    "q414_contamination_summary" -> ((s, d) =>
      Contamination.purgeSummary(s, d)),
    // q414 off maintained cells vs the stored test window artifact —
    // shares q414's SQL
    "q415_streaming_contamination" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingContamination(s, d)),
    // block 32: physical layout & skew advisors (the scale knobs this
    // library sets by config, computed as regenerable artifacts)
    // per-source writer/file sizing at a fixed payload budget
    "q416_partition_plan" -> ((s, d) => Layout.partitionPlan(s, d)),
    // hot-key salting fan-out (event_type — the skewed key here)
    "q417_salt_plan" -> ((s, d) => Layout.saltPlan(s, d)),
    // per-relation shuffle-task sizing (the planning-time view of
    // what AQE coalescing approximates at runtime)
    "q418_shuffle_advisor" -> ((s, d) => Layout.shuffleAdvisor(s, d)),
    // block 33: PSI drift between train/test splits on the curriculum
    // difficulty bands
    "q419_psi_bands" -> ((s, d) => Psi.psiBands(s, d)),
    // fixed-band-order left fold + the standard 0.1/0.25 read
    "q420_psi_total" -> ((s, d) => Psi.psiTotal(s, d)),
    // (band, split) cells sum-merge — shares q419's SQL
    "q421_streaming_psi" -> ((s, d) => Psi.streamingPsi(s, d)),
    // the release datasheet: volume, splits, dup/quality/PII/
    // contamination mass — every fact its home family's exact
    // arithmetic, one consistent snapshot
    "q422_dataset_card" -> ((s, d) => DatasetCard.datasetCard(s, d)),
    // block 35: Gopher-style repetition/boilerplate screens
    // the work list: docs failing any declared rule
    "q423_repetition_screen" -> ((s, d) =>
      Repetition.repetitionScreen(s, d)),
    // per source: rule failures + pass rate
    "q424_repetition_rollup" -> ((s, d) => Repetition.screenRollup(s, d)),
    // cells sum-merge — shares q424's SQL
    "q425_streaming_repetition" -> ((s, d) =>
      Repetition.streamingScreen(s, d)),
    // round 15, block 36: incremental erased-artifact maintenance —
    // O(incident + boundary) update of the stored dup-edge relation
    // instead of q390's full re-band; hash equality with the oracle's
    // independent capped-chain re-derivation IS the rebuild proof
    "q426_dup_edges_incremental" -> ((s, d) =>
      Dedup.dupEdgesErasedIncremental(s, d, 37)
        .orderBy(org.apache.spark.sql.functions.col("id_a"),
          org.apache.spark.sql.functions.col("id_b"))),
    // the maintenance algebra census: incident mass, cap boundary,
    // repairs, and the q390 conservation flag
    "q427_dup_edges_incremental_census" -> ((s, d) =>
      Dedup.dupEdgesIncrementalCensus(s, d)),
    // block 37: ledger vacuum — physical deletion of retired versions
    // (erased rows were still time-travel-readable; the r14 #2 hole)
    "q428_vacuum_manifest" -> ((s, d) =>
      graft.streaming.Erasure.vacuumManifest(s, d)),
    // every version still on disk post-vacuum, with erased-readable
    // counts — the physical-completeness certificate
    "q429_vacuum_erasure_audit" -> ((s, d) =>
      graft.streaming.Erasure.vacuumAudit(s, d)),
    // block 38: ONE data-subject request fanned across every state
    // surface (three ledgers, the artifact, both derived-view
    // algebras), certified in one conservation table
    "q430_erasure_certificate" -> ((s, d) =>
      graft.streaming.ErasureOrchestrator.certificate(s, d)),
    // block 39: ledger schema evolution — widen-and-backfill fold
    // (batch 1 adds a column mid-stream; unionByName died here before)
    "q431_schema_evolution_manifest" -> ((s, d) =>
      graft.streaming.SchemaEvolution.schemaManifest(s, d)),
    // the widened state: late-added column populated for post-drift
    // rows only, NULL backfill excluded from both count and sum
    "q432_schema_evolution_drain" -> ((s, d) =>
      graft.streaming.SchemaEvolution.evolvedDrain(s, d)),
    // block 40: ANN rebalance after deletes — survivors re-assigned
    // against the refreshed 8-list quantizer; flow census + search
    // parity at equal probed fraction
    "q433_ann_rebalance_census" -> ((s, d) =>
      graft.streaming.AnnMaintenance.rebalanceCensus(s, d)),
    "q434_ann_rebalance_parity" -> ((s, d) =>
      graft.streaming.AnnMaintenance.rebalanceRecallParity(s, d)),
    // block 41: exact sign-test significance over the retrieval suite
    // — paired hits table + integer-exact two-sided binomial verdict
    "q435_retrieval_signtest_table" -> ((s, d) =>
      SignTest.signTable(s, d)),
    "q436_retrieval_signtest_summary" -> ((s, d) =>
      SignTest.signSummary(s, d)),
    // block 42: the engine must plan exactly what q409 recommends when
    // driven as recommended — actual operator read from the physical
    // plan, salting detected from the join keys
    "q437_plan_conformance" -> ((s, d) =>
      PlanConformance.planConformance(s, d)),
    // block 43: the release-to-release changelog — card facts at the
    // previous snapshot (ledger version 1's content) vs the current
    // corpus, per-fact delta
    "q438_dataset_card_diff" -> ((s, d) =>
      DatasetCard.datasetCardDiff(s, d)),
    // block 44: zone-map data skipping + Z-order clustering — the
    // row-order half of the layout story (q416–q418 size files and
    // shuffles; these decide what goes IN each file)
    "q439_zonemap_stats" -> ((s, d) => ZoneMap.zonemapStats(s, d)),
    "q440_zonemap_skip_audit" -> ((s, d) =>
      ZoneMap.zonemapSkipAudit(s, d)),
    "q441_zorder_skip_audit" -> ((s, d) =>
      ZoneMap.zorderSkipAudit(s, d)),
    // block 45: optimistic concurrency for versioned ledgers — the
    // multi-writer commit protocol (atomic rename claim, conflict
    // check over written key sets, rebase-or-abort)
    "q442_occ_audit" -> ((s, d) =>
      graft.streaming.Occ.occAudit(s, d)),
    "q443_occ_final_state" -> ((s, d) =>
      graft.streaming.Occ.occFinalState(s, d)),
    // block 46: k-anonymity / l-diversity — re-identification risk of
    // the rows a release KEEPS (the PII/erasure families cover what
    // it finds/deletes)
    "q444_kanon_audit" -> ((s, d) => Anonymity.kanonAudit(s, d)),
    "q445_kanon_generalize" -> ((s, d) =>
      Anonymity.kanonGeneralize(s, d)),
    "q446_ldiversity" -> ((s, d) => Anonymity.lDiversity(s, d)),
    // block 47: zone-map maintenance on append + the advisor that
    // closes block 44's loop (audit every candidate layout, recommend
    // the argmin)
    "q447_zonemap_incremental" -> ((s, d) =>
      ZoneMap.zonemapIncremental(s, d)),
    "q448_zonemap_batched_stats" -> ((s, d) =>
      ZoneMap.zonemapBatchedStats(s, d)),
    "q449_cluster_key_advisor" -> ((s, d) =>
      ZoneMap.clusterKeyAdvisor(s, d)),
    // block 48: multi-table atomic commit — one manifest pointer
    // spans two ledgers; a crash between version writes can never
    // produce a torn snapshot
    "q450_multitable_manifest" -> ((s, d) =>
      graft.streaming.MultiTable.multitableManifest(s, d)),
    "q451_multitable_snapshot" -> ((s, d) =>
      graft.streaming.MultiTable.multitableSnapshot(s, d)),
    // block 49: change data feed — the version trail as typed change
    // rows (insert/update/delete with old+new), and the consumer-side
    // replay that reconstructs the final state from them
    "q452_change_feed" -> ((s, d) =>
      graft.streaming.ChangeFeed.registryChangeFeed(s, d)),
    "q453_occ_change_feed" -> ((s, d) =>
      graft.streaming.ChangeFeed.occChangeFeed(s, d)),
    "q454_change_feed_replay" -> ((s, d) =>
      graft.streaming.ChangeFeed.changeFeedReplay(s, d)),
    // block 50: streaming k-anonymity — one maintained QI cell state
    // serves the whole ladder and the l-diversity facet at drain
    "q455_streaming_kanon" -> ((s, d) =>
      graft.streaming.AnonymityState.streamingKanonLadder(s, d)),
    "q456_streaming_ldiversity" -> ((s, d) =>
      graft.streaming.AnonymityState.streamingLDiversity(s, d)),
    // block 51: close two loops — OCC conflict checks read the
    // change set stored atomically inside each version (parity with
    // diff recovery), and the k-anonymity audit gets its release
    // executor (suppression census)
    "q457_occ_changeset_parity" -> ((s, d) =>
      graft.streaming.Occ.occChangesetParity(s, d)),
    "q458_kanon_release" -> ((s, d) => Anonymity.kanonRelease(s, d)),
    // block 52: partition-spec evolution — old files keep their spec,
    // new files carry the evolved one, reads prune each by its own
    "q459_partition_evolution_manifest" -> ((s, d) =>
      PartitionEvolution.partitionEvolutionManifest(s, d)),
    "q460_partition_evolution_scan" -> ((s, d) =>
      PartitionEvolution.partitionEvolutionScan(s, d)),
    // block 53: small-file compaction — the OPTIMIZE work list over
    // append tails and the metadata-only zone-map rewrite after it
    "q461_compaction_plan" -> ((s, d) => ZoneMap.compactionPlan(s, d)),
    "q462_compaction_zonemap" -> ((s, d) =>
      ZoneMap.compactionZonemap(s, d)),
    // block 54: deletion vectors — merge-on-read deletes (write the
    // deleted keys per file, defer the rewrite), with union-merge
    // maintenance across requests
    "q463_dv_census" -> ((s, d) => DeletionVectors.dvCensus(s, d)),
    "q464_dv_read_parity" -> ((s, d) =>
      DeletionVectors.dvReadParity(s, d)),
    "q465_dv_merge_census" -> ((s, d) =>
      DeletionVectors.dvMergeCensus(s, d)),
    // block 55: bloom file skipping (point lookups on scattered
    // keys — the case zone maps and partitions can't prune) + the
    // materialized-view rewrite law
    "q466_bloom_file_skipping" -> ((s, d) =>
      BloomSkipping.bloomFileSkipping(s, d)),
    "q467_mv_rewrite_parity" -> ((s, d) =>
      BloomSkipping.mvRewriteParity(s, d)),
    // block 56: pseudonymization — keyed tokens keep analytical
    // utility, the escrow mapping is the lawful way back
    "q468_pseudonymize_census" -> ((s, d) =>
      Pseudonymize.pseudonymizeCensus(s, d)),
    "q469_token_histogram_parity" -> ((s, d) =>
      Pseudonymize.tokenHistogramParity(s, d)),
    "q470_escrow_roundtrip" -> ((s, d) =>
      Pseudonymize.escrowRoundtrip(s, d)),
    // block 57: CDF-driven incremental view maintenance — block 49's
    // feed applied to a (source) aggregate view, parity with recompute
    "q471_mv_incremental_parity" -> ((s, d) =>
      graft.streaming.ChangeFeed.mvIncrementalParity(s, d)),
    // block 58: row-level security + column masking — per-principal
    // views of one stored table, no per-role copies
    "q472_rls_mask_audit" -> ((s, d) => Governance.rlsMaskAudit(s, d)),
    "q473_masked_release" -> ((s, d) => Governance.maskedRelease(s, d)),
    // block 59: shallow clone — zero-copy branch of a ledger; an
    // erasure rehearsal on the branch never touches the source
    "q474_clone_divergence" -> ((s, d) =>
      graft.streaming.ShallowClone.cloneDivergence(s, d)),
    "q475_clone_storage_audit" -> ((s, d) =>
      graft.streaming.ShallowClone.cloneStorageAudit(s, d)),
    // block 60: the OPTIMIZE-cadence number (fresh vs stale vs no
    // clustering) and the ANALYZE-stats artifact
    "q476_zorder_staleness" -> ((s, d) =>
      ZoneMap.zorderStalenessAudit(s, d)),
    "q477_table_stats" -> ((s, d) => Layout.tableStats(s, d)),
    // block 61: DV-triggered compaction — when the deferred rewrite
    // debt gets paid, per file
    "q478_dv_compaction_plan" -> ((s, d) =>
      DeletionVectors.dvCompactionPlan(s, d)),
    "q479_dv_compaction_state" -> ((s, d) =>
      DeletionVectors.dvCompactionState(s, d)),
    // block 62: preference-data QA — pairwise win matrix + Condorcet
    // cycle witnesses (intransitive majorities no reward model fits)
    "q480_preference_matrix" -> ((s, d) =>
      Preference.preferenceMatrix(s, d)),
    "q481_preference_cycles" -> ((s, d) =>
      Preference.preferenceCycles(s, d)),
    // block 63: canonical re-election after a takedown — clusters
    // whose kept representative is erased elect a new one
    "q482_canonical_reelection" -> ((s, d) =>
      graft.streaming.Erasure.canonicalReelection(s, d)),
    // blocks 64–65: backup/export integrity (order-independent
    // additive checksums, restore parity) and the tamper-evident
    // hash-chained version trail
    "q483_export_manifest" -> ((s, d) =>
      graft.streaming.Integrity.exportManifest(s, d)),
    "q484_restore_parity" -> ((s, d) =>
      graft.streaming.Integrity.restoreParity(s, d)),
    "q485_ledger_hash_chain" -> ((s, d) =>
      graft.streaming.Integrity.ledgerHashChain(s, d)),
    // block 66: CDF served from stored per-commit change sets — the
    // diff demoted to this parity audit (r15 verdict #3)
    "q486_cdf_storage_parity" -> ((s, d) =>
      graft.streaming.ChangeFeed.cdfStorageParity(s, d)),
    // block 67: the OPTIMIZE executor — fold DVs, re-cluster by the
    // advisor's layout, prove rows_scanned dropped (r15 verdict #1)
    "q487_optimize_audit" -> ((s, d) => Optimize.optimizeAudit(s, d)),
    "q488_optimize_zonemap" -> ((s, d) =>
      Optimize.optimizeZonemap(s, d)),
    // block 68: schema evolution beyond adds — declared column
    // renames absorbed at ingest, int→long widening by union
    // coercion, old versions never rewritten (r15 verdict #7)
    "q489_schema_rename_widen_manifest" -> ((s, d) =>
      graft.streaming.SchemaEvolution.renameWidenManifest(s, d)),
    "q490_schema_rename_widen_drain" -> ((s, d) =>
      graft.streaming.SchemaEvolution.renameWidenDrain(s, d)),
    // block 69: cadence-triggered incremental re-cluster — the q476
    // staleness row acted on at O(tail) rewrite cost
    "q491_incremental_recluster" -> ((s, d) =>
      ZoneMap.incrementalReclusterAudit(s, d)),
    // block 70: branch merge — a clean rehearsal PROMOTED into the
    // source via the OCC discipline at branch grain
    "q492_branch_merge_audit" -> ((s, d) =>
      graft.streaming.ShallowClone.branchMergeAudit(s, d)),
    "q493_branch_merge_state" -> ((s, d) =>
      graft.streaming.ShallowClone.branchMergeState(s, d)),
    // block 71: unified AS OF (version + batch axes) composed with
    // the RLS/masking layer
    "q494_asof_governed_balances" -> ((s, d) =>
      graft.streaming.TimeTravel.asOfGovernedBalances(s, d)),
    "q495_asof_batch_registry" -> ((s, d) =>
      graft.streaming.TimeTravel.asOfBatchRegistry(s, d)),
    // block 72: commit-time contract enforcement — the 'error' rule
    // gates the fold, violations quarantine to a dead-letter ledger
    "q496_gated_commit_manifest" -> ((s, d) =>
      graft.streaming.GatedCommit.gatedCommitManifest(s, d)),
    "q497_dead_letter_census" -> ((s, d) =>
      graft.streaming.GatedCommit.deadLetterCensus(s, d)),
    // block 73: changelog compaction — the net change set a
    // bootstrapping consumer applies instead of the full history
    "q498_cdf_net_changes" -> ((s, d) =>
      graft.streaming.ChangeFeed.cdfNetChanges(s, d)),
    // block 74: orphan detection + GC beside vacuum — crashed-writer
    // strands and stray files classified, then removed, committed
    // versions provably intact
    "q499_orphan_audit" -> ((s, d) =>
      graft.streaming.Orphans.orphanAudit(s, d)),
    "q500_orphan_gc_state" -> ((s, d) =>
      graft.streaming.Orphans.orphanGcState(s, d)),
    // block 75: multi-table branch + atomic merge — two shallow
    // clones rehearse one coordinated change, landed by ONE manifest
    "q501_multibranch_merge_audit" -> ((s, d) =>
      graft.streaming.MultiTable.multiBranchMergeAudit(s, d)),
    "q502_multibranch_torn_read" -> ((s, d) =>
      graft.streaming.MultiTable.multiBranchTornRead(s, d)),
    // block 76: the restore executor — rebuild a usable ledger from
    // the export, chain-equal to the source link by link
    "q503_restore_executor" -> ((s, d) =>
      graft.streaming.Integrity.restoreExecutor(s, d)),
    // block 77: the ANALYZE cadence — when the q409 stats artifact
    // stops being trustworthy
    "q504_stats_staleness" -> ((s, d) =>
      JoinPlanner.statsStalenessAudit(s, d)),
    // block 78: merge-on-read time travel — epoch-pinned DV reads
    "q505_dv_asof_census" -> ((s, d) =>
      DeletionVectors.dvAsOfCensus(s, d)),
    // block 79: the governed release bundle — masked export certified
    // from the exported bytes
    "q506_governed_export" -> ((s, d) =>
      graft.streaming.Integrity.governedExportManifest(s, d)),
    // block 81: the DSv2 lake provider — the stored zone-map/bloom
    // artifacts consumed by planInputPartitions, so skipping prunes
    // REAL parquet files (r16 verdict #1)
    "q507_lake_pruned_revenue" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakePrunedRevenue(s, d)),
    "q508_lake_plan_audit" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakePlanAudit(s, d)),
    "q509_lake_bloom_probe" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeBloomProbes(s, d)),
    // block 82: OCC under GENUINE concurrency — 7 writer threads race
    // stage → check → rename against one ledger; the end state is
    // deterministic under every interleaving (r16 verdict #2)
    "q510_occ_race_census" -> ((s, d) =>
      graft.streaming.Occ.occRaceCensus(s, d)),
    "q511_occ_race_state" -> ((s, d) =>
      graft.streaming.Occ.occRaceState(s, d)),
    // block 84: the wall-clock AS OF axis — versions carry recorded
    // commit timestamps; reads resolve by instant, tie-break to the
    // highest version, retention floor named on under-floor asks
    // (r16 verdict #3)
    "q512_asof_time_registry" -> ((s, d) =>
      graft.streaming.TimeTravel.asOfTimeRegistry(s, d)),
    "q513_asof_time_governed" -> ((s, d) =>
      graft.streaming.TimeTravel.asOfTimeGovernedBalances(s, d)),
    // block 85: the gate consumes the DECLARED rule catalog — rules
    // are versioned data (a contract change is a commit), error rules
    // quarantine naming the catalog version, warn rules annotate
    // (r16 verdict #5)
    "q514_gated_warn_annotations" -> ((s, d) =>
      graft.streaming.GatedCommit.gatedWarnAnnotations(s, d)),
    // block 86: point-in-time restore — a ledger rebuilt TRUNCATED at
    // version N from the backup, chain-certified, failing loudly when
    // N precedes the backup's retention floor (r16 verdict #6)
    "q515_pitr_restore" -> ((s, d) =>
      graft.streaming.Integrity.pitrRestore(s, d)),
    // block 87: branch-aware CDF — the feed served ACROSS a merge
    // from the merge commit's stored change set; a subscriber cannot
    // tell a promoted rehearsal from a trunk-direct execution
    "q516_branch_cdf_feed" -> ((s, d) =>
      graft.streaming.ChangeFeed.branchMergeFeed(s, d)),
    "q517_branch_cdf_replay" -> ((s, d) =>
      graft.streaming.ChangeFeed.branchMergeFeedReplay(s, d)),
    // block 88: multi-tenant governed export bundles — one bundle per
    // role under its own policy, certified per (role, region) from
    // the exported masked bytes
    "q518_governed_export_bundles" -> ((s, d) =>
      graft.streaming.Integrity.governedExportBundles(s, d)),
    // block 89: OPTIMIZE for versioned ledgers — the head rewritten
    // size-bounded as a rewrite version (retired batch id carried,
    // empty declared change set → CDF-silent), telemetry-gated
    "q519_ledger_optimize_audit" -> ((s, d) =>
      graft.streaming.LedgerOptimize.ledgerOptimizeAudit(s, d)),
    "q520_ledger_optimize_trail" -> ((s, d) =>
      graft.streaming.LedgerOptimize.ledgerOptimizeTrail(s, d)),
    // block 90: IN-list + LIMIT pushdown on the lake provider — the
    // point-lookup-batch and preview patterns planned from metadata
    "q521_lake_in_probe" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeInProbe(s, d)),
    "q522_lake_limit_audit" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeLimitAudit(s, d)),
    // block 91: the lake format is SCHEMA-GENERAL — a second table
    // instance (documents, five columns incl. the wide text) through
    // the same provider, with parquet projection pushdown keeping
    // unrequested columns undecoded
    "q523_lake_docs_pruned" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeDocsPruned(s, d)),
    "q524_lake_docs_plan" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeDocsPlanAudit(s, d)),
    // block 92: versioned manifest snapshots + the APPEND executor on
    // the lake format — old files never touched, time travel through
    // the provider (versionAsOf)
    "q525_lake_append_audit" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeAppendAudit(s, d)),
    "q526_lake_asof_scan" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeAsOfScan(s, d)),
    // block 93: merge-on-read DELETES on the lake format — positional
    // deletion vectors committed as a snapshot, masked by the reader,
    // time travel across the delete
    "q527_lake_dv_audit" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeDvAudit(s, d)),
    "q528_lake_dv_pruned_scan" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeDvPrunedScan(s, d)),
    // block 94: OPTIMIZE on the lake format — snapshot v3 folds the
    // DV debt into fresh re-clustered files; time travel keeps v0-v2
    "q529_lake_optimize_snapshot" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeOptimizeSnapshot(s, d)),
    "q530_lake_optimize_scan_parity" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeOptimizeScanParity(s, d)),
    // block 94b: snapshot expiry — the vacuum side of the format's
    // time travel: unreferenced files physically deleted, pinned
    // reads below the floor fail naming the committed range
    "q531_lake_expire_audit" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeExpireAudit(s, d)),
    // block 95: the lake type system — a TPC-H-shaped lineitem fact
    // table on the format with decimal money, DATE, TIMESTAMP_NTZ,
    // DOUBLE and INT columns; zones on all five ordered encodings
    "q532_lake_lineitem_q6" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeLineitemQ6(s, d)),
    "q533_lake_types_plan" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeTypesPlanAudit(s, d)),
    // block 96: the DSv2 write path — df.write.format(lake) APPEND
    // commits snapshots through stage→claim-rename→manifest, batch-id
    // keyed so a replayed commit is a no-op
    "q534_lake_write_audit" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeWriteAudit(s, d)),
    "q535_lake_write_pruned" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeWritePruned(s, d)),
    // block 97: declared partitioning on the lake — day(ts) pvals in
    // the manifest, M3's replay-overwrite as an atomic partition
    // replace, partition×zone×bloom plan composition
    "q536_lake_part_replace" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakePartReplace(s, d)),
    "q537_lake_part_plan" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakePartPlanAudit(s, d)),
    // block 98: concurrent lake writers — 6 disjoint appenders + a
    // late duplicate + a racing OPTIMIZE on one root; deterministic
    // end state under every interleaving
    "q538_lake_race_census" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeRaceCensus(s, d)),
    "q539_lake_race_state" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeRaceState(s, d)),
    // block 99: streaming sink into the lake — foreachBatch appends
    // snapshots batch-id-keyed; a replayed micro-batch no-ops
    "q540_lake_stream_audit" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeStreamAudit(s, d)),
    "q541_lake_stream_twin" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeStreamTwin(s, d)),
    // block 100: schema evolution on the manifest — add column +
    // int->long widen, data never rewritten, AS OF across the boundary
    "q542_lake_evolution_audit" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeEvolutionAudit(s, d)),
    // block 101: the ledgers UNIFIED with the lake — versioned-ledger
    // state reads (AS OF q512/q513, CDF diff q452/q486) go through
    // LakeTableProvider over footer-bridged manifests
    "q543_lake_ledger_head" -> ((s, d) =>
      graft.sources.lake.LakeLedger.lakeLedgerHead(s, d)),
    // block 102: aggregate pushdown on the lake provider — global
    // COUNT/MIN/MAX answered from the committed manifest (zero data
    // files opened), with the DV / filtered / grouped fallbacks
    "q544_lake_agg_pushdown" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeAggPushdown(s, d)),
    "q545_lake_agg_matrix" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeAggMatrix(s, d)),
    // block 103: reported statistics on the lake scan — post-pruning
    // manifest row counts steer Catalyst's broadcast build side
    "q546_lake_stats_plan" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeStatsPlan(s, d)),
    "q547_lake_stats_join" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeStatsJoin(s, d)),
    // block 104: MERGE INTO on the lake — copy-on-write upsert,
    // zone/bloom candidate pruning, touched-only rewrite, replay-safe
    "q548_lake_merge_state" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeMergeState(s, d)),
    "q549_lake_merge_audit" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeMergeAudit(s, d)),
    // block 105: runtime file pruning — a selective dim's join keys
    // pushed into the fact scan at plan time (dynamic file pruning)
    "q550_lake_runtime_prune" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeRuntimePrune(s, d)),
    "q551_lake_runtime_join" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeRuntimeJoin(s, d)),
    // block 106: storage-partitioned joins — two identity(day)
    // co-partitioned lake tables join with ZERO shuffles
    "q552_lake_spj_plan" -> ((s, d) =>
      graft.sources.lake.LakeSpj.lakeSpjPlan(s, d)),
    "q553_lake_spj_rollup" -> ((s, d) =>
      graft.sources.lake.LakeSpj.lakeSpjRollup(s, d)),
    // block 107: DSv2 appends to DECLARED-PARTITION tables — the
    // write demands day-clustered rows, one file per pval run
    "q554_lake_pwrite_audit" -> ((s, d) =>
      graft.sources.lake.LakeSpj.lakePwriteAudit(s, d)),
    "q555_lake_pwrite_pruned" -> ((s, d) =>
      graft.sources.lake.LakeSpj.lakePwritePruned(s, d)),
    // block 108: incremental (changes-since) reads — a manifest
    // set-diff serves only files added after a snapshot, append-only
    "q556_lake_changes_audit" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeChangesAudit(s, d)),
    "q557_lake_changes_matrix" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeChangesMatrix(s, d)),
    // block 109: the lake as a STREAMING SOURCE — offsets are
    // snapshot versions, each micro-batch a manifest diff
    "q558_lake_stream_source" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeStreamSource(s, d)),
    "q559_lake_stream_resume" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeStreamResume(s, d)),
    // block 110: DELETE FROM on the lake — predicate deletes as
    // merge-on-read deletion vectors, DV union on overlap
    "q560_lake_delete_audit" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeDeleteAudit(s, d)),
    "q561_lake_delete_state" -> ((s, d) =>
      graft.sources.lake.GraftLake.lakeDeleteState(s, d)),
    // block 111: the medallion loop on the format — cursor-tracked
    // changesFrom deltas folded into silver through MERGE
    "q562_lake_medallion_state" -> ((s, d) =>
      graft.sources.lake.LakeMedallion.lakeMedallionState(s, d)),
    "q563_lake_medallion_audit" -> ((s, d) =>
      graft.sources.lake.LakeMedallion.lakeMedallionAudit(s, d)),
    // block 112: vacuum for crash debris — file-grain orphan sweep,
    // referenced files safe at any age
    "q564_lake_vacuum_audit" -> ((s, d) =>
      graft.sources.lake.LakeVacuum.lakeVacuumAudit(s, d)),
    "q565_lake_vacuum_state" -> ((s, d) =>
      graft.sources.lake.LakeVacuum.lakeVacuumState(s, d)),
  )

  /** DuckDB oracle SQL, merged from the per-family objects in
    * `graft.oracles` (split when this file passed 1,900 lines). The
    * size check makes a duplicated key a construction-time failure
    * instead of a silent map override.
    */
  val oracleSql: Map[String, String] = {
    val parts = Seq(
      oracles.OracleEtl.sql, oracles.OracleRelational.sql,
      oracles.OracleText.sql, oracles.OracleDedup.sql,
      oracles.OracleAnn.sql, oracles.OracleStreamMedia.sql,
      oracles.OracleProvenance.sql, oracles.OracleSplits.sql,
      oracles.OracleContracts.sql, oracles.OracleErasure.sql,
      oracles.OracleCurriculum.sql, oracles.OracleRetrieval.sql,
      oracles.OracleUserErasure.sql, oracles.OraclePlanner.sql,
      oracles.OracleContamination.sql, oracles.OracleLayout.sql,
      oracles.OraclePsi.sql, oracles.OracleCard.sql,
      oracles.OracleRepetition.sql, oracles.OracleSchemaEvolution.sql,
      oracles.OracleZoneMap.sql, oracles.OracleOcc.sql,
      oracles.OracleAnonymity.sql, oracles.OracleMultiTable.sql,
      oracles.OracleChangeFeed.sql, oracles.OracleAnonymity.streamingSql,
      oracles.OracleAnonymity.releaseSql,
      oracles.OraclePartitionEvolution.sql,
      oracles.OracleDeletionVectors.sql, oracles.OracleBloomSkipping.sql,
      oracles.OraclePseudonymize.sql, oracles.OracleGovernance.sql,
      oracles.OraclePreference.sql, oracles.OracleIntegrity.sql,
      oracles.OracleLake.sql)
    val merged = parts.reduce(_ ++ _)
    require(merged.size == parts.map(_.size).sum,
      "duplicate oracle key across graft.oracles family objects")
    merged
  }
}
