package graft

import graft.crawl.CrawlQueries
import graft.ops.{Ann, Cluster, Dedup, Multimodal, Prep, TextOps}
import graft.relational.StarQueries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * Every operator family from SURVEY.md §2 has a query here; those whose
  * semantics are ANSI-SQL-expressible carry a DuckDB oracle in [[oracleSql]]
  * (the driver's correctness gate); hash-keyed ops (MinHash/SimHash/LSH) and
  * the full crawl are rows-only here and exactness-tested in ScalaTest
  * against their own oracles.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StarQueries.flagshipAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational surface (SURVEY §2.2-2.6)
    "q_flagship_agg"     -> ((s, d) => StarQueries.flagshipAgg(s, d)),
    "q_search_filter"    -> ((s, d) => StarQueries.searchFilter(s, d)),
    "q_point_lookup"     -> ((s, d) => StarQueries.pointLookup(s, d)),
    "q_topk_revenue"     -> ((s, d) => StarQueries.topkRevenue(s, d)),
    "q_window_rank"      -> ((s, d) => StarQueries.windowRank(s, d)),
    "q_semi_anti"        -> ((s, d) => StarQueries.semiAnti(s, d)),
    "q_upsert_merge"     -> ((s, d) => StarQueries.upsertMerge(s, d)),
    "q_interest_overlap" -> ((s, d) => StarQueries.interestOverlapTopk(s, d)),
    "q_agg_lineitem"     -> ((s, d) => StarQueries.aggLineitem(s, d)),
    "q_events_window"    -> ((s, d) => StarQueries.eventsWindow(s, d)),
    // text analysis (SURVEY §2.7 + training-data ops)
    "q_year_extract"     -> ((s, d) => TextOps.yearExtract(s, d)),
    "q_token_stats"      -> ((s, d) => TextOps.tokenStats(s, d)),
    "q_langid"           -> ((s, d) => TextOps.langId(s, d)),
    "q_quality_score"    -> ((s, d) => TextOps.qualityScore(s, d)),
    "q_fingerprint"      -> ((s, d) => TextOps.fingerprint(s, d)),
    "q_length_stats"     -> ((s, d) => TextOps.corpusLengthStats(s, d)),
    "q_tfidf_cosine"     -> ((s, d) => TextOps.tfidfCosine(s, d)),
    "q_text_search"      -> ((s, d) => relational.InvertedIndex.textSearch(s, d)),
    "q_corpus_prep"      -> ((s, d) => TextOps.corpusPrep(s, d)),
    // training-data preparation (redaction / mix sampling / packing /
    // repetition filters / decontamination / domain-mix quotas)
    "q_redact_pii"       -> ((s, d) => Prep.redactPii(s, d)),
    "q_sample_stratified" -> ((s, d) => Prep.sampleStratified(s, d)),
    "q_pack_sequences"   -> ((s, d) => Prep.packSequences(s, d)),
    "q_repetition_stats" -> ((s, d) => Prep.repetitionStats(s, d)),
    "q_decontaminate"    -> ((s, d) => Prep.decontaminate(s, d)),
    "q_domain_mix"       -> ((s, d) => Prep.domainMixCap(s, d)),
    "q_shuffle_shard"    -> ((s, d) => Prep.shuffleShard(s, d)),
    "q_boilerplate_grams" -> ((s, d) => Prep.boilerplateGrams(s, d)),
    "q_chunk_dedup"      -> ((s, d) => Prep.chunkDedup(s, d)),
    "q_vocab_encode"     -> ((s, d) => Prep.vocabEncode(s, d)),
    // dedup family
    "q_dedup_exact"      -> ((s, d) => Dedup.dedupExact(s, d)),
    "q_ngram_jaccard"    -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "q_dup_clusters"     -> ((s, d) => Dedup.dupClusters(s, d)),
    "q_dup_clusters_lsh" -> ((s, d) => Dedup.dupClustersLsh(s, d)),
    "q_minhash_lsh"      -> ((s, d) => Dedup.minhashLshPairs(s, d)),
    "q_simhash_pairs"    -> ((s, d) => Dedup.simhashPairs(s, d)),
    // similarity search. The headline ANN queries run FULL probe: every
    // bucket/cell of the materialized index is visited, so the result is
    // exact cosine top-k and the driver's DuckDB gate covers the whole
    // build→partitioned-write→pruned-probe path (r3 verdict ask #3). The
    // *_probe variants keep the production multi-probe path exercised by the
    // driver (recall < 1 by construction → rows-only; recall bounds and
    // probe-sequence properties live in OpsSpec).
    "q_cosine_topk"      -> ((s, d) => Ann.cosineTopk(s, d)),
    "q_ann_lsh"          -> ((s, d) => Ann.annLshTopkFull(s, d)),
    "q_ann_ivf"          -> ((s, d) => Ann.ivfTopkFull(s, d)),
    "q_ann_lsh_probe"    -> ((s, d) => Ann.annLshTopk(s, d)),
    "q_ann_ivf_probe"    -> ((s, d) => Ann.ivfTopk(s, d)),
    "q_embedding_neardup" -> ((s, d) => Ann.embeddingNearDup(s, d)),
    // semantic curation (full-corpus k-means + SemDeDup-style near-dup)
    "q_kmeans_clusters"  -> ((s, d) => Cluster.kmeansClusters(s, d)),
    "q_semantic_neardup" -> ((s, d) => Cluster.semanticNearDup(s, d)),
    // multimodal plumbing
    "q_media_meta"       -> ((s, d) => Multimodal.mediaMeta(s, d)),
    "q_media_frames"     -> ((s, d) => Multimodal.frameSample(s, d)),
    "q_media_decode_stub" -> ((s, d) => Multimodal.mediaDecodeStub(s, d)),
    // crawl operators (SURVEY §2.8)
    "q_url_canonicalize" -> ((s, d) => CrawlQueries.urlCanonicalize(s, d)),
    "q_frontier_select"  -> ((s, d) => CrawlQueries.frontierSelect(s, d)),
    "q_frontier_select_native" -> ((s, d) => CrawlQueries.frontierSelectNative(s, d)),
    "q_bloom_antijoin"   -> ((s, d) => CrawlQueries.bloomAntijoin(s, d)),
    "q_crawl_synthetic"  -> ((s, d) => CrawlQueries.crawlSynthetic(s, d)),
    "q_match_synthetic"  -> ((s, d) => CrawlQueries.matchSynthetic(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted for hash-keyed / engine-native ops
    * (q_minhash_lsh, q_simhash_pairs, the multi-probe q_ann_*_probe
    * variants, q_crawl_synthetic, q_match_synthetic) → driver records a
    * rows-only check; their exactness oracles live in the ScalaTest suites
    * (planted-dup recovery, multi-probe recall bounds, the crawl oracle).
    */
  def oracleSql: Map[String, String] = Map(
    "q_flagship_agg"     -> StarQueries.flagshipAggSql,
    "q_search_filter"    -> StarQueries.searchFilterSql,
    "q_point_lookup"     -> StarQueries.pointLookupSql,
    "q_topk_revenue"     -> StarQueries.topkRevenueSql,
    "q_window_rank"      -> StarQueries.windowRankSql,
    "q_semi_anti"        -> StarQueries.semiAntiSql,
    "q_upsert_merge"     -> StarQueries.upsertMergeSql,
    "q_interest_overlap" -> StarQueries.interestOverlapTopkSql,
    "q_agg_lineitem"     -> StarQueries.aggLineitemSql,
    "q_events_window"    -> StarQueries.eventsWindowSql,
    "q_year_extract"     -> TextOps.yearExtractSql,
    "q_token_stats"      -> TextOps.tokenStatsSql,
    "q_langid"           -> TextOps.langIdSql,
    "q_quality_score"    -> TextOps.qualityScoreSql,
    "q_fingerprint"      -> TextOps.fingerprintSql,
    "q_length_stats"     -> TextOps.corpusLengthStatsSql,
    "q_tfidf_cosine"     -> TextOps.tfidfCosineSql,
    "q_text_search"      -> relational.InvertedIndex.textSearchSql,
    "q_corpus_prep"      -> TextOps.corpusPrepSql,
    "q_redact_pii"       -> Prep.redactPiiSql,
    "q_sample_stratified" -> Prep.sampleStratifiedSql,
    "q_pack_sequences"   -> Prep.packSequencesSql(),
    "q_repetition_stats" -> Prep.repetitionStatsSql,
    "q_decontaminate"    -> Prep.decontaminateSql(),
    "q_domain_mix"       -> Prep.domainMixCapSql,
    "q_shuffle_shard"    -> Prep.shuffleShardSql,
    "q_boilerplate_grams" -> Prep.boilerplateGramsSql(),
    "q_chunk_dedup"      -> Prep.chunkDedupSql(),
    "q_vocab_encode"     -> Prep.vocabEncodeSql(),
    "q_dedup_exact"      -> Dedup.dedupExactSql,
    "q_ngram_jaccard"    -> Dedup.ngramJaccardSql,
    "q_dup_clusters"     -> Dedup.dupClustersSql,
    "q_cosine_topk"      -> Ann.cosineTopkSql,
    "q_ann_lsh"          -> Ann.cosineTopkSqlK(10),
    "q_ann_ivf"          -> Ann.cosineTopkSqlK(10),
    "q_embedding_neardup" -> Ann.embeddingNearDupSql,
    "q_kmeans_clusters"  -> Cluster.kmeansClustersSql(),
    "q_semantic_neardup" -> Cluster.semanticNearDupSql(),
    "q_media_decode_stub" -> Multimodal.mediaDecodeStubSql,
    "q_media_meta"       -> Multimodal.mediaMetaSql,
    "q_media_frames"     -> Multimodal.frameSampleSql,
    "q_url_canonicalize" -> CrawlQueries.urlCanonicalizeSql,
    "q_frontier_select"  -> CrawlQueries.frontierSelectSql,
    "q_frontier_select_native" -> CrawlQueries.frontierSelectSql,
    "q_bloom_antijoin"   -> CrawlQueries.bloomAntijoinSql
  )
}
