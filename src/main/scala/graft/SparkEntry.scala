package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{FinanceQueries, Relational, StreamQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to DataFrame
  * builders over a testdata scale-factor dir; `oracleSql` carries the
  * equivalent DuckDB SQL the driver hash-compares against. Column names and
  * value rounding are aligned pairwise — see Relational's scaladoc.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"   -> (Relational.q1PricingSummary _),
    "q2_filter_project"    -> (Relational.q2FilterProject _),
    "q3_broadcast_join"    -> (Relational.q3BroadcastJoin _),
    "q4_shuffle_join_agg"  -> (Relational.q4ShuffleJoinAgg _),
    "q5_semi_join"         -> (Relational.q5SemiJoin _),
    "q6_anti_join"         -> (Relational.q6AntiJoin _),
    "q7_window_cumsum"     -> (Relational.q7WindowCumsum _),
    "q8_window_topk"       -> (Relational.q8WindowTopkPerGroup _),
    "q9_pivot"             -> (Relational.q9Pivot _),
    "q10_rollup"           -> (Relational.q10Rollup _),
    "q11_distinct_agg"     -> (Relational.q11DistinctAgg _),
    "q12_topk"             -> (Relational.q12TopK _),
    "q13_union_dedup"      -> (Relational.q13UnionDedupKeepFirst _),
    "q14_string_predicates"-> (Relational.q14StringPredicates _),
    "q15_regex_extract"    -> (Relational.q15RegexExtract _),
    "q16_conditional_case" -> (Relational.q16ConditionalCase _),
    "q17_rule_cascade"     -> (Relational.q17RuleCascade _),
    "q18_fingerprint_sha2" -> (Relational.q18FingerprintSha2 _),
    "q19_json"             -> (Relational.q19Json _),
    "q20_tumbling_window"  -> (Relational.q20TumblingWindow _),
    "q21_date_functions"   -> (Relational.q21DateFunctions _),
    "q22_min_max"          -> (Relational.q22MinMax _),
    "q23_cents_bround"     -> (Relational.q23CentsBround _),
    "q24_german_number"    -> (Relational.q24GermanNumberParse _),
    "q25_token_stats"      -> (TextQueries.q25TokenStats _),
    "q26_quality_bands"    -> (TextQueries.q26QualityBands _),
    "q27_exact_dedup"      -> (TextQueries.q27ExactDedup _),
    "q28_ngram_jaccard"    -> (TextQueries.q28NgramJaccard _),
    "q29_minhash_lsh"      -> (TextQueries.q29MinhashLsh _),
    "q30_simhash"          -> (TextQueries.q30Simhash _),
    "q31_cosine_topk"      -> (TextQueries.q31CosineTopK _),
    "q32_ann_lsh"          -> (TextQueries.q32AnnLsh _),
    "q33_langid"           -> (TextQueries.q33LangId _),
    "q34_cosine_near_dup"  -> (TextQueries.q34CosineNearDup _),
    "q35_sessionization"   -> (StreamQueries.q35Sessionization _),
    "q36_sliding_window"   -> (StreamQueries.q36SlidingWindow _),
    "q37_binary_payload"   -> (TextQueries.q37BinaryPayload _),
    "q38_ing_pipeline"     -> (FinanceQueries.q38IngPipeline _),
    "q39_upsert_merge"     -> (FinanceQueries.q39UpsertMerge _),
    "q40_multimodal_decode"-> (TextQueries.q40MultimodalDecode _),
    "q41_rule_cascade_full"-> (FinanceQueries.q41RuleCascadeFull _),
    "q42_set_ops"          -> (Relational.q42SetOps _),
    "q43_frame_sample"     -> (TextQueries.q43FrameSample _),
    "q44_ivf_topk"         -> (TextQueries.q44IvfTopK _),
    "q45_audio_windows"    -> (TextQueries.q45AudioWindows _),
    "q46_lsh_near_dup"     -> (TextQueries.q46LshNearDup _),
    "q47_winnowing"        -> (TextQueries.q47Winnowing _),
    "q48_winnowing_pos"    -> (TextQueries.q48WinnowingPos _),
    "q49_dedup_groups"     -> (TextQueries.q49DedupGroups _),
    "q50_ivf_indexed"      -> (TextQueries.q50IvfIndexed _),
    "q51_contamination"    -> (TextQueries.q51Contamination _),
    "q52_stratified_sample"-> (TextQueries.q52StratifiedSample _),
    "q53_repetition"       -> (TextQueries.q53Repetition _),
    "q54_pii_redact"       -> (TextQueries.q54PiiRedact _),
    "q55_text_fold"        -> (TextQueries.q55TextFold _),
    "q56_sequence_packing" -> (TextQueries.q56SequencePacking _),
    "q57_asof_join"        -> (Relational.q57AsofJoin _),
    "q58_chunking"         -> (TextQueries.q58Chunking _),
    "q59_vocabulary"       -> (TextQueries.q59Vocabulary _),
    "q60_quantize"         -> (TextQueries.q60Quantize _),
    "q61_salted_join"      -> (Relational.q61SaltedJoin _),
    "q62_scd2_join"        -> (Relational.q62Scd2Join _),
    "q63_sessionize"       -> (Relational.q63Sessionize _),
    "q64_percentiles"      -> (Relational.q64Percentiles _),
    "q65_asof_forward"     -> (Relational.q65AsofForward _),
    "q66_interval_join"    -> (StreamQueries.q66IntervalJoin _),
    "q67_tfidf"            -> (TextQueries.q67TfIdf _),
    "q68_dedup_survivors"  -> (TextQueries.q68DedupSurvivors _),
    "q69_crossdoc_ngrams"  -> (TextQueries.q69CrossDocNgrams _),
    "q70_mixture_rebalance"-> (TextQueries.q70MixtureRebalance _),
    "q71_hll_distinct"     -> (Relational.q71HllDistinct _),
    "q72_bloom_join"       -> (Relational.q72BloomJoin _),
    "q73_shuffle"          -> (TextQueries.q73Shuffle _),
    "q74_cms_heavy_hitters"-> (Relational.q74CmsHeavyHitters _),
    "q75_kmeans_assign"    -> (TextQueries.q75KmeansAssign _),
    "q76_hist_percentiles" -> (Relational.q76HistPercentiles _),
    "q77_cube"             -> (Relational.q77Cube _),
    "q78_window_suite"     -> (Relational.q78WindowSuite _),
    "q79_windowed_distinct"-> (Relational.q79WindowedDistinct _),
    "q80_array_hof"        -> (Relational.q80ArrayHof _),
    "q81_exact_decontam"   -> (TextQueries.q81ExactDecontamination _),
    "q82_exact_substr"     -> (TextQueries.q82ExactSubstrSpans _),
    "q83_windowed_hll"     -> (Relational.q83WindowedHll _),
    "q84_pq_codes"         -> (TextQueries.q84PqCodes _),
    "q85_ivfpq_topk"       -> (TextQueries.q85IvfPqTopK _),
    "q86_streaming_asof"   -> (Relational.q86StreamingAsof _),
    "q87_resample_ffill"   -> (Relational.q87ResampleFfill _),
    "q88_quality_audit"    -> (Relational.q88QualityAudit _),
    "q89_funnel"           -> (Relational.q89Funnel _),
    "q90_windowed_cms"     -> (Relational.q90WindowedCms _),
    "q91_weighted_sample"  -> (TextQueries.q91WeightedSample _),
    "q92_pattern_match"    -> (Relational.q92PatternMatch _),
    "q93_retention"        -> (Relational.q93Retention _),
    "q94_zorder_key"       -> (Relational.q94ZOrderKey _),
    "q95_streaming_funnel" -> (Relational.q95StreamingFunnel _),
    "q96_grouped_topk"     -> (Relational.q96GroupedTopK _),
    "q97_cdc_apply"        -> (Relational.q97CdcApply _),
    "q98_pagerank"         -> (Relational.q98PageRank _),
    "q99_profile"          -> (Relational.q99Profile _),
    "q100_outliers"        -> (Relational.q100Outliers _),
    "q101_incremental_agg" -> (Relational.q101IncrementalAgg _),
    "q102_windowed_topk"   -> (Relational.q102WindowedTopk _),
    "q103_curation_pipeline" -> (TextQueries.q103CurationPipeline _),
    "q104_streaming_retention" -> (Relational.q104StreamingRetention _),
    "q105_describe_approx" -> (Relational.q105DescribeApprox _),
    "q106_graph_ann"       -> (TextQueries.q106GraphAnn _),
    "q107_semdedup"        -> (TextQueries.q107SemDedup _),
    "q108_bm25"            -> (TextQueries.q108Bm25 _),
    "q109_token_mixture"   -> (TextQueries.q109TokenMixture _),
    "q110_snapshot_travel" -> (Relational.q110SnapshotTimeTravel _),
    "q111_incremental_dedup" -> (TextQueries.q111IncrementalDedup _),
    "q112_image_resize"    -> (TextQueries.q112ImageResize _),
    "q113_random_projection" -> (TextQueries.q113RandomProjection _),
    "q114_unigram_nll"     -> (TextQueries.q114UnigramNll _),
    "q115_snapshot_diff"   -> (Relational.q115SnapshotDiff _),
    "q116_schema_evolution" -> (Relational.q116SchemaEvolution _),
    "q117_change_feed"     -> (Relational.q117ChangeFeed _),
    "q118_optimize"        -> (Relational.q118Optimize _),
    "q119_nsw_indexed"     -> (TextQueries.q119NswIndexed _),
    "q120_stats_pruned"    -> (Relational.q120StatsPrunedScan _),
    "q121_catalog_commit"  -> (Relational.q121CatalogCommit _),
    "q122_merge_into"      -> (Relational.q122MergeInto _),
    "q123_segmented_scan"  -> (Relational.q123SegmentedScan _),
    "q124_manifest_rewrite" -> (Relational.q124ManifestRewrite _),
    "q125_merge_on_read"   -> (Relational.q125MergeOnRead _),
    "q126_streaming_upsert" -> (Relational.q126StreamingUpsert _),
    "q127_bloom_index"     -> (Relational.q127BloomIndex _),
    "q128_format_pushdown" -> (Relational.q128FormatPushdown _),
    "q129_delete_where"    -> (Relational.q129DeleteWhere _),
    "q130_compact_small"   -> (Relational.q130CompactSmall _),
    "q131_layered_format"  -> (Relational.q131LayeredFormat _),
    "q132_catalog_sql"     -> (Relational.q132CatalogSqlJoin _),
    "q133_streaming_feed"  -> (Relational.q133StreamingFeed _),
    "q134_incr_recluster"  -> (Relational.q134IncrementalRecluster _),
    "q135_sql_dml"         -> (Relational.q135SqlDml _),
    "q136_sql_merge"       -> (Relational.q136SqlMerge _),
    "q137_sql_update"      -> (Relational.q137SqlUpdate _),
    "q138_named_stream"    -> (Relational.q138NamedStream _),
    "q139_meta_tables"     -> (Relational.q139MetaTables _),
    "q140_sql_changes"     -> (Relational.q140SqlChanges _),
    "q141_sql_colmap"      -> (Relational.q141SqlColmap _),
  )

  /** The cohort-retention-matrix oracle, shared by q93 (the batch
    * operator) and q104 (the streaming activation feed aggregated back
    * to the same matrix): first-event-day cohorts, distinct active days,
    * per-(cohort, offset) counts + rate.
    */
  private val RetentionMatrixSql: String =
    """WITH firsts AS (SELECT user_id,
             MIN(CAST(date_trunc('day', ts) AS DATE)) AS cohort
           FROM events GROUP BY 1),
         active AS (SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS DATE) AS p
           FROM events),
         cells AS (SELECT f.cohort,
             date_diff('day', f.cohort, a.p) AS "offset",
             CAST(COUNT(*) AS BIGINT) AS n_active
           FROM firsts f JOIN active a USING (user_id)
           GROUP BY 1, 2),
         sizes AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_cohort
           FROM firsts GROUP BY 1)
         SELECT c.cohort, c."offset", c.n_active, s.n_cohort,
           ROUND(CAST(c.n_active AS DOUBLE) / s.n_cohort, 4) AS ret_rate
         FROM cells c JOIN sizes s USING (cohort)
         ORDER BY c.cohort, c."offset""""

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         ROUND(SUM(l_quantity), 2) AS sum_qty,
         ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
         ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         ROUND(AVG(l_quantity), 2) AS avg_qty,
         ROUND(AVG(l_discount), 4) AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
         ROUND(l_extendedprice, 2) AS price
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1997-03-01 00:00:00'
           AND l_quantity < 3
         ORDER BY l_orderkey, l_linenumber""",
    "q3_broadcast_join" ->
      """SELECT r_name, COUNT(*) AS n_customers,
         ROUND(SUM(c_acctbal), 2) AS sum_acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q4_shuffle_join_agg" ->
      """SELECT o_orderpriority,
         ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         COUNT(*) AS n_items
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q5_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         ORDER BY c_custkey""",
    "q6_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 500000)
         ORDER BY c_custkey""",
    "q7_window_cumsum" ->
      """SELECT o_custkey, o_orderkey,
         ROUND(SUM(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
         FROM orders WHERE o_custkey < 50
         ORDER BY o_custkey, o_orderkey""",
    "q8_window_topk" ->
      """SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, rn
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
               FROM orders)
         WHERE rn <= 2 AND o_custkey < 100
         ORDER BY o_custkey, rn""",
    "q9_pivot" ->
      """SELECT o_orderpriority,
         ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0), 2) AS "F",
         ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0), 2) AS "O",
         ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0), 2) AS "P"
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q10_rollup" ->
      """SELECT COALESCE(r_name, '(all)') AS region,
         COALESCE(n_name, '(all)') AS nation,
         COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS sum_acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY region, nation""",
    "q11_distinct_agg" ->
      """SELECT COUNT(DISTINCT o_custkey) AS n_customers,
         COUNT(DISTINCT o_orderpriority) AS n_priorities,
         COUNT(*) AS n_orders FROM orders""",
    "q12_topk" ->
      """SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS totalprice
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q13_union_dedup" ->
      """WITH unioned AS (
           SELECT o_custkey, o_orderkey, 0 AS src FROM orders WHERE o_orderstatus = 'F'
           UNION ALL
           SELECT o_custkey, o_orderkey, 1 AS src FROM orders WHERE o_totalprice > 300000),
         ranked AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY src, o_orderkey) AS rn
           FROM unioned)
         SELECT o_custkey, o_orderkey, src FROM ranked WHERE rn = 1
         ORDER BY o_custkey""",
    "q14_string_predicates" ->
      """SELECT p_partkey, p_name, p_type FROM part
         WHERE contains(lower(COALESCE(p_name, '')), 'red')
           AND NOT p_type LIKE 'SMALL%'
           AND regexp_matches(COALESCE(p_name, ''), '(?i)(RED|BLUE) (widget|bolt|ring)')
         ORDER BY p_partkey""",
    "q15_regex_extract" ->
      """SELECT event_type,
         CAST(SUM(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
         COUNT(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q16_conditional_case" ->
      """SELECT event_type,
         CASE WHEN value > 150 THEN 'high'
              WHEN value > 50 THEN 'mid'
              ELSE 'low' END AS value_band,
         COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY event_type, value_band""",
    "q17_rule_cascade" ->
      """SELECT COALESCE(category, 'uncategorized') AS category, n FROM (
           SELECT CASE
             WHEN contains(lower(COALESCE(p_name, '')), 'small')  THEN 'cat_small'
             WHEN contains(lower(COALESCE(p_name, '')), 'bolt')   THEN 'cat_bolt'
             WHEN contains(lower(COALESCE(p_name, '')), 'widget') THEN 'cat_widget'
             WHEN contains(lower(COALESCE(p_name, '')), 'blue')   THEN 'cat_blue'
             WHEN contains(lower(COALESCE(p_name, '')), 'red')    THEN 'cat_red'
           END AS category, COUNT(*) AS n
           FROM part GROUP BY 1)
         ORDER BY category""",
    "q18_fingerprint_sha2" ->
      """SELECT o_orderkey, sha256(
           COALESCE(CAST(o_orderkey AS VARCHAR), '') || '|' ||
           COALESCE(o_orderstatus, '') || '|' ||
           COALESCE(strftime(o_orderdate, '%Y-%m-%d'), '') || '|' ||
           COALESCE(o_orderpriority, '')) AS fingerprint
         FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""",
    "q19_json" ->
      """SELECT event_type,
         ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
         CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q20_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
         COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
         FROM events
         WHERE date_trunc('hour', ts) < TIMESTAMP '2024-01-03 00:00:00'
         GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "q21_date_functions" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
         CAST(month(o_orderdate) AS INTEGER) AS m,
         COUNT(*) AS n, ROUND(SUM(ROUND(o_totalprice, 2)), 2) AS sum_price
         FROM orders GROUP BY 1, 2 ORDER BY y, m""",
    "q22_min_max" ->
      """SELECT MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date,
         CAST(COALESCE(MAX(CASE WHEN o_totalprice < 0 THEN o_orderkey END), 0) AS BIGINT) AS max_neg_key
         FROM orders""",
    "q23_cents_bround" ->
      """SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_cents
         FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""",
    "q24_german_number" ->
      """SELECT o_orderkey,
         CAST(replace(replace(replace(CAST(ROUND(o_totalprice, 2) AS VARCHAR), '.', ','),
                              '.', ''), ',', '.') AS DOUBLE) AS parsed
         FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""",
    "q25_token_stats" ->
      """SELECT lang,
         CAST(SUM(CASE WHEN len(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(lower(trim(text)), '\s+')) END)
              AS BIGINT) AS n_tokens,
         CAST(SUM(len(regexp_extract_all(lower(text),
              '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS n_bpe_tokens,
         COUNT(*) AS n_docs
         FROM documents GROUP BY lang ORDER BY lang""",
    "q26_quality_bands" ->
      """WITH sig AS (
           SELECT length(text) AS n_chars,
             len(string_split_regex(lower(trim(text)), '\s+')) AS n_words,
             CAST(length(text) - length(regexp_replace(text,
               '[.,!?;:''"()\[\]-]', '', 'g')) AS DOUBLE)
               / (CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END)
               AS punct_ratio,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
               AS DOUBLE)
               / (CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END)
               AS digit_ratio,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
               x -> list_contains(['the','and','of','to','in','is','that','it',
                 'for','on','with','as','a','an','at','by','be','this','are',
                 'was'], x))) AS DOUBLE)
               / (CASE WHEN len(string_split_regex(lower(trim(text)), '\s+')) = 0
                  THEN 1 ELSE len(string_split_regex(lower(trim(text)), '\s+')) END)
               AS stopword_ratio
           FROM documents),
         scored AS (
           SELECT stopword_ratio,
             greatest(0.0, least(1.0,
               (0.5 + stopword_ratio - punct_ratio * 2 - digit_ratio)
               * (CASE WHEN n_words >= 5 AND n_chars >= 20 THEN 1.0 ELSE 0.2 END)))
               AS score
           FROM sig)
         SELECT CASE WHEN score >= 0.7 THEN 'high'
                     WHEN score >= 0.4 THEN 'mid' ELSE 'low' END AS band,
           COUNT(*) AS n_docs,
           ROUND(AVG(score), 4) AS avg_score,
           ROUND(AVG(stopword_ratio), 4) AS avg_stopword_ratio
         FROM scored GROUP BY 1 ORDER BY band""",
    "q27_exact_dedup" ->
      """SELECT sha256(array_to_string(
           string_split_regex(lower(trim(text)), '\s+'), ' ')) AS fingerprint,
         CAST(MIN(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS n_docs
         FROM documents GROUP BY 1 ORDER BY fingerprint""",
    "q28_ngram_jaccard" ->
      """WITH d AS (SELECT doc_id,
             string_split_regex(lower(trim(text)), '\s+') AS w
           FROM documents),
         sh AS (SELECT doc_id, list_distinct(
             CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             ELSE list_transform(range(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
           FROM d),
         sizes AS (SELECT doc_id, len(s) AS n_sh FROM sh),
         post AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             COUNT(*) AS n_common
           FROM post a JOIN post b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b,
           ROUND(CAST(n_common AS DOUBLE)
             / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
         FROM inter
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b
         WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
         ORDER BY id_a, id_b""",
    // MinHash+LSH restated end-to-end in SQL: Karp–Rabin shingle hashes +
    // inlined permutation params (constants generated from the same code
    // the Spark expressions use — see OracleGen).
    "q29_minhash_lsh" -> OracleGen.q29Sql(),
    "q30_simhash" -> OracleGen.q30Sql(),
    "q31_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
           FROM embeddings),
         scored AS (SELECT query_id, neighbor_id,
             list_cosine_similarity(qv, cv) AS cos_sim
           FROM q, c WHERE query_id <> neighbor_id),
         ranked AS (SELECT query_id, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
           FROM scored)
         SELECT query_id, neighbor_id, ROUND(cos_sim, 4) AS cos_sim, rank
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",
    // Hyperplane-LSH ANN: dot-sign signature bits against inlined plane
    // constants, banded join, exact-cosine rank — fully SQL-expressible.
    "q32_ann_lsh" -> OracleGen.q32Sql(),
    "q44_ivf_topk" -> OracleGen.q44Sql(),
    // The serving-path probe is semantically identical to q44 by
    // construction (same centroids, probe selection, scoring) — the same
    // oracle hash-verifies the saved index's partitioned write + pruned
    // read end to end.
    "q50_ivf_indexed" -> OracleGen.q44Sql(),
    // Duplicate-cluster formation: the pair set is q28's posting-list
    // Jaccard formulation at t=0.8 (implementation-independent pair
    // semantics — the Spark side derives it via the PPJoin prefix path),
    // closed into components by a recursive CTE: reach(id, r) enumerates
    // every node r reachable from id over the symmetric edge set (UNION
    // dedup = fixpoint), and min(r) is the component label. Seeding from
    // ALL documents makes isolated docs singleton components, matching
    // the Spark side's `nodes` universe.
    "q49_dedup_groups" ->
      """WITH RECURSIVE d AS (SELECT doc_id,
             string_split_regex(lower(trim(text)), '\s+') AS w
           FROM documents),
         sh AS (SELECT doc_id, list_distinct(
             CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             ELSE list_transform(range(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
           FROM d),
         sizes AS (SELECT doc_id, len(s) AS n_sh FROM sh),
         post AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             COUNT(*) AS n_common
           FROM post a JOIN post b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(n_common AS DOUBLE)
             / (sa.n_sh + sb.n_sh - n_common) >= 0.8),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT re.id, e.dst FROM reach re
           JOIN edges e ON e.src = re.r)
         SELECT id AS doc_id, MIN(r) AS component
         FROM reach GROUP BY id ORDER BY doc_id""",
    "q33_langid" ->
      """WITH s AS (SELECT lang,
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             x -> list_contains(['the','and','of','to','in','is','that','it',
               'for','on'], x))) AS s_en,
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             x -> list_contains(['der','die','das','und','ist','nicht','mit',
               'ein','zu','den'], x))) AS s_de,
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             x -> list_contains(['le','la','les','et','est','dans','une',
               'pour','que','des'], x))) AS s_fr,
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             x -> list_contains(['el','los','las','es','una','por','para',
               'con','del','se'], x))) AS s_es
           FROM documents),
         det AS (SELECT lang,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
                ELSE 'und' END AS detected
           FROM s)
         SELECT detected, lang, COUNT(*) AS n FROM det
         GROUP BY detected, lang ORDER BY detected, lang""",
    "q34_cosine_near_dup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
             b.embedding::DOUBLE[]), 4) AS cos_sim
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding::DOUBLE[],
           b.embedding::DOUBLE[]) >= 0.38
         ORDER BY id_a, id_b""",
    "q35_sessionization" ->
      """WITH e AS (SELECT user_id, ts, value,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) >= INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_s
           FROM events),
         s AS (SELECT user_id, ts, value,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
             ROWS UNBOUNDED PRECEDING) AS sid
           FROM e)
         SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
         FROM s GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    "q36_sliding_window" ->
      """WITH w AS (SELECT event_type,
           unnest([time_bucket(INTERVAL '30 minutes', ts),
                   time_bucket(INTERVAL '30 minutes', ts)
                     - INTERVAL '30 minutes']) AS ws
           FROM events)
         SELECT ws AS window_start, event_type, COUNT(*) AS n
         FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""",
    // REAL WAV container metadata: the canonical header is 44 bytes and
    // PCM is uncompressed, so every parsed fact restates from the text
    "q37_binary_payload" ->
      """SELECT doc_id AS media_id,
         CAST(44 + octet_length(encode(text)) AS INTEGER) AS n_bytes,
         1 AS n_channels, 16000 AS sample_rate, 8 AS bits_per_sample,
         CAST(octet_length(encode(text)) AS INTEGER) AS n_samples
         FROM documents ORDER BY media_id""",
    "q38_ing_pipeline" -> FinanceQueries.q38Oracle,
    "q39_upsert_merge" -> FinanceQueries.q39Oracle,
    // Real-PNG decode ground truth: the 32x32 tiling of the text's
    // ascii codes (PNG is lossless, so the decoder must recover it)
    "q40_multimodal_decode" ->
      """WITH c AS (SELECT doc_id,
             regexp_extract_all(text, '(?s).') AS chars,
             octet_length(encode(text)) AS len
           FROM documents)
         SELECT doc_id AS media_id, 32 AS width, 32 AS height,
           CASE WHEN len = 0 THEN 0.0
                ELSE ROUND(list_avg(list_transform(range(1024),
                  j -> ascii(chars[(j % len) + 1]))), 4)
           END AS mean_intensity
         FROM c ORDER BY media_id""",
    "q41_rule_cascade_full" -> FinanceQueries.q41Oracle,
    // Hyperplane-LSH near-dup pairs incl. the bucket-cap semantics.
    "q46_lsh_near_dup" -> OracleGen.q46Sql(),
    "q42_set_ops" ->
      """(SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1994
          INTERSECT
          SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
         EXCEPT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         ORDER BY o_custkey""",
    // Real frame-container + per-frame PNG decode ground truth: frame i
    // is the 16x16 tiling with phase 31*i over the text's ascii codes
    "q43_frame_sample" ->
      """WITH c AS (SELECT doc_id,
             regexp_extract_all(text, '(?s).') AS chars,
             octet_length(encode(text)) AS len
           FROM documents),
         i AS (SELECT unnest([0, 4, 8, 12]) AS frame_idx)
         SELECT c.doc_id AS media_id, i.frame_idx,
           16 AS width, 16 AS height,
           CASE WHEN c.len = 0 THEN 0.0
                ELSE ROUND(list_avg(list_transform(range(256),
                  j -> ascii(c.chars[((j + i.frame_idx * 31) % c.len) + 1]))),
                  4)
           END AS mean_intensity
         FROM c CROSS JOIN i
         ORDER BY media_id, frame_idx""",
    "q45_audio_windows" ->
      """WITH f AS (
           SELECT doc_id, text, octet_length(encode(text)) AS len
           FROM documents)
         SELECT f.doc_id AS media_id, i.w,
           ROUND(sqrt(list_avg(list_transform(regexp_extract_all(
             substring(f.text, i.w * 256 + 1, least(256, f.len - i.w * 256)),
             '(?s).'),
             c -> (ascii(c) - 128.0) * (ascii(c) - 128.0)))), 4) AS rms
         FROM f, LATERAL (SELECT unnest(range((f.len + 255) // 256)) AS w) i
         ORDER BY media_id, w""",
    // Deterministic stratified sample: the xxhash64-of-BIGINT rule
    // restated exactly (OracleGen.xx64LongSql) — the kept SET matches,
    // not just its statistics.
    // Mixture rebalance: same hash restatement, counts + min + the exact
    // integer keep rule all re-derived inside DuckDB.
    "q70_mixture_rebalance" -> OracleGen.q70Sql(),
    // HyperLogLog: the whole sketch (hash, registers, exact DECIMAL
    // register sum, both estimator branches) recomputed in DuckDB.
    "q71_hll_distinct" -> OracleGen.q71Sql(),
    "q105_describe_approx" -> OracleGen.q105Sql(),
    // Graph ANN: band-width rule, proximity-graph build, beam hops and
    // final ranking all re-derived inside DuckDB (selection on the
    // integer grid; final rank on raw cosine — the q44 FP boundary).
    "q106_graph_ann" -> OracleGen.q106Sql(),
    // Saved-index graph ANN: the probe of the persisted graph must equal
    // the from-scratch build — q106's oracle VERBATIM.
    "q119_nsw_indexed" -> OracleGen.q106Sql(),
    // SemDeDup: centroids retrained in SQL (integer-grid Lloyd), the
    // duplicate set re-derived from scratch with raw-cosine verify.
    "q107_semdedup" -> OracleGen.q107Sql(),
    // BM25: tokenizer, idf, saturation and the rounded-rank order all
    // restated in SQL with the same Scala-interpolated float literals.
    "q108_bm25" -> OracleGen.q108Sql(),
    // Token-budget mixture: the oracle is the naive global-prefix window
    // over unsigned xxhash64 order — proves the skew-proof two-level
    // decomposition computes the same kept set. Pure integer arithmetic.
    "q109_token_mixture" -> OracleGen.q109Sql(),
    // Snapshot time travel: the store commits thirds 0/1/2 of orders as
    // v0(overwrite)/v1(append)/v2(overwrite) then vacuums to 2 versions;
    // the gate reads PINNED version 1, so its content must equal thirds
    // 0+1 recomputed straight from the table — overwrite/append
    // composition, reader pinning and vacuum safety all under the hash.
    "q110_snapshot_travel" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
         FROM orders WHERE o_orderkey % 3 IN (0, 1)
         GROUP BY 1 ORDER BY 1""",
    // Incremental admission: the q29 MinHash pipeline re-derived over
    // both populations, pair space restricted to new x existing, index
    // bucket cap applied at build (existing side only, no lower bound).
    "q111_incremental_dedup" -> OracleGen.q111Sql(),
    // Quantized JL projection: integer-exact components, shared-rounding
    // cosine — bit-deterministic projected-space ranking.
    "q113_random_projection" -> OracleGen.q113Sql(),
    // Unigram-LM NLL: counts, add-one smoothing, ln scoring and the
    // weighted mean restated; 4-decimal round absorbs sum-order ulps.
    "q114_unigram_nll" ->
      """WITH t AS (SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
           FROM documents),
         tok AS (SELECT doc_id, term FROM t WHERE term <> ''),
         tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
         uni AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt
           FROM tf GROUP BY 1),
         st AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n,
             CAST(COUNT(*) AS DOUBLE) AS v FROM uni)
         SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           ROUND(SUM(tf.tf * -ln((uni.cnt + 1.0) / (st.n + st.v)))
             / SUM(tf.tf), 4) AS avg_nll
         FROM tf JOIN uni USING (term) CROSS JOIN st
         GROUP BY 1 ORDER BY 1""",
    // Snapshot diff v1→v2 of the q110 store: v1 holds thirds 0+1, v2
    // (overwrite) holds third 2 — every row changes, tagged exactly once.
    "q115_snapshot_diff" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
           CASE WHEN o_orderkey % 3 = 2 THEN 'added' ELSE 'removed' END
             AS change,
           CAST(1 AS BIGINT) AS n_rows
         FROM orders ORDER BY o_orderkey""",
    // Schema evolution: v0 = narrow third 0, v1 = evolve-append third 1
    // carrying o_totalprice — current read backfills v0's price as NULL
    // off the OLD parquet files, so only third-1 rows can be priced.
    "q116_schema_evolution" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(COUNT(CASE WHEN o_orderkey % 3 = 1 THEN 1 END) AS BIGINT)
             AS n_priced,
           CAST(SUM(CASE WHEN o_orderkey % 3 = 1
               THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END)
             AS BIGINT) AS cents
         FROM orders WHERE o_orderkey % 3 IN (0, 1)
         GROUP BY 1 ORDER BY 1""",
    // Change feed over v0 overwrite / v1 append / v2 overwrite: third 1
    // added at version 1; thirds 0+1 removed and third 2 added at
    // version 2 — every row tagged exactly once with its commit.
    "q117_change_feed" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice, change,
           CAST(1 AS BIGINT) AS n_rows, version FROM (
           SELECT o_orderkey, o_orderpriority, o_totalprice,
             'added' AS change, 1 AS version
           FROM orders WHERE o_orderkey % 3 = 1
           UNION ALL
           SELECT o_orderkey, o_orderpriority, o_totalprice,
             'removed', 2 FROM orders WHERE o_orderkey % 3 IN (0, 1)
           UNION ALL
           SELECT o_orderkey, o_orderpriority, o_totalprice,
             'added', 2 FROM orders WHERE o_orderkey % 3 = 2)
         ORDER BY version, o_orderkey, change""",
    // Streaming change-feed source: q117's oracle verbatim — the
    // memory-sink collection of the readStream.format("graft") query
    // must equal the batch feed row for row (the builder additionally
    // REQUIREs fresh-checkpoint replay determinism).
    "q133_streaming_feed" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice, change,
           CAST(1 AS BIGINT) AS n_rows, version FROM (
           SELECT o_orderkey, o_orderpriority, o_totalprice,
             'added' AS change, 1 AS version
           FROM orders WHERE o_orderkey % 3 = 1
           UNION ALL
           SELECT o_orderkey, o_orderpriority, o_totalprice,
             'removed', 2 FROM orders WHERE o_orderkey % 3 IN (0, 1)
           UNION ALL
           SELECT o_orderkey, o_orderpriority, o_totalprice,
             'added', 2 FROM orders WHERE o_orderkey % 3 = 2)
         ORDER BY version, o_orderkey, change""",
    // Stats-pruned snapshot scan: the oracle is the plain filtered
    // aggregate over lineitem — equality proves the file-skip logic
    // dropped no qualifying file (the builder separately REQUIRES that
    // files were in fact skipped on the z-ordered layout).
    "q120_stats_pruned" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
             AS BIGINT) AS cents
         FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 3000
         GROUP BY 1 ORDER BY 1""",
    // Segmented (manifest-list) scan: the oracle is the plain filtered
    // aggregate — equality proves neither the segment-level nor the
    // file-level prune dropped a qualifying row (the builder REQUIRES
    // that whole segments went unparsed and files unopened).
    "q123_segmented_scan" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
             AS BIGINT) AS cents
         FROM lineitem WHERE l_orderkey BETWEEN 4000 AND 4700
         GROUP BY 1 ORDER BY 1""",
    // Merge-on-read: q122's oracle verbatim — the layered (equality-
    // delete) read must be bit-identical to what the copy-on-write
    // rewrite would have materialized; the builder REQUIREs the base
    // files survived the merge untouched.
    "q125_merge_on_read" ->
      """WITH ch AS (SELECT
           CASE WHEN l_linenumber = 7 THEN -l_orderkey
                ELSE l_orderkey END AS o_orderkey,
           l_linenumber AS v, l_quantity < 2 AS del,
           CAST(l_partkey AS BIGINT) AS o_custkey,
           ROUND(l_extendedprice, 2) AS o_totalprice,
           'U-' || l_returnflag AS o_orderpriority
           FROM lineitem),
         win AS (SELECT * FROM (SELECT ch.*, ROW_NUMBER() OVER (
             PARTITION BY o_orderkey
             ORDER BY v DESC, o_custkey DESC, o_totalprice DESC,
               o_orderpriority DESC, del DESC) AS rn FROM ch)
           WHERE rn = 1),
         b AS (SELECT o_orderkey, o_custkey,
             ROUND(o_totalprice, 2) AS o_totalprice, o_orderpriority
           FROM orders),
         m AS (SELECT o_orderkey,
           CASE WHEN win.v IS NOT NULL THEN win.o_totalprice
                ELSE b.o_totalprice END AS o_totalprice,
           CASE WHEN win.v IS NOT NULL THEN win.o_orderpriority
                ELSE b.o_orderpriority END AS o_orderpriority
         FROM b FULL OUTER JOIN win USING (o_orderkey)
         WHERE win.v IS NULL OR NOT win.del)
         SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
         FROM m GROUP BY 1 ORDER BY 1""",
    // Streaming CDC upsert: q125's changelog delivered as three
    // KEY-DISJOINT micro-batches through a real streaming query, each a
    // replay-deduped merge-on-read layer — key-disjointness makes layer
    // order irrelevant, so the global winner-fold oracle stays exact.
    "q126_streaming_upsert" ->
      """WITH ch AS (SELECT
           CASE WHEN l_linenumber = 7 THEN -l_orderkey
                ELSE l_orderkey END AS o_orderkey,
           l_linenumber AS v, l_quantity < 2 AS del,
           CAST(l_partkey AS BIGINT) AS o_custkey,
           ROUND(l_extendedprice, 2) AS o_totalprice,
           'U-' || l_returnflag AS o_orderpriority
           FROM lineitem),
         win AS (SELECT * FROM (SELECT ch.*, ROW_NUMBER() OVER (
             PARTITION BY o_orderkey
             ORDER BY v DESC, o_custkey DESC, o_totalprice DESC,
               o_orderpriority DESC, del DESC) AS rn FROM ch)
           WHERE rn = 1),
         b AS (SELECT o_orderkey, o_custkey,
             ROUND(o_totalprice, 2) AS o_totalprice, o_orderpriority
           FROM orders),
         m AS (SELECT o_orderkey,
           CASE WHEN win.v IS NOT NULL THEN win.o_totalprice
                ELSE b.o_totalprice END AS o_totalprice,
           CASE WHEN win.v IS NOT NULL THEN win.o_orderpriority
                ELSE b.o_orderpriority END AS o_orderpriority
         FROM b FULL OUTER JOIN win USING (o_orderkey)
         WHERE win.v IS NULL OR NOT win.del)
         SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
         FROM m GROUP BY 1 ORDER BY 1""",
    // Bloom index point lookup: the oracle re-derives the probe key and
    // selects the order directly — hash equality proves the bloom skip
    // kept every file that held the key (no false negatives), the
    // builder require()s the opened-file drop (the skipping is real).
    "q127_bloom_index" ->
      """WITH mid AS (SELECT (MIN(o_orderkey) + MAX(o_orderkey)) // 2
             AS m FROM orders),
           probe AS (SELECT MAX(o_orderkey) AS k FROM orders, mid
             WHERE o_orderkey % 13 = 0 AND o_orderkey <= mid.m)
         SELECT o_orderkey, o_custkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
           o_orderpriority
         FROM orders, probe WHERE o_orderkey = probe.k
         ORDER BY o_orderkey""",
    // Spark-native pushdown front door: the oracle is the plain
    // filtered aggregate — equality proves the PLANNER-driven file skip
    // (format("graft") -> FileIndex -> stats prune) dropped no
    // qualifying file; the builder separately REQUIREs skips happened
    // and that the decision equals readWhere's.
    "q128_format_pushdown" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
             AS BIGINT) AS cents
         FROM lineitem WHERE l_orderkey BETWEEN 2000 AND 3500
         GROUP BY 1 ORDER BY 1""",
    // Predicate delete: the oracle is the complement-filtered aggregate
    // with the same integer window arithmetic — equality proves the
    // data-less predicate layer (and the stats-proven full-file drops)
    // removed exactly the matching rows; the builder REQUIREs the
    // metadata-only shape and OPTIMIZE fold parity.
    "q129_delete_where" ->
      """WITH b AS (SELECT MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx
             FROM orders)
         SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
             AS BIGINT) AS cents
         FROM orders, b
         WHERE NOT (o_orderkey BETWEEN mn + (mx - mn) // 4
                                   AND mn + (mx - mn) // 2)
         GROUP BY 1 ORDER BY 1""",
    // Layered table through the Spark-native front door: q125's
    // winner-fold oracle restated over a deterministic mid-domain key
    // slice (same integer arithmetic as the builder) — hash equality
    // proves the ANALYZER-folded format("graft") read returns exactly
    // the merged rows; the builder separately REQUIREs the pushed
    // filter pruned base files THROUGH the fold and that the decision
    // equals readWhere's.
    "q131_layered_format" ->
      """WITH ch AS (SELECT
           CASE WHEN l_linenumber = 7 THEN -l_orderkey
                ELSE l_orderkey END AS o_orderkey,
           l_linenumber AS v, l_quantity < 2 AS del,
           CAST(l_partkey AS BIGINT) AS o_custkey,
           ROUND(l_extendedprice, 2) AS o_totalprice,
           'U-' || l_returnflag AS o_orderpriority
           FROM lineitem),
         win AS (SELECT * FROM (SELECT ch.*, ROW_NUMBER() OVER (
             PARTITION BY o_orderkey
             ORDER BY v DESC, o_custkey DESC, o_totalprice DESC,
               o_orderpriority DESC, del DESC) AS rn FROM ch)
           WHERE rn = 1),
         b AS (SELECT o_orderkey, o_custkey,
             ROUND(o_totalprice, 2) AS o_totalprice, o_orderpriority
           FROM orders),
         m AS (SELECT o_orderkey,
           CASE WHEN win.v IS NOT NULL THEN win.o_totalprice
                ELSE b.o_totalprice END AS o_totalprice,
           CASE WHEN win.v IS NOT NULL THEN win.o_orderpriority
                ELSE b.o_orderpriority END AS o_orderpriority
         FROM b FULL OUTER JOIN win USING (o_orderkey)
         WHERE win.v IS NULL OR NOT win.del),
         bounds AS (SELECT MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx
           FROM orders)
         SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
         FROM m, bounds
         WHERE o_orderkey BETWEEN mn + (mx - mn) // 4
                              AND mn + (mx - mn) // 2
         GROUP BY 1 ORDER BY 1""",
    // Partial bin-pack compaction: the oracle is the plain full
    // aggregate over orders — hash equality proves re-packing the five
    // small files moved every row and dropped/duplicated none; the
    // builder REQUIREs the two large files survive byte-identical.
    "q130_compact_small" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
             AS BIGINT) AS cents
         FROM orders GROUP BY 1 ORDER BY 1""",
    // Manifest rewrite: content-hash invariance through the metadata-
    // only regroup — the oracle recomputes the range aggregate straight
    // from orders; pruning through the REWRITTEN summaries is REQUIREd.
    "q124_manifest_rewrite" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
         FROM orders WHERE o_orderkey BETWEEN 1000 AND 5000
         GROUP BY 1 ORDER BY 1""",
    // MERGE INTO: the oracle is q97's winner-window + FULL OUTER fold
    // restated, aggregated per priority in integer cents - equality
    // proves the committed files carry exactly the merged row set.
    "q122_merge_into" ->
      """WITH ch AS (SELECT
           CASE WHEN l_linenumber = 7 THEN -l_orderkey
                ELSE l_orderkey END AS o_orderkey,
           l_linenumber AS v, l_quantity < 2 AS del,
           CAST(l_partkey AS BIGINT) AS o_custkey,
           ROUND(l_extendedprice, 2) AS o_totalprice,
           'U-' || l_returnflag AS o_orderpriority
           FROM lineitem),
         win AS (SELECT * FROM (SELECT ch.*, ROW_NUMBER() OVER (
             PARTITION BY o_orderkey
             ORDER BY v DESC, o_custkey DESC, o_totalprice DESC,
               o_orderpriority DESC, del DESC) AS rn FROM ch)
           WHERE rn = 1),
         b AS (SELECT o_orderkey, o_custkey,
             ROUND(o_totalprice, 2) AS o_totalprice, o_orderpriority
           FROM orders),
         m AS (SELECT o_orderkey,
           CASE WHEN win.v IS NOT NULL THEN win.o_totalprice
                ELSE b.o_totalprice END AS o_totalprice,
           CASE WHEN win.v IS NOT NULL THEN win.o_orderpriority
                ELSE b.o_orderpriority END AS o_orderpriority
         FROM b FULL OUTER JOIN win USING (o_orderkey)
         WHERE win.v IS NULL OR NOT win.del)
         SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
         FROM m GROUP BY 1 ORDER BY 1""",
    // Multi-table atomic commit: the two catalog tables at PINNED
    // catalog v0 joined back together must equal the join recomputed
    // from orders thirds 0+1 (the later t_price overwrite must be
    // invisible at v0).
    "q121_catalog_commit" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
         FROM orders WHERE o_orderkey % 3 <> 2
         GROUP BY 1 ORDER BY 1""",
    // Named-table SQL catalog: q121's oracle verbatim — the pure-SQL
    // VERSION AS OF 0 join by name must equal the v0-pinned cross-table
    // read (atomic transaction + pin isolation, now through the
    // TableCatalog surface; the builder REQUIREs the graft relation in
    // the plan).
    "q132_catalog_sql" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
         FROM orders WHERE o_orderkey % 3 <> 2
         GROUP BY 1 ORDER BY 1""",
    // Incremental re-cluster: the oracle recomputes the table content
    // (3/4 base ∪ top-quarter slice of the rest) as a filtered
    // aggregate with the builder's integer window arithmetic — hash
    // equality proves the overlap-group rewrite moved every row and
    // dropped/duplicated none; the builder REQUIREs the byte ratio,
    // byte-identical untouched files, and pruning parity.
    "q134_incr_recluster" ->
      """WITH b AS (SELECT MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx
             FROM orders)
         SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
             AS BIGINT) AS cents
         FROM orders, b
         WHERE o_orderkey % 4 <> 0
            OR o_orderkey >= mn + (3 * (mx - mn)) // 4
         GROUP BY 1 ORDER BY 1""",
    // SQL DML lifecycle: the oracle replays CTAS -> DELETE (second key
    // quarter) -> INSERT (span+1-shifted every-10th slice) -> ALTER
    // (tag all-NULL) straight from orders with the builder's integer
    // window arithmetic — hash equality proves the four pure-SQL
    // statements composed exactly through the catalog.
    "q135_sql_dml" ->
      """WITH b AS (SELECT MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx
             FROM orders),
         kept AS (SELECT o_orderkey, o_totalprice, o_orderpriority
           FROM orders, b
           WHERE NOT (o_orderkey BETWEEN mn + (mx - mn) // 4
                                     AND mn + (mx - mn) // 2)),
         ins AS (SELECT o_orderkey + (mx - mn) + 1 AS o_orderkey,
             o_totalprice, o_orderpriority
           FROM orders, b WHERE o_orderkey % 10 = 0),
         final AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
         SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
             AS BIGINT) AS cents,
           CAST(0 AS BIGINT) AS n_tag
         FROM final GROUP BY 1 ORDER BY 1""",
    // SQL MERGE INTO: q122's winner-fold oracle verbatim — the pure-SQL
    // three-clause merge through the catalog must materialize exactly
    // the changelog fold the Scala merge (q122) and the layered
    // merge-on-read (q125) produce; the builder REQUIREs one catalog
    // transaction and the command refuses duplicate source matches.
    "q136_sql_merge" ->
      """WITH ch AS (SELECT
           CASE WHEN l_linenumber = 7 THEN -l_orderkey
                ELSE l_orderkey END AS o_orderkey,
           l_linenumber AS v, l_quantity < 2 AS del,
           CAST(l_partkey AS BIGINT) AS o_custkey,
           ROUND(l_extendedprice, 2) AS o_totalprice,
           'U-' || l_returnflag AS o_orderpriority
           FROM lineitem),
         win AS (SELECT * FROM (SELECT ch.*, ROW_NUMBER() OVER (
             PARTITION BY o_orderkey
             ORDER BY v DESC, o_custkey DESC, o_totalprice DESC,
               o_orderpriority DESC, del DESC) AS rn FROM ch)
           WHERE rn = 1),
         b AS (SELECT o_orderkey, o_custkey,
             ROUND(o_totalprice, 2) AS o_totalprice, o_orderpriority
           FROM orders),
         m AS (SELECT o_orderkey,
           CASE WHEN win.v IS NOT NULL THEN win.o_totalprice
                ELSE b.o_totalprice END AS o_totalprice,
           CASE WHEN win.v IS NOT NULL THEN win.o_orderpriority
                ELSE b.o_orderpriority END AS o_orderpriority
         FROM b FULL OUTER JOIN win USING (o_orderkey)
         WHERE win.v IS NULL OR NOT win.del)
         SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
         FROM m GROUP BY 1 ORDER BY 1""",
    // SQL UPDATE: the oracle replays the filtered rewrite (second key
    // quarter gets +1 price and a 'U-' priority prefix) straight from
    // orders; the builder REQUIREs one catalog transaction, the
    // delete-layer + add-only-layer pair, and pruning parity for a
    // probe outside the updated window.
    "q137_sql_update" ->
      """WITH b AS (SELECT MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx
             FROM orders),
         u AS (SELECT
           CASE WHEN o_orderkey BETWEEN mn + (mx - mn) // 4
                                    AND mn + (mx - mn) // 2
                THEN o_totalprice + 1 ELSE o_totalprice
             END AS o_totalprice,
           CASE WHEN o_orderkey BETWEEN mn + (mx - mn) // 4
                                    AND mn + (mx - mn) // 2
                THEN 'U-' || o_orderpriority ELSE o_orderpriority
             END AS o_orderpriority
           FROM orders, b)
         SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
             AS BIGINT) AS cents
         FROM u GROUP BY 1 ORDER BY 1""",
    // Named-table streaming loop: the streamed-out table carries
    // exactly the rows appended AFTER the stream's starting catalog
    // version (orders thirds 1 and 2, each arriving as its own
    // incremental epoch) — the oracle recomputes them from orders; the
    // builder REQUIREs replay idempotence, one catalog transaction per
    // data epoch, and the front-door relation in the gated plan.
    "q138_named_stream" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
             AS BIGINT) AS cents
         FROM orders WHERE o_orderkey % 3 IN (1, 2)
         GROUP BY 1 ORDER BY 1""",
    // SQL metadata tables: history op/version/layer sequence, time-
    // traveled pre-delete files rowcount, the add-only layer's rowcount,
    // and the detail summary — the oracle restates the constants the
    // four-statement lifecycle must produce, with the two data-derived
    // counts recomputed from orders.
    "q139_meta_tables" ->
      """WITH a AS (SELECT COUNT(*) AS c FROM orders
             WHERE o_orderkey % 4 = 0),
           b AS (SELECT COUNT(*) AS c FROM orders
             WHERE o_orderkey % 10 = 0)
         SELECT part, k, op, v1, v2 FROM (
           SELECT 'h' AS part, CAST(0 AS BIGINT) AS k, 'CREATE' AS op,
                  CAST(0 AS BIGINT) AS v1, CAST(0 AS BIGINT) AS v2
           UNION ALL SELECT 'h', 1, 'APPEND', 1, 0
           UNION ALL SELECT 'h', 2, 'DELETE', 2, 1
           UNION ALL SELECT 'h', 3, 'APPEND', 3, 2
           UNION ALL SELECT 'f0', -1, 'rows', (SELECT c FROM a), 0
           UNION ALL SELECT 'f', 2, 'rows', (SELECT c FROM b), 0
           UNION ALL SELECT 'd', -2, 'detail', 3, 2
         ) ORDER BY part, k""",
    // SQL change feed: the oracle replays the five-statement CDC
    // lifecycle (create/insert/delete/insert/update) as set algebra
    // straight from orders — per-version added/removed rows with the
    // same lo/hi/shift arithmetic the staging derives (integer floor
    // division matches Scala Long '/' for the non-negative span).
    "q140_sql_changes" ->
      """WITH bounds AS (
           SELECT MIN(o_orderkey) AS kmin,
                  MAX(o_orderkey) - MIN(o_orderkey) AS span
           FROM orders),
         prm AS (SELECT kmin + span // 4 AS lo, kmin + span // 2 AS hi,
                        span + 1 AS shift FROM bounds),
         s1 AS (SELECT o_orderkey AS k, o_totalprice AS pr FROM orders
                WHERE o_orderkey % 7 = 0),
         d2 AS (SELECT k, pr FROM s1, prm WHERE k BETWEEN lo AND hi),
         s2 AS (SELECT k, pr FROM s1, prm WHERE k NOT BETWEEN lo AND hi),
         t3 AS (SELECT o_orderkey + shift AS k, o_totalprice AS pr
                FROM orders, prm WHERE o_orderkey % 11 = 0),
         s3 AS (SELECT k, pr FROM s2 UNION ALL SELECT k, pr FROM t3),
         u4 AS (SELECT k, pr FROM s3 WHERE k % 3 = 0)
         SELECT k AS o_orderkey, pr AS o_totalprice, change,
                CAST(n_rows AS BIGINT) AS n_rows,
                CAST(commit_v AS BIGINT) AS commit_v
         FROM (
           SELECT k, pr, 'added' AS change, 1 AS n_rows, 1 AS commit_v
           FROM s1
           UNION ALL SELECT k, pr, 'removed', 1, 2 FROM d2
           UNION ALL SELECT k, pr, 'added', 1, 3 FROM t3
           UNION ALL SELECT k, pr, 'removed', 1, 4 FROM u4
           UNION ALL SELECT k, pr + 1, 'added', 1, 4 FROM u4
         ) ORDER BY commit_v, change, o_orderkey""",
    // Column mapping: the oracle replays CREATE → (rename/drop are
    // invisible to content) → INSERT(shifted, doubled) → UPDATE(+1 in
    // the window) from orders, under the RENAMED output names.
    "q141_sql_colmap" ->
      """WITH bounds AS (
           SELECT MIN(o_orderkey) AS kmin,
                  MAX(o_orderkey) - MIN(o_orderkey) AS span
           FROM orders),
         prm AS (SELECT kmin + span // 4 AS lo, kmin + span // 2 AS hi,
                        span + 1 AS shift FROM bounds),
         s AS (SELECT o_orderkey AS k, o_totalprice AS pr FROM orders
               UNION ALL
               SELECT o_orderkey + shift, o_totalprice * 2
               FROM orders, prm WHERE o_orderkey % 9 = 0)
         SELECT k AS o_orderkey,
                CASE WHEN k BETWEEN lo AND hi THEN pr + 1 ELSE pr END
                  AS price
         FROM s, prm ORDER BY o_orderkey""",
    // OPTIMIZE: content-hash invariance through the compaction rewrite —
    // the oracle is the pre-optimize content (thirds 0+1), recomputed.
    "q118_optimize" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
         FROM orders WHERE o_orderkey % 3 IN (0, 1)
         GROUP BY 1 ORDER BY 1""",
    // Real resize ground truth: output pixel (o) = floor(mean of its 4x4
    // block) over the q40 tiling; all-integer until the final /64.0.
    "q112_image_resize" ->
      """WITH c AS (SELECT doc_id,
             regexp_extract_all(text, '(?s).') AS chars,
             octet_length(encode(text)) AS len
           FROM documents),
         px AS (SELECT doc_id,
             CASE WHEN len = 0
                  THEN list_transform(range(1024), j -> 0)
                  ELSE list_transform(range(1024),
                    j -> ascii(chars[(j % len) + 1])) END AS tp
           FROM c),
         rs AS (SELECT doc_id, list_transform(range(64), o ->
             list_sum(list_transform(range(16), b ->
               tp[((o // 8) * 4 + (b // 4)) * 32
                  + (o % 8) * 4 + (b % 4) + 1])) // 16) AS op
           FROM px)
         SELECT doc_id AS media_id, 8 AS width, 8 AS height,
           ROUND(list_sum(op) / 64.0, 4) AS mean_intensity
         FROM rs ORDER BY media_id""",
    // Bloom-pruned join: the bloom is semantics-transparent (no false
    // negatives), so the oracle IS the plain join — equality proves the
    // pruning dropped only non-matching rows.
    // revenue in integer ten-thousandths (cents(price)·(100−cents(disc)))
    // — a double SUM's accumulation order diverges between engines by a
    // final cent at sf1; the integer image is exact at any volume.
    "q72_bloom_join" ->
      """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) *
           (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
           AS revenue_c4
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size = 1
         GROUP BY p_brand ORDER BY p_brand""",
    // Deterministic shuffle: the exact permutation + batch ids re-derived.
    "q73_shuffle" -> OracleGen.q73Sql(
      TextQueries.Q73Seed, TextQueries.Q73LogBatches),
    // Count-min sketch: counts, cells, estimates all re-derived in DuckDB.
    "q74_cms_heavy_hitters" -> OracleGen.q74Sql(),
    // k-means assignment: the q44 integer-grid trainer rerun in SQL, the
    // full-corpus argmax assignment as the gated result.
    "q75_kmeans_assign" -> OracleGen.q75Sql(),
    // Histogram percentiles: binning + rank + edge arithmetic restated
    // with every float op in identical order.
    "q76_hist_percentiles" -> OracleGen.q76Sql(),
    "q77_cube" ->
      """SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
         COALESCE(l_linestatus, '(all)') AS linestatus,
         CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
         CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         ROUND(SUM(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus""",
    // The explicit unbounded frame on first/last_value is deliberate:
    // the SQL default frame ends at CURRENT ROW (last_value would be the
    // current row's value) — a classic cross-engine seam, pinned equal.
    "q78_window_suite" ->
      """WITH p AS (SELECT event_id, user_id, ts,
           ROUND(value, 2) AS value
         FROM events WHERE event_type = 'purchase')
         SELECT event_id, user_id, value,
           LAG(value, 1) OVER w AS prev_value,
           LEAD(value, 1) OVER w AS next_value,
           FIRST_VALUE(value) OVER (PARTITION BY user_id
             ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
             AND UNBOUNDED FOLLOWING) AS first_value,
           LAST_VALUE(value) OVER (PARTITION BY user_id
             ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
             AND UNBOUNDED FOLLOWING) AS last_value,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile
         FROM p
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, event_id""",
    "q79_windowed_distinct" ->
      """SELECT date_trunc('hour', ts) AS window_start,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         FROM events GROUP BY 1 ORDER BY window_start""",
    // Left folds on both engines (aggregate ↔ list_reduce, same element
    // order) keep the doubles bit-identical before the rounding.
    "q80_array_hof" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
           FROM embeddings)
         SELECT vec_id,
           ROUND(list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(v, x -> x * x)), (acc, x) -> acc + x), 6)
             AS l2_sq,
           ROUND(list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(v, x -> abs(x))), (acc, x) -> acc + x), 6)
             AS l1,
           CAST(len(list_filter(v, x -> x > 0)) AS INTEGER) AS n_pos,
           CAST(CASE WHEN len(list_filter(v, x -> abs(x) > 0.2)) > 0
             THEN 1 ELSE 0 END AS INTEGER) AS has_big,
           ROUND(list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(range(len(v)),
               i -> v[i + 1] * v[len(v) - i])), (acc, x) -> acc + x), 6)
             AS palindrome_dot
         FROM e ORDER BY vec_id""",
    // Exact 13-gram decontamination: shingles, benchmark gram set, and
    // the exhaustive membership join all re-derived in DuckDB.
    "q81_exact_decontam" -> OracleGen.q81Sql(),
    // Exact substring dedup: double-KR window hashes, dup-window rule,
    // and island merge all re-derived in DuckDB.
    "q82_exact_substr" -> OracleGen.q82Sql(),
    // Per-window HLL: the q71 sketch restatement generalized to hourly
    // windows (streamed operator gated through its batch execution).
    "q83_windowed_hll" -> OracleGen.q83Sql(),
    // PQ codes: all four per-subspace Euclidean Lloyd codebooks retrained
    // in DuckDB; code tuples + exact grid reconstruction distortion.
    "q84_pq_codes" -> OracleGen.q84Sql(),
    // Per-window CMS: the q74 sketch restatement generalized to hourly
    // windows, probed for the fixed event taxonomy (streamed operator
    // gated through its batch execution).
    "q90_windowed_cms" ->
      OracleGen.q90Sql(graft.operators.Relational.FunnelEventTypes),
    // Weighted PPS sample: the exact-integer per-row threshold replayed
    // in HUGEINT over the q52 hash restatement — kept set, not size.
    "q91_weighted_sample" -> OracleGen.q91Sql(),
    // IVF+PQ ADC probe: the q44 and q84 oracle chains composed, ADC
    // ranking replayed in exact grid integers.
    "q85_ivfpq_topk" -> OracleGen.q85Sql(),
    // Ordered funnel: greedy earliest matching == the chained-minimum
    // definition, restated as one CTE per step.
    "q89_funnel" ->
      """WITH s0 AS (SELECT user_id, MIN(ts) AS t0 FROM events
           WHERE event_type = 'signup' GROUP BY 1),
         s1 AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e
           JOIN s0 USING (user_id)
           WHERE e.event_type = 'view' AND e.ts > s0.t0 GROUP BY 1),
         s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
           JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
         s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
           JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
         SELECT s0.user_id, s0.t0 AS t_signup, s1.t1 AS t_view,
           s2.t2 AS t_click, s3.t3 AS t_purchase
         FROM s0 LEFT JOIN s1 USING (user_id)
           LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
         ORDER BY s0.user_id""",
    // Generalized pattern match: chained-minimum per pattern with
    // look-through COALESCE anchors over optional steps; pattern A has an
    // optional middle step, pattern B an optional head step (entry at the
    // first REQUIRED step, head may be null)
    "q92_pattern_match" ->
      """WITH ua AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'signup'
              OR (event_type = 'view' AND value > 100)
              OR (event_type = 'purchase' AND value > 50)),
         a0 AS (SELECT user_id, MIN(ts) AS t0 FROM events
           WHERE event_type = 'signup' GROUP BY 1),
         b0 AS (SELECT ua.user_id, a0.t0 FROM ua LEFT JOIN a0 USING (user_id)),
         a1 AS (SELECT b0.user_id, MIN(e.ts) AS t1 FROM b0
           JOIN events e USING (user_id)
           WHERE e.event_type = 'view' AND e.value > 100 AND e.ts > b0.t0
           GROUP BY 1),
         b1 AS (SELECT b0.user_id, b0.t0, a1.t1
           FROM b0 LEFT JOIN a1 USING (user_id)),
         a2 AS (SELECT b1.user_id, MIN(e.ts) AS t2 FROM b1
           JOIN events e USING (user_id)
           WHERE e.event_type = 'purchase' AND e.value > 50
             AND e.ts > COALESCE(b1.t1, b1.t0) GROUP BY 1),
         ra AS (SELECT 'A' AS pattern, b1.user_id,
             b1.t0 AS t_s0, b1.t1 AS t_s1, a2.t2 AS t_s2
           FROM b1 LEFT JOIN a2 USING (user_id) WHERE b1.t0 IS NOT NULL),
         ub AS (SELECT DISTINCT user_id FROM events
           WHERE (event_type = 'click' AND value > 200)
              OR event_type = 'error' OR event_type = 'purchase'),
         c0 AS (SELECT user_id, MIN(ts) AS t0 FROM events
           WHERE event_type = 'click' AND value > 200 GROUP BY 1),
         d0 AS (SELECT ub.user_id, c0.t0 FROM ub LEFT JOIN c0 USING (user_id)),
         c1 AS (SELECT d0.user_id, MIN(e.ts) AS t1 FROM d0
           JOIN events e USING (user_id)
           WHERE e.event_type = 'error'
             AND (d0.t0 IS NULL OR e.ts > d0.t0) GROUP BY 1),
         d1 AS (SELECT d0.user_id, d0.t0, c1.t1
           FROM d0 LEFT JOIN c1 USING (user_id)),
         c2 AS (SELECT d1.user_id, MIN(e.ts) AS t2 FROM d1
           JOIN events e USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > d1.t1 GROUP BY 1),
         rb AS (SELECT 'B' AS pattern, d1.user_id,
             d1.t0 AS t_s0, d1.t1 AS t_s1, c2.t2 AS t_s2
           FROM d1 LEFT JOIN c2 USING (user_id) WHERE d1.t1 IS NOT NULL)
         SELECT * FROM ra UNION ALL SELECT * FROM rb
         ORDER BY pattern, user_id""",
    // Cohort retention: first-event-day cohorts, distinct active days,
    // per-(cohort, offset) counts + rate — the operator's exact shape
    "q93_retention" -> RetentionMatrixSql,
    // Streaming retention (q104): the SAME oracle as q93 — the gate
    // aggregates the incremental activation feed back to the batch
    // matrix, so matching q93's SQL proves the streaming formulation
    // computes exactly the batch result
    "q104_streaming_retention" -> RetentionMatrixSql,
    // Composite curation pipeline: the five proven stage oracles (fold,
    // dedup, decontaminate, rebalance, pack) composed as one CTE chain
    "q103_curation_pipeline" -> OracleGen.q103Sql(),
    "q94_zorder_key" -> OracleGen.q94Sql(),
    "q98_pagerank" -> OracleGen.q98Sql(),
    // Exact windowed top-k: per-hour type counts, ROW_NUMBER ordered by
    // (n DESC, type DESC) — the CollectTopK struct order restated
    "q102_windowed_topk" ->
      """WITH c AS (SELECT date_trunc('hour', ts) AS window_start,
             event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         r AS (SELECT window_start, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY window_start
               ORDER BY n DESC, event_type DESC) AS rk
           FROM c)
         SELECT window_start, CAST(rk AS INT) AS rnk, event_type, n
         FROM r WHERE rk <= 3 ORDER BY window_start, rnk""",
    // Incremental aggregate maintenance: base + signed deltas, zero-count
    // groups drop, insert-born groups appear — all integer cents
    "q101_incremental_agg" ->
      """WITH cents AS (SELECT l_returnflag, l_linenumber,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v
           FROM lineitem),
         base AS (SELECT l_returnflag,
             CAST(SUM(v) AS BIGINT) AS sum_v,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM cents GROUP BY 1),
         ch AS (SELECT CASE WHEN l_linenumber = 2
               THEN 'N-' || l_returnflag ELSE l_returnflag END
               AS l_returnflag,
             v, l_linenumber = 1 AS del
           FROM cents WHERE l_linenumber IN (1, 2)),
         d AS (SELECT l_returnflag,
             CAST(SUM(CASE WHEN del THEN -v ELSE v END) AS BIGINT) AS dv,
             CAST(SUM(CASE WHEN del THEN -1 ELSE 1 END) AS BIGINT) AS dn
           FROM ch GROUP BY 1)
         SELECT l_returnflag,
           COALESCE(base.sum_v, 0) + COALESCE(d.dv, 0) AS sum_v,
           COALESCE(base.n, 0) + COALESCE(d.dn, 0) AS n
         FROM base FULL OUTER JOIN d USING (l_returnflag)
         WHERE COALESCE(base.n, 0) + COALESCE(d.dn, 0) > 0
         ORDER BY l_returnflag""",
    // Robust outliers: both medians as rank-ceil picks (the q64 type-1
    // formulation), deviations and the 3*MAD comparison replayed exactly
    "q100_outliers" ->
      """WITH r AS (SELECT l_returnflag, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
               ORDER BY l_extendedprice) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
           FROM lineitem),
         med AS (SELECT l_returnflag,
             MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
               THEN l_extendedprice END) AS med
           FROM r GROUP BY 1),
         d AS (SELECT l.l_returnflag, m.med,
             ABS(l.l_extendedprice - m.med) AS dev
           FROM lineitem l JOIN med m USING (l_returnflag)),
         r2 AS (SELECT l_returnflag, med, dev,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
               ORDER BY dev) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
           FROM d),
         mad AS (SELECT l_returnflag,
             MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
               THEN dev END) AS mad
           FROM r2 GROUP BY 1)
         SELECT d.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MAX(d.med) AS med, MAX(ma.mad) AS mad,
           CAST(SUM(CASE WHEN d.dev > 3.0 * ma.mad THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers
         FROM d JOIN mad ma USING (l_returnflag)
         GROUP BY 1 ORDER BY 1""",
    // Table profile: per-column counters restated and unioned; values
    // cast to VARCHAR first so min/max are lexicographic on both engines
    // Exact profile: one row per column, NATIVE-order extrema rendered
    // to string after aggregation (CAST(MIN(c)) — the operator's r15
    // semantics; the old shape MIN'd the casts, paying a per-row render)
    "q99_profile" ->
      """SELECT * FROM (
           SELECT 'o_orderkey' AS "column",
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
             CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
             CAST(MAX(o_orderkey) AS VARCHAR) AS max_str FROM orders
           UNION ALL SELECT 'o_custkey', COUNT(*),
             COUNT(*) - COUNT(o_custkey), COUNT(DISTINCT o_custkey),
             CAST(MIN(o_custkey) AS VARCHAR),
             CAST(MAX(o_custkey) AS VARCHAR) FROM orders
           UNION ALL SELECT 'o_orderstatus', COUNT(*),
             COUNT(*) - COUNT(o_orderstatus),
             COUNT(DISTINCT o_orderstatus),
             MIN(o_orderstatus), MAX(o_orderstatus) FROM orders
           UNION ALL SELECT 'o_orderpriority', COUNT(*),
             COUNT(*) - COUNT(o_orderpriority),
             COUNT(DISTINCT o_orderpriority),
             MIN(o_orderpriority), MAX(o_orderpriority) FROM orders)
         ORDER BY "column"""",
    // Grouped top-k: the oracle is the WINDOW formulation the bounded
    // aggregate replaces — equality proves aggregate ≡ sort-based top-k
    "q96_grouped_topk" ->
      """SELECT o_orderpriority, CAST(rk AS INT) AS rnk, price, o_orderkey
         FROM (SELECT o_orderpriority,
             ROUND(o_totalprice, 2) AS price, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
               ORDER BY ROUND(o_totalprice, 2) DESC, o_orderkey DESC) AS rk
           FROM orders) t
         WHERE rk <= 3 ORDER BY o_orderpriority, rnk""",
    // CDC apply: winner per key via window (the sort-based definition of
    // the operator's max_by), fold via FULL OUTER JOIN, tombstones drop
    "q97_cdc_apply" ->
      """WITH ch AS (SELECT
           CASE WHEN l_linenumber = 7 THEN -l_orderkey
                ELSE l_orderkey END AS o_orderkey,
           l_linenumber AS v, l_quantity < 2 AS del,
           CAST(l_partkey AS BIGINT) AS o_custkey,
           ROUND(l_extendedprice, 2) AS o_totalprice,
           'U-' || l_returnflag AS o_orderpriority
           FROM lineitem),
         win AS (SELECT * FROM (SELECT ch.*, ROW_NUMBER() OVER (
             PARTITION BY o_orderkey
             ORDER BY v DESC, o_custkey DESC, o_totalprice DESC,
               o_orderpriority DESC, del DESC) AS rn FROM ch)
           WHERE rn = 1),
         b AS (SELECT o_orderkey, o_custkey,
             ROUND(o_totalprice, 2) AS o_totalprice, o_orderpriority
           FROM orders)
         SELECT o_orderkey,
           CASE WHEN win.v IS NOT NULL THEN win.o_custkey
                ELSE b.o_custkey END AS o_custkey,
           CASE WHEN win.v IS NOT NULL THEN win.o_totalprice
                ELSE b.o_totalprice END AS o_totalprice,
           CASE WHEN win.v IS NOT NULL THEN win.o_orderpriority
                ELSE b.o_orderpriority END AS o_orderpriority
         FROM b FULL OUTER JOIN win USING (o_orderkey)
         WHERE win.v IS NULL OR NOT win.del
         ORDER BY o_orderkey""",
    // Streaming funnel: q89's chained-min CTEs, one UNION ALL branch per
    // completed step (a completion row exists iff the step time is
    // non-null, which the s1..s3 join chain already encodes)
    "q95_streaming_funnel" ->
      """WITH s0 AS (SELECT user_id, MIN(ts) AS t FROM events
           WHERE event_type = 'signup' GROUP BY 1),
         s1 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
           JOIN s0 USING (user_id)
           WHERE e.event_type = 'view' AND e.ts > s0.t GROUP BY 1),
         s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
           JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
         s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
           JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
         SELECT user_id, 'signup' AS step, t AS ts FROM s0
         UNION ALL SELECT user_id, 'view', t FROM s1
         UNION ALL SELECT user_id, 'click', t FROM s2
         UNION ALL SELECT user_id, 'purchase', t FROM s3
         ORDER BY user_id, ts, step""",
    // Data-quality audit: every check restated as plain SQL counting —
    // null-in counts as a violation for range/accepted (matching the
    // operator's coalesce-to-false rule).
    "q88_quality_audit" ->
      """WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows
           FROM lineitem)
         SELECT r."check", r.n_violations, n.n_rows,
           r.n_violations = 0 AS pass
         FROM (
           SELECT 'not_null_l_shipdate' AS "check",
             CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_violations FROM lineitem
           UNION ALL
           SELECT 'range_l_quantity',
             CAST(SUM(CASE WHEN l_quantity IS NULL
               OR NOT (l_quantity >= 1 AND l_quantity <= 25)
               THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
           UNION ALL
           SELECT 'accepted_l_returnflag',
             CAST(SUM(CASE WHEN l_returnflag IS NULL
               OR l_returnflag NOT IN ('A', 'R')
               THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
           UNION ALL
           SELECT 'satisfies_disc_price',
             CAST(SUM(CASE WHEN NOT coalesce(
               l_extendedprice * (1 - l_discount) >= 0, false)
               THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
           UNION ALL
           SELECT 'unique_l_orderkey_l_linenumber',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
               - (SELECT CAST(COUNT(DISTINCT (l_orderkey, l_linenumber))
                   AS BIGINT) FROM lineitem)
           UNION ALL
           SELECT 'ref_l_orderkey',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
              WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
                (SELECT 1 FROM orders o
                 WHERE o.o_orderkey = l.l_orderkey))
           UNION ALL
           SELECT 'ref_l_partkey',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
              WHERE l.l_partkey IS NOT NULL AND NOT EXISTS
                (SELECT 1 FROM part p
                 WHERE p.p_partkey = l.l_partkey))
         ) r CROSS JOIN n
         ORDER BY r."check"""",
    // Resample + forward fill: DuckDB generate_series grid + native ASOF
    // — both halves independently implemented.
    "q87_resample_ffill" ->
      """WITH o AS (SELECT user_id, ts, ROUND(MAX(value), 2) AS value
           FROM events GROUP BY 1, 2),
         b AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
           FROM o GROUP BY 1),
         g AS (SELECT user_id,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS ts
           FROM b)
         SELECT g.user_id AS user_id, g.ts AS ts, o.ts AS ts_matched,
           o.value AS value
         FROM g ASOF LEFT JOIN o
           ON g.user_id = o.user_id AND g.ts >= o.ts
         ORDER BY 1, 2""",
    // Streaming as-of join, gated through its batch execution: the q57
    // DuckDB native ASOF oracle verbatim — two independent engine
    // implementations of the inclusive backward match.
    "q86_streaming_asof" ->
      """WITH p AS (SELECT event_id, user_id, ts,
             ROUND(value, 2) AS purchase_value
           FROM events WHERE event_type = 'purchase'),
         v AS (SELECT user_id, ts, ROUND(MAX(value), 2) AS view_value
           FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
         SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
           v.ts AS ts_matched, v.view_value
         FROM p ASOF LEFT JOIN v
           ON p.user_id = v.user_id AND p.ts >= v.ts
         ORDER BY p.event_id""",
    "q52_stratified_sample" -> OracleGen.q52Sql(
      TextQueries.Q52Rates.map { case (l, r) =>
        (l, math.round(r * TextQueries.Q52Granularity)) },
      math.round(TextQueries.Q52Default * TextQueries.Q52Granularity),
      TextQueries.Q52Granularity),
    // Cross-corpus contamination: both sides' winnowing fingerprints
    // recomputed with q47's NON-rolling polynomial formulation, then the
    // even(train)×odd(eval) fingerprint join + shared-count filter.
    "q51_contamination" ->
      """WITH d AS (SELECT doc_id,
             list_transform(regexp_extract_all(lower(trim(text)), '(?s).'),
               c -> ascii(c)) AS cs
           FROM documents),
         g AS (SELECT doc_id, cs, len(cs) AS n FROM d WHERE len(cs) >= 8),
         h AS (SELECT doc_id,
             list_transform(range(1, n - 8 + 2), i ->
               CAST(list_sum(list_transform(range(0, 8), j ->
                 (CAST(cs[i + j] AS BIGINT) * ([1, 257, 66049, 16974593,
                    362470373, 154885210, 805498697, 13163680][8 - j]))
                 % 1000000007)) % 1000000007 AS BIGINT)) AS hs
           FROM g),
         m AS (SELECT doc_id,
             CASE WHEN len(hs) <= 8 THEN [list_min(hs)]
                  ELSE list_transform(range(1, len(hs) - 8 + 2),
                    i -> list_min(hs[i:i+7])) END AS ms
           FROM h),
         f AS (SELECT doc_id, unnest(list_distinct(ms)) AS fp FROM m),
         a AS (SELECT doc_id AS id_a, fp FROM f WHERE doc_id % 2 = 0
               QUALIFY COUNT(*) OVER (PARTITION BY fp) <= 32),
         b AS (SELECT doc_id AS id_b, fp FROM f WHERE doc_id % 2 = 1
               QUALIFY COUNT(*) OVER (PARTITION BY fp) <= 32)
         SELECT id_a, id_b, COUNT(*) AS n_shared
         FROM a JOIN b USING (fp)
         GROUP BY 1, 2 HAVING COUNT(*) >= 4
         ORDER BY id_a, id_b""",
    // Repetition quality filters: duplicate fractions via list_distinct,
    // top-2-gram share via an independent unnest + MAX/SUM aggregation.
    "q53_repetition" ->
      """WITH d AS (SELECT doc_id,
             CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE string_split_regex(lower(trim(text)), '\s+') END AS w
           FROM documents),
         g AS (SELECT doc_id, w,
             CASE WHEN len(w) = 0 THEN []::VARCHAR[]
                  WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                  ELSE list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END AS s3,
             CASE WHEN len(w) = 0 THEN []::VARCHAR[]
                  WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
                  ELSE list_transform(range(1, len(w)),
                    i -> w[i] || ' ' || w[i+1]) END AS s2
           FROM d),
         rl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
             CASE WHEN len(w) = 0 THEN 0.0
                  ELSE ROUND(1.0 - CAST(len(list_distinct(w)) AS DOUBLE)
                    / len(w), 4) END AS dup_word_frac,
             CASE WHEN len(s3) = 0 THEN 0.0
                  ELSE ROUND(1.0 - CAST(len(list_distinct(s3)) AS DOUBLE)
                    / len(s3), 4) END AS dup_3gram_frac
           FROM g),
         c2 AS (SELECT doc_id, g2, COUNT(*) AS cnt
           FROM (SELECT doc_id, unnest(s2) AS g2 FROM g) GROUP BY 1, 2),
         m2 AS (SELECT doc_id,
             ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 4)
               AS top_2gram_frac
           FROM c2 GROUP BY 1)
         SELECT rl.doc_id, n_words, dup_word_frac, dup_3gram_frac,
           COALESCE(m2.top_2gram_frac, 0.0) AS top_2gram_frac
         FROM rl LEFT JOIN m2 ON rl.doc_id = m2.doc_id
         ORDER BY rl.doc_id""",
    // Winnowing (k=8 char grams, w=8 windows, Karp–Rabin base 257 mod
    // 1e9+7): every gram hash recomputed DIRECTLY as Σ code·B^j mod M with
    // the B^j mod M constants inlined (powers of 257 exceed 2^53 at j≥7,
    // so pow() in double would lose exactness) — deliberately NON-rolling,
    // the independent ground truth for the Spark side's rolling recurrence.
    "q47_winnowing" ->
      """WITH d AS (SELECT doc_id,
             list_transform(regexp_extract_all(lower(trim(text)), '(?s).'),
               c -> ascii(c)) AS cs
           FROM documents),
         g AS (SELECT doc_id, cs, len(cs) AS n FROM d WHERE len(cs) >= 8),
         h AS (SELECT doc_id,
             list_transform(range(1, n - 8 + 2), i ->
               CAST(list_sum(list_transform(range(0, 8), j ->
                 (CAST(cs[i + j] AS BIGINT) * ([1, 257, 66049, 16974593,
                    362470373, 154885210, 805498697, 13163680][8 - j]))
                 % 1000000007)) % 1000000007 AS BIGINT)) AS hs
           FROM g),
         m AS (SELECT doc_id,
             CASE WHEN len(hs) <= 8 THEN [list_min(hs)]
                  ELSE list_transform(range(1, len(hs) - 8 + 2),
                    i -> list_min(hs[i:i+7])) END AS ms
           FROM h)
         SELECT doc_id, unnest(list_sort(list_distinct(ms))) AS fp
         FROM m ORDER BY doc_id, fp""",
    // Robust winnowing: q47's non-rolling hash recomputation, plus each
    // window's RIGHTMOST minimum located via reversed list_position —
    // window i (1-based) selecting in-window index j maps to 0-based gram
    // position (i-1)+(j-1); distinct (fp, pos) = distinct occurrences.
    "q48_winnowing_pos" ->
      """WITH d AS (SELECT doc_id,
             list_transform(regexp_extract_all(lower(trim(text)), '(?s).'),
               c -> ascii(c)) AS cs
           FROM documents),
         g AS (SELECT doc_id, cs, len(cs) AS n FROM d WHERE len(cs) >= 8),
         h AS (SELECT doc_id,
             list_transform(range(1, n - 8 + 2), i ->
               CAST(list_sum(list_transform(range(0, 8), j ->
                 (CAST(cs[i + j] AS BIGINT) * ([1, 257, 66049, 16974593,
                    362470373, 154885210, 805498697, 13163680][8 - j]))
                 % 1000000007)) % 1000000007 AS BIGINT)) AS hs
           FROM g),
         m AS (SELECT doc_id,
             CASE WHEN len(hs) <= 8 THEN
               [struct_pack(fp := list_min(hs),
                  pos := CAST(len(hs) - list_position(list_reverse(hs),
                    list_min(hs)) AS INTEGER))]
             ELSE list_transform(range(1, len(hs) - 8 + 2), i ->
               struct_pack(fp := list_min(hs[i:i+7]),
                 pos := CAST(i - 1 + 8 - list_position(
                   list_reverse(hs[i:i+7]), list_min(hs[i:i+7]))
                   AS INTEGER)))
             END AS sel
           FROM h)
         SELECT DISTINCT doc_id, s.fp AS fp, s.pos AS pos
         FROM (SELECT doc_id, unnest(sel) AS s FROM m)
         ORDER BY doc_id, pos""",
    // PII redaction: identical RE2-subset pattern strings. Redacted text
    // via the SEQUENTIAL replace chain (independent check that Spark's
    // fused single-pass alternation equals it); counts by classifying the
    // alternation's matches (priority email > ip > num — a pure digit run
    // can never full-match email/ip, so classification is exact).
    "q54_pii_redact" ->
      """WITH c AS (SELECT c_custkey,
             c_name || ' <user' || CAST(c_custkey AS VARCHAR)
               || '@example.com> ip 10.' || CAST(c_nationkey AS VARCHAR)
               || '.0.' || CAST(c_custkey % 250 AS VARCHAR)
               || ' tel ' || lpad(CAST(c_custkey AS VARCHAR), 8, '0')
               || ' ' || c_mktsegment AS contact
           FROM customer),
         m AS (SELECT c_custkey, contact, regexp_extract_all(contact,
             '([A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,})'
               || '|(\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b)|(\d{7,})')
             AS ms
           FROM c)
         SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(contact,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\d{7,}', '<NUM>', 'g') AS redacted,
           CAST(len(list_filter(ms, x -> regexp_full_match(x,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')))
             AS INTEGER) AS n_emails,
           CAST(len(list_filter(ms, x -> NOT regexp_full_match(x,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
             AND regexp_full_match(x,
               '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')))
             AS INTEGER) AS n_ips,
           CAST(len(list_filter(ms, x -> NOT regexp_full_match(x,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
             AND NOT regexp_full_match(x,
               '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')))
             AS INTEGER) AS n_nums
         FROM m ORDER BY c_custkey""",
    // Unicode folding: both sides derive accented text with the same
    // translate map; DuckDB's independent strip_accents/lower (utf8proc)
    // + explicit-class whitespace collapse must match FoldText exactly.
    "q55_text_fold" ->
      """WITH f AS (SELECT doc_id,
             trim(regexp_replace(strip_accents(lower(
               translate(text, 'aeionu', 'áèïöñü'))),
               '[ \t\n\f\r]+', ' ', 'g'), ' ') AS folded
           FROM documents)
         SELECT doc_id, folded,
           CAST(len(folded) AS INTEGER) AS n_chars_folded
         FROM f ORDER BY doc_id""",
    // Sequence packing: q25's whitespace token count, running-sum window
    // per source in doc_id order, pack = floor(tokens_before / 512).
    "q56_sequence_packing" ->
      """WITH d AS (SELECT doc_id, source,
             CASE WHEN len(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(lower(trim(text)), '\s+'))
             END AS tok
           FROM documents),
         w AS (SELECT doc_id, source, tok,
             SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - tok AS cum_before
           FROM d)
         SELECT source, CAST(cum_before // 512 AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         FROM w GROUP BY source, pack_id ORDER BY source, pack_id""",
    // Backward as-of join: DuckDB's NATIVE ASOF LEFT JOIN — an
    // independent engine implementation of the inclusive backward-match
    // semantics, not a SQL restatement of the union+window formulation.
    "q57_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts,
             ROUND(value, 2) AS purchase_value
           FROM events WHERE event_type = 'purchase'),
         v AS (SELECT user_id, ts, ROUND(MAX(value), 2) AS view_value
           FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
         SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
           v.ts AS ts_matched, v.view_value
         FROM p ASOF LEFT JOIN v
           ON p.user_id = v.user_id AND p.ts >= v.ts
         ORDER BY p.event_id""",
    // Overlapping 200/150 chunking: offsets are stride multiples, so
    // chunk_idx is recovered by integer division; the slice is restated
    // as a plain substring.
    "q58_chunking" ->
      """SELECT doc_id, CAST(o // 150 AS INTEGER) AS chunk_idx,
           CAST(o AS INTEGER) AS chunk_off,
           substring(text, CAST(o + 1 AS INTEGER), 200) AS chunk,
           CAST(len(substring(text, CAST(o + 1 AS INTEGER), 200))
             AS INTEGER) AS n_chars
         FROM (SELECT doc_id, text,
             unnest(range(0, greatest(len(text), 1), 150)) AS o
           FROM documents)
         ORDER BY doc_id, chunk_idx""",
    // Vocabulary: same whitespace tokenizer as q25, both frequencies in
    // one grouped pass, deterministic (count desc, term asc) top-500.
    "q59_vocabulary" ->
      """WITH t AS (SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
           FROM documents)
         SELECT term, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs
         FROM t WHERE term <> ''
         GROUP BY term ORDER BY n_occ DESC, term LIMIT 500""",
    // Scalar quantization: the fixed-operation-order formula restated
    // literally — floor(x+0.5) (identical in both engines, unlike
    // round's tie rule), same association, same double casts.
    "q60_quantize" ->
      """WITH m AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS d
           FROM embeddings),
         r AS (SELECT vec_id, d, list_min(d) AS vmin, list_max(d) AS vmax
           FROM m)
         SELECT vec_id, ROUND(vmin, 6) AS vmin, ROUND(vmax, 6) AS vmax,
           CAST(list_sum(list_transform(d, x ->
             CASE WHEN vmax - vmin = 0 THEN 0
                  ELSE CAST(floor((x - vmin) / (vmax - vmin) * 255.0 + 0.5)
                    AS INTEGER) END)) AS BIGINT) AS code_sum,
           ROUND(list_max(list_transform(d, x ->
             CASE WHEN vmax - vmin = 0 THEN 0.0
                  ELSE abs(x - (vmin +
                    floor((x - vmin) / (vmax - vmin) * 255.0 + 0.5)
                      * (vmax - vmin) / 255.0)) END)), 6) AS max_abs_err
         FROM r ORDER BY vec_id""",
    // Salted join: the oracle is the PLAIN join — salting is correct
    // exactly when it is invisible in the result. Revenue accumulates in
    // exact integer 1e-4 units (cents × percent) so the total is
    // order-independent (a double SUM diverges by a cent between engines
    // at sf1, and per-row ROUND(double,2) differs on boundary rows).
    "q61_salted_join" ->
      """SELECT p_brand,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
             / 10000.0 AS revenue,
           COUNT(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    // SCD2 epochs via LEAD/ROW_NUMBER, lookup as a range-predicated
    // join — inclusive start, exclusive end, open-ended tail.
    "q62_scd2_join" ->
      """WITH s AS (SELECT user_id, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts)
               AS INTEGER) AS epoch_id
           FROM events WHERE event_type = 'signup'),
         p AS (SELECT user_id, ts, value
           FROM events WHERE event_type = 'purchase')
         SELECT p.user_id, s.epoch_id, s.valid_from,
           COUNT(*) AS n_purchases, ROUND(SUM(p.value), 2) AS sum_value
         FROM p JOIN s ON p.user_id = s.user_id
           AND p.ts >= s.valid_from
           AND (s.valid_to IS NULL OR p.ts < s.valid_to)
         GROUP BY p.user_id, s.epoch_id, s.valid_from
         ORDER BY p.user_id, s.epoch_id""",
    // Gaps-and-islands sessionization: LAG boundary flag, running SUM,
    // exact-microsecond gap arithmetic (epoch_us ↔ unix_micros).
    "q63_sessionize" ->
      """WITH e AS (SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         s AS (SELECT user_id, ts, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
           FROM e)
         SELECT user_id, session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
         FROM s GROUP BY user_id, session_seq
         ORDER BY user_id, session_seq""",
    // Type-1 quantiles: the element at 1-based rank ceil(p*n) of the
    // sorted group — restated with ROW_NUMBER, never quantile_cont.
    "q64_percentiles" ->
      """WITH r AS (SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
           FROM orders)
         SELECT o_orderpriority,
           MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
             THEN o_totalprice END) AS p50,
           MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT)
             THEN o_totalprice END) AS p90,
           MAX(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT)
             THEN o_totalprice END) AS p99,
           COUNT(*) AS n_rows
         FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // Forward as-of: DuckDB's native ASOF with a <= condition — the
    // smallest right timestamp at or after each left row.
    "q65_asof_forward" ->
      """WITH p AS (SELECT event_id, user_id, ts,
             ROUND(value, 2) AS purchase_value
           FROM events WHERE event_type = 'purchase'),
         v AS (SELECT user_id, ts, ROUND(MAX(value), 2) AS view_value
           FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
         SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
           v.ts AS ts_matched, v.view_value
         FROM p ASOF LEFT JOIN v
           ON p.user_id = v.user_id AND p.ts <= v.ts
         ORDER BY p.event_id""",
    // Interval join (batch twin of the watermarked stream-stream join):
    // plain range join, LEFT to keep zero-view purchases.
    "q66_interval_join" ->
      """WITH p AS (SELECT event_id, user_id, ts
           FROM events WHERE event_type = 'purchase'),
         v AS (SELECT user_id, ts, value
           FROM events WHERE event_type = 'view')
         SELECT p.event_id, COUNT(v.ts) AS n_views,
           ROUND(COALESCE(SUM(v.value), 0), 2) AS sum_view_value
         FROM p LEFT JOIN v ON p.user_id = v.user_id
           AND v.ts >= p.ts - INTERVAL 30 MINUTE
           AND v.ts <= p.ts + INTERVAL 30 MINUTE
         GROUP BY p.event_id ORDER BY p.event_id""",
    // TF-IDF: tf/df recomputed from the q25 tokenizer, score ranked on
    // the ROUNDED value with term tie-break (libm-proof total order).
    "q67_tfidf" ->
      """WITH t AS (SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
           FROM documents),
         tok AS (SELECT doc_id, term FROM t WHERE term <> ''),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf
           FROM tok GROUP BY doc_id, term),
         dfq AS (SELECT term, COUNT(*) AS dfc FROM tf GROUP BY term),
         nq AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents),
         s AS (SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * ln(CAST(nd AS DOUBLE) / dfc), 4) AS score
           FROM tf JOIN dfq USING (term) CROSS JOIN nq),
         r AS (SELECT doc_id, term, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term) AS INTEGER) AS rank
           FROM s)
         SELECT doc_id, rank, term, score FROM r WHERE rank <= 3
         ORDER BY doc_id, rank""",
    // Survivor selection on top of the q49 component closure: longest doc
    // per cluster wins, ties to the smallest doc_id (independent
    // ROW_NUMBER formulation of the library's partial-agg max(struct)).
    "q68_dedup_survivors" ->
      """WITH RECURSIVE d AS (SELECT doc_id,
             string_split_regex(lower(trim(text)), '\s+') AS w
           FROM documents),
         sh AS (SELECT doc_id, list_distinct(
             CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             ELSE list_transform(range(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
           FROM d),
         sizes AS (SELECT doc_id, len(s) AS n_sh FROM sh),
         post AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             COUNT(*) AS n_common
           FROM post a JOIN post b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(n_common AS DOUBLE)
             / (sa.n_sh + sb.n_sh - n_common) >= 0.8),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT re.id, e.dst FROM reach re
           JOIN edges e ON e.src = re.r),
         comp AS (SELECT id AS doc_id, MIN(r) AS component
           FROM reach GROUP BY id),
         j AS (SELECT c.doc_id, c.component, d2.n_chars
           FROM comp c JOIN documents d2 USING (doc_id)),
         s AS (SELECT component, doc_id AS survivor_id, ROW_NUMBER() OVER
             (PARTITION BY component ORDER BY n_chars DESC, doc_id) AS rn
           FROM j)
         SELECT j.doc_id, j.component,
           CAST(CASE WHEN j.doc_id = s.survivor_id THEN 1 ELSE 0 END
             AS INTEGER) AS keep
         FROM j JOIN (SELECT component, survivor_id FROM s WHERE rn = 1) s
           USING (component)
         ORDER BY j.doc_id""",
    // Corpus-level boilerplate signal: distinct 3-gram document frequency
    // >= 5, count + fraction per doc (exact-long ratio, rounded).
    "q69_crossdoc_ngrams" ->
      """WITH d AS (SELECT doc_id,
             string_split_regex(lower(trim(text)), '\s+') AS w
           FROM documents),
         sh AS (SELECT doc_id, list_distinct(
             CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             ELSE list_transform(range(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
           FROM d),
         post AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
         dfq AS (SELECT shingle, COUNT(*) AS dfc FROM post
           GROUP BY shingle)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN dfc >= 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_common,
           ROUND(CAST(SUM(CASE WHEN dfc >= 5 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS common_frac
         FROM post JOIN dfq USING (shingle)
         GROUP BY doc_id ORDER BY doc_id""",
  )
}
