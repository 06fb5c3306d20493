package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, EventQueries, GraphQueries, RetrievalQueries, TextQueries, VectorIndex, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 (relational
  * core of the reference sync service) plus the beyond-reference
  * training-data-pipeline operators (dedup, similarity search, text
  * analysis, event-stream ops). Each entry with an `oracleSql` row is
  * hash-compared against DuckDB on the same parquet tables; entries
  * without one (engine-specific hashing: MinHash/SimHash/LSH/langid)
  * get the rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — relational core (reference operator inventory, SURVEY §2) —
    "q1_pricing_summary" -> (CoreQueries.q1PricingSummary _),
    "s1_full_scan" -> (CoreQueries.s1FullScan _),
    "s2_filtered_scan" -> (CoreQueries.s2FilteredScan _),
    "j3_broadcast_lookup" -> (CoreQueries.j3BroadcastLookup _),
    "a1_group_collect" -> (CoreQueries.a1GroupCollect _),
    "a3_sum_reduce" -> (CoreQueries.a3SumReduce _),
    "p10_zero_stock_skip" -> (CoreQueries.p10ZeroStockSkip _),
    "k2_backfill" -> (CoreQueries.k2Backfill _),
    "k5_snapshot_diff" -> (CoreQueries.k5SnapshotDiff _),
    "k6_incremental_agg" -> (CoreQueries.k6IncrementalAgg _),
    "p1_name_synthesis" -> (CoreQueries.p1NameSynthesis _),
    "p4_coalesce_chain" -> (CoreQueries.p4CoalesceChain _),
    "p5_cents_to_dollars" -> (CoreQueries.p5CentsToDollars _),
    "p7_spec_resolver" -> (CoreQueries.p7SpecResolver _),
    "j1_equi_join" -> (CoreQueries.j1EquiJoin _),
    "j2_substring_join" -> (CoreQueries.j2SubstringJoin _),
    "j4_outer_merge" -> (CoreQueries.j4OuterMerge _),
    "j5_semi_anti" -> (CoreQueries.j5SemiAnti _),
    "a2_option_agg" -> (CoreQueries.a2OptionAgg _),
    "a5_summary_rollup" -> (CoreQueries.a5SummaryRollup _),
    "w1_topk_per_group" -> (CoreQueries.w1TopkPerGroup _),
    "w2_running_total" -> (CoreQueries.w2RunningTotal _),
    "w3_order_gaps" -> (CoreQueries.w3OrderGaps _),
    "w4_running_total_twophase" -> (CoreQueries.w4RunningTotalTwoPhase _),
    "w5_topk_twophase" -> (CoreQueries.w5TopkTwoPhase _),
    "w6_running_total_auto" -> (CoreQueries.w6RunningTotalAuto _),
    "w7_topk_auto" -> (CoreQueries.w7TopkAuto _),
    "q_profile" -> (CoreQueries.qProfile _),
    "q_profile_hll" -> ((s: SparkSession, d: String) => CoreQueries.qProfileApprox(s, d)),
    "q_hll_distinct" -> (CoreQueries.qHllDistinct _),
    "q_hll_grouped" -> (CoreQueries.qHllGrouped _),
    "q_zorder_key" -> (graft.queries.LayoutQueries.qZorderKey _),
    "q_quantiles" -> (CoreQueries.qQuantiles _),
    "q_quantiles_twophase" -> (CoreQueries.qQuantilesTwoPhase _),
    "q_quantiles_auto" -> (CoreQueries.qQuantilesAuto _),
    "q_quantiles_approx" -> ((s: SparkSession, d: String) => CoreQueries.qQuantilesApprox(s, d)),
    "a6_rollup" -> (CoreQueries.a6Rollup _),
    "a7_pivot" -> (CoreQueries.a7Pivot _),
    "a9_cube" -> (CoreQueries.a9Cube _),
    "a8_corr_stats" -> (CoreQueries.a8CorrStats _),
    "t_redact_pii" -> (CoreQueries.tRedactPii _),
    "s4_set_ops" -> (CoreQueries.s4SetOps _),
    "s8_docstore_scan" -> (graft.sources.DocStore.roundtripQuery _),
    "q_validate" -> (CoreQueries.qValidate _),
    // — event-stream ops —
    "e1_tumbling_window" -> (EventQueries.e1TumblingWindow _),
    "e2_sessionize" -> (EventQueries.e2Sessionize _),
    "e13_sessionize_twophase" -> (EventQueries.e13SessionizeTwoPhase _),
    "e16_sessionize_auto" -> (EventQueries.e16SessionizeAuto _),
    "e3_asof_join" -> (EventQueries.e3AsofJoin _),
    "e12_asof_twophase" -> (EventQueries.e12AsofTwoPhase _),
    "e15_asof_auto" -> (EventQueries.e15AsofAuto _),
    "e4_salted_rollup" -> (EventQueries.e4SaltedRollup _),
    "e5_range_join" -> (EventQueries.e5RangeJoin _),
    "e6_funnel" -> (EventQueries.e6Funnel _),
    "e11_funnel_twophase" -> (EventQueries.e11FunnelTwoPhase _),
    "e14_funnel_auto" -> (EventQueries.e14FunnelAuto _),
    "e7_retention" -> (EventQueries.e7Retention _),
    "e8_spike" -> ((s: SparkSession, d: String) => EventQueries.e8Spike(s, d)),
    "e9_resample" -> ((s: SparkSession, d: String) => EventQueries.e9Resample(s, d)),
    "e10_drift" -> ((s: SparkSession, d: String) => EventQueries.e10Drift(s, d)),
    "k7_scd2" -> (EventQueries.k7Scd2 _),
    // — text analysis / dedup —
    "t_token_count" -> (TextQueries.tTokenCount _),
    "t_quality_score" -> (TextQueries.tQualityScore _),
    "t_quality_gate" -> (TextQueries.tQualityGate _),
    "t_html_extract" -> (TextQueries.tHtmlExtract _),
    "t_source_filter" -> (TextQueries.tSourceFilter _),
    "t_source_overlap" -> (TextQueries.tSourceOverlap _),
    "t_source_overlap_minhash" -> (TextQueries.tSourceOverlapMinhash _),
    "t_source_overlap_lsh" -> (TextQueries.tSourceOverlapLsh _),
    "t_curation_e2e" -> (graft.queries.CurationQueries.tCurationE2e _),
    "t_quality_classifier" -> ((s: SparkSession, d: String) => TextQueries.tQualityClassifier(s, d)),
    "t_stratified_sample" -> ((s: SparkSession, d: String) => TextQueries.tStratifiedSample(s, d)),
    "t_corpus_mix" -> (TextQueries.tCorpusMix _),
    "t_fingerprint" -> (TextQueries.tFingerprint _),
    "t_winnow" -> ((s: SparkSession, d: String) => TextQueries.tWinnow(s, d)),
    "t_lang_id" -> (TextQueries.tLangId _),
    "dedup_exact" -> (TextQueries.dedupExact _),
    "dedup_ngram_jaccard" -> (TextQueries.dedupNgramJaccard _),
    "dedup_editdist" -> ((s: SparkSession, d: String) => TextQueries.dedupEditDist(s, d)),
    "dedup_minhash_lsh" -> (TextQueries.dedupMinhash _),
    "dedup_simhash" -> (TextQueries.dedupSimhash _),
    "dedup_clusters" -> ((s, d) => TextQueries.dedupClusters(s, d)),
    "dedup_clusters_lsh" -> ((s, d) => TextQueries.dedupClustersLsh(s, d)),
    "t_split_safe" -> ((s, d) => TextQueries.tSplitSafe(s, d)),
    "t_shard_shuffle" -> (TextQueries.tShardShuffle _),
    "t_pack_chunks" -> ((s: SparkSession, d: String) => TextQueries.tPackChunks(s, d)),
    "t_decontaminate" -> ((s: SparkSession, d: String) => TextQueries.tDecontaminate(s, d)),
    "t_decontaminate_bloom" -> ((s: SparkSession, d: String) => TextQueries.tDecontaminateBloom(s, d)),
    "t_repetition" -> (TextQueries.tRepetition _),
    "t_substring_spans" -> ((s: SparkSession, d: String) => TextQueries.tSubstringSpans(s, d)),
    "t_tfidf" -> ((s: SparkSession, d: String) => TextQueries.tTfidf(s, d)),
    "t_compress_ratio" -> (TextQueries.tCompressRatio _),
    "t_inverted_index" -> ((s: SparkSession, d: String) => TextQueries.tInvertedIndex(s, d)),
    "t_heavy_hitters" -> ((s: SparkSession, d: String) => TextQueries.tHeavyHitters(s, d)),
    "t_heavy_hitters_cms" -> ((s: SparkSession, d: String) => TextQueries.tHeavyHittersCms(s, d)),
    "t_lm_score" -> (TextQueries.tLmScore _),
    "t_collocations" -> ((s: SparkSession, d: String) => TextQueries.tCollocations(s, d)),
    "t_weighted_sample" -> ((s: SparkSession, d: String) => TextQueries.tWeightedSample(s, d)),
    "t_dsir_weights" -> (TextQueries.tDsirWeights _),
    "t_bpe_tokens" -> ((s: SparkSession, d: String) => TextQueries.tBpe(s, d)),
    "t_bm25_topk" -> ((s: SparkSession, d: String) => RetrievalQueries.tBm25Topk(s, d)),
    "t_hybrid_rrf" -> ((s: SparkSession, d: String) => RetrievalQueries.tHybridRrf(s, d)),
    // — similarity search —
    "ann_brute_topk" -> (VectorQueries.annBruteTopk _),
    "ann_lsh_topk" -> (VectorQueries.annLshTopk _),
    "ann_ivf_topk" -> ((s: SparkSession, d: String) => VectorQueries.annIvfTopk(s, d)),
    "ann_pq_topk" -> ((s: SparkSession, d: String) => VectorQueries.annPqTopk(s, d)),
    "ann_ivf_stored" -> (VectorIndex.annIvfStored _),
    "ann_pq_stored" -> (VectorIndex.annPqStored _),
    "ann_ivfpq_stored" -> (VectorIndex.annIvfPqStored _),
    "ann_graph_topk" -> (VectorIndex.annGraphStored _),
    "ann_graph_batch" -> (VectorIndex.annGraphBatch _),
    "ann_ivf_staleness" -> (VectorIndex.annIvfStaleness _),
    "ann_ivf_del" -> (VectorIndex.annIvfDel _),
    "ann_graph_del" -> (VectorIndex.annGraphDel _),
    "emb_near_dup" -> (VectorQueries.embNearDup _),
    "emb_near_dup_lsh" -> (VectorQueries.embNearDupLsh _),
    "emb_decontaminate" -> ((s: SparkSession, d: String) => VectorQueries.embDecontaminate(s, d)),
    "emb_centroids" -> (VectorQueries.embCentroids _),
    "emb_outliers" -> ((s: SparkSession, d: String) => VectorQueries.embOutliers(s, d)),
    "emb_dedup_clusters" -> (VectorQueries.embDedupClusters _),
    "emb_hard_negatives" -> ((s: SparkSession, d: String) => VectorQueries.embHardNegatives(s, d)),
    "emb_kmeans" -> ((s: SparkSession, d: String) => VectorQueries.embKmeans(s, d)),
    "emb_semdedup" -> ((s: SparkSession, d: String) => VectorQueries.embSemDedup(s, d)),
    // — graph / link analysis —
    "g1_pagerank" -> ((s: SparkSession, d: String) => GraphQueries.g1PageRank(s, d)),
    "g2_copurchase_lift" -> ((s: SparkSession, d: String) => GraphQueries.g2CopurchaseLift(s, d)),
    "g3_triangles" -> ((s: SparkSession, d: String) => GraphQueries.g3Triangles(s, d)),
    "g4_components" -> ((s: SparkSession, d: String) => GraphQueries.g4Components(s, d)),
    "g5_components_inc" -> ((s: SparkSession, d: String) => GraphQueries.g5ComponentsInc(s, d)),
    "g6_bfs_dists" -> ((s: SparkSession, d: String) => GraphQueries.g6BfsDists(s, d)),
    "g7_components_del" -> ((s: SparkSession, d: String) => GraphQueries.g7ComponentsDel(s, d)),
  )

  /** Queries whose oracle SQL is rendered from a trained-model
    * register and therefore appears in `oracleSql` only AFTER the
    * query has run in this JVM. THE canonical list — the smoke
    * tripwire, the SQL-door inventory, and the dialect scan all
    * consume it, so a new register-gated query is added exactly
    * once. */
  val registerGatedQueries: Seq[String] = Seq(
    "t_quality_classifier", "emb_kmeans", "emb_semdedup", "ann_ivf_topk",
    "ann_pq_topk", "ann_ivf_stored", "ann_pq_stored", "ann_ivfpq_stored",
    "ann_ivf_staleness", "ann_graph_topk", "ann_graph_batch",
    "ann_ivf_del", "ann_graph_del",
    "t_bpe_tokens")

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",
    "s1_full_scan" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "s2_filtered_scan" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
         FROM orders WHERE o_orderstatus = 'F'""",
    "j3_broadcast_lookup" ->
      """SELECT p_brand, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",
    "a1_group_collect" ->
      """SELECT l_orderkey, count(*) AS n_lines,
         array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers
         FROM lineitem GROUP BY l_orderkey""",
    "a3_sum_reduce" ->
      """SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
         FROM lineitem GROUP BY l_orderkey""",
    "p10_zero_stock_skip" ->
      """WITH t AS (SELECT l_partkey,
                    CASE WHEN l_linenumber % 3 = 0 THEN 0
                         ELSE CAST(l_quantity AS INT) END AS stock
                    FROM lineitem)
         SELECT l_partkey, CAST(sum(stock) AS BIGINT) AS total_stock,
           count(*) AS n
         FROM t GROUP BY l_partkey HAVING max(stock) > 0""",
    "k2_backfill" ->
      """SELECT event_id,
         coalesce(CASE WHEN event_id % 5 <> 0 THEN event_type END,
           'wholecell') AS db
         FROM events""",
    "k5_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
         old AS (SELECT * FROM o WHERE o_orderkey % 11 <> 0),
         new AS (SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.5
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderstatus
                 FROM o WHERE o_orderkey % 13 <> 0)
         SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'added'
                WHEN new.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           round(old.o_totalprice, 2) AS old_price,
           round(new.o_totalprice, 2) AS new_price
         FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
         WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
            OR old.o_totalprice <> new.o_totalprice
            OR old.o_orderstatus <> new.o_orderstatus""",
    "k6_incremental_agg" ->
      """SELECT l_suppkey, round(sum(l_quantity), 2) AS sum_qty,
         min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
         count(*) AS n_rows,
         round(sum(l_quantity) / count(*), 4) AS avg_qty
         FROM lineitem GROUP BY l_suppkey""",
    "p1_name_synthesis" ->
      """SELECT p_partkey,
         trim(concat_ws(' ', coalesce(p_brand, ''), coalesce(p_type, ''))) AS display_name,
         coalesce(p_brand, 'Unknown') AS brand_or_unknown
         FROM part""",
    "p4_coalesce_chain" ->
      """SELECT event_id, coalesce(
           CASE WHEN event_id % 4 = 0 THEN props END,
           CASE WHEN event_id % 4 = 1 THEN event_type END,
           concat('item_', event_id)) AS serial
         FROM events""",
    "p5_cents_to_dollars" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(round(l_extendedprice) AS BIGINT) AS dollars
         FROM lineitem""",
    "p7_spec_resolver" ->
      """SELECT doc_id,
         CASE WHEN len(hits) > 0 THEN list_extract(hits, 1) ELSE 'Unknown' END AS variant
         FROM (SELECT doc_id, list_filter(str_split(text, ' '),
                 w -> contains(w, 'ag')) AS hits
               FROM documents)""",
    "j1_equi_join" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "j2_substring_join" ->
      """SELECT kw, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents
         JOIN (VALUES ('join'), ('window'), ('stream'), ('filter'), ('hash')) AS k(kw)
           ON contains(lower(text), kw)
         GROUP BY kw""",
    "j4_outer_merge" ->
      """WITH e AS (SELECT l_partkey, sum(l_quantity) AS stock, min(l_extendedprice) AS price
                    FROM lineitem WHERE l_orderkey % 2 = 0 GROUP BY l_partkey),
              i AS (SELECT l_partkey, sum(l_quantity) AS stock, min(l_extendedprice) AS price
                    FROM lineitem WHERE l_orderkey % 2 = 1 GROUP BY l_partkey)
         SELECT coalesce(e.l_partkey, i.l_partkey) AS l_partkey,
           round(coalesce(e.stock, 0) + coalesce(i.stock, 0), 2) AS stock,
           round(least(coalesce(e.price, i.price), coalesce(i.price, e.price)), 2) AS price,
           CASE WHEN e.stock IS NULL THEN 'insert'
                WHEN i.stock IS NULL THEN 'keep'
                ELSE 'merge' END AS action
         FROM e FULL OUTER JOIN i ON e.l_partkey = i.l_partkey""",
    "j5_semi_anti" ->
      """WITH f AS (SELECT c_mktsegment,
                    EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has
                    FROM customer)
         SELECT c_mktsegment,
           CAST(sum(CASE WHEN has THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
           CAST(sum(CASE WHEN has THEN 0 ELSE 1 END) AS BIGINT) AS n_skipped
         FROM f GROUP BY c_mktsegment""",
    "a2_option_agg" ->
      """SELECT l_suppkey, count(*) AS stock,
         round(min(l_extendedprice), 2) AS price,
         array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
         FROM lineitem GROUP BY l_suppkey""",
    "a5_summary_rollup" ->
      """SELECT o_orderstatus, count(*) AS total_fetched,
         count(DISTINCT o_custkey) AS distinct_customers,
         round(sum(o_totalprice), 2) AS total_value,
         round(min(o_totalprice), 2) AS min_value,
         round(max(o_totalprice), 2) AS max_value
         FROM orders GROUP BY o_orderstatus""",
    "w1_topk_per_group" ->
      """SELECT c_mktsegment, rank, c_custkey, round(c_acctbal, 2) AS c_acctbal
         FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey) AS rank
               FROM customer)
         WHERE rank <= 3""",
    // deliberately the ONE-PASS top-k window: agreement proves the
    // salt-shard decomposition (any non-survivor is dominated by k
    // shard-mates), the w4/e11/e12/e13 proof pattern on the fifth
    // combine algebra (bounded-k selection)
    "w5_topk_twophase" ->
      """SELECT c_mktsegment, rank, c_custkey, round(c_acctbal, 2) AS c_acctbal
         FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey) AS rank
               FROM customer)
         WHERE rank <= 3""",
    "w2_running_total" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
         FROM orders""",
    // deliberately the ONE-PASS window on the same exact decimal the
    // engine's two-phase decomposition uses: agreement proves the
    // month-bucketed regrouping, not just the arithmetic
    "w4_running_total_twophase" ->
      """SELECT o_custkey, o_orderkey,
         round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
           OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
           AS running_total
         FROM orders""",
    // the auto-routed twins: whichever route the skew probe picks,
    // the answer equals the one-pass form (decimal associativity for
    // the running total, bounded-k dominance for the top-k) — the
    // oracle texts are deliberately those one-pass forms, so a
    // routing decision that COULD change the result fails loudly
    "w6_running_total_auto" ->
      """SELECT o_custkey, o_orderkey,
         round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
           OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
           AS running_total
         FROM orders""",
    "w7_topk_auto" ->
      """SELECT c_mktsegment, rank, c_custkey, round(c_acctbal, 2) AS c_acctbal
         FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey) AS rank
               FROM customer)
         WHERE rank <= 3""",
    "w3_order_gaps" ->
      """SELECT o_custkey, o_orderkey,
         CAST(floor(epoch(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)) / 86400)
            - floor(epoch(CAST(CAST(lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS DATE) AS TIMESTAMP)) / 86400)
           AS BIGINT) AS gap_days
         FROM orders""",
    "a6_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "a9_cube" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    // SCD2: the lag/lead reconstruction is pure integer/timestamp
    // window arithmetic — both engines compute it identically
    "k7_scd2" ->
      """WITH p AS (SELECT user_id, ts, event_id,
                    CAST(floor(value / 100) AS INT) AS tier
                    FROM events WHERE event_type = 'purchase'),
              l AS (SELECT *, lag(tier) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tier
                    FROM p),
              c AS (SELECT user_id, ts, event_id, tier FROM l
                    WHERE prev_tier IS NULL OR prev_tier <> tier),
              v AS (SELECT user_id, tier, ts, lead(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) AS vt
                    FROM c)
         SELECT user_id, tier,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
           vt IS NULL AS is_current
         FROM v""",
    "a7_pivot" ->
      """SELECT l_returnflag,
         round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
         round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
         FROM lineitem GROUP BY l_returnflag""",
    "a8_corr_stats" ->
      """SELECT l_returnflag, count(*) AS n_rows,
         round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
         round(corr(l_discount, l_extendedprice), 4) AS corr_disc_price,
         round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
         round(stddev_samp(l_extendedprice), 2) AS stddev_price,
         round(var_samp(l_quantity), 4) AS var_qty
         FROM lineitem GROUP BY l_returnflag""",
    "q_quantiles" ->
      """SELECT o_orderstatus,
         round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
         round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
         round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
         round(max(o_totalprice), 2) AS pmax
         FROM orders GROUP BY o_orderstatus""",
    // deliberately the ONE-PASS exact quantile: agreement proves the
    // histogram localization (sixth two-phase algebra —
    // order-statistic location), not just the interpolation
    "q_quantiles_twophase" ->
      """SELECT o_orderstatus,
         round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
         round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
         round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
         round(max(o_totalprice), 2) AS pmax
         FROM orders GROUP BY o_orderstatus""",
    // the auto twin's oracle is again the one-pass exact quantile:
    // whichever route the skew probe picks must reproduce it
    "q_quantiles_auto" ->
      """SELECT o_orderstatus,
         round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
         round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
         round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
         round(max(o_totalprice), 2) AS pmax
         FROM orders GROUP BY o_orderstatus""",
    "t_redact_pii" ->
      """SELECT c_custkey,
         array_to_string(string_split_regex(c_name, '[0-9]+'), '<ID>') AS name_masked,
         CAST(floor(c_acctbal / 100) * 100 AS DOUBLE) AS acctbal_bucket,
         c_mktsegment
         FROM customer""",
    // priority sampling stays in exact integers: u div w is floor
    // division in both dialects, so selection order is bit-identical
    "t_weighted_sample" ->
      """SELECT source, rk, doc_id, w, prio
         FROM (SELECT source, doc_id, w, prio,
                 row_number() OVER (PARTITION BY source
                   ORDER BY prio, doc_id) AS rk
               FROM (SELECT source, doc_id, w,
                       CAST((hx32 - (hx32 % w)) / w AS BIGINT) AS prio
                     FROM (SELECT source, doc_id,
                             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS w,
                             ((position(substr(md5(concat_ws(':', source, doc_id)), 25, 1) IN '0123456789abcdef') - 1) * CAST(268435456 AS BIGINT)
                      + (position(substr(md5(concat_ws(':', source, doc_id)), 26, 1) IN '0123456789abcdef') - 1) * CAST(16777216 AS BIGINT)
                      + (position(substr(md5(concat_ws(':', source, doc_id)), 27, 1) IN '0123456789abcdef') - 1) * CAST(1048576 AS BIGINT)
                      + (position(substr(md5(concat_ws(':', source, doc_id)), 28, 1) IN '0123456789abcdef') - 1) * CAST(65536 AS BIGINT)
                      + (position(substr(md5(concat_ws(':', source, doc_id)), 29, 1) IN '0123456789abcdef') - 1) * CAST(4096 AS BIGINT)
                      + (position(substr(md5(concat_ws(':', source, doc_id)), 30, 1) IN '0123456789abcdef') - 1) * CAST(256 AS BIGINT)
                      + (position(substr(md5(concat_ws(':', source, doc_id)), 31, 1) IN '0123456789abcdef') - 1) * CAST(16 AS BIGINT)
                      + (position(substr(md5(concat_ws(':', source, doc_id)), 32, 1) IN '0123456789abcdef') - 1)) AS hx32
                           FROM documents WHERE text IS NOT NULL)))
         WHERE rk <= 10""",
    "t_stratified_sample" ->
      """SELECT lang, doc_id, rk
         FROM (SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY md5(text), doc_id) AS rk
               FROM documents)
         WHERE rk <= 20""",
    "t_corpus_mix" ->
      """SELECT lang, doc_id FROM documents
         WHERE substr(md5(text), 1, 2) <
           (CASE lang WHEN 'en' THEN '80' WHEN 'zh' THEN '40' ELSE 'g0' END)""",
    "s4_set_ops" ->
      """WITH y95 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
              y96 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
         SELECT 'churned_after_1995' AS cohort, o_custkey
         FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
         UNION ALL
         SELECT 'retained_1996', o_custkey
         FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)""",
    // the Spark side reads documents THROUGH the graft-docs DSv2
    // store (one JSON file per doc, bootstrapped once) — the oracle
    // reads the original parquet, so a match proves the store
    // round-trips content byte-faithfully
    "s8_docstore_scan" ->
      """SELECT doc_id, lang, length(text)::BIGINT AS n_chars FROM documents""",
    "q_validate" ->
      """WITH m AS (SELECT count(*) AS total,
              CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty,
              CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS range_qty,
              CAST(sum(CASE WHEN l_quantity > 30 THEN 1 ELSE 0 END) AS BIGINT) AS qty_advisory,
              CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS range_disc
              FROM lineitem)
         SELECT 'lineitem.l_quantity not null' AS check_name, null_qty AS violations, total FROM m
         UNION ALL SELECT 'lineitem.l_quantity in [1,50]', range_qty, total FROM m
         UNION ALL SELECT 'lineitem.l_quantity <= 30 (advisory)', qty_advisory, total FROM m
         UNION ALL SELECT 'lineitem.l_discount in [0,0.1]', range_disc, total FROM m
         UNION ALL SELECT 'orders.o_orderkey unique',
           count(*) - count(DISTINCT o_orderkey), count(*) FROM orders
         UNION ALL SELECT 'lineitem.l_orderkey references orders',
           (SELECT count(*) FROM lineitem l LEFT JOIN orders o
              ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL),
           (SELECT count(*) FROM lineitem)""",
    "q_hll_distinct" -> graft.queries.CoreQueries.hllOracleSql,
    "q_hll_grouped" -> graft.queries.CoreQueries.hllGroupedOracleSql,
    "q_zorder_key" -> graft.queries.LayoutQueries.zorderOracleSql,
    "q_profile" ->
      """WITH t AS (SELECT * FROM orders)
         SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
           count(*) - count(o_custkey) AS n_null,
           count(DISTINCT o_custkey) AS n_distinct FROM t
         UNION ALL
         SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice) FROM t
         UNION ALL
         SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus) FROM t
         UNION ALL
         SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
           count(DISTINCT o_orderdate) FROM t""",
    "e1_tumbling_window" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
                '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2""",
    "e2_sessionize" ->
      """WITH l AS (SELECT user_id, ts, value, event_id,
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                    FROM events),
              g AS (SELECT user_id, ts, value, event_id,
                    CASE WHEN prev_ts IS NULL
                         OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
                    FROM l),
              s AS (SELECT user_id, value,
                    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS session_id
                    FROM g),
              per AS (SELECT user_id, session_id, count(*) AS n_events,
                      round(sum(value), 2) AS session_value
                      FROM s GROUP BY user_id, session_id)
         SELECT user_id, count(*) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           round(max(session_value), 2) AS max_session_value
         FROM per GROUP BY user_id""",
    // deliberately e2's ONE-PASS oracle verbatim: the engine runs the
    // (user, day)-bucketed session RENUMBERING, so agreement proves
    // the decomposition (the w4/e11/e12 proof trick)
    "e16_sessionize_auto" ->
      """WITH l AS (SELECT user_id, ts, value, event_id,
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                    FROM events),
              g AS (SELECT user_id, ts, value, event_id,
                    CASE WHEN prev_ts IS NULL
                         OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
                    FROM l),
              s AS (SELECT user_id, value,
                    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS session_id
                    FROM g),
              per AS (SELECT user_id, session_id, count(*) AS n_events,
                      round(sum(value), 2) AS session_value
                      FROM s GROUP BY user_id, session_id)
         SELECT user_id, count(*) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           round(max(session_value), 2) AS max_session_value
         FROM per GROUP BY user_id""",
    "e13_sessionize_twophase" ->
      """WITH l AS (SELECT user_id, ts, value, event_id,
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                    FROM events),
              g AS (SELECT user_id, ts, value, event_id,
                    CASE WHEN prev_ts IS NULL
                         OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
                    FROM l),
              s AS (SELECT user_id, value,
                    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS session_id
                    FROM g),
              per AS (SELECT user_id, session_id, count(*) AS n_events,
                      round(sum(value), 2) AS session_value
                      FROM s GROUP BY user_id, session_id)
         SELECT user_id, count(*) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           round(max(session_value), 2) AS max_session_value
         FROM per GROUP BY user_id""",
    "e3_asof_join" ->
      """SELECT c.event_id, c.user_id, e.err_id AS asof_err_id
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
         ASOF LEFT JOIN
              (SELECT event_id AS err_id, user_id, ts FROM events WHERE event_type = 'error') e
           ON c.user_id = e.user_id AND c.ts >= e.ts""",
    // the auto twin must reproduce the one-pass ASOF whichever route
    // the skew probe picks
    "e15_asof_auto" ->
      """SELECT c.event_id, c.user_id, e.err_id AS asof_err_id
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
         ASOF LEFT JOIN
              (SELECT event_id AS err_id, user_id, ts FROM events WHERE event_type = 'error') e
           ON c.user_id = e.user_id AND c.ts >= e.ts""",
    // deliberately e3's ONE-PASS ASOF oracle verbatim: the engine runs
    // the (user, day)-bucketed two-phase decomposition, so agreement
    // proves the regrouping (the w4/e11 proof trick)
    "e12_asof_twophase" ->
      """SELECT c.event_id, c.user_id, e.err_id AS asof_err_id
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
         ASOF LEFT JOIN
              (SELECT event_id AS err_id, user_id, ts FROM events WHERE event_type = 'error') e
           ON c.user_id = e.user_id AND c.ts >= e.ts""",
    "e4_salted_rollup" ->
      """SELECT user_id, event_type, count(*) AS n_events,
         round(sum(value), 2) AS sum_value
         FROM events GROUP BY user_id, event_type""",
    // the oracle is the naive theta join (DuckDB IEJoin handles it at
    // oracle scale); ts cast to microsecond TIMESTAMP to match the
    // engine's nanos→micros read (Tables.events)
    "e5_range_join" ->
      """WITH err AS (SELECT event_id AS err_id, CAST(ts AS TIMESTAMP) AS s
                    FROM events WHERE event_type = 'error'),
              clk AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value
                    FROM events WHERE event_type = 'click')
         SELECT e.err_id, count(c.event_id) AS n_clicks,
           round(coalesce(sum(c.value), 0), 2) AS click_value
         FROM err e LEFT JOIN clk c
           ON c.ts >= e.s AND c.ts < e.s + INTERVAL 10 MINUTE
         GROUP BY e.err_id""",
    // ordered funnel: each stage's first qualifying time is a running
    // conditional min over the same per-user frame; stage k counts
    // only at-or-after stage k-1's first time
    "e6_funnel" ->
      """WITH s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
                    FROM events),
              l1 AS (SELECT user_id, ts, event_id, event_type,
                    min(CASE WHEN event_type = 'view' THEN ts END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_ts
                    FROM s),
              l2 AS (SELECT *, min(CASE WHEN event_type = 'click'
                           AND view_ts IS NOT NULL THEN ts END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
                    FROM l1),
              l3 AS (SELECT *, min(CASE WHEN event_type = 'purchase'
                           AND click_ts IS NOT NULL THEN ts END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS purchase_ts
                    FROM l2),
              agg AS (SELECT user_id,
                    epoch_us(min(view_ts)) AS view_us,
                    epoch_us(min(click_ts)) AS click_us,
                    epoch_us(min(purchase_ts)) AS purchase_us
                    FROM l3 GROUP BY user_id)
         SELECT user_id, view_us, click_us, purchase_us,
           CAST(CASE WHEN purchase_us IS NOT NULL THEN 3
                WHEN click_us IS NOT NULL THEN 2
                WHEN view_us IS NOT NULL THEN 1
                ELSE 0 END AS BIGINT) AS depth
         FROM agg""",
    // the auto twin must reproduce the one-pass funnel whichever
    // route the skew probe picks
    "e14_funnel_auto" ->
      """WITH s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
                    FROM events),
              l1 AS (SELECT user_id, ts, event_id, event_type,
                    min(CASE WHEN event_type = 'view' THEN ts END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_ts
                    FROM s),
              l2 AS (SELECT *, min(CASE WHEN event_type = 'click'
                           AND view_ts IS NOT NULL THEN ts END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
                    FROM l1),
              l3 AS (SELECT *, min(CASE WHEN event_type = 'purchase'
                           AND click_ts IS NOT NULL THEN ts END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS purchase_ts
                    FROM l2),
              agg AS (SELECT user_id,
                    epoch_us(min(view_ts)) AS view_us,
                    epoch_us(min(click_ts)) AS click_us,
                    epoch_us(min(purchase_ts)) AS purchase_us
                    FROM l3 GROUP BY user_id)
         SELECT user_id, view_us, click_us, purchase_us,
           CAST(CASE WHEN purchase_us IS NOT NULL THEN 3
                WHEN click_us IS NOT NULL THEN 2
                WHEN view_us IS NOT NULL THEN 1
                ELSE 0 END AS BIGINT) AS depth
         FROM agg""",
    // deliberately the ONE-PASS funnel (e6's oracle verbatim): the
    // engine runs the (user, day)-bucketed two-phase decomposition,
    // so agreement proves the regrouping, not just the stage logic
    "e11_funnel_twophase" ->
      """WITH s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
                    FROM events),
              l1 AS (SELECT user_id, ts, event_id, event_type,
                    min(CASE WHEN event_type = 'view' THEN ts END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_ts
                    FROM s),
              l2 AS (SELECT *, min(CASE WHEN event_type = 'click'
                           AND view_ts IS NOT NULL THEN ts END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
                    FROM l1),
              l3 AS (SELECT *, min(CASE WHEN event_type = 'purchase'
                           AND click_ts IS NOT NULL THEN ts END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS purchase_ts
                    FROM l2),
              agg AS (SELECT user_id,
                    epoch_us(min(view_ts)) AS view_us,
                    epoch_us(min(click_ts)) AS click_us,
                    epoch_us(min(purchase_ts)) AS purchase_us
                    FROM l3 GROUP BY user_id)
         SELECT user_id, view_us, click_us, purchase_us,
           CAST(CASE WHEN purchase_us IS NOT NULL THEN 3
                WHEN click_us IS NOT NULL THEN 2
                WHEN view_us IS NOT NULL THEN 1
                ELSE 0 END AS BIGINT) AS depth
         FROM agg""",
    // weekly cohort retention: cohort = Monday-truncated week of the
    // user's first event; cells count users active k weeks later
    "e7_retention" ->
      """WITH ev AS (SELECT user_id,
                    date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk FROM events),
              cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1),
              active AS (SELECT DISTINCT user_id, wk FROM ev)
         SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
           CAST((epoch_us(wk) - epoch_us(cohort_wk)
               - ((epoch_us(wk) - epoch_us(cohort_wk)) % 604800000000))
             / 604800000000 AS BIGINT) AS week_offset,
           count(DISTINCT user_id) AS n_active
         FROM active JOIN cohort USING (user_id)
         GROUP BY 1, 2""",
    // burst ratio stays exact-integer until one IEEE division, so
    // the rounded value hashes identically across engines
    "e8_spike" ->
      """WITH ev AS (SELECT event_type,
                    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h FROM events),
              ph AS (SELECT event_type, h, count(*) AS n FROM ev GROUP BY 1, 2),
              st AS (SELECT event_type, sum(n) AS total, count(*) AS n_buckets
                    FROM ph GROUP BY 1)
         SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, n,
           round(n * n_buckets / total, 4) AS burst
         FROM ph JOIN st USING (event_type)
         WHERE round(n * n_buckets / total, 4) >= 2.0""",
    // dense 15-minute grid per type via generate_series over the
    // per-type bucket bounds; bucket value rounded BEFORE the
    // forward fill so carried copies hash identically
    "e9_resample" ->
      """WITH obs AS (SELECT event_type,
                    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) AS BIGINT) AS bkt,
                    count(*) AS n, round(sum(value), 2) AS v
                    FROM events GROUP BY 1, 2),
              bounds AS (SELECT event_type, min(bkt) AS lo, max(bkt) AS hi
                    FROM obs GROUP BY 1),
              grid AS (SELECT event_type, unnest(generate_series(lo, hi)) AS bkt
                    FROM bounds),
              j AS (SELECT g.event_type, g.bkt, o.n, o.v
                    FROM grid g LEFT JOIN obs o USING (event_type, bkt)),
              f AS (SELECT event_type, bkt, n, v,
                    count(v) OVER (PARTITION BY event_type ORDER BY bkt
                      ROWS UNBOUNDED PRECEDING) AS fill_grp
                    FROM j)
         SELECT strftime(make_timestamp(bkt * 900000000), '%Y-%m-%d %H:%M:%S') AS bucket_start,
           event_type, coalesce(n, 0) AS n_events,
           CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap,
           max(v) OVER (PARTITION BY event_type, fill_grp) AS fill_value
         FROM f""",
    // drift matrix: integer counts + single IEEE divisions only, so
    // both engines agree bit-for-bit (no log(), no summed doubles)
    "e10_drift" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us, value FROM events),
              m AS (SELECT min(us) + CAST((max(us) - min(us)
                      - ((max(us) - min(us)) % 2)) / 2 AS BIGINT) AS mid FROM e),
              x AS (SELECT event_type, us >= mid AS late,
                    least(CAST(floor(value / 25.0) AS INT), 19) AS bin FROM e, m),
              g AS (SELECT event_type, bin,
                    count(*) FILTER (WHERE NOT late) AS n_early,
                    count(*) FILTER (WHERE late) AS n_late
                    FROM x GROUP BY 1, 2),
              t AS (SELECT *,
                    CAST(sum(n_early) OVER (PARTITION BY event_type) AS BIGINT) AS te,
                    CAST(sum(n_late) OVER (PARTITION BY event_type) AS BIGINT) AS tl
                    FROM g)
         SELECT event_type, bin, n_early, n_late,
           round(n_early / te, 6) AS rate_early,
           round(n_late / tl, 6) AS rate_late,
           round(abs(n_early / te - n_late / tl), 6) AS delta
         FROM t""",
    // the bucket is the low 32 md5 bits mod 1024 (1024 | 2^32, so
    // the low half alone determines it) — bit-identical in DuckDB
    "t_dsir_weights" ->
      """WITH d AS (SELECT doc_id, lang,
                list_filter(string_split_regex(lower(trim(text)), '\s+'),
                  t -> t <> '') AS toks
                FROM documents),
         d2 AS (SELECT doc_id, lang, toks, len(toks) AS n FROM d WHERE len(toks) >= 2),
         big AS (SELECT doc_id, lang,
                   concat(list_extract(toks, g), ' ', list_extract(toks, g + 1)) AS g
                 FROM (SELECT doc_id, lang, toks, unnest(range(1, n)) AS g FROM d2)),
         hb AS (SELECT doc_id, lang,
                ((position(substr(md5(g), 25, 1) IN '0123456789abcdef') - 1) * CAST(268435456 AS BIGINT)
                      + (position(substr(md5(g), 26, 1) IN '0123456789abcdef') - 1) * CAST(16777216 AS BIGINT)
                      + (position(substr(md5(g), 27, 1) IN '0123456789abcdef') - 1) * CAST(1048576 AS BIGINT)
                      + (position(substr(md5(g), 28, 1) IN '0123456789abcdef') - 1) * CAST(65536 AS BIGINT)
                      + (position(substr(md5(g), 29, 1) IN '0123456789abcdef') - 1) * CAST(4096 AS BIGINT)
                      + (position(substr(md5(g), 30, 1) IN '0123456789abcdef') - 1) * CAST(256 AS BIGINT)
                      + (position(substr(md5(g), 31, 1) IN '0123456789abcdef') - 1) * CAST(16 AS BIGINT)
                      + (position(substr(md5(g), 32, 1) IN '0123456789abcdef') - 1)) % 1024 AS b FROM big),
         t AS (SELECT b, count(*) AS ct FROM hb WHERE lang = 'en' GROUP BY 1),
         r AS (SELECT b, count(*) AS cr FROM hb GROUP BY 1),
         tot AS (SELECT count(*) AS nr, count(*) FILTER (WHERE lang = 'en') AS nt FROM hb),
         s AS (SELECT doc_id, count(*) AS n_grams,
               round(sum(ln((coalesce(ct, 0) + 1.0) / (nt + 1024.0))
                       - ln((cr + 1.0) / (nr + 1024.0))) / count(*), 4) AS dsir_logratio
               FROM hb LEFT JOIN t USING (b) JOIN r USING (b) CROSS JOIN tot
               GROUP BY doc_id)
         SELECT doc_id, n_grams, dsir_logratio,
           dsir_logratio > 0 AS target_like FROM s""",
    "t_token_count" ->
      """SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])', 1)) AS BIGINT) AS n_subtokens,
         CAST(length(text) AS BIGINT) AS n_chars
         FROM documents""",
    "t_quality_score" ->
      """SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         round(CAST(length(text) AS DOUBLE) / len(toks), 4) AS avg_token_len,
         round(CAST(len(list_filter(toks,
           t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS DOUBLE) / len(toks), 4)
           AS stopword_ratio,
         round(CAST(length(text) - length(array_to_string(string_split_regex(text, '[.,!?;:]'), '')) AS DOUBLE)
           / length(text), 4) AS punct_ratio
         FROM (SELECT doc_id, text,
                 string_split_regex(trim(lower(text)), '\s+') AS toks
               FROM documents)""",
    // verdicts compare ALREADY-ROUNDED features, so the gate is
    // exactly reproducible cross-engine
    "t_quality_gate" ->
      """WITH q AS (SELECT doc_id,
                CAST(len(toks) AS BIGINT) AS n_tokens,
                round(CAST(len(list_filter(toks,
                  t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS DOUBLE)
                  / len(toks), 4) AS stopword_ratio
                FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
                      FROM documents)),
         toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
                  FROM documents),
         base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS nt,
                  CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq FROM toks),
         bi AS (SELECT doc_id, concat(list_extract(w, g), ' ',
                  list_extract(w, g + 1)) AS gram
                FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS g
                      FROM toks)),
         cnt AS (SELECT doc_id, gram, count(*) AS c FROM bi GROUP BY 1, 2),
         top AS (SELECT doc_id, max(c) AS top_c FROM cnt GROUP BY 1),
         r AS (SELECT b.doc_id,
               round(CAST(b.n_uniq AS DOUBLE) / b.nt, 4) AS uniq_token_frac,
               round(CAST(coalesce(t.top_c, 0) AS DOUBLE)
                 / greatest(b.nt - 1, 1), 4) AS top_bigram_frac
               FROM base b LEFT JOIN top t USING (doc_id))
         SELECT doc_id,
           n_tokens >= 20 AS len_ok,
           stopword_ratio >= 0.02 AS stopword_ok,
           uniq_token_frac >= 0.3 AS uniq_ok,
           top_bigram_frac <= 0.1 AS repetition_ok,
           (n_tokens >= 20 AND stopword_ratio >= 0.02
            AND uniq_token_frac >= 0.3 AND top_bigram_frac <= 0.1) AS keep
         FROM q JOIN r USING (doc_id)""",
    // every step is split+rejoin (regexp_replace 3-arg semantics
    // diverge cross-engine: first-match vs global), so the whole
    // extraction is a full row-identity oracle
    "t_html_extract" ->
      """WITH h AS (SELECT doc_id,
             '<html><head><title>Doc ' || doc_id
             || '</title><script type="text/javascript">var x = 1; console.log(x);</script></head><body>'
             || '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>'
             || '<p>' || substr(text, 1, 120) || '.</p>'
             || '<p>' || substr(text, 121, 80) || '</p>'
             || '<div>This site uses cookies. Accept.</div>'
             || '<p>(c) 2024 Corp.</p>'
             || '<p>' || substr(text, 201, 1000000) || '.</p>'
             || '</body></html>' AS html
           FROM documents),
         s AS (SELECT doc_id,
               array_to_string(string_split_regex(
                 array_to_string(string_split_regex(html,
                   '(?s)<script[^>]*>.*?</script>'), ' '),
                 '(?s)<style[^>]*>.*?</style>'), ' ') AS t FROM h),
         r AS (SELECT doc_id,
               string_split_regex(t, '</p>|</div>|</nav>|</li>|</h[1-6]>|</tr>') AS raw
               FROM s),
         n AS (SELECT doc_id, raw,
               list_transform(
                 list_filter(raw, l -> length(l) - length(replace(l, '<a ', '')) < 6),
                 l -> array_to_string(list_filter(
                   string_split_regex(
                     replace(replace(replace(replace(replace(replace(
                       array_to_string(string_split_regex(l, '<[^>]*>'), ' '),
                       '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                       '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
                     '\s+'),
                   w -> w <> ''), ' ')) AS norm FROM r),
         f AS (SELECT doc_id, raw,
               list_filter(norm, l -> length(l) > 0
                 AND substr(l, -1, 1) IN ('.', '!', '?')
                 AND len(string_split_regex(l, ' ')) >= 5
                 AND NOT contains(lower(l), 'cookie')
                 AND NOT contains(lower(l), 'javascript')) AS kept FROM n)
         SELECT doc_id, CAST(len(raw) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept,
           round(CAST(len(kept) AS DOUBLE) / len(raw), 4) AS keep_ratio,
           array_to_string(kept, chr(10)) AS clean_text
         FROM f""",
    // integer aggregates with one rounded division each; verdict
    // over the already-rounded ratios (the t_quality_gate argument
    // lifted to the per-source rollup)
    "t_source_filter" ->
      """WITH d AS (SELECT source,
                md5(array_to_string(string_split_regex(lower(trim(text)), '\s+'), ' ')) AS dg,
                CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt,
                CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                  t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS BIGINT) AS ns
                FROM documents),
         g AS (SELECT source, dg, count(*) AS c,
               sum(nt) AS t, sum(ns) AS s FROM d GROUP BY 1, 2),
         src AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
               count(*) AS n_uniq,
               CAST(sum(t) AS BIGINT) AS tok, CAST(sum(s) AS BIGINT) AS st
               FROM g GROUP BY 1),
         r AS (SELECT source, n_docs, n_uniq,
               round(CAST(n_docs - n_uniq AS DOUBLE) / n_docs, 4) AS dup_frac,
               round(CAST(st AS DOUBLE) / tok, 4) AS stop_frac,
               round(CAST(tok AS DOUBLE) / n_docs, 4) AS mean_tok
               FROM src)
         SELECT source, n_docs, n_uniq, dup_frac, stop_frac, mean_tok,
           (n_docs >= 5 AND dup_frac <= 0.2
            AND stop_frac >= 0.055 AND mean_tok >= 50.0) AS keep
         FROM r""",
    "t_fingerprint" ->
      """SELECT doc_id,
         md5(array_to_string(string_split_regex(lower(trim(text)), '\s+'), ' ')) AS fingerprint,
         substring(md5(array_to_string(string_split_regex(lower(trim(text)), '\s+'), ' ')), 1, 4) AS shard_key
         FROM documents""",
    "t_winnow" ->
      """WITH n AS (SELECT doc_id,
                    array_to_string(string_split_regex(lower(trim(text)), '\s+'), ' ') AS t
                    FROM documents),
              g AS (SELECT doc_id,
                    list_transform(range(1, length(t) - 6),
                      i -> md5(substr(t, CAST(i AS INT), 8))) AS hashes
                    FROM n WHERE length(t) >= 8),
              s AS (SELECT doc_id,
                    CASE WHEN len(hashes) >= 4 THEN
                      list_sort(list_distinct(
                        list_transform(range(1, len(hashes) - 2),
                          i -> list_min(array_slice(hashes,
                                 CAST(i AS INT), CAST(i + 3 AS INT))))))
                    ELSE list_value(list_min(hashes)) END AS sel
                    FROM g)
         SELECT doc_id, CAST(len(sel) AS BIGINT) AS n_selected,
           md5(array_to_string(sel, ',')) AS winnow_digest
         FROM s""",
    "dedup_exact" ->
      """SELECT md5(array_to_string(string_split_regex(lower(trim(text)), '\s+'), ' ')) AS content_key,
         min(doc_id) AS keep_doc_id, count(*) AS n_copies
         FROM documents GROUP BY 1""",
    // ASCII-scoped on both sides: Spark levenshtein counts code
    // points, DuckDB's counts bytes — identical only on ASCII.
    // The c-CTE np<=256 guard mirrors the engine's MaxEditBlock
    // hot-block cap exactly: a block with > 256 DISTINCT prefixes
    // contributes no cross-prefix pairs on either side, while
    // equal-prefix (dist-0) pairs are immune — the engine's
    // digest-collapse path emits them regardless of block size.
    "dedup_editdist" ->
      """WITH d AS (SELECT doc_id, lang,
                    substr(trim(text), 1, 256) AS pfx,
                    substr(trim(text), 1, 16) AS blk FROM documents
                    WHERE regexp_matches(substr(trim(text), 1, 256), '^[ -~]*$')),
              c AS (SELECT lang, blk, count(DISTINCT pfx) AS np
                    FROM d GROUP BY lang, blk),
              p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                    levenshtein(a.pfx, b.pfx) AS dist
                    FROM d a JOIN d b
                      ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
                    JOIN c ON c.lang = a.lang AND c.blk = a.blk
                    WHERE a.pfx = b.pfx OR c.np <= 256)
         SELECT a_id, b_id, dist FROM p WHERE dist <= 64""",
    "dedup_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, lang,
                    list_distinct(string_split_regex(trim(lower(trim(text))), '\s+')) AS toks
                    FROM documents),
              p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                    round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                      / len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jaccard
                    FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id)
         SELECT a_id, b_id, jaccard FROM p WHERE jaccard >= 0.9""",
    // MinHash LSH: the output is spec-pinned set-EQUAL to exact
    // 3-shingle Jaccard >= 0.7 on this corpus (TextQueriesSpec), and
    // hashed-set Jaccard == string-set Jaccard, so the exact
    // all-pairs computation over string shingles IS the oracle — no
    // engine hash needs reproducing. An LSH recall regression breaks
    // this row and the spec together. (Quadratic oracle: verification
    // scale only, like dedup_ngram_jaccard's.)
    "dedup_minhash_lsh" ->
      """WITH t AS (SELECT doc_id,
                    string_split_regex(trim(lower(trim(text))), '\s+') AS toks
                    FROM documents),
              s AS (SELECT doc_id,
                    list_distinct(list_transform(generate_series(1, len(toks) - 2),
                      i -> list_extract(toks, i) || ' ' || list_extract(toks, i+1) || ' ' || list_extract(toks, i+2))) AS sh
                    FROM t WHERE len(toks) >= 3),
              p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                      / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
                    FROM s a JOIN s b ON a.doc_id < b.doc_id)
         SELECT a_id, b_id, jaccard FROM p WHERE jaccard >= 0.7""",
    // ...and clustering those exact pairs with the same recursive
    // reachability CTE as dedup_clusters gives the LSH clustering its
    // oracle too
    "dedup_clusters_lsh" ->
      """WITH RECURSIVE
              t AS (SELECT doc_id,
                    string_split_regex(trim(lower(trim(text))), '\s+') AS toks
                    FROM documents),
              s AS (SELECT doc_id,
                    list_distinct(list_transform(generate_series(1, len(toks) - 2),
                      i -> list_extract(toks, i) || ' ' || list_extract(toks, i+1) || ' ' || list_extract(toks, i+2))) AS sh
                    FROM t WHERE len(toks) >= 3),
              p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
                    FROM s a JOIN s b ON a.doc_id < b.doc_id
                    WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                      / len(list_distinct(list_concat(a.sh, b.sh))), 4) >= 0.7),
              e AS (SELECT a_id AS src, b_id AS dst FROM p
                    UNION SELECT b_id, a_id FROM p),
              walk(id, lbl) AS (
                    SELECT src, src FROM e
                    UNION
                    SELECT e.src, w.lbl FROM e JOIN walk w ON e.dst = w.id)
         SELECT id AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY id""",
    // leakage-safe splits: the dedup_clusters_lsh component labels
    // (same recursive CTE), singletons labeling themselves, then the
    // split decided by md5 of the CLUSTER label — first two hex
    // chars as a 0..255 bucket (Spark computes the bucket via conv,
    // DuckDB via two position() nibble decodes — same value)
    "t_split_safe" ->
      """WITH RECURSIVE
              t AS (SELECT doc_id,
                    string_split_regex(trim(lower(trim(text))), '\s+') AS toks
                    FROM documents),
              s AS (SELECT doc_id,
                    list_distinct(list_transform(generate_series(1, len(toks) - 2),
                      i -> list_extract(toks, i) || ' ' || list_extract(toks, i+1) || ' ' || list_extract(toks, i+2))) AS sh
                    FROM t WHERE len(toks) >= 3),
              p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
                    FROM s a JOIN s b ON a.doc_id < b.doc_id
                    WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                      / len(list_distinct(list_concat(a.sh, b.sh))), 4) >= 0.7),
              e AS (SELECT a_id AS src, b_id AS dst FROM p
                    UNION SELECT b_id, a_id FROM p),
              walk(id, lbl) AS (
                    SELECT src, src FROM e
                    UNION
                    SELECT e.src, w.lbl FROM e JOIN walk w ON e.dst = w.id),
              cl AS (SELECT id AS doc_id, min(lbl) AS cluster_id
                     FROM walk GROUP BY id),
              lab AS (SELECT d.doc_id,
                      coalesce(cl.cluster_id, d.doc_id) AS cluster_id
                      FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
              b AS (SELECT doc_id, cluster_id,
                    CAST((position(substr(md5(concat(cluster_id, ':split42')), 1, 1)
                            IN '0123456789abcdef') - 1) * 16
                       + position(substr(md5(concat(cluster_id, ':split42')), 2, 1)
                            IN '0123456789abcdef') - 1 AS BIGINT) AS bucket
                    FROM lab)
         SELECT doc_id, cluster_id,
           CASE WHEN bucket < 205 THEN 'train'
                WHEN bucket < 230 THEN 'val'
                ELSE 'test' END AS split
         FROM b""",
    // SimHash: the per-token hash is md5's lower 64 bits (chars
    // 17..32 as two 32-bit halves — hi/lo kept separate here so no
    // intermediate overflows BIGINT), per-bit ±1 majority sums over
    // the token stream, then all-pairs hamming via xor + bit_count.
    // Brute-force over every pair, so it also re-proves the Spark
    // side's pigeonhole candidate generation is exact at <= 6.
    "dedup_simhash" ->
      s"""WITH toks AS (SELECT doc_id,
                    unnest(string_split_regex(trim(lower(trim(text))), '\\s+')) AS tok
                    FROM documents),
              h AS (SELECT doc_id,
                    ${TextQueries.hexPolySql("md5(tok)", 17)} AS hi,
                    ${TextQueries.hexPolySql("md5(tok)", 25)} AS lo
                    FROM toks),
              sums AS (SELECT doc_id, b,
                    sum(CASE WHEN ((hi >> b) & 1) = 1 THEN 1 ELSE -1 END) AS shi,
                    sum(CASE WHEN ((lo >> b) & 1) = 1 THEN 1 ELSE -1 END) AS slo
                    FROM h, (SELECT unnest(generate_series(0, 31)) AS b) r
                    GROUP BY doc_id, b),
              sig AS (SELECT doc_id,
                    sum(CASE WHEN shi > 0 THEN CAST(1 AS BIGINT) << b
                             ELSE CAST(0 AS BIGINT) END) AS sig_hi,
                    sum(CASE WHEN slo > 0 THEN CAST(1 AS BIGINT) << b
                             ELSE CAST(0 AS BIGINT) END) AS sig_lo
                    FROM sums GROUP BY doc_id),
              pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                    CAST(bit_count(xor(a.sig_hi, b.sig_hi))
                     + bit_count(xor(a.sig_lo, b.sig_lo)) AS INT) AS hamming
                    FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
         SELECT a_id, b_id, hamming FROM pairs WHERE hamming <= 6""",
    // connected components of the near-dup pair graph: a recursive
    // CTE computes every node's reachable set and labels it with the
    // minimum — the unique fixpoint label propagation converges to
    "dedup_clusters" ->
      """WITH RECURSIVE
              t AS (SELECT doc_id, lang,
                    list_distinct(string_split_regex(trim(lower(trim(text))), '\s+')) AS toks
                    FROM documents),
              p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
                    FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
                    WHERE round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                      / len(list_distinct(list_concat(a.toks, b.toks))), 4) >= 0.9),
              e AS (SELECT a_id AS src, b_id AS dst FROM p
                    UNION SELECT b_id, a_id FROM p),
              walk(id, lbl) AS (
                    SELECT src, src FROM e
                    UNION
                    SELECT e.src, w.lbl FROM e JOIN walk w ON e.dst = w.id)
         SELECT id AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY id""",
    // deterministic corpus shuffle: shard = first md5 nibble, pos =
    // hash rank within shard (Spark computes the nibble via conv,
    // DuckDB via strpos — same value)
    "t_shard_shuffle" ->
      """WITH h AS (SELECT doc_id,
                    md5(concat(doc_id, ':s42')) AS hx
                    FROM documents)
         SELECT doc_id,
           CAST(position(substr(hx, 1, 1) IN '0123456789abcdef') - 1 AS BIGINT) AS shard,
           row_number() OVER (PARTITION BY substr(hx, 1, 1)
                              ORDER BY hx, doc_id) AS pos
         FROM h""",
    "t_pack_chunks" ->
      """WITH h AS (SELECT doc_id,
                    md5(concat(doc_id, ':s42')) AS hx,
                    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
                    FROM documents),
              s AS (SELECT doc_id, hx, n_tokens,
                    CAST(position(substr(hx, 1, 1) IN '0123456789abcdef') - 1 AS BIGINT) AS shard
                    FROM h),
              c AS (SELECT doc_id, shard, n_tokens,
                    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY hx, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
                    FROM s)
         SELECT doc_id, shard, n_tokens,
           CAST(floor(cum_before / 256.0) AS BIGINT) AS chunk_first,
           CAST(floor((cum_before + n_tokens - 1) / 256.0) AS BIGINT) AS chunk_last
         FROM c""",
    // decontamination: count per training doc of its distinct word
    // 5-grams that appear anywhere in the benchmark slice
    // (doc_id % 97 = 0); Spark joins on xxhash64(gram), the oracle
    // on the gram string — equal counts up to 64-bit collisions
    "t_decontaminate" ->
      """WITH toks AS (SELECT doc_id,
                    string_split_regex(lower(trim(text)), '\s+') AS w
                    FROM documents),
              grams AS (SELECT DISTINCT doc_id,
                      array_to_string(array_slice(w, g, g + 4), ' ') AS gram
                    FROM (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS g
                          FROM toks)),
              bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
              hits AS (SELECT g.doc_id, count(*) AS n_hit_grams
                    FROM grams g JOIN bench USING (gram)
                    WHERE g.doc_id % 97 <> 0 GROUP BY g.doc_id)
         SELECT d.doc_id, CAST(coalesce(h.n_hit_grams, 0) AS BIGINT) AS n_hit_grams
         FROM documents d LEFT JOIN hits h USING (doc_id)
         WHERE d.doc_id % 97 <> 0""",
    // the Bloom sketch is the checked artifact: the oracle rebuilds
    // the filter's set-bit positions from the same md5 double-hash
    // arithmetic, so engine and oracle agree on every false positive
    "t_decontaminate_bloom" -> TextQueries.decontaminateBloomOracleSql,
    "t_repetition" ->
      """WITH toks AS (SELECT doc_id,
                    string_split_regex(lower(trim(text)), '\s+') AS w
                    FROM documents),
              base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
                    CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq FROM toks),
              bi AS (SELECT doc_id, concat(list_extract(w, g), ' ',
                      list_extract(w, g + 1)) AS gram
                    FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS g
                          FROM toks)),
              cnt AS (SELECT doc_id, gram, count(*) AS c FROM bi GROUP BY 1, 2),
              top AS (SELECT doc_id, max(c) AS top_c FROM cnt GROUP BY 1)
         SELECT b.doc_id, b.n_tokens,
           round(CAST(b.n_uniq AS DOUBLE) / b.n_tokens, 4) AS uniq_token_frac,
           round(CAST(coalesce(t.top_c, 0) AS DOUBLE)
             / greatest(b.n_tokens - 1, 1), 4) AS top_bigram_frac
         FROM base b LEFT JOIN top t USING (doc_id)""",
    // cross-doc exact-substring spans: a position is duplicated when
    // its 8-token window occurs >1 time in the corpus; overlapping/
    // adjacent duplicated windows merge per doc (gaps-and-islands).
    // Spark counts xxhash64(gram), the oracle the gram string —
    // equal counts up to 64-bit collisions (t_decontaminate's deal)
    "t_substring_spans" ->
      """WITH toks AS (SELECT doc_id,
                    string_split_regex(lower(trim(text)), '\s+') AS w
                    FROM documents),
              grams AS (SELECT doc_id, g - 1 AS pos,
                    array_to_string(array_slice(w, g, g + 7), ' ') AS gram
                    FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS g
                          FROM toks)),
              occ AS (SELECT doc_id, pos,
                    count(*) OVER (PARTITION BY gram) AS occ FROM grams),
              dup AS (SELECT doc_id, pos FROM occ WHERE occ > 1),
              isl AS (SELECT doc_id, pos,
                    CASE WHEN max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                         OR pos > max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
                    THEN 1 ELSE 0 END AS new_span FROM dup),
              grp AS (SELECT doc_id, pos, sum(new_span) OVER (PARTITION BY doc_id
                    ORDER BY pos) AS island FROM isl)
         SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 7 AS BIGINT) AS span_end,
           CAST(max(pos) + 7 - min(pos) + 1 AS BIGINT) AS span_tokens
         FROM grp GROUP BY doc_id, island""",
    // tf-idf with the un-logged (N+1)/(df+1) idf: the score is one
    // IEEE division, bit-identical across engines (ln's last-ulp
    // libm differences could flip a rounded 4th decimal)
    "t_tfidf" ->
      """WITH toks AS (SELECT doc_id,
                    string_split_regex(lower(trim(text)), '\s+') AS w
                    FROM documents),
              terms AS (SELECT doc_id, unnest(w) AS term FROM toks),
              tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
              dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
              n AS (SELECT count(*) AS n FROM documents),
              scored AS (SELECT doc_id, term, tf, df,
                    CAST(tf AS DOUBLE) * (n + 1.0) / (df + 1) AS score
                    FROM tf JOIN dfreq USING (term), n),
              ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, term) AS rk FROM scored)
         SELECT doc_id, term, tf, df, round(score, 4) AS tfidf, rk
         FROM ranked WHERE rk <= 3""",
    // BM25 with un-logged idf and integer-micro per-term scores:
    // every arithmetic step is IEEE +,*,/ in the same parse order as
    // the Spark side, and the per-term rounding to micros makes the
    // doc score an order-independent long sum
    "t_bm25_topk" ->
      """WITH toks AS (SELECT doc_id,
                    string_split_regex(lower(trim(text)), '\s+') AS w
                    FROM documents),
              tf AS (SELECT doc_id, len(w) AS dl,
                    len(list_filter(w, x -> x = 'dup')) AS tf_0,
                    len(list_filter(w, x -> x = 'vector')) AS tf_1,
                    len(list_filter(w, x -> x = 'stream')) AS tf_2 FROM toks),
              st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
                    sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS df_0,
                    sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS df_1,
                    sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS df_2 FROM tf),
              sc AS (SELECT doc_id,
                    (CASE WHEN tf_0 > 0 THEN CAST(round(CAST(n_docs - df_0 + 0.5 AS DOUBLE) / (df_0 + 0.5)
                      * (tf_0 * 2.2) / (tf_0 + 1.2 * (1.0 - 0.75 + 0.75 * dl
                      / (CAST(sum_dl AS DOUBLE) / n_docs))) * 1000000.0) AS BIGINT) ELSE 0 END)
                    + (CASE WHEN tf_1 > 0 THEN CAST(round(CAST(n_docs - df_1 + 0.5 AS DOUBLE) / (df_1 + 0.5)
                      * (tf_1 * 2.2) / (tf_1 + 1.2 * (1.0 - 0.75 + 0.75 * dl
                      / (CAST(sum_dl AS DOUBLE) / n_docs))) * 1000000.0) AS BIGINT) ELSE 0 END)
                    + (CASE WHEN tf_2 > 0 THEN CAST(round(CAST(n_docs - df_2 + 0.5 AS DOUBLE) / (df_2 + 0.5)
                      * (tf_2 * 2.2) / (tf_2 + 1.2 * (1.0 - 0.75 + 0.75 * dl
                      / (CAST(sum_dl AS DOUBLE) / n_docs))) * 1000000.0) AS BIGINT) ELSE 0 END)
                    AS bm25_micro
                    FROM tf, st WHERE tf_0 + tf_1 + tf_2 > 0),
              r AS (SELECT doc_id, bm25_micro,
                    row_number() OVER (ORDER BY bm25_micro DESC, doc_id) AS rank FROM sc)
         SELECT doc_id, rank, bm25_micro FROM r WHERE rank <= 10""",
    // reciprocal-rank fusion of the BM25 arm and a dense-cosine arm
    // (query = embedding 0); contributions are round(1e6/(60+rank))
    // longs, so the fused score is an exact integer sum
    "t_hybrid_rrf" ->
      """WITH toks AS (SELECT doc_id,
                    string_split_regex(lower(trim(text)), '\s+') AS w
                    FROM documents),
              tf AS (SELECT doc_id, len(w) AS dl,
                    len(list_filter(w, x -> x = 'dup')) AS tf_0,
                    len(list_filter(w, x -> x = 'vector')) AS tf_1,
                    len(list_filter(w, x -> x = 'stream')) AS tf_2 FROM toks),
              st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
                    sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS df_0,
                    sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS df_1,
                    sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS df_2 FROM tf),
              sc AS (SELECT doc_id,
                    (CASE WHEN tf_0 > 0 THEN CAST(round(CAST(n_docs - df_0 + 0.5 AS DOUBLE) / (df_0 + 0.5)
                      * (tf_0 * 2.2) / (tf_0 + 1.2 * (1.0 - 0.75 + 0.75 * dl
                      / (CAST(sum_dl AS DOUBLE) / n_docs))) * 1000000.0) AS BIGINT) ELSE 0 END)
                    + (CASE WHEN tf_1 > 0 THEN CAST(round(CAST(n_docs - df_1 + 0.5 AS DOUBLE) / (df_1 + 0.5)
                      * (tf_1 * 2.2) / (tf_1 + 1.2 * (1.0 - 0.75 + 0.75 * dl
                      / (CAST(sum_dl AS DOUBLE) / n_docs))) * 1000000.0) AS BIGINT) ELSE 0 END)
                    + (CASE WHEN tf_2 > 0 THEN CAST(round(CAST(n_docs - df_2 + 0.5 AS DOUBLE) / (df_2 + 0.5)
                      * (tf_2 * 2.2) / (tf_2 + 1.2 * (1.0 - 0.75 + 0.75 * dl
                      / (CAST(sum_dl AS DOUBLE) / n_docs))) * 1000000.0) AS BIGINT) ELSE 0 END)
                    AS bm25_micro
                    FROM tf, st WHERE tf_0 + tf_1 + tf_2 > 0),
              s0 AS (SELECT doc_id, row_number() OVER (ORDER BY bm25_micro DESC, doc_id)
                    AS s_rank FROM sc),
              s50 AS (SELECT doc_id, s_rank FROM s0 WHERE s_rank <= 50),
              e AS (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb FROM embeddings),
              q AS (SELECT emb AS qemb FROM e WHERE vec_id = 0),
              c AS (SELECT e.vec_id AS doc_id,
                    round(list_dot_product(q.qemb, e.emb) /
                      (sqrt(list_dot_product(q.qemb, q.qemb)) *
                       sqrt(list_dot_product(e.emb, e.emb))), 4) AS cos
                    FROM e, q WHERE e.vec_id <> 0),
              d0 AS (SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id)
                    AS d_rank FROM c),
              d50 AS (SELECT doc_id, d_rank FROM d0 WHERE d_rank <= 50),
              f AS (SELECT COALESCE(d50.doc_id, s50.doc_id) AS doc_id,
                    d50.d_rank, s50.s_rank,
                    COALESCE(CAST(round(1000000.0 / (60 + d50.d_rank)) AS BIGINT), 0) +
                    COALESCE(CAST(round(1000000.0 / (60 + s50.s_rank)) AS BIGINT), 0)
                    AS rrf_micro
                    FROM d50 FULL JOIN s50 ON d50.doc_id = s50.doc_id),
              r AS (SELECT doc_id, rrf_micro, d_rank, s_rank,
                    row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS rank FROM f)
         SELECT doc_id, rank, rrf_micro, d_rank, s_rank FROM r WHERE rank <= 10""",
    "t_heavy_hitters" ->
      """WITH toks AS (SELECT doc_id,
                    string_split_regex(lower(trim(text)), '\s+') AS w
                    FROM documents),
              terms AS (SELECT unnest(w) AS term FROM toks),
              counts AS (SELECT term, count(*) AS cnt FROM terms GROUP BY 1),
              ranked AS (SELECT term, cnt,
                    row_number() OVER (ORDER BY cnt DESC, term) AS rk
                    FROM counts)
         SELECT term, cnt, rk FROM ranked WHERE rk <= 20""",
    // exact integer counts into ONE left-associative double chain
    // (((cb*nu)/cu1)/cu2*nu)/nb inside one ln, mirrored verbatim in
    // the engine expression — the tLmScore reproducibility argument
    "t_collocations" ->
      """WITH d AS (SELECT doc_id,
                list_filter(string_split_regex(lower(trim(text)), '\s+'),
                  t -> t <> '') AS toks
                FROM documents),
         uni AS (SELECT w, count(*) AS cu
                 FROM (SELECT unnest(toks) AS w FROM d) GROUP BY 1),
         tot AS (SELECT sum(cu) AS nu FROM uni),
         d2 AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) >= 2),
         big0 AS (SELECT list_extract(toks, g) AS w1,
                         list_extract(toks, g + 1) AS w2
                  FROM (SELECT toks, unnest(range(1, n)) AS g FROM d2)),
         nbt AS (SELECT count(*) AS nb FROM big0),
         big AS (SELECT w1, w2, count(*) AS cb FROM big0
                 GROUP BY 1, 2 HAVING count(*) >= 5),
         scored AS (SELECT big.w1, big.w2, cb,
                    round(ln(CAST(cb AS DOUBLE) * nu / u1.cu / u2.cu * nu / nb),
                      4) AS pmi
                    FROM big JOIN uni u1 ON big.w1 = u1.w
                      JOIN uni u2 ON big.w2 = u2.w
                      CROSS JOIN tot CROSS JOIN nbt),
         ranked AS (SELECT w1, w2, cb, pmi,
                    row_number() OVER (ORDER BY pmi DESC, cb DESC, w1, w2) AS rk
                    FROM scored)
         SELECT w1, w2, cb, pmi, rk FROM ranked WHERE rk <= 50""",
    "t_lm_score" ->
      """WITH d AS (SELECT doc_id,
                list_filter(string_split_regex(lower(trim(text)), '\s+'),
                  t -> t <> '') AS toks
                FROM documents),
         d2 AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) >= 2),
         big AS (SELECT doc_id, list_extract(toks, g) AS w1,
                        list_extract(toks, g + 1) AS w2
                 FROM (SELECT doc_id, toks, unnest(range(1, n)) AS g FROM d2)),
         rb AS (SELECT w1, w2, count(*) AS cb FROM big WHERE doc_id % 2 = 0
                GROUP BY 1, 2),
         ru AS (SELECT w, count(*) AS cu
                FROM (SELECT doc_id, unnest(toks) AS w FROM d2)
                WHERE doc_id % 2 = 0 GROUP BY 1),
         v AS (SELECT count(*) AS v FROM ru)
         SELECT big.doc_id, count(*) AS n_bigrams,
           round(sum(-ln((coalesce(cb, 0) + 1.0) / (coalesce(cu, 0) + v.v)))
             / count(*), 4) AS avg_nll,
           round(exp(sum(-ln((coalesce(cb, 0) + 1.0) / (coalesce(cu, 0) + v.v)))
             / count(*)), 2) AS ppl
         FROM big LEFT JOIN rb ON big.w1 = rb.w1 AND big.w2 = rb.w2
           LEFT JOIN ru ON big.w1 = ru.w
           CROSS JOIN v
         GROUP BY big.doc_id""",
    "t_inverted_index" ->
      """WITH toks AS (SELECT doc_id,
                    string_split_regex(lower(trim(text)), '\s+') AS w
                    FROM documents),
              tf AS (SELECT DISTINCT doc_id, unnest(w) AS term FROM toks),
              dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
              capped AS (SELECT term, doc_id, row_number() OVER (PARTITION BY term
                    ORDER BY doc_id) AS rk FROM tf),
              p AS (SELECT term, array_to_string(list_sort(list(doc_id)), ',') AS postings
                    FROM capped WHERE rk <= 100 GROUP BY term)
         SELECT term, df, postings FROM dfreq JOIN p USING (term)""",
    // generated in VectorQueries so it shares the engine's plane
    // constants — the hyperplanes are data-independent, so the whole
    // candidate-generation + re-rank pipeline is SQL-recomputable
    "ann_lsh_topk" -> graft.queries.VectorQueries.annLshOracleSql,
    "ann_brute_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb FROM embeddings),
              q AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 10),
              p AS (SELECT q.qid, e.vec_id AS nid,
                    round(list_dot_product(q.qemb, e.emb) /
                      (sqrt(list_dot_product(q.qemb, q.qemb)) *
                       sqrt(list_dot_product(e.emb, e.emb))), 4) AS sim
                    FROM e CROSS JOIN q WHERE e.vec_id <> q.qid),
              r AS (SELECT qid, nid, sim,
                    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
                    FROM p)
         SELECT qid, rank, nid, sim FROM r WHERE rank <= 5""",
    "emb_decontaminate" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb FROM embeddings),
              b AS (SELECT vec_id AS b_id, emb AS b_emb FROM e WHERE vec_id < 25),
              c AS (SELECT e.vec_id,
                    round(max(list_dot_product(e.emb, b.b_emb) /
                      (sqrt(list_dot_product(e.emb, e.emb)) *
                       sqrt(list_dot_product(b.b_emb, b.b_emb)))), 4) AS max_bench_cos
                    FROM e CROSS JOIN b WHERE e.vec_id >= 25 GROUP BY 1)
         SELECT vec_id, max_bench_cos, max_bench_cos >= 0.4 AS contaminated FROM c""",
    "emb_near_dup" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb FROM embeddings),
              p AS (SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
                    round(list_dot_product(a.emb, b.emb) /
                      (sqrt(list_dot_product(a.emb, a.emb)) *
                       sqrt(list_dot_product(b.emb, b.emb))), 4) AS cos
                    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         SELECT label, a_id, b_id, cos FROM p WHERE cos >= 0.4""",
    // connected components over the (oracle-exact) cosine near-dup
    // graph: same recursive-CTE reachability as dedup_clusters
    "emb_dedup_clusters" ->
      """WITH RECURSIVE
              e0 AS (SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb
                    FROM embeddings),
              p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id
                    FROM e0 a JOIN e0 b ON a.label = b.label AND a.vec_id < b.vec_id
                    WHERE round(list_dot_product(a.emb, b.emb) /
                      (sqrt(list_dot_product(a.emb, a.emb)) *
                       sqrt(list_dot_product(b.emb, b.emb))), 4) >= 0.4),
              e AS (SELECT a_id AS src, b_id AS dst FROM p
                    UNION SELECT b_id, a_id FROM p),
              walk(id, lbl) AS (
                    SELECT src, src FROM e
                    UNION
                    SELECT e.src, w.lbl FROM e JOIN walk w ON e.dst = w.id)
         SELECT id AS vec_id, min(lbl) AS cluster_id FROM walk GROUP BY id""",
    // The LSH scale path is verified against the same exact-pair
    // oracle: at verification scale its measured recall is 1.0
    // (deterministic hyperplanes; VectorQueriesSpec holds the
    // recall-floor assertions for other scales), and precision is
    // exact by construction (every candidate is re-checked with the
    // exact dot product).
    "emb_near_dup_lsh" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb FROM embeddings),
              p AS (SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
                    round(list_dot_product(a.emb, b.emb) /
                      (sqrt(list_dot_product(a.emb, a.emb)) *
                       sqrt(list_dot_product(b.emb, b.emb))), 4) AS cos
                    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         SELECT label, a_id, b_id, cos FROM p WHERE cos >= 0.4""",
    "emb_centroids" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb FROM embeddings),
              u AS (SELECT label, list_extract(emb, gd) AS x, gd AS dim
                    FROM (SELECT label, emb, unnest(range(1, len(emb) + 1)) AS gd FROM e)),
              c AS (SELECT label, dim, sum(x) AS sx, count(*) AS n FROM u GROUP BY label, dim),
              cent AS (SELECT label, CAST(min(n) AS BIGINT) AS n_vectors,
                       list_transform(list_sort(list(list_value(CAST(dim AS DOUBLE), sx/n))),
                         p -> list_extract(p, 2)) AS cvec,
                       round(sqrt(sum((sx/n)*(sx/n))), 4) AS centroid_norm
                       FROM c GROUP BY label),
              d AS (SELECT e.label,
                    list_dot_product(e.emb, cent.cvec) /
                      (sqrt(list_dot_product(e.emb, e.emb)) *
                       sqrt(list_dot_product(cent.cvec, cent.cvec))) AS cos
                    FROM e JOIN cent USING (label))
         SELECT cent.label, cent.n_vectors, cent.centroid_norm,
           round(avg(d.cos), 4) AS avg_cos_to_centroid
         FROM cent JOIN d ON cent.label = d.label
         GROUP BY cent.label, cent.n_vectors, cent.centroid_norm""",
    // integer-micros PageRank: BIGINT floor division end to end, so
    // the iterative ranks are bit-identical across engines (a float
    // PageRank's per-node sums are IEEE order-dependent and could
    // never hash-match)
    "g1_pagerank" ->
      """WITH e AS (
           SELECT DISTINCT x.l_partkey AS src, y.l_partkey AS dst
           FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
           WHERE x.l_partkey <> y.l_partkey),
         d AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
         n AS (SELECT DISTINCT l_partkey AS node FROM lineitem),
         r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
         r1 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c.s, 0) - ((85 * COALESCE(c.s, 0)) % 100)) / 100 AS BIGINT) AS r
           FROM n LEFT JOIN (
             SELECT e.dst AS node, SUM(CAST((r.r - (r.r % d.deg)) / d.deg AS BIGINT)) AS s
             FROM e JOIN d USING (src) JOIN r0 r ON r.node = e.src GROUP BY e.dst) c USING (node)),
         r2 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c.s, 0) - ((85 * COALESCE(c.s, 0)) % 100)) / 100 AS BIGINT) AS r
           FROM n LEFT JOIN (
             SELECT e.dst AS node, SUM(CAST((r.r - (r.r % d.deg)) / d.deg AS BIGINT)) AS s
             FROM e JOIN d USING (src) JOIN r1 r ON r.node = e.src GROUP BY e.dst) c USING (node)),
         r3 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c.s, 0) - ((85 * COALESCE(c.s, 0)) % 100)) / 100 AS BIGINT) AS r
           FROM n LEFT JOIN (
             SELECT e.dst AS node, SUM(CAST((r.r - (r.r % d.deg)) / d.deg AS BIGINT)) AS s
             FROM e JOIN d USING (src) JOIN r2 r ON r.node = e.src GROUP BY e.dst) c USING (node)),
         r4 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c.s, 0) - ((85 * COALESCE(c.s, 0)) % 100)) / 100 AS BIGINT) AS r
           FROM n LEFT JOIN (
             SELECT e.dst AS node, SUM(CAST((r.r - (r.r % d.deg)) / d.deg AS BIGINT)) AS s
             FROM e JOIN d USING (src) JOIN r3 r ON r.node = e.src GROUP BY e.dst) c USING (node)),
         r5 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c.s, 0) - ((85 * COALESCE(c.s, 0)) % 100)) / 100 AS BIGINT) AS r
           FROM n LEFT JOIN (
             SELECT e.dst AS node, SUM(CAST((r.r - (r.r % d.deg)) / d.deg AS BIGINT)) AS s
             FROM e JOIN d USING (src) JOIN r4 r ON r.node = e.src GROUP BY e.dst) c USING (node))
         SELECT node AS part_key, r AS rank_micros FROM r5""",
    // counts stay exact integers until the final confidence/lift
    // divisions — one IEEE division each, rounded (e8_spike pattern)
    "g2_copurchase_lift" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM op),
         item AS (SELECT p, COUNT(*) AS n_item FROM op GROUP BY p),
         pr AS (SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS n_ab
                FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
                GROUP BY 1, 2
                HAVING COUNT(*) >= 2)
         SELECT part_a, part_b, n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
           round(CAST(n_ab AS DOUBLE) * n_orders / (ia.n_item * ib.n_item), 4) AS lift,
           round(CAST(n_ab AS DOUBLE) / ia.n_item, 4) AS confidence
         FROM pr
         JOIN item ia ON pr.part_a = ia.p
         JOIN item ib ON pr.part_b = ib.p
         CROSS JOIN n""",
    // triangle counts are algorithm-independent exact integers: the
    // engine counts via degree-ordered orientation, the oracle via
    // the id-ordered a<b<c 3-way join — same triangles either way
    "g3_triangles" ->
      """WITH pr AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM pr e1 JOIN pr e2 ON e2.a = e1.b
                JOIN pr e3 ON e3.a = e1.a AND e3.b = e2.b),
         m AS (SELECT x AS part_key FROM tri
               UNION ALL SELECT y FROM tri
               UNION ALL SELECT z FROM tri),
         c AS (SELECT part_key, count(*) AS n_triangles FROM m GROUP BY 1),
         allp AS (SELECT DISTINCT l_partkey AS part_key FROM lineitem)
         SELECT allp.part_key, COALESCE(c.n_triangles, 0) AS n_triangles
         FROM allp LEFT JOIN c USING (part_key)""",
    // components over the support-thresholded co-purchase graph:
    // engine clusters via contraction + union-find / label
    // propagation, oracle via recursive reachability — component id
    // (min member) is algorithm-independent
    "g4_components" ->
      """WITH RECURSIVE
         li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         p AS (SELECT a.l_partkey AS a_id, b.l_partkey AS b_id
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS (SELECT a_id AS src, b_id AS dst FROM p
               UNION SELECT b_id, a_id FROM p),
         walk(id, lbl) AS (
               SELECT src, src FROM e
               UNION
               SELECT e.src, w.lbl FROM e JOIN walk w ON e.dst = w.id)
         SELECT id AS part_key, min(lbl) AS component_id FROM walk GROUP BY id""",
    // the incremental maintainer's labeling vs the SAME recursive
    // reachability the batch form answers to: agreement through the
    // independent engine proves N-batch ingest + mid-stream
    // compaction + merge-log resolution ≡ one-shot clustering of the
    // accumulated edge set
    "g5_components_inc" ->
      """WITH RECURSIVE
         li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         p AS (SELECT a.l_partkey AS a_id, b.l_partkey AS b_id
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS (SELECT a_id AS src, b_id AS dst FROM p
               UNION SELECT b_id, a_id FROM p),
         walk(id, lbl) AS (
               SELECT src, src FROM e
               UNION
               SELECT e.src, w.lbl FROM e JOIN walk w ON e.dst = w.id)
         SELECT id AS part_key, min(lbl) AS component_id FROM walk GROUP BY id""",
    // deletion fold + serve-time tombstone filter vs the SAME
    // reachability walk with the deleted classes filtered from the
    // OUTPUT ONLY: survivors keep their component_id (including ids
    // that equal a deleted node — labels are identifiers, and
    // connectivity through a deleted node was folded at ingest), so
    // hash-equality proves the forget path relabels NOTHING it keeps
    "g7_components_del" ->
      """WITH RECURSIVE
         li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         p AS (SELECT a.l_partkey AS a_id, b.l_partkey AS b_id
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS (SELECT a_id AS src, b_id AS dst FROM p
               UNION SELECT b_id, a_id FROM p),
         walk(id, lbl) AS (
               SELECT src, src FROM e
               UNION
               SELECT e.src, w.lbl FROM e JOIN walk w ON e.dst = w.id)
         SELECT id AS part_key, min(lbl) AS component_id FROM walk
         WHERE id % 10 NOT IN (3, 7) GROUP BY id""",
    // BFS distances: engine runs the early-exit frontier loop, oracle
    // re-derives min hop count via a depth-capped recursive walk —
    // exact integers, so the traversal is hash-provable. The cap (20)
    // mirrors the engine's maxHops runaway bound; the walk's longer
    // rediscoveries of a node collapse under min(d).
    "g6_bfs_dists" ->
      """WITH RECURSIVE
         li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         p AS (SELECT a.l_partkey AS a_id, b.l_partkey AS b_id
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS (SELECT a_id AS src, b_id AS dst FROM p
               UNION SELECT b_id, a_id FROM p),
         s AS (SELECT min(a_id) AS root FROM p),
         walk(id, d) AS (
               SELECT root, 0 FROM s
               UNION
               SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.id
               WHERE w.d < 20)
         SELECT id AS part_key, min(d) AS dist FROM walk GROUP BY id""",
    "emb_outliers" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb FROM embeddings),
              u AS (SELECT label, list_extract(emb, gd) AS x, gd AS dim
                    FROM (SELECT label, emb, unnest(range(1, len(emb) + 1)) AS gd FROM e)),
              c AS (SELECT label, dim, sum(x) / count(*) AS cx FROM u GROUP BY label, dim),
              cent AS (SELECT label,
                       list_transform(list_sort(list(list_value(CAST(dim AS DOUBLE), cx))),
                         p -> list_extract(p, 2)) AS cvec
                       FROM c GROUP BY label),
              d AS (SELECT e.vec_id, e.label,
                    round(list_dot_product(e.emb, cent.cvec) /
                      (sqrt(list_dot_product(e.emb, e.emb)) *
                       sqrt(list_dot_product(cent.cvec, cent.cvec))), 4) AS cos_to_centroid
                    FROM e JOIN cent USING (label))
         SELECT vec_id, label, cos_to_centroid,
           cos_to_centroid < 0.0 AS is_outlier FROM d""",
    // the whole lang-id pipeline is integer counts with lexical
    // tiebreaks — deterministic end to end, so the trained-model
    // query is a full oracle row (trigrams via scalar
    // generate_series; profile and argmax via the same
    // (count DESC, key) row_number orders the engine uses)
    "t_lang_id" ->
      """WITH d AS (SELECT doc_id, lang,
           array_to_string(string_split_regex(lower(trim(text)), '\s+'), ' ') AS t FROM documents),
         tri AS (SELECT doc_id, lang, unnest(
             CASE WHEN length(t) < 3 THEN list_value(t)
                  ELSE list_transform(generate_series(1, length(t)-2), i -> substr(t, i, 3)) END) AS g
             FROM d),
         cnt AS (SELECT lang, g, count(*) AS c FROM tri GROUP BY 1, 2),
         prof AS (SELECT lang AS profile_lang, g FROM (
             SELECT lang, g, row_number() OVER (PARTITION BY lang ORDER BY c DESC, g) AS rk
             FROM cnt) z
             WHERE rk <= 40),
         sc AS (SELECT t.doc_id, t.lang, p.profile_lang, count(*) AS hits
             FROM tri t JOIN prof p ON t.g = p.g GROUP BY 1, 2, 3),
         fin AS (SELECT doc_id, lang, profile_lang AS predicted, hits,
             row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, profile_lang) AS rk
             FROM sc)
         SELECT doc_id, lang, predicted, hits FROM fin WHERE rk = 1""",
    "t_heavy_hitters_cms" -> TextQueries.cmsOracleSql(),
    // shingle strings here vs xxhash64 on the engine side — counts
    // equal up to 2^-64 collisions (the t_substring_spans deal)
    "t_source_overlap" ->
      """WITH t AS (SELECT source,
                    string_split_regex(trim(lower(trim(text))), '\s+') AS toks
                    FROM documents),
              s AS (SELECT source, unnest(list_distinct(
                    list_transform(generate_series(1, len(toks) - 2),
                      i -> list_extract(toks, i) || ' ' || list_extract(toks, i+1) || ' ' || list_extract(toks, i+2)))) AS h
                    FROM t WHERE len(toks) >= 3),
              ss AS (SELECT DISTINCT source, h FROM s),
              sz AS (SELECT source, count(*) AS n FROM ss GROUP BY 1),
              p AS (SELECT a.source AS source_a, b.source AS source_b,
                    count(*) AS n_common
                    FROM ss a JOIN ss b ON a.h = b.h AND a.source < b.source
                    GROUP BY 1, 2)
         SELECT source_a, source_b, za.n AS n_a, zb.n AS n_b, n_common,
           round(CAST(n_common AS DOUBLE) / za.n, 4) AS containment_a,
           round(CAST(n_common AS DOUBLE) / zb.n, 4) AS containment_b,
           round(CAST(n_common AS DOUBLE) / (za.n + zb.n - n_common), 4) AS jaccard
         FROM p JOIN sz za ON p.source_a = za.source
                JOIN sz zb ON p.source_b = zb.source""",
    // generated from the engine's own srcMinhashAbs constant table —
    // md5-low-32 shingle hashes + 32 affine min recurrences are exact
    // BIGINT arithmetic in both engines, so the sketch itself (not a
    // ground-truth proxy) is recomputed bit-identically
    "t_source_overlap_minhash" -> TextQueries.srcOverlapMinhashOracleSql,
    "t_source_overlap_lsh" -> TextQueries.srcOverlapLshOracleSql,
    // the composed final pass: every ingredient is the same recompute
    // as its own oracle row (t_quality_gate / dedup_exact /
    // emb_outliers), fused into one decision table
    "t_curation_e2e" ->
      """WITH q AS (SELECT doc_id,
                CAST(len(toks) AS BIGINT) AS n_tokens,
                round(CAST(len(list_filter(toks,
                  t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS DOUBLE)
                  / len(toks), 4) AS stopword_ratio
                FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
                      FROM documents)),
         tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
                FROM documents),
         base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS nt,
                CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq FROM tk),
         bi AS (SELECT doc_id, concat(list_extract(w, g), ' ', list_extract(w, g + 1)) AS gram
                FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS g FROM tk)),
         cnt AS (SELECT doc_id, gram, count(*) AS c FROM bi GROUP BY 1, 2),
         top AS (SELECT doc_id, max(c) AS top_c FROM cnt GROUP BY 1),
         r AS (SELECT b.doc_id,
                round(CAST(b.n_uniq AS DOUBLE) / b.nt, 4) AS uniq_token_frac,
                round(CAST(coalesce(t.top_c, 0) AS DOUBLE)
                  / greatest(b.nt - 1, 1), 4) AS top_bigram_frac
                FROM base b LEFT JOIN top t USING (doc_id)),
         g AS (SELECT doc_id,
                (n_tokens >= 20 AND stopword_ratio >= 0.02
                 AND uniq_token_frac >= 0.3 AND top_bigram_frac <= 0.1) AS quality_ok
                FROM q JOIN r USING (doc_id)),
         dup AS (SELECT doc_id,
                min(doc_id) OVER (PARTITION BY
                  md5(array_to_string(string_split_regex(lower(trim(text)), '\s+'), ' '))) <> doc_id AS is_dup
                FROM documents),
         e AS (SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb FROM embeddings),
         u AS (SELECT label, list_extract(emb, gd) AS x, gd AS dim
               FROM (SELECT label, emb, unnest(range(1, len(emb) + 1)) AS gd FROM e)),
         c AS (SELECT label, dim, sum(x) / count(*) AS cx FROM u GROUP BY label, dim),
         cent AS (SELECT label,
                list_transform(list_sort(list(list_value(CAST(dim AS DOUBLE), cx))),
                  p -> list_extract(p, 2)) AS cvec
                FROM c GROUP BY label),
         o AS (SELECT e.vec_id AS doc_id,
                round(list_dot_product(e.emb, cent.cvec) /
                  (sqrt(list_dot_product(e.emb, e.emb)) *
                   sqrt(list_dot_product(cent.cvec, cent.cvec))), 4) < 0.0 AS is_outlier
                FROM e JOIN cent USING (label))
         SELECT g.doc_id, g.quality_ok, dup.is_dup,
           coalesce(o.is_outlier, false) AS is_outlier,
           (g.quality_ok AND NOT dup.is_dup
            AND NOT coalesce(o.is_outlier, false)) AS kept
         FROM g JOIN dup USING (doc_id) LEFT JOIN o USING (doc_id)""",
    "emb_hard_negatives" ->
      """WITH e0 AS (SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb
                    FROM embeddings),
              nn AS (SELECT vec_id, label, emb,
                    sqrt(list_dot_product(emb, emb)) AS nrm FROM e0),
              e AS (SELECT vec_id, label,
                    list_transform(emb, x -> x / nrm) AS emb
                    FROM nn WHERE nrm > 0),
              a AS (SELECT vec_id AS anchor_id, label AS a_label, emb AS a_emb
                    FROM e WHERE vec_id < 10),
              p AS (SELECT a.anchor_id,
                    CASE WHEN e.label = a.a_label THEN 'positive'
                         ELSE 'hard_negative' END AS role,
                    e.vec_id AS nid,
                    round(list_dot_product(a.a_emb, e.emb), 4) AS sim
                    FROM e CROSS JOIN a WHERE e.vec_id <> a.anchor_id),
              r AS (SELECT anchor_id, role, nid, sim,
                    row_number() OVER (PARTITION BY anchor_id, role
                      ORDER BY sim DESC, nid) AS rank FROM p)
         SELECT anchor_id, role, rank, nid, sim FROM r WHERE rank <= 3""",
    // rendered from the trained weights — present only when the
    // classifier query has run in this JVM (Verify's evaluation
    // order guarantees that); otherwise the driver keeps the old
    // rows-only check
  ) ++ TextQueries.classifierOracleSql.map("t_quality_classifier" -> _) ++
    TextQueries.bpeOracleSql.map("t_bpe_tokens" -> _) ++
    graft.queries.VectorQueries.kmeansOracleSql.map("emb_kmeans" -> _) ++
    graft.queries.VectorQueries.semDedupOracleSql.map("emb_semdedup" -> _) ++
    graft.queries.VectorQueries.ivfOracleSql.map("ann_ivf_topk" -> _) ++
    graft.queries.VectorQueries.pqOracleSql.map("ann_pq_topk" -> _) ++
    graft.queries.VectorIndex.storedIvfOracleSql.map("ann_ivf_stored" -> _) ++
    graft.queries.VectorIndex.storedPqOracleSql.map("ann_pq_stored" -> _) ++
    graft.queries.VectorIndex.storedIvfPqOracleSql.map("ann_ivfpq_stored" -> _) ++
    graft.queries.VectorIndex.stalenessOracleSql.map("ann_ivf_staleness" -> _) ++
    graft.queries.VectorIndex.graphOracleSql.map("ann_graph_topk" -> _) ++
    graft.queries.VectorIndex.graphBatchOracleSql.map("ann_graph_batch" -> _) ++
    graft.queries.VectorIndex.storedIvfDelOracleSql.map("ann_ivf_del" -> _) ++
    graft.queries.VectorIndex.graphDelOracleSql.map("ann_graph_del" -> _)
}
