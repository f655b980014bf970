"""Declared, verifiable query surface (SURVEY.md §2).

Every operator the engine claims is registered here as a
``QuerySpec``: a DataFrame-building callable ``(spark, sf_dir) ->
DataFrame`` plus, where SQL-expressible, a DuckDB oracle SQL string
computing the same result over the same parquet fixtures. The driver
hash-compares the two at sf0.01 (__spark_entry__.py docstring).

Discipline shared by every query (FIXTURES.md "oracle-comparison
rules"):

* alias every computed column identically on both sides;
* deterministic tie-breaks on every ORDER BY / LIMIT / window order;
* round floating aggregates identically on both sides (double sums
  are order-sensitive at the 1e-12 level; round(., 2) for sums,
  round(., 4+) for avgs/ratios);
* never emit raw ``events.ts`` — emit date_trunc buckets or integer
  ``ts_ns`` nanos (DuckDB: ``epoch_ns(ts)``).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)

    @property
    def doc(self) -> str:
        return (self.fn.__doc__ or "").strip()


REGISTRY: dict[str, QuerySpec] = {}

# Submodules that register queries on import. Round-1 driver coverage
# ended after the first 50 registry entries (CORRECTNESS_r01.json /
# VERDICT.md "Next round" #1), so registration order is
# verification-priority order: modules whose queries have never
# received a driver CORRECTNESS row come first; the 50 already-green
# sources/relational/joins/aggregates/windows entries come last (their
# r1 rows + tests/test_oracle_parity.py stand as evidence).
_MODULES = (
    "curation_q",
    "governance_q",
    "modern_sql_q",
    "scalar_fns",
    "graph_q",
    "llm_ops",
    "pipeline_q",
    "udfs",
    "streaming_q",
    "scale_q",
    "setops",
    "advanced",
    "analytics_q",
    "sources_q",
    "relational",
    "joins_q",
    "aggregates",
    "windows_q",
)

# ROUND-7 ROTATION (VERDICT r6 "Next round" #1): the driver verifies
# the FIRST 50 names per round. After r6, 88 registry queries had
# never been driver-sampled (registry positions 51-138 plus the two
# late-landing q_logistic_irls / q_feature_hashing). Positions 1-49
# below are the first 49 of that block; position 50 is
# q_embedding_covariance, re-promoted after the exact-integer Gram
# fix (its r5+r6 driver hash FAILs are the only red rows — it must
# re-earn a green row this round). Positions 51-89 are the
# remaining 39 never-sampled names (they lead round 8, incl. the
# exact-integer-hardened q_logistic_irls). Everything after has
# green driver rows (latest status r1-r6); order is
# re-confirmation priority only.
_PRIORITY = (
    "q_event_debounce",
    "q_session_bounce_rate",
    "q_gdpr_erasure",
    "q_mixture_solver",
    "q_join_size_estimate",
    "q_compression_ratio_filter",
    "q_market_share",
    "q_small_qty_revenue",
    "q_hhi_concentration",
    "q_theil_sen_trend",
    "q_negative_sampling",
    "q_t_closeness",
    "q_adamic_adar",
    "q_eval_contamination",
    "q_kaplan_meier",
    "q_sole_late_supplier",
    "q_shard_rebalance",
    "q_mixture_apply",
    "q_bh_fdr",
    "q_mann_whitney",
    "q_cohens_kappa",
    "q_weighted_median",
    "q_compaction_plan",
    "q_quantile_bridge",
    "q_nation_trade_volume",
    "q_returned_revenue",
    "q_image_ahash_dedup",
    "q_percentile_ranks",
    "q_decayed_score",
    "q_stratified_fixed_k",
    "q_script_mix",
    "q_feature_backfill",
    "q_degree_powerlaw",
    "q_funnel_latency",
    "q_ohlc_hourly",
    "q_churn_training_set",
    "q_stream_ohlc",
    "q_budget_apportionment",
    "q_slo_burn_rate",
    "q_hits_scores",
    "q_session_path_topk",
    "q_linear_attribution",
    "q_anova_doclen",
    "q_referential_integrity",
    "q_id_gap_report",
    "q_xmr_control_chart",
    "q_empirical_bayes_rate",
    "q_simpson_check",
    "q_graph_assortativity",
    "q_embedding_covariance",
    # --- round-8 promotion block (39 never-sampled names) ---
    "q_mahalanobis_outliers",
    "q_peak_detection",
    "q_lag_feature_matrix",
    "q_loo_target_encoding",
    "q_ab_power_calc",
    "q_two_core",
    "q_data_freshness",
    "q_partition_digest",
    "q_cell_residuals",
    "q_column_stats",
    "q_item_cf_topk",
    "q_rec_eval",
    "q_churn_rule_eval",
    "q_aging_report",
    "q_retry_storms",
    "q_price_volume_mix",
    "q_logrank_test",
    "q_silhouette_simplified",
    "q_effective_sample_size",
    "q_token_burstiness",
    "q_ratio_delta_method",
    "q_neyman_allocation",
    "q_spearman_corr",
    "q_two_proportion_ztest",
    "q_wasserstein_drift",
    "q_calibration_bins",
    "q_brier_score",
    "q_max_drawdown",
    "q_bollinger_breakouts",
    "q_holt_linear_forecast",
    "q_clustering_coefficient",
    "q_auc_roc",
    "q_precision_recall_curve",
    "q_kendall_tau",
    "q_rake_keywords",
    "q_sql_group_by_all",
    "q_log_loss",
    "q_logistic_irls",
    "q_feature_hashing",
    # --- driver-green re-confirmation tail ---
    "q_intersect_all",
    "q_bpe_fertility",
    "q_tokenizer_coverage",
    "q_token_zipf_fit",
    "q_lexical_richness",
    "q_source_vocab_jaccard",
    "q_corpus_datasheet",
    "q_seasonal_naive_error",
    "q_cms_frequency",
    "q_dpo_pairs",
    "q_curriculum_phases",
    "q_canonical_dedup",
    "q_crossdoc_ngram_coverage",
    "q_quantile_sketch_merge",
    "q_rouge2_eval",
    "q_event_sequence_match",
    "q_label_propagation",
    "q_schema_evolution_read",
    "q_stream_sequence_match",
    "q_scd2_point_in_time",
    "q_interval_union_time",
    "q_value_histogram_log2",
    "q_top_supplier_revenue",
    "q_important_parts_share",
    "q_rich_inactive_segments",
    "q_dynamic_partition_pruning",
    "q_char_entropy_filter",
    "q_vocab_growth_heaps",
    "q_mrr_eval",
    "q_l_diversity",
    "q_dedup_rate_by_source",
    "q_wap_audit_publish",
    "q_rfm_segmentation",
    "q_chi2_independence",
    "q_benford_check",
    "q_prefix_dup_report",
    "q_null_skew_join_split",
    "q_ann_recall_curve",
    "q_gini_spend",
    "q_snapshot_diff",
    "q_sparse_cosine_pairs",
    "q_seasonality_heatmap",
    "q_first_touch_attribution",
    "q_lang_id_confusion",
    "q_dedup_survivor_bias",
    "q_audience_overlap",
    "q_lorenz_curve",
    "q_fano_burstiness",
    "q_time_weighted_avg",
    "q_event_trigrams",
    "q_equidepth_histogram",
    "q_train_val_test_split",
    "q_metric_correlation",
    "q_sql_pipe_syntax",
    "q_sql_udf_quality",
    "q_sql_table_function",
    "q_collated_filter",
    "q_bloom_prefilter_join",
    "q_acf_daily",
    "q_max_concurrency_daily",
    "q_skyline_parts",
    "q_triangle_count",
    "q_bfs_hops",
    "q_basket_lift",
    "q_data_quality_report",
    "q_parameterized_sql",
    "q_approx_top_k",
    "q_scd2_build",
    "q_binaryfile_ingest",
    "q_bitmap_distinct_daily",
    "q_bitmap_rollup_monthly",
    "q_udtf_polymorphic",
    "q_map_in_arrow",
    "q_stream_cdc_apply",
    "q_rrf_fusion",
    "q_ndcg_eval",
    "q_last_touch_attribution",
    "q_stl_decompose",
    "q_bpe_train",
    "q_js_divergence",
    "q_ks_drift",
    "q_psi_drift",
    "q_k_anonymity",
    "q_hard_negatives",
    "q_bpe_encode",
    "q_stream_psi_monitor",
    "q_source_diversity",
    "q_rocchio_feedback",
    "q_mmr_rerank",
    "q_bootstrap_ci",
    "q_distinctive_terms",
    "q_pca_components",
    "q_quality_gate_gains",
    "q_golden_record",
    "q_ab_test_report",
    "q_except_all",
    "q_asof_tolerance",
    "q_locf_fill",
    "q_inverted_index",
    "q_inverted_index_chunked",
    "q_bigram_lm_score",
    "q_knn_classify",
    "q_longest_streak",
    "q_heavy_hitters",
    "q_incremental_rollup",
    "q_weighted_sample",
    "q_winsorized_stats",
    "q_stream_heavy_hitters",
    "q_recursive_hierarchy",
    "q_null_safe_join",
    "q_asof_forward",
    "q_token_entropy",
    "q_set_similarity_join",
    "q_chunk_dedup",
    "q_pagerank_tokens",
    "q_ewma_daily",
    "q_cusum_shift",
    "q_mad_outliers",
    "q_regression_trend",
    "q_zorder_layout",
    "q_containment_join",
    "q_time_to_convert",
    "q_pmi_collocations",
    "q_sorted_neighborhood_dedup",
    "q_mutual_info_lang_source",
    "q_audio_features",
    "q_python_datasource",
    "q_stream_python_datasource",
    "q_incremental_join_maintenance",
    "q_sql_script_threshold",
    "q_above_customer_avg",
    "q_gapfill_hours",
    "q_percentile_by_type",
    "q_array_argmax",
    "q_monthly_above_avg_cte",
    "q_doc_length_histogram",
    "q_time_range_window",
    "q_deterministic_sample",
    "q_salted_agg",
    "q_salted_join",
    "q_bucketed_join",
    "q_skew_report",
    "q_observed_metrics",
    "q_variant_extract",
    "q_union_by_name",
    "q_except",
    "q_dedup_keep_latest",
    "q_hash_engine_specific",
    "q_multimodal_frames",
    "q_multimodal_features",
    "q_boilerplate_removal",
    "q_asof_join",
    "q_asof_by_user",
    "q_embedding_near_dups",
    "q_semantic_dedup",
    "q_dedup_clusters",
    "q_kmeans_ivf",
    "q_minhash_near_dups",
    "q_ngram_jaccard_pairs",
    "q_cosine_knn",
    "q_label_centroids",
    "q_index_lookup",
    "q_domain_cap",
    "q_token_budget_fill",
    "q_tfidf",
    "q_bm25",
    "q_pack_sequences",
    "q_doc_chunks",
    "q_stream_checkpoint_recovery",
    "q_stream_stream_left_join",
    "q_hourly_errors",
    "q_join5",
    "q_sessionize",
    "q_topk_users",
    "q_grouping_sets",
    "q_cohort_retention",
    "q_funnel_steps",
    "q_pareto_users",
    "q_user_segments",
    "q_gopher_rules",
    "q_pii_redaction",
)


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query (and optional DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules; return the registry in verification-
    priority order (_PRIORITY first, then module registration order)."""
    for mod in _MODULES:
        importlib.import_module(f"hadoop_log_analysis_spark.queries.{mod}")
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"_PRIORITY names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in _PRIORITY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
