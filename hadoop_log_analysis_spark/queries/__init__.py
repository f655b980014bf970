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
    "scalar_fns",
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

# Fine-grained front-of-queue, round 3 (VERDICT.md r2 "Next round" #1):
# the 62 queries with NO driver CORRECTNESS row in r1 or r2, plus the 6
# operators ADDED in r3 (also never driver-seen), come first — 68 names
# — so every registry query has driver evidence across r1-r3. Order
# within the tier: q_stream_checkpoint_recovery leads (VERDICT #6 — it
# missed r2's cut at position 51), then the analytics report layer
# (highest user impact per VERDICT "What's missing" #1), llm_ops depth,
# pipeline_q, advanced, scale_q; the tail holds the queries whose
# operator family already has green rows via a sibling (setops
# variants, q_hash_engine_specific) so a fixed 50-query budget
# sacrifices the least evidence. The 100 already-green queries follow
# in module order (their r1/r2 rows + tests/test_oracle_parity.py
# stand as evidence).
_PRIORITY = (
    # T7 streaming restart-recovery — the one streaming query never
    # checked; ~15 s, budgeted first deliberately.
    "q_stream_checkpoint_recovery",
    # analytics_q — the report layer (cohort retention, funnels,
    # transitions, anomalies, Pareto, segments)
    "q_cohort_retention",
    "q_funnel_steps",
    "q_event_transitions",
    "q_hourly_anomaly",
    "q_pareto_users",
    "q_user_segments",
    "q_rolling_active_users",
    "q_week_over_week",
    "q_argmax_users",
    "q_dormant_users",
    "q_late_orders_by_priority",
    "q_large_orders",
    "q_hierarchical_rollup",
    "q_top_tokens_per_lang",
    "q_orders_per_customer_dist",
    "q_value_by_daypart",
    "q_median_event_gap",
    # llm_ops depth tier
    "q_levenshtein_near_dups",
    "q_dedup_exact_groups",
    "q_tfidf",
    "q_bigrams",
    "q_token_stats",
    "q_lang_id_scores",
    "q_doc_fingerprint",
    "q_cross_source_overlap",
    "q_dup_cluster_sizes",
    "q_embedding_norms",
    "q_kmeans_ivf",
    # pipeline_q — training-data pipeline depth
    "q_doc_chunks",
    "q_pack_sequences",
    "q_inverted_index",
    "q_embedding_quantize",
    "q_subword_tokens",
    "q_pii_redaction",
    "q_source_mixture",
    "q_temperature_mixture",
    "q_stratified_sample",
    "q_merge_upsert",
    "q_shipping_priority",
    # r3 curation additions — brand-new operators, never driver-seen
    "q_domain_cap",
    "q_boilerplate_removal",
    "q_token_budget_fill",
    "q_index_lookup",
    "q_stream_static_join",
    "q_stream_stream_left_join",
    # advanced SQL surface
    "q_pivot_event_day",
    "q_unpivot_status_metrics",
    "q_grouping_sets",
    "q_scalar_subquery",
    "q_above_customer_avg",
    "q_gapfill_hours",
    "q_percentile_by_type",
    "q_array_argmax",
    "q_monthly_above_avg_cte",
    "q_doc_length_histogram",
    "q_time_range_window",
    "q_deterministic_sample",
    # scale_q — skew/bucketing patterns
    "q_salted_agg",
    "q_salted_join",
    "q_bucketed_join",
    "q_skew_report",
    "q_observed_metrics",
    # scalar tail
    "q_variant_extract",
    # lowest-marginal-evidence tail: operator families already green
    # via a sibling (O3 q_union_all, O4 q_intersect, O5
    # q_distinct_pairs) or engine-specific rows-only
    "q_union_by_name",
    "q_except",
    "q_dedup_keep_latest",
    "q_hash_engine_specific",
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
