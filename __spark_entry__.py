"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()``
returns every implemented operator query (SURVEY.md §2 / §2.9);
``oracle_sql()`` returns the DuckDB-equivalent SQL for each (omitted
only for genuinely non-SQL-expressible ops, which get a rows-only
check).

Implementation lives in ``boat_etl_pyspark_spark``; this module is a
thin registry.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from boat_etl_pyspark_spark.plans import collect_registries
from boat_etl_pyspark_spark.plans import (
    analytics,
    boat_plan,
    curation,
    curation2,
    io_plans,
    multimodal_plans,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    relational7,
    relational8,
    relational9,
    relational10,
    relational11,
    relational12,
    relational13,
    relational14,
    relational15,
    relational16,
    relational17,
    relational18,
    curation3,
    textlm,
    io_plans2,
    mlprep,
    sessionize,
    similarity,
    streaming_plans,
    textcuration,
    textdedup,
    textstats2,
)
from boat_etl_pyspark_spark.session import tune

_PLAN_MODULES = (
    boat_plan,
    analytics,
    curation,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    textdedup,
    similarity,
    streaming_plans,
    multimodal_plans,
    sessionize,
    io_plans,
    relational6,
    relational7,
    relational8,
    relational9,
    curation2,
    textcuration,
    relational10,
    textstats2,
    mlprep,
    io_plans2,
    relational11,
    relational12,
    relational13,
    relational14,
    textlm,
    relational15,
    relational16,
    relational17,
    relational18,
    curation3,
)

_QUERIES, _ORACLE = collect_registries(*_PLAN_MODULES)

# The driver's correctness gate checks the FIRST 50 registry entries in
# order. After round 3 every one of the 140 round-3 queries has a green
# driver row (r01: 50, r02: 49 more, r03: the final 41 + 9 re-confirms).
# Round 4 front-loads the 47 NEW queries (never driver-checked), then
# the stalest greens: the 8 streaming queries whose last row (r02)
# predates the events-fixture regeneration, the exact-median query
# whose plan was rewritten single-pass after the r03 bank — the
# stream-family re-confirms shrink to 2 to fit (47 + 2 + 1 = 50; the
# remaining stale greens rotate in next round).
_CHECK_FIRST = (
    # --- new in round 4, never driver-checked (47) ---
    "text_entropy_per_source",
    "join_asof_nearest",
    "curate_corpus_pipeline_report",
    "graph_recursive_route_cost",
    "graph_bfs_reachability",
    "agg_welch_ttest",
    "window_rolling_regression",
    "agg_chi2_independence",
    "agg_gini_concentration",
    "text_zipf_fit",
    "events_rate_spike_zscore",
    "agg_linear_regression",
    "agg_benford_profile",
    "window_ewma_spend",
    "events_ab_test_lift",
    "embed_pca_power",
    "text_unigram_surprisal",
    "text_readability",
    "text_boilerplate_strip",
    "curate_importance_weights",
    "join_hybrid_skew_split",
    "curate_quality_filter_cascade",
    "agg_histogram_quantile_merge",
    "join_point_in_time",
    "text_source_divergence",
    "curate_dataset_cards",
    "ts_ohlc_bars",
    "graph_hierarchy_rollup",
    "events_pattern_vshape",
    "io_corrupt_record_quarantine",
    "anomaly_mad_outliers",
    "ts_weekday_seasonality",
    "validate_data_contract",
    "graph_triangle_count",
    "join_interval_overlap",
    "text_bigram_rarity",
    "text_bpe_pair_stats",
    "curate_mixture_weights",
    "embed_kmeans_lloyd",
    "embed_gram_matrix",
    "io_orc_roundtrip",
    "io_small_file_compaction",
    "io_snapshot_diff",
    "join_spatial_grid",
    "window_running_distinct",
    "stream_stream_left_outer",
    "sim_product_quantize",
    # --- streaming greens from r02 predating the events-fixture change (8) ---
    "stream_tumbling_6h",
    "stream_sliding_6h_3h",
    # --- plan rewritten after the r03 bank (1) ---
    "agg_exact_median_distributed",
)


def _ordered(queries: dict) -> dict:
    missing = [n for n in _CHECK_FIRST if n not in queries]
    if missing:
        raise ValueError(f"_CHECK_FIRST names not in registry: {missing}")
    rest = [n for n in queries if n not in set(_CHECK_FIRST)]
    return {n: queries[n] for n in (*_CHECK_FIRST, *rest)}


_QUERIES = _ordered(_QUERIES)


def _tuned(fn: Callable[[SparkSession, str], DataFrame]):
    @functools.wraps(fn)
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(tune(spark), sf_dir)

    return wrapper


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _tuned(relational.q3_shipping_priority)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _tuned(fn) for name, fn in _QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each queries() entry."""
    return dict(_ORACLE)
