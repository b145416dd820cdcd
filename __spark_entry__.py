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
    io_plans,
    multimodal_plans,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    sessionize,
    similarity,
    streaming_plans,
    textdedup,
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
)

_QUERIES, _ORACLE = collect_registries(*_PLAN_MODULES)

# The driver's correctness gate checks the FIRST 50 registry entries in
# order. Round 1 banked green rows for the relational/analytics/curation
# core; round 2 front-loads the families the driver has not yet checked
# (dedup, similarity, text, streaming, multimodal, TPC-H q6-q22
# remainder) plus the two round-1 hash failures whose oracles were fixed
# (q12_priority_by_ship_year, curate_pack_sequences).
#
# ROUND 3 TODO (reorder at round start, AFTER CORRECTNESS_r02 lands):
# replace _CHECK_FIRST with the queries still lacking a driver row —
# the three deferred siblings (q14_promo_revenue_share,
# q18_large_orders, window_locf_fill) plus everything registered in
# round 2 (events_sessionize, agg_incremental_mv_merge, io_*,
# layout_zorder_orders, stream_dedup_within_watermark,
# stream_foreachbatch_totals, lateral_top2_orders_per_customer,
# json_variant_nested, array_hof_quantity_profile, and any round-3
# additions) — then backfill with round-1 greens.
_CHECK_FIRST = (
    # the full boat ETL (SURVEY §2.1-2.8) as one driver row
    "boat_pipeline_summary",
    # round-1 hash failures, oracles fixed this round
    "q12_priority_by_ship_year",
    "curate_pack_sequences",
    # textdedup family
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_incremental",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "text_token_stats",
    "text_quality_score",
    "text_language_id",
    "text_fingerprints",
    "text_stopword_removal",
    "text_tfidf_top_terms",
    "text_keyword_spans",
    # similarity family
    "sim_bruteforce_topk",
    "sim_ivf_topk",
    "sim_norm_stats",
    "sim_rp_lsh_buckets",
    # streaming family
    "stream_tumbling_6h",
    "stream_sliding_6h_3h",
    "stream_session_windows",
    "stream_stateful_user_totals",
    "stream_stream_attribution",
    "stream_dedup_user_event_types",
    "stream_static_value_buckets",
    "stream_kafka_roundtrip",
    # multimodal family
    "multimodal_binary_meta",
    "multimodal_frame_sample",
    "multimodal_decode_features",
    "multimodal_resize",
    # TPC-H remainder + relational5 extras
    "q6_forecast_revenue",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_item_customers",
    "q11_important_stock",
    "q13_order_count_histogram",
    "q15_top_suppliers",
    "q16_parts_supplier_variety",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_excess_stock_suppliers",
    "q21_sole_delaying_supplier",
    "q22_dormant_positive_customers",
    "agg_approx_sketches",
    "text_chunking",
    "unpivot_customer_metrics",
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
