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
    curation,
    multimodal_plans,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    similarity,
    streaming_plans,
    textdedup,
)
from boat_etl_pyspark_spark.session import tune

_PLAN_MODULES = (
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
)

_QUERIES, _ORACLE = collect_registries(*_PLAN_MODULES)


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
