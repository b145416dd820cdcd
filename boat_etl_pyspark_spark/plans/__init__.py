"""Named query plans.

Each plan module exposes ``QUERIES`` (name -> fn(spark, sf_dir) ->
DataFrame) and ``ORACLE`` (name -> DuckDB SQL string). The driver
contract in ``__spark_entry__.py`` aggregates them all.
"""

from __future__ import annotations


def collect_registries(*modules):
    """Merge the QUERIES / ORACLE registries of several plan modules."""
    queries: dict = {}
    oracle: dict = {}
    for m in modules:
        overlap = set(m.QUERIES) & set(queries)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        queries.update(m.QUERIES)
        oracle.update(getattr(m, "ORACLE", {}))
    return queries, oracle
