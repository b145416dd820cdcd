"""Deterministic numeric aggregation helpers.

Floating-point sums are order-dependent, and Spark's partial/final
aggregation order varies with partitioning — so a raw
``sum(double)`` is not reproducible bit-for-bit run to run, let alone
against a DuckDB oracle. For money-like columns (fixed ≤2 decimal
places) we instead:

  1. do the per-row arithmetic in double (deterministic IEEE ops),
  2. round to scaled BIGINT units (e.g. cents),
  3. aggregate the integers (associative ⇒ order-independent),
  4. apply a single final double division.

The result is bit-identical in any engine and at any parallelism —
exactly what a 1000-executor job needs for reproducible results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column, scale: int = 100) -> Column:
    """Per-row: double money value -> exact scaled integer units.

    try_cast, not cast: Spark's non-ANSI CAST invents integers for
    non-finite doubles (NaN -> 0, Inf -> 2^63-1) where DuckDB's CAST
    throws — TRY_CAST yields NULL for NaN/Inf/overflow in BOTH
    engines, so a corrupt measurement behaves exactly like a NULL one
    instead of silently minting a zero-cent sale. Identical to CAST on
    every finite in-range value."""
    return F.round(col * F.lit(scale)).try_cast("bigint")


def money_sum(col: Column, scale: int = 100) -> Column:
    """Order-independent SUM over a money-like double column."""
    return F.sum(cents(col, scale)) / float(scale)


def money_avg(col: Column, scale: int = 100) -> Column:
    """Order-independent AVG over a money-like double column."""
    return F.sum(cents(col, scale)) / (F.count(col) * float(scale))
