"""Round-5 batch 8: sequence-extremum and rank-correlation operators
(SURVEY.md §2.9 window / aggregation families; no reference
counterpart).

  * ``window_max_drawdown`` — per-user maximum drawdown of the
    cumulative event-value series (largest peak-to-trough drop), the
    canonical running-max-minus-running-sum window pair on ONE
    user_id exchange, all integer cents; the global top-20 riders
    take TakeOrderedAndProject.
  * ``agg_spearman_rho`` — Spearman rank correlation between
    lineitem quantity and price. Midranks come from per-value
    aggregates + a cumulative window over each DISTINCT-value
    relation (the Mann-Whitney machinery), joined back as doubled
    integers, so the five power sums feeding Pearson-on-ranks are
    EXACT in DECIMAL(38,0)/HUGEINT; rho is one closed-form double,
    floored to micro units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from ..sources.readers import load_table

# ---------------------------------------------------------------------------
# Maximum drawdown
# ---------------------------------------------------------------------------

_DD_TOPK = 20

_DD_CORE = f"""
WITH e AS (
  SELECT user_id, event_id, {{epoch_us}} AS us,
         TRY_CAST(round(value * 100) AS BIGINT) AS cents
  FROM {{events}}
  WHERE value IS NOT NULL  -- scan-pushdown half of the predicate
    AND TRY_CAST(round(value * 100) AS BIGINT) IS NOT NULL
), c0 AS (
  SELECT user_id, us, event_id,
         SUM(cents) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM e
), c AS (
  SELECT user_id, cum,
         MAX(cum) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS peak
  FROM c0
), dd AS (
  SELECT user_id, MAX(peak - cum) AS max_drawdown_cents,
         COUNT(*) AS n_events
  FROM c GROUP BY user_id
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(max_drawdown_cents AS BIGINT) AS max_drawdown_cents
FROM dd
ORDER BY max_drawdown_cents DESC, user_id
LIMIT {_DD_TOPK}
"""


def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_DD_TOPK} users by maximum drawdown of their cumulative
    event-value series. Cumulative sum, running max of it, and the
    per-user reduction all share one user_id exchange; values stay
    integer cents end to end, and the global top-k is a
    TakeOrderedAndProject, never a full sort."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r26_dd_events"
    )
    return spark.sql(
        _DD_CORE.format(events="r26_dd_events", epoch_us="unix_micros(ts)")
    )


_DD_DUCK = _DD_CORE.format(events="events", epoch_us="epoch_us(ts)")


# ---------------------------------------------------------------------------
# Spearman rank correlation
# ---------------------------------------------------------------------------

# Rank-grid resolution for the price axis, the KS quantization knob
# ported (SCALE.md "midrank machinery" section): the cumulative
# midrank window runs over DISTINCT y values, which track row count
# until they saturate at the price domain (~1.04e7 cents). 1 = exact
# cents (the fixture-scale default, identical to no knob); a
# continuous or wider-domain deployment sets a coarser grid (e.g.
# 100 = whole dollars, capping the window relation at ~1e5 rows) and
# rho becomes rho-on-the-grid, exactly as agg_ks_test's D is
# D-on-the-grid.
_SPEAR_GRID_CENTS = 1

_SPEAR_CORE = """
WITH v AS (
  SELECT TRY_CAST(round(l_quantity) AS BIGINT) AS x,
         TRY_CAST(round(l_extendedprice * 100) AS BIGINT) {idiv} {grid} AS y
  FROM {lineitem}
), rx AS (
  SELECT x, 2 * (coalesce(SUM(ct) OVER (ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + 1) + ct - 1 AS r2
  FROM (SELECT x, COUNT(*) AS ct FROM v GROUP BY x)
), ry AS (
  SELECT y, 2 * (coalesce(SUM(ct) OVER (ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + 1) + ct - 1 AS r2
  FROM (SELECT y, COUNT(*) AS ct FROM v GROUP BY y)
), j AS (
  SELECT rx.r2 AS a, ry.r2 AS b
  FROM v JOIN rx ON v.x = rx.x JOIN ry ON v.y = ry.y
), s AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(a AS {big})) AS sa, SUM(CAST(b AS {big})) AS sb,
         SUM(CAST(a AS {big}) * a) AS saa,
         SUM(CAST(b AS {big}) * b) AS sbb,
         SUM(CAST(a AS {big}) * b) AS sab
  FROM j
)
SELECT CAST(n AS BIGINT) AS n_items,
       CAST(floor(CAST(n * sab - sa * sb AS DOUBLE)
                  / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                         * CAST(n * sbb - sb * sb AS DOUBLE))
                  * 1e6) AS BIGINT) AS spearman_rho_micro
FROM s
"""


def agg_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman's rho without ranking rows: per-value midranks
    (doubled, so ties stay integral) come from distinct-value
    cumulative windows, join back to the fact as broadcastable rank
    maps, and Pearson over the doubled ranks uses exact
    DECIMAL/HUGEINT power sums — the doubling cancels in the
    correlation. Window relations are bounded by value cardinality
    (quantity: ~50 grid values; price: the ~10^7-value cents domain,
    a count-aggregated relation one task handles at any row count —
    and ``_SPEAR_GRID_CENTS`` is the explicit quantization knob for
    continuous/wider domains, the agg_ks_test grid ported; measured
    distinct counts per scale in SCALE.md "midrank machinery");
    the fact table contributes one aggregate pass after two hash
    joins on its own value columns. If the rank key were genuinely
    unbounded (float keys, composite keys), swap the cumulative
    window for ``operators.library.global_prefix_sum`` — the
    distributed form; measured 1.4x SLOWER at fixture scale (persist
    fence + offset broadcast dominate a 10^5-row window), which is
    why the domain-bounded window is the default here."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "r26_sp_lineitem"
    )
    return spark.sql(
        _SPEAR_CORE.format(lineitem="r26_sp_lineitem", big="DECIMAL(38,0)",
                           idiv="DIV", grid=_SPEAR_GRID_CENTS)
    )


_SPEAR_DUCK = _SPEAR_CORE.format(lineitem="lineitem", big="HUGEINT",
                                 idiv="//", grid=_SPEAR_GRID_CENTS)


QUERIES = {
    "window_max_drawdown": window_max_drawdown,
    "agg_spearman_rho": agg_spearman_rho,
}

ORACLE = {
    "window_max_drawdown": _DD_DUCK,
    "agg_spearman_rho": _SPEAR_DUCK,
}
