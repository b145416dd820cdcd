"""Round-5 batch 10: k-sample nonparametrics, a one-scan correlation
matrix, classical seasonal decomposition, and variance-homogeneity
testing (SURVEY.md §2.9 aggregation / time-series families; no
reference counterpart).

  * ``agg_kruskal_wallis`` — tie-corrected Kruskal-Wallis H across
    the three l_returnflag groups on quantity. The k-sample
    generalization of ``agg_mann_whitney_u``, sharing its midrank
    machinery: doubled midranks from windows over the ~150-row
    (group, value) count relation — rows are never individually
    ranked, and the fact table is scanned ONCE.
  * ``agg_correlation_matrix`` — all pairwise Pearson correlations
    among quantity / extendedprice / discount / tax from ONE scan:
    fourteen exact DECIMAL(38,0)/HUGEINT power sums in a single
    aggregate row, unpivoted to six (col_a, col_b) pairs against an
    inline constant table.
  * ``ts_seasonal_decompose`` — classical additive decomposition of
    daily order revenue: centered 7-day moving-average trend
    (calendar RANGE frame, full weeks only), integer detrended
    values scaled by 7 so nothing leaves the integers, per-weekday
    seasonal component in exact milli-cents.
  * ``agg_levene_variance_test`` — Levene's test for equality of
    variances across the returnflag groups. Scaled absolute
    deviations ``W = |n_g*x - S_g|`` (= n_g * |x - mean_g|) keep
    every accumulation integer-exact; the F statistic is one
    closed-form double over exact sums, floored to milli.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from ..sources.readers import load_table
from .contract import money_rounded_sql, qty_scaled_sql, rate_scaled_sql

# ---------------------------------------------------------------------------
# Kruskal-Wallis H (k-sample rank test)
# ---------------------------------------------------------------------------
# One (group, value) count scan; everything else is windows over that
# ~150-row relation. Doubled midranks keep ties integral:
#   r2(v) = 2 * (#obs with value < v) + ct(v) + 1  ( = 2 * midrank )
# Rank sums R2_g = sum(c * r2) are exact; H uses R_g = R2_g / 2 via
#   H = 12/(N(N+1)) * sum(R_g^2 / n_g) - 3(N+1)
# and the tie correction divides by 1 - sum(t^3 - t)/(N^3 - N).

_KW_CORE = f"""
WITH base AS (
  -- contract-bounded quantity (round-10 layer 2): a NULL quantity
  -- has no rank (engine NULL ordering differs in the midrank
  -- windows) and an out-of-[1,50] one is corrupt ingest
  SELECT g, v, COUNT(*) AS c FROM (
    SELECT l_returnflag AS g, {qty_scaled_sql('l_quantity', 1)} AS v
    FROM {{lineitem}}
  ) WHERE v IS NOT NULL GROUP BY g, v
), w AS (
  SELECT g, v, c,
         SUM(c) OVER (PARTITION BY v) AS ct,
         coalesce(SUM(c) OVER (ORDER BY v
             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS below,
         ROW_NUMBER() OVER (PARTITION BY v ORDER BY g) AS rnv
  FROM base
), rg AS (
  SELECT g, SUM(c) AS n_g,
         SUM(CAST(c AS {{big}}) * (2 * below + ct + 1)) AS r2,
         SUM(CASE WHEN rnv = 1
                  THEN CAST(ct AS {{big}}) * ct * ct - ct ELSE 0 END) AS tie
  FROM w GROUP BY g
), wide AS (
  SELECT SUM(n_g) AS n, SUM(tie) AS ties,
         MAX(CASE WHEN g = 'A' THEN n_g END) AS n1,
         MAX(CASE WHEN g = 'N' THEN n_g END) AS n2,
         MAX(CASE WHEN g = 'R' THEN n_g END) AS n3,
         MAX(CASE WHEN g = 'A' THEN r2 END) AS r1,
         MAX(CASE WHEN g = 'N' THEN r2 END) AS r2_,
         MAX(CASE WHEN g = 'R' THEN r2 END) AS r3
  FROM rg
), s AS (
  SELECT n, CAST(ties AS DOUBLE) AS ties,
         CAST(r1 AS DOUBLE) * CAST(r1 AS DOUBLE)
           / (4.0 * CAST(n1 AS DOUBLE))
         + CAST(r2_ AS DOUBLE) * CAST(r2_ AS DOUBLE)
           / (4.0 * CAST(n2 AS DOUBLE))
         + CAST(r3 AS DOUBLE) * CAST(r3 AS DOUBLE)
           / (4.0 * CAST(n3 AS DOUBLE)) AS rsq
  FROM wide
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(2 AS BIGINT) AS dof,
       CAST(floor((12.0 / (CAST(n AS DOUBLE) * (n + 1)) * rsq - 3.0 * (n + 1))
                  / (1.0 - ties / (CAST(n AS DOUBLE) * n * n - n))
                  * 1000) AS BIGINT) AS h_tie_corrected_milli
FROM s
"""


def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Kruskal-Wallis H across the l_returnflag groups
    on quantity. ONE fact scan to a (group, value) count relation;
    doubled midranks, per-value tie terms (emitted once via a
    first-row flag) and rank sums are all windows/aggregates over
    those ~150 rows, exact in DECIMAL(38,0)/HUGEINT until the final
    closed-form double, floored to milli. The quantity grid bounds
    the window relation at any fact scale."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "r28_kw_lineitem"
    )
    return spark.sql(
        _KW_CORE.format(lineitem="r28_kw_lineitem", big="DECIMAL(38,0)")
    )


_KW_DUCK = _KW_CORE.format(lineitem="lineitem", big="HUGEINT")


# ---------------------------------------------------------------------------
# Pairwise correlation matrix in one scan
# ---------------------------------------------------------------------------
# Columns scaled to integers (quantity units, price cents, discount
# and tax basis points); every sum / square / cross-product
# accumulates exactly, and each pair's Pearson r is one closed-form
# double from the single aggregate row.

_CM_PAIRS = (
    "(VALUES ('quantity', 'extendedprice'), ('quantity', 'discount'),"
    " ('quantity', 'tax'), ('extendedprice', 'discount'),"
    " ('extendedprice', 'tax'), ('discount', 'tax')) AS p(col_a, col_b)"
)

_CM_CORE = f"""
WITH v AS (
  -- contract-bounded ingests (round-10 layer 2): a castable absurd
  -- cents value's square overflows even INT128 once multiplied by n.
  -- Complete-case rows only: engines agree SUM skips NULL, but a
  -- correlation over per-column subsets is not a correlation.
  SELECT q, e, d, t FROM (
    SELECT {qty_scaled_sql('l_quantity', 1)} AS q,
           {money_rounded_sql('l_extendedprice')} AS e,
           {rate_scaled_sql('l_discount')} AS d,
           {rate_scaled_sql('l_tax')} AS t
    FROM {{lineitem}}
  ) WHERE q IS NOT NULL AND e IS NOT NULL
        AND d IS NOT NULL AND t IS NOT NULL
), s AS (
  -- product widths are DOMAIN-justified (round-10 bench flag): with
  -- q <= 50, e <= 1e14, d,t <= 1e4 every cross-product except e*e
  -- stays exact INT64 (max e*d = 1e18 < 2^63), so only the SUM
  -- accumulators widen — a per-row 128-bit multiply on all nine
  -- co-moments measured ~2x the whole query
  SELECT COUNT(*) AS n,
         SUM(CAST(q AS {{big}})) AS sq, SUM(CAST(e AS {{big}})) AS se,
         SUM(CAST(d AS {{big}})) AS sd, SUM(CAST(t AS {{big}})) AS st,
         SUM(CAST(q * q AS {{big}})) AS sqq, SUM(CAST(e AS {{big}}) * e) AS see,
         SUM(CAST(d * d AS {{big}})) AS sdd, SUM(CAST(t * t AS {{big}})) AS stt,
         SUM(CAST(q * e AS {{big}})) AS sqe, SUM(CAST(q * d AS {{big}})) AS sqd,
         SUM(CAST(q * t AS {{big}})) AS sqt, SUM(CAST(e * d AS {{big}})) AS sed,
         SUM(CAST(e * t AS {{big}})) AS set_, SUM(CAST(d * t AS {{big}})) AS sdt
  FROM v
), pairs AS (
  SELECT p.col_a, p.col_b, s.n,
         CASE WHEN p.col_a = 'quantity' AND p.col_b = 'extendedprice'
                THEN CAST(s.n * sqe - sq * se AS DOUBLE)
              WHEN p.col_a = 'quantity' AND p.col_b = 'discount'
                THEN CAST(s.n * sqd - sq * sd AS DOUBLE)
              WHEN p.col_a = 'quantity' AND p.col_b = 'tax'
                THEN CAST(s.n * sqt - sq * st AS DOUBLE)
              WHEN p.col_a = 'extendedprice' AND p.col_b = 'discount'
                THEN CAST(s.n * sed - se * sd AS DOUBLE)
              WHEN p.col_a = 'extendedprice' AND p.col_b = 'tax'
                THEN CAST(s.n * set_ - se * st AS DOUBLE)
              ELSE CAST(s.n * sdt - sd * st AS DOUBLE) END AS cov_n,
         CASE WHEN p.col_a = 'quantity'
                THEN CAST(s.n * sqq - sq * sq AS DOUBLE)
              WHEN p.col_a = 'extendedprice'
                THEN CAST(s.n * see - se * se AS DOUBLE)
              ELSE CAST(s.n * sdd - sd * sd AS DOUBLE) END AS var_a,
         CASE WHEN p.col_b = 'extendedprice'
                THEN CAST(s.n * see - se * se AS DOUBLE)
              WHEN p.col_b = 'discount'
                THEN CAST(s.n * sdd - sd * sd AS DOUBLE)
              ELSE CAST(s.n * stt - st * st AS DOUBLE) END AS var_b
  FROM s CROSS JOIN {{pairs}}
)
SELECT col_a, col_b, CAST(n AS BIGINT) AS n_rows,
       CAST(floor(cov_n / sqrt(var_a * var_b) * 1e6) AS BIGINT)
         AS corr_micro
FROM pairs
ORDER BY col_a, col_b
"""


def agg_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six pairwise Pearson correlations among lineitem's numeric
    columns from ONE scan: fourteen exact integer power sums in a
    single map-combined aggregate row, unpivoted against a 6-row
    inline pair table (broadcast cross join of two tiny relations).
    The per-pair r is one closed-form double, floored to micro. This
    is the feature-redundancy screen of an ML-prep pipeline at the
    cost of a single pass."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "r28_cm_lineitem"
    )
    return spark.sql(
        _CM_CORE.format(
            lineitem="r28_cm_lineitem", big="DECIMAL(38,0)", pairs=_CM_PAIRS
        )
    )


_CM_DUCK = _CM_CORE.format(lineitem="lineitem", big="HUGEINT", pairs=_CM_PAIRS)


# ---------------------------------------------------------------------------
# Classical additive seasonal decomposition
# ---------------------------------------------------------------------------
# daily cents -> trend = centered 7-day mean over a CALENDAR range
# frame (missing days make the frame partial; only full weeks emit a
# trend) -> detrended_sev = 7*cents - trend_sum (integer: scaling by
# 7 avoids the /7) -> per-weekday seasonal = mean(detrended)/1, in
# milli-cents via integer division by 7*n.

_SD_CORE = """
WITH daily AS (
  SELECT {dayidx} AS di,
         SUM(TRY_CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM {orders} GROUP BY o_orderdate
), w AS (
  SELECT di, cents,
         SUM(cents) OVER (ORDER BY di
             RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS win_sum,
         COUNT(*) OVER (ORDER BY di
             RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS win_n
  FROM daily
), det AS (
  SELECT di % 7 + 1 AS iso_dow,
         7 * cents - win_sum AS detrended_sev
  FROM w WHERE win_n = 7
)
SELECT CAST(iso_dow AS BIGINT) AS iso_dow,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(CAST(detrended_sev AS {big})) * 1000
            {idiv} (7 * COUNT(*)) AS BIGINT) AS seasonal_milli_cents
FROM det GROUP BY iso_dow
ORDER BY iso_dow
"""


def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ISO-weekday seasonal component of daily order revenue
    under a classical additive decomposition: trend is a centered
    7-day mean over a CALENDAR range frame (only complete weeks
    contribute), the detrended series is scaled by 7 so it stays
    integral, and the seasonal mean is exact milli-cents by integer
    division. ONE fact scan; every window runs over the tiny daily
    relation. Day index anchors at 1990-01-01 (a Monday), so
    ``di % 7 + 1`` is the ISO weekday."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r28_sd_orders"
    )
    return spark.sql(
        _SD_CORE.format(
            orders="r28_sd_orders",
            dayidx="datediff(CAST(o_orderdate AS DATE), DATE '1990-01-01')",
            big="DECIMAL(38,0)",
            idiv="DIV",
        )
    )


_SD_DUCK = _SD_CORE.format(
    orders="orders",
    dayidx="CAST(o_orderdate AS DATE) - DATE '1990-01-01'",
    big="HUGEINT",
    idiv="//",
)


# ---------------------------------------------------------------------------
# Levene's test (variance homogeneity)
# ---------------------------------------------------------------------------
# Two passes in the train-then-score shape (the group-means relation
# is tiny and broadcasts; the deviations pass re-reads the 2-column
# scan — the multi-referenced-CTE audit's deliberate bucket): with
# x in cents and group sums (n_g, S_g), the scaled deviation
#   W = |n_g * x - S_g| = n_g * |x - mean_g|
# is INTEGER, so SUM(W) and SUM(W^2) accumulate exactly; Levene's F
#   F = (N-k)/(k-1) * sum n_g (Zbar_g - Zbar)^2 / sum (Z - Zbar_g)^2
# with Z = W / n_g is one closed-form double over the exact sums.

_LEV_CORE = f"""
WITH x AS (
  -- bounded cents (round-10 layer 2): w^2 on a castable absurd value
  -- overflows INT128; a NULL (corrupt) price has no deviation
  SELECT g, cents FROM (
    SELECT l_returnflag AS g,
           {money_rounded_sql('l_extendedprice')} AS cents
    FROM {{lineitem}}
  ) WHERE cents IS NOT NULL
), m AS (
  SELECT g, COUNT(*) AS n_g, SUM(CAST(cents AS {{big}})) AS s_g
  FROM x GROUP BY g
), dev AS (
  SELECT x.g, m.n_g,
         abs(CAST(m.n_g AS {{big}}) * x.cents - m.s_g) AS w
  FROM x JOIN m ON x.g = m.g
), gz AS (
  SELECT g, MAX(n_g) AS n_g,
         SUM(CAST(w AS {{big}})) AS sw,
         SUM(CAST(w AS {{big}}) * w) AS sw2
  FROM dev GROUP BY g
), gd AS (
  SELECT g, n_g,
         CAST(sw AS DOUBLE) / CAST(n_g AS DOUBLE) AS sum_z,
         CAST(sw2 AS DOUBLE)
           / (CAST(n_g AS DOUBLE) * CAST(n_g AS DOUBLE)) AS sum_z2
  FROM gz
), wide AS (
  SELECT MAX(CASE WHEN g = 'A' THEN n_g END) AS n1,
         MAX(CASE WHEN g = 'N' THEN n_g END) AS n2,
         MAX(CASE WHEN g = 'R' THEN n_g END) AS n3,
         MAX(CASE WHEN g = 'A' THEN sum_z END) AS z1,
         MAX(CASE WHEN g = 'N' THEN sum_z END) AS z2,
         MAX(CASE WHEN g = 'R' THEN sum_z END) AS z3,
         MAX(CASE WHEN g = 'A' THEN sum_z2 END) AS q1,
         MAX(CASE WHEN g = 'N' THEN sum_z2 END) AS q2,
         MAX(CASE WHEN g = 'R' THEN sum_z2 END) AS q3
  FROM gd
), s AS (
  SELECT CAST(n1 + n2 + n3 AS DOUBLE) AS n,
         z1 + z2 + z3 AS tz,
         z1 * z1 / n1 + z2 * z2 / n2 + z3 * z3 / n3 AS between_raw,
         (q1 - z1 * z1 / n1) + (q2 - z2 * z2 / n2)
           + (q3 - z3 * z3 / n3) AS within,
         n1 + n2 + n3 AS n_int
  FROM wide
)
SELECT CAST(n_int AS BIGINT) AS n_rows,
       CAST(3 AS BIGINT) AS n_groups,
       CAST(floor((n - 3) / 2.0
                  * (between_raw - tz * tz / n) / within
                  * 1000) AS BIGINT) AS levene_f_milli
FROM s
"""


def agg_levene_variance_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's F for equality of extended-price variances across the
    returnflag groups. The group-means pass yields a 3-row broadcast
    relation; the deviations pass accumulates |n_g*x - S_g| — an
    INTEGER, so the W and W^2 sums are exact — and F is one
    closed-form double, floored to milli. Two deliberate 2-column
    scans (absolute deviations from a mean are not decomposable into
    power sums; see SCALE.md's multi-referenced-CTE audit)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "r28_lev_lineitem"
    )
    return spark.sql(
        _LEV_CORE.format(lineitem="r28_lev_lineitem", big="DECIMAL(38,0)")
    )


_LEV_DUCK = _LEV_CORE.format(lineitem="lineitem", big="HUGEINT")


QUERIES = {
    "agg_kruskal_wallis": agg_kruskal_wallis,
    "agg_correlation_matrix": agg_correlation_matrix,
    "ts_seasonal_decompose": ts_seasonal_decompose,
    "agg_levene_variance_test": agg_levene_variance_test,
}

ORACLE = {
    "agg_kruskal_wallis": _KW_DUCK,
    "agg_correlation_matrix": _CM_DUCK,
    "ts_seasonal_decompose": _SD_DUCK,
    "agg_levene_variance_test": _LEV_DUCK,
}
