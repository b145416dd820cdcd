"""Round-5 batch 44: long-memory estimation, adversarial drift
detection and downside-risk summarization (SURVEY.md §2.9
time-series/validation/window families; no reference counterpart).

  * ``ts_hurst_exponent`` — rescaled-range (R/S) Hurst estimate of
    the daily order-count series over dyadic block sizes 8/16/32/64.
    Per-block cumulative deviations are m-SCALED so they stay exact
    integers (m·cumsum − i·Σx); each block contributes one
    fixed-shape float R/S floored to micro units BEFORE the integer
    per-size mean, and the final log-log slope is a closed form over
    the four PIVOTED size columns — no float aggregation anywhere.
  * ``validate_drift_adversarial`` — the adversarial two-sample
    test: the exact rank-sum AUC of order value distinguishing the
    1996 cohort from the 1997 cohort.  AUC ≈ 0.5 ⇒ no
    distributional drift; the |AUC−0.5| score is the single number
    a feature-drift monitor pages on.  Same integer rank-sum
    identity as `ml_roc_auc` — no threshold sweep, no row sort.
  * ``window_ulcer_index`` — Peter Martin's ulcer index (RMS of
    running-peak drawdown percentages) over daily revenue: the
    downside-risk complement to `window_max_drawdown`, with every
    per-day drawdown an exact integer micro share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table
from .contract import money_rounded_sql, tpch_date_valid_sql

# ---------------------------------------------------------------------------
# Hurst exponent (rescaled range)
# ---------------------------------------------------------------------------

_HURST_MS = (8, 16, 32, 64)

_HURST_CORE = """
WITH daily AS (
  -- business-date validity (round-10 layer 2): a NULL/out-of-window
  -- date has no position on the day axis (engine NULL ordering
  -- differs in the ROW_NUMBER walk, re-blocking the whole series)
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x
  FROM {orders} WHERE """ + tpch_date_valid_sql("o_orderdate") + """
  GROUP BY CAST(o_orderdate AS DATE)
), idx AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY d) AS rn FROM daily
), expanded AS (
  SELECT m.m, (rn - 1) {idiv} m.m AS blk,
         ROW_NUMBER() OVER (PARTITION BY m.m, (rn - 1) {idiv} m.m
                            ORDER BY rn) AS i,
         COUNT(*) OVER (PARTITION BY m.m, (rn - 1) {idiv} m.m) AS bn,
         SUM(x) OVER (PARTITION BY m.m, (rn - 1) {idiv} m.m) AS s1,
         SUM(CAST(x AS DECIMAL(38,0)) * x)
           OVER (PARTITION BY m.m, (rn - 1) {idiv} m.m) AS s2,
         SUM(x) OVER (PARTITION BY m.m, (rn - 1) {idiv} m.m
                      ORDER BY rn ROWS UNBOUNDED PRECEDING) AS cum
  FROM idx CROSS JOIN ({ms}) m
), devs AS (
  SELECT m, blk, bn, s1, s2,
         m * cum - i * s1 AS dev_scaled
  FROM expanded WHERE bn = m
), blocks AS (
  SELECT m, blk, MAX(s1) AS s1, MAX(s2) AS s2,
         MAX(dev_scaled) - LEAST(MIN(dev_scaled), 0) AS r_scaled
  FROM devs GROUP BY m, blk
), rs AS (
  SELECT m,
         CAST(floor(CAST(r_scaled AS DOUBLE)
                    / sqrt(CAST(m AS DOUBLE) * CAST(s2 AS DOUBLE)
                           - CAST(s1 AS DOUBLE) * s1)
                    * 1000000) AS BIGINT) AS rs_micro
  FROM blocks
  WHERE m * CAST(s2 AS DECIMAL(38,0)) - CAST(s1 AS DECIMAL(38,0)) * s1 > 0
), per_m AS (
  SELECT m, COUNT(*) AS n_blocks,
         SUM(rs_micro) {idiv} COUNT(*) AS mean_rs_micro
  FROM rs GROUP BY m
), piv AS (
  SELECT MAX(CASE WHEN m = 8 THEN mean_rs_micro END) AS y8,
         MAX(CASE WHEN m = 16 THEN mean_rs_micro END) AS y16,
         MAX(CASE WHEN m = 32 THEN mean_rs_micro END) AS y32,
         MAX(CASE WHEN m = 64 THEN mean_rs_micro END) AS y64,
         SUM(n_blocks) AS n_blocks_total
  FROM per_m
)
SELECT CAST(n_blocks_total AS BIGINT) AS n_blocks,
       CAST(y8 AS BIGINT) AS rs8_micro,
       CAST(y16 AS BIGINT) AS rs16_micro,
       CAST(y32 AS BIGINT) AS rs32_micro,
       CAST(y64 AS BIGINT) AS rs64_micro,
       CAST(floor(
         ((ln(CAST(y8 AS DOUBLE) / 1e6) * ln(8e0)
           + ln(CAST(y16 AS DOUBLE) / 1e6) * ln(16e0)
           + ln(CAST(y32 AS DOUBLE) / 1e6) * ln(32e0)
           + ln(CAST(y64 AS DOUBLE) / 1e6) * ln(64e0)) * 4
          - (ln(CAST(y8 AS DOUBLE) / 1e6) + ln(CAST(y16 AS DOUBLE) / 1e6)
             + ln(CAST(y32 AS DOUBLE) / 1e6) + ln(CAST(y64 AS DOUBLE) / 1e6))
            * (ln(8e0) + ln(16e0) + ln(32e0) + ln(64e0)))
         / ((ln(8e0) * ln(8e0) + ln(16e0) * ln(16e0)
             + ln(32e0) * ln(32e0) + ln(64e0) * ln(64e0)) * 4
            - (ln(8e0) + ln(16e0) + ln(32e0) + ln(64e0))
              * (ln(8e0) + ln(16e0) + ln(32e0) + ln(64e0)))
         * 1000) AS BIGINT) AS hurst_milli
FROM piv
"""


def ts_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range Hurst exponent of daily order counts (H≈0.5
    ⇒ no long memory; >0.5 ⇒ persistent trends): R/S per dyadic
    block of 8/16/32/64 days, then the log-log slope.  Cumulative
    deviations are m-scaled integers (m·cumsum − i·Σx), each
    block's R/S is one fixed-shape float floored to micro before an
    INTEGER per-size mean, and the slope is a closed-form
    expression over the four pivoted columns — explicit term order,
    DOUBLE literals, no float SUM whose order an engine could
    choose.  The daily relation is date-span-bounded; the 4× block
    expansion stays bounded with it."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r57_hurst_orders"
    )
    ms = " UNION ALL ".join(f"SELECT {m} AS m" for m in _HURST_MS)
    return spark.sql(
        _HURST_CORE.format(orders="r57_hurst_orders", ms=ms, idiv="DIV")
    )


_HURST_DUCK = _HURST_CORE.format(
    orders="orders",
    ms=" UNION ALL ".join(f"SELECT {m} AS m" for m in _HURST_MS),
    idiv="//",
)

# ---------------------------------------------------------------------------
# Adversarial drift AUC
# ---------------------------------------------------------------------------

_DRIFT_Y0 = 1996
_DRIFT_Y1 = 1997

_DRIFTAUC_CORE = f"""
WITH v AS (
  SELECT TRY_CAST(round(o_totalprice * 100) AS BIGINT) AS s,
         CASE WHEN year(o_orderdate) = {_DRIFT_Y1} THEN 1 ELSE 0 END AS y
  FROM {{orders}}
  WHERE year(o_orderdate) IN ({_DRIFT_Y0}, {_DRIFT_Y1})
), cnt AS (
  SELECT s, SUM(y) AS cp, COUNT(*) AS ct FROM v GROUP BY s
), w AS (
  SELECT s, cp, ct,
         coalesce(SUM(ct) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM cnt
), agg AS (
  SELECT SUM(CAST(cp AS {{big}}) * (2 * below + ct + 1)) AS r2_pos,
         SUM(cp) AS n_pos, SUM(ct - cp) AS n_neg
  FROM w
), auc AS (
  SELECT n_pos, n_neg,
         (r2_pos - CAST(n_pos AS {{big}}) * (n_pos + 1)) * 1000000
           {{idiv}} (2 * CAST(n_pos AS {{big}}) * n_neg) AS auc_ppm
  FROM agg
)
SELECT CAST(n_neg AS BIGINT) AS n_cohort_a,
       CAST(n_pos AS BIGINT) AS n_cohort_b,
       CAST(auc_ppm AS BIGINT) AS adversarial_auc_ppm,
       CAST(abs(auc_ppm - 500000) AS BIGINT) AS drift_score_ppm
FROM auc
"""


def validate_drift_adversarial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adversarial two-sample drift test: the exact AUC with which
    order value alone separates the 1996 cohort from the 1997 cohort
    — AUC 0.5 means the feature distribution did not move, and
    |AUC−0.5| is the page-on-this drift score (the
    classifier-two-sample-test reduced to its exact one-feature
    form).  Same integer rank-sum identity as `ml_roc_auc`: one
    cumulative window over the bounded distinct-cents grid, integer
    to the final ppm division.  The PSI test (`validate_drift_psi`)
    bins first; this one is bin-free and detects any rank shift."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r57_drift_orders"
    )
    return spark.sql(
        _DRIFTAUC_CORE.format(
            orders="r57_drift_orders", big="DECIMAL(38,0)", idiv="DIV"
        )
    )


_DRIFTAUC_DUCK = _DRIFTAUC_CORE.format(
    orders="orders", big="HUGEINT", idiv="//"
)

# ---------------------------------------------------------------------------
# Ulcer index
# ---------------------------------------------------------------------------

_ULCER_CORE = """
WITH daily AS (
  -- bounded cents + business-date validity (round-10 layer 2, same
  -- rationale as window_bollinger_bands)
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(""" + money_rounded_sql("o_totalprice") + """) AS x
  FROM {orders} WHERE """ + tpch_date_valid_sql("o_orderdate") + """
  GROUP BY CAST(o_orderdate AS DATE)
), peaks AS (
  SELECT d, x, MAX(x) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS pk
  FROM daily
), dd AS (
  SELECT (pk - x) * 1000000 {idiv} pk AS dd_micro FROM peaks
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX(dd_micro) AS BIGINT) AS max_drawdown_micro,
       CAST(SUM(CASE WHEN dd_micro > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_days_underwater,
       CAST(floor(sqrt(CAST(SUM(CAST(dd_micro AS DECIMAL(38,0))
                                * dd_micro) AS DOUBLE)
                       / COUNT(*))) AS BIGINT) AS ulcer_index_micro
FROM dd
"""


def window_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ulcer index of daily revenue — the RMS of running-peak
    drawdown shares, the downside-risk measure that punishes DEPTH
    × DURATION where `window_max_drawdown` reports only the single
    worst dip.  Every per-day drawdown is an exact integer micro
    share ((peak−x)·1e6 DIV peak); the RMS is one fixed-shape float
    over the exact integer square sum.  One running-max window over
    the date-span-bounded daily relation."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r57_ulcer_orders"
    )
    return spark.sql(_ULCER_CORE.format(orders="r57_ulcer_orders", idiv="DIV"))


_ULCER_DUCK = _ULCER_CORE.format(orders="orders", idiv="//")


QUERIES = {
    "ts_hurst_exponent": ts_hurst_exponent,
    "validate_drift_adversarial": validate_drift_adversarial,
    "window_ulcer_index": window_ulcer_index,
}

ORACLE = {
    "ts_hurst_exponent": _HURST_DUCK,
    "validate_drift_adversarial": _DRIFTAUC_DUCK,
    "window_ulcer_index": _ULCER_DUCK,
}
