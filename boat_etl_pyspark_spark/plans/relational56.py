"""Round-5 batch 43: RSI momentum indicator, expected calibration
error and an EWMA control chart (SURVEY.md §2.9 window/ml/
time-series families; no reference counterpart).

  * ``window_rsi_14`` — the 14-day relative strength index over
    daily order revenue.  With equal-length gain/loss windows the
    averages cancel, so RSI = 100·Σgain/(Σgain+Σloss) is PURE
    integer arithmetic — no float smoothing at all.
  * ``ml_calibration_ece`` — expected calibration error (the
    n_k-weighted mean |gap|) and max-ECE over the same ten bins as
    `ml_calibration_bins`: the two headline numbers a reliability
    diagram is summarized by, all exact integer division.
  * ``ts_ewma_control_chart`` — EWMA control chart (α=1/2, L=3)
    over daily event counts: the running EWMA is the bit-shift-
    exact integer construction of `window_ewma_spend` applied at
    every time point (a 62-lag banded self-join over the bounded
    daily relation, NOT a quadratic blow-up), and the control
    limits use the asymptotic EWMA σ·√(α/(2−α)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table
from .contract import money_rounded_sql, tpch_date_valid_sql

# ---------------------------------------------------------------------------
# RSI
# ---------------------------------------------------------------------------

_RSI_W = 14

_RSI_CORE = f"""
WITH daily AS (
  -- bounded cents + business-date validity (round-10 layer 2, same
  -- rationale as window_bollinger_bands)
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM({money_rounded_sql('o_totalprice')}) AS x
  FROM {{orders}} WHERE {tpch_date_valid_sql('o_orderdate')}
  GROUP BY CAST(o_orderdate AS DATE)
), diffs AS (
  SELECT d, x, x - LAG(x) OVER (ORDER BY d) AS dx
  FROM daily
), gl AS (
  SELECT d, x,
         CASE WHEN dx > 0 THEN dx ELSE 0 END AS gain,
         CASE WHEN dx < 0 THEN -dx ELSE 0 END AS loss,
         ROW_NUMBER() OVER (ORDER BY d) AS rn
  FROM diffs WHERE dx IS NOT NULL
), w AS (
  SELECT d, x, rn,
         SUM(gain) OVER win AS sg,
         SUM(loss) OVER win AS sl
  FROM gl
  WINDOW win AS (ORDER BY rn ROWS BETWEEN {_RSI_W - 1} PRECEDING
                 AND CURRENT ROW)
)
SELECT CAST(d AS {{datestr}}) AS day,
       CAST(x AS BIGINT) AS revenue_cents,
       CAST(sg AS BIGINT) AS gain_sum_cents,
       CAST(sl AS BIGINT) AS loss_sum_cents,
       CAST(CASE WHEN sg + sl > 0
                 THEN 100000 * sg {{idiv}} (sg + sl)
                 ELSE 50000 END AS BIGINT) AS rsi_milli
FROM w WHERE rn >= {_RSI_W}
ORDER BY day
"""


def window_rsi_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day RSI over daily order revenue: because the gain and
    loss windows have identical length, the Wilder averages cancel
    and RSI = 100·Σgain/(Σgain+Σloss) — entirely exact integer
    arithmetic (milli units; a flat 14-day window reports the
    neutral 50).  The daily relation is date-span-bounded, so the
    ordered windows run over bounded state after one map-combined
    date groupBy."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r56_rsi_orders"
    )
    return spark.sql(
        _RSI_CORE.format(orders="r56_rsi_orders", idiv="DIV",
                         datestr="STRING")
    )


_RSI_DUCK = _RSI_CORE.format(orders="orders", idiv="//", datestr="VARCHAR")

# ---------------------------------------------------------------------------
# Expected calibration error
# ---------------------------------------------------------------------------

# Value-domain bound (contract.VALUE_DOMAIN_SQL, pinned by
# tests/test_contract_hygiene.py): keeps the cents x2500 ppm product
# exact INT64 in both engines — DuckDB throws on BIGINT overflow where
# Spark wraps (round-8 probe).
_ECE_CORE = """
WITH v AS (
  SELECT least(TRY_CAST(round(value * 100) AS BIGINT) * 2500, 1000000)
           AS p_ppm,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM {events}
  WHERE value BETWEEN -1.0e12 AND 1.0e12  -- scan-pushdown half
    AND TRY_CAST(round(value * 100) AS BIGINT) IS NOT NULL
), b AS (
  SELECT least(p_ppm {idiv} 100000, 9) AS bin,
         COUNT(*) AS nk, SUM(p_ppm) AS sp, SUM(y) AS sy
  FROM v GROUP BY least(p_ppm {idiv} 100000, 9)
), gaps AS (
  SELECT bin, nk,
         abs(sp {idiv} nk - sy * 1000000 {idiv} nk) AS gap_ppm
  FROM b
)
SELECT CAST(SUM(nk) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(nk * gap_ppm) {idiv} SUM(nk) AS BIGINT) AS ece_ppm,
       CAST(MAX(gap_ppm) AS BIGINT) AS max_ece_ppm
FROM gaps
"""


def ml_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error over the same ten prediction bins
    as `ml_calibration_bins`: ECE = Σ n_k·|p̄_k − ō_k| / n plus the
    max-bin gap (max-ECE) — the two scalars a reliability diagram
    reduces to, all exact integer division (the per-bin gap uses the
    SAME integer-division means as the bins op, so the two queries
    are arithmetically consistent, not merely similar).  One
    conditional-aggregate scan, then ten rows."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r56_ece_events"
    )
    return spark.sql(_ECE_CORE.format(events="r56_ece_events", idiv="DIV"))


_ECE_DUCK = _ECE_CORE.format(events="events", idiv="//")

# ---------------------------------------------------------------------------
# EWMA control chart
# ---------------------------------------------------------------------------

_EWMA_MAXLAG = 62  # beyond 62 shifts a milli-scaled int64 term is 0

_EWMACC_CORE = f"""
WITH daily AS (
  SELECT {{epoch_us}} {{idiv}} 86400000000 AS d, COUNT(*) AS x
  FROM {{events}} WHERE ts IS NOT NULL
  GROUP BY {{epoch_us}} {{idiv}} 86400000000
), idx AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily
), stats AS (
  SELECT COUNT(*) AS n, SUM(x) AS s1,
         SUM(CAST(x AS DECIMAL(38,0)) * x) AS s2
  FROM idx
), ew AS (
  SELECT a.i, a.x,
         SUM(CASE WHEN b.i > 1 THEN {{shr}} ELSE 0 END) AS tail_sum,
         SUM(CASE WHEN b.i = 1 AND a.i - 1 <= {_EWMA_MAXLAG}
                  THEN {{shr_init}} ELSE 0 END) AS init_term
  FROM idx a
  JOIN idx b ON b.i <= a.i AND b.i > a.i - {_EWMA_MAXLAG}
  GROUP BY a.i, a.x
), lim AS (
  SELECT CAST(floor((CAST(s1 AS DOUBLE) / n
                     + 3 * sqrt((CAST(s2 AS DOUBLE) * n
                                 - CAST(s1 AS DOUBLE) * s1)
                                / (CAST(n AS DOUBLE) * n)
                                / 3.0))
                    * 1000) AS BIGINT) AS upper_milli,
         CAST(floor((CAST(s1 AS DOUBLE) / n
                     - 3 * sqrt((CAST(s2 AS DOUBLE) * n
                                 - CAST(s1 AS DOUBLE) * s1)
                                / (CAST(n AS DOUBLE) * n)
                                / 3.0))
                    * 1000) AS BIGINT) AS lower_milli
  FROM stats
)
SELECT CAST(i AS BIGINT) AS day_idx,
       CAST(x AS BIGINT) AS n_events,
       CAST(tail_sum + init_term AS BIGINT) AS ewma_milli,
       upper_milli, lower_milli,
       CAST(CASE WHEN tail_sum + init_term > upper_milli THEN 1
                 WHEN tail_sum + init_term < lower_milli THEN -1
                 ELSE 0 END AS BIGINT) AS out_of_control
FROM ew CROSS JOIN lim
ORDER BY day_idx
"""


def ts_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (α=1/2, L=3) over daily event counts: the
    running EWMA at every day is the bit-shift-exact integer
    construction of `window_ewma_spend` — z_t = Σ x_s·2^(t−s+1 shifts)
    with the first observation carrying the residual weight — built
    by a 62-lag BANDED self-join over the date-span-bounded daily
    relation (terms beyond 62 shifts are integer zero, so the band
    is exact, not an approximation).  Control limits use the
    asymptotic EWMA deviation σ·√(α/(2−α)) = σ/√3 from exact power
    sums; the -1/0/+1 flag compares integers against the floored
    limits."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r56_ewcc_events"
    )
    return spark.sql(
        _EWMACC_CORE.format(
            events="r56_ewcc_events",
            epoch_us="unix_micros(ts)",
            idiv="DIV",
            shr="shiftright(b.x * 1000, CAST(a.i - b.i + 1 AS INT))",
            shr_init="shiftright(b.x * 1000, CAST(a.i - 1 AS INT))",
        )
    )


_EWMACC_DUCK = _EWMACC_CORE.format(
    events="events",
    epoch_us="epoch_us(ts)",
    idiv="//",
    shr="((b.x * 1000) >> CAST(a.i - b.i + 1 AS INT))",
    shr_init="((b.x * 1000) >> CAST(a.i - 1 AS INT))",
)


QUERIES = {
    "window_rsi_14": window_rsi_14,
    "ml_calibration_ece": ml_calibration_ece,
    "ts_ewma_control_chart": ts_ewma_control_chart,
}

ORACLE = {
    "window_rsi_14": _RSI_DUCK,
    "ml_calibration_ece": _ECE_DUCK,
    "ts_ewma_control_chart": _EWMACC_DUCK,
}
