"""Round-5 batch 40: rolling volatility bands, ecological diversity
indices, arrival burstiness, a portmanteau autocorrelation test,
forecast-error metrics and graph reciprocity (SURVEY.md §2.9
window/aggregation/events/time-series/ml/graph families; no
reference counterpart).

  * ``window_bollinger_bands`` — 7-day rolling mean ± 2σ bands over
    the daily order-revenue series with outside-band flags.  The
    rolling power sums are exact integers (window frame sums); only
    σ is one fixed-shape float per row.
  * ``agg_diversity_indices`` — richness, Shannon entropy and the
    exact-rational Simpson concentration of part types bought per
    region: the 'how concentrated is this segment' triple every
    mixture report needs.  Simpson is pure integer arithmetic;
    Shannon per-term floors before the integer sum.
  * ``events_burstiness`` — the burstiness coefficient
    B = (σ−μ)/(σ+μ) of per-user interarrivals plus the Fano factor
    of hourly counts: the two standard 'is this traffic Poisson or
    bursty' numbers, from exact integer power sums.
  * ``agg_ljung_box`` — Ljung–Box Q over lags 1..7 of the daily
    event-count series.  Each autocorrelation is an exact integer
    rational (mean-centering expanded to scaled integer sums); the
    per-lag contributions floor to micro units BEFORE the integer
    sum, so Q is order-immune.
  * ``ml_forecast_error_eval`` — MAE / sMAPE / RMSE of the naive-1
    and seasonal-naive-7 forecasters on daily order counts: the
    baseline every forecasting model must beat, with the integer
    sMAPE definition documented in the column name.
  * ``graph_reciprocity`` — weighted and unweighted reciprocity of
    the directed nation trade graph (how much flow comes back):
    Σ min(w_ij, w_ji) / Σ w_ij in exact integers over the
    session-shared edge cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table
from .contract import money_rounded_sql, tpch_date_valid_sql

# ---------------------------------------------------------------------------
# Bollinger bands
# ---------------------------------------------------------------------------

_BOLL_WIN = 7  # trailing days, ROWS frame

_BOLL_CORE = f"""
WITH daily AS (
  -- bounded cents + business-date validity (round-10 layer 2): a
  -- NULL date has no position on the day axis (engine NULL ordering
  -- differs, shifting every ROWS frame), and unbounded cents let a
  -- castable absurd value wrap Spark's SUM where DuckDB widens
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM({money_rounded_sql('o_totalprice')}) AS x
  FROM {{orders}} WHERE {tpch_date_valid_sql('o_orderdate')}
  GROUP BY CAST(o_orderdate AS DATE)
), w AS (
  SELECT d, x,
         COUNT(*) OVER win AS n,
         SUM(x) OVER win AS s1,
         SUM(CAST(x AS DECIMAL(38,0)) * x) OVER win AS s2
  FROM daily
  WINDOW win AS (ORDER BY d ROWS BETWEEN {_BOLL_WIN - 1} PRECEDING
                 AND CURRENT ROW)
), bands AS (
  SELECT d, x, n, s1 {{idiv}} n AS mean_cents,
         CAST(floor(sqrt((CAST(s2 AS DOUBLE) * n
                          - CAST(s1 AS DOUBLE) * s1)
                         / (CAST(n AS DOUBLE) * n))) AS BIGINT) AS sd_cents
  FROM w WHERE n = {_BOLL_WIN}
)
SELECT CAST(d AS {{datestr}}) AS day,
       CAST(x AS BIGINT) AS revenue_cents,
       CAST(mean_cents AS BIGINT) AS mean_cents,
       sd_cents,
       CAST(mean_cents + 2 * sd_cents AS BIGINT) AS upper_cents,
       CAST(mean_cents - 2 * sd_cents AS BIGINT) AS lower_cents,
       CAST(CASE WHEN x > mean_cents + 2 * sd_cents THEN 1
                 WHEN x < mean_cents - 2 * sd_cents THEN -1
                 ELSE 0 END AS BIGINT) AS outside_band
FROM bands
ORDER BY day
"""


def window_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing Bollinger bands over daily order revenue:
    rolling mean and population σ from exact integer frame sums
    (DECIMAL for the squares), bands at ±2σ, and a -1/0/+1
    outside-band flag per day.  The daily relation is bounded by the
    date span (~2.4k rows at any TPC-H scale), so the single-
    partition ordered window is bounded state, and the heavy
    aggregation below it is one map-combined date groupBy."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r53_boll_orders"
    )
    return spark.sql(
        _BOLL_CORE.format(
            orders="r53_boll_orders", idiv="DIV", datestr="STRING"
        )
    )


_BOLL_DUCK = _BOLL_CORE.format(orders="orders", idiv="//", datestr="VARCHAR")

# ---------------------------------------------------------------------------
# Diversity indices
# ---------------------------------------------------------------------------

_DIV_CORE = """
WITH bought AS (
  SELECT r.r_name AS region, p.p_type AS t, COUNT(*) AS c
  FROM {lineitem} l
  JOIN {part} p ON p.p_partkey = l.l_partkey
  JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
  JOIN {nation} n ON n.n_nationkey = s.s_nationkey
  JOIN {region} r ON r.r_regionkey = n.n_regionkey
  GROUP BY r.r_name, p.p_type
), tot AS (
  SELECT region, SUM(c) AS nn FROM bought GROUP BY region
), shannon AS (
  SELECT b.region,
         SUM(CAST(floor(b.c * ln(CAST(t.nn AS DOUBLE) / b.c) * 1000000)
                  AS BIGINT)) AS sh_num,
         SUM(b.c * (b.c - 1)) AS simp_num,
         COUNT(*) AS richness
  FROM bought b JOIN tot t ON t.region = b.region
  GROUP BY b.region
)
SELECT s.region AS region,
       CAST(t.nn AS BIGINT) AS n_items,
       CAST(s.richness AS BIGINT) AS richness,
       CAST(s.sh_num {idiv} t.nn AS BIGINT) AS shannon_micro_nats,
       CAST(1000000 * s.simp_num {idiv} (t.nn * (t.nn - 1)) AS BIGINT)
         AS simpson_concentration_ppm,
       CAST(1000000 - 1000000 * s.simp_num {idiv} (t.nn * (t.nn - 1))
            AS BIGINT) AS simpson_diversity_ppm
FROM shannon s JOIN tot t ON t.region = s.region
ORDER BY region
"""


def agg_diversity_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Richness, Shannon entropy and Simpson concentration of part
    types bought per region.  Simpson λ = Σn_i(n_i−1)/N(N−1) is an
    exact integer rational (ppm integer division); Shannon floors
    each c·ln(N/c) term — one ln of an exact rational — to micro
    units before the integer sum, so H is order-immune.  One fact
    join pass (dimensions broadcast) into a (region, type) groupBy;
    everything after is category-count-sized."""
    for t in ("lineitem", "part", "supplier", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"r53_div_{t}")
    return spark.sql(
        _DIV_CORE.format(
            lineitem="r53_div_lineitem", part="r53_div_part",
            supplier="r53_div_supplier", nation="r53_div_nation",
            region="r53_div_region", idiv="DIV",
        )
    )


_DIV_DUCK = _DIV_CORE.format(
    lineitem="lineitem", part="part", supplier="supplier",
    nation="nation", region="region", idiv="//",
)

# ---------------------------------------------------------------------------
# Burstiness + Fano factor
# ---------------------------------------------------------------------------

_BURST_CORE = """
WITH ts AS (
  SELECT user_id, {ts_us} AS t_us, event_id FROM {events}
), dt AS (
  SELECT t_us - LAG(t_us) OVER (PARTITION BY user_id
                                ORDER BY t_us, event_id) AS dt_us
  FROM ts
), ds AS (
  SELECT COUNT(*) AS n, SUM(dt_us) AS s1,
         SUM(CAST(dt_us AS DECIMAL(38,0)) * dt_us) AS s2
  FROM dt WHERE dt_us IS NOT NULL
), hourly AS (
  SELECT t_us {idiv} 3600000000 AS h, COUNT(*) AS c
  FROM ts GROUP BY t_us {idiv} 3600000000
), hs AS (
  SELECT COUNT(*) AS hn, SUM(c) AS hs1,
         SUM(CAST(c AS DECIMAL(38,0)) * c) AS hs2
  FROM hourly
)
SELECT CAST(ds.n AS BIGINT) AS n_intervals,
       CAST(ds.s1 {idiv} ds.n AS BIGINT) AS mean_dt_us,
       CAST(floor((sqrt((CAST(ds.s2 AS DOUBLE) * ds.n
                         - CAST(ds.s1 AS DOUBLE) * ds.s1))
                     / ds.n
                   - CAST(ds.s1 AS DOUBLE) / ds.n)
                  / (sqrt((CAST(ds.s2 AS DOUBLE) * ds.n
                           - CAST(ds.s1 AS DOUBLE) * ds.s1))
                       / ds.n
                     + CAST(ds.s1 AS DOUBLE) / ds.n)
                  * 1000) AS BIGINT) AS burstiness_milli,
       CAST(hs.hn AS BIGINT) AS n_hours,
       CAST(floor((CAST(hs.hs2 AS DOUBLE) * hs.hn
                   - CAST(hs.hs1 AS DOUBLE) * hs.hs1)
                  / (CAST(hs.hn AS DOUBLE) - 1) / hs.hn
                  / (CAST(hs.hs1 AS DOUBLE) / hs.hn)
                  * 1000) AS BIGINT) AS fano_milli
FROM ds CROSS JOIN hs
"""


def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness coefficient B = (σ−μ)/(σ+μ) of per-user event
    interarrivals (B→−1 periodic, 0 Poisson, →1 bursty) next to the
    Fano factor (variance/mean) of hourly event counts — the two
    standard traffic-shape diagnostics, both from exact integer
    power sums with one fixed-shape float each.  The interarrival
    window partitions by user; the hourly histogram is bounded by
    the observation span."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r53_burst_events"
    )
    return spark.sql(
        _BURST_CORE.format(
            events="r53_burst_events", ts_us="unix_micros(ts)", idiv="DIV"
        )
    )


_BURST_DUCK = _BURST_CORE.format(
    events="events", ts_us="epoch_us(ts)", idiv="//"
)

# ---------------------------------------------------------------------------
# Ljung-Box portmanteau test
# ---------------------------------------------------------------------------

_LB_LAGS = 7

_LB_CORE = f"""
WITH daily AS (
  SELECT {{epoch_us}} {{idiv}} 86400000000 AS d, COUNT(*) AS x
  FROM {{events}} WHERE ts IS NOT NULL
  GROUP BY {{epoch_us}} {{idiv}} 86400000000
), idx AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY d) AS i,
         COUNT(*) OVER () AS n, SUM(x) OVER () AS sx,
         SUM(CAST(x AS DECIMAL(38,0)) * x) OVER () AS sxx
  FROM daily
), lagk AS (
  SELECT a.n, a.sx, a.sxx, k.k,
         COUNT(*) AS nk,
         SUM(CAST(a.x AS DECIMAL(38,0)) * b.x) AS sxy,
         SUM(a.x) AS sa, SUM(b.x) AS sb
  FROM idx a
  JOIN ({{lags}}) k ON 1 = 1
  JOIN idx b ON b.i = a.i - k.k
  GROUP BY a.n, a.sx, a.sxx, k.k
), rk AS (
  SELECT k, n,
         (CAST(n AS DOUBLE) * n * CAST(sxy AS DOUBLE)
          - CAST(n AS DOUBLE) * sx * (CAST(sa AS DOUBLE) + sb)
          + (CAST(n AS DOUBLE) - k) * CAST(sx AS DOUBLE) * sx)
         / (CAST(n AS DOUBLE) * n * CAST(sxx AS DOUBLE)
            - CAST(n AS DOUBLE) * CAST(sx AS DOUBLE) * sx) AS r
  FROM lagk
), terms AS (
  SELECT k, n, CAST(floor(r * 1000000) AS BIGINT) AS rk_micro,
         CAST(floor(r * r / (n - k) * 1000000000) AS BIGINT) AS q_term_nano
  FROM rk
)
SELECT CAST(MAX(n) AS BIGINT) AS n_days,
       CAST({_LB_LAGS} AS BIGINT) AS n_lags,
       CAST(MAX(CASE WHEN k = 1 THEN rk_micro END) AS BIGINT) AS r1_micro,
       CAST(MAX(CASE WHEN k = 7 THEN rk_micro END) AS BIGINT) AS r7_micro,
       CAST(MAX(n) * (MAX(n) + 2) * SUM(q_term_nano)
            {{idiv}} 1000000 AS BIGINT) AS lb_q_milli
FROM terms
"""


def agg_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box Q over lags 1..7 of the daily event-count series:
    each autocorrelation r_k is an exact integer rational (the mean-
    centering is expanded to n²-scaled integer sums so no running
    float mean exists), evaluated as one fixed-shape float; the
    per-lag r²/(n−k) contributions floor to nano units BEFORE the
    integer sum, so Q is summation-order-immune.  The daily relation
    is bounded by the date span; the k-lag self-join is 7× that
    bounded size."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r53_lb_events"
    )
    lags = " UNION ALL ".join(
        f"SELECT {k} AS k" for k in range(1, _LB_LAGS + 1)
    )
    return spark.sql(
        _LB_CORE.format(
            events="r53_lb_events", epoch_us="unix_micros(ts)",
            idiv="DIV", lags=lags,
        )
    )


_LB_DUCK = _LB_CORE.format(
    events="events", epoch_us="epoch_us(ts)", idiv="//",
    lags=" UNION ALL ".join(
        f"SELECT {k} AS k" for k in range(1, _LB_LAGS + 1)
    ),
)

# ---------------------------------------------------------------------------
# Forecast error metrics
# ---------------------------------------------------------------------------

_FCERR_CORE = """
WITH daily AS (
  -- business-date validity (round-10 layer 2, caught by the sf0.01
  -- hostile sweep): a NULL/out-of-window day shifts the indexed
  -- series in one engine only (same class as ts_hurst_exponent)
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS y
  FROM {orders} WHERE """ + tpch_date_valid_sql("o_orderdate") + """
  GROUP BY CAST(o_orderdate AS DATE)
), idx AS (
  SELECT y, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily
), preds AS (
  SELECT 'naive_1' AS model, a.y, b.y AS yhat
  FROM idx a JOIN idx b ON b.i = a.i - 1
  UNION ALL
  SELECT 'seasonal_naive_7' AS model, a.y, b.y AS yhat
  FROM idx a JOIN idx b ON b.i = a.i - 7
), err AS (
  SELECT model, y, yhat, abs(y - yhat) AS ae,
         2000 * abs(y - yhat) {idiv} (y + yhat) AS smape_row_milli
  FROM preds
)
SELECT model,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(1000 * SUM(ae) {idiv} COUNT(*) AS BIGINT) AS mae_milli,
       CAST(SUM(smape_row_milli) {idiv} COUNT(*) AS BIGINT)
         AS smape_milli_intdef,
       CAST(floor(sqrt(CAST(SUM(CAST(ae AS DECIMAL(38,0)) * ae)
                            AS DOUBLE) / COUNT(*)) * 1000) AS BIGINT)
         AS rmse_milli
FROM err
GROUP BY model
ORDER BY model
"""


def ml_forecast_error_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAE, sMAPE and RMSE of the two baselines every forecaster
    must beat — naive-1 (yesterday) and seasonal-naive-7 (same
    weekday last week) — on daily order counts.  MAE and the
    integer-defined sMAPE (per-row 2000|e|/(y+ŷ) via integer
    division, as the column name says) are pure integers; RMSE is
    one fixed-shape float.  The daily relation is date-span-bounded,
    so the lag self-joins are bounded work after one map-combined
    groupBy."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r53_fc_orders"
    )
    return spark.sql(_FCERR_CORE.format(orders="r53_fc_orders", idiv="DIV"))


_FCERR_DUCK = _FCERR_CORE.format(orders="orders", idiv="//")

# ---------------------------------------------------------------------------
# Graph reciprocity
# ---------------------------------------------------------------------------

_RECIP_CORE = """
WITH e AS (
  SELECT src, dst, w FROM {edges} WHERE src != dst
), m AS (
  SELECT a.src, a.dst, a.w, COALESCE(b.w, 0) AS w_rev
  FROM e a LEFT JOIN e b ON b.src = a.dst AND b.dst = a.src
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_directed_edges,
       CAST(SUM(CASE WHEN w_rev > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_reciprocated,
       CAST(1000000 * SUM(CASE WHEN w_rev > 0 THEN 1 ELSE 0 END)
            {idiv} COUNT(*) AS BIGINT) AS edge_reciprocity_ppm,
       CAST(SUM(w) AS BIGINT) AS total_weight,
       CAST(SUM(CASE WHEN w < w_rev THEN w ELSE w_rev END) AS BIGINT)
         AS reciprocated_weight,
       CAST(1000000 * SUM(CASE WHEN w < w_rev THEN w ELSE w_rev END)
            {idiv} SUM(w) AS BIGINT) AS weight_reciprocity_ppm
FROM m
"""


def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted and unweighted reciprocity of the directed nation
    trade graph: what fraction of edges (and of flow,
    Σ min(w_ij, w_ji)/Σ w_ij) comes back the other way.  Exact
    integer arithmetic over the session-shared nations²-sized
    ``trade_edges`` cache — one self-join on the reversed pair,
    self-loops excluded."""
    from .relational7 import trade_edges_cached

    trade_edges_cached(spark, sf_dir).createOrReplaceTempView(
        "r53_recip_edges"
    )
    return spark.sql(_RECIP_CORE.format(edges="r53_recip_edges", idiv="DIV"))


_RECIP_DUCK = (
    """
WITH trade_edges AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY s.s_nationkey, c.c_nationkey
)"""
    + _RECIP_CORE.replace("WITH e AS (", ", e AS (", 1).format(
        edges="trade_edges", idiv="//"
    )
)


QUERIES = {
    "window_bollinger_bands": window_bollinger_bands,
    "agg_diversity_indices": agg_diversity_indices,
    "events_burstiness": events_burstiness,
    "agg_ljung_box": agg_ljung_box,
    "ml_forecast_error_eval": ml_forecast_error_eval,
    "graph_reciprocity": graph_reciprocity,
}

ORACLE = {
    "window_bollinger_bands": _BOLL_DUCK,
    "agg_diversity_indices": _DIV_DUCK,
    "events_burstiness": _BURST_DUCK,
    "agg_ljung_box": _LB_DUCK,
    "ml_forecast_error_eval": _FCERR_DUCK,
    "graph_reciprocity": _RECIP_DUCK,
}
