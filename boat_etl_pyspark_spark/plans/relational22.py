"""Round-5 batch 4: resampling inference and changepoint detection
(SURVEY.md §2.9 aggregation family; no reference counterpart).

  * ``agg_bootstrap_ci_poisson`` — bootstrap confidence interval for
    mean customer spend via the POISSON bootstrap: each CUSTOMER's
    multiplicity in resample b is Poisson(1), drawn deterministically
    from md5(key, b), so resample-with-replacement becomes a map-side
    expression — the bootstrap that works when units are distributed
    and n is unknown upfront (the Bag of Little Bootstraps /
    streaming-bootstrap building block). Resampling whole customers,
    not orders, is also the statistically honest unit (orders within
    a customer are correlated — a cluster bootstrap). 60 resamples in
    ONE pass over the per-customer aggregate with no row
    multiplication; CI from the order statistics of a 60-row
    relation.
  * ``window_cusum_changepoint`` — CUSUM changepoint scan over each
    event type's daily volume: C_t = n·prefix_t − t·total stays in
    exact integers (no running mean), and the maximum |C_t| and its
    argmax day locate the level shift. Window work is bounded by
    (types × days) rows regardless of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from ..sources.readers import load_table
from .contract import money_rounded_sql

# ---------------------------------------------------------------------------
# Poisson bootstrap CI
# ---------------------------------------------------------------------------

# 60 resamples = 12 md5 evaluations per unit, each 128-bit digest
# feeding FIVE resamples (6 hex chars of uniform each), and NO row
# multiplication: the 60 multiplicities become 120 wide aggregate
# columns over the unexploded pass. Measured at sf0.1: naive
# per-(order,resample) explode 10.0s; digest-amortized explode 6.6s;
# this explosion-free cluster form ~2.0s warm — and at 100 TB the
# difference is a 60x fact blow-up that never happens.
_BOOT_PER_H = 5
_BOOT_J = 12
_BOOT_B = _BOOT_PER_H * _BOOT_J
# Poisson(1) inverse CDF over u = 6 hex chars / 16^6, as cumulative
# thresholds scaled to 16^6 = 16777216:
#   P(X<=0)=e^-1=0.36788, <=1: 0.73576, <=2: 0.91970, <=3: 0.98101,
#   <=4: 0.99634, <=5: 0.99941  (>=6 collapsed into 6 — the error is
#   ~1e-4 of one row's weight and identical in both engines)
_POIS_T = [6172840, 12345680, 15430100, 16458567, 16715718, 16767148]


def _pois_case(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"CASE {branches} ELSE 6 END"


def _boot_sql(orders: str, key_j: str, hex2int: str, big: str, div: str) -> str:
    """Build the bootstrap SQL for one engine.

    ``key_j`` formats the md5 input for digest-block ``j``; ``hex2int``
    turns 6 hex chars of digest column ``h{j}`` at 1-based offset
    ``off`` into a BIGINT. Everything else is engine-shared: 12 digest
    columns, 60 multiplicity columns (Poisson(1) inverse CDF), 120
    wide aggregates over the UNEXPLODED scan, then a 60-row unpivot
    (CASE over a resample-id relation) feeding the order-statistic CI.
    """
    hcols = ",\n         ".join(
        f"md5({key_j.format(j=j)}) AS h{j}" for j in range(_BOOT_J)
    )
    mcols = []
    for b in range(_BOOT_B):
        j, k = divmod(b, _BOOT_PER_H)
        u = hex2int.format(j=j, off=k * 6 + 1)
        mcols.append(f"{_pois_case(f'CAST({u} AS BIGINT)')} AS m{b}")
    aggs = ",\n         ".join(
        f"SUM(m{b}) AS n{b}, SUM(m{b} * CAST(cents AS {big})) AS s{b}"
        for b in range(_BOOT_B)
    )
    mu_case = " ".join(
        f"WHEN b = {b} THEN CAST(s{b} AS DOUBLE) / n{b}"
        for b in range(_BOOT_B)
    )
    n_case = " ".join(f"WHEN b = {b} THEN n{b}" for b in range(_BOOT_B))
    bvals = ", ".join(f"({b})" for b in range(_BOOT_B))
    mjoin = ",\n         ".join(mcols)
    return f"""
WITH r0 AS (
  -- bounded cents (round-10 layer 2): an absurd castable spend pushes
  -- the resample sums past 2^53, where the DECIMAL->DOUBLE and
  -- HUGEINT->DOUBLE conversions round a 1-ulp apart and the CI floor
  -- flips; a customer with no valid spend has no resample weight
  SELECT o_custkey,
         SUM({money_rounded_sql('o_totalprice')}) AS cents
  FROM {orders} GROUP BY o_custkey
), r AS (
  SELECT * FROM r0 WHERE cents IS NOT NULL
), h AS (
  SELECT cents,
         {hcols}
  FROM r
), m AS (
  SELECT cents,
         {mjoin}
  FROM h
), res AS (
  SELECT {aggs}
  FROM m
), bseq(b) AS (
  VALUES {bvals}
), means AS (
  SELECT b, CASE {mu_case} END AS mu
  FROM res CROSS JOIN bseq
  WHERE (CASE {n_case} END) > 0
), ranked AS (
  SELECT b, mu, ROW_NUMBER() OVER (ORDER BY mu, b) AS rk,
         COUNT(*) OVER () AS nb
  FROM means
)
SELECT CAST(MAX(nb) AS BIGINT) AS n_resamples,
       CAST(SUM(CAST(floor(mu) AS BIGINT)) {div} MAX(nb) AS BIGINT)
         AS boot_mean_cents,
       CAST(floor(MIN(CASE WHEN rk = greatest(nb * 5 {div} 100, 1)
                           THEN mu END)) AS BIGINT) AS ci_lo_cents,
       CAST(floor(MIN(CASE WHEN rk = least(nb * 95 {div} 100 + 1, nb)
                           THEN mu END)) AS BIGINT) AS ci_hi_cents
FROM ranked
"""


def agg_bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90% cluster-bootstrap CI for mean per-customer spend, 60
    Poisson(1) resamples over the customer aggregate. Multiplicities
    are deterministic hash expressions — one md5 per (customer,
    digest-block), five resamples carved from each 128-bit digest —
    and nothing is ever row-multiplied: the 60 resamples are 120 wide
    map-combined aggregate columns over one pass, and the CI comes
    from order statistics of the 60-row means relation. No RNG state,
    no seed drift between engines or executions — the properties that
    make a bootstrap viable inside a distributed, retry-happy
    pipeline."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r22_boot_orders"
    )
    return spark.sql(
        _boot_sql(
            orders="r22_boot_orders",
            key_j="concat(CAST(o_custkey AS STRING), ':', '{j}')",
            hex2int="conv(substr(h{j}, {off}, 6), 16, 10)",
            big="DECIMAL(38,0)",
            div="DIV",
        )
    )


_BOOT_DUCK = _boot_sql(
    orders="orders",
    key_j="CAST(o_custkey AS VARCHAR) || ':' || '{j}'",
    hex2int="('0x' || substr(h{j}, {off}, 6))",
    big="HUGEINT",
    div="//",
)


# ---------------------------------------------------------------------------
# CUSUM changepoint scan
# ---------------------------------------------------------------------------

_CUSUM_CORE = """
WITH daily AS (
  SELECT event_type, CAST({epoch_day} AS BIGINT) AS d, COUNT(*) AS x
  FROM {events}
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY event_type, {epoch_day}
), seq AS (
  SELECT event_type, d, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS t,
         SUM(x) OVER (PARTITION BY event_type ORDER BY d
                      ROWS UNBOUNDED PRECEDING) AS prefix,
         SUM(x) OVER (PARTITION BY event_type) AS total,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily
), c AS (
  SELECT event_type, d, n,
         n * prefix - t * total AS cusum_n
  FROM seq
), best AS (
  SELECT event_type, d, n, cusum_n,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY abs(cusum_n) DESC, d) AS rk
  FROM c
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       CAST(d AS BIGINT) AS changepoint_day,
       CAST(abs(cusum_n) AS BIGINT) AS max_abs_cusum_n,
       CAST(abs(cusum_n) * 1000 {div} n AS BIGINT) AS deviation_milli
FROM best WHERE rk = 1
"""


def window_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest CUSUM excursion of each event type's daily volume and
    the day it peaks — the classic level-shift locator. The statistic
    n·prefix_t − t·total is algebraically n·Σ(x_i − mean) kept in
    exact integers, so argmax ties and magnitudes are identical on
    every engine and parallelism; all windows ride one event_type
    exchange over the bounded daily rollup."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r22_cusum_events"
    )
    return spark.sql(
        _CUSUM_CORE.format(
            events="r22_cusum_events",
            epoch_day="CAST(unix_micros(ts) DIV 86400000000 AS BIGINT)",
            div="DIV",
        )
    )


_CUSUM_DUCK = _CUSUM_CORE.format(
    events="events",
    epoch_day="CAST(epoch_us(ts) // 86400000000 AS BIGINT)",
    div="//",
)


QUERIES = {
    "agg_bootstrap_ci_poisson": agg_bootstrap_ci_poisson,
    "window_cusum_changepoint": window_cusum_changepoint,
}

ORACLE = {
    "agg_bootstrap_ci_poisson": _BOOT_DUCK,
    "window_cusum_changepoint": _CUSUM_DUCK,
}
