"""Round-4 batch 7: closed-form statistics the warehouse surface was
still missing (SURVEY.md §2.9 aggregation/window families; no
reference counterpart — the reference's only statistics are group
averages, ``src/pipeline_pyspark.py:327-333``).

  * ``agg_linear_regression`` — per-group OLS (slope / intercept /
    R^2) from the five classical power sums, accumulated EXACTLY:
    per-row products fit BIGINT, the sums are carried in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so nothing overflows at
    any scale (1e12 rows keeps every moment < 1e33), and the one
    double division per statistic happens once at the end. The
    map-side-combined aggregate is the whole job: regression at
    100 TB is exactly as cheap as a COUNT(*).
  * ``agg_benford_profile`` — leading-digit distribution of order
    totals vs the Benford expectation, deviations in integer ppm.
    The anomaly-screening classic; one aggregate + a 9-row window.
  * ``window_ewma_spend`` — exponentially-weighted moving average of
    per-customer order values, alpha = 1/2, computed with BIT SHIFTS:
    the (1/2)^k weights make every term an exact integer
    (``cents*1000 >> k``), so the EWMA is order-independent and
    engine-exact — no ``pow()``, whose 1-ulp licence would break
    oracle parity at the floor boundary. One window over the
    customer exchange, then a re-aggregate on the same key.
  * ``events_ab_test_lift`` — deterministic hash-split A/B readout:
    per-variant exposed users, converters, conversion ppm and lift
    vs the other arm. Two aggregates (user grain, then 2-row variant
    grain) — the distributed experiment-analysis shape.
  * ``embed_pca_power`` — top principal direction of the quantized
    embedding gram matrix by THREE fixed power iterations, entirely
    as DataFrame joins: the corpus-sized work is the one distributed
    X^T X pass (reused from ``embed_gram_matrix``, the Spark-MLlib
    RowMatrix shape); each iteration is a matvec on the 16x16
    broadcast-sized matrix with integer renormalization (max-abs
    scale 1000), so every intermediate is deterministic. Output: the
    scaled eigenvector plus its Rayleigh quotient in micro units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table
from . import mlprep
from .contract import (
    EMB_VALID_DUCK,
    money_rounded_sql,
    qty_scaled_sql,
    tpch_date_valid_sql,
)

# ---------------------------------------------------------------------------
# Per-group OLS
# ---------------------------------------------------------------------------

_OLS_SPARK = f"""
WITH pts AS (
  SELECT grp, x, y FROM (
    SELECT l_returnflag AS grp,
           {qty_scaled_sql('l_quantity', 1)} AS x,
           {money_rounded_sql('l_extendedprice')} AS y
    FROM {{lineitem}}
  ) WHERE x IS NOT NULL AND y IS NOT NULL
), sums AS (
  SELECT grp,
         COUNT(*) AS n,
         SUM(x) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
  FROM pts GROUP BY grp
), mom AS (
  SELECT grp, n, sx, sy,
         CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS num,
         CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx
           AS den,
         CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS deny
  FROM sums
)
SELECT grp,
       CAST(n AS BIGINT) AS n,
       CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6)
            AS BIGINT) AS slope_micro_cents,
       CAST(floor((CAST(sy AS DOUBLE)
                   - CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                     * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) * 1e3)
            AS BIGINT) AS intercept_milli_cents,
       CAST(floor(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
                  / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)) * 1e6)
            AS BIGINT) AS r2_micro
FROM mom
"""

_OLS_DUCK = f"""
WITH pts AS (
  SELECT grp, x, y FROM (
    SELECT l_returnflag AS grp,
           {qty_scaled_sql('l_quantity', 1)} AS x,
           {money_rounded_sql('l_extendedprice')} AS y
    FROM lineitem
  ) WHERE x IS NOT NULL AND y IS NOT NULL
), sums AS (
  SELECT grp,
         COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM pts GROUP BY grp
), mom AS (
  SELECT grp, n, sx, sy,
         CAST(n AS HUGEINT) * sxy - sx * sy AS num,
         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den,
         CAST(n AS HUGEINT) * syy - sy * sy AS deny
  FROM sums
)
SELECT grp,
       CAST(n AS BIGINT) AS n,
       CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6)
            AS BIGINT) AS slope_micro_cents,
       CAST(floor((CAST(sy AS DOUBLE)
                   - CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                     * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) * 1e3)
            AS BIGINT) AS intercept_milli_cents,
       CAST(floor(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
                  / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)) * 1e6)
            AS BIGINT) AS r2_micro
FROM mom
"""


def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS of extendedprice (cents) on quantity per returnflag, from
    exact integer power sums. Single map-side-combined aggregate; the
    per-group finish is pure scalar math. Slope in micro-cents per
    unit, intercept in milli-cents, R^2 in micro units."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "r15_ols_lineitem"
    )
    return spark.sql(_OLS_SPARK.format(lineitem="r15_ols_lineitem"))


# ---------------------------------------------------------------------------
# Benford leading-digit profile
# ---------------------------------------------------------------------------

_BENFORD_SPARK = f"""
WITH digits AS (
  SELECT CAST(substring(CAST(abs(v) AS STRING), 1, 1) AS INT) AS digit
  FROM (
    SELECT {money_rounded_sql('o_totalprice')} AS v FROM {{orders}}
  ) WHERE v IS NOT NULL AND v <> 0
), counts AS (
  SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit
), tot AS (
  SELECT digit, n, SUM(n) OVER () AS total FROM counts
)
SELECT digit,
       CAST(n AS BIGINT) AS n,
       CAST(1000000 * n DIV total AS BIGINT) AS observed_ppm,
       CAST(floor(log10(1 + CAST(1 AS DOUBLE) / digit) * 1e6) AS BIGINT)
         AS expected_ppm,
       CAST(abs(1000000 * n DIV total
                - CAST(floor(log10(1 + CAST(1 AS DOUBLE) / digit) * 1e6)
                       AS BIGINT)) AS BIGINT) AS deviation_ppm
FROM tot
"""

_BENFORD_DUCK = f"""
WITH digits AS (
  SELECT CAST(substring(CAST(abs(v) AS VARCHAR), 1, 1) AS INT) AS digit
  FROM (
    SELECT {money_rounded_sql('o_totalprice')} AS v FROM orders
  ) WHERE v IS NOT NULL AND v <> 0
), counts AS (
  SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit
), tot AS (
  SELECT digit, n, SUM(n) OVER () AS total FROM counts
)
SELECT digit,
       CAST(n AS BIGINT) AS n,
       CAST(1000000 * n // total AS BIGINT) AS observed_ppm,
       CAST(floor(log10(1 + CAST(1 AS DOUBLE) / digit) * 1e6) AS BIGINT)
         AS expected_ppm,
       CAST(abs(1000000 * n // total
                - CAST(floor(log10(1 + CAST(1 AS DOUBLE) / digit) * 1e6)
                       AS BIGINT)) AS BIGINT) AS deviation_ppm
FROM tot
"""


def agg_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution of order totals against Benford's
    law, integer ppm. One aggregate to 9 rows, then a 9-row window —
    the fraud/anomaly screen at any scale for the cost of a count."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r15_benford_orders"
    )
    return spark.sql(_BENFORD_SPARK.format(orders="r15_benford_orders"))


# ---------------------------------------------------------------------------
# Shift-exact EWMA
# ---------------------------------------------------------------------------

_EWMA_SPARK = f"""
WITH seq AS (
  SELECT o_custkey,
         {money_rounded_sql('o_totalprice')} * 1000 AS m,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n
  FROM {{orders}} WHERE {tpch_date_valid_sql('o_orderdate')}
), terms AS (
  SELECT o_custkey, n,
         CASE WHEN (CASE WHEN rn = 1 THEN n - 1 ELSE n - rn + 1 END) > 62
              THEN CAST(0 AS BIGINT)
              ELSE shiftright(m, CAST(CASE WHEN rn = 1 THEN n - 1
                                           ELSE n - rn + 1 END AS INT))
         END AS term
  FROM seq
)
SELECT o_custkey,
       CAST(max(n) AS BIGINT) AS n_orders,
       CAST(SUM(term) AS BIGINT) AS ewma_milli_cents
FROM terms
GROUP BY o_custkey
"""

_EWMA_DUCK = f"""
WITH seq AS (
  SELECT o_custkey,
         {money_rounded_sql('o_totalprice')} * 1000 AS m,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n
  FROM orders WHERE {tpch_date_valid_sql('o_orderdate')}
), terms AS (
  SELECT o_custkey, n,
         CASE WHEN (CASE WHEN rn = 1 THEN n - 1 ELSE n - rn + 1 END) > 62
              THEN CAST(0 AS BIGINT)
              ELSE m >> CAST(CASE WHEN rn = 1 THEN n - 1
                                  ELSE n - rn + 1 END AS INT)
         END AS term
  FROM seq
)
SELECT o_custkey,
       CAST(max(n) AS BIGINT) AS n_orders,
       CAST(SUM(term) AS BIGINT) AS ewma_milli_cents
FROM terms
GROUP BY o_custkey
"""


def window_ewma_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer EWMA (alpha = 1/2) of order totals in date order.
    The alpha choice makes every weight a power of two, so each term
    is an exact ``>> k`` of milli-cents and the sum is associative —
    the only way a windowed EWMA survives an order-insensitive exact
    compare. One exchange on o_custkey serves both the window and the
    final groupBy (same key: Catalyst reuses the partitioning)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r15_ewma_orders"
    )
    return spark.sql(_EWMA_SPARK.format(orders="r15_ewma_orders"))


# ---------------------------------------------------------------------------
# A/B test lift
# ---------------------------------------------------------------------------

_AB_SPARK = """
WITH users AS (
  SELECT user_id,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM {events}
  GROUP BY user_id
), arms AS (
  SELECT variant,
         COUNT(*) AS n_users,
         SUM(converted) AS n_conv,
         CAST(1000000 * SUM(converted) DIV COUNT(*) AS BIGINT) AS conv_ppm
  FROM users GROUP BY variant
)
SELECT variant,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_conv AS BIGINT) AS n_conv,
       conv_ppm,
       CAST(conv_ppm - (SUM(conv_ppm) OVER () - conv_ppm) AS BIGINT)
         AS lift_vs_other_ppm
FROM arms
"""

_AB_DUCK = """
WITH users AS (
  SELECT user_id,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events
  GROUP BY user_id
), arms AS (
  SELECT variant,
         COUNT(*) AS n_users,
         CAST(SUM(converted) AS BIGINT) AS n_conv,
         CAST(1000000 * SUM(converted) // COUNT(*) AS BIGINT) AS conv_ppm
  FROM users GROUP BY variant
)
SELECT variant,
       CAST(n_users AS BIGINT) AS n_users,
       n_conv,
       conv_ppm,
       CAST(conv_ppm - (SUM(conv_ppm) OVER () - conv_ppm) AS BIGINT)
         AS lift_vs_other_ppm
FROM arms
"""


def events_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-split A/B conversion readout: user grain first (one
    exchange on user_id), then the 2-row variant aggregate and a
    2-row window for the lift column. Deterministic assignment
    (user_id parity) stands in for the production bucketing hash."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r15_ab_events"
    )
    return spark.sql(_AB_SPARK.format(events="r15_ab_events"))


# ---------------------------------------------------------------------------
# PCA top component by power iteration
# ---------------------------------------------------------------------------

_PCA_ITER_SPARK = """
WITH m AS (
  SELECT i, j, gram FROM {gram}
  UNION ALL
  SELECT j AS i, i AS j, gram FROM {gram} WHERE i != j
), v0 AS (
  SELECT i AS j, CAST(1000 AS BIGINT) AS v
  FROM (SELECT DISTINCT i FROM {gram})
), {iters}
SELECT v3.j AS dim,
       v3.v AS v_scaled,
       CAST(floor(CAST(ray.vgv AS DOUBLE) / CAST(ray.vv AS DOUBLE) * 1e6)
            AS BIGINT) AS rayleigh_micro
FROM v3
CROSS JOIN (
  SELECT SUM(y.gv * v3b.v) AS vgv, SUM(v3b.v * v3b.v) AS vv
  FROM (SELECT m.i, SUM(m.gram * v3a.v) AS gv
        FROM m JOIN v3 v3a ON m.j = v3a.j GROUP BY m.i) y
  JOIN v3 v3b ON y.i = v3b.j
) ray
"""


def _iter_cte(k: int) -> str:
    prev = f"v{k - 1}"
    return (
        f"g{k} AS (\n"
        f"  SELECT m.i AS j, SUM(m.gram * {prev}.v) AS gv\n"
        f"  FROM m JOIN {prev} ON m.j = {prev}.j GROUP BY m.i\n"
        f"), v{k} AS (\n"
        f"  SELECT j, CAST(floor(CAST(gv AS DOUBLE) * 1000\n"
        f"                       / max(abs(gv)) OVER ()) AS BIGINT) AS v\n"
        f"  FROM g{k}\n"
        f")"
    )


_PCA_ITERS = ",\n".join(_iter_cte(k) for k in (1, 2, 3))

_PCA_DUCK = f"""
WITH q AS (
  SELECT list_transform(embedding[1:16],
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
    AS qv
  FROM embeddings
  WHERE {EMB_VALID_DUCK}
), tri AS (
  SELECT i - 1 AS i, j - 1 AS j,
         CAST(SUM(CAST(qv[i] AS HUGEINT) * qv[j]) AS BIGINT) AS gram
  FROM q, UNNEST(range(1, 17)) AS a(i), UNNEST(range(1, 17)) AS b(j)
  WHERE j >= i
  GROUP BY i, j
), m AS (
  SELECT i, j, gram FROM tri
  UNION ALL
  SELECT j AS i, i AS j, gram FROM tri WHERE i != j
), v0 AS (
  SELECT i AS j, CAST(1000 AS BIGINT) AS v
  FROM (SELECT DISTINCT i FROM tri)
), {",".join(
    f'''g{k} AS (
  SELECT m.i AS j, CAST(SUM(m.gram * v{k - 1}.v) AS BIGINT) AS gv
  FROM m JOIN v{k - 1} ON m.j = v{k - 1}.j GROUP BY m.i
), v{k} AS (
  SELECT j, CAST(floor(CAST(gv AS DOUBLE) * 1000
                       / max(abs(gv)) OVER ()) AS BIGINT) AS v
  FROM g{k}
)''' for k in (1, 2, 3)
)}
SELECT v3.j AS dim,
       v3.v AS v_scaled,
       CAST(floor(CAST(ray.vgv AS DOUBLE) / CAST(ray.vv AS DOUBLE) * 1e6)
            AS BIGINT) AS rayleigh_micro
FROM v3
CROSS JOIN (
  SELECT CAST(SUM(y.gv * v3b.v) AS BIGINT) AS vgv,
         CAST(SUM(v3b.v * v3b.v) AS BIGINT) AS vv
  FROM (SELECT m.i, CAST(SUM(m.gram * v3a.v) AS BIGINT) AS gv
        FROM m JOIN v3 v3a ON m.j = v3a.j GROUP BY m.i) y
  JOIN v3 v3b ON y.i = v3b.j
) ray
"""


def embed_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the 16-dim quantized embedding gram
    matrix via 3 power iterations. The distributed pass is the X^T X
    partial-matmul from ``embed_gram_matrix`` (corpus never leaves
    the executors, 136-row result); iterations are joins on that tiny
    relation with integer max-abs renormalization — the
    MLlib-RowMatrix decomposition re-expressed declaratively. All
    intermediates are exact BIGINTs; only the final Rayleigh quotient
    divides.

    The gram relation is bounded by the embedding dimension — 136
    rows at ANY corpus size, a model constant like the nation count —
    so it is pulled once as a bounded summary and the three power
    iterations run driver-side (guide §1.2: the unrolled-CTE form
    referenced the 136-row view ~10 times and scheduled ~38 tiny
    stage-jobs; only the corpus-sized X^T X pass needs the cluster).
    Arithmetic replicates the SQL exactly: integer sums are exact,
    the per-iteration renormalization and the Rayleigh quotient use
    the same float64 operation order, and the BIGINT cast applies
    Java double→long semantics (NaN→0, ±Inf→Long.MIN/MAX) so even
    the degenerate all-zero-gram edge matches the Spark SQL form the
    oracle mirrors."""
    import math

    def _div(a: float, b: float) -> float:
        # IEEE semantics like the SQL double divide (python raises on
        # /0.0): 0/0 -> NaN, x/0 -> ±Inf — reachable only on an
        # all-zero gram (empty/degenerate corpus)
        if b == 0.0:
            return float("nan") if a == 0.0 else math.copysign(
                float("inf"), a
            )
        return a / b

    def _as_long(f: float) -> int:
        if math.isnan(f):
            return 0
        if f >= float(2**63 - 1):
            return 2**63 - 1
        if f <= float(-(2**63)):
            return -(2**63)
        return int(math.floor(f))

    # bounded collect: d(d+1)/2 = 136 rows at any scale
    tri = mlprep.embed_gram_matrix(spark, sf_dir).collect()
    schema = "dim bigint, v_scaled bigint, rayleigh_micro bigint"
    if not tri:
        return spark.createDataFrame([], schema)
    m: dict = {}
    for r in tri:
        m[(r["i"], r["j"])] = r["gram"]
        if r["i"] != r["j"]:
            m[(r["j"], r["i"])] = r["gram"]
    v = {r["i"]: 1000 for r in tri}
    for _ in range(3):
        gv: dict = {}
        for (i, j), g in m.items():
            if j in v:
                gv[i] = gv.get(i, 0) + g * v[j]
        maxabs = max(abs(x) for x in gv.values())
        v = {
            i: _as_long(_div(float(x) * 1000.0, float(maxabs)))
            for i, x in gv.items()
        }
    gv = {}
    for (i, j), g in m.items():
        if j in v:
            gv[i] = gv.get(i, 0) + g * v[j]
    vgv = sum(gv[i] * v[i] for i in gv if i in v)
    vv = sum(x * x for x in v.values())
    ray = _as_long(_div(float(vgv), float(vv)) * 1e6)
    rows = [(d_, v[d_], ray) for d_ in sorted(v)]
    return spark.createDataFrame(rows, schema)


QUERIES = {
    "agg_linear_regression": agg_linear_regression,
    "agg_benford_profile": agg_benford_profile,
    "window_ewma_spend": window_ewma_spend,
    "events_ab_test_lift": events_ab_test_lift,
    "embed_pca_power": embed_pca_power,
}

ORACLE = {
    "agg_linear_regression": _OLS_DUCK,
    "agg_benford_profile": _BENFORD_DUCK,
    "window_ewma_spend": _EWMA_DUCK,
    "events_ab_test_lift": _AB_DUCK,
    "embed_pca_power": _PCA_DUCK,
}
