"""Round-5 batch 26: classical statistics — one-way ANOVA,
Jarque-Bera normality, Durbin-Watson autocorrelation, and Theil's
uncertainty coefficient (SURVEY.md §2.9 aggregation family; no
reference counterpart — the reference's pandas pipeline computes one
group-mean summary, these are the inference layer a data-quality
dashboard needs on top).

Float-determinism contract (same as the Welch-t / chi2 family): all
accumulation happens on exact integers (BIGINT cents /
DECIMAL(38,0)/HUGEINT power sums, or per-term micro-floored
contributions summed as integers); the final statistic is a
fixed-shape float expression with IDENTICAL text in the Spark plan
and the DuckDB oracle, so every IEEE operation matches. Where a
statistic needs a float sum over a DATA-DEPENDENT number of groups
(ANOVA's between-group sum, entropy sums), the groups are either a
fixed literal domain unrolled into one conditional-aggregate row
(ANOVA — addition order is then lexically fixed) or per-term floored
to integer micros before an integer sum (entropies, DW residuals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .contract import money_cents, money_cents_sql, qty_scaled_sql

# ---------------------------------------------------------------------------
# One-way ANOVA F (acctbal across market segments)
# ---------------------------------------------------------------------------

_ANOVA_SEGS = (
    "AUTOMOBILE",
    "BUILDING",
    "FURNITURE",
    "HOUSEHOLD",
    "MACHINERY",
)


def _anova_core() -> str:
    cells = []
    for i, seg in enumerate(_ANOVA_SEGS):
        cells.append(
            f"SUM(CASE WHEN seg = '{seg}' THEN 1 ELSE 0 END) AS n_{i},\n"
            f"  SUM(CASE WHEN seg = '{seg}' THEN v ELSE 0 END) AS s_{i},\n"
            f"  SUM(CASE WHEN seg = '{seg}' THEN CAST(v AS DECIMAL(38,0)) * v"
            f" ELSE CAST(0 AS DECIMAL(38,0)) END) AS ss_{i}"
        )
        # every group's sums live in ONE row, so the cross-group float
        # additions below have a lexically fixed order in both engines
    k = len(_ANOVA_SEGS)
    st = " + ".join(f"s_{i}" for i in range(k))
    nt = " + ".join(f"n_{i}" for i in range(k))
    sst = " + ".join(f"ss_{i}" for i in range(k))
    ssb_terms = " + ".join(
        f"CAST(s_{i} AS DOUBLE) * s_{i} / n_{i}" for i in range(k)
    )
    return f"""
WITH f AS (
  SELECT c_mktsegment AS seg, {money_cents_sql('c_acctbal')} AS v
  FROM {{customer}}
), cells AS (
  SELECT {', '.join(cells)},
  COUNT(*) AS n_all
  FROM f
), named AS (
  SELECT n_all, {st} AS st, {nt} AS nt, {sst} AS sst,
         ({ssb_terms}) AS rawb
  FROM cells
), comp AS (
  SELECT n_all, nt,
         rawb - CAST(st AS DOUBLE) * st / nt AS ssb,
         CAST(sst AS DOUBLE) - rawb AS ssw
  FROM named
)
SELECT CAST(n_all AS BIGINT) AS n_rows,
       CAST(n_all - nt AS BIGINT) AS n_other,
       CAST({k} - 1 AS BIGINT) AS df_between,
       CAST(nt - {k} AS BIGINT) AS df_within,
       CAST(floor(ssb / (ssb + ssw) * 1000000) AS BIGINT)
         AS ssb_share_micro,
       CAST(floor((ssb / ({k} - 1)) / (ssw / (nt - {k})) * 1000)
            AS BIGINT) AS f_milli
FROM comp
"""


_ANOVA_CORE = _anova_core()


def agg_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of account balance across the five market
    segments. The segment domain is a fixed TPC-H literal, so all 15
    per-group power sums (count, BIGINT cent sum, DECIMAL(38,0)
    square sum) unroll into ONE conditional-aggregate row — one
    map-combined scan, no groupBy shuffle, and the between-group
    float sum has a lexically fixed addition order in both engines.
    ``n_other`` pins domain drift: a fixture with a sixth segment
    shows up as n_other > 0 instead of silently biasing F. Scales:
    the only full-data work is the single scan."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "r41_anova_customer"
    )
    return spark.sql(_ANOVA_CORE.format(customer="r41_anova_customer"))


_ANOVA_DUCK = _ANOVA_CORE.format(customer="customer")

# ---------------------------------------------------------------------------
# Jarque-Bera normality test (lineitem quantity)
# ---------------------------------------------------------------------------

_JB_CORE = f"""
WITH f AS (
  -- the documented quantity contract [1, 50] applied as the ingest
  -- bound (round-10 layer 2): a corrupt 1e15 "quantity" raised to
  -- the 4th power overflows even DECIMAL(38)/HUGEINT, so the moment
  -- machinery's exactness guarantee EXISTS only inside the domain
  SELECT v FROM (
    SELECT {qty_scaled_sql('l_quantity', 1)} AS v FROM {{lineitem}}
  ) WHERE v IS NOT NULL
), s AS (
  SELECT COUNT(*) AS n, SUM(v) AS s1, SUM(v * v) AS s2,
         SUM(CAST(v AS DECIMAL(38,0)) * v * v) AS s3,
         SUM(CAST(v AS DECIMAL(38,0)) * v * v * v) AS s4
  FROM f
), a AS (
  SELECT n, CAST(s1 AS DOUBLE) / n AS m, CAST(s2 AS DOUBLE) / n AS r2,
         CAST(s3 AS DOUBLE) / n AS r3, CAST(s4 AS DOUBLE) / n AS r4
  FROM s
), b AS (
  SELECT n, m, r2 - m * m AS m2,
         r3 - 3 * m * r2 + 2 * m * m * m AS m3,
         r4 - 4 * m * r3 + 6 * m * m * r2 - 3 * m * m * m * m AS m4
  FROM a
), c AS (
  SELECT n, m, m3 / (m2 * sqrt(m2)) AS skew, m4 / (m2 * m2) AS kurt
  FROM b
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(floor(m * 1000) AS BIGINT) AS mean_milli,
       CAST(floor(skew * 1000000) AS BIGINT) AS skew_micro,
       CAST(floor(kurt * 1000000) AS BIGINT) AS kurt_micro,
       CAST(floor(CAST(n AS DOUBLE) / 6
                  * (skew * skew + (kurt - 3) * (kurt - 3) / 4) * 1000)
            AS BIGINT) AS jb_milli
FROM c
"""


def agg_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality statistic over lineitem quantity
    (integral 1..50, so the four raw power sums are EXACT BIGINT /
    DECIMAL(38,0) integers at any row count — v^4 <= 6.25e6 keeps the
    DECIMAL sum inside 38 digits past 1e30 rows). Central moments,
    skewness, kurtosis and JB are one fixed-shape float expression
    over the five integers. ONE map-combined scan; the test that
    tells a distribution-drift monitor 'this column stopped looking
    like it used to' for ~free."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "r41_jb_lineitem"
    )
    return spark.sql(_JB_CORE.format(lineitem="r41_jb_lineitem"))


_JB_DUCK = _JB_CORE.format(lineitem="lineitem")

# ---------------------------------------------------------------------------
# Durbin-Watson (daily revenue OLS residual autocorrelation)
# ---------------------------------------------------------------------------

_DW_CORE = """
WITH ols AS (
  SELECT COUNT(*) AS n, SUM(d) AS sd,
         SUM(CAST(d AS DECIMAL(38,0)) * d) AS sdd,
         SUM(v) AS sv, SUM(CAST(d AS DECIMAL(38,0)) * v) AS sdv
  FROM {daily}
), coef AS (
  SELECT n, sd, sv,
         (CAST(n AS DOUBLE) * CAST(sdv AS DOUBLE)
          - CAST(sd AS DOUBLE) * CAST(sv AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
            - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) AS b
  FROM ols
), coef2 AS (
  SELECT b, (CAST(sv AS DOUBLE) - b * CAST(sd AS DOUBLE))
            / CAST(n AS DOUBLE) AS a
  FROM coef
), resid AS (
  SELECT d, CAST(floor(CAST(v AS DOUBLE) - b * d - a) AS BIGINT) AS e
  FROM {daily} CROSS JOIN coef2
), lagd AS (
  SELECT e, LAG(e) OVER (ORDER BY d) AS ep FROM resid
), agg AS (
  SELECT COUNT(*) AS nd,
         SUM(CASE WHEN ep IS NOT NULL
             THEN CAST(e - ep AS DECIMAL(38,0)) * (e - ep)
             ELSE CAST(0 AS DECIMAL(38,0)) END) AS num,
         SUM(CAST(e AS DECIMAL(38,0)) * e) AS den
  FROM lagd
)
SELECT CAST(nd AS BIGINT) AS n_days,
       CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1000000)
            AS BIGINT) AS dw_micro
FROM agg
"""


def agg_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic on the residuals of daily revenue
    regressed on the day index. The event-sized lineitem table
    collapses to a ~2.5k-row (day, cent-sum) relation FIRST (one
    groupBy shuffle) and is persisted, so the OLS sums and the
    residual pass reuse it instead of re-aggregating; residuals are
    floored to integer cents, their squares/lag-diffs accumulate as
    DECIMAL(38,0)/HUGEINT, and the single global LAG window runs
    over the bounded daily rollup (the documented
    bounded-single-partition pattern from ts_periodogram). DW ~ 2
    means no autocorrelation; the drift alarm for 'my daily KPI
    series grew a trend my model doesn't know about'."""
    from . import track_persist

    li = load_table(spark, sf_dir, "lineitem")
    daily = track_persist(
        li.groupBy(
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("d")
        ).agg(
            F.sum(money_cents("l_extendedprice")).alias("v")
        )
    )
    daily.createOrReplaceTempView("r41_dw_daily")
    return spark.sql(_DW_CORE.format(daily="r41_dw_daily"))


_DW_DUCK = (
    f"""
WITH dw_daily AS (
  SELECT CAST(datediff('day', DATE '1970-01-01',
                       CAST(l_shipdate AS DATE)) AS BIGINT) AS d,
         SUM({money_cents_sql('l_extendedprice')}) AS v
  FROM lineitem GROUP BY 1
)"""
    + _DW_CORE.replace("WITH ols AS (", ", ols AS (", 1).format(
        daily="dw_daily"
    )
)

# ---------------------------------------------------------------------------
# Theil's U (uncertainty coefficient, priority <-> status)
# ---------------------------------------------------------------------------

_THEIL_ENT = (
    "SUM(CAST(floor(-(CAST({c} AS DOUBLE) / tot.n)"
    " * ln(CAST({c} AS DOUBLE) / tot.n) * 1000000) AS BIGINT))"
)

_THEILU_CORE = f"""
WITH tot AS (
  SELECT SUM(c) AS n FROM {{jx}}
), mx AS (
  SELECT x, SUM(c) AS c FROM {{jx}} GROUP BY x
), my AS (
  SELECT y, SUM(c) AS c FROM {{jx}} GROUP BY y
), hx AS (
  SELECT {_THEIL_ENT.format(c='mx.c')} AS h FROM mx CROSS JOIN tot
), hy AS (
  SELECT {_THEIL_ENT.format(c='my.c')} AS h FROM my CROSS JOIN tot
), hj AS (
  SELECT {_THEIL_ENT.format(c='j.c')} AS h FROM {{jx}} j CROSS JOIN tot
)
SELECT CAST(tot.n AS BIGINT) AS n_rows,
       CAST(hx.h AS BIGINT) AS h_priority_micro,
       CAST(hy.h AS BIGINT) AS h_status_micro,
       CAST(hj.h AS BIGINT) AS h_joint_micro,
       CAST((hy.h - (hj.h - hx.h)) * 1000000 {{idiv}} hy.h AS BIGINT)
         AS u_status_given_priority_micro,
       CAST((hx.h - (hj.h - hy.h)) * 1000000 {{idiv}} hx.h AS BIGINT)
         AS u_priority_given_status_micro
FROM tot CROSS JOIN hx CROSS JOIN hy CROSS JOIN hj
"""


def agg_theils_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's uncertainty coefficient between order priority and
    order status — the DIRECTIONAL categorical-association measure
    (chi2/Cramer answer 'associated?'; U answers 'how much of Y's
    entropy does knowing X remove, and in which direction'). NOT the
    Theil inequality index (`agg_theil_index`). One groupBy builds
    the contingency relation; entropies are per-term micro-floored
    integer sums, and the two U ratios are integer division over
    those micros — the contract is micro-entropy arithmetic,
    identical in both engines. Scales: the only full-data work is
    the contingency groupBy.

    The contingency table is bounded by the enum alphabets (priority
    x status — ~15 cells on contract data, a few dozen with hostile
    unknown/NULL enums; never fact-sized), so the four entropy
    consumers run driver-side over one bounded collect (guide
    §1.2/§5; the old persisted-view form re-read the cache in four
    CTE subtrees and scheduled ~16 tiny jobs). Replication is exact:
    entropy terms keep the SQL's float64 operation order
    (-(c/n) * ln(c/n) * 1e6 floored per term, libm ln), the U ratios
    use truncating integer division like Spark's DIV with its
    NULL-on-zero-divisor edge, and an empty orders table yields the
    SQL's single all-NULL row. Proven by oracle parity at two SFs
    plus the hostile/NULL/empty nets (the DuckDB oracle is
    untouched)."""
    import math

    orders = load_table(spark, sf_dir, "orders")
    # bounded collect: <= |priority alphabet| x |status alphabet| cells
    cells = (
        orders.groupBy(
            F.col("o_orderpriority").alias("x"),
            F.col("o_orderstatus").alias("y"),
        )
        .agg(F.count("*").alias("c"))
        .collect()
    )
    schema = (
        "n_rows bigint, h_priority_micro bigint, h_status_micro bigint, "
        "h_joint_micro bigint, u_status_given_priority_micro bigint, "
        "u_priority_given_status_micro bigint"
    )
    if not cells:
        # empty-input SQL shape: every 1-row aggregate is NULL
        return spark.createDataFrame(
            [(None, None, None, None, None, None)], schema
        )
    n = sum(r["c"] for r in cells)

    def ent(counts) -> int:
        # SUM(CAST(floor(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS
        # DOUBLE) / n) * 1000000) AS BIGINT)) — per-term float64 in
        # the SQL's exact operation order, then exact integer sum
        return sum(
            int(
                math.floor(
                    -(float(c) / n) * math.log(float(c) / n) * 1000000
                )
            )
            for c in counts
        )

    def tdiv(a: int, b: int):
        # Spark DIV: truncate toward zero, NULL on zero divisor
        if b == 0:
            return None
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    mx: dict = {}
    my: dict = {}
    for r in cells:
        mx[r["x"]] = mx.get(r["x"], 0) + r["c"]
        my[r["y"]] = my.get(r["y"], 0) + r["c"]
    hx = ent(mx.values())
    hy = ent(my.values())
    hj = ent(r["c"] for r in cells)
    row = (
        n,
        hx,
        hy,
        hj,
        tdiv((hy - (hj - hx)) * 1000000, hy),
        tdiv((hx - (hj - hy)) * 1000000, hx),
    )
    return spark.createDataFrame([row], schema)


_THEILU_DUCK = (
    """
WITH theil_jx AS (
  SELECT o_orderpriority AS x, o_orderstatus AS y, COUNT(*) AS c
  FROM orders GROUP BY 1, 2
)"""
    + _THEILU_CORE.replace("WITH tot AS (", ", tot AS (", 1).format(
        jx="theil_jx", idiv="//"
    )
)


QUERIES = {
    "agg_anova_f": agg_anova_f,
    "agg_jarque_bera": agg_jarque_bera,
    "agg_durbin_watson": agg_durbin_watson,
    "agg_theils_u": agg_theils_u,
}

ORACLE = {
    "agg_anova_f": _ANOVA_DUCK,
    "agg_jarque_bera": _JB_DUCK,
    "agg_durbin_watson": _DW_DUCK,
    "agg_theils_u": _THEILU_DUCK,
}
