"""Second relational coverage batch: pivot, subqueries (scalar +
IN/EXISTS), statistical moments, percentiles, schema-aligned unions,
conditional aggregation.

Moments (variance/stddev/correlation) are computed from exact integer
co-moments (scaled round + BIGINT sums, final double formula) instead
of Spark's streaming aggregators — the built-ins are float-order-
dependent and can't hash-match an oracle across partitionings; the
co-moment form is bit-reproducible at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .contract import (
    money_domain,
    money_domain_sql,
    money_rounded,
    money_rounded_sql,
    qty_scaled,
    qty_scaled_sql,
)


# ---------------------------------------------------------------------------
# Pivot: order-status counts per market segment
# ---------------------------------------------------------------------------

def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return piv.select(
        "c_mktsegment",
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in ("F", "O", "P")],
    )


_PIVOT_SQL = """
SELECT c_mktsegment,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_F,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_O,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_P
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Subqueries: scalar (uncorrelated) + IN
# ---------------------------------------------------------------------------

def subquery_big_building_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    orders.createOrReplaceTempView("__sq_orders")
    cust.createOrReplaceTempView("__sq_customer")
    # threshold derives from an exact MAX (not a float-order-dependent
    # AVG) so the filter boundary is identical in both engines
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM __sq_orders
        WHERE o_totalprice > (SELECT MAX(o_totalprice) * 0.5 FROM __sq_orders)
          AND o_custkey IN (
              SELECT c_custkey FROM __sq_customer WHERE c_mktsegment = 'BUILDING'
          )
        """
    )


_SUBQUERY_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT MAX(o_totalprice) * 0.5 FROM orders)
  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


# ---------------------------------------------------------------------------
# Moments: variance / stddev / correlation from integer co-moments
# ---------------------------------------------------------------------------

def agg_price_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-unit price moments per status. Ingest is money-domain
    bounded (contract.money_rounded): an absurd-but-castable value's
    square overflows INT64 asymmetrically (DuckDB throws, Spark
    wraps), and the square additionally widens BEFORE the multiply
    (the welch-t precedent) so it stays exact across the domain."""
    orders = load_table(spark, sf_dir, "orders")
    v = money_rounded("o_totalprice", scale=1)  # whole currency units
    base = orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v.cast("decimal(38,0)") * v).alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1").cast("double"), F.col("s2").cast("double")
    var = (s2 - s1 * s1 / n) / (n - 1)
    return base.select(
        "o_orderstatus",
        "n",
        (s1 / n).alias("mean_price"),
        var.alias("var_price"),
        F.sqrt(var).alias("stddev_price"),
    )


_MOMENTS_SQL = f"""
WITH v AS (
  SELECT o_orderstatus, {money_rounded_sql('o_totalprice', 1)} AS v
  FROM orders
), b AS (
  SELECT o_orderstatus,
         COUNT(*) AS n,
         SUM(v) AS s1,
         SUM(CAST(v AS HUGEINT) * v) AS s2
  FROM v GROUP BY o_orderstatus
)
SELECT o_orderstatus, n,
       CAST(s1 AS DOUBLE) / n AS mean_price,
       (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1) AS var_price,
       sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)) AS stddev_price
FROM b
"""


def agg_qty_price_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs price per return flag from
    exact integer co-moments. Both ingests are contract-bounded
    (quantity [1,50] -> q <= 5000 centi-units; money |x| <= 1e12 ->
    p <= 1e12 whole units), which is what makes the FAST accumulation
    shape sound: q*q (<= 2.5e7) and q*p (<= 5e15) stay exact INT64
    products — only the 128-bit SUM accumulators and the p*p product
    (1e24 > INT64) widen to DECIMAL(38,0)/HUGEINT. A decimal multiply
    per row on every co-moment measured ~20x slower than this
    widen-at-the-boundary shape (round-10 bench flag)."""
    li = load_table(spark, sf_dir, "lineitem")
    # project the bounded ingests ONCE per row: aggregate arguments
    # are evaluated per aggregate function, so an unprojected form
    # runs each TRY_CAST/CASE ingest four times per row
    proj = li.select(
        "l_returnflag",
        qty_scaled("l_quantity").alias("q"),
        money_rounded("l_extendedprice", scale=1).alias("p"),
    )
    q, p = F.col("q"), F.col("p")
    base = proj.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q).alias("sq"),
        F.sum(p).alias("sp"),
        F.sum((q * q).cast("decimal(38,0)")).alias("sqq"),
        F.sum(p.cast("decimal(38,0)") * p).alias("spp"),
        F.sum((q * p).cast("decimal(38,0)")).alias("sqp"),
    )
    n = F.col("n").cast("double")
    sq, sp = F.col("sq").cast("double"), F.col("sp").cast("double")
    sqq, spp, sqp = (
        F.col("sqq").cast("double"),
        F.col("spp").cast("double"),
        F.col("sqp").cast("double"),
    )
    corr = (n * sqp - sq * sp) / (
        F.sqrt(n * sqq - sq * sq) * F.sqrt(n * spp - sp * sp)
    )
    return base.select("l_returnflag", "n", corr.alias("qty_price_corr"))


_CORR_SQL = f"""
WITH v AS (
  SELECT l_returnflag,
         {qty_scaled_sql('l_quantity')} AS q,
         {money_rounded_sql('l_extendedprice', 1)} AS p
  FROM lineitem
), b AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(q) AS sq,
         SUM(p) AS sp,
         SUM(CAST(q * q AS HUGEINT)) AS sqq,
         SUM(CAST(p AS HUGEINT) * p) AS spp,
         SUM(CAST(q * p AS HUGEINT)) AS sqp
  FROM v GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (CAST(n AS DOUBLE) * sqp - CAST(sq AS DOUBLE) * sp)
         / (sqrt(CAST(n AS DOUBLE) * sqq - CAST(sq AS DOUBLE) * sq)
            * sqrt(CAST(n AS DOUBLE) * spp - CAST(sp AS DOUBLE) * sp)) AS qty_price_corr
FROM b
"""


# ---------------------------------------------------------------------------
# Percentiles (exact, interpolated)
# ---------------------------------------------------------------------------

def agg_acctbal_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated balance percentiles per segment. Row-level
    money domain (round-10 layer 2): a NaN crossing the interpolated
    median is placed differently by the two engines' quantile
    machinery, and an out-of-domain balance is corrupt ingest — the
    BETWEEN filter (pushdown-able) excludes NULL/NaN/Inf/absurd
    identically on both sides."""
    cust = load_table(spark, sf_dir, "customer").where(
        money_domain("c_acctbal")
    )
    return cust.groupBy("c_mktsegment").agg(
        F.expr("percentile(c_acctbal, 0.5)").alias("p50"),
        F.expr("percentile(c_acctbal, 0.9)").alias("p90"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


_PCTL_SQL = f"""
SELECT c_mktsegment,
       quantile_cont(c_acctbal, 0.5) AS p50,
       quantile_cont(c_acctbal, 0.9) AS p90,
       MIN(c_acctbal) AS min_bal,
       MAX(c_acctbal) AS max_bal
FROM customer
WHERE {money_domain_sql('c_acctbal')}
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Schema-aligned union of heterogeneous entities
# ---------------------------------------------------------------------------

def union_account_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("entity_id"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").alias("nationkey"),
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").alias("nationkey"),
    )
    return cust.unionByName(sup)


_UNION_SQL = """
SELECT 'customer' AS kind, c_custkey AS entity_id, c_acctbal AS acctbal, c_nationkey AS nationkey
FROM customer
UNION ALL
SELECT 'supplier', s_suppkey, s_acctbal, s_nationkey FROM supplier
"""


# ---------------------------------------------------------------------------
# Conditional aggregation
# ---------------------------------------------------------------------------

def agg_conditional_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count("*").alias("n"),
        F.count_if(F.col("l_extendedprice") > 5000).alias("n_high_value"),
        F.count_if(F.col("l_discount") >= 0.05).alias("n_discounted"),
        F.bool_or(F.col("l_returnflag") == "R").alias("any_returned"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
    )


_COND_SQL = """
SELECT l_linestatus,
       COUNT(*) AS n,
       COUNT(*) FILTER (WHERE l_extendedprice > 5000) AS n_high_value,
       COUNT(*) FILTER (WHERE l_discount >= 0.05) AS n_discounted,
       BOOL_OR(l_returnflag = 'R') AS any_returned,
       BOOL_AND(l_quantity > 0) AS all_positive_qty
FROM lineitem
GROUP BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Full outer join: per-nation customer vs supplier presence
# ---------------------------------------------------------------------------

def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count("*").alias("n_customers"))
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        cust.join(sup, cust.nk_c == sup.nk_s, "full_outer")
        .select(
            F.coalesce(F.col("nk_c"), F.col("nk_s")).alias("nationkey"),
            F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
            F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
        )
    )


_FULL_OUTER_SQL = """
WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1)
SELECT COALESCE(c.nk, s.nk) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers
FROM c FULL OUTER JOIN s ON c.nk = s.nk
"""


# ---------------------------------------------------------------------------
# Analytic window functions: percent_rank / cume_dist / first / last
# ---------------------------------------------------------------------------

def window_analytic_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level money domain on the ordering column (round-10 layer
    2): NULL and NaN balances place differently in the two engines'
    window sort, so a corrupt balance has no rank at all."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").where(
        money_domain("c_acctbal")
    )
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("c_custkey").over(wf).alias("poorest_custkey"),
        F.last("c_custkey").over(wf).alias("richest_custkey"),
    )


_ANALYTIC_SQL = f"""
SELECT c_mktsegment, c_custkey, c_acctbal,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume,
       FIRST_VALUE(c_custkey) OVER wf AS poorest_custkey,
       LAST_VALUE(c_custkey) OVER wf AS richest_custkey
FROM customer
WHERE {money_domain_sql('c_acctbal')}
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey),
       wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# ---------------------------------------------------------------------------
# Map functions: build, explode
# ---------------------------------------------------------------------------

def map_order_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build + explode an attribute map. Pinned NULL rule (round-10
    layer 2): a NULL attribute VALUE is still an attribute — built
    with ``create_map`` (holds NULL values) rather than str_to_map
    over a concat, which NULL-propagates and silently drops BOTH map
    entries for any order with one NULL field."""
    orders = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("prio"), F.col("o_orderpriority"),
    )
    return orders.select(
        "o_orderkey", F.explode(m).alias("attr_key", "attr_value")
    )


_MAP_SQL = """
SELECT o_orderkey, 'status' AS attr_key, o_orderstatus AS attr_value FROM orders
UNION ALL
SELECT o_orderkey, 'prio', o_orderpriority FROM orders
"""


# ---------------------------------------------------------------------------
# Calendar densification: daily event counts with zero-filled gaps
# ---------------------------------------------------------------------------

def date_densified_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    days = spark.sql(
        """
        SELECT explode(sequence(DATE '2024-01-01', DATE '2024-01-30',
                                INTERVAL 1 DAY)) AS day
        """
    ).select(F.date_format("day", "yyyy-MM-dd").alias("day"))
    per_day = events.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("n_events"))
    return (
        days.join(per_day, "day", "left")
        .select("day", F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"))
    )


_DENSIFY_SQL = """
WITH days AS (
  SELECT strftime(d, '%Y-%m-%d') AS day
  FROM (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                      INTERVAL 1 DAY)) AS d)
),
per_day AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1
)
SELECT days.day, COALESCE(per_day.n_events, 0) AS n_events
FROM days LEFT JOIN per_day ON days.day = per_day.day
"""


# ---------------------------------------------------------------------------
# RANGE-frame window: rolling 24h event value per user (event-time range,
# not row count — the frame every billing/rate-limit pipeline needs)
# ---------------------------------------------------------------------------

def window_rolling_24h_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.numeric import cents

    events = load_table(spark, sf_dir, "events")
    day_us = 24 * 3600 * 1_000_000
    base = events.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
        cents(F.col("value")).alias("v_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-day_us, Window.currentRow)
    )
    return base.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count("*").over(w).alias("n_24h"),
        (F.sum("v_cents").over(w) / 100.0).alias("value_24h"),
    )


_ROLLING_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       COUNT(*) OVER w AS n_24h,
       CAST(SUM(TRY_CAST(ROUND(value * 100) AS BIGINT)) OVER w AS DOUBLE) / 100.0 AS value_24h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
"""


QUERIES = {
    "date_densified_daily_events": date_densified_daily_events,
    "window_rolling_24h_value": window_rolling_24h_value,
    "join_full_outer_nation_presence": join_full_outer_nation_presence,
    "window_analytic_acctbal": window_analytic_acctbal,
    "map_order_attributes": map_order_attributes,
    "pivot_status_by_segment": pivot_status_by_segment,
    "subquery_big_building_orders": subquery_big_building_orders,
    "agg_price_moments": agg_price_moments,
    "agg_qty_price_correlation": agg_qty_price_correlation,
    "agg_acctbal_percentiles": agg_acctbal_percentiles,
    "union_account_entities": union_account_entities,
    "agg_conditional_lineitem": agg_conditional_lineitem,
}

ORACLE = {
    "date_densified_daily_events": _DENSIFY_SQL,
    "window_rolling_24h_value": _ROLLING_SQL,
    "join_full_outer_nation_presence": _FULL_OUTER_SQL,
    "window_analytic_acctbal": _ANALYTIC_SQL,
    "map_order_attributes": _MAP_SQL,
    "pivot_status_by_segment": _PIVOT_SQL,
    "subquery_big_building_orders": _SUBQUERY_SQL,
    "agg_price_moments": _MOMENTS_SQL,
    "agg_qty_price_correlation": _CORR_SQL,
    "agg_acctbal_percentiles": _PCTL_SQL,
    "union_account_entities": _UNION_SQL,
    "agg_conditional_lineitem": _COND_SQL,
}
