"""Third relational batch: harder TPC-H-shaped compositions.

  * q2-style per-group minimum with correlated filter (cheapest
    supplier per part via window-min, the scalable form of TPC-H Q2's
    correlated subquery)
  * q13-style two-level aggregation (customer order-count histogram)
  * q16-style exclusion + distinct counting (NOT IN + countDistinct)
  * q22-style anti-join with scalar-subquery threshold
  * approximate sketches (approx_count_distinct / approx_percentile)
    — deterministic for a given dataset but not reproducible in
    DuckDB, so exactness is asserted relative to exact values inside
    the test suite instead (tests/test_approx.py); the contract entry
    is exactly checkable because it returns the sketch-vs-exact error
    bounds as booleans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import money_sum
from ..sources.readers import load_table
from . import contract


# ---------------------------------------------------------------------------
# Q2 shape: cheapest supplier per part (correlated min -> window form)
# ---------------------------------------------------------------------------

def q2_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pinned NULL-key rule (round-10 layer 2): an offer with no part
    # key belongs to no part — Spark's window keeps a NULL partition
    # where the oracle's correlated `i.l_partkey = o.l_partkey`
    # never matches it, so the exclusion is explicit on both sides.
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_partkey").isNotNull()
    )
    sup = load_table(spark, sf_dir, "supplier")
    # per (part, supplier): min observed unit price (price/qty is noisy;
    # use extendedprice directly as the offer price)
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("best_price")
    )
    w = Window.partitionBy("l_partkey")
    cheapest = (
        offers.withColumn("part_min", F.min("best_price").over(w))
        .where(F.col("best_price") == F.col("part_min"))
        .drop("part_min")
    )
    return (
        cheapest.join(F.broadcast(sup), cheapest.l_suppkey == sup.s_suppkey)
        .select("l_partkey", "l_suppkey", "s_name", "best_price")
    )


_Q2_SQL = """
WITH offers AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS best_price
  FROM lineitem WHERE l_partkey IS NOT NULL
  GROUP BY l_partkey, l_suppkey
)
SELECT o.l_partkey, o.l_suppkey, s_name, o.best_price
FROM offers o
JOIN supplier ON o.l_suppkey = s_suppkey
WHERE o.best_price = (
  SELECT MIN(best_price) FROM offers i WHERE i.l_partkey = o.l_partkey
)
"""


# ---------------------------------------------------------------------------
# Q13 shape: customer order-count distribution (two-level aggregation)
# ---------------------------------------------------------------------------

def q13_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count("*").alias("n_customers")
    )


_Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT n_orders, COUNT(*) AS n_customers
FROM per_cust
GROUP BY n_orders
"""


# ---------------------------------------------------------------------------
# Q16 shape: exclusion list + distinct counting
# ---------------------------------------------------------------------------

def q16_parts_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(
        ~F.col("p_brand").isin("Brand#1", "Brand#2")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
GROUP BY p_brand, p_type
"""


# ---------------------------------------------------------------------------
# Q22 shape: positive-balance customers with no recent orders
# ---------------------------------------------------------------------------

def q22_dormant_positive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("__q22_cust")
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    )
    threshold = spark.sql(
        "SELECT MAX(c_acctbal) * 0.2 AS t FROM __q22_cust WHERE c_acctbal > 0"
    )
    rich = cust.join(F.broadcast(threshold)).where(F.col("c_acctbal") > F.col("t"))
    return (
        rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            money_sum(F.col("c_acctbal")).alias("total_bal"),
        )
    )


_Q22_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(TRY_CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_bal
FROM customer
WHERE c_acctbal > (SELECT MAX(c_acctbal) * 0.2 FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Approximate sketches, made exactly checkable: the query returns
# whether each sketch landed within its error bound vs the exact value
# ---------------------------------------------------------------------------

def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Row-level money domain (round-10 layer 2): the within-5%
    # sketch-accuracy claim is only meaningful over valid money — a
    # two-row hostile group whose "median" interpolates across an
    # absurd value fails it vacuously. Same predicate in the oracle.
    orders = load_table(spark, sf_dir, "orders").where(
        contract.money_domain("o_totalprice")
    )
    # countDistinct must NOT share a groupBy with the sketch/percentile
    # aggregates: Spark's distinct-rewrite would pre-aggregate by
    # (status, custkey), building one HLL + percentile + KLL buffer per
    # CUSTOMER instead of per status (~100k object buffers; measured
    # 6.5s -> 1.3s at sf0.1). Two cheap aggregations + a 3-row join.
    exact_distinct = orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_customers")
    )
    sketches = orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("approx_p50"),
    )
    # null-safe join: a NULL status is still a group in both engines'
    # GROUP BY — a plain equi-join would drop its row here only
    # (round-10 layer 2)
    per_status = exact_distinct.join(
        sketches.withColumnRenamed("o_orderstatus", "__st"),
        exact_distinct["o_orderstatus"].eqNullSafe(F.col("__st")),
    ).drop("__st")
    return per_status.select(
        "o_orderstatus",
        "exact_customers",
        (
            F.abs(F.col("approx_customers") - F.col("exact_customers"))
            <= 0.05 * F.col("exact_customers")
        ).alias("hll_within_5pct"),
        (
            F.abs(F.col("approx_p50") - F.col("exact_p50"))
            <= 0.05 * F.col("exact_p50")
        ).alias("p50_within_5pct"),
    )


_APPROX_SQL = f"""
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS exact_customers,
       TRUE AS hll_within_5pct,
       TRUE AS p50_within_5pct
FROM orders
WHERE {contract.money_domain_sql('o_totalprice')}
GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# Q4 shape: order-priority counts where any lineitem shipped late
# ---------------------------------------------------------------------------

def q4_priority_with_late_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # semi join on a non-equi condition: any lineitem shipped more
    # than 60 days after the order date
    joined = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(orders.o_orderdate, 60)),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q12 shape: priority buckets per ship-year (CASE aggregation)
# ---------------------------------------------------------------------------

def q12_priority_by_ship_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


_Q12_SQL = """
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q14 shape: promo revenue share (conditional ratio over one scan)
# ---------------------------------------------------------------------------

def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import cents

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).cast("double")
            / F.sum(rev)
            * 100.0
        ).alias("promo_share_pct"),
        (F.sum(rev) / 100.0).alias("total_revenue"),
    )


_Q14_SQL = """
SELECT
  CAST(SUM(CASE WHEN p_type = 'PROMO'
                THEN TRY_CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
                ELSE 0 END) AS DOUBLE)
    / CAST(SUM(TRY_CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE)
    * 100.0 AS promo_share_pct,
  CAST(SUM(TRY_CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
"""


# ---------------------------------------------------------------------------
# Q18 shape: large orders via HAVING on an aggregated join key
# ---------------------------------------------------------------------------

def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import cents

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg((F.sum(cents(F.col("l_quantity"))) / 100.0).alias("total_qty"))
        .where(F.col("total_qty") > 150.0)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "o_orderkey", "o_totalprice", "total_qty")
    )


_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(TRY_CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING CAST(SUM(TRY_CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 > 150.0
)
SELECT c_name, o_orderkey, o_totalprice, total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


QUERIES = {
    "q2_cheapest_supplier_per_part": q2_cheapest_supplier_per_part,
    "q4_priority_with_late_items": q4_priority_with_late_items,
    "q12_priority_by_ship_year": q12_priority_by_ship_year,
    "q14_promo_revenue_share": q14_promo_revenue_share,
    "q18_large_orders": q18_large_orders,
    "q13_order_count_histogram": q13_order_count_histogram,
    "q16_parts_supplier_variety": q16_parts_supplier_variety,
    "q22_dormant_positive_customers": q22_dormant_positive_customers,
    "agg_approx_sketches": agg_approx_sketches,
}

ORACLE = {
    "q2_cheapest_supplier_per_part": _Q2_SQL,
    "q4_priority_with_late_items": _Q4_SQL,
    "q12_priority_by_ship_year": _Q12_SQL,
    "q14_promo_revenue_share": _Q14_SQL,
    "q18_large_orders": _Q18_SQL,
    "q13_order_count_histogram": _Q13_SQL,
    "q16_parts_supplier_variety": _Q16_SQL,
    "q22_dormant_positive_customers": _Q22_SQL,
    "agg_approx_sketches": _APPROX_SQL,
}
