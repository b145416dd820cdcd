"""Fourth relational batch — completing the TPC-H shape coverage
(Q6, Q10, Q15, Q17, Q19, Q21 adapted to the fixture's columns; the
fixture has no partsupp/shipmode/commitdate, so those predicates are
re-expressed over shipdate/orderdate arithmetic with the same query
shape).

With this module the contract covers the shapes of TPC-H Q1-Q6, Q10,
Q12-Q19, Q21, Q22 — filter-range scans, disjunctive predicates,
correlated averages, view-over-max selection, and the double
exists/not-exists decorrelation of Q21 expressed as one aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import cents, money_sum
from ..sources.readers import load_table


# ---------------------------------------------------------------------------
# Q6: forecasting revenue change (tight filter-range scan, single agg)
# ---------------------------------------------------------------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(cents(F.col("l_extendedprice") * F.col("l_discount"))) / 100.0)
            .alias("revenue_delta"),
            F.count("*").alias("n_items"),
        )
    )


_Q6_SQL = """
SELECT
  CAST(SUM(TRY_CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue_delta,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q10: returned-item reporting (4-way join, group, top 20)
# ---------------------------------------------------------------------------

def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.sum(cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))) / 100.0
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(TRY_CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q15: top supplier(s) — revenue view, select the max
# ---------------------------------------------------------------------------

def q15_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    sup = load_table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            (F.sum(cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))) / 100.0)
            .alias("total_revenue")
        )
    )
    # integer-cents revenue makes the max-equality selection exact
    top = rev.withColumn(
        "max_rev", F.max("total_revenue").over(Window.partitionBy())
    ).where(F.col("total_revenue") == F.col("max_rev"))
    return top.join(F.broadcast(sup), top.l_suppkey == sup.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(TRY_CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


# ---------------------------------------------------------------------------
# Q17: small-quantity orders (correlated per-part average)
# ---------------------------------------------------------------------------

def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    # per-part average quantity via exact integer sums (the correlated
    # scalar subquery of Q17, decorrelated to a window)
    w = Window.partitionBy("l_partkey")
    qty_c = cents(F.col("l_quantity"))
    enriched = li.withColumn(
        "avg_qty",
        (F.sum(qty_c).over(w).cast("double") / (F.count("*").over(w) * 100.0)),
    )
    return (
        enriched.join(F.broadcast(part), enriched.l_partkey == part.p_partkey)
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(cents(F.col("l_extendedprice"))) / 100.0 / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


_Q17_SQL = """
WITH enriched AS (
  SELECT l_partkey, l_quantity, l_extendedprice,
         CAST(SUM(TRY_CAST(ROUND(l_quantity * 100) AS BIGINT)) OVER (PARTITION BY l_partkey) AS DOUBLE)
           / (COUNT(*) OVER (PARTITION BY l_partkey) * 100.0) AS avg_qty
  FROM lineitem
)
SELECT
  CAST(SUM(TRY_CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly,
  COUNT(*) AS n_items
FROM enriched
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < 0.5 * avg_qty
"""


# ---------------------------------------------------------------------------
# Q19: disjunctive predicate revenue (OR-of-ANDs pushed into one scan)
# ---------------------------------------------------------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25))
           & (F.col("l_quantity").between(10, 30)))
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 25))
    )
    return joined.where(cond).agg(
        money_sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .alias("revenue"),
        F.count("*").alias("n_items"),
    )


_Q19_SQL = """
SELECT
  CAST(SUM(TRY_CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_type = 'PROMO' AND l_quantity >= 25)
"""


# ---------------------------------------------------------------------------
# Q21: suppliers who alone delayed multi-supplier orders
# (double exists/not-exists, decorrelated into one aggregation)
# ---------------------------------------------------------------------------

def q21_sole_delaying_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_suppliers"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_suppkey"),
        )
        .where((F.col("n_suppliers") > 1) & (F.col("n_late_suppliers") == 1))
    )
    return (
        per_order.join(F.broadcast(sup), per_order.late_suppkey == sup.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
    )


_Q21_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_suppliers,
         COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN l_suppkey END) AS n_late_suppliers,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN l_suppkey END) AS late_suppkey
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM per_order
JOIN supplier ON late_suppkey = s_suppkey
WHERE n_suppliers > 1 AND n_late_suppliers = 1
GROUP BY s_suppkey, s_name
"""


QUERIES = {
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_item_customers": q10_returned_item_customers,
    "q15_top_suppliers": q15_top_suppliers,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q21_sole_delaying_supplier": q21_sole_delaying_supplier,
}

ORACLE = {
    "q6_forecast_revenue": _Q6_SQL,
    "q10_returned_item_customers": _Q10_SQL,
    "q15_top_suppliers": _Q15_SQL,
    "q17_small_quantity_revenue": _Q17_SQL,
    "q19_disjunctive_revenue": _Q19_SQL,
    "q21_sole_delaying_supplier": _Q21_SQL,
}
