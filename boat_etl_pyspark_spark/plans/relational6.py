"""Round-2 relational surface extensions: LATERAL correlated
subqueries, the VARIANT semi-structured type (Spark 4), and the array
higher-order-function suite — three API surfaces a reference user
would expect from a full engine (SURVEY.md §2.9 joins/json/array
categories) that the round-1 queries exercised only indirectly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import cents
from ..sources.readers import load_table
from .contract import qty_scaled, qty_scaled_sql

# ---------------------------------------------------------------------------
# LATERAL correlated subquery: top-2 orders per customer
# ---------------------------------------------------------------------------


def lateral_top2_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL LATERAL form of per-group top-k. Catalyst decorrelates the
    correlated LIMIT subquery into row_number + filter + broadcast
    join — but (observed on Spark 4.1) it keeps the subquery's ORDER
    BY as a GLOBAL range-sort exchange before the window's hash
    exchange, one exchange more than the hand-written window form
    (``window_topk_orders_per_customer``, which also gets the
    WindowGroupLimit pushdown). So: the LATERAL surface is supported
    and correct, and at 100 TB the window spelling is the one to
    reach for — this plan difference is the documented reason.
    Customers with no orders are absent (inner lateral)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("__lat_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.total_units
        FROM __lat_customer c
        JOIN LATERAL (
          SELECT o_orderkey,
                 TRY_CAST(ROUND(o_totalprice) AS BIGINT) AS total_units
          FROM __lat_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
        """
    )


_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.total_units
FROM customer c,
LATERAL (
  SELECT o_orderkey,
         TRY_CAST(ROUND(o_totalprice) AS BIGINT) AS total_units
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
"""

# ---------------------------------------------------------------------------
# VARIANT: open-schema semi-structured pipeline
# ---------------------------------------------------------------------------


def json_variant_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT round-trip: build a nested JSON document from typed
    columns, parse it into Spark 4's VARIANT type, and extract typed
    values back out with ``variant_get`` path expressions. VARIANT is
    the open-schema answer for event payloads at scale — binary-encoded
    (no re-parse per access), shreddable, and schema-on-read — and a
    hash match against an oracle over the ORIGINAL columns proves the
    build→parse→extract loop is lossless. The aggregation groups on an
    extracted field, so extraction feeds a real plan, not a projection
    demo."""
    ev = load_table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("user_id").alias("u"),
            F.struct(
                F.col("event_type").alias("t"), F.col("value").alias("v")
            ).alias("m"),
        )
    )
    v = F.parse_json(doc)
    extracted = ev.select(
        F.variant_get(v, "$.m.t", "string").alias("etype"),
        F.variant_get(v, "$.u", "bigint").alias("uid"),
        F.variant_get(v, "$.m.v", "double").alias("val"),
    )
    return extracted.groupBy("etype").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("uid").alias("n_users"),
        F.sum(cents(F.col("val"))).alias("value_cents"),
    )


_VARIANT_SQL = """
SELECT event_type AS etype,
       COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(TRY_CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY event_type
"""

# ---------------------------------------------------------------------------
# Array higher-order functions: per-order quantity profile
# ---------------------------------------------------------------------------


def array_hof_quantity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array HOF suite (aggregate / filter / exists / element_at)
    over a per-order quantity array. Quantities become integer cents
    BEFORE collection so the lambda-fold sum is associative-exact at
    any parallelism; the array is sorted so the column is deterministic
    too. All lambdas run as JVM codegen (no Python) — the point of
    HOFs over a UDF.

    Pinned NULL/contract rule (round-10 layer 2): quantities are
    contract-bounded ([1, 50]) and a NULL/corrupt quantity is not an
    item — Spark's collect_list silently drops NULLs while the
    oracle's COUNT(*)/BOOL_OR count the row, so the exclusion happens
    explicitly BEFORE grouping, identically on both sides."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", qty_scaled("l_quantity").alias("qc")
    ).where(F.col("qc").isNotNull())
    arr = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("qc")).alias("q")
    )
    return arr.select(
        "l_orderkey",
        F.size("q").alias("n_items"),
        F.aggregate("q", F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "qty_cents"
        ),
        F.size(F.filter("q", lambda x: x > 2500)).alias("n_big"),
        F.element_at("q", 1).alias("q_min_cents"),
        F.element_at("q", -1).alias("q_max_cents"),
        F.exists("q", lambda x: x % 100 != 0).alias("has_fractional"),
    )


_ARRAY_HOF_SQL = f"""
SELECT l_orderkey,
       COUNT(*) AS n_items,
       CAST(SUM(qc) AS BIGINT) AS qty_cents,
       CAST(COUNT(CASE WHEN qc > 2500 THEN 1 END) AS INTEGER) AS n_big,
       MIN(qc) AS q_min_cents,
       MAX(qc) AS q_max_cents,
       BOOL_OR(qc % 100 <> 0) AS has_fractional
FROM (
  SELECT l_orderkey, {qty_scaled_sql('l_quantity')} AS qc
  FROM lineitem
)
WHERE qc IS NOT NULL
GROUP BY l_orderkey
"""

QUERIES = {
    "lateral_top2_orders_per_customer": lateral_top2_orders_per_customer,
    "json_variant_nested": json_variant_nested,
    "array_hof_quantity_profile": array_hof_quantity_profile,
}

ORACLE = {
    "lateral_top2_orders_per_customer": _LATERAL_SQL,
    "json_variant_nested": _VARIANT_SQL,
    "array_hof_quantity_profile": _ARRAY_HOF_SQL,
}
