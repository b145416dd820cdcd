"""Fifth relational batch — the remaining TPC-H shapes (Q7, Q8, Q9,
Q11, Q20) and a document-chunking operator.

The fixture has no partsupp table or supplycost column; Q9/Q11/Q20
emulate them with per-(supplier, part) lineitem aggregates and
retail-price-derived cost, preserving the query SHAPES (nation-pair
volume, market-share ratio, profit decomposition, value-threshold
scalar subquery, nested semi-join) with the available columns.

``text_chunking`` is the training-data chunking op (fixed-size token
windows with overlap) expressed with pure built-ins — sequence +
slice + explode — so it scales as a map-only stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import cents
from .contract import (
    money_bounded_sql,
    qty_bounded_sql,
    rate_bounded_sql,
)
from ..sources.readers import load_table


def _rev_cents():
    return cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))


# ---------------------------------------------------------------------------
# Q7: trade volume between two nations, by year and direction
# ---------------------------------------------------------------------------

def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    pair = F.col("supp_nation").isin("NATION_1", "NATION_2") & F.col(
        "cust_nation"
    ).isin("NATION_1", "NATION_2") & (F.col("supp_nation") != F.col("cust_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("snk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("cnk"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg((F.sum(_rev_cents()) / 100.0).alias("volume"))
    )


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(SUM(TRY_CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q8: market share of one supplier-nation within a region, per year
# ---------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cn = nation.select(F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk"))
    sn = nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    rev = _rev_cents()
    target = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cnk"))
        .join(F.broadcast(region), F.col("crk") == region.r_regionkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(sn), sup.s_nationkey == F.col("snk"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (F.sum(target).cast("double") / F.sum(rev)).alias("mkt_share"),
            (F.sum(rev) / 100.0).alias("total_volume"),
        )
    )


_Q8_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
                     THEN TRY_CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
                     ELSE 0 END) AS DOUBLE)
         / CAST(SUM(TRY_CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) AS mkt_share,
       CAST(SUM(TRY_CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE r_name = 'EUROPE'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q9: product-type profit by supplier nation and year
# (cost emulated as 80% of retail price x quantity)
# ---------------------------------------------------------------------------

# q9's compound profit ingest: every factor is contract-bounded
# (money/rate/qty domains) BEFORE the arithmetic, so a corrupt factor
# nulls the term identically in both engines — the oracle used a plain
# CAST that THROWS on NaN in DuckDB while Spark's try_cast nulls
# (round-10 layer 2). One fragment, interpolated on both sides.
_Q9_PROFIT = (
    f"TRY_CAST(ROUND(({money_bounded_sql('l_extendedprice')}"
    f" * (1.0 - {rate_bounded_sql('l_discount')})"
    f" - {money_bounded_sql('p_retailprice')} * 0.8"
    f" * {qty_bounded_sql('l_quantity')}) * 100) AS BIGINT)"
)


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").contains("widget")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    profit = F.expr(_Q9_PROFIT)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg((F.sum(profit) / 100.0).alias("profit"))
    )


_Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(SUM({_Q9_PROFIT}) AS DOUBLE) / 100.0 AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q11: important stock (value share above a global-scalar threshold);
# partsupp emulated by per-(supplier, part) lineitem value
# ---------------------------------------------------------------------------

def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(cents(F.col("l_extendedprice"))).alias("value_cents")
    )
    per_part = ps.groupBy("l_partkey").agg(
        (F.sum("value_cents") / 100.0).alias("part_value")
    )
    total = per_part.agg(
        (F.sum(cents(F.col("part_value"))) / 100.0).alias("tv")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_value") > F.col("tv") * 0.001)
        .select("l_partkey", "part_value")
    )


_Q11_SQL = """
WITH ps AS (
  SELECT l_suppkey, l_partkey,
         SUM(TRY_CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS value_cents
  FROM lineitem GROUP BY l_suppkey, l_partkey
),
per_part AS (
  SELECT l_partkey, CAST(SUM(value_cents) AS DOUBLE) / 100.0 AS part_value
  FROM ps GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > (
  SELECT CAST(SUM(CAST(ROUND(part_value * 100) AS BIGINT)) AS DOUBLE) / 100.0
  FROM per_part
) * 0.001
"""


# ---------------------------------------------------------------------------
# Q20: suppliers holding excess stock of a part family (nested semi)
# ---------------------------------------------------------------------------

def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").startswith("blue")
    )
    sup = load_table(spark, sf_dir, "supplier")
    # per (supplier, part): shipped quantity vs half the part's total
    per_sp = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(cents(F.col("l_quantity"))).alias("qty_cents"))
    )
    per_part_total = per_sp.groupBy("l_partkey").agg(
        F.sum("qty_cents").alias("total_cents")
    )
    heavy = (
        per_sp.join(per_part_total, "l_partkey")
        .where(F.col("qty_cents").cast("double") > 0.3 * F.col("total_cents"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.join(heavy, sup.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_nationkey")
    )


_Q20_SQL = """
WITH per_sp AS (
  SELECT l_suppkey, l_partkey,
         SUM(TRY_CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qty_cents
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
  GROUP BY l_suppkey, l_partkey
),
totals AS (
  SELECT l_partkey, SUM(qty_cents) AS total_cents FROM per_sp GROUP BY l_partkey
),
heavy AS (
  SELECT DISTINCT l_suppkey
  FROM per_sp JOIN totals USING (l_partkey)
  WHERE CAST(qty_cents AS DOUBLE) > 0.3 * total_cents
)
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)
"""


# ---------------------------------------------------------------------------
# Document chunking: fixed-size token windows with overlap (map-only)
# ---------------------------------------------------------------------------

_CHUNK, _STRIDE = 32, 24  # 32-token chunks, 8-token overlap


def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__chunk_docs")
    return spark.sql(
        f"""
        WITH t AS (SELECT doc_id, split(text, ' ') AS toks FROM __chunk_docs),
        c AS (
          SELECT doc_id,
                 posexplode(transform(
                   sequence(0, CAST(greatest(size(toks) - 1, 0) DIV {_STRIDE} AS INT)),
                   i -> concat_ws(' ', slice(toks, i * {_STRIDE} + 1, {_CHUNK}))
                 )) AS (chunk_idx, chunk)
          FROM t
        )
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk,
               CAST(size(split(chunk, ' ')) AS BIGINT) AS chunk_tokens
        FROM c
        WHERE chunk != ''
        """
    )


_CHUNK_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (
  SELECT doc_id,
         unnest(range(0, greatest(len(toks) - 1, 0) // {_STRIDE} + 1)) AS chunk_idx
  FROM t
),
j AS (
  SELECT c.doc_id, c.chunk_idx,
         array_to_string(t.toks[c.chunk_idx * {_STRIDE} + 1 : c.chunk_idx * {_STRIDE} + {_CHUNK}], ' ') AS chunk
  FROM c JOIN t ON c.doc_id = t.doc_id
)
SELECT doc_id, chunk_idx, chunk,
       len(string_split(chunk, ' ')) AS chunk_tokens
FROM j
WHERE chunk <> ''
"""


# ---------------------------------------------------------------------------
# UNPIVOT (wide -> long reshape), the inverse of the pivot operator
# ---------------------------------------------------------------------------

def unpivot_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long reshape via the ``stack`` generator (Spark's
    UNPIVOT): one row per (customer, metric). Map-only — the
    generator multiplies rows without any shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE))"
        ).alias("metric", "val"),
    )


_UNPIVOT_SQL = """
SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
UNION ALL
SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val FROM customer
"""


# ---------------------------------------------------------------------------
# LOCF gap-fill (last observation carried forward)
# ---------------------------------------------------------------------------

def window_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill: clicks carry no amount in this shape
    (their value is masked to NULL), and each event's ``filled``
    value is the last non-null observation in the user's stream —
    ``last(..., ignorenulls)`` over an ordered per-user window. One
    shuffle on user_id; the frame is running, so state per row is a
    single value regardless of stream length."""
    # NULL ts meets opposite engine NULL-ordering defaults in the
    # running frame — dropped symmetrically with the oracle.
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    from pyspark.sql import Window

    masked = ev.select(
        "event_id",
        "user_id",
        F.col("ts").alias("ts_us"),
        F.when(F.col("event_type") != "click", F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return masked.select(
        "event_id",
        "user_id",
        F.col("v").isNull().alias("was_gap"),
        F.last("v", ignorenulls=True).over(w).alias("filled"),
    )


_LOCF_SQL = """
SELECT event_id, user_id,
       v IS NULL AS was_gap,
       LAST_VALUE(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts_us, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
FROM (
  -- epoch_us, not epoch_ns: Spark orders by its micro-truncated
  -- timestamp, so the oracle must collapse sub-microsecond ties the
  -- same way (event_id then breaks them identically in both engines)
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CASE WHEN event_type != 'click' THEN value END AS v
  FROM events
  WHERE ts IS NOT NULL
)
"""


QUERIES = {
    "q7_nation_trade_volume": q7_nation_trade_volume,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_stock": q11_important_stock,
    "q20_excess_stock_suppliers": q20_excess_stock_suppliers,
    "text_chunking": text_chunking,
    "unpivot_customer_metrics": unpivot_customer_metrics,
    "window_locf_fill": window_locf_fill,
}

ORACLE = {
    "q7_nation_trade_volume": _Q7_SQL,
    "q8_market_share": _Q8_SQL,
    "q9_product_profit": _Q9_SQL,
    "q11_important_stock": _Q11_SQL,
    "q20_excess_stock_suppliers": _Q20_SQL,
    "text_chunking": _CHUNK_SQL,
    "unpivot_customer_metrics": _UNPIVOT_SQL,
    "window_locf_fill": _LOCF_SQL,
}
