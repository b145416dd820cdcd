"""Round-3 relational/warehouse extensions.

Five surfaces a reference user migrating a warehouse workload expects
(SURVEY.md §2.9 window/join/agg categories) plus one iterative graph
algorithm:

  * distribution window functions (percent_rank / cume_dist),
  * gaps-and-islands (consecutive-day activity streaks),
  * SCD2 interval construction (validity ranges from an event log),
  * a salted join (the manual skew weapon, proven result-identical to
    the plain join),
  * an equi-depth histogram via a DISTRIBUTED global rank (range
    partition + per-partition offsets — no single-partition window),
  * fixed-point integer PageRank (deterministic iterative algorithm
    with an exact SQL oracle).

Determinism posture: every fraction is scaled to integer ppm with
``floor(x * 1e6 + 0.5)`` (exact IEEE ops, no engine ROUND
tie-breaking), money goes through integer cents, and every window
order has a unique tiebreak key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import track_persist
from ..functions.numeric import cents
from ..sources.readers import load_table
from .contract import (
    money_domain,
    money_domain_sql,
    money_rounded,
    money_rounded_sql,
    tpch_date_valid,
    tpch_date_valid_sql,
)


# ---------------------------------------------------------------------------
# Distribution window functions
# ---------------------------------------------------------------------------


def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist of customer balance within market
    segment. Both are rank arithmetic over one hash-partitioned sort
    (segments are parallel across executors); the order key includes
    c_custkey so ties can't reorder between engines. Row-level money
    domain (round-10 layer 2): NULL/NaN balances place differently in
    the two engines' window sort — a corrupt balance has no rank."""
    cust = load_table(spark, sf_dir, "customer").where(
        money_domain("c_acctbal")
    )
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        cents(F.col("c_acctbal")).alias("acctbal_cents"),
        F.floor(F.percent_rank().over(w) * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("pr_ppm"),
        F.floor(F.cume_dist().over(w) * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("cd_ppm"),
    )


_PERCENT_RANK_SQL = f"""
SELECT c_custkey,
       c_mktsegment,
       TRY_CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
       CAST(FLOOR(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT) AS pr_ppm,
       CAST(FLOOR(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT) AS cd_ppm
FROM customer
WHERE {money_domain_sql('c_acctbal')}
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


# ---------------------------------------------------------------------------
# Gaps and islands: consecutive-day activity streaks
# ---------------------------------------------------------------------------


def gaps_islands_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive-day activity islands via the classic
    date-minus-row_number grouping key. Work is partitioned by user
    (distinct + two shuffles on user_id); nothing global. Emits one row
    per island with start/end/length."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    return (
        grp.groupBy("user_id", "grp")
        .agg(
            F.date_format(F.min("day"), "yyyy-MM-dd").alias("streak_start"),
            F.date_format(F.max("day"), "yyyy-MM-dd").alias("streak_end"),
            F.count("*").alias("streak_days"),
        )
        .drop("grp")
    )


_GAPS_ISLANDS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), grp AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS g
  FROM days
)
SELECT user_id,
       strftime(MIN(day), '%Y-%m-%d') AS streak_start,
       strftime(MAX(day), '%Y-%m-%d') AS streak_end,
       COUNT(*) AS streak_days
FROM grp
GROUP BY user_id, g
"""


# ---------------------------------------------------------------------------
# SCD2: validity intervals from an event log
# ---------------------------------------------------------------------------


def scd2_customer_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 construction: each order is a
    change event to the customer's cumulative spend; lead() closes the
    validity interval, the open row gets the sentinel end date. This is
    the standard merge-free SCD2 build — one window per customer
    partition, no self-join.

    Hostile-ingest rules (round-10 layer 2): a change event needs a
    valid business date (NULL dates order differently per engine,
    re-linking every validity interval) and cents are money-domain
    bounded (a castable absurd value wraps Spark's running SUM where
    DuckDB widens)."""
    orders = load_table(spark, sf_dir, "orders").where(
        tpch_date_valid("o_orderdate")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.lead(F.date_format("o_orderdate", "yyyy-MM-dd"), 1, "9999-12-31")
        .over(w)
        .alias("valid_to"),
        F.row_number().over(w).alias("n_orders_to_date"),
        F.sum(money_rounded("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_spend_cents"),
    )


_SCD2_SQL = f"""
SELECT o_custkey AS custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
       COALESCE(
         LEAD(strftime(o_orderdate, '%Y-%m-%d'))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
         '9999-12-31') AS valid_to,
       CAST(ROW_NUMBER()
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         AS INTEGER) AS n_orders_to_date,
       CAST(SUM({money_rounded_sql('o_totalprice')})
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum_spend_cents
FROM orders
WHERE {tpch_date_valid_sql('o_orderdate')}
"""


# ---------------------------------------------------------------------------
# Salted join: the manual skew weapon
# ---------------------------------------------------------------------------

_SALT_N = 8


def join_salted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join, result-identical to the plain join (the
    oracle IS the plain join). The build side replicates each row
    across ``_SALT_N`` salts; the probe side assigns one deterministic
    salt per row; joining on (key, salt) splits a hot key's rows across
    ``_SALT_N`` reducers. AQE's skew-join handles most cases at runtime
    — manual salting remains the tool when stats are unavailable
    (stream-static joins) or a single key exceeds one executor even
    after AQE splitting. Cost: build-side rows x ``_SALT_N`` (so salt
    only the skewed keys in production; here every key is salted to
    keep the plan assertable)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_linenumber"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    salted_orders = orders.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT_N)]))
    )
    salted_li = li.withColumn(
        "salt", F.pmod(F.col("l_linenumber"), F.lit(_SALT_N)).cast("int")
    )
    joined = salted_li.join(
        salted_orders,
        (salted_li.l_orderkey == salted_orders.o_orderkey)
        & (salted_li.salt == salted_orders.salt),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.sum(
            cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("revenue_cents"),
    )


_SALTED_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(TRY_CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Equi-depth histogram over a DISTRIBUTED global rank
# ---------------------------------------------------------------------------

_HIST_BUCKETS = 8


def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) histogram of order totals. The global
    rank is computed WITHOUT a single-partition window: range-partition
    on the sort key, number rows inside each partition in parallel,
    then add broadcast per-partition offsets (the same distributed
    prefix-sum shape as sequence packing). At 100 TB this is the only
    viable exact global-order primitive — rank = partition offset +
    local row_number, one range exchange total.

    Hostile-ingest rule (round-10 layer 2): cents are money-domain
    bounded and a NULL (corrupt) price has no rank — engine NULL
    placement differs in the order, shifting every bucket one-sided."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            money_rounded("o_totalprice").alias("price_cents"),
        )
        .where(F.col("price_cents").isNotNull())
    )
    n_total = orders.count()  # bounded scalar (single long)
    parts = min(32, max(2, n_total // 1000))
    # ONE fact exchange: range partition (partitions are globally
    # ordered), sort inside each partition, then read (pid, local row
    # number) off monotonically_increasing_id's bit layout — NO window
    # over the fact, so no second hashpartitioning(pid) shuffle. The
    # global rank is exact for ANY sampled range boundaries because
    # total order = (partition order, within-partition sort).
    numbered = track_persist(
        orders.repartitionByRange(parts, "price_cents", "o_orderkey")
        .sortWithinPartitions("price_cents", "o_orderkey")
        .withColumn("mid", F.monotonically_increasing_id())
        .withColumn("pid", F.expr("CAST(mid DIV 8589934592 AS INT)"))  # id >> 33
        .withColumn("local_rn", F.expr("mid % 8589934592 + 1"))
        # Same correctness fence as operators.library.global_rank: the
        # offsets aggregate and the join both consume this relation,
        # and two executions of the SAMPLED range shuffle may draw
        # different boundaries (observed divergence with cached inputs
        # under AQE). The persist pins one materialization.
    )
    # per-partition row counts -> broadcastable offsets (<= #partitions
    # rows; the SinglePartition window below runs on that bounded side)
    offsets = (
        numbered.groupBy("pid")
        .count()
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("count").over(
                    Window.orderBy("pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("pid", "offset")
    )
    ranked = numbered.join(F.broadcast(offsets), "pid").withColumn(
        "rank", F.col("offset") + F.col("local_rn")
    )
    bucketed = ranked.withColumn(
        "bucket",
        F.expr(f"(rank - 1) * {_HIST_BUCKETS} DIV {n_total}").cast("bigint"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").alias("n_orders"),
        F.min("price_cents").alias("lo_cents"),
        F.max("price_cents").alias("hi_cents"),
    )


_EQUIDEPTH_SQL = f"""
WITH vals AS (
  SELECT o_orderkey, {money_rounded_sql('o_totalprice')} AS price_cents
  FROM orders
), kept AS (
  SELECT * FROM vals WHERE price_cents IS NOT NULL
), ranked AS (
  SELECT price_cents,
         ROW_NUMBER() OVER (ORDER BY price_cents, o_orderkey) AS rank
  FROM kept
), n AS (SELECT COUNT(*) AS n_total FROM kept)
SELECT CAST(((rank - 1) * {_HIST_BUCKETS}) // n_total AS BIGINT) AS bucket,
       COUNT(*) AS n_orders,
       MIN(price_cents) AS lo_cents,
       MAX(price_cents) AS hi_cents
FROM ranked, n
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Fixed-point integer PageRank (3 iterations) over the nation trade graph
# ---------------------------------------------------------------------------

_PR_SCALE = 1_000_000_000  # rank fixed-point scale
_PR_ITERS = 3


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed nation->nation edges weighted by lineitem count
    (supplier nation ships to customer nation). Heavy side is one
    shuffle of lineitem on orderkey; nation/supplier/customer keys ride
    along via broadcast joins."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )


def trade_edges_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached trade-edge relation (tiny: <= nations² rows, but
    the build is a full lineitem⋈orders shuffle). PageRank and BFS
    both consume it; the shared-cache registry (same mechanism as the
    dedup family's shingle cache, released by ``release_caches``)
    makes the second consumer pay nothing."""
    from .textdedup import _cached

    return _cached(
        spark, sf_dir, "trade_edges", lambda: _trade_edges(spark, sf_dir)
    )


def graph_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank, 3 unrolled iterations, ENTIRELY in int64
    fixed-point (scale 1e9): per-edge contribution is
    ``rank * w DIV out_w`` and the damping update is
    ``0.15*SCALE + 85*sum DIV 100`` — every operation is associative
    integer arithmetic, so the result is bit-identical at any
    parallelism and in any engine (the float formulation would not
    hash-match under different summation orders). The DATA-sized work
    — building the nation→nation edge relation from lineitem⋈orders —
    stays distributed (and session-cached); the fixpoint itself runs
    over a relation bounded by 25² nation pairs, a dimension-sized
    constant at ANY fact-table scale, so it is pulled once as a
    bounded summary and iterated driver-side (guide §1.2: the old
    3-iteration lazy unrolling scheduled ~9 exchange stages over
    ≤625 rows — pure scheduling overhead, measured 1.2s of a 1.9s
    query). Nodes without out-edges leak their damped mass
    (documented classic simplification — identical in the oracle)."""
    edges = trade_edges_cached(spark, sf_dir)
    # bounded collect: ≤ nations² = 625 rows at any scale factor (the
    # same geography bound as the broadcastable nation dimension)
    e_rows = edges.collect()
    out_w: dict = {}
    for r in e_rows:
        out_w[r["src"]] = out_w.get(r["src"], 0) + r["w"]
    # the out-weight equi-join drops NULL-src edges (SQL NULL never
    # matches); a NULL dst still mints a node, whose contributions
    # the left equi-join then cannot re-attach — replicated exactly
    e = [r for r in e_rows if r["src"] is not None]
    nodes = {r["src"] for r in e} | {r["dst"] for r in e}
    if not nodes:  # empty graph (fully-filtered / cold-start input)
        return spark.createDataFrame([], "nation string, rank_units bigint")
    init = _PR_SCALE // len(nodes)
    base = _PR_SCALE * 15 // 100
    # integer semantics match the SQL exactly: every operand is
    # non-negative, so python // == Spark DIV == DuckDB //
    rank = {n: init for n in nodes}
    for _ in range(_PR_ITERS):
        in_sum = {n: 0 for n in nodes}
        for r in e:
            d = r["dst"]
            if d is not None:
                in_sum[d] += rank[r["src"]] * r["w"] // out_w[r["src"]]
        rank = {n: base + 85 * in_sum[n] // 100 for n in nodes}
    rank_df = spark.createDataFrame(
        [(n, rank[n]) for n in sorted(
            nodes, key=lambda x: (x is not None, -1 if x is None else x)
        )],
        "nation int, rank bigint",
    )
    nation_names = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        rank_df.join(F.broadcast(nation_names), rank_df.nation == nation_names.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.col("rank").alias("rank_units"))
    )


def _pagerank_sql() -> str:
    base = _PR_SCALE * 15 // 100
    iters = []
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        iters.append(
            f"""r{i} AS (
  SELECT n.nation,
         CAST({base} + 85 * COALESCE(c.in_sum, 0) // 100 AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst, SUM({prev}.rank * e.w // e.out_w) AS in_sum
    FROM e JOIN {prev} ON e.src = {prev}.nation
    GROUP BY e.dst
  ) c ON n.nation = c.dst
)"""
        )
        prev = f"r{i}"
    return f"""
WITH edges AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), out_w AS (
  SELECT src, SUM(w) AS out_w FROM edges GROUP BY src
), e AS (
  SELECT edges.src, edges.dst, edges.w, out_w.out_w
  FROM edges JOIN out_w ON edges.src = out_w.src
), nodes AS (
  SELECT DISTINCT src AS nation FROM edges
  UNION SELECT DISTINCT dst FROM edges
), n_nodes AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (
  SELECT nation, CAST({_PR_SCALE} // (SELECT n FROM n_nodes) AS BIGINT) AS rank
  FROM nodes
),
{",".join(iters)}
SELECT nn.n_name AS nation, {prev}.rank AS rank_units
FROM {prev} JOIN nation nn ON {prev}.nation = nn.n_nationkey
"""


QUERIES = {
    "window_percent_rank_cume": window_percent_rank_cume,
    "gaps_islands_user_streaks": gaps_islands_user_streaks,
    "scd2_customer_order_history": scd2_customer_order_history,
    "join_salted_revenue": join_salted_revenue,
    "agg_equidepth_histogram": agg_equidepth_histogram,
    "graph_pagerank_nations": graph_pagerank_nations,
}

ORACLE = {
    "window_percent_rank_cume": _PERCENT_RANK_SQL,
    "gaps_islands_user_streaks": _GAPS_ISLANDS_SQL,
    "scd2_customer_order_history": _SCD2_SQL,
    "join_salted_revenue": _SALTED_SQL,
    "agg_equidepth_histogram": _EQUIDEPTH_SQL,
    "graph_pagerank_nations": _pagerank_sql(),
}
