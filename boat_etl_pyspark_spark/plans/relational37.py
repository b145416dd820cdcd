"""Round-5 batch 22: components, sketches, tail risk, null-safe keys
(SURVEY.md §2.9 graph / aggregation / join families; no reference
counterpart).

  * ``graph_connected_components`` — general undirected connected
    components over the same-region trade graph (the regional-bloc
    question), hash-min label propagation with per-round lineage
    cuts. The DuckDB oracle computes the TRUE fixpoint via a
    recursive CTE, so an under-iterated Spark loop cannot silently
    pass — the strongest convergence check available.
  * ``agg_count_min_sketch`` — mergeable Count-Min frequency sketch
    (depth 4 x width 64, md5-derived row hashes identical in both
    engines) audited against exact counts for the top-10 keys: the
    classic estimate-never-undercounts contract, measured not
    assumed.
  * ``agg_tail_cvar`` — exact Value-at-Risk / Conditional VaR of the
    order-value tail per priority class via ``global_rank`` (one
    range exchange, no per-group single-task sort): the top-5%% tail
    boundary, its conditional mean and its revenue share.
  * ``join_null_safe`` — null-safe equality join (``<=>`` /
    ``IS NOT DISTINCT FROM``): the one equality variant the join
    family did not yet cover; NULL bucket keys match each other
    instead of silently dropping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import cents
from ..operators.library import global_rank
from ..sources.readers import load_table
from .contract import money_rounded, money_rounded_sql
from .relational7 import trade_edges_cached

# ---------------------------------------------------------------------------
# Connected components (regional trade blocs)
# ---------------------------------------------------------------------------

_CC_TOPK = 2
# Component vertex sets are bounded by a region (5 nations in every
# TPC-H fixture), so any component's diameter is <= 4; 6 min-label
# rounds converge with margin. The oracle is a true recursive-CTE
# fixpoint: if this unroll ever under-iterates, the driver gate
# hash-mismatches instead of both sides agreeing on a wrong answer.
_CC_ROUNDS = 6


def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected connected components of the same-region trade graph
    (each nation's top-{_CC_TOPK} intra-region routes by weight,
    symmetrized, self-loops dropped): which nations form one trading
    bloc. Hash-min label propagation — comp' = min(comp, min over
    neighbours' comp). The DATA-sized stage (the lineitem⋈orders edge
    aggregation) stays distributed and session-cached; the graph it
    yields is bounded by 25² nation pairs at ANY fact volume, so the
    six propagation rounds run driver-side over that bounded summary
    (guide §1.2: the unrolled broadcast-join form scheduled ~33 tiny
    stage-jobs over ≤50 edges). The data-scale iterative shape lives
    where the graph is data-sized: ``graph_kcore_peeling`` and
    ``dedup_clusters`` keep the distributed join+min skeleton.

    DISTINCT node extraction (round-10 layer 2): a duplicate
    n_nationkey row is one NODE, not two — the oracle's recursive
    UNION + GROUP BY dedups, so an undeduped side would emit one
    component row per dim ROW on hostile dims."""
    # bounded collects: ≤ nations² edges, ≤ nations dim rows
    e_rows = trade_edges_cached(spark, sf_dir).collect()
    nat_rows = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    ).collect()
    # regions is a MULTImap: a (hostile) duplicate n_nationkey row
    # fans the equi-join out per matching dim row, exactly like the
    # oracle's JOIN nation a / JOIN nation b — the fanout feeds the
    # ROW_NUMBER sparsifier, so it must be replicated, not deduped
    regions: dict = {}
    for r in nat_rows:
        regions.setdefault(r["n_nationkey"], []).append(r["n_regionkey"])
    samereg = [
        (r["src"], r["dst"], r["w"])
        for r in e_rows
        # a NULL endpoint equi-joins nothing (SQL NULL never matches)
        if r["src"] is not None and r["dst"] is not None
        and r["src"] != r["dst"]
        for ra in regions.get(r["src"], ())
        for rb in regions.get(r["dst"], ())
        if ra is not None and ra == rb
    ]
    by_src: dict = {}
    for s, d, w in samereg:
        by_src.setdefault(s, []).append((d, w))
    und = set()
    for s, nbrs in by_src.items():
        nbrs.sort(key=lambda dw: (-dw[1], dw[0]))
        for d, _w in nbrs[:_CC_TOPK]:
            und.add((s, d))
            und.add((d, s))
    # a NULL nation key is a node that joins nothing: label stays NULL
    comp = {n: n for n in regions}
    for _ in range(_CC_ROUNDS):
        prop: dict = {}
        for s, d in und:
            c = comp[s]
            if d not in prop or c < prop[d]:
                prop[d] = c
        comp = {
            n: (min(c, prop[n]) if n in prop and c is not None else
                prop.get(n, c) if c is None else c)
            for n, c in comp.items()
        }
    # the oracle's final JOIN ... USING (comp) is an equi-join, so a
    # NULL comp (a NULL n_nationkey node) matches no size row and is
    # DROPPED — mirror that instead of inventing a (NULL, NULL, size)
    # row, and keep NULL comps out of the size counts likewise
    sizes: dict = {}
    for c in comp.values():
        if c is not None:
            sizes[c] = sizes.get(c, 0) + 1
    rows = [
        (n, comp[n], sizes[comp[n]])
        for n in sorted(comp, key=lambda x: (x is not None, x))
        if comp[n] is not None
    ]
    return spark.createDataFrame(
        rows, "nation int, comp int, comp_size bigint"
    )


_CC_DUCK = f"""
WITH RECURSIVE raw AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY s.s_nationkey, c.c_nationkey
), samereg AS (
  SELECT r.src, r.dst, r.w
  FROM raw r
  JOIN nation a ON a.n_nationkey = r.src
  JOIN nation b ON b.n_nationkey = r.dst
  WHERE a.n_regionkey = b.n_regionkey AND r.src != r.dst
), ranked AS (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rk
  FROM samereg
), keep AS (
  SELECT src, dst FROM ranked WHERE rk <= {_CC_TOPK}
), und AS (
  SELECT src, dst FROM keep UNION SELECT dst, src FROM keep
), nodes AS (
  SELECT n_nationkey AS nation FROM nation
), r AS (
  SELECT nation, nation AS comp FROM nodes
  UNION
  SELECT e.dst AS nation, r.comp FROM r JOIN und e ON e.src = r.nation
), comp AS (
  SELECT nation, MIN(comp) AS comp FROM r GROUP BY nation
)
SELECT CAST(c.nation AS INT) AS nation,
       CAST(c.comp AS INT) AS comp,
       CAST(s.comp_size AS BIGINT) AS comp_size
FROM comp c
JOIN (SELECT comp, COUNT(*) AS comp_size FROM comp GROUP BY comp) s
  USING (comp)
ORDER BY nation
"""


# ---------------------------------------------------------------------------
# Count-Min sketch (mergeable frequency estimates, audited vs exact)
# ---------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 64
_CMS_TOPN = 10

# md5 -> int row hashes, identical in both engines (the established
# idiom); row j's salt rides inside the hashed string.
_CMS_H_SPARK = (
    "CAST(conv(substring(md5(concat('cms', j, ':', {key})), 1, 8), 16, 10)"
    " AS BIGINT)"
)
_CMS_H_DUCK = (
    "CAST('0x' || substring(md5(concat('cms', j, ':', {key})), 1, 8)"
    " AS BIGINT)"
)

_CMS_CORE = f"""
WITH keyed AS (
  SELECT o_custkey AS key FROM {{orders}}
), cells AS (
  SELECT j, {{h}} % {_CMS_W} AS bucket, COUNT(*) AS cnt
  FROM keyed {{lat}}
  GROUP BY j, {{h}} % {_CMS_W}
), exact AS (
  SELECT key, COUNT(*) AS exact_cnt FROM keyed GROUP BY key
), top AS (
  SELECT key, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, key LIMIT {_CMS_TOPN}
), probes AS (
  SELECT t.key, t.exact_cnt, j, {{h_t}} % {_CMS_W} AS bucket
  FROM top t {{lat}}
), est AS (
  SELECT p.key, p.exact_cnt, MIN(c.cnt) AS cms_est
  FROM probes p
  JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
  GROUP BY p.key, p.exact_cnt
)
SELECT CAST(key AS BIGINT) AS custkey,
       CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_cnt AS BIGINT) AS overcount
FROM est
ORDER BY exact_cnt DESC, custkey
"""


def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch of order frequency per customer (depth
    {_CMS_D} x width {_CMS_W}), audited against exact counts for the
    top-{_CMS_TOPN} customers. The sketch build is ONE map-combined
    aggregate over (row, bucket) — {_CMS_D}x{_CMS_W} cells total, the
    mergeable-sketch contract: partial sketches from any partitioning
    sum cell-wise to the same table, which is exactly why the
    structure works as a streaming/shuffle-light frequency monitor at
    100 TB (the exact `exact` relation here exists only to audit the
    estimates; production keeps just the cells). Estimates join the
    bounded probe relation (top-N x depth rows) against the tiny cell
    table; ``cms_est >= exact_cnt`` always — the one-sided error
    contract — and `overcount` measures the collision inflation at
    this width."""
    load_table(spark, sf_dir, "orders").select("o_custkey").createOrReplaceTempView(
        "r37_cms_orders"
    )
    return spark.sql(
        _CMS_CORE.format(
            orders="r37_cms_orders",
            h=_CMS_H_SPARK.format(key="key"),
            h_t=_CMS_H_SPARK.format(key="t.key"),
            lat=f"LATERAL VIEW explode(sequence(0, {_CMS_D - 1})) t_j AS j",
        )
    )


_CMS_DUCK = _CMS_CORE.format(
    orders="orders",
    h=_CMS_H_DUCK.format(key="key"),
    h_t=_CMS_H_DUCK.format(key="t.key"),
    lat=f"CROSS JOIN range({_CMS_D}) t_j(j)",
)


# ---------------------------------------------------------------------------
# Tail risk: exact VaR / CVaR per priority class
# ---------------------------------------------------------------------------

_TAIL_PCT = 5  # top-5% tail


def agg_tail_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Value-at-Risk and Conditional VaR (expected shortfall) of
    order values per priority class: the tail is the top-{_TAIL_PCT}%
    of orders by value (k = max(1, n*{_TAIL_PCT}/100) rows, ties
    broken by orderkey so both engines pick the identical row set),
    VaR is the tail's entry boundary, CVaR its exact integer mean,
    plus the tail's revenue share. Ranking uses ``global_rank``
    partitioned by priority — ONE range exchange over the fact table,
    no per-group single-task window sort (the documented
    window-vs-distributed rule) — and group sizes/totals arrive as a
    5-row broadcast aggregate, so the plan is two scans + one range
    exchange at any scale.

    Hostile-ingest rules (round-10 layer 2): cents are money-domain
    bounded and NULL (corrupt) prices have no rank; a NULL priority
    is still a group (null-safe totals join, like the oracle's
    PARTITION BY); the ppm share widens before its x1e6 scaling."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            money_rounded("o_totalprice").alias("price_cents"),
            "o_orderkey",
        )
        .where(F.col("price_cents").isNotNull())
    )
    ranked = global_rank(
        orders.withColumn("neg_cents", -F.col("price_cents")),
        ["neg_cents", "o_orderkey"],
        partition_by=["o_orderpriority"],
    )
    totals = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("__n"),
        F.sum("price_cents").alias("__total"),
    )
    tail = ranked.join(
        F.broadcast(totals.withColumnRenamed("o_orderpriority", "__pr")),
        ranked["o_orderpriority"].eqNullSafe(F.col("__pr")),
    ).where(
        F.col("rank") <= F.expr(f"greatest(1, __n * {_TAIL_PCT} DIV 100)")
    )
    return (
        tail.groupBy("o_orderpriority")
        .agg(
            F.max("__n").cast("bigint").alias("n_orders"),
            F.count("*").cast("bigint").alias("n_tail"),
            F.min("price_cents").cast("bigint").alias("var_cents"),
            F.expr("SUM(price_cents) DIV COUNT(*)").alias("cvar_cents"),
            F.expr(
                "CAST(CAST(SUM(price_cents) AS DECIMAL(38,0)) * 1000000"
                " DIV MAX(__total) AS BIGINT)"
            ).alias("tail_share_ppm"),
        )
        .orderBy("o_orderpriority")
    )


_TAIL_DUCK = f"""
WITH o AS (
  SELECT o_orderpriority, price_cents, o_orderkey FROM (
    SELECT o_orderpriority,
           {money_rounded_sql('o_totalprice')} AS price_cents,
           o_orderkey
    FROM orders
  ) WHERE price_cents IS NOT NULL
), ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY price_cents DESC, o_orderkey) AS rk,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n,
         SUM(price_cents) OVER (PARTITION BY o_orderpriority) AS total
  FROM o
)
SELECT o_orderpriority,
       CAST(MAX(n) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_tail,
       CAST(MIN(price_cents) AS BIGINT) AS var_cents,
       CAST(SUM(price_cents) // COUNT(*) AS BIGINT) AS cvar_cents,
       CAST(CAST(SUM(price_cents) AS HUGEINT) * 1000000 // MAX(total)
            AS BIGINT) AS tail_share_ppm
FROM ranked
WHERE rk <= greatest(1, n * {_TAIL_PCT} // 100)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Null-safe equality join
# ---------------------------------------------------------------------------

_NS_SMALL = 25  # p_size cutoff for the "small parts" slice


def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (DataFrame ``eqNullSafe``, SQL ``<=>``
    / ``IS NOT DISTINCT FROM``): brand buckets where every brand
    outside the Brand#1x family maps to NULL, joined between the
    full-catalog profile and the small-parts slice. A plain equi-join
    silently drops the NULL bucket on both sides; the null-safe form
    matches NULL with NULL, so the "unbucketed rest" row survives
    with its counts — the semantics audits and SCD pipelines need for
    nullable business keys. Both sides are aggregates first (bounded
    key domains), so the NULL group never fans out."""
    part = load_table(spark, sf_dir, "part")
    bucket = F.when(
        F.col("p_brand").startswith("Brand#1"), F.col("p_brand")
    ).otherwise(F.lit(None))
    left = part.groupBy(bucket.alias("brand_bucket")).agg(
        F.count("*").alias("n_all")
    )
    right = (
        part.where(F.col("p_size") <= _NS_SMALL)
        .groupBy(bucket.alias("bb"))
        .agg(F.count("*").alias("n_small"))
    )
    return (
        left.join(right, left.brand_bucket.eqNullSafe(right.bb))
        .select(
            "brand_bucket",
            F.col("n_all").cast("bigint").alias("n_all"),
            F.col("n_small").cast("bigint").alias("n_small"),
            F.expr("n_small * 1000000 DIV n_all").alias("small_share_ppm"),
        )
        .orderBy(F.col("brand_bucket").asc_nulls_first())
    )


_NS_DUCK = f"""
WITH b AS (
  SELECT CASE WHEN p_brand LIKE 'Brand#1%' THEN p_brand END AS brand_bucket,
         p_size
  FROM part
), l AS (
  SELECT brand_bucket, COUNT(*) AS n_all FROM b GROUP BY brand_bucket
), r AS (
  SELECT brand_bucket AS bb, COUNT(*) AS n_small FROM b
  WHERE p_size <= {_NS_SMALL} GROUP BY brand_bucket
)
SELECT l.brand_bucket,
       CAST(l.n_all AS BIGINT) AS n_all,
       CAST(r.n_small AS BIGINT) AS n_small,
       CAST(r.n_small * 1000000 // l.n_all AS BIGINT) AS small_share_ppm
FROM l JOIN r ON l.brand_bucket IS NOT DISTINCT FROM r.bb
ORDER BY l.brand_bucket NULLS FIRST
"""


QUERIES = {
    "graph_connected_components": graph_connected_components,
    "agg_count_min_sketch": agg_count_min_sketch,
    "agg_tail_cvar": agg_tail_cvar,
    "join_null_safe": join_null_safe,
}

ORACLE = {
    "graph_connected_components": _CC_DUCK,
    "agg_count_min_sketch": _CMS_DUCK,
    "agg_tail_cvar": _TAIL_DUCK,
    "join_null_safe": _NS_DUCK,
}
