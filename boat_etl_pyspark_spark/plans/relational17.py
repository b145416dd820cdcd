"""Round-4 batch 9: path semantics and inferential statistics
(SURVEY.md §2.9 graph / aggregation families; no reference
counterpart).

  * ``graph_bfs_reachability`` — multi-source-capable BFS (here: one
    seed) over the nation trade graph, sparsified to each nation's
    top-3 outgoing routes so hop distances are non-trivial. Four
    unrolled frontier expansions, each ONE broadcast join (the
    distance relation is node-sized) + a min-aggregate — the
    iterative join+agg shape that scales with graph diameter, not
    edge count, exactly like the PageRank and connected-components
    loops already in the library. Unreached nations report NULL.
  * ``agg_welch_ttest`` — Welch's unequal-variance t-test between
    the hash-split A/B arms over event values. Per-arm moments (n,
    Σx, Σx²) accumulate as exact integers in one map-combined pass;
    t and the Welch–Satterthwaite dof are fixed-shape double
    expressions over those integers, floored to milli units.
  * ``window_rolling_regression`` — per event-type rolling 7-day OLS
    slope of daily value over time (epoch-day x-axis). The five
    power sums live in ONE window frame (ROWS 6 PRECEDING), all
    integer; each row's slope is one double division. This is the
    trend-detection primitive: at 100 TB the daily rollup bounds the
    window input to (types x days) rows regardless of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.library import topk_per_group
from ..sources.readers import load_table
from . import track_persist
from .relational7 import trade_edges_cached

# ---------------------------------------------------------------------------
# BFS reachability
# ---------------------------------------------------------------------------

_BFS_SEED = 0
_BFS_TOPK = 3
_BFS_ITERS = 4


def graph_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance from nation 0 over each nation's top-3 trade
    routes (by weight desc, dst asc — deterministic sparsifier via
    the ``topk_per_group`` operator). Four unrolled iterations of
    dist' = min(dist, min over in-edges of dist[src] + 1); the
    distance relation is node-sized and broadcast into the edge join
    each round."""
    edges = track_persist(
        topk_per_group(
            trade_edges_cached(spark, sf_dir),
            ["src"],
            [F.desc("w"), F.asc("dst")],
            _BFS_TOPK,
        ).select("src", "dst")
    )
    nodes = track_persist(
        edges.select(F.col("src").alias("nation"))
        .union(edges.select(F.col("dst")))
        .distinct()
    )
    dist = nodes.withColumn(
        "hops",
        F.when(F.col("nation") == _BFS_SEED, F.lit(0).cast("int")).otherwise(
            F.lit(None).cast("int")
        ),
    )
    for _ in range(_BFS_ITERS):
        # dist is referenced TWICE per round (frontier build + merge
        # base); left alone, the duplicated subtree doubles every
        # iteration (2^k copies of the early stages — measured 5s on
        # a 75-edge graph). A lazy localCheckpoint cuts the lineage
        # each round, keeping the plan linear in rounds (measured
        # 1.1s; a persist chain is worse, 5.7s, because every cached
        # level still replans through InMemoryRelation). The
        # checkpointed relation is node-sized and freed with the RDD
        # reference.
        dist = dist.localCheckpoint(eager=False)
        frontier = (
            edges.join(
                F.broadcast(dist.where(F.col("hops").isNotNull())),
                edges.src == F.col("nation"),
            )
            .groupBy(F.col("dst").alias("nation"))
            .agg((F.min("hops") + 1).alias("new_hops"))
        )
        dist = (
            dist.join(F.broadcast(frontier), "nation", "left")
            .withColumn("hops", F.least("hops", "new_hops"))
            .withColumn(
                "hops", F.coalesce("hops", "new_hops").cast("int")
            )
            .drop("new_hops")
        )
    return dist.select(
        F.col("nation").cast("int").alias("nation"),
        F.col("hops").cast("int").alias("hops"),
    )


def _bfs_duck() -> str:
    expand = []
    prev = "d0"
    for k in range(1, _BFS_ITERS + 1):
        expand.append(
            f"""d{k} AS (
  SELECT n.nation,
         CAST(least(n.hops, f.new_hops) AS INT) AS hops
  FROM (SELECT nation, min(hops) AS hops FROM {prev} GROUP BY nation) n
  LEFT JOIN (
    SELECT e.dst AS nation, min(p.hops) + 1 AS new_hops
    FROM edges e JOIN (SELECT nation, min(hops) AS hops FROM {prev}
                       GROUP BY nation) p
      ON e.src = p.nation
    WHERE p.hops IS NOT NULL
    GROUP BY e.dst
  ) f ON n.nation = f.nation
)"""
        )
        prev = f"d{k}"
    joined = ",\n".join(expand)
    return f"""
WITH raw AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY s.s_nationkey, c.c_nationkey
), ranked AS (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rk
  FROM raw
), edges AS (
  SELECT src, dst FROM ranked WHERE rk <= {_BFS_TOPK}
), nodes AS (
  SELECT src AS nation FROM edges UNION SELECT dst FROM edges
), d0 AS (
  SELECT nation,
         CASE WHEN nation = {_BFS_SEED} THEN 0 ELSE NULL END AS hops
  FROM nodes
), {joined}
SELECT CAST(nation AS INT) AS nation, hops FROM {prev}
"""


# least-with-NULL parity: BOTH engines' least() skips NULL operands
# (returns the smallest non-NULL; NULL only when all operands are) —
# so the frontier merge needs no NULL gymnastics on either side.


# ---------------------------------------------------------------------------
# Welch's t-test
# ---------------------------------------------------------------------------

_WELCH_SPARK = """
WITH vals AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         TRY_CAST(round(value * 100) AS BIGINT) AS v
  FROM {events}
  WHERE event_type = 'purchase'
), arms AS (
  SELECT variant,
         COUNT(*) AS n,
         CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
         CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) AS s2
  FROM vals GROUP BY variant
), wide AS (
  SELECT
    max(CASE WHEN variant = 'A' THEN n END) AS na,
    max(CASE WHEN variant = 'A' THEN s1 END) AS s1a,
    max(CASE WHEN variant = 'A' THEN s2 END) AS s2a,
    max(CASE WHEN variant = 'B' THEN n END) AS nb,
    max(CASE WHEN variant = 'B' THEN s1 END) AS s1b,
    max(CASE WHEN variant = 'B' THEN s2 END) AS s2b
  FROM arms
), stats AS (
  SELECT na, nb,
         CAST(s1a AS DOUBLE) / na AS ma,
         CAST(s1b AS DOUBLE) / nb AS mb,
         (CAST(na AS DOUBLE) * CAST(s2a AS DOUBLE)
          - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE))
           / (CAST(na AS DOUBLE) * (na - 1) * na) AS sea,
         (CAST(nb AS DOUBLE) * CAST(s2b AS DOUBLE)
          - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE))
           / (CAST(nb AS DOUBLE) * (nb - 1) * nb) AS seb
  FROM wide
)
SELECT CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       CAST(floor(ma * 10) AS BIGINT) AS mean_a_deci_cents,
       CAST(floor(mb * 10) AS BIGINT) AS mean_b_deci_cents,
       CAST(floor((ma - mb) / sqrt(sea + seb) * 1000) AS BIGINT)
         AS t_milli,
       CAST(floor((sea + seb) * (sea + seb)
                  / (sea * sea / (na - 1) + seb * seb / (nb - 1))
                  * 1000) AS BIGINT) AS dof_milli
FROM stats
"""

_WELCH_DUCK = """
WITH vals AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         TRY_CAST(round(value * 100) AS BIGINT) AS v
  FROM events
  WHERE event_type = 'purchase'
), arms AS (
  SELECT variant,
         COUNT(*) AS n,
         SUM(CAST(v AS HUGEINT)) AS s1,
         SUM(CAST(v AS HUGEINT) * v) AS s2
  FROM vals GROUP BY variant
), wide AS (
  SELECT
    max(CASE WHEN variant = 'A' THEN n END) AS na,
    max(CASE WHEN variant = 'A' THEN s1 END) AS s1a,
    max(CASE WHEN variant = 'A' THEN s2 END) AS s2a,
    max(CASE WHEN variant = 'B' THEN n END) AS nb,
    max(CASE WHEN variant = 'B' THEN s1 END) AS s1b,
    max(CASE WHEN variant = 'B' THEN s2 END) AS s2b
  FROM arms
), stats AS (
  SELECT na, nb,
         CAST(s1a AS DOUBLE) / na AS ma,
         CAST(s1b AS DOUBLE) / nb AS mb,
         (CAST(na AS DOUBLE) * CAST(s2a AS DOUBLE)
          - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE))
           / (CAST(na AS DOUBLE) * (na - 1) * na) AS sea,
         (CAST(nb AS DOUBLE) * CAST(s2b AS DOUBLE)
          - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE))
           / (CAST(nb AS DOUBLE) * (nb - 1) * nb) AS seb
  FROM wide
)
SELECT CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       CAST(floor(ma * 10) AS BIGINT) AS mean_a_deci_cents,
       CAST(floor(mb * 10) AS BIGINT) AS mean_b_deci_cents,
       CAST(floor((ma - mb) / sqrt(sea + seb) * 1000) AS BIGINT)
         AS t_milli,
       CAST(floor((sea + seb) * (sea + seb)
                  / (sea * sea / (na - 1) + seb * seb / (nb - 1))
                  * 1000) AS BIGINT) AS dof_milli
FROM stats
"""


def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t between the two hash-split arms on purchase values:
    integer cent moments in one aggregate, a 2-row pivot, then
    fixed-shape double math for t and the Satterthwaite dof."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r17_welch_events"
    )
    return spark.sql(_WELCH_SPARK.format(events="r17_welch_events"))


# ---------------------------------------------------------------------------
# Rolling regression
# ---------------------------------------------------------------------------

_ROLLREG_SPARK = """
WITH daily AS (
  SELECT event_type,
         CAST(datediff(CAST(date_trunc('day', ts) AS DATE),
                       DATE '1970-01-01') AS BIGINT) AS x,
         CAST(SUM(TRY_CAST(round((CASE WHEN value BETWEEN -1.0e12 AND 1.0e12
                          THEN value END) * 100) AS BIGINT)) AS BIGINT) AS y
  FROM {events}
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
), sums AS (
  SELECT event_type, x, y,
         COUNT(*) OVER w AS n,
         SUM(x) OVER w AS sx,
         SUM(y) OVER w AS sy,
         SUM(x * x) OVER w AS sxx,
         SUM(x * y) OVER w AS sxy
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY x
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type,
       x AS epoch_day,
       y AS day_cents,
       CASE WHEN n = 7 AND n * sxx - sx * sx > 0
            THEN CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                            / CAST(n * sxx - sx * sx AS DOUBLE) * 1000)
                 AS BIGINT)
            ELSE NULL END AS slope_milli_cents_per_day
FROM sums
"""

_ROLLREG_DUCK = """
WITH daily AS (
  SELECT event_type,
         CAST(datediff('day', DATE '1970-01-01',
                       CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         CAST(SUM(TRY_CAST(round((CASE WHEN value BETWEEN -1.0e12 AND 1.0e12
                          THEN value END) * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
), sums AS (
  SELECT event_type, x, y,
         COUNT(*) OVER w AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS sx,
         CAST(SUM(y) OVER w AS BIGINT) AS sy,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
         CAST(SUM(x * y) OVER w AS BIGINT) AS sxy
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY x
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type,
       x AS epoch_day,
       y AS day_cents,
       CASE WHEN n = 7 AND n * sxx - sx * sx > 0
            THEN CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                            / CAST(n * sxx - sx * sx AS DOUBLE) * 1000)
                 AS BIGINT)
            ELSE NULL END AS slope_milli_cents_per_day
FROM sums
"""


def window_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day OLS slope of daily purchase volume per event
    type. Daily rollup bounds the window input to (types x days)
    rows; the five power sums share one frame on one event_type
    exchange; slope is a single guarded double division per row.

    Out-of-domain values (|value| > contract.VALUE_DOMAIN_DOLLARS)
    contribute like NULL — value-level, so hostile rows still create
    their day — keeping the x*y / sy*sx power-sum products exact
    INT64 in both engines (DuckDB throws on overflow, Spark wraps)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r17_rollreg_events"
    )
    return spark.sql(_ROLLREG_SPARK.format(events="r17_rollreg_events"))


QUERIES = {
    "graph_bfs_reachability": graph_bfs_reachability,
    "agg_welch_ttest": agg_welch_ttest,
    "window_rolling_regression": window_rolling_regression,
}

ORACLE = {
    "graph_bfs_reachability": _bfs_duck(),
    "agg_welch_ttest": _WELCH_DUCK,
    "window_rolling_regression": _ROLLREG_DUCK,
}
