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

from ..sources.readers import load_table
from .relational7 import trade_edges_cached

# ---------------------------------------------------------------------------
# BFS reachability
# ---------------------------------------------------------------------------

_BFS_SEED = 0
_BFS_TOPK = 3
_BFS_ITERS = 4


def graph_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance from nation 0 over each nation's top-3 trade
    routes (by weight desc, dst asc — the deterministic ROW_NUMBER
    sparsifier). Four iterations of dist' = min(dist, min over
    in-edges of dist[src] + 1). The DATA-sized stage (the
    lineitem⋈orders edge aggregation) stays distributed and
    session-cached; the graph it yields is bounded by 25² nation
    pairs at ANY fact volume, so the four relaxation rounds run
    driver-side over that bounded summary (guide §1.2: the unrolled
    broadcast-join + lazy-localCheckpoint form scheduled ~27 tiny
    stage-jobs over ≤75 edges). The data-scale iterative shape lives
    where the graph is data-sized: ``graph_kcore_peeling`` /
    ``dedup_clusters``. Replication notes: the ROW_NUMBER order is
    (w DESC, dst ASC NULLS FIRST); a NULL src edge equi-joins no
    frontier row; a NULL dst node can never be re-attached by the
    left equi-join, so its distance stays NULL."""
    # bounded collect: ≤ nations² = 625 rows at any scale factor
    e_rows = trade_edges_cached(spark, sf_dir).collect()
    by_src: dict = {}
    for r in e_rows:
        by_src.setdefault(r["src"], []).append((r["dst"], r["w"]))
    edges = []
    for s, nbrs in by_src.items():
        nbrs.sort(
            key=lambda dw: (-dw[1], dw[0] is not None,
                            0 if dw[0] is None else dw[0])
        )
        edges.extend((s, d) for d, _w in nbrs[:_BFS_TOPK])
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    dist = {n: 0 if n == _BFS_SEED else None for n in nodes}
    for _ in range(_BFS_ITERS):
        frontier: dict = {}
        for s, d in edges:
            if s is not None and dist[s] is not None:
                nh = dist[s] + 1
                if d not in frontier or nh < frontier[d]:
                    frontier[d] = nh
        new_dist = {}
        for n in nodes:
            cur = dist[n]
            nh = frontier.get(n) if n is not None else None
            if cur is None or (nh is not None and nh < cur):
                new_dist[n] = nh if cur is None else min(cur, nh)
            else:
                new_dist[n] = cur
        dist = new_dist
    rows = [
        (n, dist[n])
        for n in sorted(nodes, key=lambda x: (x is not None,
                                              -1 if x is None else x))
    ]
    return spark.createDataFrame(rows, "nation int, hops int")


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
  -- dst ASC NULLS FIRST pins the w-tie order to Spark's ASC default
  -- (DuckDB defaults to NULLS LAST; reachable only when a hostile
  -- NULL-nationkey edge ties on w with a real edge)
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src
                            ORDER BY w DESC, dst ASC NULLS FIRST) AS rk
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
