"""Round-4 batch 10: native recursive CTE (SURVEY.md §2.9 graph /
subquery families; no reference counterpart).

``graph_recursive_route_cost`` exercises Spark 4's WITH RECURSIVE
support — the declarative dual of the library's unrolled iterative
loops (PageRank, connected components, BFS): the engine owns the
fixpoint execution instead of the plan author. Semantics differ from
``graph_bfs_reachability`` on purpose: over the same top-3-routes
graph it enumerates ALL paths from the seed up to 3 hops and
aggregates per destination — minimum hops, minimum additive route
cost (integer rarity cost 1e6 DIV weight per edge), and the path
count. Both engines run the IDENTICAL recursive SQL text, so the
oracle is the strongest possible parity check of the feature.

Scale posture: depth is bounded in the recursion (hops < 3), so the
working relation is (paths ≤ depth)-sized — with out-degree capped
at 3 by the sparsifier that is ≤ 3+9+27 rows per seed. The edge
relation itself comes from the shared session cache
(``trade_edges_cached``); the recursion never touches the fact
tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.library import topk_per_group
from .relational7 import trade_edges_cached

_SEED = 3  # has out-edges at every fixture scale (nation 0 does not at sf0.001)
_MAX_HOPS = 3
_TOPK = 3

_RECURSIVE_SQL = f"""
WITH RECURSIVE routes(dst, hops, cost) AS (
  SELECT dst, 1 AS hops, CAST(1000000 DIV w AS BIGINT) AS cost
  FROM {{edges}} WHERE src = {_SEED}
  UNION ALL
  SELECT e.dst, r.hops + 1, r.cost + CAST(1000000 DIV e.w AS BIGINT)
  FROM routes r JOIN {{edges}} e ON r.dst = e.src
  WHERE r.hops < {_MAX_HOPS}
)
SELECT CAST(dst AS INT) AS nation,
       CAST(min(hops) AS INT) AS min_hops,
       CAST(min(cost) AS BIGINT) AS min_cost,
       CAST(COUNT(*) AS BIGINT) AS n_paths
FROM routes
GROUP BY dst
"""

_RECURSIVE_DUCK = f"""
WITH RECURSIVE edges AS (
  SELECT src, dst, w FROM (
    SELECT src, dst, w,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rk
    FROM (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY s.s_nationkey, c.c_nationkey
    )
  ) WHERE rk <= {_TOPK}
), routes(dst, hops, cost) AS (
  SELECT dst, 1 AS hops, CAST(1000000 // w AS BIGINT) AS cost
  FROM edges WHERE src = {_SEED}
  UNION ALL
  SELECT e.dst, r.hops + 1, r.cost + CAST(1000000 // e.w AS BIGINT)
  FROM routes r JOIN edges e ON r.dst = e.src
  WHERE r.hops < {_MAX_HOPS}
)
SELECT CAST(dst AS INT) AS nation,
       CAST(min(hops) AS INT) AS min_hops,
       CAST(min(cost) AS BIGINT) AS min_cost,
       CAST(COUNT(*) AS BIGINT) AS n_paths
FROM routes
GROUP BY dst
"""


def graph_recursive_route_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All trade routes from the seed nation (``_SEED`` = 3, chosen
    because it has out-edges at every fixture scale) up to 3 hops via Spark 4's
    native WITH RECURSIVE, aggregated per destination (min hops, min
    additive rarity cost, path count). The engine owns the fixpoint;
    the recursion is bounded by the hops predicate and the
    sparsified, session-cached edge relation."""
    edges = topk_per_group(
        trade_edges_cached(spark, sf_dir),
        ["src"],
        [F.desc("w"), F.asc("dst")],
        _TOPK,
    ).select("src", "dst", "w")
    edges.createOrReplaceTempView("r18_routes_edges")
    return spark.sql(_RECURSIVE_SQL.format(edges="r18_routes_edges"))


# ---------------------------------------------------------------------------
# Nearest-in-time as-of join (bidirectional, with tolerance)
# ---------------------------------------------------------------------------

_NEAREST_TOL_US = 2 * 3600 * 1_000_000  # 2 hours

_NEAREST_CORE = f"""
WITH tagged AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS kind
  FROM {{events}} WHERE event_type IN ('view', 'purchase')
), fenced AS (
  SELECT event_id, user_id, ts, kind,
         max(CASE WHEN kind = 0 THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, kind, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view,
         min(CASE WHEN kind = 0 THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, kind, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_view
  FROM tagged
), deltas AS (
  SELECT event_id AS purchase_id, user_id,
         {{us}}(ts) AS purchase_ts_us,
         {{us}}(ts) - {{us}}(prev_view) AS back_us,
         {{us}}(next_view) - {{us}}(ts) AS fwd_us
  FROM fenced WHERE kind = 1
)
SELECT purchase_id, user_id, purchase_ts_us,
       CASE
         WHEN back_us IS NOT NULL AND back_us <= {_NEAREST_TOL_US}
              AND (fwd_us IS NULL OR back_us <= fwd_us
                   OR fwd_us > {_NEAREST_TOL_US})
           THEN purchase_ts_us - back_us
         WHEN fwd_us IS NOT NULL AND fwd_us <= {_NEAREST_TOL_US}
           THEN purchase_ts_us + fwd_us
         ELSE NULL
       END AS nearest_view_ts_us,
       CASE
         WHEN back_us IS NOT NULL AND back_us <= {_NEAREST_TOL_US}
              AND (fwd_us IS NULL OR back_us <= fwd_us
                   OR fwd_us > {_NEAREST_TOL_US})
           THEN 'backward'
         WHEN fwd_us IS NOT NULL AND fwd_us <= {_NEAREST_TOL_US}
           THEN 'forward'
         ELSE NULL
       END AS direction
FROM deltas
"""

_NEAREST_SPARK = _NEAREST_CORE.format(events="{events}", us="unix_micros")
_NEAREST_DUCK = _NEAREST_CORE.format(events="events", us="epoch_us")


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join with a ±2h tolerance: every purchase
    matches its closest same-user view in EITHER direction (ties and
    equal distances prefer the earlier/backward view). Both direction
    fences come from one tagged union + ONE user_id window exchange —
    two frame-restricted conditional extrema, no N×M interval
    expansion, same scale shape as the backward-only ``asof_join``
    primitive. Purchases with no view inside the tolerance survive
    with NULLs (left-outer semantics)."""
    from ..sources.readers import load_table as _lt

    _lt(spark, sf_dir, "events").createOrReplaceTempView("r18_nearest_events")
    return spark.sql(_NEAREST_SPARK.format(events="r18_nearest_events"))


QUERIES = {
    "graph_recursive_route_cost": graph_recursive_route_cost,
    "join_asof_nearest": join_asof_nearest,
}
ORACLE = {
    "graph_recursive_route_cost": _RECURSIVE_DUCK,
    "join_asof_nearest": _NEAREST_DUCK,
}
