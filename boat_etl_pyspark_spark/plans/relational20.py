"""Round-5 batch 2: behavioral-sequence and distribution-drift
operators (SURVEY.md §2.9 event / validation families; no reference
counterpart).

  * ``events_user_journey_paths`` — top 3-step event-type paths
    (the product-analytics "user journey" rollup): two LEADs on one
    user_id exchange form the trigrams, a hash aggregate counts
    occurrences and distinct users per path, and the global top-20
    rides TakeOrderedAndProject — no full sort at any scale.
  * ``validate_drift_psi`` — Population Stability Index between two
    table eras over fixed equal-width value buckets: ONE
    conditional-aggregation scan builds both eras' histograms, a
    1-row re-aggregate broadcasts the totals, and each bucket's PSI
    term is floored to nano units (the op's declared precision)
    before summing — the standard drift monitor between a reference
    snapshot and fresh data, order-independent at any parallelism.
  * ``events_time_to_convert`` — per-user latency from first view to
    first subsequent purchase, summarized as conversion counts plus
    EXACT median seconds via the distributed ``global_rank``
    primitive (doubled-median contract for even counts) — never a
    single-partition sort over user latencies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .contract import money_rounded_sql

# ---------------------------------------------------------------------------
# User journey paths (top event-type trigrams)
# ---------------------------------------------------------------------------

_JOURNEY_TOPK = 20

_JOURNEY_CORE = f"""
WITH s AS (
  SELECT user_id,
         event_type AS e1,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM {{events}}
  WINDOW w AS (PARTITION BY user_id ORDER BY {{epoch_us}}, event_id)
), p AS (
  SELECT user_id, e1 || '>' || e2 || '>' || e3 AS path
  FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
)
SELECT path,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM p
GROUP BY path
ORDER BY n_occurrences DESC, path
LIMIT {_JOURNEY_TOPK}
"""


def events_user_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top {_JOURNEY_TOPK} 3-step event-type sequences across all user
    timelines. Both LEADs share one user_id window frame (single
    exchange), paths hash-aggregate with map-side combine, and the
    deterministic top-k (count desc, path asc) plans as
    TakeOrderedAndProject — per-partition heaps, never a global
    sort."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r20_journey_events"
    )
    return spark.sql(
        _JOURNEY_CORE.format(
            events="r20_journey_events", epoch_us="unix_micros(ts)"
        )
    )


_JOURNEY_DUCK = _JOURNEY_CORE.format(events="events", epoch_us="epoch_us(ts)")


# ---------------------------------------------------------------------------
# Population Stability Index (distribution drift between eras)
# ---------------------------------------------------------------------------

# fixed bucket domain: TPC-H o_totalprice spans ~[900, 560k] by spec at
# every scale factor, so 10 equal-width buckets over [0, 600k) (in
# cents: 60M) are scale-invariant — no data-dependent bounds needed
_PSI_DOMAIN_CENTS = 60_000_000
_PSI_BUCKETS = 10
_PSI_SPLIT_DATE = "1996-01-01"  # era boundary inside TPC-H's 1992-1998 span

_PSI_CORE = f"""
WITH b AS (
  SELECT CASE WHEN o_orderdate < DATE '{_PSI_SPLIT_DATE}' THEN 0 ELSE 1 END
           AS era,
         LEAST({money_rounded_sql('o_totalprice')}
               * {_PSI_BUCKETS} {{div}} {_PSI_DOMAIN_CENTS},
               {_PSI_BUCKETS - 1}) AS bucket
  FROM {{orders}}
), c AS (
  -- corrupt (domain-bounded-out) money has no bucket: NULL buckets
  -- are excluded so the histograms count real values only
  SELECT bucket,
         SUM(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS n_ref,
         SUM(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS n_cur
  FROM b WHERE bucket IS NOT NULL GROUP BY bucket
), ct AS (
  -- totals as windows over the <=10-row bucket relation: a
  -- re-aggregate + cross join would recompute c (and rescan orders)
  SELECT bucket, n_ref, n_cur,
         SUM(n_ref) OVER () AS tr, SUM(n_cur) OVER () AS tc,
         COUNT(*) OVER () AS nb
  FROM c
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cur AS BIGINT) AS n_cur,
       CAST(floor((CAST(n_cur + 1 AS DOUBLE) / (tc + nb)
                   - CAST(n_ref + 1 AS DOUBLE) / (tr + nb))
                  * ln((CAST(n_cur + 1 AS DOUBLE) / (tc + nb))
                       / (CAST(n_ref + 1 AS DOUBLE) / (tr + nb)))
                  * 1e9) AS BIGINT) AS psi_nano
FROM ct
"""


def validate_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI of the order-value distribution, pre-1996 era vs since:
    (p_cur - p_ref) * ln(p_cur / p_ref) per fixed equal-width bucket,
    +1-smoothed so empty buckets stay finite, each term floored to
    nano units before any summing (total PSI = sum of psi_nano
    downstream). Both histograms come from ONE conditional-agg scan;
    totals are windows over the 10-row bucket relation (never a
    second fact pass). ln() is the same libm double in
    both engines — verified bit-identical earlier in this repo."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r20_psi_orders"
    )
    return spark.sql(_PSI_CORE.format(orders="r20_psi_orders", div="DIV"))


_PSI_DUCK = _PSI_CORE.format(orders="orders", div="//")


# ---------------------------------------------------------------------------
# Time to convert (first view -> first subsequent purchase)
# ---------------------------------------------------------------------------


def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user seconds from FIRST view to FIRST purchase at or after
    it, rolled up to the funnel-latency summary: viewers, converters,
    conversion ppm, and the EXACT median latency (reported doubled so
    even-count medians stay integral). The per-user reduction is one
    map-combined conditional aggregate — min view ts, min purchase ts
    after that view — and the median uses the distributed rank
    primitive, so no step sorts all users in one task."""
    from ..operators.library import global_rank
    from . import track_persist

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    # persisted: consumed by the viewer count, the latency join, and
    # (transitively) the rank pass
    per_user = track_persist(
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias(
                "first_view"
            ),
        )
        .where(F.col("first_view").isNotNull())
    )
    # first purchase AT/AFTER the first view needs the purchase stream
    # again (min over a condition on another aggregate): one self-join
    # free pass — re-aggregate with the view time joined back in would
    # shuffle twice; instead compute min purchase >= first_view via a
    # second conditional aggregate over the SAME user_id exchange.
    # persisted: consumed by the converter count AND the rank pass
    lat = track_persist(
        ev.where(F.col("event_type") == "purchase")
        .join(per_user.select("user_id", "first_view"), "user_id")
        .where(F.col("us") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(
            F.expr("CAST((min(us) - min(first_view)) DIV 1000000 AS BIGINT)")
            .alias("delta_s")
        )
    )
    n_viewers = per_user.count()  # bounded scalar
    n_conv = lat.count()  # bounded scalar
    if n_conv == 0:
        return spark.createDataFrame(
            [(n_viewers, 0, 0, None)],
            "n_viewers bigint, n_converters bigint, "
            "conversion_ppm bigint, median_2x_delta_s bigint",
        )
    ranked = global_rank(lat, ["delta_s", "user_id"], rows=n_conv)
    lo, hi = (n_conv + 1) // 2, (n_conv + 2) // 2
    return ranked.where(F.col("rank").isin(lo, hi)).agg(
        F.lit(n_viewers).cast("bigint").alias("n_viewers"),
        F.lit(n_conv).cast("bigint").alias("n_converters"),
        F.lit(n_conv * 1_000_000 // n_viewers)
        .cast("bigint")
        .alias("conversion_ppm"),
        F.sum(F.col("delta_s") * F.lit(2) / F.lit(hi - lo + 1))
        .cast("bigint")
        .alias("median_2x_delta_s"),
    )


_TTC_DUCK = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
), pu AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN us END) AS first_view
  FROM ev GROUP BY user_id
  HAVING MIN(CASE WHEN event_type = 'view' THEN us END) IS NOT NULL
), lat AS (
  SELECT e.user_id,
         CAST((MIN(e.us) - MIN(p.first_view)) // 1000000 AS BIGINT)
           AS delta_s
  FROM ev e JOIN pu p ON e.user_id = p.user_id
  WHERE e.event_type = 'purchase' AND e.us >= p.first_view
  GROUP BY e.user_id
), r AS (
  SELECT delta_s,
         ROW_NUMBER() OVER (ORDER BY delta_s, user_id) AS rank,
         COUNT(*) OVER () AS n
  FROM lat
)
SELECT CAST((SELECT COUNT(*) FROM pu) AS BIGINT) AS n_viewers,
       CAST(COALESCE(MAX(n), 0) AS BIGINT) AS n_converters,
       -- zero-converter / zero-viewer coalescing mirrors the plan's
       -- explicit literal row (n_viewers, 0, 0, NULL): without it the
       -- empty aggregate emits NULLs where Spark emits zeros (caught
       -- by the single-row parity net)
       CAST(CASE WHEN (SELECT COUNT(*) FROM pu) = 0 THEN 0
                 ELSE COALESCE(MAX(n), 0) * 1000000
                      // (SELECT COUNT(*) FROM pu) END AS BIGINT)
         AS conversion_ppm,
       CAST(SUM(delta_s * 2 / ((n + 2) // 2 - (n + 1) // 2 + 1)) AS BIGINT)
         AS median_2x_delta_s
FROM r
WHERE rank IN ((n + 1) // 2, (n + 2) // 2)
"""


QUERIES = {
    "events_user_journey_paths": events_user_journey_paths,
    "validate_drift_psi": validate_drift_psi,
    "events_time_to_convert": events_time_to_convert,
}

ORACLE = {
    "events_user_journey_paths": _JOURNEY_DUCK,
    "validate_drift_psi": _PSI_DUCK,
    "events_time_to_convert": _TTC_DUCK,
}
