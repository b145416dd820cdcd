"""Round-5 batch 2: behavioral-sequence operators (SURVEY.md §2.9
event family; no reference counterpart).

  * ``events_user_journey_paths`` — top 3-step event-type paths
    (the product-analytics "user journey" rollup): two LEADs on one
    user_id exchange form the trigrams, a hash aggregate counts
    occurrences and distinct users per path, and the global top-20
    rides TakeOrderedAndProject — no full sort at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

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


QUERIES = {
    "events_user_journey_paths": events_user_journey_paths,
}

ORACLE = {
    "events_user_journey_paths": _JOURNEY_DUCK,
}
