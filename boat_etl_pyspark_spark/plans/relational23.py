"""Round-5 batch 5: marketing attribution and survival analysis
(SURVEY.md §2.9 event / aggregation families; no reference
counterpart).

  * ``events_multitouch_attribution`` — first-touch / last-touch /
    linear credit for every purchase over the user's view/click/
    signup touches in the preceding 24h. One user_id-keyed range join
    (the as-of family's bounded shape — per-user activity windows,
    never a cross join) and two rank windows per purchase; credits
    are integer milli-units so every model sums exactly.
  * ``agg_survival_kaplan_meier`` — Kaplan-Meier product-limit
    survival curve for "days until a user's first error", censoring
    users without one at their last activity. The at-risk counts come
    from ONE cumulative window over the per-duration exit counts (no
    correlated subquery, no per-time rescan), and the product-limit
    runs as an ordered ln-sum — the curve relation is bounded by
    distinct durations (days), not users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from ..sources.readers import load_table

# ---------------------------------------------------------------------------
# Multi-touch attribution
# ---------------------------------------------------------------------------

_ATTR_WINDOW_US = 24 * 3600 * 1_000_000
_ATTR_CHANNELS = "('view', 'click', 'signup')"

_ATTR_CORE = f"""
WITH t AS (
  SELECT user_id, event_id, {{epoch_us}} AS us, event_type
  FROM {{events}}
), p AS (
  SELECT user_id, event_id AS purchase_id, us AS pus
  FROM t WHERE event_type = 'purchase'
), touch AS (
  SELECT p.purchase_id, t.event_type AS channel,
         ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                            ORDER BY t.us, t.event_id) AS rk_first,
         ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                            ORDER BY t.us DESC, t.event_id DESC) AS rk_last,
         COUNT(*) OVER (PARTITION BY p.purchase_id) AS nt
  FROM p JOIN t
    ON p.user_id = t.user_id
   AND t.event_type IN {_ATTR_CHANNELS}
   AND t.us < p.pus
   AND t.us >= p.pus - {_ATTR_WINDOW_US}
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(CASE WHEN rk_first = 1 THEN 1000 ELSE 0 END) AS BIGINT)
         AS first_touch_milli,
       CAST(SUM(CASE WHEN rk_last = 1 THEN 1000 ELSE 0 END) AS BIGINT)
         AS last_touch_milli,
       CAST(SUM(1000 {{div}} nt) AS BIGINT) AS linear_milli
FROM touch
GROUP BY channel
"""


def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel conversion credit under the three standard
    attribution models, milli-credits per purchase (linear credit is
    floor(1000/nt) per touch — the declared integer contract, so a
    3-touch purchase distributes 999). The purchase-touch pairing is
    a user-keyed time-range join — work bounded by per-user activity
    in 24h windows — and both rank windows share the purchase_id
    exchange."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r23_attr_events"
    )
    return spark.sql(
        _ATTR_CORE.format(
            events="r23_attr_events", epoch_us="unix_micros(ts)", div="DIV"
        )
    )


_ATTR_DUCK = _ATTR_CORE.format(
    events="events", epoch_us="epoch_us(ts)", div="//"
)


# ---------------------------------------------------------------------------
# Kaplan-Meier survival
# ---------------------------------------------------------------------------

_KM_CORE = """
WITH t AS (
  SELECT user_id, {epoch_us} AS us, event_type FROM {events}
), u AS (
  SELECT user_id,
         MIN(us) AS start_us,
         MIN(CASE WHEN event_type = 'error' THEN us END) AS fail_us,
         MAX(us) AS last_us
  FROM t GROUP BY user_id
), d AS (
  SELECT CASE WHEN fail_us IS NOT NULL
              THEN (fail_us - start_us) {div} 86400000000
              ELSE (last_us - start_us) {div} 86400000000 END AS dur_d,
         (fail_us IS NOT NULL) AS failed
  FROM u
), alld AS (
  SELECT dur_d, COUNT(*) AS exits,
         SUM(CASE WHEN failed THEN 1 ELSE 0 END) AS ev
  FROM d GROUP BY dur_d
), r AS (
  SELECT dur_d, ev, exits,
         SUM(exits) OVER (ORDER BY dur_d
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS exited_before,
         SUM(exits) OVER () AS total
  FROM alld
), km AS (
  SELECT dur_d, ev, total - coalesce(exited_before, 0) AS n
  FROM r WHERE ev > 0
), s AS (
  -- a day where every remaining subject fails (ev = n) drives S to
  -- exactly 0 and keeps it there; ln(0) must never be evaluated
  -- (DuckDB errors, Spark silently NULLs — both wrong)
  SELECT dur_d, ev, n,
         CASE WHEN MAX(CASE WHEN ev >= n THEN 1 ELSE 0 END)
                   OVER (ORDER BY dur_d ROWS UNBOUNDED PRECEDING) = 1
              THEN 0.0
              ELSE exp(SUM(CASE WHEN ev < n
                                THEN ln(1.0 - CAST(ev AS DOUBLE) / n) END)
                       OVER (ORDER BY dur_d ROWS UNBOUNDED PRECEDING))
         END AS surv
  FROM km
)
SELECT CAST(dur_d AS BIGINT) AS day,
       CAST(n AS BIGINT) AS n_risk,
       CAST(ev AS BIGINT) AS n_events,
       CAST(floor(surv * 1e6) AS BIGINT) AS survival_micro
FROM s
"""


def agg_survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier estimate of S(t) for days-to-first-error per
    user, right-censored at last activity. n_at_risk(t) = total −
    exits-before-t comes from one cumulative window over per-day exit
    counts; the product limit is an ordered ln-sum (identical
    evaluation order on both engines, exp(−inf)→0 when a day wipes
    the risk set). All heavy lifting is the per-user aggregate; the
    curve math runs on a relation bounded by distinct days."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r23_km_events"
    )
    return spark.sql(
        _KM_CORE.format(
            events="r23_km_events", epoch_us="unix_micros(ts)", div="DIV"
        )
    )


_KM_DUCK = _KM_CORE.format(events="events", epoch_us="epoch_us(ts)", div="//")


QUERIES = {
    "events_multitouch_attribution": events_multitouch_attribution,
    "agg_survival_kaplan_meier": agg_survival_kaplan_meier,
}

ORACLE = {
    "events_multitouch_attribution": _ATTR_DUCK,
    "agg_survival_kaplan_meier": _KM_DUCK,
}
