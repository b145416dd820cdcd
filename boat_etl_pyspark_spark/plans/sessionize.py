"""Behavioral sessionization and incremental-aggregate maintenance.

Two operator shapes every event-analytics / training-data platform
needs that the reference engine lacks (SURVEY.md §2.9 extensions):

- ``events_sessionize``: gap-based sessionization — assign every event
  to a session that closes after 6 idle hours, then aggregate each
  session. The classic formulation (lag → boundary flag → running sum)
  is a single hash exchange on ``user_id``: the lag window, the
  session-number window, and the map-side partial of the final
  aggregate all reuse that one partitioning; only already-aggregated
  session rows cross the wire a second time. At 100 TB the exchange is
  bounded by user cardinality, not event count, and skewed users are
  split by AQE.

- ``agg_incremental_mv_merge``: materialized-view maintenance — a
  frozen "base" aggregate over the historical prefix plus a "delta"
  aggregate over new arrivals, merged by re-aggregating the partials
  (SUM of sums, SUM of counts; AVG derived at the end, never merged).
  This is the 100 TB pattern for keeping a dashboard aggregate fresh
  without rescanning history: the base never recomputes, the delta
  scan is bounded by the new partition, and because the partials are
  integer cents the merge is bit-identical to a full recompute at any
  parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import cents
from ..sources.readers import load_table

# Sessions close after 6 idle hours (the fixture's median per-user gap
# is ~7.3h, so this yields a realistic mix of multi-event sessions and
# singletons).
_GAP_US = 6 * 3600 * 1_000_000


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ts drives window ORDER BY and user_id the partition key; a NULL
    # in either meets opposite engine defaults (Spark NULLS FIRST asc,
    # DuckDB NULLS LAST) — dropped symmetrically with the oracle.
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.unix_micros("ts").alias("t_us"),
            "event_id",
            cents(F.col("value")).alias("value_cents"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(F.col("t_us") - F.lag("t_us").over(w) > _GAP_US, 1)
        .when(F.lag("t_us").over(w).isNull(), 1)
        .otherwise(0),
    )
    numbered = flagged.withColumn("session_seq", F.sum("new_session").over(w))
    return numbered.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("t_us").alias("t_start_us"),
        F.max("t_us").alias("t_end_us"),
        F.sum("value_cents").alias("value_cents"),
    )


_SESSIONIZE_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id,
         TRY_CAST(ROUND(value * 100) AS BIGINT) AS value_cents
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
flagged AS (
  SELECT *,
         CASE WHEN t_us - LAG(t_us) OVER w > {_GAP_US} THEN 1
              WHEN LAG(t_us) OVER w IS NULL THEN 1
              ELSE 0 END AS new_session
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
),
numbered AS (
  SELECT *,
         CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY t_us, event_id) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       COUNT(*) AS n_events,
       MIN(t_us) AS t_start_us,
       MAX(t_us) AS t_end_us,
       CAST(SUM(value_cents) AS BIGINT) AS value_cents
FROM numbered
GROUP BY user_id, session_seq
"""

# The "historical prefix" boundary for the MV-merge demo: events
# strictly before this date are the frozen base, the rest the delta.
_MV_CUTOFF = "2024-03-01"


def agg_incremental_mv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the MV boundary IS the time partition: a NULL-ts row falls in
    # neither base nor delta, so the merge would silently lose it while
    # the full-recompute oracle counts it — dropped symmetrically.
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.to_date("ts").alias("d"),
            cents(F.col("value")).alias("value_cents"),
        )
    )

    def partial(df: DataFrame) -> DataFrame:
        # Mergeable partials only: sums and counts. AVG is derived
        # after the merge — merging averages is the classic MV bug.
        return df.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.count("value_cents").alias("n_valued"),
            F.sum("value_cents").alias("value_cents"),
        )

    base = partial(ev.where(F.col("d") < F.lit(_MV_CUTOFF)))
    delta = partial(ev.where(F.col("d") >= F.lit(_MV_CUTOFF)))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("n_valued").alias("n_valued"),
            F.sum("value_cents").alias("value_cents"),
        )
    )
    return merged.select(
        "event_type",
        "n_events",
        "value_cents",
        (F.col("value_cents").cast("double") / (F.col("n_valued") * 100.0)).alias(
            "avg_value"
        ),
    )


# The oracle is the FULL recompute — the whole point of the merge is
# that base+delta re-aggregation equals a single pass over everything.
_MV_MERGE_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(TRY_CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(SUM(TRY_CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
         / (COUNT(TRY_CAST(ROUND(value * 100) AS BIGINT)) * 100.0)
         AS avg_value
FROM events
WHERE ts IS NOT NULL
GROUP BY event_type
"""

QUERIES = {
    "events_sessionize": events_sessionize,
    "agg_incremental_mv_merge": agg_incremental_mv_merge,
}

ORACLE = {
    "events_sessionize": _SESSIONIZE_SQL,
    "agg_incremental_mv_merge": _MV_MERGE_SQL,
}
