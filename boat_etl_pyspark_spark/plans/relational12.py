"""Round-4 batch 3: time-series bars, hierarchy rollups, sequence
patterns, and malformed-record quarantine.

  * ``ts_ohlc_bars`` — OHLC downsampling: 6-hour bars per event type
    with open/high/low/close/volume. Open/close are picked by
    row_number over (ts, event_id) so ties are deterministic; one
    exchange on (type, bar).
  * ``graph_hierarchy_rollup`` — subtree aggregation over a synthetic
    customer hierarchy (parent = custkey DIV 10). Because the
    ancestor chain has the CLOSED FORM ancestor_k = custkey DIV 10^k,
    the transitive closure is a 6-way explode + one aggregate — zero
    joins, zero iterations. The general lesson for 100 TB
    hierarchies: when the encoding gives ancestors algebraically
    (materialized-path / interval / Dewey ids), rollup is one scan;
    recursive joins are the fallback, not the default.
  * ``events_pattern_vshape`` — MATCH_RECOGNIZE-style sequence
    pattern: per user, count strict V-shapes (down, then up) in the
    value series — two lags over one user-time window.
  * ``io_corrupt_record_quarantine`` — ingestion with a dead-letter
    path: a JSON-lines batch with deterministically corrupted records
    is read in PERMISSIVE mode with ``columnNameOfCorruptRecord``;
    good rows aggregate per lang, corrupt rows are counted into a
    quarantine row. The oracle reproduces the corruption rule from
    the original table — a match proves no record was lost OR
    misclassified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.numeric import cents
from ..sources.readers import load_table
from .io_plans import _tmp

# ---------------------------------------------------------------------------
# OHLC bars
# ---------------------------------------------------------------------------

_BAR_US = 6 * 3600 * 1_000_000


def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6h OHLC bars per event type. First/last are row_number picks
    over (ts, event_id) — deterministic under ties and identical in
    both engines; high/low/volume are plain integer aggregates. One
    exchange on (event_type, bar)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        cents(F.col("value")).alias("v_cents"),
    ).withColumn("bar_us", F.expr(f"(ts_us DIV {_BAR_US}) * {_BAR_US}"))
    w = Window.partitionBy("event_type", "bar_us")
    marked = (
        ev.withColumn(
            "rn_open", F.row_number().over(w.orderBy("ts_us", "event_id"))
        )
        .withColumn(
            "rn_close",
            F.row_number().over(w.orderBy(F.desc("ts_us"), F.desc("event_id"))),
        )
    )
    return marked.groupBy("event_type", "bar_us").agg(
        F.max(F.when(F.col("rn_open") == 1, F.col("v_cents"))).alias("open_cents"),
        F.max("v_cents").alias("high_cents"),
        F.min("v_cents").alias("low_cents"),
        F.max(F.when(F.col("rn_close") == 1, F.col("v_cents"))).alias("close_cents"),
        F.sum("v_cents").alias("volume_cents"),
        F.count("*").alias("n_events"),
    )


_OHLC_SQL = f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) AS ts_us, event_id,
         TRY_CAST(ROUND(value * 100) AS BIGINT) AS v_cents,
         (epoch_us(ts) // {_BAR_US}) * {_BAR_US} AS bar_us
  FROM events
), marked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY event_type, bar_us
                            ORDER BY ts_us, event_id) AS rn_open,
         ROW_NUMBER() OVER (PARTITION BY event_type, bar_us
                            ORDER BY ts_us DESC, event_id DESC) AS rn_close
  FROM ev
)
SELECT event_type, bar_us,
       CAST(MAX(CASE WHEN rn_open = 1 THEN v_cents END) AS BIGINT)
         AS open_cents,
       MAX(v_cents) AS high_cents,
       MIN(v_cents) AS low_cents,
       CAST(MAX(CASE WHEN rn_close = 1 THEN v_cents END) AS BIGINT)
         AS close_cents,
       CAST(SUM(v_cents) AS BIGINT) AS volume_cents,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM marked
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Hierarchy rollup (algebraic ancestors)
# ---------------------------------------------------------------------------

_H_DEPTH = 6  # 10^6 > max custkey at every fixture scale


def graph_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total customer spend rolled up to every ancestor of a synthetic
    decimal hierarchy (parent = custkey DIV 10). The ancestor set has
    a closed form — ancestor_k = custkey DIV 10^k — so the transitive
    closure is one explode + one aggregate: no recursive joins, no
    iteration, one shuffle on the ancestor key. Reported for the
    2-digit management layer (ancestors 10..99) to keep the output
    bounded."""
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(cents(F.col("o_totalprice"))).alias("spend_cents")
    )
    exploded = spend.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {_H_DEPTH}), "
                f"k -> o_custkey DIV CAST(power(10, k) AS BIGINT))"
            )
        ).alias("ancestor"),
        "spend_cents",
    )
    return (
        exploded.where(F.col("ancestor").between(10, 99))
        .groupBy("ancestor")
        .agg(
            F.count("*").alias("n_descendants"),
            F.sum("spend_cents").alias("subtree_spend_cents"),
        )
    )


_HIERARCHY_SQL = f"""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(TRY_CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS spend_cents
  FROM orders GROUP BY 1
), exploded AS (
  SELECT o_custkey // CAST(power(10, k) AS BIGINT) AS ancestor,
         spend_cents
  FROM spend, (SELECT unnest(range(0, {_H_DEPTH + 1})) AS k)
)
SELECT ancestor,
       CAST(COUNT(*) AS BIGINT) AS n_descendants,
       CAST(SUM(spend_cents) AS BIGINT) AS subtree_spend_cents
FROM exploded
WHERE ancestor BETWEEN 10 AND 99
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Sequence pattern: strict V-shapes
# ---------------------------------------------------------------------------


def events_pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: count strict V-shapes (value drops, then rises) in
    the event-time-ordered value series — the MATCH_RECOGNIZE shape
    expressed as two lags over one user-keyed window. Users with no V
    are absent (inner aggregate), which the oracle mirrors. NULL ts
    rows are dropped symmetrically (round-7 ADVICE): ts is a consumed
    column (window ORDER BY + first_vshape_ts_us) and Spark sorts
    NULLS FIRST where DuckDB sorts NULLS LAST, which would shift lag
    pairs at opposite ends of each user partition."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_id",
            cents(F.col("value")).alias("v"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    lagged = ev.withColumn("v1", F.lag("v", 1).over(w)).withColumn(
        "v2", F.lag("v", 2).over(w)
    )
    return (
        lagged.where(
            F.col("v2").isNotNull()
            & (F.col("v1") < F.col("v2"))
            & (F.col("v") > F.col("v1"))
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_vshapes"),
            F.min("ts_us").alias("first_vshape_ts_us"),
        )
    )


_VSHAPE_SQL = """
WITH lagged AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         TRY_CAST(ROUND(value * 100) AS BIGINT) AS v,
         LAG(TRY_CAST(ROUND(value * 100) AS BIGINT), 1) OVER w AS v1,
         LAG(TRY_CAST(ROUND(value * 100) AS BIGINT), 2) OVER w AS v2
  FROM events
  WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_vshapes,
       MIN(ts_us) AS first_vshape_ts_us
FROM lagged
WHERE v2 IS NOT NULL AND v1 < v2 AND v > v1
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Corrupt-record quarantine (PERMISSIVE ingestion)
# ---------------------------------------------------------------------------

_CORRUPT_EVERY = 13

_QUAR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def io_corrupt_record_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest a JSON-lines batch where every 13th record is broken
    (truncated JSON), in PERMISSIVE mode with a corrupt-record column:
    good rows aggregate per lang; broken rows land in a quarantine
    bucket instead of failing the job — the dead-letter pattern every
    large-scale ingest needs. The corruption is injected
    deterministically by doc_id, so the oracle can reproduce the
    expected classification exactly from the clean table."""
    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select(
        F.when(
            F.col("doc_id") % _CORRUPT_EVERY == 0,
            F.concat(F.lit('{"doc_id": '), F.col("doc_id"), F.lit(', "lang": truncated')),
        )
        .otherwise(
            F.to_json(F.struct("doc_id", "lang", "n_chars"))
        )
        .alias("value")
    )
    out = _tmp("quarantine", sf_dir)
    lines.write.mode("overwrite").text(out)
    back = (
        spark.read.schema(_QUAR_SCHEMA)
        .options(mode="PERMISSIVE", columnNameOfCorruptRecord="_corrupt_record")
        .json(out)
    )
    return back.groupBy(
        F.when(F.col("_corrupt_record").isNotNull(), F.lit("__quarantine__"))
        .otherwise(F.col("lang"))
        .alias("bucket")
    ).agg(
        F.count("*").alias("n_records"),
        F.sum(F.coalesce("n_chars", F.lit(0))).alias("n_chars"),
    )


_QUARANTINE_SQL = f"""
SELECT CASE WHEN doc_id % {_CORRUPT_EVERY} = 0 THEN '__quarantine__'
            ELSE lang END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(SUM(CASE WHEN doc_id % {_CORRUPT_EVERY} = 0 THEN 0
                     ELSE n_chars END) AS BIGINT) AS n_chars
FROM documents
GROUP BY 1
"""


QUERIES = {
    "ts_ohlc_bars": ts_ohlc_bars,
    "graph_hierarchy_rollup": graph_hierarchy_rollup,
    "events_pattern_vshape": events_pattern_vshape,
    "io_corrupt_record_quarantine": io_corrupt_record_quarantine,
}

ORACLE = {
    "ts_ohlc_bars": _OHLC_SQL,
    "graph_hierarchy_rollup": _HIERARCHY_SQL,
    "events_pattern_vshape": _VSHAPE_SQL,
    "io_corrupt_record_quarantine": _QUARANTINE_SQL,
}
