"""Round-5 batch 7: customer-value segmentation (SURVEY.md §2.9
aggregation / event families; no reference counterpart).

  * ``events_rfm_segmentation`` — classic RFM scoring: every
    purchasing user ranked into quintiles on Recency, Frequency and
    Monetary value (three ``global_rank`` passes over the persisted
    per-user aggregate — range exchanges + broadcast offsets, never a
    single-partition window), folded into the 'R{r}F{f}M{m}' segment
    grid with population and value share.
  * ``agg_pareto_abc`` — ABC (Pareto) inventory analysis: parts
    classed A/B/C by cumulative revenue share (80% / 95% cuts)
    WITHOUT globally sorting the fact table — the revenue-weighted
    value thresholds come from the same coarse-histogram-then-refine
    machinery as the exact weighted median, then one conditional
    aggregate classes every part.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.library import global_rank
from ..sources.readers import load_table
from . import track_persist
from .contract import revenue_cents, revenue_cents_sql

# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------


def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile grid over purchasing users. Recency ranks by last
    purchase time DESC (most recent = quintile 5 after the flip built
    into the rank direction), frequency and monetary ASC (highest =
    5); quintile = (rank-1)*5 DIV n + 1, ties broken by user_id so
    every engine lands identical grids. Each dimension is one
    auto-sized ``global_rank`` over the SAME persisted per-user
    relation — the fact table is reduced exactly once."""
    ev = load_table(spark, sf_dir, "events")
    per_user = track_persist(
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.unix_micros("ts")).alias("last_us"),
            F.count("*").alias("freq"),
            F.sum(F.round(F.col("value") * 100).try_cast("bigint")).alias(
                "m_cents"
            ),
        )
    )
    n = per_user.count()  # bounded scalar
    if n == 0:
        return spark.createDataFrame(
            [], "segment string, n_users bigint, segment_cents bigint"
        )

    def quintile(df: DataFrame, order_col: str, out: str) -> DataFrame:
        ranked = global_rank(df, [order_col, "user_id"], rows=n)
        # integer DIV, not double-divide-then-cast: DuckDB's double->int
        # cast ROUNDS while Spark's truncates, so only integer division
        # keeps the quintile boundaries engine-identical
        return ranked.withColumn(
            out, F.expr(f"CAST((rank - 1) * 5 DIV {n} AS INT) + 1")
        ).drop("rank")

    scored = quintile(per_user, "last_us", "r_q")  # later purchase -> higher q
    scored = quintile(scored, "freq", "f_q")
    scored = quintile(scored, "m_cents", "m_q")
    return (
        scored.groupBy(
            F.concat(
                F.lit("R"), F.col("r_q"), F.lit("F"), F.col("f_q"),
                F.lit("M"), F.col("m_q"),
            ).alias("segment")
        )
        .agg(
            F.count("*").alias("n_users"),
            F.sum("m_cents").alias("segment_cents"),
        )
    )


_RFM_DUCK = """
WITH pu AS (
  SELECT user_id,
         MAX(epoch_us(ts)) AS last_us,
         COUNT(*) AS freq,
         SUM(TRY_CAST(round(value * 100) AS BIGINT)) AS m_cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
), q AS (
  SELECT m_cents,
         CAST((ROW_NUMBER() OVER (ORDER BY last_us, user_id) - 1) * 5
              // COUNT(*) OVER () AS INT) + 1 AS r_q,
         CAST((ROW_NUMBER() OVER (ORDER BY freq, user_id) - 1) * 5
              // COUNT(*) OVER () AS INT) + 1 AS f_q,
         CAST((ROW_NUMBER() OVER (ORDER BY m_cents, user_id) - 1) * 5
              // COUNT(*) OVER () AS INT) + 1 AS m_q
  FROM pu
)
SELECT 'R' || r_q || 'F' || f_q || 'M' || m_q AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(m_cents) AS BIGINT) AS segment_cents
FROM q
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Pareto / ABC analysis
# ---------------------------------------------------------------------------

_ABC_BUCKETS = 1024
_ABC_CUTS = (80, 95)  # cumulative revenue %: A above 80%-cut, B to 95%


def agg_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class every part A/B/C by cumulative revenue share, descending
    by per-part revenue. The two thresholds (revenue values where the
    TOP-down cumulative share crosses 80% and 95%) come from a
    1024-bucket revenue-weighted histogram over per-part revenue
    (bounded collects; same refine-free coarse pass as the weighted
    median — bucket granularity is the declared resolution of the
    cut, exact within a bucket width). One conditional aggregate then
    reports each class's population and exact revenue share. The
    per-part relation is aggregated once and never globally sorted.

    Hostile-ingest rules (round-10 layer 2): revenue uses the bounded
    compound ingest (contract.revenue_cents — price domain x rate
    domain keeps cents <= 1e14, so the x1e6 ppm scaling widens to
    DECIMAL(38,0)/HUGEINT instead of wrapping), and a part with no
    valid revenue has no Pareto position: NULL rev rows are excluded
    symmetrically (they would otherwise reach the driver-side bucket
    walk as a None key)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = track_persist(
        li.groupBy("l_partkey")
        .agg(F.sum(revenue_cents()).alias("rev"))
        .where(F.col("rev").isNotNull())
    )
    lo, hi, total = per_part.agg(
        F.min("rev"), F.max("rev"), F.sum("rev")
    ).collect()[0]
    if total is None:
        return spark.createDataFrame(
            [], "abc_class string, n_parts bigint, class_cents bigint, "
                "revenue_share_ppm bigint"
        )
    width = max((hi - lo) // _ABC_BUCKETS + 1, 1)
    hist = dict(
        per_part.groupBy(
            F.expr(f"CAST((rev - {lo}) DIV {width} AS INT)").alias("b")
        )
        .agg(F.sum("rev").alias("w"))
        .collect()
    )  # bounded: <= 1024 rows
    # top-down cumulative: walk buckets from the highest value down,
    # recording the bucket floor where each cut is crossed
    cuts_abs = [total * c // 100 for c in _ABC_CUTS]
    thresholds = []
    run = 0
    ci = 0
    for b in sorted(hist, reverse=True):
        run += hist[b]
        while ci < len(cuts_abs) and run >= cuts_abs[ci]:
            thresholds.append(lo + b * width)  # bucket floor value
            ci += 1
    while len(thresholds) < len(_ABC_CUTS):
        thresholds.append(lo)
    t_a, t_b = thresholds
    classed = per_part.withColumn(
        "abc_class",
        F.when(F.col("rev") >= t_a, "A")
        .when(F.col("rev") >= t_b, "B")
        .otherwise("C"),
    )
    return classed.groupBy("abc_class").agg(
        F.count("*").alias("n_parts"),
        F.sum("rev").alias("class_cents"),
        F.expr(
            f"CAST(CAST(SUM(rev) AS DECIMAL(38,0)) * 1000000 DIV {total}"
            " AS BIGINT)"
        ).alias("revenue_share_ppm"),
    )


def _abc_duck() -> str:
    return f"""
WITH pp0 AS (
  SELECT l_partkey,
         SUM({revenue_cents_sql()}) AS rev
  FROM lineitem GROUP BY l_partkey
), pp AS (
  SELECT * FROM pp0 WHERE rev IS NOT NULL
), bounds AS (
  SELECT MIN(rev) AS lo, MAX(rev) AS hi, SUM(rev) AS total,
         GREATEST((MAX(rev) - MIN(rev)) // {_ABC_BUCKETS} + 1, 1) AS width
  FROM pp
), hb AS (
  SELECT CAST((rev - lo) // width AS INT) AS b, SUM(rev) AS w
  FROM pp CROSS JOIN bounds GROUP BY 1
), cum AS (
  SELECT b, SUM(w) OVER (ORDER BY b DESC ROWS UNBOUNDED PRECEDING) AS run
  FROM hb
), th AS (
  SELECT
    (SELECT MAX(lo + b * width)
     FROM cum CROSS JOIN bounds
     WHERE run >= total * {_ABC_CUTS[0]} // 100) AS t_a,
    (SELECT MAX(lo + b * width)
     FROM cum CROSS JOIN bounds
     WHERE run >= total * {_ABC_CUTS[1]} // 100) AS t_b
  FROM (SELECT 1)
), classed AS (
  SELECT rev,
         CASE WHEN rev >= t_a THEN 'A'
              WHEN rev >= t_b THEN 'B'
              ELSE 'C' END AS abc_class
  FROM pp CROSS JOIN th
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS class_cents,
       CAST(CAST(SUM(rev) AS HUGEINT) * 1000000
            // (SELECT total FROM bounds) AS BIGINT)
         AS revenue_share_ppm
FROM classed
GROUP BY 1
"""


QUERIES = {
    "events_rfm_segmentation": events_rfm_segmentation,
    "agg_pareto_abc": agg_pareto_abc,
}

ORACLE = {
    "events_rfm_segmentation": _RFM_DUCK,
    "agg_pareto_abc": _abc_duck(),
}
