"""Round-5 batch: ML feature preparation and weighted aggregation
primitives (SURVEY.md §2.9 aggregation / LLM-pipeline families; no
reference counterpart — the reference is a single-dataset ETL,
``/root/reference/src/pipeline_pyspark.py``).

  * ``ml_target_encoding`` — smoothed target (mean) encoding of a
    categorical feature: per-segment mean order value shrunk toward
    the global mean by a pseudo-count prior. The classic tabular-ML
    encoder, computed as ONE map-combined aggregate + a 1-row
    broadcast of the global moments; all arithmetic in
    DECIMAL(38,0)/HUGEINT so the encoding is bit-identical at any
    parallelism and never overflows at 1e12 rows.
  * ``ml_feature_hashing`` — the hashing trick: tokens hashed into
    64 signed feature buckets (md5-derived bucket and sign, the
    engine-portable hash used across this repo). Per-bucket occupancy,
    distinct-token collision count and signed sum — the
    dimensionality-independent featurizer for unbounded vocabularies.
  * ``ml_class_weights`` — inverse-frequency class weights over the
    embedding labels (balanced-reweighting), integer ppm. One tiny
    aggregate + 1-row broadcast.
  * ``window_time_weighted_avg`` — per-user time-weighted average
    event value (TWAP): each value weighted by the microseconds until
    the user's next event. One user_id exchange carries both the LEAD
    window and the final aggregate; weights and values stay integer
    (micros x cents in DECIMAL(38,0)).
  * ``agg_weighted_median_twopass`` — EXACT weighted median (by
    quantity) of lineitem prices via coarse-histogram-then-refine:
    pass 1 aggregates weight into 1024 equi-width value buckets (one
    map-combined scan, 1024-row bounded collect); pass 2 touches ONLY
    the target bucket's rows, aggregates weight per distinct value,
    and finds the cut with a window over that bounded relation. The
    full fact table is never globally sorted — the shape that makes
    exact weighted quantiles viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

# ---------------------------------------------------------------------------
# Smoothed target encoding
# ---------------------------------------------------------------------------

_TE_PRIOR = 100  # pseudo-count weight of the global mean

_TE_CORE = f"""
WITH j AS (
  SELECT c.c_mktsegment AS segment,
         TRY_CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM {{orders}} o JOIN {{customer}} c ON o.o_custkey = c.c_custkey
), seg AS (
  SELECT segment, COUNT(*) AS n, SUM(CAST(cents AS {{big}})) AS s
  FROM j GROUP BY segment
), segt AS (
  -- global moments as windows over the tiny segment relation: a
  -- re-aggregate + cross join would recompute seg (and re-run the
  -- orders x customer join)
  SELECT segment, n, s,
         SUM(n) OVER () AS gn, SUM(s) OVER () AS gs
  FROM seg
)
SELECT segment,
       CAST(n AS BIGINT) AS n_orders,
       CAST(s {{div}} n AS BIGINT) AS mean_cents,
       CAST((s * gn + {_TE_PRIOR} * gs)
            {{div}} (CAST(n + {_TE_PRIOR} AS {{big}}) * gn) AS BIGINT)
         AS encoded_cents
FROM segt
"""


def ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean encoding of customer market segment against
    order totals: encoded = (sum + m*global_mean) / (n + m) with
    m=100, evaluated as a single integer ratio
    (s*gn + m*gs) / ((n+m)*gn) so no intermediate division loses
    precision. The segment aggregate is map-combined (5 groups); the
    global moments are windows over that tiny relation, so the
    orders x customer join runs exactly once."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("r19_te_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "r19_te_customer"
    )
    return spark.sql(
        _TE_CORE.format(
            orders="r19_te_orders",
            customer="r19_te_customer",
            big="DECIMAL(38,0)",
            div="DIV",
        )
    )


_TE_DUCK = _TE_CORE.format(
    orders="orders", customer="customer", big="HUGEINT", div="//"
)


# ---------------------------------------------------------------------------
# Feature hashing (the hashing trick)
# ---------------------------------------------------------------------------

_FH_BUCKETS = 64

_FH_SPARK = f"""
WITH toks AS (
  SELECT explode(filter(split(p_name, ' '), x -> x != '')) AS tok
  FROM {{part}}
), h AS (
  SELECT tok,
         CAST(conv(substr(md5(tok), 1, 6), 16, 10) AS BIGINT)
           % {_FH_BUCKETS} AS bucket,
         CASE WHEN CAST(conv(substr(md5(tok), 7, 1), 16, 10) AS BIGINT) % 2 = 0
              THEN 1 ELSE -1 END AS sign
  FROM toks
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_tokens,
       CAST(SUM(sign) AS BIGINT) AS feature_val
FROM h GROUP BY bucket
"""

_FH_DUCK = f"""
WITH toks AS (
  SELECT tok
  FROM part, UNNEST(list_filter(string_split(p_name, ' '), x -> x != ''))
       AS t(tok)
), h AS (
  SELECT tok,
         CAST('0x' || substr(md5(tok), 1, 6) AS BIGINT) % {_FH_BUCKETS}
           AS bucket,
         CASE WHEN CAST('0x' || substr(md5(tok), 7, 1) AS BIGINT) % 2 = 0
              THEN 1 ELSE -1 END AS sign
  FROM toks
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_tokens,
       CAST(SUM(sign) AS BIGINT) AS feature_val
FROM h GROUP BY bucket
"""


def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization of part-name tokens into 64 signed
    buckets. Bucket and sign come from disjoint md5 hex spans (the
    repo's engine-portable hash), so the feature map needs no
    vocabulary and no fit step; the signed sum makes collisions
    cancel in expectation (Weinberger et al.'s trick). One explode +
    one map-combined aggregate over at most 64 groups."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("r19_fh_part")
    return spark.sql(_FH_SPARK.format(part="r19_fh_part"))


# ---------------------------------------------------------------------------
# Inverse-frequency class weights
# ---------------------------------------------------------------------------

_CW_CORE = """
WITH l AS (
  SELECT label, COUNT(*) AS n FROM {emb} GROUP BY label
), lt AS (
  SELECT label, n, SUM(n) OVER () AS tot, COUNT(*) OVER () AS k FROM l
)
SELECT CAST(label AS INT) AS label,
       CAST(n AS BIGINT) AS n_vectors,
       CAST(tot * 1000000 {div} (k * n) AS BIGINT) AS weight_ppm
FROM lt
"""


def ml_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced inverse-frequency class weights over embedding labels
    (sklearn's 'balanced' heuristic, integer ppm): weight_c =
    total / (k * n_c). A uniformly-sampled batch reweighted by these
    trains as if classes were balanced. One tiny aggregate; totals are
    windows over the label relation, so embeddings scan once."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "r19_cw_emb"
    )
    return spark.sql(_CW_CORE.format(emb="r19_cw_emb", div="DIV"))


_CW_DUCK = _CW_CORE.format(emb="embeddings", div="//")


# ---------------------------------------------------------------------------
# Time-weighted average (TWAP)
# ---------------------------------------------------------------------------

_TWAP_CORE = """
WITH e AS (
  SELECT user_id, event_id,
         {epoch_us} AS ts_us,
         TRY_CAST(round(value * 100) AS BIGINT) AS cents
  FROM {events}
  WHERE value IS NOT NULL  -- scan-pushdown half of the predicate
    AND TRY_CAST(round(value * 100) AS BIGINT) IS NOT NULL
), d AS (
  SELECT user_id, cents,
         LEAD(ts_us) OVER (PARTITION BY user_id
                           ORDER BY ts_us, event_id) - ts_us AS dt_us
  FROM e
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(dt_us) AS BIGINT) AS total_dt_us,
       CAST(SUM(CAST(cents AS {big}) * dt_us)
            {div} SUM(CAST(dt_us AS {big})) AS BIGINT) AS twap_cents
FROM d
WHERE dt_us IS NOT NULL AND dt_us > 0
GROUP BY user_id
"""


def window_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average event value: each value holds
    until the user's next event, so it is weighted by that interval's
    microseconds (the market-data TWAP shape; the final open-ended
    value is excluded, zero-length intervals carry no weight). The
    LEAD window and the per-user aggregate share ONE user_id
    exchange; the weighted sum accumulates in DECIMAL(38,0) —
    micros x cents products exceed int64 within a single busy day."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r19_twap_events"
    )
    return spark.sql(
        _TWAP_CORE.format(
            events="r19_twap_events",
            epoch_us="unix_micros(ts)",
            big="DECIMAL(38,0)",
            div="DIV",
        )
    )


_TWAP_DUCK = _TWAP_CORE.format(
    events="events", epoch_us="epoch_us(ts)", big="HUGEINT", div="//"
)


# ---------------------------------------------------------------------------
# Exact weighted median, two-pass (coarse histogram -> refine)
# ---------------------------------------------------------------------------

_WM_BUCKETS = 1024


def agg_weighted_median_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT quantity-weighted median of lineitem extended prices,
    without ever globally sorting the fact table. The lower weighted
    median is the smallest value v with 2 * cumweight(v) >= total.

    Pass 1: one map-combined scan aggregates weight into 1024
    equi-width price buckets (min/max are a bounded 1-row collect);
    the 1024-row histogram is collected and scanned on the driver to
    locate the bucket containing the half-weight point and the weight
    accumulated before it — both bounded by the bucket count, never
    by data volume. Pass 2 reads ONLY that bucket's rows (the
    predicate pushes to the scan), aggregates weight per distinct
    price, and applies a cumulative window over that bounded relation
    (distinct prices within 1/1024 of the value range). A pathological
    bucket would recurse with the same two steps; one refine level
    suffices here and the shape is what matters: exact weighted
    quantiles at 100 TB touch the data twice, lightly.

    The DuckDB oracle computes the same median with a full-sort
    window — result-identical by definition of the cut."""
    raw = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_quantity"
    )

    def _cw(df: DataFrame) -> DataFrame:
        return df.select(
            F.round(F.col("l_extendedprice") * 100).try_cast("bigint").alias("cents"),
            F.round(F.col("l_quantity")).try_cast("bigint").alias("w"),
        )

    li = _cw(raw)
    lo, hi, total, n_items = li.agg(
        F.min("cents"), F.max("cents"), F.sum("w"), F.count("*")
    ).collect()[0]
    if total is None:
        return spark.createDataFrame(
            [],
            "n_items bigint, total_weight bigint, weighted_median_cents bigint",
        )
    width = max((hi - lo) // _WM_BUCKETS + 1, 1)
    hist = (
        li.groupBy(F.expr(f"CAST((cents - {lo}) DIV {width} AS INT)").alias("b"))
        .agg(F.sum("w").alias("bw"))
        .orderBy("b")
        .collect()
    )  # bounded: <= 1024 rows
    run, before, target_b = 0, 0, hist[-1][0]
    for b, bw in hist:
        if 2 * (run + bw) >= total:
            target_b, before = b, run
            break
        run += bw
    b_lo, b_hi = lo + target_b * width, lo + (target_b + 1) * width
    # conservative raw-column pre-filter (superset of the cents band)
    # so pass 2's predicate reaches the parquet scan — the exact cents
    # bounds then re-filter the derived column. Without this, the
    # second pass would re-read the full table: round() on a scanned
    # column is not a pushable predicate.
    pruned = raw.where(
        (F.col("l_extendedprice") >= (b_lo - 1) / 100.0)
        & (F.col("l_extendedprice") <= (b_hi + 1) / 100.0)
    )
    in_bucket = (
        _cw(pruned)
        .where((F.col("cents") >= b_lo) & (F.col("cents") < b_hi))
        .groupBy("cents")
        .agg(F.sum("w").alias("w"))
    )
    in_bucket.createOrReplaceTempView("r19_wm_bucket")
    return spark.sql(
        f"""
        WITH c AS (
          SELECT cents,
                 SUM(w) OVER (ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) AS cw
          FROM r19_wm_bucket
        )
        SELECT CAST({n_items} AS BIGINT) AS n_items,
               CAST({total} AS BIGINT) AS total_weight,
               CAST(MIN(cents) AS BIGINT) AS weighted_median_cents
        FROM c WHERE 2 * ({before} + cw) >= {total}
        """
    )


_WM_DUCK = """
WITH v AS (
  SELECT TRY_CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         TRY_CAST(round(l_quantity) AS BIGINT) AS w
  FROM lineitem
), g AS (
  SELECT cents, SUM(w) AS w FROM v GROUP BY cents
), c AS (
  SELECT cents,
         SUM(w) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cw,
         (SELECT SUM(w) FROM g) AS tot
  FROM g
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_items,
       CAST(MIN(tot) AS BIGINT) AS total_weight,
       CAST(MIN(cents) AS BIGINT) AS weighted_median_cents
FROM c WHERE 2 * cw >= tot
"""


QUERIES = {
    "ml_target_encoding": ml_target_encoding,
    "ml_feature_hashing": ml_feature_hashing,
    "ml_class_weights": ml_class_weights,
    "window_time_weighted_avg": window_time_weighted_avg,
    "agg_weighted_median_twopass": agg_weighted_median_twopass,
}

ORACLE = {
    "ml_target_encoding": _TE_DUCK,
    "ml_feature_hashing": _FH_DUCK,
    "ml_class_weights": _CW_DUCK,
    "window_time_weighted_avg": _TWAP_DUCK,
    "agg_weighted_median_twopass": _WM_DUCK,
}
