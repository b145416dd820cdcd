"""Product-analytics operator shapes: funnel conversion, cohort
retention, and embedding quantization — the queries a training-data /
analytics platform runs daily, each expressible as pure Spark plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table


# ---------------------------------------------------------------------------
# Funnel: view -> click -> purchase, strictly ordered per user
# ---------------------------------------------------------------------------

def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.unix_micros("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.unix_micros("ts"))).alias("t_click_any"),
        F.min(F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))).alias("t_buy_any"),
    )
    # stage timestamps must be strictly ordered: first view, then the
    # first click after it, then the first purchase after that — the
    # "first after" is re-derived with conditional mins over a second
    # pass kept as one join (two scans total, no per-user loops)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("tc")
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("tb")
    )
    stage2 = (
        per_user.join(clicks, "user_id", "left")
        .where(F.col("tc") >= F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("tc").alias("t_click"))
    )
    stage3 = (
        stage2.join(buys, "user_id", "left")
        .where(F.col("tb") >= F.col("t_click"))
        .groupBy("user_id", "t_view", "t_click")
        .agg(F.min("tb").alias("t_buy"))
    )
    funnel = (
        per_user.select("user_id", "t_view")
        .where(F.col("t_view").isNotNull())
        .join(stage2.select("user_id", "t_click"), "user_id", "left")
        .join(stage3.select("user_id", "t_buy"), "user_id", "left")
    )
    return funnel.agg(
        F.count("*").alias("n_viewed"),
        F.count("t_click").alias("n_clicked_after_view"),
        F.count("t_buy").alias("n_purchased_after_click"),
    )


_FUNNEL_SQL = """
WITH pu AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view
  FROM events GROUP BY user_id
),
s2 AS (
  SELECT pu.user_id, pu.t_view, MIN(epoch_us(c.ts)) AS t_click
  FROM pu JOIN events c
    ON c.user_id = pu.user_id AND c.event_type = 'click'
   AND epoch_us(c.ts) >= pu.t_view
  GROUP BY pu.user_id, pu.t_view
),
s3 AS (
  SELECT s2.user_id, MIN(epoch_us(b.ts)) AS t_buy
  FROM s2 JOIN events b
    ON b.user_id = s2.user_id AND b.event_type = 'purchase'
   AND epoch_us(b.ts) >= s2.t_click
  GROUP BY s2.user_id
)
SELECT COUNT(*) AS n_viewed,
       COUNT(s2.t_click) AS n_clicked_after_view,
       COUNT(s3.t_buy) AS n_purchased_after_click
FROM pu
LEFT JOIN s2 ON pu.user_id = s2.user_id
LEFT JOIN s3 ON pu.user_id = s3.user_id
WHERE pu.t_view IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Cohort retention: first-order month x activity month
# ---------------------------------------------------------------------------

def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey")
    cohorted = orders.select(
        "o_custkey",
        month.alias("order_month"),
    ).withColumn("cohort_month", F.min("order_month").over(w))
    return (
        cohorted.groupBy("cohort_month", "order_month")
        .agg(
            F.countDistinct("o_custkey").alias("n_active_customers"),
            F.count("*").alias("n_orders"),
        )
        .where(F.col("cohort_month") <= F.lit("1995-06"))
    )


_COHORT_SQL = """
WITH c AS (
  SELECT o_custkey,
         strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month,
         MIN(strftime(date_trunc('month', o_orderdate), '%Y-%m'))
           OVER (PARTITION BY o_custkey) AS cohort_month
  FROM orders
)
SELECT cohort_month, order_month,
       COUNT(DISTINCT o_custkey) AS n_active_customers,
       COUNT(*) AS n_orders
FROM c
WHERE cohort_month <= '1995-06'
GROUP BY cohort_month, order_month
"""


# ---------------------------------------------------------------------------
# Int8 scalar quantization of embeddings + reconstruction error
# ---------------------------------------------------------------------------

_QUANT_SPARK = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM {emb}
  WHERE embedding IS NOT NULL
    AND NOT exists(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)
),
q AS (
  SELECT vec_id, label, v,
         aggregate(v, CAST(0.0 AS DOUBLE), (acc, x) -> greatest(acc, abs(x))) / 127.0 AS scale
  FROM e
),
r AS (
  SELECT vec_id, label, scale,
         aggregate(zip_with(v, transform(v, x -> round(x / scale) * scale),
                            (a, b) -> (a - b) * (a - b)),
                   CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) AS sq_err,
         aggregate(v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x) AS sq_norm
  FROM q
)
SELECT label,
       COUNT(*) AS n_vectors,
       CAST(SUM(CAST(ROUND(sqrt(sq_err / sq_norm) * 1000000) AS BIGINT)) AS DOUBLE)
         / (COUNT(*) * 1000000.0) AS avg_rel_error,
       MAX(sqrt(sq_err / sq_norm)) AS max_rel_error
FROM r
GROUP BY label
"""

_QUANT_DUCK = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE embedding IS NOT NULL
    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)) = 0
),
q AS (
  SELECT vec_id, label, v,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), v),
                     (acc, x) -> greatest(acc, abs(x))) / 127.0 AS scale
  FROM e
),
r AS (
  SELECT vec_id, label, scale,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, len(v) + 1),
                 i -> (v[i] - round(v[i] / scale) * scale) * (v[i] - round(v[i] / scale) * scale))),
             (acc, x) -> acc + x) AS sq_err,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(v, x -> x * x)),
                     (acc, x) -> acc + x) AS sq_norm
  FROM q
)
SELECT label,
       COUNT(*) AS n_vectors,
       CAST(SUM(CAST(ROUND(sqrt(sq_err / sq_norm) * 1000000) AS BIGINT)) AS DOUBLE)
         / (COUNT(*) * 1000000.0) AS avg_rel_error,
       MAX(sqrt(sq_err / sq_norm)) AS max_rel_error
FROM r
GROUP BY label
"""


def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("__emb_q8")
    return spark.sql(_QUANT_SPARK.format(emb="__emb_q8"))


# ---------------------------------------------------------------------------
# Bitmap aggregation: per-user engagement bitmask via bit_or
# ---------------------------------------------------------------------------

_EVENT_BITS = "CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8 ELSE 16 END"


def agg_user_engagement_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__bm_events")
    return spark.sql(
        f"""
        WITH u AS (
          SELECT user_id,
                 bit_or({_EVENT_BITS}) AS engagement_bits,
                 COUNT(*) AS n_events
          FROM __bm_events GROUP BY user_id
        )
        SELECT engagement_bits,
               COUNT(*) AS n_users,
               CAST(SUM(n_events) AS BIGINT) AS total_events
        FROM u GROUP BY engagement_bits
        """
    )


_BITMAP_SQL = f"""
WITH u AS (
  SELECT user_id,
         bit_or({_EVENT_BITS}) AS engagement_bits,
         COUNT(*) AS n_events
  FROM events GROUP BY user_id
)
SELECT engagement_bits,
       COUNT(*) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS total_events
FROM u GROUP BY engagement_bits
"""


# ---------------------------------------------------------------------------
# Histogram via width_bucket — the scalar (shuffle-free) form of the
# range-join bucketing in join_range_value_buckets
# ---------------------------------------------------------------------------

def agg_width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    from ..functions.numeric import money_sum

    # NaN is the one value the two engines bucket differently (DuckDB's
    # NaN compares greater than everything, so `NaN >= 350` lands it in
    # the overflow bucket; Spark's width_bucket yields NULL). NULL rows
    # keep their own NULL "unmeasured" bucket in both engines.
    ev = ev.where(F.col("value").isNull() | ~F.isnan("value"))
    bucket = F.expr("width_bucket(value, 0.0, 350.0, 7)")
    return ev.groupBy(bucket.cast("bigint").alias("bucket")).agg(
        F.count("*").alias("n_events"),
        money_sum(F.col("value")).alias("value_sum"),
    )


# DuckDB has no width_bucket; the equal-width arithmetic is identical
_WIDTH_BUCKET_SQL = """
SELECT CAST(CASE WHEN value < 0.0 THEN 0
                 WHEN value >= 350.0 THEN 8
                 ELSE floor(value / 50.0) + 1 END AS BIGINT) AS bucket,
       COUNT(*) AS n_events,
       CAST(SUM(TRY_CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_sum
FROM events
WHERE value IS NULL OR NOT isnan(value)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Edit distance over near-dup pairs (string-similarity verification)
# ---------------------------------------------------------------------------

def dedup_pair_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textdedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.col("text"), 1, 60)
    a = docs.select(F.col("doc_id").alias("doc_a"), prefix.alias("pa"))
    b = docs.select(F.col("doc_id").alias("doc_b"), prefix.alias("pb"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein(F.col("pa"), F.col("pb")).cast("bigint").alias("prefix_edit_distance"),
        )
    )


_EDIT_DIST_SQL = """
WITH pairs AS (
  {minhash_pairs}
)
SELECT doc_a, doc_b,
       levenshtein(substring(a.text, 1, 60), substring(b.text, 1, 60)) AS prefix_edit_distance
FROM pairs
JOIN documents a ON a.doc_id = doc_a
JOIN documents b ON b.doc_id = doc_b
"""


QUERIES = {
    "agg_user_engagement_bitmap": agg_user_engagement_bitmap,
    "agg_width_bucket_histogram": agg_width_bucket_histogram,
    "dedup_pair_edit_distance": dedup_pair_edit_distance,
    "events_funnel_conversion": events_funnel_conversion,
    "cohort_retention": cohort_retention,
    "sim_quantize_int8": sim_quantize_int8,
}

def _edit_dist_oracle() -> str:
    from .textdedup import _DUCK_SHINGLES, _MINHASH_DUCK

    return _EDIT_DIST_SQL.format(
        minhash_pairs=_MINHASH_DUCK.format(shingles=_DUCK_SHINGLES)
    )


ORACLE = {
    "agg_user_engagement_bitmap": _BITMAP_SQL,
    "agg_width_bucket_histogram": _WIDTH_BUCKET_SQL,
    "dedup_pair_edit_distance": _edit_dist_oracle(),
    "events_funnel_conversion": _FUNNEL_SQL,
    "cohort_retention": _COHORT_SQL,
    "sim_quantize_int8": _QUANT_DUCK,
}
