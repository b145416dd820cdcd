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


QUERIES = {
    "events_funnel_conversion": events_funnel_conversion,
    "cohort_retention": cohort_retention,
    "sim_quantize_int8": sim_quantize_int8,
}

ORACLE = {
    "events_funnel_conversion": _FUNNEL_SQL,
    "cohort_retention": _COHORT_SQL,
    "sim_quantize_int8": _QUANT_DUCK,
}
