"""Round-4 batch 4: point-in-time dimension joins, corpus divergence,
and dataset cards.

  * ``join_point_in_time`` — the PIT (as-of) dimension join behind
    every leakage-free feature store and SCD2 lookup: each order is
    joined to the customer's tier AS OF the day before the order
    (states derived from the customer's own prior order count). Built
    on the library ``asof_join`` — one tagged-union window pass, never
    an N×M interval expansion. DuckDB's native ASOF JOIN is the
    oracle, so the semantics are checked against an independent
    implementation of the same concept.
  * ``text_source_divergence`` — per-language total-variation distance
    (integer ppm) between the language's token distribution and the
    whole-corpus distribution: the drift/skew statistic a corpus
    mixture monitor tracks. Probabilities are floored integer ppm so
    the statistic is associative and engine-exact.
  * ``curate_dataset_cards`` — the per-source "dataset card" rollup
    (docs, tokens, chars, language spread, dominant language) that
    heads every curated-corpus release; one aggregate pass plus a
    deterministic max-struct for the dominant language.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import cents
from ..operators.library import asof_join
from ..sources.readers import load_table
from .contract import (
    money_rounded,
    money_rounded_sql,
    tpch_date_valid,
    tpch_date_valid_sql,
)

# ---------------------------------------------------------------------------
# Point-in-time dimension join
# ---------------------------------------------------------------------------

_DAY_US = 86_400 * 1_000_000


def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each order joined to its customer's tier AS OF the day before
    the order date. The dimension is an SCD2-style state series
    derived from the data itself: after a customer's n-th order day
    their tier is min(n, 5), effective the NEXT day (valid_from =
    order day + 1), so an order never sees state created by itself —
    the leakage rule every feature-store PIT join enforces. First
    orders match nothing and land in tier 0. One union-window pass
    (library asof_join); the oracle is DuckDB's native ASOF JOIN.

    Hostile-ingest rules (round-10 layer 2): an order with no valid
    business date has no point-in-time position (the as-of union
    window orders NULLs differently per engine), and cents are
    money-domain bounded (Spark's revenue SUM wraps where DuckDB
    widens)."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(tpch_date_valid("o_orderdate"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "ts_us"
            ),
            money_rounded("o_totalprice").alias("price_cents"),
        )
    )
    per_day = (
        orders.groupBy("o_custkey", "ts_us")
        .agg(F.count("*").alias("n_day"))
        .withColumn(
            "cum",
            F.sum("n_day").over(
                Window.partitionBy("o_custkey")
                .orderBy("ts_us")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    dim = per_day.select(
        "o_custkey",
        (F.col("ts_us") + F.lit(_DAY_US)).alias("valid_from_us"),
        F.least(F.col("cum"), F.lit(5)).cast("bigint").alias("tier"),
    )
    pit = asof_join(
        orders,
        dim,
        by="o_custkey",
        left_ts="ts_us",
        right_ts="valid_from_us",
        value_cols=["tier"],
    )
    return (
        pit.select(
            F.coalesce("asof_tier", F.lit(0)).alias("tier_as_of_order"),
            "price_cents",
        )
        .groupBy("tier_as_of_order")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("price_cents").alias("revenue_cents"),
        )
    )


_PIT_SQL = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey,
         epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS ts_us,
         {money_rounded_sql('o_totalprice')} AS price_cents
  FROM orders WHERE {tpch_date_valid_sql('o_orderdate')}
), per_day AS (
  SELECT o_custkey, ts_us, COUNT(*) AS n_day
  FROM o GROUP BY 1, 2
), dim AS (
  SELECT o_custkey,
         ts_us + {_DAY_US} AS valid_from_us,
         CAST(LEAST(SUM(n_day) OVER (PARTITION BY o_custkey ORDER BY ts_us
                    ROWS UNBOUNDED PRECEDING), 5) AS BIGINT) AS tier
  FROM per_day
)
SELECT COALESCE(dim.tier, 0) AS tier_as_of_order,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o.price_cents) AS BIGINT) AS revenue_cents
FROM o
ASOF LEFT JOIN dim
  ON o.o_custkey = dim.o_custkey AND dim.valid_from_us <= o.ts_us
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Per-language corpus divergence (total variation, integer ppm)
# ---------------------------------------------------------------------------

# built once in the DataFrame layer and persisted (bounded by
# |vocab| x |langs|, the cacheable summary): four CTE references would
# inline-and-recompute the tokenize+count pass four times
_DIVERGENCE_COUNTS_SPARK = """
SELECT lang, t, COUNT(*) AS c
FROM (SELECT lang, explode(filter(split(text, ' '), x -> x != '')) AS t
      FROM {docs})
GROUP BY 1, 2
"""

_DIVERGENCE_SPARK = """
WITH lang_counts AS (
  SELECT lang, t, c FROM {counts}
), lang_totals AS (
  SELECT lang, SUM(c) AS n FROM lang_counts GROUP BY 1
), corpus_counts AS (
  SELECT t, SUM(c) AS cc FROM lang_counts GROUP BY 1
), corpus_total AS (
  SELECT SUM(cc) AS nn FROM corpus_counts
), joined AS (
  SELECT lt.lang,
         coalesce(lc.c, 0) * 1000000 DIV lt.n AS p_ppm,
         cc.cc * 1000000 DIV ct.nn AS q_ppm
  FROM corpus_counts cc
  CROSS JOIN corpus_total ct
  CROSS JOIN lang_totals lt
  LEFT JOIN lang_counts lc ON lc.t = cc.t AND lc.lang = lt.lang
)
SELECT lang,
       CAST(SUM(abs(p_ppm - q_ppm)) DIV 2 AS BIGINT) AS tv_vs_corpus_ppm,
       CAST(SUM(CASE WHEN p_ppm > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS shared_vocab,
       CAST(COUNT(*) AS BIGINT) AS corpus_vocab
FROM joined
GROUP BY lang
"""

_DIVERGENCE_DUCK = """
WITH tok AS (
  SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
  FROM documents
), lang_counts AS (
  SELECT lang, t, COUNT(*) AS c FROM tok GROUP BY 1, 2
), lang_totals AS (
  SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM lang_counts GROUP BY 1
), corpus_counts AS (
  SELECT t, CAST(SUM(c) AS BIGINT) AS cc FROM lang_counts GROUP BY 1
), corpus_total AS (
  SELECT CAST(SUM(cc) AS BIGINT) AS nn FROM corpus_counts
), joined AS (
  SELECT lt.lang,
         COALESCE(lc.c, 0) * 1000000 // lt.n AS p_ppm,
         cc.cc * 1000000 // ct.nn AS q_ppm
  FROM corpus_counts cc
  CROSS JOIN corpus_total ct
  CROSS JOIN lang_totals lt
  LEFT JOIN lang_counts lc ON lc.t = cc.t AND lc.lang = lt.lang
)
SELECT lang,
       CAST(SUM(abs(p_ppm - q_ppm)) // 2 AS BIGINT) AS tv_vs_corpus_ppm,
       CAST(SUM(CASE WHEN p_ppm > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS shared_vocab,
       CAST(COUNT(*) AS BIGINT) AS corpus_vocab
FROM joined
GROUP BY lang
"""


def text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance (ppm) of each language's token
    distribution from the whole-corpus distribution, over the corpus
    vocabulary. Floored integer ppm keeps the sum associative; the
    per-language expansion is |vocab| x |langs| rows of three BIGINTs
    — bounded by vocabulary, not corpus size."""
    from . import track_persist

    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__docs_div")
    counts = track_persist(
        spark.sql(_DIVERGENCE_COUNTS_SPARK.format(docs="__docs_div"))
    )
    counts.createOrReplaceTempView("__docs_div_counts")
    return spark.sql(_DIVERGENCE_SPARK.format(counts="__docs_div_counts"))


# ---------------------------------------------------------------------------
# Dataset cards
# ---------------------------------------------------------------------------


def curate_dataset_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source release card: document/token/char budgets, language
    spread, and the dominant language with its share (integer ppm).
    The dominant language is a deterministic max-of-struct fold over
    the per-(source, lang) counts — no window, no second shuffle over
    documents."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        "lang",
        "n_chars",
        F.size(F.expr("filter(split(text, ' '), x -> x != '')")).alias("n_toks"),
    )
    per_lang = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
    )
    return (
        per_lang.groupBy("source")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.max(F.struct("n_docs", "lang")).alias("__top"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_langs",
            F.col("__top.lang").alias("top_lang"),
            F.expr("1000000 * __top.n_docs DIV n_docs").alias("top_lang_ppm"),
        )
    )


_CARDS_SQL = """
WITH docs AS (
  SELECT source, lang, n_chars,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_toks
  FROM documents
), per_lang AS (
  SELECT source, lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars
  FROM docs GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       MAX(struct_pack(n_docs := n_docs, lang := lang)).lang AS top_lang,
       CAST(1000000 * MAX(struct_pack(n_docs := n_docs, lang := lang)).n_docs
            // SUM(n_docs) AS BIGINT) AS top_lang_ppm
FROM per_lang
GROUP BY source
"""


QUERIES = {
    "join_point_in_time": join_point_in_time,
    "text_source_divergence": text_source_divergence,
    "curate_dataset_cards": curate_dataset_cards,
}

ORACLE = {
    "join_point_in_time": _PIT_SQL,
    "text_source_divergence": _DIVERGENCE_DUCK,
    "curate_dataset_cards": _CARDS_SQL,
}


# ---------------------------------------------------------------------------
# Mergeable histogram quantiles (sketch-style partial aggregation)
# ---------------------------------------------------------------------------

_HQ_WIDTH = 500_000  # bucket width in cents ($5k)

_HQ_SPARK = f"""
WITH o AS (
  -- bounded cents + floor-div bucketing (round-10 layer 2): DIV
  -- truncates toward zero in Spark where // floors in DuckDB, so a
  -- NEGATIVE cents value bucketed with integer division diverges;
  -- floor() over an exact double (|cents| <= 1e14 << 2^53) agrees.
  SELECT q, m, p FROM (
    SELECT date_trunc('quarter', o_orderdate) AS q,
           date_trunc('month', o_orderdate) AS m,
           {money_rounded_sql('o_totalprice')} AS p
    FROM {{orders}}
  ) WHERE p IS NOT NULL
), partials AS (
  SELECT q, m, CAST(floor(CAST(p AS DOUBLE) / {_HQ_WIDTH}) AS BIGINT) AS b,
         COUNT(*) AS c
  FROM o GROUP BY 1, 2, 3
), merged AS (
  SELECT q, b, SUM(c) AS c FROM partials GROUP BY 1, 2
), cum AS (
  SELECT q, b, c,
         SUM(c) OVER (PARTITION BY q ORDER BY b) AS cum,
         SUM(c) OVER (PARTITION BY q) AS n
  FROM merged
), est AS (
  SELECT q, n,
         MAX(CASE WHEN rn50 = 1 THEN
           b * {_HQ_WIDTH} + ((n * 50 + 99) DIV 100 - (cum - c)) * {_HQ_WIDTH} DIV c
         END) AS est_p50_cents,
         MAX(CASE WHEN rn90 = 1 THEN
           b * {_HQ_WIDTH} + ((n * 90 + 99) DIV 100 - (cum - c)) * {_HQ_WIDTH} DIV c
         END) AS est_p90_cents,
         MAX(nb) AS n_buckets
  FROM (
    SELECT *,
           CASE WHEN cum >= (n * 50 + 99) DIV 100 THEN
             row_number() OVER (PARTITION BY q, cum >= (n * 50 + 99) DIV 100
                                ORDER BY b) END AS rn50,
           CASE WHEN cum >= (n * 90 + 99) DIV 100 THEN
             row_number() OVER (PARTITION BY q, cum >= (n * 90 + 99) DIV 100
                                ORDER BY b) END AS rn90,
           COUNT(*) OVER (PARTITION BY q) AS nb
    FROM cum
  )
  GROUP BY q, n
)
SELECT date_format(q, 'yyyy-MM') AS quarter,
       CAST(n AS BIGINT) AS n_orders,
       CAST(est_p50_cents AS BIGINT) AS est_p50_cents,
       CAST(est_p90_cents AS BIGINT) AS est_p90_cents,
       CAST(n_buckets AS BIGINT) AS n_buckets
FROM est
"""


def agg_histogram_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quarterly price quantiles from MERGED per-month
    equi-width histogram partials — the mergeable-sketch contract
    (merge(hist(A), hist(B)) == hist(A ∪ B)) that lets a warehouse
    maintain quantiles incrementally: each month contributes a
    ≤#buckets-row partial, quarters merge partials without rescanning
    months, and the p50/p90 estimates interpolate inside the covering
    bucket in exact integer arithmetic. Unlike an opaque sketch, every
    step is deterministic — so the oracle hash-checks the whole
    computation, not just an error envelope."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__orders_hq")
    return spark.sql(_HQ_SPARK.format(orders="__orders_hq"))


# DuckDB: same computation; // for integer division, strftime label.
# WINDOW-FREE form (round 11): DuckDB v1.0.0's parallel window
# executor nondeterministically mislays rows across partitions on
# this cascaded-window shape (observed on the hostile sf0.01 fixture:
# the NULL-orderdate row's ROW_NUMBER landed in another quarter's
# partition ~1 run in 10; with 32 threads, 30 repeat executions of
# the old windowed oracle produced 5 distinct outputs, while
# threads=1 was 30/30 stable). Hash aggregates and joins are not
# affected, so the running sum becomes a bounded self-join over the
# merged histogram (<= a-few-hundred buckets per quarter — bucket
# count is capped by the money contract bound / bucket width, not by
# fact volume) and "the rn=1 bucket" becomes MIN(b) among buckets
# with cum >= threshold. q is mapped to an unreachable sentinel when
# NULL (date_trunc('quarter') can only yield quarter-start days,
# never Dec 31) so NULL quarters survive the equi-joins exactly like
# SQL's NULLs-group-together GROUP BY; NULLIF restores the NULL
# label. The sentinel uses CASE WHEN on the RAW column, not
# COALESCE/CASE on date_trunc's output: DuckDB v1.0.0's
# date_trunc(parquet_ts) emits a corrupt validity mask for NULL
# inputs (IS NULL reads false but every function of the value —
# epoch, ::VARCHAR, comparisons — returns NULL), so any null-test of
# the truncated value misfires and an equi-join on it drops the row.
_HQ_DUCK = f"""
WITH o AS (
  SELECT q, m, p FROM (
    SELECT CASE WHEN o_orderdate IS NULL THEN TIMESTAMP '9999-12-31 00:00:00'
                ELSE date_trunc('quarter', o_orderdate) END AS q,
           date_trunc('month', o_orderdate) AS m,
           {money_rounded_sql('o_totalprice')} AS p
    FROM orders
  ) WHERE p IS NOT NULL
), partials AS (
  SELECT q, m, CAST(floor(CAST(p AS DOUBLE) / {_HQ_WIDTH}) AS BIGINT) AS b,
         COUNT(*) AS c
  FROM o GROUP BY 1, 2, 3
), merged AS (
  SELECT q, b, CAST(SUM(c) AS BIGINT) AS c FROM partials GROUP BY 1, 2
), cum AS (
  SELECT m1.q, m1.b, m1.c, CAST(SUM(m2.c) AS BIGINT) AS cum
  FROM merged m1 JOIN merged m2 ON m1.q = m2.q AND m2.b <= m1.b
  GROUP BY m1.q, m1.b, m1.c
), tot AS (
  SELECT q, CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS nb
  FROM merged GROUP BY q
), sel AS (
  SELECT c1.q,
         MIN(CASE WHEN c1.cum >= (t.n * 50 + 99) // 100 THEN c1.b END) AS b50,
         MIN(CASE WHEN c1.cum >= (t.n * 90 + 99) // 100 THEN c1.b END) AS b90
  FROM cum c1 JOIN tot t ON c1.q = t.q
  GROUP BY c1.q
)
SELECT strftime(NULLIF(t.q, TIMESTAMP '9999-12-31 00:00:00'), '%Y-%m') AS quarter,
       CAST(t.n AS BIGINT) AS n_orders,
       CAST(e50.b * {_HQ_WIDTH}
            + ((t.n * 50 + 99) // 100 - (e50.cum - e50.c)) * {_HQ_WIDTH} // e50.c
         AS BIGINT) AS est_p50_cents,
       CAST(e90.b * {_HQ_WIDTH}
            + ((t.n * 90 + 99) // 100 - (e90.cum - e90.c)) * {_HQ_WIDTH} // e90.c
         AS BIGINT) AS est_p90_cents,
       CAST(t.nb AS BIGINT) AS n_buckets
FROM tot t
JOIN sel s ON s.q = t.q
LEFT JOIN cum e50 ON e50.q = t.q AND e50.b = s.b50
LEFT JOIN cum e90 ON e90.q = t.q AND e90.b = s.b90
"""


QUERIES["agg_histogram_quantile_merge"] = agg_histogram_quantile_merge
ORACLE["agg_histogram_quantile_merge"] = _HQ_DUCK
