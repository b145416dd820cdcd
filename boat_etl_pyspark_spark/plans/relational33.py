"""Round-5 batch 17: token-budget corpus fill, WoE/IV feature prep,
and cross-market basket overlap (SURVEY.md §2.9 curation / ML-prep /
aggregation families; no reference counterpart).

  * ``curate_token_budget_fill`` — fill a fixed global token budget
    by taking documents in a deterministic pseudo-random order
    (md5(doc_id) — a seedless uniform shuffle both engines replay
    exactly) until the running token total crosses the budget. The
    running total is the ``global_prefix_sum`` primitive — ONE range
    exchange, no single-partition window — making this the first plan
    consumer of the distributed prefix sum (previously only
    library-tested). The corpus-subsampling shape every
    fixed-token-count training run starts with.
  * ``ml_feature_woe_iv`` — weight of evidence and information value
    of a categorical feature (o_orderpriority) against a binary
    target (o_orderstatus = 'F'): ONE contingency scan; class totals
    are windows over the 5-row bucket relation (the
    global-totals-as-windows rule); WoE / IV terms are fixed-order
    closed-form doubles floored to nano units per bucket before the
    integer IV sum — the credit-scoring feature-screening standard.
  * ``agg_basket_overlap`` — exact pairwise Jaccard similarity of
    the part baskets supplied by each nation: the distinct
    (nation, part) presence relation is derived ONCE (persisted —
    the multi-referenced-CTE rule; it is consumed three times), the
    pair intersection is an equi-join on part (fan-out bounded by
    nations-per-part <= 25, never all-pairs over rows), and Jaccard
    is exact integer ppm. The co-occurrence similarity-matrix shape
    for "which markets look alike".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.library import global_prefix_sum
from ..sources.readers import load_table
from . import track_persist

# ---------------------------------------------------------------------------
# Token-budget corpus fill over the distributed prefix sum
# ---------------------------------------------------------------------------

# Fixed budget (tokens). The fixtures carry ~27k tokens at sf0.001 and
# sf0.01 and ~270k at sf0.1, so the fill selects a real prefix at
# every scale; at 100 TB the budget is the training-run token count.
_FILL_BUDGET = 15_000


def curate_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform document sample until ``_FILL_BUDGET``
    tokens: order by md5(doc_id) (seedless shuffle), take every
    document whose running token total STARTS below the budget (so
    the crossing document is included and the selection is a prefix).
    The running total comes from ``global_prefix_sum`` — range
    exchange + per-partition cumsum + broadcast offsets, never a
    single-partition window — so the fill scales to any corpus.
    Reported per source: the mixture a budget cut actually produces."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("hk"),
    )
    cum = global_prefix_sum(
        docs, order_by=["hk", "doc_id"], value_col="n_tokens",
        out_col="cum_tokens",
    )
    return (
        cum.where(F.col("cum_tokens") - F.col("n_tokens") < _FILL_BUDGET)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs_selected"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens_selected"),
        )
        .orderBy("source")
    )


_FILL_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS hk
  FROM documents
), c AS (
  SELECT source, n_tokens,
         SUM(n_tokens) OVER (ORDER BY hk, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM d
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs_selected,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_selected
FROM c
WHERE cum_tokens - n_tokens < {_FILL_BUDGET}
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Weight of evidence / information value
# ---------------------------------------------------------------------------

# WoE/IV with additive (+0.5 per class, the half-integer Laplace /
# Yates form, kept integral by doubling) smoothing: an unsmoothed
# ln(good*bt/(bad*gt)) degenerates on a single-class bucket — Spark
# floor(ln(0)) yields NULL while DuckDB CASTs -inf with an error, so
# the two engines would diverge instead of failing cleanly. The
# fixture has no pure buckets, but WoE is defined smoothed precisely
# so that a drifted input cannot produce one.
_WOE_CORE = """
WITH c AS (
  SELECT o_orderpriority AS priority,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS n_good,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_bad
  FROM {orders} GROUP BY o_orderpriority
), t AS (
  SELECT priority, n_good, n_bad,
         2 * n_good + 1 AS g2, 2 * n_bad + 1 AS b2,
         SUM(2 * n_good + 1) OVER () AS gt2,
         SUM(2 * n_bad + 1) OVER () AS bt2
  FROM c
), terms AS (
  SELECT priority, n_good, n_bad,
         CAST(floor(ln((CAST(g2 AS DOUBLE) * bt2)
                       / (CAST(b2 AS DOUBLE) * gt2)) * 1e9)
              AS BIGINT) AS woe_nano,
         CAST(floor((CAST(g2 AS DOUBLE) / gt2
                     - CAST(b2 AS DOUBLE) / bt2)
                    * ln((CAST(g2 AS DOUBLE) * bt2)
                         / (CAST(b2 AS DOUBLE) * gt2)) * 1e9)
              AS BIGINT) AS iv_term_nano
  FROM t
)
SELECT priority,
       CAST(n_good AS BIGINT) AS n_good,
       CAST(n_bad AS BIGINT) AS n_bad,
       woe_nano,
       iv_term_nano,
       CAST(SUM(iv_term_nano) OVER () AS BIGINT) AS iv_total_nano
FROM terms
ORDER BY priority
"""


def ml_feature_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WoE / IV screening of o_orderpriority against the finished-
    order target: one contingency-count scan; class totals and the IV
    total are windows over the 5-row bucket relation (bounded — the
    single-partition exchange is over feature cardinality, never
    rows); each bucket's WoE and IV term is a fixed-order closed-form
    double floored to nano units, so the cross-bucket IV sum is an
    exact integer in both engines. Counts carry half-integer additive
    smoothing (doubled to stay integral) so a single-class bucket in
    drifted data degrades gracefully instead of hitting ln(0)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r33_woe_orders"
    )
    return spark.sql(_WOE_CORE.format(orders="r33_woe_orders"))


_WOE_DUCK = _WOE_CORE.format(orders="orders")


# ---------------------------------------------------------------------------
# Cross-nation basket overlap (pairwise exact Jaccard)
# ---------------------------------------------------------------------------


def agg_basket_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard similarity of supplied-part baskets for every
    nation pair. The distinct (nation, part) presence relation —
    bounded by 25 x |part|, far smaller than lineitem — is derived
    once and persisted (three consumers: sizes + both join sides);
    the intersection join is equi-keyed on part, so fan-out per part
    is at most nations^2 = 625 and nothing resembling an all-pairs
    row join ever happens. Jaccard in exact integer ppm."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    pres = track_persist(
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .select(F.col("s_nationkey").alias("nation"),
                F.col("l_partkey").alias("pk"))
        .distinct()
    )
    sizes = pres.groupBy("nation").agg(F.count("*").alias("n_parts"))
    a = pres.select(F.col("nation").alias("n1"), "pk")
    b = pres.select(F.col("nation").alias("n2"), "pk")
    inter = (
        a.join(b, "pk")
        .where(F.col("n1") < F.col("n2"))
        .groupBy("n1", "n2")
        .agg(F.count("*").alias("n_inter"))
    )
    s1 = sizes.select(F.col("nation").alias("n1"),
                      F.col("n_parts").alias("n_parts_1"))
    s2 = sizes.select(F.col("nation").alias("n2"),
                      F.col("n_parts").alias("n_parts_2"))
    return (
        inter.join(F.broadcast(s1), "n1")
        .join(F.broadcast(s2), "n2")
        .select(
            "n1", "n2",
            F.col("n_inter").cast("bigint").alias("n_inter"),
            F.col("n_parts_1").cast("bigint").alias("n_parts_1"),
            F.col("n_parts_2").cast("bigint").alias("n_parts_2"),
            F.expr(
                "CAST(n_inter * 1000000"
                " DIV (n_parts_1 + n_parts_2 - n_inter) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy(F.desc("jaccard_ppm"), "n1", "n2")
    )


_BASKET_SQL = """
WITH pres AS (
  SELECT DISTINCT s_nationkey AS nation, l_partkey AS pk
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
), sizes AS (
  SELECT nation, COUNT(*) AS n_parts FROM pres GROUP BY nation
), inter AS (
  SELECT a.nation AS n1, b.nation AS n2, COUNT(*) AS n_inter
  FROM pres a JOIN pres b ON a.pk = b.pk AND a.nation < b.nation
  GROUP BY a.nation, b.nation
)
SELECT i.n1, i.n2,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(s1.n_parts AS BIGINT) AS n_parts_1,
       CAST(s2.n_parts AS BIGINT) AS n_parts_2,
       CAST(n_inter * 1000000 // (s1.n_parts + s2.n_parts - n_inter)
            AS BIGINT) AS jaccard_ppm
FROM inter i
JOIN sizes s1 ON i.n1 = s1.nation
JOIN sizes s2 ON i.n2 = s2.nation
ORDER BY jaccard_ppm DESC, n1, n2
"""


QUERIES = {
    "curate_token_budget_fill": curate_token_budget_fill,
    "ml_feature_woe_iv": ml_feature_woe_iv,
    "agg_basket_overlap": agg_basket_overlap,
}

ORACLE = {
    "curate_token_budget_fill": _FILL_SQL,
    "ml_feature_woe_iv": _WOE_DUCK,
    "agg_basket_overlap": _BASKET_SQL,
}
