"""Round-4 batch 5: hybrid skew-split joins and filter cascades.

  * ``join_hybrid_skew_split`` — the broadcast/shuffle HYBRID join:
    rows carrying the hottest keys take a broadcast path (the hot
    build-side slice is tiny by construction), everything else takes
    the ordinary shuffle path, and the union is result-identical to
    the plain join (the oracle IS the plain join). This is the
    manual form of what AQE's skew-join approximates — the tool for
    when a handful of keys dominate and even salted splitting leaves
    the build side unbroadcastable.
  * ``curate_quality_filter_cascade`` — a staged quality gate
    (cheap predicates first, expensive ones only on survivors) with
    per-stage population, pass counts and selectivity in integer
    ppm: the measurement that justifies filter ordering in a corpus
    pipeline. One conditional-aggregation scan computes the whole
    funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import cents
from ..sources.readers import load_table

# ---------------------------------------------------------------------------
# Hybrid skew-split join
# ---------------------------------------------------------------------------

_HOT_KEYS = 100
# Hot-set sampling for the production variant: at any realistic skew a
# dominant key appears thousands of times per 1e6 rows, so a 2%
# Bernoulli sample still surfaces it with near certainty, and the
# sample's count/top-k cost is 50x smaller than the exact scan. The
# seed is fixed for run-to-run stability; correctness never depends on
# WHICH keys are picked (any split is result-identical).
_HOT_SAMPLE_FRACTION = 0.02
_HOT_SAMPLE_SEED = 42


def _hybrid_split_join(li: DataFrame, orders: DataFrame, hot: DataFrame) -> DataFrame:
    """Split both sides on membership in ``hot`` (a tiny one-column
    key relation), broadcast-join the hot slices, sort-merge-join the
    cold remainder, union, and re-aggregate. Result-identical to the
    plain join for ANY ``hot`` set: every lineitem row takes exactly
    one path and meets exactly its matching orders rows."""
    li_hot = li.join(F.broadcast(hot), li.l_orderkey == hot.hot_key).drop("hot_key")
    li_cold = li.join(
        F.broadcast(hot), li.l_orderkey == hot.hot_key, "left_anti"
    )
    o_hot = orders.join(
        F.broadcast(hot), orders.o_orderkey == hot.hot_key
    ).drop("hot_key")
    o_cold = orders.join(
        F.broadcast(hot), orders.o_orderkey == hot.hot_key, "left_anti"
    )
    joined = li_hot.join(
        F.broadcast(o_hot), li_hot.l_orderkey == o_hot.o_orderkey
    ).unionByName(
        li_cold.hint("merge").join(
            o_cold, li_cold.l_orderkey == o_cold.o_orderkey
        )
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.sum(
            cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("revenue_cents"),
    )


def _hybrid_inputs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    return li, orders


def join_hybrid_skew_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders split by key temperature: the ``_HOT_KEYS``
    most frequent orderkeys join through a broadcast of their (tiny)
    orders slice; the remaining keys join through the normal shuffle
    path (pinned to sort-merge so the split is visible in the plan);
    the union re-aggregates. This variant computes the hot set with an
    exact count (top-k via TakeOrderedAndProject, so the full sort
    never materializes); ``join_hybrid_skew_sampled`` is the
    production form whose hot set comes from a sample. Both are
    result-identical to the plain join — the oracle IS the plain
    join."""
    li, orders = _hybrid_inputs(spark, sf_dir)
    hot = (
        li.groupBy("l_orderkey")
        .count()
        .orderBy(F.desc("count"), "l_orderkey")
        .limit(_HOT_KEYS)
        .select(F.col("l_orderkey").alias("hot_key"))
    )
    return _hybrid_split_join(li, orders, hot)


def join_hybrid_skew_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production form of the hybrid skew join: the hot-key set comes
    from a fixed-seed Bernoulli sample of the fact side
    (``_HOT_SAMPLE_FRACTION``), not an exact full count — at 100 TB
    the exact frequency scan is a full extra pass over the fact table,
    while the sample reads ~2% and any truly hot key is still caught
    with near certainty. Correctness does NOT depend on the sample:
    the split is result-identical to the plain join for any hot set
    (a missed hot key only moves rows to the shuffle path), which is
    why the oracle is the same plain join as the exact variant."""
    li, orders = _hybrid_inputs(spark, sf_dir)
    hot = (
        li.sample(fraction=_HOT_SAMPLE_FRACTION, seed=_HOT_SAMPLE_SEED)
        .groupBy("l_orderkey")
        .count()
        .orderBy(F.desc("count"), "l_orderkey")
        .limit(_HOT_KEYS)
        .select(F.col("l_orderkey").alias("hot_key"))
    )
    return _hybrid_split_join(li, orders, hot)


_HYBRID_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(TRY_CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Quality filter cascade
# ---------------------------------------------------------------------------


def curate_quality_filter_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-stage quality gate over documents, cheap to expensive:
    (1) char-length band, (2) minimum token count, (3) symbol share,
    (4) duplicate-token share. Each stage sees only the previous
    stage's survivors; the report gives per-stage population, passes
    and selectivity in integer ppm — the funnel evidence that
    justifies running cheap filters first. ONE conditional-aggregation
    scan computes all four stages (each stage flag is a codegen'd
    boolean conjunction), then a stack unpivots the funnel."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"),
        F.length(F.regexp_replace("text", "[a-z0-9 ]", "")).alias("n_sym"),
    )
    staged = docs.select(
        (F.col("n_chars").between(100, 2000)).alias("s1"),
        (F.size("toks") >= 20).alias("p2"),
        (
            F.col("n_sym") * 1_000_000 < F.lit(100_000) * F.col("n_chars")
        ).alias("p3"),
        (
            (F.size("toks") - F.size(F.array_distinct("toks"))) * 1_000_000
            < F.lit(600_000) * F.size("toks")
        ).alias("p4"),
    ).select(
        "s1",
        (F.col("s1") & F.col("p2")).alias("s2"),
        (F.col("s1") & F.col("p2") & F.col("p3")).alias("s3"),
        (F.col("s1") & F.col("p2") & F.col("p3") & F.col("p4")).alias("s4"),
    )
    agg = staged.agg(
        F.count("*").alias("n0"),
        F.sum(F.col("s1").cast("long")).alias("n1"),
        F.sum(F.col("s2").cast("long")).alias("n2"),
        F.sum(F.col("s3").cast("long")).alias("n3"),
        F.sum(F.col("s4").cast("long")).alias("n4"),
    )
    return agg.selectExpr(
        "stack(4, "
        "'1_char_band',  n0, n1, "
        "'2_min_tokens', n1, n2, "
        "'3_symbol_share', n2, n3, "
        "'4_dup_tokens', n3, n4"
        ") AS (stage, n_in, n_pass)"
    ).selectExpr(
        "stage",
        "CAST(n_in AS BIGINT) AS n_in",
        "CAST(n_pass AS BIGINT) AS n_pass",
        "CAST(CASE WHEN n_in = 0 THEN 0 "
        "     ELSE 1000000 * n_pass DIV n_in END AS BIGINT) AS selectivity_ppm",
    )


_CASCADE_SQL = """
WITH staged AS (
  SELECT (n_chars BETWEEN 100 AND 2000) AS s1_only,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS nt,
         length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_sym,
         n_chars,
         len(list_distinct(list_filter(string_split(text, ' '), x -> x <> '')))
           AS nd
  FROM documents
), flags AS (
  SELECT s1_only AS s1,
         s1_only AND nt >= 20 AS s2,
         s1_only AND nt >= 20 AND n_sym * 1000000 < 100000 * n_chars AS s3,
         s1_only AND nt >= 20 AND n_sym * 1000000 < 100000 * n_chars
                 AND (nt - nd) * 1000000 < 600000 * nt AS s4
  FROM staged
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         CAST(SUM(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
  FROM flags
)
SELECT stage, n_in, n_pass,
       CAST(CASE WHEN n_in = 0 THEN 0
            ELSE 1000000 * n_pass // n_in END AS BIGINT) AS selectivity_ppm
FROM (
  SELECT '1_char_band' AS stage, n0 AS n_in, n1 AS n_pass FROM agg
  UNION ALL SELECT '2_min_tokens', n1, n2 FROM agg
  UNION ALL SELECT '3_symbol_share', n2, n3 FROM agg
  UNION ALL SELECT '4_dup_tokens', n3, n4 FROM agg
)
"""


QUERIES = {
    "join_hybrid_skew_split": join_hybrid_skew_split,
    "join_hybrid_skew_sampled": join_hybrid_skew_sampled,
    "curate_quality_filter_cascade": curate_quality_filter_cascade,
}

ORACLE = {
    "join_hybrid_skew_split": _HYBRID_SQL,
    # split-invariance: ANY hot set yields the plain join's result, so
    # the sampled variant shares the exact variant's oracle verbatim
    "join_hybrid_skew_sampled": _HYBRID_SQL,
    "curate_quality_filter_cascade": _CASCADE_SQL,
}
