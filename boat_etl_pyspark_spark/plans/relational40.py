"""Round-5 batch 25: in-engine ML evaluation and training operators
(SURVEY.md §2.9 aggregation/ML families; no reference counterpart —
the reference's single pandas pipeline has no model-evaluation
surface, so these extend the training-data-pipeline capability the
brief asks for).

  * ``ml_ndcg_at_k`` — ranking quality: NDCG@5 of the
    price-descending order ranking per customer against a
    lineitem-count relevance gain, every per-position term floored
    to integer micros BEFORE summation so the DCG is
    order-of-addition independent.
  * ``ml_cohens_kappa`` — inter-annotator agreement between two
    rule-based document-quality annotators (char-length vs
    word-count gates): observed/expected agreement and kappa from
    one conditional-aggregate scan.
  * ``ml_decision_stump`` — trains a depth-1 decision tree on
    orders (label: finalized status, feature: total price) by
    scanning 64 equi-width candidate cuts built from ONE histogram
    pass + a cumulative window; picks the weighted-Gini-minimal
    split. The classic "can the engine train a model without
    leaving SQL" shape.
  * ``ml_naive_bayes_lang`` — trains a multinomial Naive Bayes
    language classifier on an 80% hash split of the documents
    corpus (Laplace +1), scores the 20% holdout in integer
    micro-nats, and returns the confusion matrix. The corpus is
    tokenized exactly ONCE into a persisted (doc, lang, token,
    count) relation; all five training aggregates and the scoring
    join derive from it.

All four share one SQL core per operator with placeholder-swapped
table names / integer-division spelling, so every float operation
shape (and therefore every IEEE rounding) is identical between the
Spark plan and the DuckDB oracle; accumulations happen on integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .contract import money_cents_sql

# ---------------------------------------------------------------------------
# NDCG@k
# ---------------------------------------------------------------------------

_NDCG_K = 5

# Per-position DCG terms are floored to integer micros individually,
# then integer-summed: float addition order (which differs between
# engines and between Spark partitionings) can never flip the result.
_NDCG_CORE = f"""
WITH g AS (
  SELECT l_orderkey AS okey, COUNT(*) AS gain FROM {{lineitem}}
  GROUP BY l_orderkey
), r AS (
  SELECT o.o_custkey AS cust,
         COALESCE(g.gain, 0) AS gain,
         ROW_NUMBER() OVER (PARTITION BY o.o_custkey
                            ORDER BY o.o_totalprice DESC, o.o_orderkey)
           AS pos,
         ROW_NUMBER() OVER (PARTITION BY o.o_custkey
                            ORDER BY COALESCE(g.gain, 0) DESC, o.o_orderkey)
           AS ideal_pos
  FROM {{orders}} o LEFT JOIN g ON g.okey = o.o_orderkey
), terms AS (
  SELECT cust,
         SUM(CASE WHEN pos <= {_NDCG_K}
             THEN CAST(floor(CAST(gain AS DOUBLE) * 1000000
                             / log2(pos + 1)) AS BIGINT)
             ELSE 0 END) AS dcg_micro,
         SUM(CASE WHEN ideal_pos <= {_NDCG_K}
             THEN CAST(floor(CAST(gain AS DOUBLE) * 1000000
                             / log2(ideal_pos + 1)) AS BIGINT)
             ELSE 0 END) AS idcg_micro
  FROM r GROUP BY cust
), nd AS (
  SELECT cust, dcg_micro * 1000000 {{idiv}} idcg_micro AS ndcg_micro
  FROM terms WHERE idcg_micro > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(ndcg_micro) {{idiv}} COUNT(*) AS BIGINT)
         AS mean_ndcg_micro,
       CAST(MIN(ndcg_micro) AS BIGINT) AS min_ndcg_micro,
       CAST(SUM(CASE WHEN ndcg_micro = 1000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_perfect
FROM nd
"""


def ml_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 of the price-ranked order list per customer, gain =
    lineitem count. One shuffle builds per-order gains, one more
    ranks within customer (both windows share the o_custkey
    partitioning, so Catalyst plans ONE exchange for the pair);
    the final mean is a scalar aggregate. Per-position terms are
    integer micros (see module docstring) so the metric is exact
    and partitioning-independent — at 100 TB this is a
    groupBy(order) + window(customer) pipeline, no all-pairs
    anything."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r40_ndcg_orders"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "r40_ndcg_lineitem"
    )
    return spark.sql(
        _NDCG_CORE.format(
            orders="r40_ndcg_orders",
            lineitem="r40_ndcg_lineitem",
            idiv="DIV",
        )
    )


_NDCG_DUCK = _NDCG_CORE.format(
    orders="orders", lineitem="lineitem", idiv="//"
)

# ---------------------------------------------------------------------------
# Cohen's kappa
# ---------------------------------------------------------------------------

_KAPPA_CHARS = 300
_KAPPA_WORDS = 45

_KAPPA_CORE = f"""
WITH d AS (
  SELECT (n_chars >= {_KAPPA_CHARS}) AS a, ({{wc}} >= {_KAPPA_WORDS}) AS b
  FROM {{docs}}
), c AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN a THEN 1 ELSE 0 END) AS na,
         SUM(CASE WHEN b THEN 1 ELSE 0 END) AS nb,
         SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS n11,
         SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS n00
  FROM d
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(n11 AS BIGINT) AS n_both_pos,
       CAST(n00 AS BIGINT) AS n_both_neg,
       CAST(floor(CAST(n11 + n00 AS DOUBLE) / n * 1000000) AS BIGINT)
         AS po_micro,
       CAST(floor((CAST(na AS DOUBLE) * nb
                   + CAST(n - na AS DOUBLE) * (n - nb))
                  / (CAST(n AS DOUBLE) * n) * 1000000) AS BIGINT)
         AS pe_micro,
       CAST(floor((CAST(n11 + n00 AS DOUBLE) / n
                   - (CAST(na AS DOUBLE) * nb
                      + CAST(n - na AS DOUBLE) * (n - nb))
                     / (CAST(n AS DOUBLE) * n))
                  / (1 - (CAST(na AS DOUBLE) * nb
                          + CAST(n - na AS DOUBLE) * (n - nb))
                         / (CAST(n AS DOUBLE) * n))
                  * 1000000) AS BIGINT) AS kappa_micro
FROM c
"""


def ml_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic document annotators
    (A: n_chars >= 300, B: word count >= 45). The whole statistic is
    five conditional sums in ONE map-combined scan; kappa is a
    fixed-shape float expression over those integers, floored to
    micros — the inter-annotator-agreement gate a labeling pipeline
    runs before trusting silver labels. pe < 1 is guaranteed
    whenever both annotators emit both classes (true at every
    fixture scale); a degenerate annotator would make kappa
    undefined in textbooks and NULL here, visible either way."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "r40_kappa_docs"
    )
    return spark.sql(
        _KAPPA_CORE.format(
            docs="r40_kappa_docs",
            wc="size(filter(split(text, ' '), x -> x != ''))",
        )
    )


_KAPPA_DUCK = _KAPPA_CORE.format(
    docs="documents",
    wc="len(list_filter(string_split(text, ' '), x -> x != ''))",
)

# ---------------------------------------------------------------------------
# Decision stump
# ---------------------------------------------------------------------------

_STUMP_BINS = 64

_STUMP_CORE = f"""
WITH f AS (
  SELECT {money_cents_sql('o_totalprice')} AS v,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM {{orders}}
), span AS (
  SELECT MIN(v) AS lo, MAX(v) AS hi FROM f
), b AS (
  SELECT LEAST((v - lo) * {_STUMP_BINS} {{idiv}} GREATEST(hi - lo, 1),
               {_STUMP_BINS} - 1) AS bin, y, lo, hi
  FROM f CROSS JOIN span
), hist AS (
  SELECT bin, COUNT(*) AS n, SUM(y) AS pos,
         MIN(lo) AS lo, MIN(hi) AS hi
  FROM b GROUP BY bin
), cum AS (
  SELECT bin,
         SUM(n) OVER (ORDER BY bin) AS nl,
         SUM(pos) OVER (ORDER BY bin) AS posl,
         SUM(n) OVER () AS nt,
         SUM(pos) OVER () AS post,
         lo, hi
  FROM hist
), cand AS (
  SELECT bin AS cut_bin, nl, posl, nt - nl AS nr, post - posl AS posr,
         nt, post, lo, hi
  FROM cum WHERE nl > 0 AND nt - nl > 0
), scored AS (
  SELECT cut_bin, nl, nr, lo, hi,
         CAST(floor((CAST(nl AS DOUBLE) / nt
                     * (1 - (CAST(posl AS DOUBLE) / nl)
                           * (CAST(posl AS DOUBLE) / nl)
                         - (CAST(nl - posl AS DOUBLE) / nl)
                           * (CAST(nl - posl AS DOUBLE) / nl))
                     + CAST(nr AS DOUBLE) / nt
                     * (1 - (CAST(posr AS DOUBLE) / nr)
                           * (CAST(posr AS DOUBLE) / nr)
                         - (CAST(nr - posr AS DOUBLE) / nr)
                           * (CAST(nr - posr AS DOUBLE) / nr)))
                    * 1000000) AS BIGINT) AS gini_micro,
         CAST(floor((1 - (CAST(post AS DOUBLE) / nt)
                         * (CAST(post AS DOUBLE) / nt)
                       - (CAST(nt - post AS DOUBLE) / nt)
                         * (CAST(nt - post AS DOUBLE) / nt))
                    * 1000000) AS BIGINT) AS parent_gini_micro
  FROM cand
)
SELECT CAST(cut_bin AS BIGINT) AS cut_bin,
       CAST(lo + (cut_bin + 1) * (hi - lo)
              {{idiv}} {_STUMP_BINS} AS BIGINT) AS threshold_cents,
       CAST(nl AS BIGINT) AS n_left,
       CAST(nr AS BIGINT) AS n_right,
       gini_micro, parent_gini_micro
FROM scored
ORDER BY gini_micro, cut_bin LIMIT 1
"""


def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-1 decision tree on orders: label = finalized status,
    feature = total price in cents. The feature range comes from a
    1-row scalar aggregate (crossJoined, no collect); rows bin into
    64 equi-width integer buckets in one scan; a cumulative window
    over the 64-row histogram yields every candidate split's
    left/right class counts at once — evaluating 64 cuts costs one
    histogram, not 64 scans. lo/hi ride through the histogram as
    MIN-carried columns so the span relation is referenced exactly
    once: orders is scanned twice total (span aggregate + binning),
    both column-pruned to 2 columns — at 100 TB re-reading a pruned
    scan beats caching the row-level projection. That is exactly how
    distributed GBDT
    libraries (XGBoost/LightGBM histogram mode) pick splits, so the
    shape scales to any row count: the only full-data work is the
    binning scan; everything after is 64 rows."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r40_stump_orders"
    )
    return spark.sql(_STUMP_CORE.format(orders="r40_stump_orders", idiv="DIV"))


_STUMP_DUCK = _STUMP_CORE.format(orders="orders", idiv="//")

# ---------------------------------------------------------------------------
# Multinomial Naive Bayes (train + holdout confusion matrix)
# ---------------------------------------------------------------------------

_NB_CORE = """
WITH train AS (
  SELECT lang, token, m FROM {tokc} WHERE doc_id % 5 != 0
), ctl AS (
  SELECT lang, token, SUM(m) AS c FROM train GROUP BY lang, token
), cl AS (
  SELECT lang, SUM(m) AS tot FROM train GROUP BY lang
), v AS (
  SELECT COUNT(DISTINCT token) AS vsz FROM train
), prior AS (
  SELECT lang, COUNT(DISTINCT doc_id) AS nd FROM {tokc}
  WHERE doc_id % 5 != 0 GROUP BY lang
), priort AS (
  SELECT lang, nd, SUM(nd) OVER () AS ndt FROM prior
), linfo AS (
  SELECT p.lang,
         CAST(floor(ln(CAST(p.nd AS DOUBLE) / p.ndt) * 1000000)
              AS BIGINT) AS prior_micro,
         CAST(floor(ln(1.0 / (CAST(cl.tot AS DOUBLE) + v.vsz)) * 1000000)
              AS BIGINT) AS def_micro
  FROM priort p JOIN cl ON cl.lang = p.lang CROSS JOIN v
), lp AS (
  SELECT ctl.lang, ctl.token,
         CAST(floor(ln((CAST(ctl.c AS DOUBLE) + 1)
                       / (CAST(cl.tot AS DOUBLE) + v.vsz)) * 1000000)
              AS BIGINT) AS lp_micro
  FROM ctl JOIN cl ON cl.lang = ctl.lang CROSS JOIN v
), test AS (
  SELECT doc_id, lang AS true_lang, token, m FROM {tokc}
  WHERE doc_id % 5 = 0
), scored AS (
  SELECT t.doc_id, t.true_lang, l.lang AS cand,
         l.prior_micro + SUM(t.m * COALESCE(s.lp_micro, l.def_micro))
           AS score_micro
  FROM test t CROSS JOIN linfo l
  LEFT JOIN lp s ON s.lang = l.lang AND s.token = t.token
  GROUP BY t.doc_id, t.true_lang, l.lang, l.prior_micro
), pred AS (
  SELECT doc_id, true_lang, cand,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score_micro DESC, cand) AS rn
  FROM scored
)
SELECT true_lang, cand AS pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred WHERE rn = 1
GROUP BY true_lang, cand
ORDER BY true_lang, pred_lang
"""


def ml_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained and
    evaluated in one plan. doc_id % 5 hash-splits 80/20; training is
    three aggregates over a persisted (doc, lang, token, count)
    relation (the corpus tokenizes exactly once — expressing it as a
    CTE would re-explode per reference, the measured trap the DSIR
    plan documents); scoring left-joins holdout token counts against
    the (lang, token) log-likelihood table — a shuffle on token, the
    NB-scoring shape that scales because documents never move, only
    (token, count) pairs do. Per-token log-probs are floored to
    integer micro-nats before the weighted sum, so scores (and the
    argmax) are exact and addition-order independent. Output is the
    holdout confusion matrix."""
    # Round 11: the (doc, lang, token, m) relation is session-shared
    # (the copurchase_pairs discipline — keyed by applicationId,
    # rebuilt from parquet every run, first consumer pays the build
    # inside its own timed region) instead of re-tokenizing per
    # call; its rows are a deterministic per-row explode + count, so
    # the cached copy is value-identical to the inline form.
    from .textdedup import _cached

    def build():
        docs = load_table(spark, sf_dir, "documents")
        tok = docs.select(
            "doc_id",
            "lang",
            F.explode(
                F.expr("filter(split(text, ' '), x -> x != '')")
            ).alias("token"),
        )
        return tok.groupBy("doc_id", "lang", "token").agg(
            F.count("*").alias("m")
        )

    _cached(spark, sf_dir, "nb_tokc", build).createOrReplaceTempView(
        "r40_nb_tokc"
    )
    return spark.sql(_NB_CORE.format(tokc="r40_nb_tokc"))


_NB_DUCK = _NB_CORE.format(tokc="nb_tokc").replace(
    "WITH train AS (",
    """WITH nb_tokc AS (
  SELECT doc_id, lang, token, COUNT(*) AS m
  FROM (SELECT doc_id, lang,
               unnest(list_filter(string_split(text, ' '),
                                  x -> x != '')) AS token
        FROM documents)
  GROUP BY doc_id, lang, token
), train AS (""",
    1,
)


QUERIES = {
    "ml_ndcg_at_k": ml_ndcg_at_k,
    "ml_cohens_kappa": ml_cohens_kappa,
    "ml_decision_stump": ml_decision_stump,
    "ml_naive_bayes_lang": ml_naive_bayes_lang,
}

ORACLE = {
    "ml_ndcg_at_k": _NDCG_DUCK,
    "ml_cohens_kappa": _KAPPA_DUCK,
    "ml_decision_stump": _STUMP_DUCK,
    "ml_naive_bayes_lang": _NB_DUCK,
}
