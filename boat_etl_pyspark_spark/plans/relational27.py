"""Round-5 batch 9: distribution-comparison statistics, ML-prep
utilities and a conditional language model (SURVEY.md §2.9
aggregation / LLM-pipeline families; no reference counterpart).

  * ``agg_ks_test`` — exact two-sample Kolmogorov–Smirnov D between
    the returned ('R') and non-returned ('N') extended-price
    distributions on a whole-dollar grid. The ECDF difference is kept
    as the INTEGER ``|cumA·nB − cumB·nA|`` so the max and the final
    ppm statistic never touch a float.
  * ``agg_autocorrelation`` — lag-{1,2,3,7} autocorrelation of the
    daily order-revenue series. The daily series is a tiny aggregate;
    each lag is an equi-join of the series against itself shifted by
    the lag, and the Pearson sums are exact DECIMAL(38,0)/HUGEINT.
  * ``agg_theil_index`` — Theil T inequality index of per-customer
    spend (the additively-decomposable cousin of Gini): per-customer
    term floored to nano units before the sum, so the statistic is
    order-independent and engine-exact.
  * ``ml_mutual_information`` — mutual information between
    l_returnflag and l_linestatus plus both marginal entropies and the
    normalized-MI ratio, all from ONE (flag, mode) count scan;
    nano-nat per-cell floors keep it exact.
  * ``ml_kfold_assign`` — deterministic stratified 5-fold assignment
    of customers (md5-bucket within c_mktsegment), with per-fold
    balance shares in exact milli units — the reproducible
    cross-validation split step of an ML pipeline.
  * ``text_bigram_perplexity`` — add-one-smoothed corpus bigram LM
    cross-entropy per source (nano-nats per bigram): the conditional
    upgrade of ``text_unigram_surprisal`` (KenLM shape). Tokenize
    once; the LM is one (w1,w2) count shuffle; scoring ships word
    pairs, never documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from ..sources.readers import load_table
from .contract import money_cents_sql, money_rounded_sql

# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov
# ---------------------------------------------------------------------------
# ECDFs are compared on a whole-dollar grid: the grid bounds the
# cumulative-window relation by grid cardinality (~10^5 rows at any
# data scale), not by fact rows — quantization resolution is the
# explicit knob that keeps the single ordered window scalable. With
# counts na, nb and cumulative grid counts cumA, cumB, the statistic
#   D = max |cumA/na − cumB/nb| = max |cumA·nb − cumB·na| / (na·nb)
# is computed entirely in integers; only the final ppm scaling
# divides, and that is integer division too.

_KS_CORE = """
WITH v AS (
  SELECT """ + money_cents_sql("l_extendedprice", scale=1) + """ AS g, l_returnflag AS flag
  FROM {lineitem} WHERE l_returnflag IN ('R', 'N')
), cnt AS (
  SELECT g,
         SUM(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN flag = 'N' THEN 1 ELSE 0 END) AS cb
  FROM v WHERE g IS NOT NULL GROUP BY g
), cum AS (
  SELECT SUM(ca) OVER (ORDER BY g) AS cuma,
         SUM(cb) OVER (ORDER BY g) AS cumb,
         SUM(ca) OVER () AS na,
         SUM(cb) OVER () AS nb
  FROM cnt
), d AS (
  SELECT MAX(abs(CAST(cuma AS {big}) * nb - CAST(cumb AS {big}) * na))
           AS maxdiff,
         MAX(na) AS na, MAX(nb) AS nb
  FROM cum
)
SELECT CAST(na AS BIGINT) AS n_r,
       CAST(nb AS BIGINT) AS n_n,
       CAST(maxdiff * 1000000 {idiv} (CAST(na AS {big}) * nb) AS BIGINT)
         AS ks_d_ppm
FROM d
"""


def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS distance between the 'R' and 'N'
    extended-price distributions on a $1 grid. ONE fact scan: the
    sample totals ride the same single-partition grid window as the
    running counts (full-frame SUM() OVER ()), so no second
    aggregate re-reads the table. The window's cardinality is
    bounded by the grid, not the data, and D in ppm never touches a
    float."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "r27_ks_lineitem"
    )
    return spark.sql(
        _KS_CORE.format(lineitem="r27_ks_lineitem", big="DECIMAL(38,0)",
                        idiv="DIV")
    )


_KS_DUCK = _KS_CORE.format(lineitem="lineitem", big="HUGEINT", idiv="//")


# ---------------------------------------------------------------------------
# Autocorrelation of the daily revenue series
# ---------------------------------------------------------------------------

_ACF_CORE = """
WITH daily AS (
  SELECT {dayidx} AS di,
         SUM(TRY_CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM {orders} GROUP BY o_orderdate
), lagged AS (
  SELECT cents AS x,
         MAX(cents) OVER (ORDER BY di
             RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS y1,
         MAX(cents) OVER (ORDER BY di
             RANGE BETWEEN 2 PRECEDING AND 2 PRECEDING) AS y2,
         MAX(cents) OVER (ORDER BY di
             RANGE BETWEEN 3 PRECEDING AND 3 PRECEDING) AS y3,
         MAX(cents) OVER (ORDER BY di
             RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS y7
  FROM daily
), pairs AS (
  SELECT l.lag, x,
         CASE l.lag WHEN 1 THEN y1 WHEN 2 THEN y2
                    WHEN 3 THEN y3 ELSE y7 END AS y
  FROM lagged CROSS JOIN {lags}
  WHERE CASE l.lag WHEN 1 THEN y1 WHEN 2 THEN y2
                   WHEN 3 THEN y3 ELSE y7 END IS NOT NULL
), s AS (
  SELECT lag, COUNT(*) AS n,
         SUM(CAST(x AS {big})) AS sx, SUM(CAST(y AS {big})) AS sy,
         SUM(CAST(x AS {big}) * x) AS sxx,
         SUM(CAST(y AS {big}) * y) AS syy,
         SUM(CAST(x AS {big}) * y) AS sxy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag_days,
       CAST(n AS BIGINT) AS n_pairs,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                         * CAST(n * syy - sy * sy AS DOUBLE))
                  * 1e6) AS BIGINT) AS acf_micro
FROM s
ORDER BY lag_days
"""


def agg_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-{1,2,3,7} autocorrelation of daily order revenue from ONE
    fact scan: the table collapses to a tiny per-day aggregate, and
    each lag's partner value comes from a degenerate RANGE frame
    (exactly `lag` days back) over the same day-index sort — no
    self-join, so the daily relation is never derived twice. Pairs
    exist only where both days are observed (NULL frames drop); the
    Pearson sums are exact DECIMAL(38,0)/HUGEINT."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r27_acf_orders"
    )
    return spark.sql(
        _ACF_CORE.format(
            orders="r27_acf_orders",
            lags="(VALUES (1), (2), (3), (7)) AS l(lag)",
            dayidx="datediff(CAST(o_orderdate AS DATE), DATE '1990-01-01')",
            big="DECIMAL(38,0)",
        )
    )


_ACF_DUCK = _ACF_CORE.format(
    orders="orders",
    lags="(VALUES (1), (2), (3), (7)) AS l(lag)",
    dayidx="CAST(o_orderdate AS DATE) - DATE '1990-01-01'",
    big="HUGEINT",
)


# ---------------------------------------------------------------------------
# Theil T inequality index
# ---------------------------------------------------------------------------

_THEIL_CORE = f"""
WITH spend0 AS (
  SELECT o_custkey AS ck,
         SUM({money_rounded_sql('o_totalprice')}) AS cents
  FROM {{orders}} GROUP BY o_custkey
), spend AS (
  -- Theil T is defined on POSITIVE spend only: ln of a negative
  -- term throws in DuckDB and mints NaN in Spark, and a NULL
  -- (all-corrupt) spend has no term — excluded symmetrically
  SELECT ck, cents FROM spend0 WHERE cents IS NOT NULL AND cents > 0
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(CAST(cents AS {{big}})) AS s
  FROM spend
), terms AS (
  SELECT t.n,
         CAST(floor((CAST(cents AS DOUBLE) * t.n / CAST(t.s AS DOUBLE))
                    * ln(CAST(cents AS DOUBLE) * t.n / CAST(t.s AS DOUBLE))
                    * 1e9) AS BIGINT) AS term
  FROM spend CROSS JOIN tot t
)
SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST(SUM(term) AS BIGINT) AS theil_term_sum_nano,
       CAST(SUM(term) {{idiv}} MAX(n) AS BIGINT) AS theil_nano
FROM terms
"""


def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T index of per-customer spend: mean of (x/mu)*ln(x/mu)
    over customers with orders. Per-customer terms are floored to
    nano units BEFORE the sum (order-independent, engine-exact); the
    1-row totals relation broadcasts. The per-customer relation IS
    derived twice (totals + terms) — deliberate: it is NOT tiny at
    scale, so a full-frame window over it would serialize through
    one task, while the second derivation is a 2-column map-combined
    re-aggregate of the same pruned scan (see SCALE.md's
    multi-referenced-CTE audit for the decision rule). Theil is
    additively decomposable — the production form of 'which source
    concentrates the spend' drill-downs."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r27_theil_orders"
    )
    return spark.sql(
        _THEIL_CORE.format(orders="r27_theil_orders", big="DECIMAL(38,0)",
                           idiv="DIV")
    )


_THEIL_DUCK = _THEIL_CORE.format(orders="orders", big="HUGEINT", idiv="//")


# ---------------------------------------------------------------------------
# Mutual information between two categorical columns
# ---------------------------------------------------------------------------

_MI_CORE = """
WITH j AS (
  SELECT l_returnflag AS x, l_linestatus AS y, COUNT(*) AS c
  FROM {lineitem} GROUP BY l_returnflag, l_linestatus
), w AS (
  SELECT c,
         SUM(c) OVER (PARTITION BY x) AS cx,
         SUM(c) OVER (PARTITION BY y) AS cy,
         SUM(c) OVER () AS n,
         ROW_NUMBER() OVER (PARTITION BY x ORDER BY y) AS rnx,
         ROW_NUMBER() OVER (PARTITION BY y ORDER BY x) AS rny
  FROM j
), s AS (
  SELECT MAX(n) AS n,
         SUM(CAST(floor((CAST(c AS DOUBLE) / n)
                        * ln(CAST(c AS DOUBLE) * n
                             / (CAST(cx AS DOUBLE) * cy))
                        * 1e9) AS BIGINT)) AS mi_nano,
         SUM(CASE WHEN rnx = 1 THEN
               CAST(floor(-(CAST(cx AS DOUBLE) / n)
                          * ln(CAST(cx AS DOUBLE) / n) * 1e9) AS BIGINT)
             ELSE 0 END) AS hx_nano,
         SUM(CASE WHEN rny = 1 THEN
               CAST(floor(-(CAST(cy AS DOUBLE) / n)
                          * ln(CAST(cy AS DOUBLE) / n) * 1e9) AS BIGINT)
             ELSE 0 END) AS hy_nano
  FROM w
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(mi_nano AS BIGINT) AS mi_nano_nats,
       CAST(hx_nano AS BIGINT) AS h_flag_nano_nats,
       CAST(hy_nano AS BIGINT) AS h_status_nano_nats,
       CAST(mi_nano * 1000 {idiv} least(hx_nano, hy_nano) AS BIGINT)
         AS nmi_milli
FROM s
"""


def ml_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between l_returnflag and l_linestatus with
    both marginal entropies and min-normalized MI. ONE (x, y) count
    scan of the fact table; marginals and the grand total are windows
    over the ~6-cell contingency relation (never a re-aggregate that
    would re-read the table), and each marginal's entropy term is
    emitted once via a first-row-per-partition flag. Per-cell
    nano-nat floors make the sums order-independent. This is the
    feature-selection primitive (rank features by MI with the label)
    of an ML-prep pipeline."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "r27_mi_lineitem"
    )
    return spark.sql(_MI_CORE.format(lineitem="r27_mi_lineitem", idiv="DIV"))


_MI_DUCK = _MI_CORE.format(lineitem="lineitem", idiv="//")


# ---------------------------------------------------------------------------
# Stratified k-fold assignment
# ---------------------------------------------------------------------------

_KFOLD_K = 5

_KFOLD_CORE = f"""
WITH f AS (
  SELECT c_mktsegment AS segment,
         CAST({{bucket}} % {_KFOLD_K} AS BIGINT) AS fold,
         TRY_CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM {{customer}}
)
SELECT segment, fold,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(bal_cents) AS BIGINT) AS sum_bal_cents,
       CAST(COUNT(*) * 1000
            {{idiv}} SUM(COUNT(*)) OVER (PARTITION BY segment)
         AS BIGINT) AS share_milli
FROM f GROUP BY segment, fold
ORDER BY segment, fold
"""

_KFOLD_SPARK_BUCKET = (
    "CAST(conv(substr(md5(CAST(c_custkey AS STRING)), 1, 6), 16, 10)"
    " AS BIGINT)"
)
_KFOLD_DUCK_BUCKET = (
    "CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 6) AS BIGINT)"
)


def ml_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified 5-fold split of customers: fold =
    md5(custkey) bucket (seedless, engine-portable, stable under
    re-partitioning — the property a reproducible CV split needs),
    reported as per-(segment, fold) counts, balance shares in exact
    milli units, and account-balance mass. One scan, one aggregate;
    the window runs on the 25-row aggregate output."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "r27_kfold_customer"
    )
    return spark.sql(
        _KFOLD_CORE.format(
            customer="r27_kfold_customer",
            bucket=_KFOLD_SPARK_BUCKET,
            idiv="DIV",
        )
    )


_KFOLD_DUCK = _KFOLD_CORE.format(
    customer="customer", bucket=_KFOLD_DUCK_BUCKET, idiv="//"
)


# ---------------------------------------------------------------------------
# Bigram-LM cross-entropy per source
# ---------------------------------------------------------------------------
# Add-one smoothing over the corpus bigram table:
#   P(w2 | w1) = (c(w1,w2) + 1) / (ctx(w1) + V)
# where ctx(w1) counts w1 as a bigram left-context and V is the
# corpus unigram vocabulary. Every document bigram exists in the LM
# (it was trained on the same corpus), so the join is inner and the
# per-occurrence NLL is floored to nano-nats before the per-source
# sum. Cross-entropy per token = sum DIV count, exact.

_BLM_SPARK = """
WITH toks AS (
  SELECT source, filter(split(text, ' '), x -> x != '') AS t FROM {docs}
), bg AS (
  SELECT source, b.w1, b.w2
  FROM toks
  LATERAL VIEW explode(transform(sequence(1, size(t) - 1),
                       i -> named_struct('w1', t[i-1], 'w2', t[i]))) e AS b
  WHERE size(t) >= 2
), freq AS (
  SELECT w1, w2, COUNT(*) AS f FROM bg GROUP BY w1, w2
), ctx AS (
  SELECT w1, SUM(f) AS cw FROM freq GROUP BY w1
), voc AS (
  SELECT COUNT(DISTINCT tok) AS v
  FROM (SELECT explode(t) AS tok FROM toks)
), scored AS (
  SELECT bg.source,
         CAST(floor(-ln((CAST(freq.f AS DOUBLE) + 1)
                        / (CAST(ctx.cw AS DOUBLE) + voc.v)) * 1e9)
           AS BIGINT) AS nll_nano
  FROM bg
  JOIN freq ON bg.w1 = freq.w1 AND bg.w2 = freq.w2
  JOIN ctx ON bg.w1 = ctx.w1
  CROSS JOIN voc
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(nll_nano) AS BIGINT) AS nll_sum_nano,
       CAST(SUM(nll_nano) DIV COUNT(*) AS BIGINT) AS xent_nano_per_bigram
FROM scored GROUP BY source
"""

_BLM_DUCK = """
WITH toks AS (
  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
), bg AS (
  SELECT source, t[i] AS w1, t[i + 1] AS w2
  FROM toks, (SELECT unnest(range(1, 600)) AS i)
  WHERE i <= len(t) - 1
), freq AS (
  SELECT w1, w2, COUNT(*) AS f FROM bg GROUP BY w1, w2
), ctx AS (
  SELECT w1, SUM(f) AS cw FROM freq GROUP BY w1
), voc AS (
  SELECT COUNT(DISTINCT tok) AS v
  FROM (SELECT unnest(t) AS tok FROM toks)
), scored AS (
  SELECT bg.source,
         CAST(floor(-ln((CAST(freq.f AS DOUBLE) + 1)
                        / (CAST(ctx.cw AS DOUBLE) + voc.v)) * 1e9)
           AS BIGINT) AS nll_nano
  FROM bg
  JOIN freq ON bg.w1 = freq.w1 AND bg.w2 = freq.w2
  JOIN ctx ON bg.w1 = ctx.w1
  CROSS JOIN voc
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(nll_nano) AS BIGINT) AS nll_sum_nano,
       CAST(SUM(nll_nano) // COUNT(*) AS BIGINT) AS xent_nano_per_bigram
FROM scored GROUP BY source
"""


def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cross-entropy under an add-one corpus bigram LM
    (nano-nats per bigram) — the conditional-probability upgrade of
    text_unigram_surprisal and the cheap KenLM-style fluency signal
    for corpus triage. Tokenize once; the LM is one (w1, w2) count
    shuffle plus its w1 rollup; scoring joins ship word pairs and
    counts, never document bodies. Sources whose text is templated
    score low; incoherent sources score high."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "r27_blm_docs"
    )
    return spark.sql(_BLM_SPARK.format(docs="r27_blm_docs"))


QUERIES = {
    "agg_ks_test": agg_ks_test,
    "agg_autocorrelation": agg_autocorrelation,
    "agg_theil_index": agg_theil_index,
    "ml_mutual_information": ml_mutual_information,
    "ml_kfold_assign": ml_kfold_assign,
    "text_bigram_perplexity": text_bigram_perplexity,
}

ORACLE = {
    "agg_ks_test": _KS_DUCK,
    "agg_autocorrelation": _ACF_DUCK,
    "agg_theil_index": _THEIL_DUCK,
    "ml_mutual_information": _MI_DUCK,
    "ml_kfold_assign": _KFOLD_DUCK,
    "text_bigram_perplexity": _BLM_DUCK,
}
