"""Round-5 batch 38: tokenizer fertility, heavy-tail index, key
discovery, permutation importance, an effect-size panel and a
goodness-of-fit test (SURVEY.md §2.9 text/aggregation/validation/ml/
time-series families; no reference counterpart).

  * ``text_tokenizer_fertility`` — tokens-per-word and
    chars-per-token by language under the BPE-ish regex tokenizer:
    THE equity metric for how expensively a tokenizer encodes each
    language.  Pure integer ratios (milli units, integer division).
  * ``agg_hill_tail_index`` — Hill estimator of the document-length
    tail exponent from the top-100 order statistics.  Each ln term
    is one ln of an exact integer rational, floored to micro-nats
    BEFORE summing, so the sum is an integer and immune to
    float-summation order; the top-k set comes from ORDER BY+LIMIT,
    which Spark compiles to TakeOrderedAndProject (no global sort).
  * ``validate_key_candidates`` — key/uniqueness profiling of the
    orders table in ONE scan: `stack` unpivots the candidate
    columns, one groupBy yields rows / non-nulls / exact distincts
    / is-unique per column.  The schema-discovery pass every
    ingestion pipeline runs before declaring join keys.
  * ``ml_permutation_importance`` — accuracy drop of a median-split
    stump when the feature column is decoupled from labels by a
    DETERMINISTIC md5-rank reversal (hash order is independent of
    both feature and label, so the reversed pairing is a valid
    permutation draw that both engines construct bit-identically).
  * ``agg_effect_size_panel`` — Cohen's d, odds ratio (+ exact-
    rational ln OR) and Cramér's V in one pass each: the effect
    sizes that belong NEXT to every significance test this repo
    ships; all inputs are exact integer power sums / 2×2 counts.
  * ``ts_exponential_fit_ks`` — exponential MLE over per-user event
    interarrivals plus a KS-style distance evaluated on bounded
    hour bins (per-bin |F_emp − F_model| floored to micros, then
    MAX — order-safe).  The 'is this a Poisson process' check
    behind arrival-rate anomaly alerts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table
from .contract import money_rounded_sql
from .textdedup import _TOKEN_RE

# ---------------------------------------------------------------------------
# Tokenizer fertility
# ---------------------------------------------------------------------------

_FERTILITY_CORE = """
WITH per_doc AS (
  SELECT lang, words, bpeish, chars FROM {per_doc}
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(words) AS BIGINT) AS n_words,
       CAST(SUM(bpeish) AS BIGINT) AS n_tokens,
       CAST(SUM(chars) AS BIGINT) AS n_chars,
       CAST(1000 * SUM(bpeish) {idiv} SUM(words) AS BIGINT)
         AS fertility_milli,
       CAST(1000 * SUM(chars) {idiv} SUM(bpeish) AS BIGINT)
         AS chars_per_token_milli
FROM per_doc
GROUP BY lang
ORDER BY lang
"""


def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens-per-word (fertility) and chars-per-token by language
    under the repo's BPE-ish regex tokenizer — the cross-language
    cost metric tokenizer papers report: a language with 2× fertility
    pays 2× the sequence length for the same text.  Whitespace words
    and regex tokens come from the same one-pass projection; all
    ratios are integer milli units (integer division), so the output
    is engine-exact.  One map-side projection + one 5-row groupBy —
    nothing but per-language counters shuffles at any scale."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "r51_fert_docs"
    )
    spark.sql(
        f"""
        SELECT lang,
               size(filter(split(text, ' '), x -> x != '')) AS words,
               size(regexp_extract_all(text, '{_TOKEN_RE}', 0)) AS bpeish,
               length(text) AS chars
        FROM r51_fert_docs
        WHERE text IS NOT NULL
        """
    ).createOrReplaceTempView("r51_fert_per_doc")
    return spark.sql(
        _FERTILITY_CORE.format(per_doc="r51_fert_per_doc", idiv="DIV")
    )


_FERTILITY_DUCK = _FERTILITY_CORE.format(
    per_doc=(
        f"""(
  SELECT lang,
         len(list_filter(string_split(text, ' '), x -> x != '')) AS words,
         len(regexp_extract_all(text, '{_TOKEN_RE}')) AS bpeish,
         length(text) AS chars
  FROM documents
  WHERE text IS NOT NULL
)"""
    ),
    idiv="//",
)

# ---------------------------------------------------------------------------
# Hill tail-index estimator
# ---------------------------------------------------------------------------

_HILL_K = 100

_HILL_CORE = f"""
WITH topk AS (
  SELECT n_chars FROM {{docs}} WHERE n_chars > 0
  ORDER BY n_chars DESC, doc_id LIMIT {_HILL_K}
), th AS (
  SELECT MIN(n_chars) AS x_k, COUNT(*) AS k FROM topk
), terms AS (
  SELECT CAST(floor(ln(CAST(n_chars AS DOUBLE) / x_k) * 1000000)
              AS BIGINT) AS t
  FROM topk CROSS JOIN th
), s AS (
  SELECT SUM(t) AS sum_micro FROM terms
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(x_k AS BIGINT) AS threshold_chars,
       CAST(sum_micro AS BIGINT) AS sum_ln_ratio_micro,
       CAST(sum_micro {{idiv}} (k - 1) AS BIGINT) AS hill_inv_alpha_micro,
       CAST(CASE WHEN sum_micro > 0
                 THEN (k - 1) * 1000000000 {{idiv}} sum_micro
                 ELSE 0 END AS BIGINT) AS hill_alpha_milli
FROM s CROSS JOIN th
"""


def agg_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the document-length tail exponent over the
    top-100 order statistics: 1/α = mean ln(x_i/x_k).  Every ln is
    one ln of an exact integer rational floored to micro-nats BEFORE
    the sum, so the estimator is an integer computation after the
    per-term floor and immune to summation order.  The top-k set is
    ORDER BY + LIMIT — Spark's TakeOrderedAndProject keeps per-
    partition heaps of 100 rows and merges on the driver, so the
    plan never globally sorts; at 100 TB this is the only correct
    shape for an order-statistic tail estimate."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "r51_hill_docs"
    )
    return spark.sql(_HILL_CORE.format(docs="r51_hill_docs", idiv="DIV"))


_HILL_DUCK = _HILL_CORE.format(docs="documents", idiv="//")

# ---------------------------------------------------------------------------
# Key-candidate profiling
# ---------------------------------------------------------------------------

_KEYS_CORE = """
SELECT col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(v) AS BIGINT) AS n_nonnull,
       CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
       CAST(CASE WHEN COUNT(DISTINCT v) = COUNT(*) THEN 1 ELSE 0 END
            AS BIGINT) AS is_unique_key
FROM ({stacked})
GROUP BY col_name
ORDER BY col_name
"""


def validate_key_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key/uniqueness profiling of four orders columns in ONE scan:
    `stack` unpivots (column, value-as-string) pairs map-side, then a
    single groupBy computes rows, non-nulls, exact distincts and the
    is-unique verdict per column — the discovery pass that finds
    o_orderkey is a key and o_custkey/o_orderdate are not.  Exact
    COUNT(DISTINCT) over the stacked relation shuffles hashed values
    once per column group; at 100 TB the same query swaps in
    approx_count_distinct (HLL) per the documented sketch contract
    (`agg_approx_sketches`), trading exactness for a single pass."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r51_keys_orders"
    )
    return spark.sql(
        _KEYS_CORE.format(
            stacked=(
                "SELECT stack(4, "
                "'o_orderkey', CAST(o_orderkey AS STRING), "
                "'o_custkey', CAST(o_custkey AS STRING), "
                "'o_orderdate', CAST(CAST(o_orderdate AS DATE) AS STRING), "
                "'o_orderpriority', o_orderpriority) AS (col_name, v) "
                "FROM r51_keys_orders"
            )
        )
    )


_KEYS_DUCK = _KEYS_CORE.format(
    stacked=(
        "SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS v"
        " FROM orders"
        " UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR)"
        " FROM orders"
        " UNION ALL SELECT 'o_orderdate', CAST(CAST(o_orderdate AS DATE)"
        " AS VARCHAR) FROM orders"
        " UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders"
    )
)

# ---------------------------------------------------------------------------
# Permutation importance
# ---------------------------------------------------------------------------

_PERMIMP_CORE = """
WITH base AS (
  -- bounded cents + NOT NULL (round-10 layer 2): a NULL feature has
  -- no rank (engine NULL ordering differs) and the hash-permutation
  -- tiebreak includes x so a DUPLICATE orderkey (same md5, same key)
  -- still pairs deterministically in both engines
  SELECT ok, x, y FROM (
    SELECT o_orderkey AS ok,
           """ + money_rounded_sql("o_totalprice") + """ AS x,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
    FROM {orders}
  ) WHERE x IS NOT NULL
), ranked AS (
  SELECT ok, x, y,
         ROW_NUMBER() OVER (ORDER BY x, ok, y) AS rx,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(ok AS {str})), ok, x, y)
           AS rh,
         COUNT(*) OVER () AS n
  FROM base
), th AS (
  SELECT x AS t FROM ranked WHERE rx = (n + 1) {idiv} 2
), paired AS (
  SELECT a.y, a.x AS x_true, b.x AS x_perm
  FROM ranked a JOIN ranked b ON b.rh = a.n + 1 - a.rh
), acc AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN (x_true >= t) = (y = 1) THEN 1 ELSE 0 END)
           AS ok_base,
         SUM(CASE WHEN (x_perm >= t) = (y = 1) THEN 1 ELSE 0 END)
           AS ok_perm
  FROM paired CROSS JOIN th
)
SELECT CAST(n AS BIGINT) AS n,
       CAST((SELECT t FROM th) AS BIGINT) AS threshold_cents,
       CAST(1000000 * ok_base {idiv} n AS BIGINT) AS acc_base_ppm,
       CAST(1000000 * ok_perm {idiv} n AS BIGINT) AS acc_perm_ppm,
       CAST(1000000 * ok_base {idiv} n
            - 1000000 * ok_perm {idiv} n AS BIGINT) AS importance_ppm
FROM acc
"""


def ml_permutation_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation importance of order value for predicting
    finalized status under a median-split stump: baseline accuracy
    vs accuracy after the feature column is re-paired with labels by
    REVERSING the md5-hash rank order — a deterministic permutation
    independent of both feature and label that both engines build
    bit-identically (no RNG, no seed drift).  The importance is the
    exact ppm accuracy drop.  The two global ranks are the
    documented single-partition demo shape; the production form
    partitions the rank by a salt exactly as `global_rank` does."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r51_pi_orders"
    )
    return spark.sql(
        _PERMIMP_CORE.format(orders="r51_pi_orders", str="STRING", idiv="DIV")
    )


_PERMIMP_DUCK = _PERMIMP_CORE.format(
    orders="orders", str="VARCHAR", idiv="//"
)

# ---------------------------------------------------------------------------
# Effect-size panel
# ---------------------------------------------------------------------------

_HIGH_VALUE_CENTS = 15_000_000  # $150k

_EFFECT_CORE = f"""
WITH cents AS (
  -- bounded cents + NOT NULL (round-10 layer 2): an absurd castable
  -- value drives the pooled variance negative through float
  -- cancellation (sqrt -> NaN in one engine only), and a row with no
  -- valid money has no effect-size contribution in any panel cell
  SELECT x, g, st, pri FROM (
    SELECT {money_rounded_sql('o_totalprice')} AS x,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g,
           o_orderstatus AS st, o_orderpriority AS pri
    FROM {{orders}}
  ) WHERE x IS NOT NULL
), two AS (
  SELECT SUM(g) AS n1, SUM(1 - g) AS n2,
         SUM(CASE WHEN g = 1 THEN CAST(x AS DECIMAL(38,0)) ELSE 0 END)
           AS s1,
         SUM(CASE WHEN g = 0 THEN CAST(x AS DECIMAL(38,0)) ELSE 0 END)
           AS s2,
         SUM(CASE WHEN g = 1 THEN CAST(x AS DECIMAL(38,0)) * x
                  ELSE 0 END) AS q1,
         SUM(CASE WHEN g = 0 THEN CAST(x AS DECIMAL(38,0)) * x
                  ELSE 0 END) AS q2,
         SUM(CASE WHEN g = 1 AND x > {_HIGH_VALUE_CENTS}
                  THEN 1 ELSE 0 END) AS caa,
         SUM(CASE WHEN g = 1 AND x <= {_HIGH_VALUE_CENTS}
                  THEN 1 ELSE 0 END) AS cab,
         SUM(CASE WHEN g = 0 AND x > {_HIGH_VALUE_CENTS}
                  THEN 1 ELSE 0 END) AS cba,
         SUM(CASE WHEN g = 0 AND x <= {_HIGH_VALUE_CENTS}
                  THEN 1 ELSE 0 END) AS cbb
  FROM cents
), cohens AS (
  SELECT n1, n2, caa, cab, cba, cbb,
         CAST(floor((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
              / sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                      + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
                     / (n1 + n2 - 2))
              * 1000) AS BIGINT) AS cohens_d_milli
  FROM two
), cells AS (
  SELECT pri, st, COUNT(*) AS o_cnt FROM cents GROUP BY pri, st
), margins AS (
  SELECT pri, st, o_cnt,
         SUM(o_cnt) OVER (PARTITION BY pri) AS row_tot,
         SUM(o_cnt) OVER (PARTITION BY st) AS col_tot,
         SUM(o_cnt) OVER () AS n
  FROM cells
), chi AS (
  SELECT MAX(n) AS n,
         COUNT(DISTINCT pri) AS r,
         COUNT(DISTINCT st) AS c,
         SUM(CAST(floor((o_cnt - CAST(row_tot AS DOUBLE) * col_tot / n)
                        * (o_cnt - CAST(row_tot AS DOUBLE) * col_tot / n)
                        / (CAST(row_tot AS DOUBLE) * col_tot / n)
                        * 1e6) AS BIGINT)) AS chi2_micro
  FROM margins
)
SELECT CAST(ch.n AS BIGINT) AS n_orders,
       cohens_d_milli,
       CAST(caa AS BIGINT) AS n_urgent_high,
       CAST(CASE WHEN cab * cba > 0 THEN 1000 * caa * cbb {{idiv}} (cab * cba)
                 ELSE 0 END AS BIGINT) AS odds_ratio_milli,
       CAST(CASE WHEN caa > 0 AND cab > 0 AND cba > 0 AND cbb > 0
                 THEN floor(ln(CAST(caa AS DOUBLE) * cbb
                               / (CAST(cab AS DOUBLE) * cba)) * 1000000)
                 ELSE 0 END AS BIGINT) AS ln_or_micro,
       CAST(chi2_micro AS BIGINT) AS chi2_micro,
       CAST(floor(sqrt(CAST(chi2_micro AS DOUBLE) / 1e6
                       / (CAST(ch.n AS DOUBLE)
                          * (CASE WHEN ch.r < ch.c THEN ch.r
                                  ELSE ch.c END - 1)))
                  * 1000) AS BIGINT) AS cramers_v_milli
FROM cohens CROSS JOIN chi ch
"""


def agg_effect_size_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The effect sizes that belong next to every significance test:
    Cohen's d of order value between urgent and non-urgent orders
    (exact DECIMAL power sums, one fixed-shape float), the odds
    ratio of high-value given urgency as an exact integer rational
    (milli units, integer division) with its ln as one ln of that
    rational, and Cramér's V from the priority×status chi² (per-cell
    floored-micro contributions — the same summation discipline as
    `agg_chi2_independence`, so the integer sum is order-immune).
    Two aggregation passes over one scanned relation, both
    map-combined; every downstream relation is cell-count-sized."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r51_eff_orders"
    )
    return spark.sql(_EFFECT_CORE.format(orders="r51_eff_orders", idiv="DIV"))


_EFFECT_DUCK = _EFFECT_CORE.format(orders="orders", idiv="//")

# ---------------------------------------------------------------------------
# Exponential interarrival fit + KS distance
# ---------------------------------------------------------------------------

_KS_BIN_US = 3_600_000_000  # 1-hour bins

_EXPFIT_CORE = f"""
WITH ts AS (
  SELECT user_id, {{ts_us}} AS t_us, event_id FROM {{events}}
), dt AS (
  SELECT t_us - LAG(t_us) OVER (PARTITION BY user_id
                                ORDER BY t_us, event_id) AS dt_us
  FROM ts
), dts AS (
  SELECT dt_us FROM dt WHERE dt_us IS NOT NULL
), s AS (
  SELECT COUNT(*) AS n, SUM(dt_us) AS tot_us FROM dts
), bins AS (
  SELECT dt_us {{idiv}} {_KS_BIN_US} AS bin, COUNT(*) AS c FROM dts
  GROUP BY dt_us {{idiv}} {_KS_BIN_US}
), cum AS (
  SELECT bin, SUM(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
           AS cum_c
  FROM bins
), d AS (
  SELECT MAX(CAST(floor(abs(CAST(cum_c AS DOUBLE) / n
                   - (1 - exp(-(CAST(bin AS DOUBLE) + 1) * {_KS_BIN_US}
                              * n / tot_us)))
                 * 1000000) AS BIGINT)) AS ks_d_micro
  FROM cum CROSS JOIN s
)
SELECT CAST(n AS BIGINT) AS n_intervals,
       CAST(tot_us {{idiv}} n AS BIGINT) AS mean_dt_us,
       CAST(floor(86400000000.0 * n / tot_us * 1000) AS BIGINT)
         AS lambda_per_day_milli,
       ks_d_micro
FROM s CROSS JOIN d
"""


def ts_exponential_fit_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential MLE over per-user event interarrivals (λ̂ = n/Σdt
    — the mean is an exact integer division of microsecond sums)
    plus a KS-style goodness-of-fit distance evaluated at 1-hour bin
    edges: per-bin |F_emp − (1 − e^{{-λt}})| floored to micros, then
    MAX — max is order-immune, so the one float expression per
    bounded bin cannot drift between engines.  The interarrival
    window partitions by user (distributed), the bin histogram is
    bounded by the observation span, and the cumsum runs over that
    bounded relation — the 'is this arrival process Poisson' check
    that decides whether a rate-spike alert threshold is valid."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r51_exp_events"
    )
    return spark.sql(
        _EXPFIT_CORE.format(
            events="r51_exp_events",
            ts_us="unix_micros(ts)",
            idiv="DIV",
        )
    )


_EXPFIT_DUCK = _EXPFIT_CORE.format(
    events="events", ts_us="epoch_us(ts)", idiv="//"
)


QUERIES = {
    "text_tokenizer_fertility": text_tokenizer_fertility,
    "agg_hill_tail_index": agg_hill_tail_index,
    "validate_key_candidates": validate_key_candidates,
    "ml_permutation_importance": ml_permutation_importance,
    "agg_effect_size_panel": agg_effect_size_panel,
    "ts_exponential_fit_ks": ts_exponential_fit_ks,
}

ORACLE = {
    "text_tokenizer_fertility": _FERTILITY_DUCK,
    "agg_hill_tail_index": _HILL_DUCK,
    "validate_key_candidates": _KEYS_DUCK,
    "ml_permutation_importance": _PERMIMP_DUCK,
    "agg_effect_size_panel": _EFFECT_DUCK,
    "ts_exponential_fit_ks": _EXPFIT_DUCK,
}
