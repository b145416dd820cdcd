"""Round-5 batch 28: lexical-diversity and phrase-repetition quality
signals plus deterministic rejection resampling (SURVEY.md §2.9 text
analysis / curation families; no reference counterpart).

  * ``text_mattr`` — Moving-Average Type-Token Ratio (window 25),
    computed EXACTLY in one pass: instead of materializing every
    sliding window (O(n*w) rows), each token occurrence contributes
    a closed-form count of windows in which it is the first
    occurrence of its type — one LAG window over (doc, token)
    positions, then a per-doc sum. O(n) rows, same number the
    tokenizer already produces.
  * ``text_dup_ngram_fraction`` — Gopher-style duplicate 3-gram
    fractions per doc (occurrence-weighted and char-weighted):
    phrase-level repetition that the unigram
    ``text_repetition_stats`` cannot see.
  * ``curate_rejection_sampling`` — deterministic importance
    resampling: accept each doc with probability proportional to a
    target score (here: length), decided by comparing the score
    against a content-free md5 uniform — reruns, engines and
    partitionings all agree, and acceptance needs ONE scan plus a
    broadcast scalar max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table

# ---------------------------------------------------------------------------
# MATTR (moving-average type-token ratio), exact single-pass
# ---------------------------------------------------------------------------

_MATTR_W = 25

# Token occurrence j (1-based) with previous same-type occurrence p
# (0 if none) is the first occurrence of its type inside window i iff
# i <= j <= i+w-1 and p < i, i.e. i in [max(j-w+1, p+1, 1),
# min(j, n-w+1)]. Summing that interval length over occurrences
# equals the sum of per-window distinct counts — no window
# materialization.
_MATTR_CORE = f"""
WITH pos AS (
  SELECT doc_id, token, i AS j, n
  FROM {{tok}}
), lagged AS (
  SELECT doc_id, n, j,
         COALESCE(LAG(j) OVER (PARTITION BY doc_id, token ORDER BY j), 0)
           AS p
  FROM pos
), contrib AS (
  SELECT doc_id, n,
         GREATEST(
           LEAST(j, n - {_MATTR_W} + 1)
           - GREATEST(j - {_MATTR_W} + 1, p + 1, 1) + 1,
           0) AS c
  FROM lagged WHERE n >= {_MATTR_W}
)
SELECT doc_id,
       CAST(MIN(n) AS BIGINT) AS n_tokens,
       CAST(MIN(n) - {_MATTR_W} + 1 AS BIGINT) AS n_windows,
       CAST(SUM(c) * 1000000
            {{idiv}} ({_MATTR_W} * (MIN(n) - {_MATTR_W} + 1)) AS BIGINT)
         AS mattr_micro
FROM contrib
GROUP BY doc_id
"""


def text_mattr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MATTR-25 lexical diversity per document (docs shorter
    than the window are skipped, per the metric's definition). The
    naive form explodes every sliding window (O(n*w) rows — 25x the
    corpus); this plan uses the closed-form first-occurrence
    interval (see module docstring): tokenize once, one LAG window
    partitioned by (doc, token), one per-doc aggregate — the row
    count never exceeds the token count, so the 100 TB cost equals
    any other tokenize-and-aggregate scoring op. Integer micros via
    exact integer arithmetic end to end (no floats anywhere)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "ts3_mattr_docs"
    )
    spark.sql(
        """
        SELECT doc_id, t[i - 1] AS token, i, size(t) AS n
        FROM (SELECT doc_id, filter(split(text, ' '), x -> x != '') AS t
              FROM ts3_mattr_docs)
        LATERAL VIEW explode(sequence(1, size(t))) e AS i
        WHERE size(t) > 0
        """
    ).createOrReplaceTempView("ts3_mattr_tok")
    return spark.sql(_MATTR_CORE.format(tok="ts3_mattr_tok", idiv="DIV"))


_MATTR_DUCK = (
    """
WITH mattr_tok AS (
  SELECT doc_id, t[i] AS token, i, len(t) AS n
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x != '') AS t
        FROM documents),
       UNNEST(range(1, 1200)) AS u(i)
  WHERE i <= len(t)
)"""
    + _MATTR_CORE.replace("WITH pos AS (", ", pos AS (", 1).format(
        tok="mattr_tok", idiv="//"
    )
)

# ---------------------------------------------------------------------------
# Duplicate 3-gram fractions
# ---------------------------------------------------------------------------

_DNG_N = 3

_DNG_CORE = f"""
WITH per_gram AS (
  SELECT doc_id, gram, COUNT(*) AS cnt,
         CAST({{strlen}} AS BIGINT) AS glen
  FROM {{grams}}
  GROUP BY doc_id, gram
)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_grams,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST((SUM(cnt) - COUNT(*)) * 1000000 {{idiv}} SUM(cnt) AS BIGINT)
         AS dup_gram_ppm,
       CAST(SUM(CASE WHEN cnt > 1 THEN cnt * glen ELSE 0 END) * 1000000
            {{idiv}} SUM(cnt * glen) AS BIGINT) AS dup_char_ppm
FROM per_gram
GROUP BY doc_id
"""


def text_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicate 3-gram fractions (the Gopher phrase-level
    repetition rule): occurrence-weighted (share of 3-gram instances
    whose gram repeats within the doc) and char-weighted (same,
    weighted by gram length — approximating 'fraction of characters
    inside repeated phrases'). The shuffle carries (doc, gram)
    partial counts (map-side combined), not gram instances — the
    same scaling contract as the unigram repetition op, one
    n-gram-explode heavier."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "ts3_dng_docs"
    )
    spark.sql(
        f"""
        SELECT doc_id,
               concat_ws(' ', t[i - 1], t[i], t[i + 1]) AS gram
        FROM (SELECT doc_id, filter(split(text, ' '), x -> x != '') AS t
              FROM ts3_dng_docs)
        LATERAL VIEW explode(sequence(1, size(t) - {_DNG_N} + 1)) e AS i
        WHERE size(t) >= {_DNG_N}
        """
    ).createOrReplaceTempView("ts3_dng_grams")
    return spark.sql(
        _DNG_CORE.format(
            grams="ts3_dng_grams", strlen="length(gram)", idiv="DIV"
        )
    )


_DNG_DUCK = (
    f"""
WITH dng_grams AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS gram
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x != '') AS t
        FROM documents),
       UNNEST(range(1, 1200)) AS u(i)
  WHERE i <= len(t) - {_DNG_N} + 1
)"""
    + _DNG_CORE.replace("WITH per_gram AS (", ", per_gram AS (", 1).format(
        grams="dng_grams", strlen="length(gram)", idiv="//"
    )
)

# ---------------------------------------------------------------------------
# Deterministic rejection resampling
# ---------------------------------------------------------------------------

_REJ_CORE = """
WITH mx AS (
  SELECT MAX(n_chars) AS mc FROM {docs}
), draws AS (
  SELECT source,
         n_chars * 1000000 {idiv} mc AS p_micro,
         {hexint} % 1000000 AS u_micro
  FROM {docs} CROSS JOIN mx
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN u_micro < p_micro THEN 1 ELSE 0 END) AS BIGINT)
         AS n_accepted,
       CAST(SUM(p_micro) {idiv} COUNT(*) AS BIGINT) AS mean_p_micro
FROM draws
GROUP BY source
ORDER BY source
"""


def curate_rejection_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic rejection resampling toward a long-document
    target: accept doc with probability n_chars/max(n_chars), decided
    by u < p where u is a content-free md5(doc_id) uniform in
    [0, 1e6) — the DSIR paper's second stage (importance weights ->
    resample), with the hash replacing the RNG so engines, reruns
    and partitionings agree row-for-row. One scan + a broadcast
    1-row max; the acceptance decision never shuffles documents, so
    at 100 TB this costs exactly one pass regardless of the
    acceptance rate."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "ts3_rej_docs"
    )
    return spark.sql(
        _REJ_CORE.format(
            docs="ts3_rej_docs",
            idiv="DIV",
            hexint=(
                "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12),"
                " 16, 10) AS BIGINT)"
            ),
        )
    )


_REJ_DUCK = _REJ_CORE.format(
    docs="documents",
    idiv="//",
    hexint=(
        "CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))"
        " AS BIGINT)"
    ),
)


QUERIES = {
    "text_mattr": text_mattr,
    "text_dup_ngram_fraction": text_dup_ngram_fraction,
    "curate_rejection_sampling": curate_rejection_sampling,
}

ORACLE = {
    "text_mattr": _MATTR_DUCK,
    "text_dup_ngram_fraction": _DNG_DUCK,
    "curate_rejection_sampling": _REJ_DUCK,
}
