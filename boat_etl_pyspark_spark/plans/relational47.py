"""Round-5 batch 34: CUPED variance reduction and the quality-filter
threshold sweep (SURVEY.md §2.9 events/curation families; no
reference counterpart).

  * ``events_cuped_variance_reduction`` — CUPED, the standard
    experimentation variance-reduction trick: regress each user's
    post-period metric on their PRE-period activity (theta =
    cov/var from exact DECIMAL power sums), report the raw and
    covariate-adjusted lifts and the achieved variance reduction.
    Completes the experiment suite (SRM gate -> power analysis ->
    lift -> CUPED -> SPRT -> permutation test -> DiD).
  * ``curate_quality_threshold_sweep`` — the filter-calibration
    curve: per-doc mean unigram surprisal binned into 16 equal-width
    thresholds with cumulative docs-kept and tokens-kept fractions.
    Answering 'where do we set the perplexity cut' costs one
    histogram + a 16-row window, not sixteen filter runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table

# ---------------------------------------------------------------------------
# CUPED
# ---------------------------------------------------------------------------

_CUPED_CORE = """
WITH e AS (
  SELECT user_id, ({epoch_us}) AS u,
         TRY_CAST(floor(CASE WHEN value - value = 0 AND abs(value) < 9.0e15 THEN value * 1000 END) AS BIGINT) AS v
  FROM {events}
), span AS (
  SELECT MIN(u) + (MAX(u) - MIN(u)) {idiv} 2 AS mid FROM e
), per_user AS (
  SELECT user_id, user_id % 2 AS arm,
         SUM(CASE WHEN u <  mid THEN v ELSE 0 END) AS x,
         SUM(CASE WHEN u >= mid THEN v ELSE 0 END) AS y
  FROM e CROSS JOIN span GROUP BY user_id
), s AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
         SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
         SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy,
         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS sx1,
         SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS sy1,
         SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
         SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS sx0,
         SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS sy0
  FROM per_user
), t AS (
  SELECT *,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rho
  FROM s
)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST(floor(theta * 1000000) AS BIGINT) AS theta_micro,
       CAST(floor((CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0)
                  * 1000) AS BIGINT) AS lift_raw_micro,
       CAST(floor(((CAST(sy1 AS DOUBLE) / n1
                    - theta * (CAST(sx1 AS DOUBLE) / n1
                               - CAST(sx AS DOUBLE) / n))
                   - (CAST(sy0 AS DOUBLE) / n0
                      - theta * (CAST(sx0 AS DOUBLE) / n0
                                 - CAST(sx AS DOUBLE) / n)))
                  * 1000) AS BIGINT) AS lift_cuped_micro,
       CAST(floor(rho * rho * 1000000) AS BIGINT) AS var_reduction_ppm
FROM t
"""


def events_cuped_variance_reduction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CUPED adjustment of the arm lift in post-period user value,
    using each user's PRE-period value (observed-midpoint time split,
    the DiD convention) as the covariate. theta and rho come from one
    set of exact DECIMAL(38,0)/HUGEINT power sums over the per-user
    relation — one user-keyed groupBy, one 1-row aggregate, one
    broadcast midpoint. var_reduction_ppm = rho^2: CUPED's entire
    value proposition as a checked number (a useless covariate
    reports ~0 and the adjusted lift equals the raw one). Scales as
    any per-user rollup."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r47_cuped_events"
    )
    return spark.sql(
        _CUPED_CORE.format(
            events="r47_cuped_events",
            epoch_us="unix_micros(ts)",
            idiv="DIV",
        )
    )


_CUPED_DUCK = _CUPED_CORE.format(
    events="events", epoch_us="epoch_us(ts)", idiv="//"
)

# ---------------------------------------------------------------------------
# Quality threshold sweep
# ---------------------------------------------------------------------------

_SWEEP_BINS = 16

_SWEEP_CORE = f"""
WITH tot AS (
  SELECT SUM(c) AS s FROM (SELECT COUNT(*) AS c FROM {{tok}} GROUP BY token)
), docscore AS (
  SELECT t.doc_id,
         COUNT(*) AS n_toks,
         SUM(CAST(floor(-ln(CAST(tc.c AS DOUBLE) / tot.s) * 1000000)
                  AS BIGINT)) {{idiv}} COUNT(*) AS score_micro
  FROM {{tok}} t
  JOIN (SELECT token, COUNT(*) AS c FROM {{tok}} GROUP BY token) tc
    ON tc.token = t.token
  CROSS JOIN tot
  GROUP BY t.doc_id
), span AS (
  SELECT MIN(score_micro) AS lo, MAX(score_micro) AS hi FROM docscore
), binned AS (
  SELECT LEAST((score_micro - lo) * {_SWEEP_BINS}
                 {{idiv}} GREATEST(hi - lo, 1), {_SWEEP_BINS} - 1) AS bin,
         n_toks, lo, hi
  FROM docscore CROSS JOIN span
), hist AS (
  SELECT bin, COUNT(*) AS n_docs, SUM(n_toks) AS n_toks,
         MIN(lo) AS lo, MIN(hi) AS hi
  FROM binned GROUP BY bin
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(lo + (bin + 1) * (hi - lo) {{idiv}} {_SWEEP_BINS} AS BIGINT)
         AS threshold_micro,
       CAST(SUM(n_docs) OVER (ORDER BY bin) AS BIGINT) AS docs_kept,
       CAST(SUM(n_docs) OVER (ORDER BY bin) * 1000000
            {{idiv}} SUM(n_docs) OVER () AS BIGINT) AS docs_kept_ppm,
       CAST(SUM(n_toks) OVER (ORDER BY bin) * 1000000
            {{idiv}} SUM(n_toks) OVER () AS BIGINT) AS tokens_kept_ppm
FROM hist ORDER BY bin
"""


_SWEEP_SPARK = f"""
WITH docscore AS (
  SELECT t.doc_id,
         COUNT(*) AS n_toks,
         SUM(CAST(floor(-ln(CAST(tc.c AS DOUBLE) / {{s}}) * 1000000)
                  AS BIGINT)) DIV COUNT(*) AS score_micro
  FROM {{tok}} t
  JOIN (SELECT token, COUNT(*) AS c FROM {{tok}} GROUP BY token) tc
    ON tc.token = t.token
  GROUP BY t.doc_id
), span AS (
  SELECT MIN(score_micro) AS lo, MAX(score_micro) AS hi FROM docscore
), binned AS (
  SELECT LEAST((score_micro - lo) * {_SWEEP_BINS}
                 DIV GREATEST(hi - lo, 1), {_SWEEP_BINS} - 1) AS bin,
         n_toks, lo, hi
  FROM docscore CROSS JOIN span
), hist AS (
  SELECT bin, COUNT(*) AS n_docs, SUM(n_toks) AS n_toks,
         MIN(lo) AS lo, MIN(hi) AS hi
  FROM binned GROUP BY bin
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(lo + (bin + 1) * (hi - lo) DIV {_SWEEP_BINS} AS BIGINT)
         AS threshold_micro,
       CAST(SUM(n_docs) OVER (ORDER BY bin) AS BIGINT) AS docs_kept,
       CAST(SUM(n_docs) OVER (ORDER BY bin) * 1000000
            DIV SUM(n_docs) OVER () AS BIGINT) AS docs_kept_ppm,
       CAST(SUM(n_toks) OVER (ORDER BY bin) * 1000000
            DIV SUM(n_toks) OVER () AS BIGINT) AS tokens_kept_ppm
FROM hist ORDER BY bin
"""


def curate_quality_threshold_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Filter-calibration curve for a surprisal-based quality cut:
    per-doc mean unigram surprisal (integer micro-nats per token,
    corpus LM from the same tokenization) binned into 16 equal-width
    thresholds, with cumulative docs-kept and tokens-kept fractions
    per threshold. The corpus tokenizes ONCE into a persisted token
    relation feeding both the LM counts and the doc scoring join;
    the sweep itself is a 16-row cumulative window — evaluating all
    16 candidate cuts costs one histogram, the same discipline as
    the decision-stump split search. The tokens-kept column is the
    one that matters for a training budget: it shows how much corpus
    each stricter perplexity cut actually costs.

    Round 11 (guide §2.4): the corpus token total SUM over the
    unigram counts is COUNT(*) of the token relation — a scalar
    count of the persisted cache instead of a second full
    groupBy-token shuffle — inlined as a literal (the oracle keeps
    the tot CTE; equality is definitional, both count every
    non-empty token once). The empty-corpus edge is unchanged:
    docscore is empty before the literal is ever evaluated."""
    from . import track_persist

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("r47_sweep_docs")
    tok = track_persist(
        spark.sql(
            """
            SELECT doc_id, token FROM r47_sweep_docs
            LATERAL VIEW explode(
              filter(split(text, ' '), x -> x != '')) t AS token
            """
        )
    )
    tok.createOrReplaceTempView("r47_sweep_tok")
    s = tok.count()  # bounded scalar: the corpus token total
    return spark.sql(_SWEEP_SPARK.format(tok="r47_sweep_tok", s=s))


_SWEEP_DUCK = (
    """
WITH sweep_tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x != ''))
           AS token
  FROM documents
)"""
    + _SWEEP_CORE.replace("WITH tot AS (", ", tot AS (", 1).format(
        tok="sweep_tok", idiv="//"
    )
)


QUERIES = {
    "events_cuped_variance_reduction": events_cuped_variance_reduction,
    "curate_quality_threshold_sweep": curate_quality_threshold_sweep,
}

ORACLE = {
    "events_cuped_variance_reduction": _CUPED_DUCK,
    "curate_quality_threshold_sweep": _SWEEP_DUCK,
}
