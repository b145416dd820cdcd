"""Round-5 batch 32: experiment power analysis and training-mixture
epochs (SURVEY.md §2.9 aggregation/curation families; no reference
counterpart).

  * ``ml_power_analysis`` — the question every A/B test starts with:
    how many users per arm (and how many days of traffic) to detect
    a 2% lift in purchase conversion at alpha = 0.05 / power = 0.8?
    Variance comes from the observed conversion rate in one exact
    integer scan; the z quantiles are precomputed module literals
    (no cross-engine inverse-normal), and the answer includes the
    run-length forecast from the observed daily user arrival rate.
  * ``curate_mixture_epochs`` — The-Pile-style mixture table: given
    temperature-flattened source weights and a token budget of 2x
    the corpus, how many EPOCHS of each source does one training run
    consume? Token counts per source come from size(split()) — no
    explode, one scan — and every published number is exact integer
    micro-arithmetic over per-term-floored weights.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table

# ---------------------------------------------------------------------------
# Power analysis
# ---------------------------------------------------------------------------

_PA_Z_ALPHA = 1.959963984540054  # Phi^-1(0.975), two-sided alpha 0.05
_PA_Z_BETA = 0.8416212335729143  # Phi^-1(0.8), power 0.8
_PA_ZSUM2_MICRO = math.floor((_PA_Z_ALPHA + _PA_Z_BETA) ** 2 * 1_000_000)
_PA_LIFT_MICRO = 20_000  # detect an absolute 2% conversion lift

_POWER_CORE = f"""
WITH s AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k,
         COUNT(DISTINCT user_id) AS users,
         MAX({{epoch_us}}) - MIN({{epoch_us}}) AS span_us
  FROM {{events}}
), p AS (
  SELECT n, k, users, span_us,
         CAST(k AS DOUBLE) / n AS phat
  FROM s
)
SELECT CAST(n AS BIGINT) AS n_events,
       CAST(k AS BIGINT) AS n_conversions,
       CAST(floor(phat * 1000000) AS BIGINT) AS p_micro,
       CAST(floor(2 * phat * (1 - phat)
                  * {_PA_ZSUM2_MICRO} / 1000000.0
                  / ({_PA_LIFT_MICRO} / 1000000.0)
                  / ({_PA_LIFT_MICRO} / 1000000.0)) AS BIGINT)
         AS n_per_arm,
       CAST(floor(CAST(users AS DOUBLE) * 86400000000 / span_us)
            AS BIGINT) AS users_per_day,
       CAST(floor((2 * phat * (1 - phat)
                   * {_PA_ZSUM2_MICRO} / 1000000.0
                   / ({_PA_LIFT_MICRO} / 1000000.0)
                   / ({_PA_LIFT_MICRO} / 1000000.0)) * 2
                  / (CAST(users AS DOUBLE) * 86400000000 / span_us))
            AS BIGINT) AS days_needed
FROM p
"""


def ml_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion sample-size calculation from observed traffic:
    n_per_arm = 2 p(1-p) (z_a + z_b)^2 / delta^2 with the z-sum
    precomputed as an integer micro literal (both engines consume the
    same constant — no inverse-normal in SQL), p from one exact
    conditional-sum scan, and days_needed from the observed distinct
    -user arrival rate over the event-time span. ONE scan; the
    planning query an experimentation platform runs before flipping
    any flag, and the natural companion to `events_ab_test_lift`
    (measures after) and `events_sprt_ab_test` (stops early)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r45_pa_events"
    )
    return spark.sql(
        _POWER_CORE.format(events="r45_pa_events", epoch_us="unix_micros(ts)")
    )


_POWER_DUCK = _POWER_CORE.format(events="events", epoch_us="epoch_us(ts)")

# ---------------------------------------------------------------------------
# Mixture epochs
# ---------------------------------------------------------------------------

_ME_ALPHA = 0.7
_ME_BUDGET_X = 2  # token budget = 2x the corpus

_EPOCHS_CORE = f"""
WITH c AS (
  SELECT source,
         SUM({{wc}}) AS toks
  FROM {{docs}} GROUP BY source
), t AS (
  SELECT source, toks, SUM(toks) OVER () AS tt,
         CAST(floor(pow(CAST(toks AS DOUBLE) / SUM(toks) OVER (),
                        {_ME_ALPHA}) * 1000000) AS BIGINT) AS w_micro
  FROM c
), norm AS (
  SELECT source, toks, tt, w_micro, SUM(w_micro) OVER () AS wt FROM t
)
SELECT source,
       CAST(toks AS BIGINT) AS n_tokens,
       CAST(w_micro * 1000000 {{idiv}} wt AS BIGINT) AS w_mix_micro,
       CAST(w_micro * tt * {_ME_BUDGET_X} {{idiv}} wt AS BIGINT)
         AS budget_tokens,
       CAST((w_micro * tt * {_ME_BUDGET_X} {{idiv}} wt) * 1000000
            {{idiv}} toks AS BIGINT) AS epochs_micro
FROM norm ORDER BY source
"""


def curate_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pile's mixture table for this corpus: temperature-
    flattened source weights (p^0.7 over TOKEN counts, not doc
    counts — the unit a training run consumes) and, for a 2x-corpus
    token budget, each source's allocated tokens and oversampling
    EPOCHS (epochs > 1e6 micro means the source repeats). Token
    counts use size(split()) per doc — no explode, one map-combined
    scan; weights floor to integer micros per source before
    normalization so the whole table is exact integer arithmetic.
    Differs from `curate_mixture_weights` (doc-count mixture
    reporting) and `curate_language_temperature` (language axis,
    doc counts): this is the token-budget planning artifact."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "r45_me_docs"
    )
    return spark.sql(
        _EPOCHS_CORE.format(
            docs="r45_me_docs",
            wc="size(filter(split(text, ' '), x -> x != ''))",
            idiv="DIV",
        )
    )


_EPOCHS_DUCK = _EPOCHS_CORE.format(
    docs="documents",
    wc="len(list_filter(string_split(text, ' '), x -> x != ''))",
    idiv="//",
)


QUERIES = {
    "ml_power_analysis": ml_power_analysis,
    "curate_mixture_epochs": curate_mixture_epochs,
}

ORACLE = {
    "ml_power_analysis": _POWER_DUCK,
    "curate_mixture_epochs": _EPOCHS_DUCK,
}
