"""Round-5 batch 14: exact ML evaluation metrics (SURVEY.md §2.9
ML-pipeline surface; no reference counterpart). The scoring model
under evaluation is deterministic (event value in cents predicting
the 'purchase' event type), so every metric is reproducible and the
oracles are exact — the point is the METRIC machinery, which at 100
TB must not sort rows or leave the integers.

  * ``ml_roc_auc`` — exact ROC AUC via the rank-sum identity
    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg): doubled
    midranks from a cumulative window over the (bounded) distinct
    cents grid, all integers until one final ppm integer division.
    The Mann-Whitney machinery reused as a model-evaluation metric.
  * ``ml_calibration_bins`` — reliability diagram: fixed-width score
    bins, per-bin mean "predicted probability" (value/400 in exact
    ppm) vs observed positive rate, and the signed gap. One
    conditional-aggregate scan.
  * ``ml_confusion_threshold`` — confusion matrix + precision /
    recall / F1 (exact milli) at three operating thresholds from ONE
    scan: thresholds come from an inline constant table, so adding an
    operating point never adds a pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from ..sources.readers import load_table
from .contract import VALUE_DOMAIN_SQL

# ---------------------------------------------------------------------------
# Exact ROC AUC (rank-sum identity)
# ---------------------------------------------------------------------------

# Quantization knob for the score rank key — the `_SPEAR_GRID_CENTS`
# pattern (relational26.py) applied to the events-cents family
# (round-6 verdict item 5). 1 = exact cents: bit-identical to the
# un-knobbed plan, the fixture-scale default. The distinct-cents
# relation saturates with the VALUE DOMAIN (~1e5-1e6 cells, measured
# in SCALE.md "midrank machinery"), so the knob is only needed when a
# deployment feeds genuinely continuous scores — set e.g. 100 and AUC
# becomes AUC-on-the-grid, identically in plan and oracle because both
# render from this one template.
_SCORE_GRID_CENTS = 1

_AUC_CORE = """
WITH v AS (
  SELECT TRY_CAST(round(value * 100) AS BIGINT) {idiv} {grid} AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM {events}
  WHERE value IS NOT NULL  -- scan-pushdown half of the predicate
    AND TRY_CAST(round(value * 100) AS BIGINT) IS NOT NULL
), cnt AS (
  SELECT s, SUM(y) AS cp, COUNT(*) AS ct FROM v GROUP BY s
), w AS (
  SELECT s, cp, ct,
         coalesce(SUM(ct) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM cnt
), agg AS (
  SELECT SUM(CAST(cp AS {big}) * (2 * below + ct + 1)) AS r2_pos,
         SUM(cp) AS n_pos, SUM(ct - cp) AS n_neg
  FROM w
)
SELECT CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       CAST((r2_pos - CAST(n_pos AS {big}) * (n_pos + 1)) * 1000000
            {idiv} (2 * CAST(n_pos AS {big}) * n_neg) AS BIGINT)
         AS auc_ppm
FROM agg
"""


def ml_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of event value predicting 'purchase', by the
    rank-sum identity — no threshold sweep, no row-level sort:
    doubled midranks come from one cumulative window over the
    bounded distinct-cents grid (ties handled exactly, as the
    trapezoidal ROC requires), and the statistic stays integer until
    a single ppm integer division. One fact scan."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r30_auc_events"
    )
    return spark.sql(
        _AUC_CORE.format(events="r30_auc_events", big="DECIMAL(38,0)",
                         idiv="DIV", grid=_SCORE_GRID_CENTS)
    )


_AUC_DUCK = _AUC_CORE.format(events="events", big="HUGEINT", idiv="//",
                             grid=_SCORE_GRID_CENTS)


# ---------------------------------------------------------------------------
# Calibration (reliability diagram)
# ---------------------------------------------------------------------------
# "Predicted probability" = value / 400 (the fixture's value domain is
# ~[0, 330]), clamped to [0, 1]; in ppm that is min(cents * 2500,
# 1_000_000). Ten fixed-width bins over the prediction.

# The value-domain bound (contract.VALUE_DOMAIN_SQL) keeps the cents
# x2500 ppm product exact INT64 in both engines: a TRY_CAST-castable
# 9.21e18-cent value would otherwise overflow where DuckDB throws and
# Spark wraps (round-8 probe). BETWEEN is scan-pushdown-able.
_CAL_CORE = f"""
WITH v AS (
  SELECT least(TRY_CAST(round(value * 100) AS BIGINT) * 2500, 1000000) AS p_ppm,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM {{events}}
  WHERE {VALUE_DOMAIN_SQL}  -- scan-pushdown half of the predicate
    AND TRY_CAST(round(value * 100) AS BIGINT) IS NOT NULL
), b AS (
  SELECT least(p_ppm {{idiv}} 100000, 9) AS bin, p_ppm, y FROM v
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(p_ppm) {{idiv}} COUNT(*) AS BIGINT) AS mean_pred_ppm,
       CAST(SUM(y) * 1000000 {{idiv}} COUNT(*) AS BIGINT) AS obs_ppm,
       CAST(SUM(p_ppm) {{idiv}} COUNT(*)
            - SUM(y) * 1000000 {{idiv}} COUNT(*) AS BIGINT) AS gap_ppm
FROM b GROUP BY bin
ORDER BY bin
"""


def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the value-as-probability model: ten
    fixed-width prediction bins, each reporting mean predicted ppm,
    observed positive rate ppm, and the signed calibration gap — all
    exact integer division, ONE conditional-aggregate scan. The
    production calibration check before trusting model scores for
    data selection."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r30_cal_events"
    )
    return spark.sql(_CAL_CORE.format(events="r30_cal_events", idiv="DIV"))


_CAL_DUCK = _CAL_CORE.format(events="events", idiv="//")


# ---------------------------------------------------------------------------
# Confusion matrix at multiple thresholds
# ---------------------------------------------------------------------------

_CONF_THRESHOLDS = "(VALUES (2500), (5000), (10000)) AS t(thr_cents)"

_CONF_CORE = """
WITH v AS (
  SELECT TRY_CAST(round(value * 100) AS BIGINT) AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM {events}
  WHERE value IS NOT NULL  -- scan-pushdown half of the predicate
    AND TRY_CAST(round(value * 100) AS BIGINT) IS NOT NULL
), m AS (
  SELECT t.thr_cents,
         SUM(CASE WHEN v.s >= t.thr_cents AND v.y = 1 THEN 1 ELSE 0 END)
           AS tp,
         SUM(CASE WHEN v.s >= t.thr_cents AND v.y = 0 THEN 1 ELSE 0 END)
           AS fp,
         SUM(CASE WHEN v.s < t.thr_cents AND v.y = 1 THEN 1 ELSE 0 END)
           AS fn,
         SUM(CASE WHEN v.s < t.thr_cents AND v.y = 0 THEN 1 ELSE 0 END)
           AS tn
  FROM v CROSS JOIN {thresholds}
  GROUP BY t.thr_cents
)
SELECT CAST(thr_cents AS BIGINT) AS thr_cents,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       CAST(tp * 1000 {idiv} (tp + fp) AS BIGINT) AS precision_milli,
       CAST(tp * 1000 {idiv} (tp + fn) AS BIGINT) AS recall_milli,
       CAST(2 * tp * 1000 {idiv} (2 * tp + fp + fn) AS BIGINT) AS f1_milli
FROM m
ORDER BY thr_cents
"""


def ml_confusion_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix with exact precision / recall / F1 (milli) at
    three operating thresholds, from ONE scan: the threshold relation
    is an inline constant table cross-joined before the conditional
    aggregate, so every additional operating point is four more
    CASE-sums in the same pass, never another pass."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r30_conf_events"
    )
    return spark.sql(
        _CONF_CORE.format(
            events="r30_conf_events",
            thresholds=_CONF_THRESHOLDS,
            idiv="DIV",
        )
    )


_CONF_DUCK = _CONF_CORE.format(
    events="events", thresholds=_CONF_THRESHOLDS, idiv="//"
)


QUERIES = {
    "ml_roc_auc": ml_roc_auc,
    "ml_calibration_bins": ml_calibration_bins,
    "ml_confusion_threshold": ml_confusion_threshold,
}

ORACLE = {
    "ml_roc_auc": _AUC_DUCK,
    "ml_calibration_bins": _CAL_DUCK,
    "ml_confusion_threshold": _CONF_DUCK,
}
