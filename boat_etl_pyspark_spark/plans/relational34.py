"""Round-5 batch 18: exact PR-AUC, inter-arrival bot detection, and
robust trimmed/winsorized means (SURVEY.md §2.9 ML-pipeline /
events / aggregation families; no reference counterpart).

  * ``ml_pr_auc`` — exact average precision (step-wise PR-AUC, the
    sklearn ``average_precision_score`` definition) for the same
    deterministic value-predicts-purchase model ``ml_roc_auc``
    evaluates: one cumulative window over the bounded distinct-cents
    grid, per-threshold terms cp_k * cumTP_k * 1e9 // cumAll_k stay
    integers end to end (two nested integer divisions, zero floats) —
    the class-imbalance-honest companion to ROC AUC.
  * ``events_bot_detection`` — per-user inter-arrival regularity
    profile: gap mean and coefficient of variation from exact
    DECIMAL/HUGEINT power sums over one user_id exchange (lag and the
    per-user reduction share it). Too-regular spacing (low CV, enough
    events) flags automation — the bot/spam gate a crawl corpus runs
    before training. The fixtures' arrivals are random, so the flag
    column is expectedly all-zero here; the machinery (not the
    fixture) is what the oracle pins.
  * ``agg_trimmed_winsorized_mean`` — 5%-trimmed and 5%-winsorized
    means of order totals over the DISTRIBUTED global rank (range
    exchange, never a single-partition sort): trim drops the k
    cheapest/priciest rows by unique (value, key) rank, winsorize
    clamps them to the boundary values; the boundary rows are two
    1-row broadcast lookups against the same persisted ranked
    relation. Exact integer cents until two final micro divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import cents
from ..operators.library import global_rank
from ..sources.readers import load_table
from .contract import money_rounded, money_rounded_sql

# ---------------------------------------------------------------------------
# Exact average precision (PR-AUC)
# ---------------------------------------------------------------------------

# Score-grid quantization knob — see relational30._SCORE_GRID_CENTS
# (the `_SPEAR_GRID_CENTS` pattern on the events-cents rank keys).
# 1 = exact cents, bit-identical default; coarser values make AP
# AP-on-the-grid symmetrically in plan and oracle.
_SCORE_GRID_CENTS = 1

_AP_CORE = """
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
         SUM(cp) OVER (ORDER BY s DESC
             ROWS UNBOUNDED PRECEDING) AS cum_tp,
         SUM(ct) OVER (ORDER BY s DESC
             ROWS UNBOUNDED PRECEDING) AS cum_all
  FROM cnt
), agg AS (
  SELECT SUM(CAST(cp AS {big}) * cum_tp * 1000000000 {idiv} cum_all)
           AS term_sum,
         SUM(cp) AS n_pos, SUM(ct - cp) AS n_neg
  FROM w
)
SELECT CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       CAST(term_sum {idiv} n_pos AS BIGINT) AS ap_nano
FROM agg
"""


def ml_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision of event value predicting 'purchase':
    AP = sum_k dRecall_k * Precision_k over distinct descending
    thresholds, with ties grouped exactly as the step-wise definition
    requires. Cumulative TP/total ride one window over the bounded
    distinct-cents grid (never rows); each threshold's term
    cp * cumTP * 1e9 // cumAll is an exact integer, so the statistic
    never touches a float. One fact scan — same cost shape as
    ``ml_roc_auc`` (relational30.py)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r34_ap_events"
    )
    return spark.sql(
        _AP_CORE.format(events="r34_ap_events", big="DECIMAL(38,0)",
                        idiv="DIV", grid=_SCORE_GRID_CENTS)
    )


_AP_DUCK = _AP_CORE.format(events="events", big="HUGEINT", idiv="//",
                           grid=_SCORE_GRID_CENTS)


# ---------------------------------------------------------------------------
# Bot detection: inter-arrival regularity
# ---------------------------------------------------------------------------

_BOT_MIN_GAPS = 19        # >= 20 events
_BOT_CV_PPM = 250_000     # CV < 0.25 => suspiciously regular

_BOT_CORE = f"""
WITH e AS (
  SELECT user_id, event_id, {{epoch_us}} AS us FROM {{events}}
), g AS (
  SELECT user_id,
         us - LAG(us) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS gap
  FROM e
), s AS (
  SELECT user_id, COUNT(gap) AS n_gaps,
         SUM(CAST(gap AS {{big}})) AS s1,
         SUM(CAST(gap AS {{big}}) * gap) AS s2
  FROM g GROUP BY user_id
), cv AS (
  SELECT user_id, n_gaps, s1,
         CAST(floor(sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE))
                    / CAST(s1 AS DOUBLE) * 1e6) AS BIGINT) AS cv_ppm
  FROM s WHERE n_gaps > 0
)
SELECT user_id,
       CAST(n_gaps AS BIGINT) AS n_gaps,
       CAST(s1 {{idiv}} n_gaps AS BIGINT) AS mean_gap_us,
       cv_ppm,
       CASE WHEN n_gaps >= {_BOT_MIN_GAPS} AND cv_ppm < {_BOT_CV_PPM}
            THEN 1 ELSE 0 END AS bot_flag
FROM cv
ORDER BY cv_ppm, user_id
"""


def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival regularity: gap CV from exact
    DECIMAL/HUGEINT power sums (sqrt(n*s2 - s1^2)/s1 as one
    fixed-order double, micro-floored — the Spearman/Welch cast
    idiom). LAG and the per-user reduction share one user_id
    exchange. Humans and Poisson-ish traffic sit near CV = 1;
    near-constant spacing (CV < 0.25 over >= 20 events) flags
    automation. The fixture's arrivals are random, so zero flags here
    is the expected output — the profile and threshold machinery are
    what the oracle checks."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r34_bot_events"
    )
    return spark.sql(
        _BOT_CORE.format(events="r34_bot_events", epoch_us="unix_micros(ts)",
                         big="DECIMAL(38,0)", idiv="DIV")
    )


_BOT_DUCK = _BOT_CORE.format(
    events="events", epoch_us="epoch_us(ts)", big="HUGEINT", idiv="//"
)


# ---------------------------------------------------------------------------
# Trimmed / winsorized mean over the distributed rank
# ---------------------------------------------------------------------------

_TRIM_PCT = 5  # drop/clamp the lowest and highest 5% of rows


def agg_trimmed_winsorized_mean(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """5%-trimmed and 5%-winsorized means of order totals. Ranks come
    from ``global_rank`` on the unique (cents, orderkey) key — one
    range exchange, deterministic under ties, identical in both
    engines — so k = n*5//100 rows fall off (or clamp to the boundary
    values) on each side. The ranked relation is persisted by the
    rank primitive's correctness fence; the two boundary rows and the
    count are broadcast 1-row relations against it. Integer cents
    throughout; two final micro divisions.

    Hostile-ingest rule (round-10 layer 2): cents are money-domain
    bounded and NULL (corrupt) prices have no rank — engine NULL
    placement differs, shifting both clamp boundaries one-sided."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            money_rounded("o_totalprice").alias("price_cents"),
        )
        .where(F.col("price_cents").isNotNull())
    )
    ranked = global_rank(orders, ["price_cents", "o_orderkey"])
    n_rel = ranked.agg(
        F.count("*").alias("n"),
        F.expr(f"CAST(COUNT(*) * {_TRIM_PCT} DIV 100 AS BIGINT)").alias("k"),
    )
    with_k = ranked.crossJoin(F.broadcast(n_rel))
    lo = with_k.where("rank = k + 1").select(
        F.col("price_cents").alias("lo_clamp_cents")
    )
    hi = with_k.where("rank = n - k").select(
        F.col("price_cents").alias("hi_clamp_cents")
    )
    return (
        with_k.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .agg(
            F.max("n").cast("bigint").alias("n_orders"),
            F.max("k").cast("bigint").alias("k_trim"),
            F.expr(
                "CAST(SUM(CASE WHEN rank > k AND rank <= n - k THEN"
                " CAST(price_cents AS DECIMAL(38,0)) END) * 1000000"
                " DIV (MAX(n) - 2 * MAX(k)) AS BIGINT)"
            ).alias("trimmed_mean_micro_cents"),
            F.expr(
                "CAST((SUM(CASE WHEN rank > k AND rank <= n - k THEN"
                " CAST(price_cents AS DECIMAL(38,0)) END)"
                " + MAX(k) * (MAX(lo_clamp_cents) + MAX(hi_clamp_cents)))"
                " * 1000000 DIV MAX(n) AS BIGINT)"
            ).alias("winsorized_mean_micro_cents"),
            F.max("lo_clamp_cents").cast("bigint").alias("lo_clamp_cents"),
            F.max("hi_clamp_cents").cast("bigint").alias("hi_clamp_cents"),
        )
    )


_TRIM_SQL = f"""
WITH vals AS (
  SELECT o_orderkey, {money_rounded_sql('o_totalprice')} AS price_cents
  FROM orders
), ranked AS (
  SELECT price_cents,
         ROW_NUMBER() OVER (ORDER BY price_cents, o_orderkey) AS rank,
         COUNT(*) OVER () AS n,
         COUNT(*) OVER () * {_TRIM_PCT} // 100 AS k
  FROM vals WHERE price_cents IS NOT NULL
), lo AS (
  SELECT price_cents AS lo_clamp_cents FROM ranked WHERE rank = k + 1
), hi AS (
  SELECT price_cents AS hi_clamp_cents FROM ranked WHERE rank = n - k
)
SELECT CAST(MAX(n) AS BIGINT) AS n_orders,
       CAST(MAX(k) AS BIGINT) AS k_trim,
       CAST(SUM(CASE WHEN rank > k AND rank <= n - k THEN
                CAST(price_cents AS HUGEINT) END) * 1000000
            // (MAX(n) - 2 * MAX(k)) AS BIGINT)
         AS trimmed_mean_micro_cents,
       CAST((SUM(CASE WHEN rank > k AND rank <= n - k THEN
                 CAST(price_cents AS HUGEINT) END)
             + MAX(k) * (MAX(lo_clamp_cents) + MAX(hi_clamp_cents)))
            * 1000000 // MAX(n) AS BIGINT)
         AS winsorized_mean_micro_cents,
       CAST(MAX(lo_clamp_cents) AS BIGINT) AS lo_clamp_cents,
       CAST(MAX(hi_clamp_cents) AS BIGINT) AS hi_clamp_cents
FROM ranked CROSS JOIN lo CROSS JOIN hi
"""


QUERIES = {
    "ml_pr_auc": ml_pr_auc,
    "events_bot_detection": events_bot_detection,
    "agg_trimmed_winsorized_mean": agg_trimmed_winsorized_mean,
}

ORACLE = {
    "ml_pr_auc": _AP_DUCK,
    "events_bot_detection": _BOT_DUCK,
    "agg_trimmed_winsorized_mean": _TRIM_SQL,
}
