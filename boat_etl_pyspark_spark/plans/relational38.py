"""Round-5 batch 23: in-engine model training and spectral analysis
(SURVEY.md §2.9 text-analysis / date-time families; no reference
counterpart).

  * ``ml_logreg_quality`` — a logistic-regression language/quality
    classifier TRAINED inside the engine: three unrolled batch
    gradient-descent steps over surface features (stopword ratio,
    mean token length), entirely in fixed-point integer arithmetic
    (micro-unit weights, per-row floored residuals) so every step is
    order-independent and engine-exact. This is the
    quality-classifier-training shape of an LLM data pipeline
    (fastText-style filters are trained on exactly such surface
    features) executed as pure aggregates — at 100 TB each step is
    ONE map-combined pass over the persisted feature relation.
  * ``ts_periodogram`` — discrete-Fourier periodogram of the daily
    event-count series at wave numbers k=1..8: the dominant-period
    detector behind seasonality checks. Per-row cos/sin terms are
    micro-floored before exact integer sums; spectral power is exact
    DECIMAL(38,0)/HUGEINT arithmetic. The heavy input is reduced to
    one tiny daily rollup first, so the spectral pass costs
    O(days x k) regardless of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from . import track_persist

# ---------------------------------------------------------------------------
# Logistic regression (fixed-point batch GD, unrolled)
# ---------------------------------------------------------------------------

_LR_MILLI = 2000  # learning rate 2.0, in milli units
_LR_ITERS = 3

# Tiny English stopword set — the discriminative surface signal for
# the en/non-en label (same spirit as text_language_id's n-gram
# heuristic, but here it is a FEATURE a model learns a weight for).
_LR_STOPS = ("the", "of", "and", "to", "a", "in", "is", "it")

# z in nano units (micro weights x milli features); p clamped away
# from 0/1 so the log-loss stays finite on confident rows.
_Z_NANO = "(w0 * 1000 + w1 * x1 + w2 * x2)"
_P = (
    f"greatest(least(1 / (1 + exp(-({_Z_NANO}) / 1e9)), 1 - 1e-9), 1e-9)"
)
_RESID_MICRO = f"CAST(floor((y - {_P}) * 1000000) AS BIGINT)"
_ACC_HIT = f"CASE WHEN ({_Z_NANO} >= 0) = (y = 1) THEN 1 ELSE 0 END"
_LOSS_MICRO = (
    f"CAST(floor(-ln(CASE WHEN y = 1 THEN {_P} ELSE 1 - {_P} END)"
    " * 1000000) AS BIGINT)"
)


def _lr_features_spark() -> list:
    stop_pred = " OR ".join(f"t = '{s}'" for s in _LR_STOPS)
    toks = "filter(split(lower(text), ' '), x -> x != '')"
    return [
        F.expr(
            f"size(filter({toks}, t -> {stop_pred})) * 1000"
            f" DIV greatest(size({toks}), 1)"
        ).alias("x1"),
        F.expr(
            "least(length(replace(text, ' ', '')) * 1000"
            f" DIV greatest(size({toks}), 1), 20000) DIV 20"
        ).alias("x2"),
        F.expr("CASE WHEN lang = 'en' THEN 1 ELSE 0 END").alias("y"),
    ]


def ml_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a 3-feature logistic classifier (bias + stopword-ratio +
    mean-token-length, milli-scaled) for ``lang = 'en'`` with
    {_LR_ITERS} unrolled batch-GD steps. All state is integer:
    weights live in micro units, per-row residuals/losses are floored
    to micro BEFORE summation (order-independent — bit-identical at
    any parallelism), and the weight update is one portable integer
    division (both engines truncate toward zero — replicated below
    with an explicit trunc-div, python's // floors). Each step is
    ONE aggregate over the persisted feature relation with the three
    weights inlined as integer literals, and the six aggregate
    scalars are pulled back per step (a bounded 1-row collect — the
    weight state is 3 integers, so the driver is the right place for
    it; the old 1-row-DataFrame chain doubled its logical plan per
    step and cost two broadcast jobs per iteration, ~33 stage-jobs
    for 3 steps). Row k reports the metrics of w_{{k-1}} on the data
    plus the post-step weights w_k. The documents table is scanned
    once into features; at 100 TB the identical loop is step-per-pass
    with the feature build amortized across steps."""
    import re as _re

    feats = track_persist(
        load_table(spark, sf_dir, "documents").select(*_lr_features_spark())
    )

    def tdiv(a: int, b: int) -> int:
        # SQL DIV truncates toward zero; python // floors
        q = abs(a) // abs(b)
        return q if (a < 0) == (b < 0) else -q

    def subst(expr: str, w: dict) -> str:
        lits = {
            k: ("CAST(NULL AS BIGINT)" if v is None else str(v))
            for k, v in w.items()
        }
        return _re.sub(r"\b(w0|w1|w2)\b", lambda m: lits[m.group(1)], expr)

    w = {"w0": 0, "w1": 0, "w2": 0}
    rows = []
    for it in range(1, _LR_ITERS + 1):
        r = feats.agg(
            F.count("*").alias("n"),
            F.sum(F.expr(subst(f"{_RESID_MICRO} * 1000", w))).alias("g0"),
            F.sum(F.expr(subst(f"{_RESID_MICRO} * x1", w))).alias("g1"),
            F.sum(F.expr(subst(f"{_RESID_MICRO} * x2", w))).alias("g2"),
            F.sum(F.expr(subst(_ACC_HIT, w))).alias("acc_cnt"),
            F.sum(F.expr(subst(_LOSS_MICRO, w))).alias("loss_sum"),
        ).first()
        n = r["n"]

        def upd(wk, gk, n=n):
            # NULL propagation of the SQL form: a NULL gradient (all
            # rows NULL / empty input) or n = 0 (DIV by zero) -> NULL
            if wk is None or gk is None or n == 0:
                return None
            return wk + tdiv(_LR_MILLI * gk, n * 1000000)

        w = {
            "w0": upd(w["w0"], r["g0"]),
            "w1": upd(w["w1"], r["g1"]),
            "w2": upd(w["w2"], r["g2"]),
        }
        acc_ppm = (
            None if r["acc_cnt"] is None or n == 0
            else tdiv(r["acc_cnt"] * 1000000, n)
        )
        loss_micro = (
            None if r["loss_sum"] is None or n == 0
            else tdiv(r["loss_sum"], n)
        )
        rows.append((it, w["w0"], w["w1"], w["w2"], acc_ppm, loss_micro))
    return spark.createDataFrame(
        rows,
        "iter int, w0_micro bigint, w1_micro bigint, w2_micro bigint,"
        " acc_ppm bigint, loss_micro bigint",
    ).orderBy("iter")


def _lr_duck() -> str:
    stop_pred = " OR ".join(f"t = '{s}'" for s in _LR_STOPS)
    toks = "list_filter(string_split(lower(text), ' '), x -> x != '')"
    parts = [
        f"""f AS (
  SELECT len(list_filter({toks}, t -> {stop_pred})) * 1000
           // greatest(len({toks}), 1) AS x1,
         least(length(replace(text, ' ', '')) * 1000
           // greatest(len({toks}), 1), 20000) // 20 AS x2,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
), wstep0 AS (
  SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
         CAST(0 AS BIGINT) AS w2
)"""
    ]
    idiv = "//"
    for it in range(1, _LR_ITERS + 1):
        prev = f"wstep{it - 1}"
        parts.append(f"""a{it} AS (
  SELECT COUNT(*) AS n,
         SUM({_RESID_MICRO} * 1000) AS g0,
         SUM({_RESID_MICRO} * x1) AS g1,
         SUM({_RESID_MICRO} * x2) AS g2,
         SUM({_ACC_HIT}) AS acc_cnt,
         SUM({_LOSS_MICRO}) AS loss_sum
  FROM f, {prev}
), r{it} AS (
  SELECT CAST({it} AS INT) AS iter,
         CAST(w0 + ({_LR_MILLI} * g0) {idiv} (n * 1000000) AS BIGINT) AS w0,
         CAST(w1 + ({_LR_MILLI} * g1) {idiv} (n * 1000000) AS BIGINT) AS w1,
         CAST(w2 + ({_LR_MILLI} * g2) {idiv} (n * 1000000) AS BIGINT) AS w2,
         CAST(acc_cnt * 1000000 {idiv} n AS BIGINT) AS acc_ppm,
         CAST(loss_sum {idiv} n AS BIGINT) AS loss_micro
  FROM a{it}, {prev}
), wstep{it} AS (
  SELECT w0, w1, w2 FROM r{it}
)""")
    picks = "\nUNION ALL ".join(
        f"SELECT iter, w0 AS w0_micro, w1 AS w1_micro, w2 AS w2_micro,"
        f" acc_ppm, loss_micro FROM r{it}"
        for it in range(1, _LR_ITERS + 1)
    )
    return f"WITH {','.join(parts)}\n{picks}\nORDER BY iter"


# ---------------------------------------------------------------------------
# Fourier periodogram of daily activity
# ---------------------------------------------------------------------------

_PG_KMAX = 8
_DAY_US = 86_400_000_000

_PG_CORE = f"""
WITH daily AS (
  SELECT ({{epoch_us}}) {{idiv}} {_DAY_US} AS d, COUNT(*) AS c
  FROM {{events}}
  GROUP BY ({{epoch_us}}) {{idiv}} {_DAY_US}
), span AS (
  SELECT MIN(d) AS dmin, MAX(d) - MIN(d) + 1 AS n_days FROM daily
), terms AS (
  SELECT k,
         SUM(CAST(floor(c * cos(2 * pi() * k * (d - dmin) / n_days)
                        * 1e6) AS BIGINT)) AS a,
         SUM(CAST(floor(c * sin(2 * pi() * k * (d - dmin) / n_days)
                        * 1e6) AS BIGINT)) AS b
  FROM daily, span {{lat}}
  GROUP BY k
)
SELECT CAST(k AS INT) AS k,
       CAST(n_days * 100 {{idiv}} k AS BIGINT) AS period_centi_days,
       CAST((CAST(a AS {{big}}) * a + CAST(b AS {{big}}) * b)
            {{idiv}} 1000000 AS BIGINT) AS power_micro
FROM terms, span
ORDER BY k
"""


def ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier periodogram of daily event counts at wave
    numbers k=1..{_PG_KMAX}: power_micro peaks at the series'
    dominant period (period_centi_days = span/k). The event stream
    collapses to ONE map-combined daily rollup (days x 1 rows), so
    the trig pass is O(days x k) whatever the event volume; per-row
    cos/sin terms are micro-floored before exact integer sums
    (order-independent), and the power square runs in DECIMAL(38,0)
    so no precision is lost before the final micro division."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r38_pg_events"
    )
    return spark.sql(
        _PG_CORE.format(
            events="r38_pg_events",
            epoch_us="unix_micros(ts)",
            idiv="DIV",
            big="DECIMAL(38,0)",
            lat=f"LATERAL VIEW explode(sequence(1, {_PG_KMAX})) tk AS k",
        )
    )


_PG_DUCK = _PG_CORE.format(
    events="events",
    epoch_us="epoch_us(ts)",
    idiv="//",
    big="HUGEINT",
    lat=f"CROSS JOIN range(1, {_PG_KMAX + 1}) tk(k)",
)


QUERIES = {
    "ml_logreg_quality": ml_logreg_quality,
    "ts_periodogram": ts_periodogram,
}

ORACLE = {
    "ml_logreg_quality": _lr_duck(),
    "ts_periodogram": _PG_DUCK,
}
