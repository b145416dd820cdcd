"""Round-5 batch 31: multilingual temperature sampling, Markov
stationary distribution, and a sequential A/B test (SURVEY.md §2.9
curation/events families; no reference counterpart).

  * ``curate_language_temperature`` — the mT5/XLM-R multilingual
    sampling rule: upsample low-resource languages with weights
    proportional to p_lang^alpha (alpha = 0.7). Weights are per-term
    micro-floored integers so the normalization is exact.
  * ``events_markov_stationary`` — stationary distribution of the
    event-type Markov chain by EIGHT unrolled power-iteration steps
    over the persisted 25-row transition relation, in pure integer
    arithmetic (state mass scaled to 1e12; each step's per-edge
    contribution is an exact integer floor-divide). The L1 delta
    between the last two iterates is reported so convergence is a
    checked number, not an assumption.
  * ``events_sprt_ab_test`` — Wald's sequential probability ratio
    test on the purchase-conversion stream: per-event log-likelihood
    ratios (integer micro-nats, precomputed module constants), the
    running total via the ``global_prefix_sum`` primitive (ONE range
    exchange, no single-partition window), and the first boundary
    crossing in event-time order. Sequential testing is how an
    experimentation platform stops experiments early at scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.library import global_prefix_sum
from ..sources.readers import load_table

# ---------------------------------------------------------------------------
# Language temperature sampling
# ---------------------------------------------------------------------------

_TEMP_ALPHA = 0.7

_TEMP_CORE = f"""
WITH c AS (
  SELECT lang, COUNT(*) AS n FROM {{docs}} GROUP BY lang
), t AS (
  SELECT lang, n, SUM(n) OVER () AS nt,
         CAST(floor(pow(CAST(n AS DOUBLE) / SUM(n) OVER (), {_TEMP_ALPHA})
                    * 1000000) AS BIGINT) AS w_micro
  FROM c
), norm AS (
  SELECT lang, n, nt, w_micro, SUM(w_micro) OVER () AS wt_micro FROM t
)
SELECT lang,
       CAST(n AS BIGINT) AS n_docs,
       CAST(n * 1000000 {{idiv}} nt AS BIGINT) AS p_micro,
       CAST(w_micro * 1000000 {{idiv}} wt_micro AS BIGINT)
         AS w_temp_micro,
       CAST(w_micro * nt {{idiv}} wt_micro AS BIGINT) AS expected_docs
FROM norm ORDER BY lang
"""


def curate_language_temperature(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-based multilingual sampling weights (alpha = 0.7,
    the mT5 default): each language's raw share p is flattened to
    p^alpha and renormalized, upsampling the tail. The p^alpha term
    floors to integer micros per language BEFORE the normalizing sum,
    so the published weights and expected-docs targets are exact
    integer arithmetic over those micros. One groupBy over the corpus
    and a 5-row window — at 100 TB the cost is the language count
    scan a mixture plan needs anyway."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "r44_temp_docs"
    )
    return spark.sql(_TEMP_CORE.format(docs="r44_temp_docs", idiv="DIV"))


_TEMP_DUCK = _TEMP_CORE.format(docs="documents", idiv="//")

# ---------------------------------------------------------------------------
# Markov stationary distribution
# ---------------------------------------------------------------------------

_PI_SCALE = 1_000_000_000_000  # state mass in parts-per-1e12
_PI_ITERS = 8


def markov_trans_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached (prev, next, c, tot) event-type transition
    relation — ONE per-user lag window over events serves both markov
    consumers (`events_markov_stationary` here and
    `events_markov_transitions` in curation2, which previously re-ran
    the window per call). NULL ts/user_id hit opposite window
    NULL-ordering defaults and a NULL event_type would mint a phantom
    chain state — dropped symmetrically with both oracles."""
    from .textdedup import _cached

    def build():
        ev = load_table(spark, sf_dir, "events").where(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
        )
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return (
            ev.withColumn("prev", F.lag("event_type").over(w))
            .where(F.col("prev").isNotNull())
            .groupBy("prev", F.col("event_type").alias("next"))
            .agg(F.count("*").alias("c"))
            .withColumn(
                "tot", F.sum("c").over(Window.partitionBy("prev"))
            )
        )

    return _cached(spark, sf_dir, "markov_trans", build)


def _pi_iter_sql(trans: str, idiv: str) -> str:
    ctes = [
        f"""states AS (
  SELECT DISTINCT prev AS state FROM {trans}
), it0 AS (
  SELECT state,
         CAST({_PI_SCALE} {idiv} (SELECT COUNT(*) FROM states) AS BIGINT)
           AS v
  FROM states
)"""
    ]
    for k in range(1, _PI_ITERS + 1):
        ctes.append(f"""it{k} AS (
  SELECT t.next AS state, SUM(p.v * t.c {idiv} t.tot) AS v
  FROM it{k - 1} p JOIN {trans} t ON t.prev = p.state
  GROUP BY t.next
)""")
    last, prev = f"it{_PI_ITERS}", f"it{_PI_ITERS - 1}"
    ctes.append(f"""res AS (
  SELECT SUM(ABS(a.v - b.v)) AS d
  FROM {last} a JOIN {prev} b ON a.state = b.state
)""")
    return (
        ", ".join(ctes)
        + f"""
SELECT a.state AS event_type,
       CAST(a.v {idiv} 1000 AS BIGINT) AS pi_ppb,
       CAST(r.d AS BIGINT) AS delta_l1_e12
FROM {last} a CROSS JOIN res r
ORDER BY event_type"""
    )


def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type transition chain:
    pi_{{k+1}}[j] = sum_i pi_k[i] * c_ij / tot_i, eight steps unrolled
    over the persisted (prev, next, count, row-total) relation — the
    PageRank shape at dimension 5, so the entire iteration is window
    work on 25 rows after ONE lag-window shuffle builds the
    transitions. Integer mass (1e12 scale) with exact per-edge floor
    divides: no floats anywhere, any engine/partitioning agrees to
    the last unit. delta_l1_e12 reports |pi_8 - pi_7|_1 so
    convergence is checked, not assumed.

    The DATA-sized stage — the per-user lag window over events — is
    distributed; the transition matrix it produces is bounded by the
    event-type alphabet squared (a generator/domain constant, ≤25
    rows at any event volume), so it is pulled once as a bounded
    summary and the eight fixpoint steps run driver-side (guide
    §1.2: the unrolled-CTE form scheduled ~16 exchange stages over
    those 25 rows — scheduling overhead was ~1.7s of a 2.2s query).
    The integer arithmetic below replicates the SQL exactly (all
    operands non-negative, so python // == Spark DIV == DuckDB //);
    the oracle still runs the unrolled-CTE form, so parity PROVES
    the replication."""
    # bounded collect: ≤ |event-type alphabet|² transition rows
    t_rows = markov_trans_cached(spark, sf_dir).collect()
    states = sorted({r["prev"] for r in t_rows})
    schema = "event_type string, pi_ppb bigint, delta_l1_e12 bigint"
    if not states:
        return spark.createDataFrame([], schema)
    v = {s: _PI_SCALE // len(states) for s in states}
    prev_v: dict = {}
    for _ in range(_PI_ITERS):
        prev_v = v
        nxt: dict = {}
        for r in t_rows:
            if r["prev"] in v:
                nxt[r["next"]] = (
                    nxt.get(r["next"], 0) + v[r["prev"]] * r["c"] // r["tot"]
                )
        v = nxt
    common = set(v) & set(prev_v)
    d = sum(abs(v[s] - prev_v[s]) for s in common) if common else None
    rows = [(s, v[s] // 1000, d) for s in sorted(v)]
    return spark.createDataFrame(rows, schema).orderBy("event_type")


_PI_DUCK = (
    """
WITH seq AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
    AND event_type IS NOT NULL
), tcount AS (
  SELECT prev, event_type AS next, COUNT(*) AS c
  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
), trans AS (
  SELECT prev, next, c, SUM(c) OVER (PARTITION BY prev) AS tot
  FROM tcount
), """
    + _pi_iter_sql("trans", "//")
)

# ---------------------------------------------------------------------------
# Sequential probability ratio test (Wald SPRT)
# ---------------------------------------------------------------------------

_SPRT_P0 = 0.18
_SPRT_P1 = 0.22
# per-event LLR in integer micro-nats, precomputed so both engines use
# identical literals (no cross-engine ln() in the hot path)
_SPRT_L1 = math.floor(math.log(_SPRT_P1 / _SPRT_P0) * 1_000_000)
_SPRT_L0 = math.floor(
    math.log((1 - _SPRT_P1) / (1 - _SPRT_P0)) * 1_000_000
)
_SPRT_B = math.floor(math.log(19.0) * 1_000_000)  # alpha = beta = 0.05

_SPRT_FINAL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(llr) AS BIGINT) AS final_llr_micro,
       CAST(SUM(CASE WHEN cum >= {_SPRT_B} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above_upper,
       CAST(SUM(CASE WHEN cum <= -{_SPRT_B} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_below_lower,
       CAST(MIN(CASE WHEN cum >= {_SPRT_B} THEN u END) AS BIGINT)
         AS first_upper_us,
       CAST(MIN(CASE WHEN cum <= -{_SPRT_B} THEN u END) AS BIGINT)
         AS first_lower_us
FROM {{cum}}
"""


def events_sprt_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT for 'is the purchase-conversion rate p1 = 0.22 vs
    p0 = 0.18': each event contributes a precomputed integer
    micro-nat log-likelihood ratio; the running total over event time
    uses ``global_prefix_sum`` (one range exchange + broadcast
    partition offsets — NO single-partition window over the event
    stream), and the output reports boundary-crossing counts and the
    first crossing timestamps. The fixture's true rate (~0.198) sits
    between the hypotheses, so the expected outcome is 'no early
    stop' — which the numbers must PROVE, not presume."""
    # a NULL ts has no place on the sequential-time axis (and sorts on
    # opposite ends of it across engines) — dropped symmetrically.
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select(
            F.unix_micros("ts").alias("u"),
            "event_id",
            F.when(F.col("event_type") == "purchase", F.lit(_SPRT_L1))
            .otherwise(F.lit(_SPRT_L0))
            .alias("llr"),
        )
    )
    cum = global_prefix_sum(
        ev, order_by=["u", "event_id"], value_col="llr", out_col="cum"
    )
    cum.createOrReplaceTempView("r44_sprt_cum")
    return spark.sql(_SPRT_FINAL.format(cum="r44_sprt_cum"))


_SPRT_DUCK = f"""
WITH base AS (
  SELECT epoch_us(ts) AS u, event_id,
         CASE WHEN event_type = 'purchase' THEN {_SPRT_L1}
              ELSE {_SPRT_L0} END AS llr
  FROM events
  WHERE ts IS NOT NULL
), c AS (
  SELECT u, llr,
         SUM(llr) OVER (ORDER BY u, event_id
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM base
)
""" + _SPRT_FINAL.format(cum="c")


QUERIES = {
    "curate_language_temperature": curate_language_temperature,
    "events_markov_stationary": events_markov_stationary,
    "events_sprt_ab_test": events_sprt_ab_test,
}

ORACLE = {
    "curate_language_temperature": _TEMP_DUCK,
    "events_markov_stationary": _PI_DUCK,
    "events_sprt_ab_test": _SPRT_DUCK,
}
