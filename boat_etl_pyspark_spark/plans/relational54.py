"""Round-5 batch 41: Markov entropy rate, extreme-value analysis and
the Nelson–Aalen hazard (SURVEY.md §2.9 events/time-series/
aggregation families; no reference counterpart).

  * ``events_markov_entropy_rate`` — plug-in entropy rate of the
    event-type transition chain, next to the marginal next-state
    entropy: the gap between them is exactly the information the
    chain structure carries.  Every term is c·ln(tot/c) — one ln of
    an exact integer rational — floored to micro-nats BEFORE the
    integer sum.
  * ``ts_extreme_value_gumbel`` — Gumbel fit to weekly block maxima
    of daily order revenue by the method of moments (closed form, no
    iteration), with the 52-block return level: the 'how bad is a
    one-year peak' question asked of any load or spend series.
  * ``agg_survival_nelson_aalen`` — the cumulative-hazard
    counterpart to `agg_survival_kaplan_meier` over the SAME
    risk-set construction (days to first error, right-censored):
    per-day d/n increments floored to micro units, then ONE ordered
    cumulative integer sum — fully order-immune where KM's product
    limit needs an ordered ln-sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table
from .contract import money_rounded_sql, tpch_date_valid_sql

# ---------------------------------------------------------------------------
# Markov entropy rate
# ---------------------------------------------------------------------------

_ENTRATE_CORE = """
WITH seq AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM {events}
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
    AND event_type IS NOT NULL
), trans AS (
  SELECT prev, event_type AS next, COUNT(*) AS c
  FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type
), wt AS (
  SELECT prev, next, c, SUM(c) OVER (PARTITION BY prev) AS tot,
         SUM(c) OVER (PARTITION BY next) AS ctot,
         SUM(c) OVER () AS t
  FROM trans
), terms AS (
  SELECT t,
         CAST(floor(c * ln(CAST(tot AS DOUBLE) / c) * 1000000)
              AS BIGINT) AS rate_term,
         c, next, ctot
  FROM wt
), marg AS (
  SELECT next, MAX(ctot) AS cn, MAX(t) AS t FROM terms GROUP BY next
), h AS (
  SELECT SUM(rate_term) AS rate_num, MAX(t) AS t,
         COUNT(DISTINCT next) AS n_states
  FROM terms
), hm AS (
  SELECT SUM(CAST(floor(cn * ln(CAST(t AS DOUBLE) / cn) * 1000000)
                  AS BIGINT)) AS marg_num
  FROM marg
)
SELECT CAST(h.t AS BIGINT) AS n_transitions,
       CAST(h.n_states AS BIGINT) AS n_states,
       CAST(h.rate_num {idiv} h.t AS BIGINT) AS entropy_rate_micro_nats,
       CAST(hm.marg_num {idiv} h.t AS BIGINT) AS marginal_entropy_micro_nats,
       CAST(hm.marg_num {idiv} h.t - h.rate_num {idiv} h.t AS BIGINT)
         AS chain_information_micro_nats
FROM h CROSS JOIN hm
"""


def events_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plug-in entropy rate of the event-type chain,
    H = (1/T)Σ_ij c_ij·ln(tot_i/c_ij), next to the marginal
    next-state entropy; their difference is the information the
    chain carries (0 would mean event types are i.i.d.).  Each term
    is one ln of an exact integer rational floored to micro-nats
    before the integer sum, so both entropies and the gap are
    engine-exact.  One lag-window shuffle builds the transitions;
    everything after is states²-sized."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r54_ent_events"
    )
    return spark.sql(_ENTRATE_CORE.format(events="r54_ent_events", idiv="DIV"))


_ENTRATE_DUCK = _ENTRATE_CORE.format(events="events", idiv="//")

# ---------------------------------------------------------------------------
# Gumbel block maxima
# ---------------------------------------------------------------------------

_EULER_GAMMA = "0.5772156649015329"
_GUMBEL_T = 52

_GUMBEL_CORE = f"""
WITH daily AS (
  -- bounded cents + business-date validity (round-10 layer 2, same
  -- rationale as window_bollinger_bands)
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM({money_rounded_sql('o_totalprice')}) AS x
  FROM {{orders}} WHERE {tpch_date_valid_sql('o_orderdate')}
  GROUP BY CAST(o_orderdate AS DATE)
), idx AS (
  SELECT x, (ROW_NUMBER() OVER (ORDER BY d) - 1) {{idiv}} 7 AS wk
  FROM daily
), blocks AS (
  SELECT wk, MAX(x) AS m FROM idx GROUP BY wk
), s AS (
  SELECT COUNT(*) AS n, SUM(m) AS s1,
         SUM(CAST(m AS DECIMAL(38,0)) * m) AS s2
  FROM blocks
), fit AS (
  SELECT n, s1 {{idiv}} n AS mean_cents,
         sqrt((CAST(s2 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * s1)
              / (CAST(n AS DOUBLE) * (n - 1))) AS sd,
         CAST(s1 AS DOUBLE) / n AS meanf
  FROM s
)
SELECT CAST(n AS BIGINT) AS n_blocks,
       CAST(mean_cents AS BIGINT) AS mean_max_cents,
       CAST(floor(sd) AS BIGINT) AS sd_max_cents,
       CAST(floor(sd * sqrt(6.0) / pi()) AS BIGINT) AS beta_cents,
       CAST(floor(meanf - {_EULER_GAMMA} * sd * sqrt(6.0) / pi())
            AS BIGINT) AS mu_cents,
       CAST(floor(meanf - {_EULER_GAMMA} * sd * sqrt(6.0) / pi()
                  - sd * sqrt(6.0) / pi()
                    * ln(-ln(1e0 - 1e0 / {_GUMBEL_T})))
            AS BIGINT) AS return_level_{_GUMBEL_T}_cents
FROM fit
"""


def ts_extreme_value_gumbel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel extreme-value fit to weekly block maxima of daily
    order revenue by the method of moments (β = s√6/π,
    μ = m̄ − γβ — closed form, no MLE iteration), plus the 52-block
    return level μ − β·ln(−ln(1−1/52)): the magnitude a once-a-year
    peak is expected to reach.  Block maxima and the two power sums
    are exact integers; the fit is a handful of fixed-shape floats.
    The daily and weekly relations are date-span-bounded."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r54_ev_orders"
    )
    return spark.sql(_GUMBEL_CORE.format(orders="r54_ev_orders", idiv="DIV"))


_GUMBEL_DUCK = _GUMBEL_CORE.format(orders="orders", idiv="//")

# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard
# ---------------------------------------------------------------------------

_NA_CORE = """
WITH t AS (
  SELECT user_id, {epoch_us} AS us, event_type FROM {events}
), u AS (
  SELECT user_id,
         MIN(us) AS start_us,
         MIN(CASE WHEN event_type = 'error' THEN us END) AS fail_us,
         MAX(us) AS last_us
  FROM t GROUP BY user_id
), d AS (
  SELECT CASE WHEN fail_us IS NOT NULL
              THEN (fail_us - start_us) {idiv} 86400000000
              ELSE (last_us - start_us) {idiv} 86400000000 END AS dur_d,
         (fail_us IS NOT NULL) AS failed
  FROM u
), alld AS (
  SELECT dur_d, COUNT(*) AS exits,
         SUM(CASE WHEN failed THEN 1 ELSE 0 END) AS ev
  FROM d GROUP BY dur_d
), r AS (
  SELECT dur_d, ev, exits,
         SUM(exits) OVER (ORDER BY dur_d
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS exited_before,
         SUM(exits) OVER () AS total
  FROM alld
), na AS (
  SELECT dur_d, ev, total - coalesce(exited_before, 0) AS n
  FROM r WHERE ev > 0
)
SELECT CAST(dur_d AS BIGINT) AS day,
       CAST(n AS BIGINT) AS n_risk,
       CAST(ev AS BIGINT) AS n_events,
       CAST(1000000 * ev {idiv} n AS BIGINT) AS hazard_step_micro,
       CAST(SUM(1000000 * ev {idiv} n)
            OVER (ORDER BY dur_d ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_hazard_micro
FROM na
ORDER BY day
"""


def agg_survival_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard over the SAME risk-set
    construction as `agg_survival_kaplan_meier` (days to first
    error, right-censored at last activity): per-day increments
    d/n floored to exact integer micro units, then one ordered
    cumulative integer sum — fully order-immune, where the KM
    product limit needs an ordered ln-sum.  The per-user aggregate
    is the only heavy pass; the curve runs on a day-bounded
    relation."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r54_na_events"
    )
    return spark.sql(
        _NA_CORE.format(
            events="r54_na_events", epoch_us="unix_micros(ts)", idiv="DIV"
        )
    )


_NA_DUCK = _NA_CORE.format(events="events", epoch_us="epoch_us(ts)", idiv="//")


QUERIES = {
    "events_markov_entropy_rate": events_markov_entropy_rate,
    "ts_extreme_value_gumbel": ts_extreme_value_gumbel,
    "agg_survival_nelson_aalen": agg_survival_nelson_aalen,
}

ORACLE = {
    "events_markov_entropy_rate": _ENTRATE_DUCK,
    "ts_extreme_value_gumbel": _GUMBEL_DUCK,
    "agg_survival_nelson_aalen": _NA_DUCK,
}
