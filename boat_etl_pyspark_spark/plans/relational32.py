"""Round-5 batch 16: sketch-first heavy hitters, contrastive negative
sampling, and robust rolling-window outlier detection (SURVEY.md §2.9
aggregation / ML-prep / window families; no reference counterpart).

  * ``agg_heavy_hitters`` — exact frequent-key detection via the
    classic two-pass Misra-Gries shape: pass 1 summarizes every
    partition into at most M counters (mergeable-summaries trim, so
    the candidate union provably contains every key with global
    frequency >= N/M), pass 2 recounts ONLY the tiny candidate set
    exactly through a broadcast semi-join. The corpus never shuffles —
    the only exchanged rows are per-partition summaries (<= M+1 rows
    each) and per-candidate counts.
  * ``ml_negative_sampling`` — deterministic contrastive negatives
    for (customer, part) interactions: md5-bucket pseudo-randomness
    (seedless, partition-stable, engine-portable) proposes K
    candidate parts per positive, and a NOT EXISTS anti-join against
    the full positive set removes accidental positives. The standard
    training-pair generator for two-tower / matrix-factorization
    models, expressed so both engines agree bit-for-bit.
  * ``window_hampel_outliers`` — Hampel filter over each user's
    event-value series: centered 5-point rolling median and rolling
    MAD built from explicit lead/lag arrays (exact integer cents —
    median of 5 ints is the sorted middle, no floats anywhere), flag
    |x - med| > 3 * MAD, report per-user interior/outlier counts and
    the largest deviation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from . import track_persist

# ---------------------------------------------------------------------------
# Heavy hitters: per-partition Misra-Gries summaries + exact recount
# ---------------------------------------------------------------------------

# M counters per partition. Guarantee chain: the mergeable-summaries
# trim (subtract the (M+1)-th largest count, drop <=0) undercounts any
# key by at most n_p/(M+1) within a partition, so a key with local
# frequency f_p > n_p/(M+1) always survives pass 1. If a key's GLOBAL
# frequency is >= N/M, weighted pigeonhole gives a partition where
# f_p >= n_p/M > n_p/(M+1), hence it is in the candidate union — the
# exact pass-2 recount + threshold filter then makes the final result
# independent of partitioning entirely.
_HH_M = 64

# The fixtures are deliberately uniform (no natural hot keys — the
# same reason join_salted_revenue salts everything), so the skew is
# constructed: every third lineitem collapses onto one of five hot
# keys (~6.7% of N each, far above N/M), the rest keep their order
# key (domain of ~1.5M at sf=1, each far below N/M). The CASE is the
# demo's data generator; the operator itself never depends on it.
_HH_KEY = "CASE WHEN l_orderkey % 3 = 0 THEN l_orderkey % 5 ELSE l_orderkey END"


def _mg_summaries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition Misra-Gries: fold each Arrow batch's exact
    value_counts into the running counter set, trimming back to
    ``_HH_M`` keys with the mergeable-summaries rule. Emits candidate
    keys as (k, 0) rows plus one (NULL, n_p) row carrying the
    partition's row count so pass 2 gets N without a third scan."""
    counters = pd.Series(dtype="int64")
    n_p = 0
    for pdf in batches:
        batch = pdf["k"].value_counts()
        n_p += int(batch.sum())
        counters = counters.add(batch, fill_value=0)
        if len(counters) > _HH_M:
            cut = counters.nlargest(_HH_M + 1).iloc[-1]
            counters = counters[counters > cut] - cut
    yield pd.DataFrame(
        {
            "k": pd.array(
                list(counters.index.astype("int64")) + [None], dtype="Int64"
            ),
            "np": pd.array([0] * len(counters) + [n_p], dtype="Int64"),
        }
    )


def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keys with global frequency >= N/{M}: Misra-Gries candidate pass
    (mapInPandas, one int64 column through Arrow, <= {M}+1 summary
    rows per partition) then an exact broadcast-semi-join recount.
    Two corpus scans, zero corpus shuffles — the 100 TB shape for
    hot-key detection when stats are unavailable. The final filter
    recounts candidates EXACTLY, so the result is identical for any
    partitioning (pass 1 only ever over-generates candidates).

    Pinned NULL rule (round-10 layer 2): a NULL key is not a key —
    excluded from candidates AND from n_total on both sides (pandas
    ``value_counts`` already drops NaN, so an unfiltered oracle would
    count one more row than the summaries report)."""
    fact = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.expr(_HH_KEY).cast("bigint").alias("k"))
        .where(F.col("k").isNotNull())
    )
    summary = track_persist(
        fact.mapInPandas(_mg_summaries, "k bigint, np bigint")
    )
    candidates = summary.where("k IS NOT NULL").select("k").distinct()
    total = summary.agg(F.sum("np").cast("bigint").alias("n_total"))
    counts = (
        fact.join(F.broadcast(candidates), "k")
        .groupBy("k")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * _HH_M >= F.col("n_total"))
        .select(
            F.col("k").alias("hot_key"),
            F.col("cnt").cast("bigint").alias("cnt"),
            F.expr("CAST(cnt * 1000000 DIV n_total AS BIGINT)").alias(
                "share_ppm"
            ),
            "n_total",
        )
        .orderBy(F.desc("cnt"), "hot_key")
    )


_HH_SQL = f"""
WITH f AS (
  SELECT {_HH_KEY} AS k FROM lineitem
), c AS (
  SELECT k, COUNT(*) AS cnt FROM f WHERE k IS NOT NULL GROUP BY k
), t AS (
  SELECT SUM(cnt) AS n_total FROM c
)
SELECT k AS hot_key,
       CAST(cnt AS BIGINT) AS cnt,
       CAST(cnt * 1000000 // n_total AS BIGINT) AS share_ppm,
       CAST(n_total AS BIGINT) AS n_total
FROM c, t
WHERE cnt * {_HH_M} >= n_total
ORDER BY cnt DESC, hot_key
"""


# ---------------------------------------------------------------------------
# Deterministic contrastive negative sampling
# ---------------------------------------------------------------------------

_NEG_K = 3
_NEG_MOD = 53  # 1-in-53 customer subset keeps the demo output bounded

# Seedless engine-portable pseudo-randomness: first 24 md5 bits of
# "custkey:partkey:j" (the ml_kfold_assign idiom).
_NEG_SPARK_BUCKET = (
    "CAST(conv(substr(md5(CAST(custkey AS STRING) || ':' ||"
    " CAST(partkey AS STRING) || ':' || CAST(j AS STRING)), 1, 6),"
    " 16, 10) AS BIGINT)"
)
_NEG_DUCK_BUCKET = (
    "CAST('0x' || substr(md5(CAST(custkey AS VARCHAR) || ':' ||"
    " CAST(partkey AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 6)"
    " AS BIGINT)"
)

_NEG_VALUES = ", ".join(f"({j})" for j in range(1, _NEG_K + 1))

# Positives are derived ONCE (the multi-referenced-CTE audit rule —
# a NOT EXISTS form would inline-derive the orders x lineitem join
# twice): one custkey-grouped set per customer feeds both candidate
# generation (explode) and the collision filter (array membership).
# The per-customer positive set is a purchase history — naturally
# bounded at scale; a pathological 10^6-item customer would switch
# this back to the two-derivation anti-join form.
_NEG_CORE = f"""
WITH sets AS (
  SELECT o_custkey AS custkey, {{agg_set}} AS pks
  FROM {{orders}} JOIN {{lineitem}} ON o_orderkey = l_orderkey
  WHERE o_custkey % {_NEG_MOD} = 0
  GROUP BY o_custkey
), pmax AS (
  SELECT MAX(p_partkey) AS pm FROM {{part}}
), cand AS (
  SELECT custkey, partkey, j, pks,
         1 + ({{bucket}} % pm) AS neg_partkey
  FROM (SELECT custkey, {{unnest}}(pks) AS partkey, pks FROM sets) e
  CROSS JOIN pmax
  CROSS JOIN (VALUES {_NEG_VALUES}) AS t(j)
)
SELECT custkey,
       partkey AS pos_partkey,
       CAST(j AS BIGINT) AS sample_j,
       CAST(neg_partkey AS BIGINT) AS neg_partkey
FROM cand
WHERE NOT {{contains}}(pks, neg_partkey)
ORDER BY custkey, pos_partkey, sample_j
"""


def ml_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K deterministic negative parts per (customer, part) positive:
    md5-bucket candidates modulo the part-key domain (the 1-row MAX
    relation broadcasts), with accidental positives dropped by set
    membership — so "negative" is exact, not probabilistic. Scale
    posture: interactions shuffle once on custkey into per-customer
    positive sets; candidate generation is a map-side explode over
    them; no second derivation of the join, and no row carries more
    than one purchase history."""
    for t in ("orders", "lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"r32_neg_{t}")
    return spark.sql(
        _NEG_CORE.format(
            orders="r32_neg_orders",
            lineitem="r32_neg_lineitem",
            part="r32_neg_part",
            bucket=_NEG_SPARK_BUCKET,
            agg_set="collect_set(l_partkey)",
            unnest="explode",
            contains="array_contains",
        )
    )


_NEG_DUCK = _NEG_CORE.format(
    orders="orders", lineitem="lineitem", part="part",
    bucket=_NEG_DUCK_BUCKET,
    agg_set="list(DISTINCT l_partkey)",
    unnest="unnest",
    contains="list_contains",
)


# ---------------------------------------------------------------------------
# Hampel filter: rolling-median / rolling-MAD outlier detection
# ---------------------------------------------------------------------------

# Exact 5-point medians as explicit sorted arrays: both engines sort
# five bigints and take the middle — no percentile/median window
# function needed (Spark lacks an exact one), no floats anywhere.
_H_SPARK_MED = "element_at(array_sort(array({a}, {b}, {c}, {d}, {e})), 3)"
_H_DUCK_MED = "list_sort([{a}, {b}, {c}, {d}, {e}])[3]"

_HAMPEL_CORE = """
WITH e AS (
  SELECT user_id, event_id, {epoch_us} AS us,
         TRY_CAST(round(value * 100) AS BIGINT) AS cents
  FROM {events}
  WHERE value IS NOT NULL  -- scan-pushdown half of the predicate
    AND TRY_CAST(round(value * 100) AS BIGINT) IS NOT NULL
), w AS (
  SELECT user_id, us, event_id, cents,
         LAG(cents, 2)  OVER win AS l2,
         LAG(cents, 1)  OVER win AS l1,
         LEAD(cents, 1) OVER win AS d1,
         LEAD(cents, 2) OVER win AS d2
  FROM e
  WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id)
), m AS (
  SELECT user_id, cents, l2, l1, d1, d2, {med} AS med
  FROM w
  WHERE l2 IS NOT NULL AND d2 IS NOT NULL
), h AS (
  SELECT user_id, cents, med, {mad} AS mad
  FROM m
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_interior,
       CAST(SUM(CASE WHEN abs(cents - med) > 3 * mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST(MAX(abs(cents - med)) AS BIGINT) AS max_dev_cents
FROM h
GROUP BY user_id
ORDER BY user_id
"""


def _hampel_sql(med5: str, epoch_us: str, events: str) -> str:
    med = med5.format(a="l2", b="l1", c="cents", d="d1", e="d2")
    mad = med5.format(
        a="abs(l2 - med)", b="abs(l1 - med)", c="abs(cents - med)",
        d="abs(d1 - med)", e="abs(d2 - med)",
    )
    return _HAMPEL_CORE.format(
        med=med, mad=mad, epoch_us=epoch_us, events=events
    )


def window_hampel_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Hampel filter over the event-value series: centered
    5-point rolling median and rolling MAD from lead/lag arrays (one
    user_id exchange shared by all four offsets), outlier when
    |x - med| > 3 * MAD. All arithmetic is integer cents — the median
    of five bigints is the sorted middle element, so Spark and DuckDB
    agree exactly. Interior points only (both lags and both leads
    present); the per-user reduction rides the same exchange."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r32_hampel_events"
    )
    return spark.sql(
        _hampel_sql(_H_SPARK_MED, "unix_micros(ts)", "r32_hampel_events")
    )


_HAMPEL_DUCK = _hampel_sql(_H_DUCK_MED, "epoch_us(ts)", "events")


QUERIES = {
    "agg_heavy_hitters": agg_heavy_hitters,
    "ml_negative_sampling": ml_negative_sampling,
    "window_hampel_outliers": window_hampel_outliers,
}

ORACLE = {
    "agg_heavy_hitters": _HH_SQL,
    "ml_negative_sampling": _NEG_DUCK,
    "window_hampel_outliers": _HAMPEL_DUCK,
}
