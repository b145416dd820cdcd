"""Round-5 batch 19: sketch-quality calibration and model gains
analysis (SURVEY.md §2.9 dedup / ML-pipeline families; no reference
counterpart).

  * ``dedup_minhash_calibration`` — measure the MinHash estimator
    against ground truth ON the live pipeline: for every LSH
    candidate pair, compare the 12-hash signature agreement (the
    estimate, in twelfths) with the EXACT shingle Jaccard, bucketed
    by signature match count: pair counts, mean/min/max exact ppm,
    and the estimator bias per bucket. This is the measurement that
    justifies (or indicts) the b=4 x r=3 banding choice before
    running it over 100 TB — approximations in the corpus pipeline
    ship with their error measured, not assumed.
  * ``ml_lift_gains_table`` — cumulative gains / lift table of the
    deterministic value-predicts-purchase model (the companion the
    `ml_roc_auc` / `ml_pr_auc` pair still lacked): score deciles from
    the DISTRIBUTED global rank on the unique (cents desc, event_id)
    key, per-decile positives, cumulative gains ppm and lift milli as
    windows over the 10-row decile relation. The campaign-targeting
    readout: "the top 20% of scores captures X% of purchases".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.library import global_rank
from ..sources.readers import load_table
from . import track_persist
from .textdedup import (
    _DUCK_SHINGLES,
    _MH_A,
    _MH_B,
    _MH_P,
    _cached,
    _shingle_sets,
)

# ---------------------------------------------------------------------------
# MinHash estimator calibration
# ---------------------------------------------------------------------------

# Signature construction: identical constants and algebra to
# textdedup._MINHASH_BANDS_SPARK (k=12 affine permutations over
# GF(2^31-1) of one md5 per shingle) — restated over the persisted
# shingle view so the signatures themselves can persist and feed both
# the band join and the per-pair agreement count.
_SIG_SPARK = f"""
SELECT doc_id, s,
       transform(sequence(0, 11),
                 i -> array_min(transform(h0,
                      h -> (element_at(array({", ".join(map(str, _MH_A))}), CAST(i AS INT) + 1) * h
                            + element_at(array({", ".join(map(str, _MH_B))}), CAST(i AS INT) + 1)) % {_MH_P}))) AS mh
FROM (
  SELECT doc_id, s,
         transform(s, x -> CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT) % {_MH_P}) AS h0
  FROM {{sh}}
)
"""

_CALIB_SPARK = """
WITH bands AS (
  SELECT doc_id, b.band_idx, b.band_key
  FROM (
    SELECT doc_id,
           explode(transform(sequence(0, 3),
               j -> struct(j AS band_idx,
                           md5(concat_ws(',', transform(slice(mh, j * 3 + 1, 3),
                                                        v -> CAST(v AS STRING)))) AS band_key))) AS b
    FROM {sig})
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
), pairs AS (
  SELECT size(filter(sequence(1, 12),
              i -> element_at(sa.mh, CAST(i AS INT))
                   = element_at(sb.mh, CAST(i AS INT)))) AS sig_matches,
         CAST(size(array_intersect(sa.s, sb.s)) AS BIGINT) * 1000000
           DIV (size(sa.s) + size(sb.s)
                - size(array_intersect(sa.s, sb.s))) AS exact_ppm
  FROM cand c
  JOIN {sig} sa ON sa.doc_id = c.doc_a
  JOIN {sig} sb ON sb.doc_id = c.doc_b
)
SELECT CAST(sig_matches AS BIGINT) AS sig_matches,
       CAST(sig_matches * 1000000 DIV 12 AS BIGINT) AS est_jaccard_ppm,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(exact_ppm) DIV COUNT(*) AS BIGINT) AS mean_exact_ppm,
       CAST(MIN(exact_ppm) AS BIGINT) AS min_exact_ppm,
       CAST(MAX(exact_ppm) AS BIGINT) AS max_exact_ppm,
       CAST(sig_matches * 1000000 DIV 12
            - SUM(exact_ppm) DIV COUNT(*) AS BIGINT) AS bias_ppm
FROM pairs
GROUP BY sig_matches
ORDER BY sig_matches
"""


def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-vs-truth calibration of the MinHash signatures over
    the LSH candidate pairs: signature agreement (0-12 of 12) against
    exact shingle Jaccard, aggregated per agreement bucket with the
    bucket's estimator bias. Shingle sets and signatures persist once
    (the shared-cache pattern of ``dedup_minhash_lsh``); candidates
    come from the same banded join — only hashes shuffle, never text.
    All ratios are exact integer ppm."""
    def build():
        sh = _shingle_sets(spark, sf_dir)
        sh.select("doc_id", "s").createOrReplaceTempView("__calib_sh")
        sig = track_persist(spark.sql(_SIG_SPARK.format(sh="__calib_sh")))
        sig.createOrReplaceTempView("__calib_sig")
        return spark.sql(_CALIB_SPARK.format(sig="__calib_sig"))

    return _cached(spark, sf_dir, "minhash_calibration", build)


_CALIB_DUCK = f"""
WITH sh AS ({_DUCK_SHINGLES}),
hashed AS (
  SELECT doc_id, s,
         list_transform(s, x -> CAST(concat('0x', substring(md5(x), 1, 15)) AS BIGINT) % {_MH_P}) AS h0
  FROM sh
),
sig AS (
  SELECT doc_id, s,
         list_transform(range(0, 12),
                        i -> list_min(list_transform(h0,
                             h -> (([{", ".join(map(str, _MH_A))}])[i + 1] * h
                                   + ([{", ".join(map(str, _MH_B))}])[i + 1]) % {_MH_P}))) AS mh
  FROM hashed
),
bands AS (
  SELECT doc_id, j AS band_idx,
         md5(concat_ws(',', CAST(mh[j * 3 + 1] AS VARCHAR), CAST(mh[j * 3 + 2] AS VARCHAR),
                            CAST(mh[j * 3 + 3] AS VARCHAR))) AS band_key
  FROM sig, range(0, 4) r(j)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT len(list_filter(range(1, 13), i -> sa.mh[i] = sb.mh[i])) AS sig_matches,
         CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) * 1000000
           // (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS exact_ppm
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b
)
SELECT CAST(sig_matches AS BIGINT) AS sig_matches,
       CAST(sig_matches * 1000000 // 12 AS BIGINT) AS est_jaccard_ppm,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(exact_ppm) // COUNT(*) AS BIGINT) AS mean_exact_ppm,
       CAST(MIN(exact_ppm) AS BIGINT) AS min_exact_ppm,
       CAST(MAX(exact_ppm) AS BIGINT) AS max_exact_ppm,
       CAST(sig_matches * 1000000 // 12
            - SUM(exact_ppm) // COUNT(*) AS BIGINT) AS bias_ppm
FROM pairs
GROUP BY sig_matches
ORDER BY sig_matches
"""


# ---------------------------------------------------------------------------
# Cumulative gains / lift table
# ---------------------------------------------------------------------------


def ml_lift_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-decile gains/lift of the value-predicts-purchase model:
    ranks from ``global_rank`` on the unique (cents DESC via negation,
    event_id) key — one range exchange, deterministic under ties —
    then the decile bucketing, cumulative gains ppm and lift milli are
    windows over the 10-row decile relation. Best scores land in
    decile 1."""
    # a NULL/NaN/Inf score can't be ranked (and each engine invents a
    # different rank position for one) — scoreless rows are dropped
    # symmetrically via the same try-cast predicate the oracle uses.
    ev = (
        load_table(spark, sf_dir, "events")
        .where(
            # plain isNotNull is the scan-pushdown half; try_cast
            # handles NaN/Inf post-scan
            F.col("value").isNotNull()
            & F.round(F.col("value") * 100).try_cast("bigint").isNotNull()
        )
        .select(
            "event_id",
            (-F.round(F.col("value") * 100).try_cast("bigint")).alias("neg_cents"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    # ONE bounded count serves both global_rank's partition sizing and
    # the decile width (was: rank's internal count + a second agg over
    # the ranked relation crossJoined back in — two extra jobs and a
    # broadcast exchange for the same scalar; guide §2.4)
    n = ev.count()
    ranked = global_rank(ev, ["neg_cents", "event_id"], rows=n)
    deciles = (
        ranked.withColumn(
            "decile", F.expr(f"(rank - 1) * 10 DIV {n} + 1")
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("y").alias("n_pos"),
        )
    )
    return (
        deciles.select(
            F.col("decile").cast("bigint").alias("decile"),
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("n_pos").cast("bigint").alias("n_pos"),
            F.expr(
                "CAST(SUM(n_pos) OVER (ORDER BY decile"
                " ROWS UNBOUNDED PRECEDING) * 1000000"
                " DIV SUM(n_pos) OVER () AS BIGINT)"
            ).alias("cum_gains_ppm"),
            F.expr(
                "CAST(SUM(n_pos) OVER (ORDER BY decile"
                " ROWS UNBOUNDED PRECEDING) * SUM(n_events) OVER () * 1000"
                " DIV (SUM(n_events) OVER (ORDER BY decile"
                "      ROWS UNBOUNDED PRECEDING) * SUM(n_pos) OVER ())"
                " AS BIGINT)"
            ).alias("cum_lift_milli"),
        )
        .orderBy("decile")
    )


_LIFT_SQL = """
WITH ranked AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         ROW_NUMBER() OVER (ORDER BY -TRY_CAST(round(value * 100) AS BIGINT),
                            event_id) AS rank,
         COUNT(*) OVER () AS n
  FROM events
  WHERE value IS NOT NULL  -- scan-pushdown half of the predicate
    AND TRY_CAST(round(value * 100) AS BIGINT) IS NOT NULL
), deciles AS (
  SELECT (rank - 1) * 10 // n + 1 AS decile,
         COUNT(*) AS n_events, SUM(y) AS n_pos
  FROM ranked GROUP BY 1
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(SUM(n_pos) OVER (ORDER BY decile
            ROWS UNBOUNDED PRECEDING) * 1000000
            // SUM(n_pos) OVER () AS BIGINT) AS cum_gains_ppm,
       CAST(SUM(n_pos) OVER (ORDER BY decile
            ROWS UNBOUNDED PRECEDING) * SUM(n_events) OVER () * 1000
            // (SUM(n_events) OVER (ORDER BY decile
                ROWS UNBOUNDED PRECEDING) * SUM(n_pos) OVER ())
            AS BIGINT) AS cum_lift_milli
FROM deciles
ORDER BY decile
"""


QUERIES = {
    "dedup_minhash_calibration": dedup_minhash_calibration,
    "ml_lift_gains_table": ml_lift_gains_table,
}

ORACLE = {
    "dedup_minhash_calibration": _CALIB_DUCK,
    "ml_lift_gains_table": _LIFT_SQL,
}
