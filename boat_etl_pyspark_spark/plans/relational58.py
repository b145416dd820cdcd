"""Round-5 batch 45: hash-budget validation and label-balance audit
(SURVEY.md §2.9 validation/ml families; no reference counterpart).

  * ``validate_hash_collision_budget`` — measures the 48-bit gram
    fingerprint space this repo's dedup/overlap operators rely on:
    observed md5-prefix collisions (distinct grams whose 48-bit
    prefixes collide) next to the birthday-bound expectation
    n(n−1)/2^49.  The documented collision contract becomes
    measured data instead of a docstring claim.
  * ``ml_class_balance_audit`` — per-label counts, the
    max/min imbalance ratio and the normalized label entropy of the
    embedding corpus: the three numbers a training-set card reports
    before anyone trusts per-class metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table

# ---------------------------------------------------------------------------
# Hash collision budget
# ---------------------------------------------------------------------------

_HCB_SHINGLE = 5

_HCB_CORE = """
WITH grams AS (
  SELECT DISTINCT gram FROM {grams}
), hashed AS (
  SELECT gram, {hexint} AS h FROM grams
), s AS (
  SELECT COUNT(*) AS n_grams, COUNT(DISTINCT h) AS n_hashes
  FROM hashed
)
SELECT CAST(n_grams AS BIGINT) AS n_distinct_grams,
       CAST(n_hashes AS BIGINT) AS n_distinct_hashes,
       CAST(n_grams - n_hashes AS BIGINT) AS observed_collisions,
       CAST((CAST(n_grams AS DECIMAL(38,0)) * (n_grams - 1) * 1000000
             - (CAST(n_grams AS DECIMAL(38,0)) * (n_grams - 1) * 1000000)
               % 562949953421312)
            / 562949953421312 AS BIGINT)
         AS expected_collisions_micro
FROM s
"""


def validate_hash_collision_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measures the 48-bit md5-prefix fingerprint space that
    `curate_source_overlap_matrix` and the dedup fingerprints rely
    on: distinct 5-token shingles vs distinct 48-bit prefixes, so
    `observed_collisions` is exact data, next to the birthday bound
    E ≈ n(n−1)/2^49 (expected_collisions_micro divides by
    2^49/2^20 ≈ 5.6e8 — an exact integer scaling that keeps the
    whole audit in int64 at any corpus the 48-bit space is sane
    for).  One distinct-gram shuffle, then counters — the audit
    that turns the documented collision contract into measured
    evidence, and the query to re-run before trusting the budget on
    a 100 TB corpus."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "r58_hcb_docs"
    )
    spark.sql(
        f"""
        SELECT concat_ws(' ', slice(t, i, {_HCB_SHINGLE})) AS gram
        FROM (SELECT filter(split(text, ' '), x -> x != '') AS t
              FROM r58_hcb_docs)
        LATERAL VIEW explode(sequence(1, size(t) - {_HCB_SHINGLE} + 1))
          e AS i
        WHERE size(t) >= {_HCB_SHINGLE}
        """
    ).createOrReplaceTempView("r58_hcb_grams")
    return spark.sql(
        _HCB_CORE.format(
            grams="r58_hcb_grams",
            hexint=(
                "CAST(conv(substring(md5(gram), 1, 12), 16, 10) AS BIGINT)"
            ),
            idiv="DIV",
        )
    )


_HCB_DUCK = _HCB_CORE.format(
    grams=(
        f"""(
  SELECT array_to_string(list_slice(t, i, i + {_HCB_SHINGLE} - 1), ' ')
           AS gram
  FROM (SELECT list_filter(string_split(text, ' '), x -> x != '') AS t
        FROM documents),
       UNNEST(range(1, 1200)) AS u(i)
  WHERE i <= len(t) - {_HCB_SHINGLE} + 1
)"""
    ),
    hexint=(
        "CAST(concat('0x', substring(md5(gram), 1, 12)) AS BIGINT)"
    ),
    idiv="//",
)

# ---------------------------------------------------------------------------
# Class balance audit
# ---------------------------------------------------------------------------

_BALANCE_CORE = """
WITH c AS (
  SELECT label, COUNT(*) AS n FROM {emb} GROUP BY label
), s AS (
  SELECT COUNT(*) AS k, SUM(n) AS nn, MAX(n) AS nmax, MIN(n) AS nmin,
         SUM(CAST(floor(n * ln(CAST(tot AS DOUBLE) / n)
                        * 1000000) AS BIGINT)) AS h_num
  FROM (SELECT label, n, SUM(n) OVER () AS tot FROM c)
)
SELECT CAST(k AS BIGINT) AS n_classes,
       CAST(nn AS BIGINT) AS n_examples,
       CAST(nmax AS BIGINT) AS n_largest,
       CAST(nmin AS BIGINT) AS n_smallest,
       CAST(1000 * nmax {idiv} nmin AS BIGINT) AS imbalance_ratio_milli,
       CAST(h_num {idiv} nn AS BIGINT) AS label_entropy_micro_nats,
       CAST(floor(CAST(h_num {idiv} nn AS DOUBLE) * 1000000
                  / CAST(floor(ln(CAST(k AS DOUBLE)) * 1000000) AS DOUBLE))
            AS BIGINT) AS balance_ppm
FROM s
"""


def ml_class_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-balance audit of the embedding corpus: per-class
    extremes, the max/min imbalance ratio (milli), the label
    entropy (per-class terms are one ln of an exact rational,
    floored to micro-nats before the integer sum) and the
    normalized balance H/ln(k) in ppm — 1e6 means perfectly
    balanced classes.  One label groupBy; everything after is
    class-count-sized."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "r58_bal_emb"
    )
    return spark.sql(
        _BALANCE_CORE.format(emb="r58_bal_emb", idiv="DIV", fdiv="/")
    )


_BALANCE_DUCK = _BALANCE_CORE.format(emb="embeddings", idiv="//", fdiv="/")


QUERIES = {
    "validate_hash_collision_budget": validate_hash_collision_budget,
    "ml_class_balance_audit": ml_class_balance_audit,
}

ORACLE = {
    "validate_hash_collision_budget": _HCB_DUCK,
    "ml_class_balance_audit": _BALANCE_DUCK,
}
