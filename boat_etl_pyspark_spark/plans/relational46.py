"""Round-5 batch 33: experiment-health and resampling inference plus
a graph mixing metric (SURVEY.md §2.9 events/aggregation/graph
families; no reference counterpart).

  * ``events_ab_srm_check`` — Sample Ratio Mismatch: the first thing
    a trustworthy experimentation platform checks. Chi-square of the
    observed user split against the declared 50/50 assignment, one
    distinct-user scan, milli-scaled integer statistic with the
    alpha = 0.05 critical value as a flag.
  * ``agg_permutation_test_lift`` — a permutation test for the A/B
    value lift with 64 DETERMINISTIC pseudo-assignments derived from
    md5(user, perm) instead of an RNG: every engine, rerun and
    partitioning sees the same permutations, so the p-value is an
    exact, reproducible number. Resampling inference without leaving
    the engine.
  * ``graph_degree_assortativity`` — Newman's degree assortativity
    of the co-purchase graph: do popular parts co-sell with popular
    parts? Pearson correlation over directed edge endpoints from
    exact DECIMAL power sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

# ---------------------------------------------------------------------------
# Sample Ratio Mismatch
# ---------------------------------------------------------------------------

_SRM_CRIT_MILLI = 3841  # chi2(1 dof) at alpha = 0.05, milli-scaled

_SRM_CORE = f"""
WITH u AS (
  SELECT DISTINCT user_id FROM {{events}}
), s AS (
  SELECT SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n0,
         SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n1
  FROM u
)
SELECT CAST(n0 AS BIGINT) AS n_control,
       CAST(n1 AS BIGINT) AS n_treat,
       CAST((n0 - n1) * (n0 - n1) * 1000 {{idiv}} (n0 + n1) AS BIGINT)
         AS chi2_milli,
       ((n0 - n1) * (n0 - n1) * 1000 {{idiv}} (n0 + n1))
         > {_SRM_CRIT_MILLI} AS srm_detected
FROM s
"""


def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample Ratio Mismatch gate for the hash-assigned experiment
    arms: chi-square of the distinct-user split against 50/50, exact
    integer milli arithmetic ((n0-n1)^2/(n0+n1) needs no expected-
    count floats when the design ratio is 1:1). An SRM flag
    invalidates every downstream lift number, which is why this scan
    runs BEFORE `events_ab_test_lift` in any honest readout. One
    distinct aggregate; scales as a user-keyed count."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r46_srm_events"
    )
    return spark.sql(_SRM_CORE.format(events="r46_srm_events", idiv="DIV"))


_SRM_DUCK = _SRM_CORE.format(events="events", idiv="//")

# ---------------------------------------------------------------------------
# Permutation test
# ---------------------------------------------------------------------------

_PERM_K = 64

_PERM_CORE = f"""
WITH per_user AS (
  SELECT user_id, SUM(v) AS sv, COUNT(*) AS c
  FROM (SELECT user_id, TRY_CAST(floor(CASE WHEN value - value = 0 AND abs(value) < 9.0e15 THEN value * 1000 END) AS BIGINT) AS v
        FROM {{events}}
        -- the md5 pseudo-assignment needs an identity: Spark's concat
        -- nulls out on a NULL user_id where DuckDB's skips it
        WHERE user_id IS NOT NULL)
  GROUP BY user_id
), obs AS (
  SELECT CAST(floor((CAST(SUM(CASE WHEN user_id % 2 = 1 THEN sv END)
                          AS DOUBLE)
                     / SUM(CASE WHEN user_id % 2 = 1 THEN c END)
                     - CAST(SUM(CASE WHEN user_id % 2 = 0 THEN sv END)
                            AS DOUBLE)
                       / SUM(CASE WHEN user_id % 2 = 0 THEN c END))
                    * 1000) AS BIGINT) AS lift_micro
  FROM per_user
), perm AS (
  SELECT p,
         CAST(floor((CAST(SUM(CASE WHEN arm = 1 THEN sv END) AS DOUBLE)
                     / SUM(CASE WHEN arm = 1 THEN c END)
                     - CAST(SUM(CASE WHEN arm = 0 THEN sv END) AS DOUBLE)
                       / SUM(CASE WHEN arm = 0 THEN c END))
                    * 1000) AS BIGINT) AS lift_micro
  FROM (
    SELECT e.p, pu.sv, pu.c,
           {{hexint}} % 2 AS arm
    FROM per_user pu {{explode}}
  )
  GROUP BY p
)
SELECT o.lift_micro AS observed_lift_micro,
       CAST({_PERM_K} AS BIGINT) AS n_perms,
       CAST(SUM(CASE WHEN ABS(perm.lift_micro) >= ABS(o.lift_micro)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_as_extreme,
       CAST((1 + SUM(CASE WHEN ABS(perm.lift_micro)
                               >= ABS(o.lift_micro)
                     THEN 1 ELSE 0 END)) * 1000000
            {{idiv}} ({_PERM_K} + 1) AS BIGINT) AS p_value_ppm
FROM perm CROSS JOIN obs o
GROUP BY o.lift_micro
"""

_PERM_HEX_SPARK = (
    "CAST(conv(substring(md5(concat(CAST(pu.user_id AS STRING), ':',"
    " CAST(e.p AS STRING))), 1, 12), 16, 10) AS BIGINT)"
)
_PERM_HEX_DUCK = (
    "CAST(concat('0x', substring(md5(CAST(pu.user_id AS VARCHAR)"
    " || ':' || CAST(e.p AS VARCHAR)), 1, 12)) AS BIGINT)"
)


def agg_permutation_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided permutation test for the arm lift in mean event
    value: 64 deterministic pseudo-assignments (md5 of user and
    permutation index — no RNG, so the p-value is bit-reproducible),
    p = (1 + #as-extreme) / (K + 1). User-level assignment means the
    metric depends only on per-user (sum, count) — so the corpus
    pre-aggregates to ONE row per user BEFORE the 64x explode: the
    md5 work is users x 64, not events x 64 (measured 4.9s -> 0.8s
    at sf0.1), and the per-permutation partials
    combine map-side. That reduction — resample the SUFFICIENT
    STATISTICS, not the rows — is what makes permutation inference
    viable at 100 TB. Per-arm means are fixed-shape doubles over
    exact integer sums, micro-floored before comparison."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r46_perm_events"
    )
    return spark.sql(
        _PERM_CORE.format(
            events="r46_perm_events",
            hexint=_PERM_HEX_SPARK,
            explode=(
                f"LATERAL VIEW explode(sequence(0, {_PERM_K} - 1)) e AS p"
            ),
            idiv="DIV",
        )
    )


_PERM_DUCK = _PERM_CORE.format(
    events="events",
    hexint=_PERM_HEX_DUCK,
    explode=f"CROSS JOIN (SELECT unnest(range({_PERM_K})) AS p) e",
    idiv="//",
)

# ---------------------------------------------------------------------------
# Degree assortativity
# ---------------------------------------------------------------------------

_ASSORT_DEG_SQL = """
  SELECT p, COUNT(*) AS d FROM (
    SELECT pa AS p FROM {pairs} UNION ALL SELECT pb AS p FROM {pairs}
  ) GROUP BY p
"""

# The symmetrized (both-directions) power sums are folded
# algebraically into ONE pass over the directed edge list:
# sx_both = Σx+Σy, sxy_both = 2Σxy, sxx_both = syy_both = Σx²+Σy²,
# m = 2·|edges| — integer-identical to materializing the reversed
# copy, without re-deriving the two degree joins a second time.
_ASSORT_CORE = """
WITH edges AS (
  SELECT /*+ BROADCAST(da), BROADCAST(db) */ da.d AS x, db.d AS y
  FROM {pairs} pr
  JOIN {deg} da ON da.p = pr.pa
  JOIN {deg} db ON db.p = pr.pb
), s AS (
  SELECT 2 * COUNT(*) AS m,
         SUM(x) + SUM(y) AS sx,
         SUM(x) + SUM(y) AS sy,
         2 * SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
         SUM(CAST(x AS DECIMAL(38,0)) * x)
           + SUM(CAST(y AS DECIMAL(38,0)) * y) AS sxx,
         SUM(CAST(x AS DECIMAL(38,0)) * x)
           + SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
  FROM edges
)
SELECT CAST((SELECT COUNT(*) FROM {deg}) AS BIGINT) AS n_nodes,
       CAST(m / 2 AS BIGINT) AS n_edges,
       CAST(floor((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                  * 1000000) AS BIGINT) AS assortativity_micro
FROM s
"""


def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part co-purchase graph (Pearson r
    of endpoint degrees over directed edges; negative = hubs connect
    to leaves, the typical retail shape). Candidate edges come from
    the basket-bounded order self-join over the persisted DISTINCT
    incidence relation (the `graph_copurchase_similarity` shape);
    degrees and the five power sums are exact integers
    (DECIMAL(38,0) for the products), the coefficient one fixed-
    shape float. Everything after the pair groupBy is edge-sized;
    the edge list itself is the session-shared `copurchase_pairs`
    cache (one build serves similarity, assortativity and k-core),
    and the node-sized degree relation is persisted so the two
    degree joins (and the node count) read one computation — the
    both-directions sums fold algebraically into a single pass over
    the directed edges (see ``_ASSORT_CORE``)."""
    from . import track_persist
    from .relational42 import copurchase_pairs

    copurchase_pairs(spark, sf_dir).createOrReplaceTempView(
        "r46_assort_pairs"
    )
    track_persist(
        spark.sql(_ASSORT_DEG_SQL.format(pairs="r46_assort_pairs"))
    ).createOrReplaceTempView("r46_assort_deg")
    return spark.sql(
        _ASSORT_CORE.format(pairs="r46_assort_pairs", deg="r46_assort_deg")
    )


_ASSORT_DUCK = (
    """
WITH assort_pairs AS (
  SELECT a.p AS pa, b.p AS pb
  FROM (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem) b
    ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
), assort_deg AS (
"""
    + _ASSORT_DEG_SQL.format(pairs="assort_pairs")
    + ")"
    + _ASSORT_CORE.replace("WITH edges AS (", ", edges AS (", 1).format(
        pairs="assort_pairs", deg="assort_deg"
    )
)


QUERIES = {
    "events_ab_srm_check": events_ab_srm_check,
    "agg_permutation_test_lift": agg_permutation_test_lift,
    "graph_degree_assortativity": graph_degree_assortativity,
}

ORACLE = {
    "events_ab_srm_check": _SRM_DUCK,
    "agg_permutation_test_lift": _PERM_DUCK,
    "graph_degree_assortativity": _ASSORT_DUCK,
}
