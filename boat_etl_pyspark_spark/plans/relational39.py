"""Round-5 batch 24 (relational part): data-contract auditing and
causal inference (SURVEY.md §2.4 validation / §2.9 aggregation
families; no reference counterpart).

  * ``validate_referential_integrity`` — foreign-key orphan audit
    across every relationship in the star schema: per FK, child
    count, orphan count (left-anti join against the parent key set)
    and orphan ppm. The reference's pandera checks validate single
    columns (SURVEY §2.4); this is the CROSS-TABLE contract a real
    warehouse ingest gate needs.
  * ``events_diff_in_diff`` — difference-in-differences estimate of
    the treatment effect on event value: users hash-split into
    treat/control arms, time split at the observed midpoint, the
    2x2 cell means and the DiD interaction from one conditional
    aggregate over exact milli-unit integer sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

# ---------------------------------------------------------------------------
# Referential-integrity audit
# ---------------------------------------------------------------------------

_RI_FKS = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def validate_referential_integrity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Orphan audit for all {n} FK relationships: each row is one FK
    with its child cardinality, orphan count and orphan ppm. Orphans
    come from a LEFT ANTI join of child keys against the
    deduplicated parent key set — Catalyst picks broadcast for the
    small parents (nation/region) and a shuffled hash join for the
    big ones, which is exactly the right split at 100 TB; only key
    columns are scanned (column pruning leaves the wide payload on
    disk). Each child table is scanned ONCE: all of its FK columns
    ride one pass through left joins against the deduplicated parent
    key sets, one wide aggregate counts rows + per-FK unmatched keys
    (a NULL FK matches nothing, so it counts as an orphan — the
    anti-join/NOT EXISTS rule), and ``stack`` unpivots the single
    wide row into one row per FK (guide §2.4: the per-FK
    count+anti-join form scanned lineitem six times and scheduled
    ~46 stage-jobs; this shape scans it once, ~1/3 the jobs). A
    healthy pipeline reports all zeros — the query is the gate that
    PROVES it, and its ppm column is the drift alarm when a
    late-arriving dimension breaks it.""".format(n=len(_RI_FKS))
    by_child: dict = {}
    for child, ck, parent, pk in _RI_FKS:
        by_child.setdefault(child, []).append((ck, parent, pk))
    parts = []
    for child, fks in by_child.items():
        j = load_table(spark, sf_dir, child).select(
            *[F.col(ck) for ck, _, _ in fks]
        )
        aggs = [F.count(F.lit(1)).alias("n_child")]
        stack_args = []
        for i, (ck, parent, pk) in enumerate(fks):
            p = (
                load_table(spark, sf_dir, parent)
                .select(F.col(pk).alias(f"__pk{i}"))
                .distinct()
            )
            j = j.join(p, F.col(ck) == F.col(f"__pk{i}"), "left")
            aggs.append(
                F.count(F.when(F.col(f"__pk{i}").isNull(), 1)).alias(
                    f"n_orph{i}"
                )
            )
            stack_args.append(
                f"'{child}.{ck}->{parent}.{pk}', n_orph{i}"
            )
        wide = j.agg(*aggs)
        parts.append(
            wide.select(
                F.expr(
                    f"stack({len(fks)}, {', '.join(stack_args)}) AS (fk, n_orphans)"
                ),
                "n_child",
            ).select(
                "fk",
                F.col("n_child").cast("bigint").alias("n_child"),
                F.col("n_orphans").cast("bigint").alias("n_orphans"),
                F.expr("n_orphans * 1000000 DIV n_child").alias(
                    "orphan_ppm"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.orderBy("fk")


def _ri_duck() -> str:
    rows = []
    for child, ck, parent, pk in _RI_FKS:
        rows.append(f"""SELECT '{child}.{ck}->{parent}.{pk}' AS fk,
       CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_child,
       CAST((SELECT COUNT(*) FROM {child} c
             WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                               WHERE p.{pk} = c.{ck})) AS BIGINT)
         AS n_orphans,
       CAST((SELECT COUNT(*) FROM {child} c
             WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                               WHERE p.{pk} = c.{ck})) * 1000000
            // (SELECT COUNT(*) FROM {child}) AS BIGINT) AS orphan_ppm""")
    return "\nUNION ALL ".join(rows) + "\nORDER BY fk"


# ---------------------------------------------------------------------------
# Difference-in-differences
# ---------------------------------------------------------------------------

# Shared core: identical SQL text in both engines modulo the table
# name, the epoch accessor and the integer-division spelling, so the
# float expression shapes (and therefore every IEEE operation) match.
_DID_CORE = """
WITH e AS (
  SELECT user_id % 2 AS treat, ({epoch_us}) AS u,
         TRY_CAST(floor(CASE WHEN value - value = 0 AND abs(value) < 9.0e15 THEN value * 1000 END) AS BIGINT) AS v
  FROM {events}
), span AS (
  SELECT MIN(u) + (MAX(u) - MIN(u)) {idiv} 2 AS mid FROM e
), cells AS (
  SELECT
    SUM(CASE WHEN treat = 1 AND u >= mid THEN 1 ELSE 0 END) AS n_tp,
    SUM(CASE WHEN treat = 1 AND u >= mid THEN v ELSE 0 END) AS s_tp,
    SUM(CASE WHEN treat = 1 AND u <  mid THEN 1 ELSE 0 END) AS n_t0,
    SUM(CASE WHEN treat = 1 AND u <  mid THEN v ELSE 0 END) AS s_t0,
    SUM(CASE WHEN treat = 0 AND u >= mid THEN 1 ELSE 0 END) AS n_cp,
    SUM(CASE WHEN treat = 0 AND u >= mid THEN v ELSE 0 END) AS s_cp,
    SUM(CASE WHEN treat = 0 AND u <  mid THEN 1 ELSE 0 END) AS n_c0,
    SUM(CASE WHEN treat = 0 AND u <  mid THEN v ELSE 0 END) AS s_c0
  FROM e, span
)
SELECT CAST(n_tp AS BIGINT) AS n_treat_post,
       CAST(n_t0 AS BIGINT) AS n_treat_pre,
       CAST(n_cp AS BIGINT) AS n_ctrl_post,
       CAST(n_c0 AS BIGINT) AS n_ctrl_pre,
       CAST(floor(s_tp / n_tp) AS BIGINT) AS mean_treat_post_milli,
       CAST(floor(s_t0 / n_t0) AS BIGINT) AS mean_treat_pre_milli,
       CAST(floor(s_cp / n_cp) AS BIGINT) AS mean_ctrl_post_milli,
       CAST(floor(s_c0 / n_c0) AS BIGINT) AS mean_ctrl_pre_milli,
       CAST(floor(((s_tp / n_tp - s_t0 / n_t0)
                   - (s_cp / n_cp - s_c0 / n_c0)) * 1000) AS BIGINT)
         AS did_micro
FROM cells
"""


def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: treat = odd user ids, post = second
    half of the observed time span (midpoint from a 1-row scalar
    aggregate, crossJoined — no collect). All eight 2x2 cell sums
    accumulate as exact milli-unit integers in ONE conditional
    aggregate pass; the four means and the DiD interaction are a
    fixed-shape float expression over those integers, identical SQL
    text in both engines (floor to milli/micro). The A/B lift query
    measures a marginal difference; DiD is the panel version that
    nets out time trends — the causal-measurement shape for feature
    launches. One scan, one 1-row broadcast, any scale."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r39_did_events"
    )
    return spark.sql(
        _DID_CORE.format(
            events="r39_did_events",
            epoch_us="unix_micros(ts)",
            idiv="DIV",
        )
    )


_DID_DUCK = _DID_CORE.format(
    events="events", epoch_us="epoch_us(ts)", idiv="//"
)


QUERIES = {
    "validate_referential_integrity": validate_referential_integrity,
    "events_diff_in_diff": events_diff_in_diff,
}

ORACLE = {
    "validate_referential_integrity": _ri_duck(),
    "events_diff_in_diff": _DID_DUCK,
}
