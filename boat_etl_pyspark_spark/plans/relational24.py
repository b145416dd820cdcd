"""Round-5 batch 6: nonparametric inference and binary-source audit
(SURVEY.md §2.9 aggregation / I-O families; no reference
counterpart).

  * ``agg_mann_whitney_u`` — Mann-Whitney U (Wilcoxon rank-sum) test
    between the hash-split A/B arms over purchase values, the
    nonparametric complement of ``agg_welch_ttest``. Midranks come
    from PER-VALUE aggregates (count per arm + a cumulative window
    over the distinct-value relation), so nothing ever ranks the raw
    rows: doubled rank-sums stay exact integers, and the normal
    approximation with tie correction is a fixed-shape double
    expression floored to milli units.
  * ``io_binary_manifest`` — a file-level integrity manifest of a
    written dataset via Spark's ``binaryFile`` source: per-file
    length and md5 over raw bytes, plus a read-back aggregate. File
    bytes are writer-dependent, so the oracle checks the
    data-content aggregate exactly and the manifest invariants as
    booleans (the same split contract as the compaction operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import cents
from ..sources.readers import load_table
from .io_plans import _tmp

# ---------------------------------------------------------------------------
# Mann-Whitney U
# ---------------------------------------------------------------------------

# Score-grid quantization knob — see relational30._SCORE_GRID_CENTS
# (the `_SPEAR_GRID_CENTS` pattern on the events-cents rank keys).
# 1 = exact cents, bit-identical default; coarser values rank on the
# grid, symmetrically in plan and oracle.
_SCORE_GRID_CENTS = 1

_MW_CORE = """
WITH vals AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END AS arm,
         TRY_CAST(round(value * 100) AS BIGINT) {idiv} {grid} AS v
  FROM {events}
  WHERE event_type = 'purchase'
    AND value IS NOT NULL  -- scan-pushdown half of the predicate
    AND TRY_CAST(round(value * 100) AS BIGINT) IS NOT NULL
    AND user_id IS NOT NULL
), pv AS (
  SELECT v,
         SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS c0,
         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS c1,
         COUNT(*) AS ct
  FROM vals GROUP BY v
), ranked AS (
  SELECT v, c0, c1, ct,
         coalesce(SUM(ct) OVER (ORDER BY v
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS before
  FROM pv
), sums AS (
  SELECT SUM(c0) AS n0, SUM(c1) AS n1,
         -- doubled midrank sum for arm 0: sum c0 * (2*min_rank + ct - 1)
         SUM(c0 * (2 * (before + 1) + ct - 1)) AS r0x2,
         SUM(CAST(ct AS {big}) * ct * ct - ct) AS tie3
  FROM ranked
)
SELECT CAST(n0 AS BIGINT) AS n_a,
       CAST(n1 AS BIGINT) AS n_b,
       CAST(r0x2 AS BIGINT) AS rank_sum_a_x2,
       CAST(r0x2 - n0 * (n0 + 1) AS BIGINT) AS u_a_x2,
       CAST(floor((CAST(r0x2 - n0 * (n0 + 1) AS DOUBLE) / 2
                   - CAST(n0 AS DOUBLE) * n1 / 2)
                  / sqrt(CAST(n0 AS DOUBLE) * n1 / 12
                         * ((n0 + n1 + 1)
                            - CAST(tie3 AS DOUBLE)
                              / ((n0 + n1) * (n0 + n1 - 1))))
                  * 1000) AS BIGINT) AS z_milli
FROM sums
"""


def agg_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-sum test without ranking rows: per-value counts + one
    cumulative window over DISTINCT values give exact integer doubled
    midrank sums (ties averaged by construction); U and the
    tie-corrected z are closed-form expressions over those integers.
    The fact table contributes one map-combined aggregate; the window
    relation is bounded by value cardinality, and a pathological
    cardinality would swap in the ``global_rank`` primitive unchanged."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r24_mw_events"
    )
    return spark.sql(
        _MW_CORE.format(events="r24_mw_events", big="DECIMAL(38,0)",
                        idiv="DIV", grid=_SCORE_GRID_CENTS)
    )


_MW_DUCK = _MW_CORE.format(events="events", big="HUGEINT", idiv="//",
                           grid=_SCORE_GRID_CENTS)


# ---------------------------------------------------------------------------
# Binary-file manifest audit
# ---------------------------------------------------------------------------

_MANIFEST_FILES = 4


def io_binary_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders as {n} parquet files, then audit the dataset at
    BOTH levels: (a) the file level through the ``binaryFile`` source
    — per-file byte length and md5 over raw content, the manifest a
    replication checker ships; (b) the data level through a read-back
    aggregate the oracle reproduces exactly from the original table.
    File bytes are writer-dependent, so the file-level facts fold
    into booleans (count matches, every file hashed and non-empty)
    rather than values the oracle cannot know — the established
    contract for filesystem facts."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        cents(F.col("o_totalprice")).alias("pc"),
    )
    out = _tmp("manifest", sf_dir)
    orders.repartition(_MANIFEST_FILES).write.mode("overwrite").parquet(out)
    manifest = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(out)
        .select(
            F.col("path"),
            F.col("length"),
            F.md5(F.col("content")).alias("file_md5"),
        )
    )
    mrow = manifest.agg(
        F.count("*").alias("n_files"),
        F.min("length").alias("min_len"),
        F.count(F.when(F.length("file_md5") == 32, 1)).alias("n_hashed"),
    ).collect()[0]  # bounded: one row about <= n files
    # Exact file-count claim (round-6 ADVICE tightened this from the
    # former "1 <= n_files <= requested" tolerance): a round-robin
    # repartition(k) of n rows from this fixture's single-input-
    # partition layout lands EXACTLY min(k, n) non-empty files, plus
    # at most ONE zero-row schema-only file (Spark always materializes
    # write partition 0 to preserve the schema). Per-file row counts
    # come from the written parquet footers — driver-side metadata, no
    # extra Spark scan — so the boolean is a measured fact at every
    # scale instead of a wide tolerance.
    import os as _os

    import pyarrow.parquet as _papq

    file_rows = [
        _papq.read_metadata(_os.path.join(out, f)).num_rows
        for f in _os.listdir(out)
        if f.endswith(".parquet")
    ]
    total_rows = sum(file_rows)
    n_nonempty = sum(1 for r in file_rows if r > 0)
    n_empty = len(file_rows) - n_nonempty
    back = spark.read.parquet(out)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum("pc").alias("revenue_cents"),
        F.lit(
            bool(
                n_nonempty == min(_MANIFEST_FILES, total_rows)
                and n_empty <= 1
                and mrow.n_hashed == mrow.n_files
                and (mrow.min_len or 0) > 0
            )
        ).alias("manifest_ok"),
    )


_MANIFEST_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(TRY_CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       TRUE AS manifest_ok
FROM orders
GROUP BY 1
"""


QUERIES = {
    "agg_mann_whitney_u": agg_mann_whitney_u,
    "io_binary_manifest": io_binary_manifest,
}

ORACLE = {
    "agg_mann_whitney_u": _MW_DUCK,
    "io_binary_manifest": _MANIFEST_SQL,
}
