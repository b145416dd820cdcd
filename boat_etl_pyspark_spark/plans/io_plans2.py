"""Round-4 batch 2a: warehouse I/O lifecycle operators.

  * ``io_orc_roundtrip`` — ORC source/sink round-trip (Spark's other
    first-class columnar format): write a decorated orders slice to
    ORC, read it back, aggregate. The oracle aggregates the ORIGINAL
    parquet, so a hash match proves the ORC write+read is lossless
    (DuckDB cannot read ORC — it never has to).
  * ``io_small_file_compaction`` — the small-files problem and its
    fix as one checked operator: a fragmented write (many tiny files)
    is compacted by an explicit repartition to the target file count,
    and the query proves (a) the data survived bit-exactly (oracle
    aggregate) and (b) the file count actually dropped (boolean
    column, like the HLL error-envelope pattern). At 100 TB
    compaction is routine table maintenance — a NameNode/listing cost
    problem long before it is a scan cost problem.
  * ``io_snapshot_diff`` — diff two table snapshots by primary key
    (added / removed / changed / unchanged, with row counts and value
    sums per class) via one full-outer join on the key — the
    mergeable audit primitive behind CDC reconciliation and
    replication checks. Snapshots are derived deterministically from
    the fixture so the oracle reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import cents
from ..sources.readers import load_table
from .io_plans import _tmp

# ---------------------------------------------------------------------------
# ORC round-trip
# ---------------------------------------------------------------------------


def io_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders → ORC (zlib) → read back → aggregate per priority. The
    aggregate runs on the READ-BACK copy; the oracle reads the
    original parquet — a match proves losslessness through the format
    boundary, including dates and doubles."""
    orders = load_table(spark, sf_dir, "orders")
    out = _tmp("orc", sf_dir)
    orders.write.mode("overwrite").option("compression", "zlib").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(cents(F.col("o_totalprice"))).alias("revenue_cents"),
        F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("first_date"),
        F.max(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("last_date"),
    )


_ORC_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(TRY_CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_date,
       strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_date
FROM orders
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Small-file compaction
# ---------------------------------------------------------------------------

_FRAGMENT_FILES = 64
_TARGET_FILES = 4

#: Below this many rows a parquet file is fixed overhead, not payload,
#: and codec-size comparisons are undefined (NULL) rather than true.
_MIN_MEANINGFUL_ROWS = 512


def io_small_file_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write lineitem fragmented into 64 tiny files (the shape a
    too-parallel or per-trigger streaming writer produces), compact to
    4 via an explicit repartition, and verify BOTH that the compacted
    copy holds exactly the original data (oracle aggregate) and that
    the file count dropped (booleans — file counts are filesystem
    facts the oracle cannot see). ``repartition(n)`` is the compactor
    because it round-robins rows evenly — ``coalesce(n)`` merges
    unevenly and can leave the skew it was meant to fix."""
    import os

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        cents(F.col("l_extendedprice")).alias("price_cents"),
    )
    frag = _tmp("frag", sf_dir)
    li.repartition(_FRAGMENT_FILES).write.mode("overwrite").parquet(frag)
    compacted = _tmp("compact", sf_dir)
    (
        spark.read.parquet(frag)
        .repartition(_TARGET_FILES)
        .write.mode("overwrite")
        .parquet(compacted)
    )

    def n_files(path: str) -> int:
        return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))

    nf_frag, nf_comp = n_files(frag), n_files(compacted)
    back = spark.read.parquet(compacted)
    # Three-state fact (round-6 ADVICE): when the fragment step itself
    # produced <= _TARGET_FILES files (degenerate input — Spark skips
    # empty write partitions) there was nothing to compact, so the
    # claim "compaction reduced the file count" is UNDEFINED, not
    # vacuously true: emit NULL. Above that threshold the boolean is
    # the real measured comparison, so a compactor regression turns
    # the driver row red instead of being absorbed by a hardcoded
    # TRUE. The oracle mirrors the regime switch through the row
    # count: nf_frag = min(64, n_rows) for a single-input-partition
    # fixture, so nf_frag <= 4 iff n_rows <= 4.
    files_reduced = None if nf_frag <= _TARGET_FILES else nf_comp < nf_frag
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.sum("price_cents").alias("price_cents"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    ).select(
        "*",
        F.lit(files_reduced).cast("boolean").alias("files_reduced"),
        F.lit(nf_comp <= _TARGET_FILES).alias("at_target_file_count"),
    )


_COMPACTION_SQL = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(TRY_CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       CASE WHEN (SELECT COUNT(*) FROM lineitem) <= 4 THEN NULL
            ELSE TRUE END AS files_reduced,
       TRUE AS at_target_file_count
FROM lineitem
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Snapshot diff (CDC reconciliation shape)
# ---------------------------------------------------------------------------

_SNAP_A_TO = "1997-01-01"
_SNAP_B_FROM = "1993-01-01"
_SNAP_B_TO = "1998-01-01"


def io_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-level diff between two deterministic snapshots of orders:
    snapshot A holds orders before 1997 at original prices; snapshot B
    holds 1993–1997 orders (older ones purged) plus 1997 arrivals,
    with every 7th order's price bumped 5 dollars (simulated updates).
    One full-outer join on the key classifies every row as added /
    removed / changed / unchanged; the output is the per-class count
    and value sum — the reconciliation report a CDC pipeline emits.
    At 100 TB both sides shuffle once on the key and the report is
    four rows."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate",
        cents(F.col("o_totalprice")).alias("price_cents"),
    )
    snap_a = orders.where(
        F.col("o_orderdate") < F.lit(_SNAP_A_TO).cast("date")
    ).select("o_orderkey", F.col("price_cents").alias("a_cents"))
    snap_b = (
        orders.where(
            (F.col("o_orderdate") >= F.lit(_SNAP_B_FROM).cast("date"))
            & (F.col("o_orderdate") < F.lit(_SNAP_B_TO).cast("date"))
        )
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 7 == 0,
                   F.col("price_cents") + F.lit(500))
            .otherwise(F.col("price_cents"))
            .alias("b_cents"),
        )
    )
    diff = snap_a.join(snap_b, "o_orderkey", "full_outer").select(
        F.when(F.col("a_cents").isNull(), F.lit("added"))
        .when(F.col("b_cents").isNull(), F.lit("removed"))
        .when(F.col("a_cents") != F.col("b_cents"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change_class"),
        F.coalesce("a_cents", F.lit(0)).alias("a_cents"),
        F.coalesce("b_cents", F.lit(0)).alias("b_cents"),
    )
    return diff.groupBy("change_class").agg(
        F.count("*").alias("n_keys"),
        F.sum("a_cents").alias("a_total_cents"),
        F.sum("b_cents").alias("b_total_cents"),
    )


_SNAPSHOT_DIFF_SQL = f"""
WITH o AS (
  SELECT o_orderkey, o_orderdate,
         TRY_CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
), a AS (
  SELECT o_orderkey, price_cents AS a_cents FROM o
  WHERE o_orderdate < DATE '{_SNAP_A_TO}'
), b AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN price_cents + 500
              ELSE price_cents END AS b_cents
  FROM o
  WHERE o_orderdate >= DATE '{_SNAP_B_FROM}'
    AND o_orderdate < DATE '{_SNAP_B_TO}'
)
SELECT CASE WHEN a_cents IS NULL THEN 'added'
            WHEN b_cents IS NULL THEN 'removed'
            WHEN a_cents <> b_cents THEN 'changed'
            ELSE 'unchanged' END AS change_class,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(COALESCE(a_cents, 0)) AS BIGINT) AS a_total_cents,
       CAST(SUM(COALESCE(b_cents, 0)) AS BIGINT) AS b_total_cents
FROM a FULL OUTER JOIN b USING (o_orderkey)
GROUP BY 1
"""


def io_codec_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet codec choice as a checked operator: the same orders
    slice is written under zstd and snappy, read back, and aggregated
    per codec — the aggregate must be identical (codecs are lossless)
    and zstd must actually produce the smaller files (boolean column,
    the io_small_file_compaction evidence pattern; zstd measured ~3x
    smaller on this data). At 100 TB the codec is a first-order knob:
    zstd trades CPU for ~30-60% less I/O and storage, snappy the
    reverse — the right answer depends on whether scans are CPU- or
    I/O-bound, so the operator keeps both paths exercised."""
    import os

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    sizes = {}
    paths = {}
    frames = []
    for codec in ("snappy", "zstd"):
        path = _tmp(f"codec_{codec}", sf_dir)
        paths[codec] = path
        orders.write.mode("overwrite").option("compression", codec).parquet(
            path
        )
        sizes[codec] = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        frames.append(
            spark.read.parquet(path)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(cents(F.col("o_totalprice"))).alias("revenue_cents"),
            )
            .withColumn("codec", F.lit(codec))
        )
    # Three-state fact (round-6 ADVICE): below a few hundred rows the
    # file is mostly fixed-size footer/header overhead and "zstd packs
    # tighter" is UNDEFINED — emit NULL rather than a vacuous TRUE. At
    # and above the threshold the column is the real byte comparison,
    # so a codec regression (zstd NOT smaller) turns the driver row
    # red. The row count comes from the written files' parquet footers
    # (driver-side metadata, no extra Spark scan) so the oracle can
    # mirror the regime switch with COUNT(*) — measured: 512 rows of
    # this 3-column slice is ~10+ KiB under snappy, far past overhead
    # dominance, and zstd is ~3x smaller at every driver scale.
    import pyarrow.parquet as papq

    total_rows = sum(
        papq.read_metadata(os.path.join(paths["snappy"], f)).num_rows
        for f in os.listdir(paths["snappy"])
        if f.endswith(".parquet")
    )
    zstd_smaller = (
        None
        if total_rows < _MIN_MEANINGFUL_ROWS
        else sizes["zstd"] < sizes["snappy"]
    )
    snappy_smaller = (
        None
        if total_rows < _MIN_MEANINGFUL_ROWS
        else sizes["snappy"] < sizes["zstd"]
    )
    return (
        frames[0].unionByName(frames[1])
        .select(
            "codec",
            "o_orderpriority",
            F.col("n_orders").cast("bigint").alias("n_orders"),
            F.col("revenue_cents").cast("bigint").alias("revenue_cents"),
            F.when(F.col("codec") == "zstd",
                   F.lit(zstd_smaller).cast("boolean"))
            .otherwise(F.lit(snappy_smaller).cast("boolean"))
            .alias("smaller_file"),
        )
        .orderBy("codec", "o_orderpriority")
    )


_CODEC_SQL = """
SELECT c.codec,
       o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(TRY_CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       CASE WHEN (SELECT COUNT(*) FROM orders) < 512 THEN NULL
            ELSE c.codec = 'zstd' END AS smaller_file
FROM orders CROSS JOIN (VALUES ('snappy'), ('zstd')) AS c(codec)
GROUP BY c.codec, o_orderpriority
ORDER BY c.codec, o_orderpriority
"""


QUERIES = {
    "io_orc_roundtrip": io_orc_roundtrip,
    "io_small_file_compaction": io_small_file_compaction,
    "io_snapshot_diff": io_snapshot_diff,
    "io_codec_tradeoff": io_codec_tradeoff,
}

ORACLE = {
    "io_orc_roundtrip": _ORC_SQL,
    "io_small_file_compaction": _COMPACTION_SQL,
    "io_snapshot_diff": _SNAPSHOT_DIFF_SQL,
    "io_codec_tradeoff": _CODEC_SQL,
}
