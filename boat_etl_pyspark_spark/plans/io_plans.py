"""Source/sink round-trips as driver-checked queries.

The write side of the engine (SURVEY.md §2.7) so far lived only in
pytest (tests/test_sinks.py); these queries put it under the DuckDB
CORRECTNESS gate. Each query writes a fixture table out through a
format, reads it back, and aggregates the read-back copy; the oracle
aggregates the ORIGINAL parquet — so a hash match proves the format
round-trip was lossless, not merely that the aggregate is right.

- ``io_csv_roundtrip``: the document text is first DECORATED with a
  quote, a comma, and an embedded newline so the CSV writer is forced
  to quote/escape and the reader to reassemble multi-line records
  (RFC-4180 doubled quotes via ``escape='"'``; ``multiLine`` scan on
  read). The fixture text is CSV-benign, so without the decoration
  this would prove nothing.
- ``io_json_roundtrip``: JSON-lines with an explicit read schema and a
  pinned microsecond timestamp format (the default format truncates to
  millis — a silent-corruption trap at any scale).
- ``io_partitioned_scan``: writes events partitioned by
  ``event_type``, reads back ONE partition and aggregates it. The
  predicate lands in ``PartitionFilters`` (audited in
  tests/test_io_plans.py) — at 100 TB this is the difference between
  listing one directory and scanning the table.

Temp outputs go under the system temp dir keyed by the sf dir (same
convention as the streaming checkpoints, streaming/events.py:61) and
are rewritten per run with ``mode("overwrite")``.
"""

from __future__ import annotations

import itertools
import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.numeric import cents, money_sum
from ..sources.readers import load_table
from .contract import TEXT_VALID_DUCK, text_valid


_TMP_SEQ = itertools.count()
_TMP_PREV: dict[str, str] = {}


def _tmp(kind: str, sf_dir: str) -> str:
    """Per-invocation unique output dir. The path embeds the pid and a
    process-local counter so two concurrent executions of the same
    query (e.g. a bench run racing a correctness run) can never
    overwrite / rmtree each other's output between write and read-back.
    The PREVIOUS dir for the same (kind, sf_dir) in this process is
    removed lazily on the next call — it can't be removed eagerly
    because the returned DataFrame reads the files only when the caller
    finally executes it."""
    key = re.sub(r"\W+", "_", sf_dir.strip("/"))
    slot = f"{kind}_{key}"
    prev = _TMP_PREV.pop(slot, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    from ..streaming.events import scratch_dir

    path = os.path.join(
        scratch_dir(),
        f"spark_graft_io_{slot}_{os.getpid()}_{next(_TMP_SEQ)}",
    )
    _TMP_PREV[slot] = path
    return path


# --- CSV ------------------------------------------------------------------

# Forces quoting (comma), escaping (double quote), and multi-line
# record reassembly (newline) through the round-trip. The newline is
# NOT the final character: univocity's multiLine parser swallows a
# field-trailing newline that abuts the closing quote + record
# terminator (verified empirically), which is a writer/reader asymmetry
# we document rather than fight — real corpora are decorated
# mid-field here exactly so the check still proves newline handling.
_DECORATION = '",\n|'

_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def io_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # text char-class validity (contract.text_valid, symmetric with
    # the oracle): a NUL byte desyncs univocity's multiLine record
    # reassembly (round-8 probe: 5-char drift on the NUL document)
    docs = load_table(spark, sf_dir, "documents").where(text_valid()).withColumn(
        "text", F.concat(F.col("text"), F.lit(_DECORATION))
    )
    out = _tmp("csv", sf_dir)
    (
        docs.write.mode("overwrite")
        .options(header=True, quote='"', escape='"')
        .csv(out)
    )
    back = (
        spark.read.schema(_DOC_SCHEMA)
        .options(header=True, quote='"', escape='"', multiLine=True)
        .csv(out)
    )
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("sum_chars"),
        F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
        F.sum("n_chars").alias("sum_n_chars"),
    )


_CSV_SQL = f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(LENGTH(text || '",' || chr(10) || '|')) AS BIGINT) AS sum_chars,
       CAST(COUNT(DISTINCT md5(text || '",' || chr(10) || '|')) AS BIGINT) AS n_distinct_texts,
       CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
FROM documents
WHERE {TEXT_VALID_DUCK}
GROUP BY lang
"""

# --- JSON -----------------------------------------------------------------

_ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

# Micros-precision format: Spark's default JSON format keeps only
# millis, which would silently corrupt sub-milli timestamps. The
# fixture's o_orderdate is parquet TIMESTAMP(isAdjustedToUTC=false) →
# Spark TIMESTAMP_NTZ, which the JSON codec formats via
# ``timestampNTZFormat`` — the plain ``timestampFormat`` option is
# silently IGNORED for NTZ columns (verified empirically; all dates
# came back NULL under the mismatched reader format).
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def io_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    out = _tmp("json", sf_dir)
    orders.write.mode("overwrite").option("timestampNTZFormat", _TS_FMT).json(out)
    back = (
        spark.read.schema(_ORDERS_SCHEMA)
        .option("timestampNTZFormat", _TS_FMT)
        .json(out)
    )
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(cents(F.col("o_totalprice"))).alias("total_cents"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_day"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_day"),
    )


_JSON_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(TRY_CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_day,
       strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_day
FROM orders
GROUP BY o_orderpriority
"""

# --- partitioned parquet sink + pruned scan --------------------------------

# Explicit read-back schema (partition column last, matching layout):
# schema inference would crash on a zero-row write (the partitioned dir
# then contains no data files at all), and at 100 TB inference is a
# full file listing you never want on the hot path anyway.
_EVENTS_BACK_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def io_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = _tmp("part", sf_dir)
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.schema(_EVENTS_BACK_SCHEMA).parquet(out).where(
        F.col("event_type") == "purchase"
    )
    return back.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").alias("n_purchases"),
        F.countDistinct("user_id").alias("n_users"),
        money_sum(F.col("value")).alias("value_sum"),
    )


_PART_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       COUNT(*) AS n_purchases,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(TRY_CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_sum
FROM events
WHERE event_type = 'purchase'
GROUP BY 1
"""

# --- XML ------------------------------------------------------------------

# Forces entity escaping (< & >), attribute-quote handling, and an
# embedded newline through the XML round-trip; ends with a non-space
# character so whitespace-trimming readers can't silently pass.
_XML_DECORATION = '<&>\n"x'


def io_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 built-in XML source/sink round-trip (same lossless-proof
    shape as the CSV/JSON queries: the oracle aggregates the ORIGINAL
    parquet, so a hash match proves the writer escaped and the reader
    unescaped every entity)."""
    # text char-class validity (contract.text_valid): the XML 1.0
    # character model has no representation for C0 controls — the
    # writer THROWS on a NUL byte (round-8 probe)
    docs = load_table(spark, sf_dir, "documents").where(text_valid()).withColumn(
        "text", F.concat(F.col("text"), F.lit(_XML_DECORATION))
    )
    out = _tmp("xml", sf_dir)
    docs.write.mode("overwrite").format("xml").options(
        rootTag="docs", rowTag="doc"
    ).save(out)
    back = (
        spark.read.schema(_DOC_SCHEMA)
        .format("xml")
        .option("rowTag", "doc")
        .load(out)
    )
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("sum_chars"),
        F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
        F.sum("n_chars").alias("sum_n_chars"),
    )


_XML_SQL = f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(LENGTH(text || '<&>' || chr(10) || '"x')) AS BIGINT) AS sum_chars,
       CAST(COUNT(DISTINCT md5(text || '<&>' || chr(10) || '"x')) AS BIGINT) AS n_distinct_texts,
       CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
FROM documents
WHERE {TEXT_VALID_DUCK}
GROUP BY lang
"""

# --- z-order layout --------------------------------------------------------

_ZBITS = 16


def _zvalue(a, b):
    """Interleave the low 16 bits of two columns into a 32-bit Morton
    (z-order) value — pure codegen-able bit arithmetic, no UDF. Sorting
    or range-partitioning files by this key clusters BOTH dimensions,
    so min/max file statistics prune selective predicates on either
    column — the multi-dimension data-skipping layout (Delta/Iceberg
    OPTIMIZE ZORDER) expressed as plain Spark expressions."""
    import functools

    a = a.cast("long")
    b = b.cast("long")
    terms = []
    for i in range(_ZBITS):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return functools.reduce(lambda x, y: x.bitwiseOR(y), terms)


def layout_zorder_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order key over (customer, order-day): the driver-checked half
    is the exact Morton value; the file-layout half (range-partitioned
    write → non-overlapping per-file z-ranges) is audited by
    tests/test_io_plans.py.

    Pinned NULL rule (round-10 layer 2): a row with a NULL key
    dimension has NO z-position — NULL would otherwise propagate into
    zvalue and sort NULLS FIRST in Spark but NULLS LAST in DuckDB,
    shifting the whole head of the layout."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    x = F.col("o_custkey").bitwiseAND(F.lit(0xFFFF))
    y = F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1995-01-01"))).bitwiseAND(
        F.lit(0xFFFF)
    )
    z = orders.select("o_orderkey", _zvalue(x, y).alias("zvalue"))
    return z.orderBy("zvalue", "o_orderkey").limit(100)


def _z_sql(xe: str, ye: str) -> str:
    # Every term fully parenthesized: DuckDB gives <<, >>, &, | EQUAL
    # precedence (left-assoc), so an unparenthesized `a << 0 | b << 1`
    # chain compounds the shifts and overflows.
    parts = [f"(((({xe}) >> {i}) & 1) << {2 * i})" for i in range(_ZBITS)]
    parts += [f"(((({ye}) >> {i}) & 1) << {2 * i + 1})" for i in range(_ZBITS)]
    return " | ".join(parts)


_ZORDER_SQL = f"""
SELECT o_orderkey,
       {_z_sql("o_custkey & 65535",
               "date_diff('day', DATE '1995-01-01', o_orderdate) & 65535")} AS zvalue
FROM orders
WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
ORDER BY zvalue, o_orderkey
LIMIT 100
"""

# --- bucketed co-located join ----------------------------------------------

_BUCKETED_PREV: dict[str, tuple[str, ...]] = {}


def io_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table join: both fact tables are written bucketed (and
    sorted) on the join key, so the sort-merge join reads co-located
    buckets with NO exchange on either side (audited by
    tests/test_io_plans.py). At 100 TB this is the layout that
    amortizes the orders⋈lineitem shuffle across every query that
    joins on the key. The pre-write ``repartition(8, key)`` aligns
    task hashing with bucket hashing so each bucket is one file. The
    MERGE hint pins the join strategy — at fixture scale the tables
    would otherwise broadcast, and the point is the exchange-free SMJ
    shape.

    Catalog hygiene: table names are unique per invocation, and the
    PREVIOUS invocation's tables are dropped here (they can't be
    dropped on return — the result DataFrame reads them lazily), so
    repeated registry sweeps don't accumulate catalog entries."""
    key = re.sub(r"\W+", "_", sf_dir.strip("/"))
    for stale in _BUCKETED_PREV.pop(key, ()):
        spark.sql(f"DROP TABLE IF EXISTS {stale}")
    uniq = f"{key}_{os.getpid()}_{next(_TMP_SEQ)}"
    t_orders, t_li = f"b_orders_{uniq}", f"b_lineitem_{uniq}"
    _BUCKETED_PREV[key] = (t_orders, t_li)
    base = _tmp("bucketed", sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    for df, name, col in ((orders, t_orders, "o_orderkey"), (li, t_li, "l_orderkey")):
        (
            df.repartition(8, F.col(col))
            .write.mode("overwrite")
            .option("path", os.path.join(base, name))
            .bucketBy(8, col)
            .sortBy(col)
            .saveAsTable(name)
        )
    j = spark.table(t_orders).hint("merge").join(
        spark.table(t_li), F.col("o_orderkey") == F.col("l_orderkey")
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.sum(cents(F.col("l_quantity"))).alias("qty_cents"),
        F.sum(cents(F.col("l_extendedprice"), 1)).alias("price_units"),
    )


_BUCKETED_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(TRY_CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
       CAST(SUM(TRY_CAST(ROUND(l_extendedprice) AS BIGINT)) AS BIGINT) AS price_units
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""

QUERIES = {
    "io_csv_roundtrip": io_csv_roundtrip,
    "io_json_roundtrip": io_json_roundtrip,
    "io_xml_roundtrip": io_xml_roundtrip,
    "io_partitioned_scan": io_partitioned_scan,
    "layout_zorder_orders": layout_zorder_orders,
    "io_bucketed_join": io_bucketed_join,
}

ORACLE = {
    "io_csv_roundtrip": _CSV_SQL,
    "io_json_roundtrip": _JSON_SQL,
    "io_xml_roundtrip": _XML_SQL,
    "io_partitioned_scan": _PART_SQL,
    "layout_zorder_orders": _ZORDER_SQL,
    "io_bucketed_join": _BUCKETED_SQL,
}
