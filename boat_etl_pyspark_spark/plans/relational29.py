"""Round-5 batch 13: substring-span deduplication and dynamic
partition overwrite (SURVEY.md §2.9 text-analysis / IO-lifecycle
surface; no reference counterpart).

  * ``text_substring_dedup`` — the cross-document duplicated-substring
    measure of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"), SQL-native form: every consecutive
    8-token span is hashed, spans shared by >= 2 distinct documents
    are "duplicated", and each document's duplicated-TOKEN count is
    the union length of its duplicated span intervals — merged with
    the gaps-and-islands pattern (running MAX of interval ends), NOT
    a per-position explode, so the merge costs O(dup spans), never
    O(W x tokens). Per-source rollup in exact ppm.
  * ``io_dynamic_partition_overwrite`` — Spark's
    ``partitionOverwriteMode=dynamic``: a second INSERT OVERWRITE
    carrying only one partition's (regenerated) rows must replace
    exactly that partition and leave the others untouched. The
    read-back aggregate proves it; the oracle composes the expected
    final state from the original table (untouched partitions UNION
    the regenerated one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from ..sources.readers import load_table
from .io_plans import _tmp

# ---------------------------------------------------------------------------
# Cross-document substring-span dedup
# ---------------------------------------------------------------------------

_SSD_W = 8  # span width in tokens (matches the decontamination 8-gram)

_SSD_TAIL = f"""
, dup AS (
  SELECT h FROM spans GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
), ds AS (
  SELECT s.doc_id, s.start, s.start + {_SSD_W} - 1 AS fin
  FROM spans s JOIN dup d ON s.h = d.h
), isl AS (
  SELECT doc_id, start, fin,
         CASE WHEN start > coalesce(MAX(fin) OVER (
                PARTITION BY doc_id ORDER BY start, fin
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_isl
  FROM ds
), grp AS (
  SELECT doc_id, start, fin,
         SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY start, fin
                            ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
), cov AS (
  SELECT doc_id, island, MAX(fin) - MIN(start) + 1 AS covered
  FROM grp GROUP BY doc_id, island
), doc_cov AS (
  SELECT doc_id, SUM(covered) AS dup_toks FROM cov GROUP BY doc_id
)
SELECT t.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(t.n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(coalesce(dc.dup_toks, 0)) AS BIGINT) AS dup_tokens,
       CAST(SUM(coalesce(dc.dup_toks, 0)) * 1000000 {{idiv}} SUM(t.n_tok)
         AS BIGINT) AS dup_ppm
FROM sized t
LEFT JOIN doc_cov dc ON t.doc_id = dc.doc_id
GROUP BY t.source
"""

_SSD_SPANS_SPARK = f"""
SELECT doc_id, i AS start,
       md5(array_join(slice(t, i, {_SSD_W}), ' ')) AS h
FROM (SELECT doc_id, filter(split(text, ' '), x -> x != '') AS t
      FROM {{docs}})
LATERAL VIEW explode(sequence(1, size(t) - {_SSD_W} + 1)) e AS i
WHERE size(t) >= {_SSD_W}
"""

# ``spans`` is consumed twice (the >=2-docs test AND the coverage
# join); as a CTE the tokenize+hash explode would run twice, so the
# Spark path persists it once and the SQL below reads the view.
_SSD_SPARK = f"""
WITH spans AS (
  SELECT * FROM {{spans}}
), sized AS (
  SELECT doc_id, source,
         size(filter(split(text, ' '), x -> x != '')) AS n_tok
  FROM {{docs}}
){_SSD_TAIL.format(idiv="DIV")}
"""

_SSD_DUCK = f"""
WITH toks AS (
  SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '')
           AS t
  FROM documents
), spans AS (
  SELECT doc_id, i AS start,
         md5(array_to_string(t[i : i + {_SSD_W} - 1], ' ')) AS h
  FROM toks, (SELECT unnest(range(1, 600)) AS i)
  WHERE i <= len(t) - {_SSD_W} + 1
), sized AS (
  SELECT doc_id, source, len(t) AS n_tok FROM toks
){_SSD_TAIL.format(idiv="//")}
"""


def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplicated-substring load: the fraction of tokens
    (exact ppm) covered by some 8-token span that also appears in
    another document — the Lee et al. 2022 substring-dedup signal in
    its SQL-native form. Span hashes shuffle once for the >=2-docs
    test; each document's duplicated spans merge into maximal
    intervals via gaps-and-islands (running MAX of ends on one
    doc_id exchange), so coverage costs O(duplicated spans) rather
    than exploding W rows per span. Two column-pruned text scans
    (span inventory + token counts) — the train-then-score shape;
    the span inventory itself is persisted because BOTH the
    duplicated-hash test and the coverage join consume it (as a CTE
    the tokenize+hash explode ran twice — measured 2.6s → ~1.6s
    warm at sf0.1)."""
    from . import track_persist

    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "r29_ssd_docs"
    )
    track_persist(
        spark.sql(_SSD_SPANS_SPARK.format(docs="r29_ssd_docs"))
    ).createOrReplaceTempView("r29_ssd_spans")
    return spark.sql(
        _SSD_SPARK.format(docs="r29_ssd_docs", spans="r29_ssd_spans")
    )


# ---------------------------------------------------------------------------
# Dynamic partition overwrite
# ---------------------------------------------------------------------------
# The second write carries ONLY o_orderstatus = 'O' rows, re-priced
# deterministically; dynamic mode must replace exactly that partition.

_DPO_SQL = """
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM {src}
GROUP BY o_orderstatus
ORDER BY status
"""

_DPO_ORACLE = """
WITH base AS (
  -- IS DISTINCT FROM: a NULL status is a real partition (Spark
  -- writes it as the Hive default partition and reads NULL back);
  -- plain <> would silently drop it from the expected state
  SELECT o_orderstatus,
         TRY_CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderstatus IS DISTINCT FROM 'O'
), regen AS (
  SELECT o_orderstatus,
         TRY_CAST(round(o_totalprice * 100) AS BIGINT) * 2 AS cents
  FROM orders
  WHERE o_orderstatus = 'O' AND o_orderkey % 3 = 0
), unioned AS (
  SELECT * FROM base UNION ALL SELECT * FROM regen
)
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM unioned
GROUP BY o_orderstatus
ORDER BY status
"""


def io_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite end-to-end: full partitioned write
    of orders by status, then an INSERT OVERWRITE carrying ONLY a
    regenerated 'O' partition (every third order, price doubled)
    under ``partitionOverwriteMode=dynamic`` — which must replace
    that single partition and leave 'F'/'P' untouched (static mode
    would wipe them). The read-back aggregate is the proof; the
    oracle composes the expected final state relationally. At scale
    this IS the idempotent daily-partition reload primitive."""
    out = _tmp("dpo", sf_dir)
    orders = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "o_orderstatus",
        "TRY_CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
    )
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)
    regen = orders.where("o_orderstatus = 'O' AND o_orderkey % 3 = 0").selectExpr(
        "o_orderkey", "o_orderstatus", "cents * 2 AS cents"
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        regen.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # explicit schema: an all-empty source writes no partition dirs,
    # and schema inference on an empty path would throw — the empty
    # table must aggregate to zero rows, not crash
    spark.read.schema(
        "o_orderkey BIGINT, cents BIGINT, o_orderstatus STRING"
    ).parquet(out).createOrReplaceTempView("r29_dpo_readback")
    return spark.sql(_DPO_SQL.format(src="r29_dpo_readback"))


QUERIES = {
    "text_substring_dedup": text_substring_dedup,
    "io_dynamic_partition_overwrite": io_dynamic_partition_overwrite,
}

ORACLE = {
    "text_substring_dedup": _SSD_DUCK,
    "io_dynamic_partition_overwrite": _DPO_ORACLE,
}
