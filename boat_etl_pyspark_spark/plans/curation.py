"""Dataset curation operators over ``documents`` — the decisions a
training-data pipeline makes before a corpus reaches the trainer
(SURVEY.md §2.9 north-star extensions; no reference counterpart —
the reference, src/pipeline_pyspark.py, has no sampling/split surface
at all).

Decision ops, distinct from the scoring ops in ``textdedup``:

  * ``curate_train_split`` — deterministic train/val/test assignment
    by content-independent hash of the document key. Hash-based (not
    ``rand()``-based) so the split is reproducible across runs,
    engines, and repartitionings, and stable under corpus growth: a
    document's split never changes when other documents are added
    (pinned by tests/test_curation_properties.py).
  * ``curate_quality_filter`` — reason-coded C4-style heuristic
    filter: every document gets a keep/drop verdict plus the first
    failing rule, so downstream can audit drop rates per rule.
  * ``curate_stratified_sample`` — deterministic per-stratum sample:
    rank by md5(doc_id) within (lang, source) and keep the first k.
    Equivalent to a uniform random sample per stratum (the hash is
    uncorrelated with any document property) but reproducible and
    oracle-checkable, unlike ``TABLESAMPLE``/``rand()``.
  * ``curate_pack_sequences`` — concat-then-chunk sequence packing
    into fixed token blocks (the LLM pretraining layout).
  * ``curate_corpus_upsert`` — MERGE INTO semantics (update/insert/
    keep) as a plain full-outer join.
  * ``curate_contamination_check`` — train/eval 8-gram overlap
    (benchmark decontamination).

Scale posture: filter and split are pure map passes (audited: zero
Exchange); the sample and packing shuffle once on bounded-cardinality
strata; upsert is one co-locatable key join; contamination ships only
16-byte gram hashes with a broadcast-sized eval side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import track_persist
from ..sources.readers import load_table


def _docs_view(spark: SparkSession, sf_dir: str, name: str) -> str:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(name)
    return name


# ---------------------------------------------------------------------------
# Deterministic train/val/test split (80/10/10 by md5 bucket)
# ---------------------------------------------------------------------------

_SPLIT_CASE = """
  CASE WHEN bucket < 80 THEN 'train'
       WHEN bucket < 90 THEN 'val'
       ELSE 'test' END
"""

_SPLIT_SPARK = f"""
SELECT doc_id, {_SPLIT_CASE} AS split
FROM (
  SELECT doc_id,
         CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 6), 16, 10) AS BIGINT) % 100 AS bucket
  FROM {{docs}}
)
"""

_SPLIT_DUCK = f"""
SELECT doc_id, {_SPLIT_CASE} AS split
FROM (
  SELECT doc_id,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 100 AS bucket
  FROM documents
)
"""


def curate_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_view(spark, sf_dir, "__docs_split")
    return spark.sql(_SPLIT_SPARK.format(docs=docs))


# ---------------------------------------------------------------------------
# Reason-coded quality filter (C4-style heuristics)
# ---------------------------------------------------------------------------
# Rules, in precedence order (first failure wins):
#   too_short  — fewer than 20 tokens;
#   repetitive — most frequent token accounts for > 12.5% of tokens
#                (boilerplate/spam signal);
#   non_text   — mean token length outside [2.5, 6] (binary junk or
#                delimiter-free blobs; never fires on the clean
#                fixture, which the test pins as 0 — the rule guards
#                real corpora).
# mean token length is derived from n_chars and the token count
# (text is space-joined, so chars = sum(len) + (n_tok - 1)).

_FILTER_BODY = """
  SELECT doc_id, n_tok, top_share, mean_tok_len,
         n_tok < 20 AS r_too_short,
         top_share > 0.125 AS r_repetitive,
         mean_tok_len < 2.5 OR mean_tok_len > 6.0 AS r_non_text,
         CASE WHEN n_tok < 20 THEN 'too_short'
              WHEN top_share > 0.125 THEN 'repetitive'
              WHEN mean_tok_len < 2.5 OR mean_tok_len > 6.0 THEN 'non_text'
              ELSE 'keep' END AS verdict
"""

_FILTER_SPARK = f"""
{_FILTER_BODY}
FROM (
  SELECT doc_id,
         CAST(size(t) AS BIGINT) AS n_tok,
         CAST(array_max(transform(array_distinct(t),
              x -> size(filter(t, y -> y = x)))) AS DOUBLE) / size(t) AS top_share,
         CAST(n_chars - size(t) + 1 AS DOUBLE) / size(t) AS mean_tok_len
  FROM (SELECT doc_id, n_chars, split(text, ' ') AS t FROM {{docs}})
)
"""

_FILTER_DUCK = f"""
{_FILTER_BODY}
FROM (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_tok,
         CAST(list_max(list_transform(list_distinct(t),
              x -> len(list_filter(t, y -> y = x)))) AS DOUBLE) / len(t) AS top_share,
         CAST(n_chars - len(t) + 1 AS DOUBLE) / len(t) AS mean_tok_len
  FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS t FROM documents)
)
"""


def curate_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_view(spark, sf_dir, "__docs_qf")
    return spark.sql(_FILTER_SPARK.format(docs=docs))


# ---------------------------------------------------------------------------
# Deterministic stratified sample: first k per (lang, source) by hash
# ---------------------------------------------------------------------------

_SAMPLE_K = 5

_SAMPLE_SPARK = f"""
SELECT lang, source, doc_id, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT lang, source, doc_id,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rk
  FROM {{docs}}
)
WHERE rk <= {_SAMPLE_K}
"""

_SAMPLE_DUCK = f"""
SELECT lang, source, doc_id, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT lang, source, doc_id,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
WHERE rk <= {_SAMPLE_K}
"""


def curate_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_view(spark, sf_dir, "__docs_strat")
    return spark.sql(_SAMPLE_SPARK.format(docs=docs))


# ---------------------------------------------------------------------------
# Sequence packing: concat-then-chunk into fixed token blocks
# ---------------------------------------------------------------------------
# The canonical LLM pretraining layout: documents are concatenated in
# a deterministic order (per lang stream, by doc_id) and the token
# stream is cut into fixed-size blocks; a document belongs to the
# block where it starts (long docs straddle into following blocks).
#
# The naive plan is one window cumsum PARTITION BY lang — parallelism
# = #languages, a single-digit number, so one straggler core owns the
# biggest language at any scale. Implemented instead as the classic
# distributed prefix-sum: range-partition the stream on (lang,
# doc_id) into #cores splits, cumsum locally per split, and lift the
# local sums to global ones by adding per-(split, lang) offsets
# computed from a tiny totals table (#splits x #langs rows). The big
# data is touched by exactly two exchanges (the range partition and
# the final (lang, seq_id) aggregate); the offsets table is
# broadcast. Parallelism = #splits regardless of how skewed the
# language mix is.

_PACK_BUDGET = 512

# DuckDB promotes SUM(BIGINT) to HUGEINT (float64 in pandas); cast back
# so the oracle hash matches Spark's bigint.
_PACK_BODY_DUCK = """
SELECT lang, seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
"""

_PACK_DUCK = f"""
{_PACK_BODY_DUCK}
FROM (
  SELECT doc_id, lang, n_tok,
         CAST((SUM(n_tok) OVER w - n_tok) // {_PACK_BUDGET} AS BIGINT) AS seq_id
  FROM (SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents)
  WINDOW w AS (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
GROUP BY lang, seq_id
"""


def curate_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    n_splits = spark.sparkContext.defaultParallelism
    # Persisted so the totals pass and the main pass see the SAME split
    # assignment (range boundaries come from sampling; recomputing the
    # exchange twice is both wasted IO and a determinism hazard).
    split_docs = track_persist(
        docs.repartitionByRange(n_splits, "lang", "doc_id")
        .withColumn("split_id", F.spark_partition_id())
    )
    # Tiny: #splits x #langs rows. The window below runs on it, not on
    # the corpus.
    w_prev = (
        Window.partitionBy("lang")
        .orderBy("split_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        split_docs.groupBy("split_id", "lang")
        .agg(F.sum("n_tok").alias("split_tok"))
        .select(
            "split_id",
            "lang",
            F.coalesce(F.sum("split_tok").over(w_prev), F.lit(0)).alias("offset"),
        )
    )
    # Local cumsum per (split, lang) + broadcast offset = global cumsum
    # in (lang, doc_id) order: range partitioning guarantees every
    # same-lang row in an earlier split precedes every row in a later
    # one.
    w_local = (
        Window.partitionBy("split_id", "lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = (
        split_docs.join(F.broadcast(offsets), ["split_id", "lang"])
        .withColumn(
            "start_tok",
            F.sum("n_tok").over(w_local) + F.col("offset") - F.col("n_tok"),
        )
        # integer DIV, not floor(double /): token totals at corpus scale
        # overflow double's 2^53 exact-integer range
        .withColumn("seq_id", F.expr(f"start_tok DIV {_PACK_BUDGET}"))
    )
    return packed.groupBy("lang", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# Corpus upsert: MERGE INTO semantics as a full-outer join
# ---------------------------------------------------------------------------
# The steady-state corpus operation: a daily update batch lands with
# revised versions of some documents and brand-new ones. MERGE INTO
# (Delta/Iceberg) is table-format sugar over exactly this plan: full
# outer join on the key, matched -> update, source-only -> insert,
# target-only -> keep. Expressed directly so it runs on plain parquet;
# at scale both sides are bucketed by doc_id and the join is
# co-located, with only changed files rewritten by the table format.
# Fixture roles are carved deterministically from `documents`:
#   corpus  = doc_id % 10 != 0   (current state)
#   updates = doc_id % 5 == 0    (batch: % 10 == 5 revises an existing
#                                 doc, % 10 == 0 is a new insert)
# Updates revise the text (tagged prefix), so changed rows are
# observable via md5.

_UPSERT_SPARK = """
WITH corpus AS (
  SELECT doc_id, text FROM {docs} WHERE doc_id % 10 != 0
),
updates AS (
  SELECT doc_id, concat('v2 ', text) AS text FROM {docs} WHERE doc_id % 5 = 0
)
SELECT coalesce(c.doc_id, u.doc_id) AS doc_id,
       CASE WHEN c.doc_id IS NULL THEN 'insert'
            WHEN u.doc_id IS NULL THEN 'keep'
            ELSE 'update' END AS action,
       md5(coalesce(u.text, c.text)) AS text_md5
FROM corpus c FULL OUTER JOIN updates u ON c.doc_id = u.doc_id
"""

_UPSERT_DUCK = """
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 != 0
),
updates AS (
  SELECT doc_id, concat('v2 ', text) AS text FROM documents WHERE doc_id % 5 = 0
)
SELECT coalesce(c.doc_id, u.doc_id) AS doc_id,
       CASE WHEN c.doc_id IS NULL THEN 'insert'
            WHEN u.doc_id IS NULL THEN 'keep'
            ELSE 'update' END AS action,
       md5(coalesce(u.text, c.text)) AS text_md5
FROM corpus c FULL OUTER JOIN updates u ON c.doc_id = u.doc_id
"""


def curate_corpus_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_view(spark, sf_dir, "__docs_upsert")
    return spark.sql(_UPSERT_SPARK.format(docs=docs))


# ---------------------------------------------------------------------------
# Benchmark decontamination: train/eval n-gram overlap
# ---------------------------------------------------------------------------
# The standard contamination check before training: flag corpus
# documents sharing any 8-gram with an evaluation set (the fixture
# carves doc_id % 11 == 0 as the "benchmark" — sized so overlaps exist
# at every test scale, keeping the oracle check non-vacuous). Both sides reduce to
# distinct 8-gram hashes BEFORE the join, so the join ships 16-byte
# hashes, never text; the eval side is tiny by nature and broadcasts.
# At 100 TB the eval-gram table is a few MB against any corpus size —
# the check stays one broadcast-join map pass over the corpus grams.

_CONTAM_GRAMS = """
  SELECT doc_id,
         explode(array_distinct(transform(sequence(1, greatest(size(t) - 7, 1)),
             i -> md5(concat_ws(' ', slice(t, i, 8)))))) AS g
  FROM (SELECT doc_id, split(text, ' ') AS t FROM {src})
"""

_CONTAM_SPARK = f"""
WITH corpus_grams AS ({_CONTAM_GRAMS.format(src="(SELECT * FROM {docs} WHERE doc_id % 11 != 0)")}),
eval_grams AS ({_CONTAM_GRAMS.format(src="(SELECT * FROM {docs} WHERE doc_id % 11 = 0)")})
SELECT c.doc_id,
       e.doc_id AS eval_doc_id,
       COUNT(*) AS shared_8grams
FROM corpus_grams c
JOIN eval_grams e ON c.g = e.g
GROUP BY c.doc_id, e.doc_id
"""

_CONTAM_GRAMS_DUCK = """
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, greatest(len(t) - 7, 1) + 1),
             i -> md5(array_to_string(t[i : i + 7], ' '))))) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM {src})
"""

_CONTAM_DUCK = f"""
WITH corpus_grams AS ({_CONTAM_GRAMS_DUCK.format(src="(SELECT * FROM documents WHERE doc_id % 11 != 0)")}),
eval_grams AS ({_CONTAM_GRAMS_DUCK.format(src="(SELECT * FROM documents WHERE doc_id % 11 = 0)")})
SELECT c.doc_id,
       e.doc_id AS eval_doc_id,
       COUNT(*) AS shared_8grams
FROM corpus_grams c
JOIN eval_grams e ON c.g = e.g
GROUP BY c.doc_id, e.doc_id
"""


def curate_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textdedup import _docs_wide_view

    docs = _docs_wide_view(spark, sf_dir, "__docs_contam")
    return spark.sql(_CONTAM_SPARK.format(docs=docs))


QUERIES = {
    "curate_train_split": curate_train_split,
    "curate_corpus_upsert": curate_corpus_upsert,
    "curate_contamination_check": curate_contamination_check,
    "curate_quality_filter": curate_quality_filter,
    "curate_stratified_sample": curate_stratified_sample,
    "curate_pack_sequences": curate_pack_sequences,
}

ORACLE = {
    "curate_train_split": _SPLIT_DUCK,
    "curate_corpus_upsert": _UPSERT_DUCK,
    "curate_contamination_check": _CONTAM_DUCK,
    "curate_quality_filter": _FILTER_DUCK,
    "curate_stratified_sample": _SAMPLE_DUCK,
    "curate_pack_sequences": _PACK_DUCK,
}
