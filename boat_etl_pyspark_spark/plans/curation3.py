"""Round-4 batch 11: the end-to-end corpus-curation pipeline as ONE
declarative plan (SURVEY.md §2.9 curation surface; no reference
counterpart — this is the composition story of the engine's curation
operators).

``curate_corpus_pipeline_report`` chains the production corpus
pipeline — quality gate → exact dedup → benchmark decontamination →
train/val split — inside a single query and reports the funnel
(documents and tokens surviving each stage). Stage semantics reuse
the standalone operators' exact definitions: the C4-ish quality band
(``curate_quality_filter_cascade``), first-occurrence md5 dedup
(``dedup_exact``), shared-8-gram decontamination against the held-out
eval slice (``curate_contamination_check``), and the md5-bucket split
(``curate_train_split``). Because the whole pipeline is one logical
plan, Catalyst prunes/pushes across stage boundaries — the thing a
stage-per-job orchestration can never do — and the per-stage counts
come from one pass over each intermediate.

Scale posture: the corpus flows through exactly three shuffles
(md5 dedup key; 8-gram semi-join key — 32-byte hashes, never text;
final aggregates), and every stage's predicate reaches the scan of
the stage before it. The eval-gram relation is a fraction of the
corpus and AQE-broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table

_PIPE_CORE = """
WITH base AS (
  SELECT doc_id, text, n_chars,
         {ntok} AS nt
  FROM {docs} WHERE doc_id % 11 != 0
), q AS (
  SELECT * FROM base WHERE nt >= 20 AND n_chars BETWEEN 100 AND 2000
), dly AS (
  SELECT doc_id, text, n_chars, nt,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM q
), d AS (
  SELECT doc_id, text, n_chars, nt FROM dly WHERE rn = 1
), corpus_grams AS (
  {grams_corpus}
), eval_grams AS (
  {grams_eval}
), contaminated AS (
  SELECT DISTINCT c.doc_id FROM corpus_grams c
  JOIN eval_grams e ON c.g = e.g
), clean AS (
  SELECT d.* FROM d LEFT JOIN contaminated x ON d.doc_id = x.doc_id
  WHERE x.doc_id IS NULL
), split AS (
  SELECT doc_id, nt,
         CASE WHEN {bucket} < 90 THEN '5_train' ELSE '5_val' END AS split
  FROM clean
)
SELECT stage,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM (
  SELECT '0_pool' AS stage, COUNT(*) AS n_docs, SUM(nt) AS n_tokens
  FROM base
  UNION ALL
  SELECT '1_quality', COUNT(*), SUM(nt) FROM q
  UNION ALL
  SELECT '2_dedup', COUNT(*), SUM(nt) FROM d
  UNION ALL
  SELECT '3_decontaminated', COUNT(*), SUM(nt) FROM clean
  UNION ALL
  SELECT split, COUNT(*), SUM(nt) FROM split GROUP BY split
)
"""

_GRAMS_SPARK = """
  SELECT doc_id,
         explode(array_distinct(transform(sequence(1, greatest(size(t) - 7, 1)),
             i -> md5(concat_ws(' ', slice(t, i, 8)))))) AS g
  FROM (SELECT doc_id, split(text, ' ') AS t FROM {src})
"""

_GRAMS_DUCK = """
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, greatest(len(t) - 7, 1) + 1),
             i -> md5(array_to_string(t[i : i + 7], ' '))))) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM {src})
"""

_PIPE_SPARK = _PIPE_CORE.format(
    docs="{docs}",
    ntok="size(filter(split(text, ' '), x -> x != ''))",
    grams_corpus=_GRAMS_SPARK.format(src="d"),
    grams_eval=_GRAMS_SPARK.format(
        src="(SELECT doc_id, text FROM {docs} WHERE doc_id % 11 = 0)"
    ),
    bucket="CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 6), 16, 10)"
    " AS BIGINT) % 100",
)

_PIPE_DUCK = _PIPE_CORE.format(
    docs="documents",
    ntok="len(list_filter(string_split(text, ' '), x -> x != ''))",
    grams_corpus=_GRAMS_DUCK.format(src="d"),
    grams_eval=_GRAMS_DUCK.format(
        src="(SELECT doc_id, text FROM documents WHERE doc_id % 11 = 0)"
    ),
    bucket="CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)"
    " AS BIGINT) % 100",
)


def curate_corpus_pipeline_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate → exact dedup → 8-gram decontamination →
    train/val split as one plan; output is the stage funnel (docs,
    tokens). See module docstring for the shuffle budget."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "c3_pipe_docs"
    )
    return spark.sql(_PIPE_SPARK.format(docs="c3_pipe_docs"))


QUERIES = {"curate_corpus_pipeline_report": curate_corpus_pipeline_report}
ORACLE = {"curate_corpus_pipeline_report": _PIPE_DUCK}
