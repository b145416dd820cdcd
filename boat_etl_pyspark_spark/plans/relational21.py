"""Round-5 batch 3: corpus-health and embedding-QA operators
(SURVEY.md §2.9 text / similarity families; no reference
counterpart).

  * ``curate_ngram_novelty`` — per-source 8-gram novelty rate: the
    share of shingle occurrences whose hash appears exactly once in
    the whole corpus. The corpus-health complement of dedup — a
    source whose novelty collapses is templated or self-copying.
    Shuffles carry md5 hashes only, never text.
  * ``sim_batch_diversity`` — mean/min/max pairwise cosine over a
    deterministic 32-vector sample (md5-ordered, so every engine and
    every run picks the same sample): the batch-diversity probe used
    to detect mode collapse in retrieval batches. The sample rides
    TakeOrderedAndProject; the 496 pairs stay integer until the final
    per-pair cosine, floored to micro units before aggregation.
  * ``text_heaps_law`` — vocabulary growth at ten corpus checkpoints
    (Heaps' law curve): each token contributes to the decile of its
    FIRST document, so one token-min aggregate + two bounded 10-row
    windows produce the whole cumulative curve — no per-checkpoint
    rescan of the corpus.
  * ``embed_centroid_drift`` — per-label centroid L2 distance from
    the global centroid in milli units: the embedding-QA check that a
    class has not drifted from the population. One posexplode +
    map-combined (label, pos) aggregate; the global centroid is a
    64-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (kept for parity with sibling modules)

from ..sources.readers import load_table

# ---------------------------------------------------------------------------
# Per-source n-gram novelty
# ---------------------------------------------------------------------------

_NOV_N = 8

_NOV_SHINGLES_SPARK = f"""
SELECT source, md5(array_join(slice(words, i + 1, {_NOV_N}), ' ')) AS h
FROM (SELECT source, filter(split(text, ' '), x -> x != '') AS words
      FROM {{docs}})
LATERAL VIEW explode(
  CASE WHEN size(words) >= {_NOV_N}
       THEN sequence(0, size(words) - {_NOV_N}) ELSE array() END) e AS i
"""

# ``s`` feeds both the corpus-wide count AND the occurrence join; as
# a CTE the shingle explode+md5 would run twice, so the Spark path
# persists it once.
_NOV_SPARK = f"""
WITH s AS (
  SELECT * FROM {{shingles}}
), c AS (
  SELECT h, COUNT(*) AS n FROM s GROUP BY h
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN c.n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(SUM(CASE WHEN c.n = 1 THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*)
            AS BIGINT) AS novelty_ppm
FROM s JOIN c USING (h)
GROUP BY source
"""

_NOV_DUCK = f"""
WITH w AS (
  SELECT source, list_filter(string_split(text, ' '), x -> x != '') AS words
  FROM documents
), s AS (
  SELECT source,
         md5(array_to_string(list_slice(words, i + 1, i + {_NOV_N}), ' ')) AS h
  FROM w, UNNEST(range(greatest(len(words) - {_NOV_N} + 1, 0))) AS t(i)
), c AS (
  SELECT h, COUNT(*) AS n FROM s GROUP BY h
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN c.n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(SUM(CASE WHEN c.n = 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS novelty_ppm
FROM s JOIN c USING (h)
GROUP BY source
"""


def curate_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of 8-gram occurrences unique across the corpus, per
    source. Shingle hashes aggregate once (md5 keys only on the
    wire), then join back to occurrences — the same two-shuffle shape
    as the dedup inverted index, emitting a per-source health row
    instead of pairs. The shingle relation is persisted because the
    count and the join both consume it — as a CTE the explode+md5
    ran twice."""
    from . import track_persist

    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "r21_nov_docs"
    )
    track_persist(
        spark.sql(_NOV_SHINGLES_SPARK.format(docs="r21_nov_docs"))
    ).createOrReplaceTempView("r21_nov_shingles")
    return spark.sql(_NOV_SPARK.format(shingles="r21_nov_shingles"))


# ---------------------------------------------------------------------------
# Batch diversity (pairwise cosine over a deterministic sample)
# ---------------------------------------------------------------------------

_DIV_K = 32

_DIV_SPARK = f"""
WITH q AS (
  SELECT vec_id,
         transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v,
         md5(CAST(vec_id AS STRING)) AS hk
  FROM {{emb}}
  WHERE embedding IS NOT NULL
    AND NOT exists(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)
), samp AS (
  SELECT vec_id, v FROM q ORDER BY hk, vec_id LIMIT {_DIV_K}
), pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, a.v AS va, b.v AS vb
  FROM samp a JOIN samp b ON a.vec_id < b.vec_id
), d AS (
  SELECT ia, ib,
         aggregate(zip_with(va, vb, (x, y) -> x * y),
                   CAST(0 AS BIGINT), (acc, x) -> acc + x) AS dot,
         aggregate(zip_with(va, va, (x, y) -> x * y),
                   CAST(0 AS BIGINT), (acc, x) -> acc + x) AS na,
         aggregate(zip_with(vb, vb, (x, y) -> x * y),
                   CAST(0 AS BIGINT), (acc, x) -> acc + x) AS nb
  FROM pairs
), cosd AS (
  SELECT CAST(floor(CAST(dot AS DOUBLE)
                    / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                    * 1e6) AS BIGINT) AS cos_micro
  FROM d WHERE na > 0 AND nb > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(cos_micro) AS BIGINT) AS sum_cos_micro,
       CAST(MIN(cos_micro) AS BIGINT) AS min_cos_micro,
       CAST(MAX(cos_micro) AS BIGINT) AS max_cos_micro
FROM cosd
"""

_DIV_DUCK = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
           AS v,
         md5(CAST(vec_id AS VARCHAR)) AS hk
  FROM embeddings
  WHERE embedding IS NOT NULL
    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)) = 0
), samp AS (
  SELECT vec_id, v FROM q ORDER BY hk, vec_id LIMIT {_DIV_K}
), pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, a.v AS va, b.v AS vb
  FROM samp a JOIN samp b ON a.vec_id < b.vec_id
), z AS (
  SELECT ia, ib, unnest(va) AS x, unnest(vb) AS y FROM pairs
), d AS (
  SELECT ia, ib, SUM(x * y) AS dot, SUM(x * x) AS na, SUM(y * y) AS nb
  FROM z GROUP BY ia, ib
), cosd AS (
  SELECT CAST(floor(CAST(dot AS DOUBLE)
                    / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                    * 1e6) AS BIGINT) AS cos_micro
  FROM d WHERE na > 0 AND nb > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(cos_micro) AS BIGINT) AS sum_cos_micro,
       CAST(MIN(cos_micro) AS BIGINT) AS min_cos_micro,
       CAST(MAX(cos_micro) AS BIGINT) AS max_cos_micro
FROM cosd
"""


def sim_batch_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine diversity of a deterministic 32-vector sample:
    md5-ordered top-k (TakeOrderedAndProject — no full sort, and the
    same sample on any engine), all 496 pairs' dot products and norms
    as exact integer HOF folds, each cosine floored to micro units
    before the summary aggregate. At fleet scale the sample size, not
    the corpus, bounds the pairwise work."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "r21_div_emb"
    )
    return spark.sql(_DIV_SPARK.format(emb="r21_div_emb"))


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth
# ---------------------------------------------------------------------------

_HEAPS_SPARK = """
WITH w AS (
  SELECT doc_id, filter(split(text, ' '), x -> x != '') AS words
  FROM {docs} WHERE text IS NOT NULL
), bounds AS (
  SELECT MIN(doc_id) AS lo, MAX(doc_id) + 1 AS hi FROM w
), tok AS (
  SELECT doc_id, tok FROM w LATERAL VIEW explode(words) t AS tok
), firsts AS (
  SELECT tok, MIN(doc_id) AS fd FROM tok GROUP BY tok
), fb AS (
  SELECT LEAST((fd - lo) * 10 DIV (hi - lo), 9) AS b, COUNT(*) AS nv
  FROM firsts CROSS JOIN bounds GROUP BY 1
), db AS (
  SELECT LEAST((doc_id - lo) * 10 DIV (hi - lo), 9) AS b,
         COUNT(*) AS nd, SUM(size(words)) AS nt
  FROM w CROSS JOIN bounds GROUP BY 1
)
SELECT CAST(db.b AS INT) AS decile,
       CAST(SUM(nd) OVER (ORDER BY db.b ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_docs,
       CAST(SUM(nt) OVER (ORDER BY db.b ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_tokens,
       CAST(SUM(coalesce(nv, 0)) OVER (ORDER BY db.b
                                       ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_vocab
FROM db LEFT JOIN fb ON db.b = fb.b
"""

_HEAPS_DUCK = """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS words
  FROM documents WHERE text IS NOT NULL
), bounds AS (
  SELECT MIN(doc_id) AS lo, MAX(doc_id) + 1 AS hi FROM w
), tok AS (
  SELECT doc_id, tok FROM w, UNNEST(words) AS t(tok)
), firsts AS (
  SELECT tok, MIN(doc_id) AS fd FROM tok GROUP BY tok
), fb AS (
  SELECT LEAST((fd - lo) * 10 // (hi - lo), 9) AS b, COUNT(*) AS nv
  FROM firsts CROSS JOIN bounds GROUP BY 1
), db AS (
  SELECT LEAST((doc_id - lo) * 10 // (hi - lo), 9) AS b,
         COUNT(*) AS nd, SUM(len(words)) AS nt
  FROM w CROSS JOIN bounds GROUP BY 1
)
SELECT CAST(db.b AS INT) AS decile,
       CAST(SUM(nd) OVER (ORDER BY db.b ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_docs,
       CAST(SUM(nt) OVER (ORDER BY db.b ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_tokens,
       CAST(SUM(coalesce(nv, 0)) OVER (ORDER BY db.b
                                       ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_vocab
FROM db LEFT JOIN fb ON db.b = fb.b
"""


def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative docs / tokens / distinct vocabulary at ten doc-id
    checkpoints. Each token is charged to the decile of its FIRST
    document (one token-min aggregate), so the full growth curve
    costs one corpus pass plus windows over two ≤10-row relations —
    the sub-linear-vocabulary (Heaps) diagnostic without re-scanning
    any prefix."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "r21_heaps_docs"
    )
    return spark.sql(_HEAPS_SPARK.format(docs="r21_heaps_docs"))


# ---------------------------------------------------------------------------
# Per-label centroid drift
# ---------------------------------------------------------------------------

_DRIFT_SPARK = """
WITH q AS (
  SELECT label, pos, CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS val
  FROM (SELECT * FROM {emb}
        WHERE embedding IS NOT NULL
          AND NOT exists(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6))
  LATERAL VIEW posexplode(embedding) p AS pos, x
), lab AS (
  SELECT label, pos, SUM(val) AS s, COUNT(*) AS n
  FROM q GROUP BY label, pos
), gcent AS (
  SELECT pos, SUM(val) AS gs, COUNT(*) AS gn FROM q GROUP BY pos
), d AS (
  SELECT label, lab.n,
         CAST(s AS DOUBLE) / lab.n - CAST(gs AS DOUBLE) / gn AS diff
  FROM lab JOIN gcent ON lab.pos = gcent.pos
)
SELECT CAST(label AS INT) AS label,
       CAST(MIN(n) AS BIGINT) AS n_vectors,
       CAST(floor(sqrt(SUM(diff * diff))) AS BIGINT) AS drift_milli
FROM d GROUP BY label
"""

_DRIFT_DUCK = """
WITH q AS (
  SELECT label, pos - 1 AS pos,
         CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS val
  FROM (SELECT label, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings
        WHERE embedding IS NOT NULL
    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)) = 0)
), lab AS (
  SELECT label, pos, SUM(val) AS s, COUNT(*) AS n
  FROM q GROUP BY label, pos
), gcent AS (
  SELECT pos, SUM(val) AS gs, COUNT(*) AS gn FROM q GROUP BY pos
), d AS (
  SELECT label, lab.n,
         CAST(s AS DOUBLE) / lab.n - CAST(gs AS DOUBLE) / gn AS diff
  FROM lab JOIN gcent ON lab.pos = gcent.pos
)
SELECT CAST(label AS INT) AS label,
       CAST(MIN(n) AS BIGINT) AS n_vectors,
       CAST(floor(sqrt(SUM(diff * diff))) AS BIGINT) AS drift_milli
FROM d GROUP BY label
"""


def embed_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 distance of each label's centroid from the global centroid,
    in milli units of the embedding scale. Centroids come from exact
    integer (label, pos) sums — one map-combined aggregate over the
    posexploded corpus; the 64-row global centroid joins back as a
    broadcast. Per-class drift is the standard embedding-space QA
    check before training on auto-labeled data."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "r21_drift_emb"
    )
    return spark.sql(_DRIFT_SPARK.format(emb="r21_drift_emb"))


QUERIES = {
    "curate_ngram_novelty": curate_ngram_novelty,
    "sim_batch_diversity": sim_batch_diversity,
    "text_heaps_law": text_heaps_law,
    "embed_centroid_drift": embed_centroid_drift,
}

ORACLE = {
    "curate_ngram_novelty": _NOV_DUCK,
    "sim_batch_diversity": _DIV_DUCK,
    "text_heaps_law": _HEAPS_DUCK,
    "embed_centroid_drift": _DRIFT_DUCK,
}
