"""Round-4 batch 3: distributed ML-preprocessing over the
``embeddings`` table (SURVEY.md §2.9 similarity/LLM-pipeline surface).

  * ``embed_kmeans_lloyd`` — two unrolled Lloyd iterations of k-means
    (k=8, deterministic seed = the 8 lowest vec_ids) entirely in
    integer-quantized arithmetic: vectors quantize to thousandths,
    centroid means use integer division, distances are integer
    squared-L2. Every step is an associative integer aggregate, so
    the assignment (and therefore the oracle hash) is bit-identical
    at any parallelism — the trick that makes iterative clustering
    testable across engines. The plan per iteration is: broadcast the
    k×d centroid table, one explode-join-aggregate for distances, a
    per-vector argmin window, one aggregate for the new centroids —
    exactly the shape that scales to a 1000-executor corpus (the
    centroid relation stays k×d rows no matter the corpus size).
  * ``embed_gram_matrix`` — the Gramian X^T X over the first 16
    quantized dimensions via ``mapInPandas``: each partition computes
    a LOCAL int64 matmul (numpy, exact) and emits only its d×d
    partial, so the shuffle is O(partitions · d²) regardless of row
    count — the communication shape of distributed PCA/covariance at
    100 TB. The oracle recomputes every entry as a plain SUM of
    products.
  * ``curate_semdedup`` (round-5 batch 11) — SemDeDup semantic
    deduplication composing the Lloyd assignment with
    within-cluster-only integer-exact cosine pruning; see the
    section comment below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .contract import EMB_VALID_SPARK


def _emb_view(spark: SparkSession, sf_dir: str, name: str) -> str:
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(name)
    return name


# ---------------------------------------------------------------------------
# Integer-exact k-means (2 Lloyd iterations, unrolled)
# ---------------------------------------------------------------------------

_KMEANS_SPARK = """
WITH q AS (
  SELECT vec_id,
         transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM {emb}
  WHERE embedding IS NOT NULL AND size(embedding) = 64
    AND NOT exists(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)
), e AS (
  SELECT vec_id, posexplode(qv) AS (pos, val) FROM q
), c0 AS (
  SELECT vec_id AS cid, pos, val AS cval FROM e WHERE vec_id < 8
), d1 AS (
  SELECT /*+ BROADCAST(c0) */ e.vec_id, c0.cid,
         SUM((e.val - c0.cval) * (e.val - c0.cval)) AS dist
  FROM e JOIN c0 ON e.pos = c0.pos
  GROUP BY e.vec_id, c0.cid
), a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM d1
  ) WHERE rk = 1
), c1 AS (
  SELECT /*+ BROADCAST(a1) */ a1.cid, e.pos,
         SUM(e.val) DIV COUNT(*) AS cval
  FROM e JOIN a1 ON e.vec_id = a1.vec_id
  GROUP BY a1.cid, e.pos
), d2 AS (
  SELECT /*+ BROADCAST(c1) */ e.vec_id, c1.cid,
         SUM((e.val - c1.cval) * (e.val - c1.cval)) AS dist
  FROM e JOIN c1 ON e.pos = c1.pos
  GROUP BY e.vec_id, c1.cid
), a2 AS (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM d2
  ) WHERE rk = 1
)
SELECT cid AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(dist) AS BIGINT) AS inertia
FROM a2 GROUP BY cid
"""

_KMEANS_DUCK = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
           AS qv
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)) = 0
), e AS (
  SELECT vec_id, i AS pos, CAST(qv[i] AS BIGINT) AS val
  FROM q, (SELECT unnest(range(1, 65)) AS i)
), c0 AS (
  SELECT vec_id AS cid, pos, val AS cval FROM e WHERE vec_id < 8
), d1 AS (
  SELECT e.vec_id, c0.cid,
         CAST(SUM((e.val - c0.cval) * (e.val - c0.cval)) AS BIGINT) AS dist
  FROM e JOIN c0 ON e.pos = c0.pos
  GROUP BY e.vec_id, c0.cid
), a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM d1
  ) t WHERE rk = 1
), c1 AS (
  SELECT a1.cid, e.pos,
         CAST(CAST(SUM(e.val) AS BIGINT) // COUNT(*) AS BIGINT) AS cval
  FROM e JOIN a1 ON e.vec_id = a1.vec_id
  GROUP BY a1.cid, e.pos
), d2 AS (
  SELECT e.vec_id, c1.cid,
         CAST(SUM((e.val - c1.cval) * (e.val - c1.cval)) AS BIGINT) AS dist
  FROM e JOIN c1 ON e.pos = c1.pos
  GROUP BY e.vec_id, c1.cid
), a2 AS (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM d2
  ) t WHERE rk = 1
)
SELECT cid AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(dist) AS BIGINT) AS inertia
FROM a2 GROUP BY cid
"""


def embed_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two integer-exact Lloyd iterations over the embedding corpus;
    returns per-cluster population and inertia (sum of squared
    distances to the assigned centroid). Truncating integer division
    (Spark ``DIV`` / DuckDB ``//`` both truncate toward zero) keeps
    the centroid update deterministic and engine-identical."""
    emb = _emb_view(spark, sf_dir, "__emb_kmeans")
    return spark.sql(_KMEANS_SPARK.format(emb=emb))


# ---------------------------------------------------------------------------
# Gramian via per-partition matmul partials
# ---------------------------------------------------------------------------

_GRAM_DIMS = 16


def embed_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper triangle of X^T X over the first 16 quantized embedding
    dimensions. Quantization happens JVM-side (same rounding as the
    oracle); the Python stage only multiplies exact int64, one numpy
    matmul per Arrow batch, emitting d(d+1)/2 partials per partition.
    The groupBy then sums ≤ partitions × 136 tiny rows — the
    driver/shuffle never sees the corpus."""
    import pandas as pd  # noqa: PLC0415 — worker-side import kept local

    d = _GRAM_DIMS
    # full vector-validity rule incl. size(embedding) = dims: a ragged
    # or empty vector would crash np.stack below (round-8 probe class)
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.expr(EMB_VALID_SPARK)
    )
    q = emb.select(
        F.expr(
            "transform(slice(embedding, 1, 16), "
            "x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv"
        )
    )

    def partials(batches):
        import numpy as np

        acc = np.zeros((d, d), dtype=np.int64)
        for pdf in batches:
            if len(pdf):
                m = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
                acc += m.T @ m
        iu = np.triu_indices(d)
        yield pd.DataFrame(
            {"i": iu[0].astype("int64"), "j": iu[1].astype("int64"),
             "partial": acc[iu]}
        )

    return (
        q.mapInPandas(partials, "i bigint, j bigint, partial bigint")
        .groupBy("i", "j")
        .agg(F.sum("partial").alias("gram"))
    )


_GRAM_DUCK = f"""
WITH q AS (
  SELECT list_transform(embedding[1:{_GRAM_DIMS}],
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
           AS qv
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)) = 0
)
SELECT CAST(i - 1 AS BIGINT) AS i, CAST(j - 1 AS BIGINT) AS j,
       CAST(SUM(CAST(qv[i] AS BIGINT) * CAST(qv[j] AS BIGINT)) AS BIGINT)
         AS gram
FROM q,
     (SELECT unnest(range(1, {_GRAM_DIMS + 1})) AS i),
     (SELECT unnest(range(1, {_GRAM_DIMS + 1})) AS j)
WHERE i <= j
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# SemDeDup: cluster-bounded semantic deduplication (round-5 batch 11)
# ---------------------------------------------------------------------------
# The SemDeDup recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
# learning at web-scale through semantic deduplication"): cluster the
# embedding corpus with k-means, compute pairwise cosine ONLY within
# each cluster, and drop every vector whose similarity to another
# cluster member exceeds a threshold, keeping one representative.
# Clustering is what makes it tractable — pairwise work is
# sum(n_c^2), bounded by the cluster size k controls; nothing is ever
# compared across clusters. Determinism choices: one integer-exact
# Lloyd assignment against the same lowest-8-vec_id seeds as
# ``embed_kmeans_lloyd``, keep-lowest-vec_id as the representative
# rule (the paper keeps the vector farthest from the centroid; any
# fixed rule gives the same dedup rate), and the cosine threshold
# tested as the INTEGER predicate
#   dot > 0 AND dot^2 * 10000 >= tau2_bp * |a|^2 * |b|^2
# so no float ever decides a pair. tau = 0.40 here (tau2_bp =
# 1600): the synthetic embeddings are near-orthogonal (max
# within-cluster cosine ~0.53 at every fixture scale), so a
# web-corpus threshold like 0.95 would leave the prune path
# unexercised; tau is the caller knob, and the fixture value
# makes the driver hash cover actual removals (18 at sf0.001,
# 236 at sf0.1).

_SEMDEDUP_ASSIGN_SPARK = """
WITH q AS (
  SELECT vec_id,
         transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM {emb}
  WHERE embedding IS NOT NULL AND size(embedding) = 64
    AND NOT exists(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)
), n AS (
  SELECT vec_id, qv,
         aggregate(zip_with(qv, qv, (x, y) -> x * y),
                   0L, (acc, v) -> acc + v) AS n2
  FROM q
), e AS (
  SELECT vec_id, posexplode(qv) AS (pos, val) FROM q
), c0 AS (
  SELECT vec_id AS cid, pos, val AS cval FROM e WHERE vec_id < 8
), d1 AS (
  SELECT /*+ BROADCAST(c0) */ e.vec_id, c0.cid,
         SUM((e.val - c0.cval) * (e.val - c0.cval)) AS dist
  FROM e JOIN c0 ON e.pos = c0.pos
  GROUP BY e.vec_id, c0.cid
), a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM d1
  ) WHERE rk = 1
)
SELECT a1.vec_id, a1.cid, n.qv, n.n2
FROM a1 JOIN n ON a1.vec_id = n.vec_id
"""

_SEMDEDUP_DUCK = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
           AS qv
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)) = 0
), n AS (
  SELECT vec_id, qv,
         CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2
  FROM q
), e AS (
  SELECT vec_id, i AS pos, CAST(qv[i] AS BIGINT) AS val
  FROM q, (SELECT unnest(range(1, 65)) AS i)
), c0 AS (
  SELECT vec_id AS cid, pos, val AS cval FROM e WHERE vec_id < 8
), d1 AS (
  SELECT e.vec_id, c0.cid,
         CAST(SUM((e.val - c0.cval) * (e.val - c0.cval)) AS BIGINT) AS dist
  FROM e JOIN c0 ON e.pos = c0.pos
  GROUP BY e.vec_id, c0.cid
), a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM d1
  ) t WHERE rk = 1
), p AS (
  SELECT b.vec_id AS vb,
         CAST(list_sum(list_transform(range(1, 65),
                                      i -> qa.qv[i] * qb.qv[i]))
           AS BIGINT) AS dot,
         qa.n2 AS n2a, qb.n2 AS n2b
  FROM a1 a
  JOIN a1 b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN n qa ON qa.vec_id = a.vec_id
  JOIN n qb ON qb.vec_id = b.vec_id
), dupe AS (
  SELECT DISTINCT vb FROM p
  WHERE dot > 0
    AND CAST(dot AS HUGEINT) * dot * 10000
        >= CAST(1600 AS HUGEINT) * n2a * n2b
)
SELECT a1.cid AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(CASE WHEN d.vb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(SUM(CASE WHEN d.vb IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept
FROM a1 LEFT JOIN dupe d ON a1.vec_id = d.vb
GROUP BY a1.cid
ORDER BY cluster_id
"""


def curate_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embedding corpus: one integer-exact Lloyd
    assignment (same seeds as ``embed_kmeans_lloyd``), exact
    integer-cosine pairwise comparison WITHIN clusters only, and
    keep-lowest-vec_id pruning at cos > 0.40 (fixture-calibrated so
    pruning actually fires — see module comment); returns per-cluster
    members / removed / kept. The assignment relation (vec_id, cid,
    qv, n2) is computed ONCE and ``track_persist``-ed before the
    self-join — SQL CTE inlining would otherwise re-derive the whole
    distance/argmin subtree on BOTH sides of the pair join (measured:
    8 scans vs 2). Pairwise cost is sum(n_c^2) — the cluster count k
    is the scalability knob (the paper's point) and the pair join's
    equi-key IS the cluster id, so nothing crosses cluster
    boundaries. No float ever decides a pair (dot^2 * 10^4 vs
    1600 * |a|^2 * |b|^2 in DECIMAL(38,0)/HUGEINT)."""
    from . import track_persist

    emb = _emb_view(spark, sf_dir, "__mlprep_semdedup")
    assigned = track_persist(
        spark.sql(_SEMDEDUP_ASSIGN_SPARK.format(emb=emb))
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    scored = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("b.vec_id").alias("vb"),
            F.expr(
                "aggregate(zip_with(a.qv, b.qv, (x, y) -> x * y), "
                "0L, (acc, v) -> acc + v)"
            ).alias("dot"),
            F.col("a.n2").alias("n2a"),
            F.col("b.n2").alias("n2b"),
        )
    )
    dupe = (
        scored.where(
            "dot > 0 AND CAST(dot AS DECIMAL(38,0)) * dot * 10000"
            " >= CAST(1600 AS DECIMAL(38,0)) * n2a * n2b"
        )
        .select("vb")
        .distinct()
    )
    return (
        assigned.join(dupe, assigned.vec_id == dupe.vb, "left")
        .groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_members"),
            F.sum(F.when(F.col("vb").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_removed"),
            F.sum(F.when(F.col("vb").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .orderBy("cluster_id")
    )


QUERIES = {
    "embed_kmeans_lloyd": embed_kmeans_lloyd,
    "embed_gram_matrix": embed_gram_matrix,
    "curate_semdedup": curate_semdedup,
}

ORACLE = {
    "embed_kmeans_lloyd": _KMEANS_DUCK,
    "embed_gram_matrix": _GRAM_DUCK,
    "curate_semdedup": _SEMDEDUP_DUCK,
}
