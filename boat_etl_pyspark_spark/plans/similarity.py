"""Similarity search over the ``embeddings`` table (SURVEY.md §2.9).

Two ANN strategies plus array-function statistics:

  * ``sim_bruteforce_topk`` — exact cosine top-k for a small query
    set: broadcast the queries, nested-loop against all vectors,
    rank per query. At cluster scale this is the "small query batch ×
    huge corpus" shape: the corpus stays partitioned, queries ship to
    it, and the top-k is a per-partition heap + tiny final merge
    (window over q_vec_id).
  * ``sim_ivf_topk`` — IVF-style scale path: pick deterministic
    centroids, assign every vector to its nearest centroid (broadcast
    NLJ over a handful of centroids), then answer queries only within
    their own cluster — the 100 TB pattern where the corpus is
    pre-partitioned by cluster id and a query touches one partition.
    (Centroid selection is pluggable; here a modulo sample keeps the
    operator deterministic and oracle-checkable.)

Numeric determinism: dot products and norms are explicit sequential
folds (``aggregate`` in Spark, ``list_reduce`` in DuckDB) over
float→double-widened values, so cosines are bit-identical in both
engines and at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table


def _emb_view(spark: SparkSession, sf_dir: str, name: str) -> str:
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(name)
    return name


# Spark + DuckDB fragments for vectors with norms attached. A NULL
# array or a NULL element has no geometry, and each engine invents its
# own arithmetic for one (DuckDB's list_prepend turns a NULL list into
# [0.0]; Spark's aggregate yields NULL) — both are excluded up front,
# identically in both fragments.
_SPARK_VECS = """
  SELECT vec_id, label, v,
         aggregate(v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x) AS n2
  FROM (SELECT vec_id, label, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM {emb}
        WHERE embedding IS NOT NULL
          AND NOT exists(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6))
"""

_DUCK_VECS = """
  SELECT vec_id, label, v,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(v, x -> x * x)),
                     (acc, x) -> acc + x) AS n2
  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE embedding IS NOT NULL
          AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)) = 0)
"""

_SPARK_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
_DUCK_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])), (acc, x) -> acc + x)"
)


def _vecs_view(spark: SparkSession, sf_dir: str) -> str:
    """Session-shared parsed-vector relation (vec_id, label, v, n2):
    every similarity query re-ran the embedding array cast + norm
    fold per invocation (and the CTE form re-ran it per REFERENCE —
    Spark inlines CTEs); one persisted copy serves the whole family
    (round 11, guide §2.4/§5 — the copurchase_pairs discipline). Each
    row's values are per-row deterministic expressions, so the cached
    relation is value-identical to the inline subquery it replaces.
    First consumer pays the build inside its own timed region; keyed
    by applicationId, rebuilt from parquet every run."""
    from .textdedup import _cached

    def build():
        emb = _emb_view(spark, sf_dir, "__emb_shared")
        return spark.sql(_SPARK_VECS.format(emb=emb))

    _cached(spark, sf_dir, "sim_vecs", build).createOrReplaceTempView(
        "__sim_vecs_shared"
    )
    return "__sim_vecs_shared"


_IVF_LABELED_SPARK = """
WITH n AS (SELECT * FROM {vecs}),
cent AS (SELECT vec_id AS cent_id, v AS cv, n2 AS cn2 FROM n WHERE vec_id % 100 = 0),
assign AS (
  SELECT vec_id, cent_id AS cluster_id
  FROM (
    SELECT /*+ BROADCAST(cent) */
           n.vec_id, cent.cent_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY {cosc} DESC,
                      cent.cent_id
           ) AS rk
    FROM n CROSS JOIN cent
  ) WHERE rk = 1
)
SELECT n.*, a.cluster_id FROM n JOIN assign a ON n.vec_id = a.vec_id
"""


def _labeled_view(spark: SparkSession, sf_dir: str) -> str:
    """Session-shared IVF cluster assignment (the n-by-centroid
    cross-join + argmax): consumed by ``sim_ivf_topk`` AND
    ``sim_ivf_recall_eval`` (which referenced it twice more through
    its q/ivf arms). Same caching/value-identity argument as
    ``_vecs_view``; the assignment ROW_NUMBER is fully deterministic
    (cosine DESC, cent_id tie-break)."""
    from .textdedup import _cached

    def build():
        vecs = _vecs_view(spark, sf_dir)
        cosc = (
            _SPARK_DOT.format(a="n.v", b="cent.cv")
            + " / (sqrt(n.n2) * sqrt(cent.cn2))"
        )
        return spark.sql(_IVF_LABELED_SPARK.format(vecs=vecs, cosc=cosc))

    _cached(spark, sf_dir, "ivf_labeled", build).createOrReplaceTempView(
        "__sim_labeled_shared"
    )
    return "__sim_labeled_shared"


# ---------------------------------------------------------------------------
# Brute-force cosine top-k
# ---------------------------------------------------------------------------

_BRUTE_SPARK = f"""
WITH n AS (SELECT * FROM {{vecs}}),
q AS (SELECT * FROM n WHERE vec_id < 8),
p AS (
  SELECT /*+ BROADCAST(q) */
         q.vec_id AS q_vec_id, n.vec_id AS n_vec_id, n.label AS n_label,
         {_SPARK_DOT.format(a='q.v', b='n.v')} / (sqrt(q.n2) * sqrt(n.n2)) AS cos
  FROM q JOIN n ON q.vec_id != n.vec_id
)
SELECT q_vec_id, n_vec_id, n_label, cos, CAST(rk AS BIGINT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY q_vec_id ORDER BY cos DESC, n_vec_id) AS rk FROM p)
WHERE rk <= 10
"""

_BRUTE_DUCK = f"""
WITH n AS ({_DUCK_VECS}),
q AS (SELECT * FROM n WHERE vec_id < 8),
p AS (
  SELECT q.vec_id AS q_vec_id, n.vec_id AS n_vec_id, n.label AS n_label,
         {_DUCK_DOT.format(a='q.v', b='n.v')} / (sqrt(q.n2) * sqrt(n.n2)) AS cos
  FROM q JOIN n ON q.vec_id != n.vec_id
)
SELECT q_vec_id, n_vec_id, n_label, cos, CAST(rk AS BIGINT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY q_vec_id ORDER BY cos DESC, n_vec_id) AS rk FROM p)
WHERE rk <= 10
"""


def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_BRUTE_SPARK.format(vecs=_vecs_view(spark, sf_dir)))


# ---------------------------------------------------------------------------
# IVF-style clustered ANN: assign to nearest centroid, search own cluster
# ---------------------------------------------------------------------------

_IVF_SPARK = f"""
WITH labeled AS (SELECT * FROM {{labeled}}),
q AS (SELECT * FROM labeled WHERE vec_id IN (3, 77, 154, 231, 308)),
p AS (
  SELECT /*+ BROADCAST(q) */
         q.vec_id AS q_vec_id, q.cluster_id, c.vec_id AS n_vec_id,
         {_SPARK_DOT.format(a='q.v', b='c.v')} / (sqrt(q.n2) * sqrt(c.n2)) AS cos
  FROM q JOIN labeled c
    ON q.cluster_id = c.cluster_id AND q.vec_id != c.vec_id
)
SELECT q_vec_id, cluster_id, n_vec_id, cos, CAST(rk AS BIGINT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY q_vec_id ORDER BY cos DESC, n_vec_id) AS rk FROM p)
WHERE rk <= 5
"""

_IVF_DUCK = f"""
WITH n AS ({_DUCK_VECS}),
cent AS (SELECT vec_id AS cent_id, v AS cv, n2 AS cn2 FROM n WHERE vec_id % 100 = 0),
assign AS (
  SELECT vec_id, cent_id AS cluster_id
  FROM (
    SELECT n.vec_id, cent.cent_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY {_DUCK_DOT.format(a='n.v', b='cent.cv')} / (sqrt(n.n2) * sqrt(cent.cn2)) DESC,
                      cent.cent_id
           ) AS rk
    FROM n CROSS JOIN cent
  ) WHERE rk = 1
),
labeled AS (
  SELECT n.*, a.cluster_id FROM n JOIN assign a ON n.vec_id = a.vec_id
),
q AS (SELECT * FROM labeled WHERE vec_id IN (3, 77, 154, 231, 308)),
p AS (
  SELECT q.vec_id AS q_vec_id, q.cluster_id, c.vec_id AS n_vec_id,
         {_DUCK_DOT.format(a='q.v', b='c.v')} / (sqrt(q.n2) * sqrt(c.n2)) AS cos
  FROM q JOIN labeled c
    ON q.cluster_id = c.cluster_id AND q.vec_id != c.vec_id
)
SELECT q_vec_id, cluster_id, n_vec_id, cos, CAST(rk AS BIGINT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY q_vec_id ORDER BY cos DESC, n_vec_id) AS rk FROM p)
WHERE rk <= 5
"""


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        _IVF_SPARK.format(labeled=_labeled_view(spark, sf_dir))
    )


# ---------------------------------------------------------------------------
# Array-function statistics per label (norms via scaled-integer sums)
# ---------------------------------------------------------------------------

_NORMSTATS_SPARK = f"""
WITH n AS (SELECT * FROM {{vecs}})
SELECT label,
       COUNT(*) AS n_vectors,
       CAST(MAX(size(v)) AS BIGINT) AS n_dims,
       CAST(SUM(CAST(ROUND(sqrt(n2) * 1000000) AS BIGINT)) AS DOUBLE) / (COUNT(*) * 1000000.0) AS avg_norm,
       MIN(sqrt(n2)) AS min_norm,
       MAX(sqrt(n2)) AS max_norm
FROM n
GROUP BY label
"""

_NORMSTATS_DUCK = f"""
WITH n AS ({_DUCK_VECS})
SELECT label,
       COUNT(*) AS n_vectors,
       CAST(MAX(len(v)) AS BIGINT) AS n_dims,
       CAST(SUM(CAST(ROUND(sqrt(n2) * 1000000) AS BIGINT)) AS DOUBLE) / (COUNT(*) * 1000000.0) AS avg_norm,
       MIN(sqrt(n2)) AS min_norm,
       MAX(sqrt(n2)) AS max_norm
FROM n
GROUP BY label
"""


def sim_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        _NORMSTATS_SPARK.format(vecs=_vecs_view(spark, sf_dir))
    )


# ---------------------------------------------------------------------------
# Random-projection (sign) LSH bucketing: 8 deterministic hyperplanes
# ---------------------------------------------------------------------------
# Hyperplane j, dim d: Knuth-hash of (j*64+d) mapped to [-0.5, 0.5).
# Pure arithmetic, so both engines derive identical planes — no stored
# projection matrix needed. At scale the bucket id becomes the shuffle/
# storage partitioning key and candidate search stays intra-bucket.

_RP_H = "(CAST((({j} * 64 + {d}) * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 - 0.5)"

_RP_SPARK = f"""
WITH n AS (SELECT * FROM {{vecs}}),
b AS (
  SELECT vec_id, label,
         concat_ws('', transform(sequence(0, 7),
           j -> CASE WHEN aggregate(
                  transform(sequence(0, 63),
                    d -> element_at(v, d + 1) * {_RP_H.format(j='j', d='d')}),
                  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) > 0
                THEN '1' ELSE '0' END)) AS bucket
  FROM n
)
SELECT bucket,
       COUNT(*) AS n_vectors,
       COUNT(DISTINCT label) AS n_labels
FROM b
GROUP BY bucket
"""

_RP_DUCK = f"""
WITH n AS ({_DUCK_VECS}),
b AS (
  SELECT vec_id, label,
         list_aggregate(list_transform(range(0, 8),
           j -> CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(range(0, 64),
                    d -> v[d + 1] * {_RP_H.format(j='j', d='d')})),
                  (acc, x) -> acc + x) > 0
                THEN '1' ELSE '0' END), 'string_agg', '') AS bucket
  FROM n
)
SELECT bucket,
       COUNT(*) AS n_vectors,
       COUNT(DISTINCT label) AS n_labels
FROM b
GROUP BY bucket
"""


def sim_rp_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_RP_SPARK.format(vecs=_vecs_view(spark, sf_dir)))


QUERIES = {
    "sim_bruteforce_topk": sim_bruteforce_topk,
    "sim_ivf_topk": sim_ivf_topk,
    "sim_norm_stats": sim_norm_stats,
    "sim_rp_lsh_buckets": sim_rp_lsh_buckets,
}

ORACLE = {
    "sim_bruteforce_topk": _BRUTE_DUCK,
    "sim_ivf_topk": _IVF_DUCK,
    "sim_norm_stats": _NORMSTATS_DUCK,
    "sim_rp_lsh_buckets": _RP_DUCK,
}
