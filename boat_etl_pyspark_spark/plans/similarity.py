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


# Spark + DuckDB fragments for vectors with norms attached.
_SPARK_VECS = """
  SELECT vec_id, label, v,
         aggregate(v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x) AS n2
  FROM (SELECT vec_id, label, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM {emb})
"""

_DUCK_VECS = """
  SELECT vec_id, label, v,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(v, x -> x * x)),
                     (acc, x) -> acc + x) AS n2
  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
"""

_SPARK_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
_DUCK_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])), (acc, x) -> acc + x)"
)


# ---------------------------------------------------------------------------
# Brute-force cosine top-k
# ---------------------------------------------------------------------------

_BRUTE_SPARK = f"""
WITH n AS ({_SPARK_VECS}),
q AS (SELECT * FROM n WHERE vec_id < 8),
p AS (
  SELECT /*+ BROADCAST(q) */
         q.vec_id AS q_vec_id, n.vec_id AS n_vec_id, n.label AS n_label,
         {_SPARK_DOT.format(a='q.v', b='n.v')} / (sqrt(q.n2) * sqrt(n.n2)) AS cos
  FROM q JOIN n ON q.vec_id != n.vec_id
)
SELECT q_vec_id, n_vec_id, n_label, cos, rk
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
SELECT q_vec_id, n_vec_id, n_label, cos, rk
FROM (SELECT *, row_number() OVER (PARTITION BY q_vec_id ORDER BY cos DESC, n_vec_id) AS rk FROM p)
WHERE rk <= 10
"""


def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb_view(spark, sf_dir, "__emb_bf")
    return spark.sql(_BRUTE_SPARK.format(emb=emb))


# ---------------------------------------------------------------------------
# IVF-style clustered ANN: assign to nearest centroid, search own cluster
# ---------------------------------------------------------------------------

_IVF_SPARK = f"""
WITH n AS ({_SPARK_VECS}),
cent AS (SELECT vec_id AS cent_id, v AS cv, n2 AS cn2 FROM n WHERE vec_id % 100 = 0),
assign AS (
  SELECT vec_id, cent_id AS cluster_id
  FROM (
    SELECT /*+ BROADCAST(cent) */
           n.vec_id, cent.cent_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY {_SPARK_DOT.format(a='n.v', b='cent.cv')} / (sqrt(n.n2) * sqrt(cent.cn2)) DESC,
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
  SELECT /*+ BROADCAST(q) */
         q.vec_id AS q_vec_id, q.cluster_id, c.vec_id AS n_vec_id,
         {_SPARK_DOT.format(a='q.v', b='c.v')} / (sqrt(q.n2) * sqrt(c.n2)) AS cos
  FROM q JOIN labeled c
    ON q.cluster_id = c.cluster_id AND q.vec_id != c.vec_id
)
SELECT q_vec_id, cluster_id, n_vec_id, cos, rk
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
SELECT q_vec_id, cluster_id, n_vec_id, cos, rk
FROM (SELECT *, row_number() OVER (PARTITION BY q_vec_id ORDER BY cos DESC, n_vec_id) AS rk FROM p)
WHERE rk <= 5
"""


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb_view(spark, sf_dir, "__emb_ivf")
    return spark.sql(_IVF_SPARK.format(emb=emb))


# ---------------------------------------------------------------------------
# Array-function statistics per label (norms via scaled-integer sums)
# ---------------------------------------------------------------------------

_NORMSTATS_SPARK = f"""
WITH n AS ({_SPARK_VECS})
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
    emb = _emb_view(spark, sf_dir, "__emb_ns")
    return spark.sql(_NORMSTATS_SPARK.format(emb=emb))


QUERIES = {
    "sim_bruteforce_topk": sim_bruteforce_topk,
    "sim_ivf_topk": sim_ivf_topk,
    "sim_norm_stats": sim_norm_stats,
}

ORACLE = {
    "sim_bruteforce_topk": _BRUTE_DUCK,
    "sim_ivf_topk": _IVF_DUCK,
    "sim_norm_stats": _NORMSTATS_DUCK,
}
