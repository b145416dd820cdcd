"""Round-5 batch 30 (similarity part): ANN quality evaluation
(SURVEY.md §2.9 similarity-search family; no reference counterpart).

``sim_ivf_recall_eval`` — recall@5 of the IVF own-cluster search
against exact brute force, computed IN the engine for the same five
probe vectors `plans/similarity.py::sim_ivf_topk` uses. Both
retrieval paths run in one plan (probe rows are broadcast; the exact
arm is probe x corpus, the IVF arm probe x own-cluster) and the
overlap join ships only (query, neighbor) id pairs. This is the
eval loop an embedding-dedup/retrieval pipeline runs after every
index rebuild: the ANN index is only as good as its measured recall,
and measuring it costs one extra brute-force pass over the PROBES
(not the corpus), which is exactly how it stays cheap at 100 TB —
probe count is fixed, corpus size only enters through the two
retrieval arms the pipeline already runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .similarity import (
    _DUCK_DOT,
    _DUCK_VECS,
    _SPARK_DOT,
    _labeled_view,
    _vecs_view,
)

_RECALL_K = 5
_PROBES = "(3, 77, 154, 231, 308)"  # the sim_ivf_topk probe set


def _recall_sql(vecs: str, dot: str, broadcast: str) -> str:
    cosq = dot.format(a="q.v", b="c.v") + " / (sqrt(q.n2) * sqrt(c.n2))"
    cosc = (
        dot.format(a="n.v", b="cent.cv") + " / (sqrt(n.n2) * sqrt(cent.cn2))"
    )
    return f"""
WITH n AS ({vecs}),
cent AS (SELECT vec_id AS cent_id, v AS cv, n2 AS cn2 FROM n
         WHERE vec_id % 100 = 0),
assign AS (
  SELECT vec_id, cent_id AS cluster_id
  FROM (
    SELECT {broadcast}
           n.vec_id, cent.cent_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY {cosc} DESC, cent.cent_id
           ) AS rk
    FROM n CROSS JOIN cent
  ) WHERE rk = 1
),
labeled AS (
  SELECT n.*, a.cluster_id FROM n JOIN assign a ON n.vec_id = a.vec_id
),
q AS (SELECT * FROM labeled WHERE vec_id IN {_PROBES}),
ivf AS (
  SELECT q_vec_id, n_vec_id FROM (
    SELECT q.vec_id AS q_vec_id, c.vec_id AS n_vec_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {cosq} DESC, c.vec_id) AS rk
    FROM q JOIN labeled c
      ON q.cluster_id = c.cluster_id AND q.vec_id != c.vec_id
  ) WHERE rk <= {_RECALL_K}
),
exact AS (
  SELECT q_vec_id, n_vec_id FROM (
    SELECT q.vec_id AS q_vec_id, c.vec_id AS n_vec_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {cosq} DESC, c.vec_id) AS rk
    FROM q JOIN n c ON q.vec_id != c.vec_id
  ) WHERE rk <= {_RECALL_K}
)
SELECT e.q_vec_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN i.n_vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overlap,
       CAST(SUM(CASE WHEN i.n_vec_id IS NOT NULL THEN 1 ELSE 0 END)
            * 1000000 {{idiv}} COUNT(*) AS BIGINT) AS recall_ppm
FROM exact e
LEFT JOIN ivf i
  ON i.q_vec_id = e.q_vec_id AND i.n_vec_id = e.n_vec_id
GROUP BY e.q_vec_id
ORDER BY e.q_vec_id
"""


_RECALL_SPARK = f"""
WITH labeled AS (SELECT * FROM {{labeled}}),
q AS (SELECT * FROM labeled WHERE vec_id IN {_PROBES}),
ivf AS (
  SELECT q_vec_id, n_vec_id FROM (
    SELECT q.vec_id AS q_vec_id, c.vec_id AS n_vec_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {{cosq}} DESC, c.vec_id) AS rk
    FROM q JOIN labeled c
      ON q.cluster_id = c.cluster_id AND q.vec_id != c.vec_id
  ) WHERE rk <= {_RECALL_K}
),
exact AS (
  SELECT q_vec_id, n_vec_id FROM (
    SELECT q.vec_id AS q_vec_id, c.vec_id AS n_vec_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {{cosq}} DESC, c.vec_id) AS rk
    FROM q JOIN (SELECT * FROM {{vecs}}) c ON q.vec_id != c.vec_id
  ) WHERE rk <= {_RECALL_K}
)
SELECT e.q_vec_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN i.n_vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overlap,
       CAST(SUM(CASE WHEN i.n_vec_id IS NOT NULL THEN 1 ELSE 0 END)
            * 1000000 DIV COUNT(*) AS BIGINT) AS recall_ppm
FROM exact e
LEFT JOIN ivf i
  ON i.q_vec_id = e.q_vec_id AND i.n_vec_id = e.n_vec_id
GROUP BY e.q_vec_id
ORDER BY e.q_vec_id
"""


def sim_ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of IVF own-cluster retrieval vs exact brute force for
    the five standard probes (see module docstring). The cosine
    expressions are textually identical to ``sim_ivf_topk`` /
    ``sim_bruteforce_topk`` (whose doubles already hash-match the
    oracle), so the ranking — and therefore the recall — is
    engine-exact; the output itself is pure integers.

    Round 11 (guide §2.4): consumes the session-shared parsed-vector
    and IVF-assignment relations (``similarity._vecs_view`` /
    ``_labeled_view``) instead of re-deriving both inline — the CTE
    form recomputed the embedding parse ~5x and the n-by-centroid
    assignment twice per call (Spark inlines CTE references). Same
    per-row-deterministic expressions, so values are identical; the
    DuckDB oracle still spells out the full derivation."""
    labeled = _labeled_view(spark, sf_dir)
    vecs = _vecs_view(spark, sf_dir)
    cosq = (
        _SPARK_DOT.format(a="q.v", b="c.v") + " / (sqrt(q.n2) * sqrt(c.n2))"
    )
    return spark.sql(
        _RECALL_SPARK.format(labeled=labeled, vecs=vecs, cosq=cosq)
    )


_RECALL_DUCK = _recall_sql(_DUCK_VECS, _DUCK_DOT, "").format(idiv="//")


QUERIES = {"sim_ivf_recall_eval": sim_ivf_recall_eval}
ORACLE = {"sim_ivf_recall_eval": _RECALL_DUCK}
