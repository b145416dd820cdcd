"""Round-3 batch 4: transition analytics, weighted sampling,
containment dedup.

  * ``events_markov_transitions`` — event-type transition matrix
    (lag-pair counts + integer-ppm transition probabilities): the
    first-order Markov view behind funnel and path analysis.
  * ``curate_weighted_sample`` — deterministic weighted corpus
    sampling: keep probability proportional to a per-doc weight,
    decided by comparing an md5 bucket against the weight — the
    reproducible-across-engines/runs form of importance sampling used
    to rebalance training mixes (no RNG, no seed drift; the identical
    rule re-selects the identical corpus anywhere).
  * ``text_containment_dedup`` — shingle CONTAINMENT |A∩B|/min(|A|,|B|)
    over rare-shingle candidate pairs: catches a document embedded
    inside a larger one, which symmetric Jaccard under-scores (a 50-gram
    doc fully contained in a 500-gram doc has Jaccard ~0.1 but
    containment 1.0). Same skew-proof df-capped inverted-index
    candidate generation as the Jaccard op; integer-ppm scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import track_persist
from ..sources.readers import load_table

# ---------------------------------------------------------------------------
# Markov transition matrix over event streams
# ---------------------------------------------------------------------------


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts and probabilities. One
    shuffle on user_id for the lag window (ties on ts broken by
    event_id in both engines), then a global (prev, next) count —
    map-side combined, 25 output rows. Probabilities are integer ppm
    of each prev-state's outgoing total. The transition relation is
    the session-shared `markov_trans_cached` build (one lag window
    serves this query and the stationary-distribution consumer);
    `tot` there is the same per-prev window sum `__total` was."""
    from .relational44 import markov_trans_cached

    return markov_trans_cached(spark, sf_dir).select(
        F.col("prev").alias("prev_event"),
        F.col("next").alias("next_event"),
        F.col("c").alias("n_transitions"),
        F.expr("c * 1000000 DIV tot").cast("bigint").alias("prob_ppm"),
    )


_MARKOV_SQL = """
WITH pairs AS (
  SELECT prev_event, event_type AS next_event, COUNT(*) AS n_transitions
  FROM (
    SELECT event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_event
    FROM events
    WHERE ts IS NOT NULL AND user_id IS NOT NULL
      AND event_type IS NOT NULL
  )
  WHERE prev_event IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_event, next_event, n_transitions,
       CAST(n_transitions * 1000000
            // SUM(n_transitions) OVER (PARTITION BY prev_event)
            AS BIGINT) AS prob_ppm
FROM pairs
"""


# ---------------------------------------------------------------------------
# Deterministic weighted sampling
# ---------------------------------------------------------------------------

_W_SCALE = 1_000_000


def curate_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-style corpus sampling with keep probability
    proportional to document length (the stand-in for any per-doc
    quality weight): keep iff md5-bucket(doc_id) < weight_ppm. Pure
    map pass — no shuffle, no RNG; the same rule reproduces the same
    sample on any engine, any partitioning, any rerun (and is stable
    under corpus growth: adding documents never flips existing
    decisions — the property random sampling lacks)."""
    docs = load_table(spark, sf_dir, "documents")
    w_ppm = F.least(F.lit(_W_SCALE), F.col("n_chars") * 800)
    bucket = F.expr(
        f"CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 6), 16, 10) AS BIGINT)"
        f" % {_W_SCALE}"
    )
    return docs.select(
        "doc_id",
        w_ppm.cast("bigint").alias("weight_ppm"),
        (bucket < w_ppm).alias("kept"),
    )


_WEIGHTED_SQL = f"""
SELECT doc_id,
       CAST(LEAST({_W_SCALE}, n_chars * 800) AS BIGINT) AS weight_ppm,
       (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
          % {_W_SCALE})
         < LEAST({_W_SCALE}, n_chars * 800) AS kept
FROM documents
"""


# ---------------------------------------------------------------------------
# Containment dedup (sub-document duplicates)
# ---------------------------------------------------------------------------

_DF_CAP = 20
_CONT_THRESHOLD_PPM = 400_000


def text_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by shingle CONTAINMENT: |A∩B| / min(|A|,|B|),
    the metric that catches one document embedded in another (Jaccard
    divides by the UNION and under-scores subset relations). Candidate
    pairs come from the shared-rare-5-gram inverted index (document
    frequency cap {cap}: hot boilerplate shingles are dropped, so the
    index is skew-proof and bucket joins stay bounded); only candidate
    pairs compute the exact intersection. Scores are integer ppm —
    exact in both engines.""".format(cap=_DF_CAP)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__cont_docs")
    sets = spark.sql(
        """
        SELECT doc_id,
               array_distinct(transform(sequence(1, greatest(size(t) - 4, 1)),
                   i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1),
                                  element_at(t, i + 2), element_at(t, i + 3),
                                  element_at(t, i + 4)))) AS s
        FROM (SELECT doc_id, split(text, ' ') AS t FROM __cont_docs)
        """
    )
    sets = track_persist(sets)
    inv = sets.select("doc_id", F.explode("s").alias("gram"))
    rare = (
        inv.groupBy("gram")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= _DF_CAP)
        .select("gram")
    )
    rare_inv = inv.join(rare, "gram")
    a, b = rare_inv.alias("a"), rare_inv.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    x = sets.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    y = sets.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    cont_ppm = F.expr(
        "CAST(CAST(size(array_intersect(sa, sb)) AS BIGINT) * 1000000"
        " DIV least(size(sa), size(sb)) AS BIGINT)"
    )
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select("doc_a", "doc_b", cont_ppm.alias("containment_ppm"))
        .where(F.col("containment_ppm") >= _CONT_THRESHOLD_PPM)
    )


_CONTAINMENT_SQL = f"""
WITH sets AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 4, 1) + 1),
             i -> concat_ws(' ', t[i], t[i + 1], t[i + 2], t[i + 3], t[i + 4]))) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
), inv AS (
  SELECT doc_id, unnest(s) AS gram FROM sets
), rare AS (
  SELECT gram FROM inv GROUP BY gram HAVING COUNT(*) <= {_DF_CAP}
), rare_inv AS (
  SELECT i.doc_id, i.gram FROM inv i JOIN rare r ON i.gram = r.gram
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM rare_inv a JOIN rare_inv b
    ON a.gram = b.gram AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(CAST(len(list_intersect(x.s, y.s)) AS BIGINT) * 1000000
            // LEAST(len(x.s), len(y.s)) AS BIGINT) AS containment_ppm
FROM cand c
JOIN sets x ON x.doc_id = c.doc_a
JOIN sets y ON y.doc_id = c.doc_b
WHERE CAST(CAST(len(list_intersect(x.s, y.s)) AS BIGINT) * 1000000
           // LEAST(len(x.s), len(y.s)) AS BIGINT) >= {_CONT_THRESHOLD_PPM}
"""


QUERIES = {
    "events_markov_transitions": events_markov_transitions,
    "curate_weighted_sample": curate_weighted_sample,
    "text_containment_dedup": text_containment_dedup,
}

ORACLE = {
    "events_markov_transitions": _MARKOV_SQL,
    "curate_weighted_sample": _WEIGHTED_SQL,
    "text_containment_dedup": _CONTAINMENT_SQL,
}
