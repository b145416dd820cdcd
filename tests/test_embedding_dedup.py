"""Quality pin for `dedup_embedding_cosine`: the LSH-bucketed result
must equal the brute-force all-pairs truth (cos >= 0.95 over the same
hashed-BoW embedding) — i.e. the centered-band candidate generator has
100% recall on the fixture, and the verify step makes precision exact
by construction.
"""

from __future__ import annotations

from boat_etl_pyspark_spark.plans import textdedup
from tests.conftest import SF_CORRECTNESS

_BRUTE_TRUTH = """
WITH dims AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(tok), 1, 6) AS BIGINT) % 512 AS d,
         COUNT(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok != ''
  GROUP BY 1, 2
),
norms AS (SELECT doc_id, SUM(c * c) AS n2 FROM dims GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS da, b.doc_id AS db, SUM(a.c * b.c) AS dot
  FROM dims a JOIN dims b ON a.d = b.d AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT da, db
FROM dots JOIN norms na ON na.doc_id = da JOIN norms nb ON nb.doc_id = db
WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.95
"""


def test_lsh_result_equals_bruteforce_truth(spark, oracle):
    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in textdedup.dedup_embedding_cosine(spark, SF_CORRECTNESS).collect()
    }
    con = oracle(SF_CORRECTNESS)
    truth = {tuple(r) for r in con.execute(_BRUTE_TRUTH).fetchall()}
    assert truth, "fixture should contain near-dup pairs"
    missed = truth - got
    extra = got - truth
    assert not missed, f"LSH candidate generation missed true pairs: {sorted(missed)[:5]}"
    assert not extra, f"pairs below threshold leaked through verify: {sorted(extra)[:5]}"
