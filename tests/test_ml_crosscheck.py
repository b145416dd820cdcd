"""Cross-validation of the hand-rolled MinHash-LSH against
pyspark.ml.feature.MinHashLSH: two independent implementations
(different hash families, different banding) must agree on the
near-duplicate pairs of the fixture. The ML variant is probabilistic,
so the assertion allows it to miss a small tail but never to find a
pair we rejected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def our_pairs(spark):
    import __spark_entry__ as m

    rows = m.queries()["dedup_minhash_lsh"](spark, SF_SMOKE).collect()
    return {(r["doc_a"], r["doc_b"]) for r in rows}


def test_ml_minhash_agrees(spark, our_pairs):
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from boat_etl_pyspark_spark.plans.textdedup import _SPARK_SHINGLES
    from boat_etl_pyspark_spark.sources.readers import load_table

    load_table(spark, SF_SMOKE, "documents").createOrReplaceTempView("__ml_docs")
    sh = spark.sql(_SPARK_SHINGLES.format(docs="__ml_docs"))
    tf = HashingTF(inputCol="s", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(sh).select("doc_id", "features")
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=16, seed=42
    )
    model = lsh.fit(feats)
    # Jaccard distance <= 0.4  <=>  Jaccard similarity >= 0.6
    joined = model.approxSimilarityJoin(feats, feats, 0.4, distCol="dist")
    ml_pairs = {
        (r["datasetA"]["doc_id"], r["datasetB"]["doc_id"])
        for r in joined.where(
            F.col("datasetA.doc_id") < F.col("datasetB.doc_id")
        ).collect()
    }
    # no false pairs relative to our exact-verified output...
    assert ml_pairs <= our_pairs
    # ...and near-full recall (probabilistic banding may drop a tail)
    if our_pairs:
        assert len(ml_pairs) >= 0.8 * len(our_pairs)
