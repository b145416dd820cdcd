"""Round-4 batch 2: corpus language-model statistics and mixture
curation (SURVEY.md §2.9 text-analysis / LLM-pipeline surface).

  * ``text_bigram_rarity`` — train corpus-wide bigram counts, score
    every document by average inverse bigram frequency (integer ppm):
    the cheap novelty / memorization-risk signal (rare-n-gram-heavy
    documents) used to triage training corpora. Integer division per
    term keeps the score associative and engine-exact.
  * ``text_bpe_pair_stats`` — the first step of BPE tokenizer
    training: global adjacent-character-pair frequencies within
    tokens, top 20. On 100 TB this is the exact shape of the real
    thing — explode to (pair) keys, one combine-heavy count, tiny
    result.
  * ``curate_mixture_weights`` — per-(lang, source) token counts and
    the integer ppm down-sampling weight that equalizes every group
    to the smallest one: the mixture-balancing step before sampling a
    training corpus. One aggregate plus a broadcast scalar.

All scores are scaled integers (ppm): float division would make the
result order-dependent; ``1000000 DIV f`` is exact and identical in
Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table


def _docs_view(spark: SparkSession, sf_dir: str, name: str) -> str:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(name)
    return name


# ---------------------------------------------------------------------------
# Bigram rarity scoring
# ---------------------------------------------------------------------------

_BIGRAM_SPARK = """
WITH toks AS (
  SELECT doc_id, filter(split(text, ' '), x -> x != '') AS t FROM {docs}
), bg AS (
  SELECT doc_id,
         explode(transform(sequence(1, size(t) - 1),
                           i -> concat(t[i-1], ' ', t[i]))) AS bigram
  FROM toks WHERE size(t) >= 2
), freq AS (
  SELECT bigram, COUNT(*) AS f FROM bg GROUP BY bigram
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(1000000 DIV f) AS BIGINT) AS rarity_sum_ppm,
       CAST(SUM(1000000 DIV f) DIV COUNT(*) AS BIGINT) AS rarity_avg_ppm,
       CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
FROM bg JOIN freq USING (bigram)
GROUP BY doc_id
"""

_BIGRAM_DUCK = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
), bg AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS bigram
  FROM toks, (SELECT unnest(range(1, 600)) AS i)
  WHERE i <= len(t) - 1
), freq AS (
  SELECT bigram, COUNT(*) AS f FROM bg GROUP BY bigram
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(1000000 // f) AS BIGINT) AS rarity_sum_ppm,
       CAST(SUM(1000000 // f) // COUNT(*) AS BIGINT) AS rarity_avg_ppm,
       CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
FROM bg JOIN freq USING (bigram)
GROUP BY doc_id
"""


def text_bigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average inverse corpus-bigram-frequency per document, in exact
    integer ppm. The frequency table is itself a one-shuffle count;
    the score join ships (bigram, f) pairs — no document bodies move
    after the initial tokenize."""
    docs = _docs_view(spark, sf_dir, "__docs_bigram")
    return spark.sql(_BIGRAM_SPARK.format(docs=docs))


# ---------------------------------------------------------------------------
# BPE first-merge pair statistics
# ---------------------------------------------------------------------------

_BPE_SPARK = """
WITH toks AS (
  SELECT explode(filter(split(text, ' '), x -> x != '')) AS tok FROM {docs}
), pairs AS (
  SELECT explode(transform(sequence(1, length(tok) - 1),
                           i -> substring(tok, i, 2))) AS pair
  FROM toks WHERE length(tok) BETWEEN 2 AND 512
), counted AS (
  SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY pair
)
SELECT pair, n, CAST(rk AS BIGINT) AS rk
FROM (SELECT pair, n,
             row_number() OVER (ORDER BY n DESC, pair) AS rk
      FROM counted)
WHERE rk <= 20
"""

_BPE_DUCK = """
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents
), pairs AS (
  SELECT substring(tok, i, 2) AS pair
  FROM toks, (SELECT unnest(range(1, 512)) AS i)
  WHERE length(tok) BETWEEN 2 AND 512 AND i <= length(tok) - 1
), counted AS (
  SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY pair
)
SELECT pair, n, CAST(rk AS BIGINT) AS rk
FROM (SELECT pair, n,
             row_number() OVER (ORDER BY n DESC, pair) AS rk
      FROM counted)
WHERE rk <= 20
"""


def text_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent character pairs inside tokens — the statistic
    the first BPE merge is chosen from. Partial counts combine
    map-side (a few hundred distinct pairs), so the shuffle is tiny
    regardless of corpus size; the top-k window runs on the counted
    result, not the raw pairs. Tokens longer than
    contract.TEXT_MAX_TOKEN (512, pinned by the hygiene test) are
    corrupt ingest (minified blobs, not words) and are excluded
    symmetrically — they'd mint a linear-in-length pair stream each."""
    docs = _docs_view(spark, sf_dir, "__docs_bpe")
    return spark.sql(_BPE_SPARK.format(docs=docs))


# ---------------------------------------------------------------------------
# Mixture weights (source balancing)
# ---------------------------------------------------------------------------


def curate_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Down-sampling weight per (lang, source) group that equalizes
    token budgets to the smallest group: weight_ppm = 1e6 *
    min_tokens / group_tokens (integer), planned_tokens the resulting
    budget. The group aggregate is one shuffle; the scalar min rides
    a broadcast cross join — nothing leaves the executors but one
    row."""
    docs = load_table(spark, sf_dir, "documents")
    grp = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.expr("filter(split(text, ' '), x -> x != '')")))
        .alias("n_tokens"),
    )
    m = grp.agg(F.min("n_tokens").alias("__min_tokens"))
    return (
        grp.crossJoin(F.broadcast(m))
        .select(
            "lang",
            "source",
            "n_docs",
            "n_tokens",
            F.expr("1000000 * __min_tokens DIV n_tokens").alias("weight_ppm"),
            F.expr("n_tokens * (1000000 * __min_tokens DIV n_tokens) DIV 1000000")
            .alias("planned_tokens"),
        )
    )


_MIXTURE_DUCK = """
WITH grp AS (
  SELECT lang, source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1, 2
), m AS (SELECT MIN(n_tokens) AS min_tokens FROM grp)
SELECT lang, source, n_docs, n_tokens,
       CAST(1000000 * min_tokens // n_tokens AS BIGINT) AS weight_ppm,
       CAST(n_tokens * (1000000 * min_tokens // n_tokens) // 1000000 AS BIGINT)
         AS planned_tokens
FROM grp, m
"""


QUERIES = {
    "text_bigram_rarity": text_bigram_rarity,
    "text_bpe_pair_stats": text_bpe_pair_stats,
    "curate_mixture_weights": curate_mixture_weights,
}

ORACLE = {
    "text_bigram_rarity": _BIGRAM_DUCK,
    "text_bpe_pair_stats": _BPE_DUCK,
    "curate_mixture_weights": _MIXTURE_DUCK,
}
