"""Round-4 batch 6: language-model-grade corpus scoring and cleanup
(SURVEY.md §2.9 text-analysis / LLM-pipeline surface; no reference
counterpart — the reference is a single-dataset boat ETL, these are
the corpus operators its engine-replacement must add for training
pipelines).

  * ``text_unigram_surprisal`` — train a corpus unigram LM in one
    aggregate pass, then score every document by its total / average
    surprisal (-ln p(token), micro-nats). The classic perplexity
    proxy for quality filtering (CCNet, Wenzek et al. 2020 use a
    KenLM; the unigram variant is its one-shuffle Spark shape:
    explode -> count -> join back on token). Per-token cost is
    floored to integer micro-nats BEFORE summing, so the aggregate is
    order-independent and engine-exact.
  * ``text_readability`` — Flesch reading-ease over integer counts
    (words, sentence enders with a 15-token fallback for
    unpunctuated corpora, vowel-run syllable proxy). One projection
    scan, no shuffle at all until the (absent) aggregation; emits
    milli-units from a fixed-shape double expression.
  * ``text_boilerplate_strip`` — the CCNet/RefinedWeb repeated-block
    remover in its DROP-ALL form (vs ``text_chunk_dedup``'s
    keep-first): any 3-token block occurring in >= 5 distinct
    documents is boilerplate and every occurrence is removed; the
    document is reassembled in order from surviving blocks. The
    frequency pass shuffles 32-byte md5 keys; reassembly is one
    groupBy with an order-struct sort (no window over the corpus).
  * ``curate_importance_weights`` — DSIR-style importance weights
    (Xie et al. 2023): hashed bigram features (md5 -> 256 buckets),
    target distribution = long documents, weight = sum over features
    of count * ln(p_target/p_corpus) with +1 smoothing, floored to
    integer micro-nats per (doc, bucket) term. The bucket table is
    256 rows — broadcast — so scoring the corpus is ONE shuffle
    (doc-bucket counts), exactly how DSIR runs at trillion-token
    scale.

Engine parity notes: md5 -> int uses Spark ``conv(substring(md5,1,
15),16,10)`` vs DuckDB ``CAST('0x'||substring(md5,1,15) AS
BIGINT)`` (established in textdedup.py); ``ln``/``floor`` on the
same double inputs agree across libm/JVM within the floored
precision; all sums are over BIGINT terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table


def _docs_view(spark: SparkSession, sf_dir: str, name: str) -> str:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(name)
    return name


# ---------------------------------------------------------------------------
# Unigram LM surprisal
# ---------------------------------------------------------------------------

def _surprisal_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame form of the unigram-surprisal plan. The vocabulary
    (token -> corpus count) is persisted via ``track_persist``: it is
    bounded by vocabulary size (not corpus size — ~1M rows for a web
    corpus), and without the persist each of its three consumers
    (scored join, total-token scalar) would re-run the corpus
    explode+count."""
    from pyspark.sql import functions as F

    from . import track_persist

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.expr("filter(split(text, ' '), x -> x != '')")).alias(
            "tok"
        ),
    )
    counts = track_persist(tok.groupBy("tok").agg(F.count("*").alias("c")))
    tot = counts.agg(F.sum("c").alias("s"))
    scored = (
        tok.join(counts, "tok")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "doc_id",
            "CAST(floor(-ln(CAST(c AS DOUBLE) / s) * 1000000) AS BIGINT)"
            " AS cost_micro",
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum("cost_micro").alias("surprisal_micro"),
        F.expr("SUM(cost_micro) DIV COUNT(*)").alias("avg_surprisal_micro"),
    )

_SURPRISAL_DUCK = """
WITH tok AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
        FROM documents), UNNEST(t) AS u(tok)
), counts AS (
  SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS s FROM counts
), scored AS (
  SELECT t.doc_id,
         CAST(floor(-ln(CAST(c.c AS DOUBLE) / tot.s) * 1000000) AS BIGINT)
           AS cost_micro
  FROM tok t JOIN counts c ON t.tok = c.tok CROSS JOIN tot
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(cost_micro) AS BIGINT) AS surprisal_micro,
       CAST(SUM(cost_micro) // COUNT(*) AS BIGINT) AS avg_surprisal_micro
FROM scored
GROUP BY doc_id
"""


def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus unigram LM + per-document surprisal. The corpus is
    exploded ONCE (the persisted vocabulary severs the other two
    consumers' lineage); shuffles are the vocabulary count and the
    doc re-aggregation, and the token->count join is AQE-broadcast
    when the vocabulary fits (at 100 TB prune to a min-count vocab,
    back-off cost for OOV)."""
    return _surprisal_plan(spark, sf_dir)


# ---------------------------------------------------------------------------
# Flesch readability
# ---------------------------------------------------------------------------

_READABILITY_SPARK = """
WITH base AS (
  SELECT doc_id,
         size(filter(split(text, ' '), x -> x != '')) AS w,
         size(split(text, '[.!?]+')) - 1 AS enders,
         length(regexp_replace(lower(text), '[aeiouy]+', '@'))
           - length(regexp_replace(lower(text), '[aeiouy]', '')) AS syl
  FROM {docs}
), norm AS (
  SELECT doc_id, w,
         CASE WHEN enders > 0 THEN enders
              ELSE CAST(ceil(w / 15.0) AS INT) END AS s,
         greatest(syl, 1) AS syl
  FROM base WHERE w > 0
)
SELECT doc_id,
       CAST(w AS BIGINT) AS n_words,
       CAST(s AS BIGINT) AS n_sentences,
       CAST(syl AS BIGINT) AS n_syllables,
       CAST(floor((206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
                   - 84.6 * (CAST(syl AS DOUBLE) / w)) * 1000) AS BIGINT)
         AS flesch_milli
FROM norm
"""

_READABILITY_DUCK = """
WITH base AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x != '')) AS w,
         len(regexp_split_to_array(text, '[.!?]+')) - 1 AS enders,
         length(regexp_replace(lower(text), '[aeiouy]+', '@', 'g'))
           - length(regexp_replace(lower(text), '[aeiouy]', '', 'g')) AS syl
  FROM documents
), norm AS (
  SELECT doc_id, w,
         CASE WHEN enders > 0 THEN enders
              ELSE CAST(ceil(w / 15.0) AS INT) END AS s,
         greatest(syl, 1) AS syl
  FROM base WHERE w > 0
)
SELECT doc_id,
       CAST(w AS BIGINT) AS n_words,
       CAST(s AS BIGINT) AS n_sentences,
       CAST(syl AS BIGINT) AS n_syllables,
       CAST(floor((206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
                   - 84.6 * (CAST(syl AS DOUBLE) / w)) * 1000) AS BIGINT)
         AS flesch_milli
FROM norm
"""


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease, integer inputs, milli-unit output. Pure
    per-row projection — zero exchanges, whole-stage codegen end to
    end; the sentence fallback (ceil(words/15)) keeps the score
    defined on unpunctuated corpora like this fixture."""
    docs = _docs_view(spark, sf_dir, "textlm_readability_docs")
    return spark.sql(_READABILITY_SPARK.format(docs=docs))


# ---------------------------------------------------------------------------
# Boilerplate strip (drop-all repeated blocks)
# ---------------------------------------------------------------------------

_BP_TOKENS = 3
_BP_MIN_DOCS = 5

_BOILER_SPARK = f"""
WITH w AS (
  SELECT doc_id, filter(split(text, ' '), x -> x != '') AS words FROM {{docs}}
), c AS (
  SELECT doc_id, i AS block_idx,
         array_join(slice(words, i * {_BP_TOKENS} + 1, {_BP_TOKENS}), ' ')
           AS block
  FROM w
  LATERAL VIEW explode(sequence(0,
      CAST(ceil(size(words) / {_BP_TOKENS}.0) AS INT) - 1)) e AS i
  WHERE size(words) > 0
), h AS (
  SELECT doc_id, block_idx, block, md5(block) AS hh FROM c
), boiler AS (
  SELECT hh FROM h GROUP BY hh
  HAVING COUNT(DISTINCT doc_id) >= {_BP_MIN_DOCS}
), flagged AS (
  SELECT h.doc_id, h.block_idx, h.block,
         (b.hh IS NOT NULL) AS is_boiler
  FROM h LEFT JOIN boiler b ON h.hh = b.hh
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler,
       md5(array_join(transform(
             array_sort(collect_list(CASE WHEN NOT is_boiler
                 THEN struct(block_idx, block) END)),
             x -> x.block), ' ')) AS clean_md5
FROM flagged
GROUP BY doc_id
"""

_BOILER_DUCK = f"""
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS words
  FROM documents
), c AS (
  SELECT doc_id, i AS block_idx,
         array_to_string(list_slice(words, i * {_BP_TOKENS} + 1,
                                    i * {_BP_TOKENS} + {_BP_TOKENS}), ' ')
           AS block
  FROM w, UNNEST(range(CAST(ceil(len(words) / {_BP_TOKENS}.0) AS BIGINT)))
           AS t(i)
  WHERE len(words) > 0
), h AS (
  SELECT doc_id, block_idx, block, md5(block) AS hh FROM c
), boiler AS (
  SELECT hh FROM h GROUP BY hh
  HAVING COUNT(DISTINCT doc_id) >= {_BP_MIN_DOCS}
), flagged AS (
  SELECT h.doc_id, h.block_idx, h.block,
         (b.hh IS NOT NULL) AS is_boiler
  FROM h LEFT JOIN boiler b ON h.hh = b.hh
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler,
       md5(coalesce(array_to_string(list(block ORDER BY block_idx)
             FILTER (WHERE NOT is_boiler), ' '), '')) AS clean_md5
FROM flagged
GROUP BY doc_id
"""


def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop EVERY occurrence of any 3-token block shared by >= 5
    distinct documents, reassemble documents in order, and report the
    removal stats plus the md5 of the cleaned text. The frequency
    pass groups on md5(block) (32-byte shuffle keys); the block text
    itself travels only through the per-document reassembly groupBy
    (same width as the input corpus — the unavoidable floor for a
    rewrite op). Spark's unordered ``collect_list`` is made
    deterministic with an (idx, block) struct sort; the oracle uses
    DuckDB's ordered-filtered ``list`` aggregate."""
    docs = _docs_view(spark, sf_dir, "textlm_boiler_docs")
    return spark.sql(_BOILER_SPARK.format(docs=docs))


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 256
_DSIR_TARGET_CHARS = 400

# the (doc, bucket) count relation is built ONCE in the DataFrame
# layer and persisted (bounded: docs x <=256 rows) — every downstream
# relation (bucket distributions, per-doc scoring join) derives from
# it, so the corpus is tokenized exactly once. Expressing it as a CTE
# would inline-and-recompute the bigram explode at every reference
# (measured: 3 tokenize passes).
_DSIR_DOCBUCKET_SPARK = f"""
WITH w AS (
  SELECT doc_id, n_chars >= {_DSIR_TARGET_CHARS} AS is_target,
         filter(split(text, ' '), x -> x != '') AS t
  FROM {{docs}}
), bg AS (
  SELECT doc_id, is_target,
         CAST(conv(substring(md5(concat(element_at(t, i), ' ',
                                        element_at(t, i + 1))), 1, 15),
                   16, 10) AS BIGINT) % {_DSIR_BUCKETS} AS bucket
  FROM w LATERAL VIEW explode(sequence(1, size(t) - 1)) e AS i
  WHERE size(t) >= 2
)
SELECT doc_id, is_target, bucket, COUNT(*) AS c
FROM bg GROUP BY doc_id, is_target, bucket
"""

_DSIR_SCORE_SPARK = f"""
WITH dist AS (
  SELECT bucket, SUM(c) AS q_c,
         SUM(CASE WHEN is_target THEN c ELSE 0 END) AS p_c
  FROM {{docbucket}} GROUP BY bucket
), distt AS (
  SELECT bucket, q_c, p_c,
         SUM(q_c) OVER () AS tq, SUM(p_c) OVER () AS tp
  FROM dist
), lam AS (
  SELECT bucket,
         ln((CAST(p_c + 1 AS DOUBLE) / CAST(tp + {_DSIR_BUCKETS} AS DOUBLE))
            / (CAST(q_c + 1 AS DOUBLE)
               / CAST(tq + {_DSIR_BUCKETS} AS DOUBLE))) AS lr
  FROM distt
)
SELECT d.doc_id,
       SUM(d.c) AS n_bigrams,
       SUM(CAST(floor(d.c * l.lr * 1000000) AS BIGINT)) AS weight_micro
FROM {{docbucket}} d JOIN lam l ON d.bucket = l.bucket
GROUP BY d.doc_id
"""

_DSIR_DUCK = f"""
WITH w AS (
  SELECT doc_id, n_chars >= {_DSIR_TARGET_CHARS} AS is_target,
         list_filter(string_split(text, ' '), x -> x != '') AS t
  FROM documents
), bg AS (
  SELECT doc_id, is_target,
         CAST(concat('0x', substring(md5(t[i] || ' ' || t[i + 1]), 1, 15))
              AS BIGINT) % {_DSIR_BUCKETS} AS bucket
  FROM w, UNNEST(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
), dist AS (
  SELECT bucket, COUNT(*) AS q_c,
         SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS p_c
  FROM bg GROUP BY bucket
), tot AS (
  SELECT SUM(q_c) AS tq, SUM(p_c) AS tp FROM dist
), lam AS (
  SELECT bucket,
         ln((CAST(p_c + 1 AS DOUBLE) / CAST(tp + {_DSIR_BUCKETS} AS DOUBLE))
            / (CAST(q_c + 1 AS DOUBLE)
               / CAST(tq + {_DSIR_BUCKETS} AS DOUBLE))) AS lr
  FROM dist CROSS JOIN tot
), docbucket AS (
  SELECT doc_id, bucket, COUNT(*) AS c FROM bg GROUP BY doc_id, bucket
)
SELECT d.doc_id,
       CAST(SUM(d.c) AS BIGINT) AS n_bigrams,
       CAST(SUM(CAST(floor(d.c * l.lr * 1000000) AS BIGINT)) AS BIGINT)
         AS weight_micro
FROM docbucket d JOIN lam l ON d.bucket = l.bucket
GROUP BY d.doc_id
"""


def curate_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-bigram importance weights: target = long documents,
    features = md5-hashed bigrams in 256 buckets, per-document weight
    = sum of count * log-likelihood-ratio, +1-smoothed. ONE corpus
    shuffle builds the persisted (doc, bucket) counts; both bucket
    distributions and the scoring join read that relation (the corpus
    tokenizes exactly once), and the 256-row log-ratio table joins
    back broadcast-size. Terms are floored to integer micro-nats
    before summing so the weight is order-independent."""
    from . import track_persist

    docs = _docs_view(spark, sf_dir, "textlm_dsir_docs")
    docbucket = track_persist(
        spark.sql(_DSIR_DOCBUCKET_SPARK.format(docs=docs))
    )
    docbucket.createOrReplaceTempView("textlm_dsir_docbucket")
    return spark.sql(_DSIR_SCORE_SPARK.format(docbucket="textlm_dsir_docbucket"))


QUERIES = {
    "text_unigram_surprisal": text_unigram_surprisal,
    "text_readability": text_readability,
    "text_boilerplate_strip": text_boilerplate_strip,
    "curate_importance_weights": curate_importance_weights,
}

ORACLE = {
    "text_unigram_surprisal": _SURPRISAL_DUCK,
    "text_readability": _READABILITY_DUCK,
    "text_boilerplate_strip": _BOILER_DUCK,
    "curate_importance_weights": _DSIR_DUCK,
}


# ---------------------------------------------------------------------------
# Per-source token entropy
# ---------------------------------------------------------------------------

_ENTROPY_SPARK = """
WITH tok AS (
  SELECT source, tok
  FROM (SELECT source, filter(split(text, ' '), x -> x != '') AS t
        FROM {docs})
  LATERAL VIEW explode(t) e AS tok
), counts AS (
  SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY source, tok
), tot AS (
  SELECT source, SUM(c) AS s, COUNT(*) AS vocab FROM counts GROUP BY source
)
SELECT c.source,
       CAST(max(t.s) AS BIGINT) AS n_tokens,
       CAST(max(t.vocab) AS BIGINT) AS n_vocab,
       CAST(SUM(CAST(floor(-(CAST(c.c AS DOUBLE) / t.s)
                           * ln(CAST(c.c AS DOUBLE) / t.s) * 1e9)
                     AS BIGINT)) AS BIGINT) AS entropy_nano_nats
FROM counts c JOIN tot t ON c.source = t.source
GROUP BY c.source
"""

_ENTROPY_DUCK = """
WITH tok AS (
  SELECT source, tok
  FROM (SELECT source, list_filter(string_split(text, ' '), x -> x != '') AS t
        FROM documents), UNNEST(t) AS u(tok)
), counts AS (
  SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY source, tok
), tot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS s, COUNT(*) AS vocab
  FROM counts GROUP BY source
)
SELECT c.source,
       CAST(max(t.s) AS BIGINT) AS n_tokens,
       CAST(max(t.vocab) AS BIGINT) AS n_vocab,
       CAST(SUM(CAST(floor(-(CAST(c.c AS DOUBLE) / t.s)
                           * ln(CAST(c.c AS DOUBLE) / t.s) * 1e9)
                     AS BIGINT)) AS BIGINT) AS entropy_nano_nats
FROM counts c JOIN tot t ON c.source = t.source
GROUP BY c.source
"""


def text_entropy_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's token distribution (nano-nats,
    per-term floor before the sum so the statistic is exact). Low
    entropy flags TEMPLATED/repetitive sources in a training mix; the
    cost is one (source, token) count aggregate — map-side combined —
    plus a per-source rollup. The per-term expression is written with
    p multiplied before ln so both engines evaluate the identical
    double tree."""
    docs = _docs_view(spark, sf_dir, "textlm_entropy_docs")
    return spark.sql(_ENTROPY_SPARK.format(docs=docs))


QUERIES["text_entropy_per_source"] = text_entropy_per_source
ORACLE["text_entropy_per_source"] = _ENTROPY_DUCK
