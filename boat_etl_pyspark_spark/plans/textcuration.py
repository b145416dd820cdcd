"""Round-3 LLM-training-data curation operators.

Extends the dedup/quality family (SURVEY.md §2.9, textdedup.py) with
the remaining curation ops a 100 TB pretraining pipeline runs:

  * PII redaction (regex scrub of emails / IPv4, counted per doc),
  * Gopher-style repetition stats (top-word & duplicate-word
    fractions — the "remove boilerplate/spam" quality signals),
  * corpus-level chunk dedup (exact substring-block dedup: the
    C4/RefinedWeb line-dedup pattern generalized to fixed token
    blocks; first occurrence wins corpus-wide),
  * Unicode NFC normalization (Arrow-vectorized pandas UDF — Spark
    has no built-in normalizer; the oracle is DuckDB's
    ``nfc_normalize``),
  * corpus vocabulary stats (two-level map-side-combining aggregation),
  * blocked-matmul brute-force ANN (mapInPandas + one int64 numpy
    matmul per Arrow batch — the BLAS-shaped scale path for exact
    top-k, vs. the per-row HOF arithmetic of ``sim_bruteforce_topk``).

Determinism: every fraction is ppm via ``floor(x*1e6 + 0.5)``; vector
scores are int64 fixed-point (floor(x*1e6+0.5) per element, exact
integer dot products); first-occurrence ties break on (doc_id,
chunk_idx); all hashes are md5.

PII/text rows are synthetic (the fixture corpus carries no real PII);
the contact strings are DERIVED DETERMINISTICALLY inside the query so
the redaction path is exercised end-to-end and oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..sources.readers import load_table
from .contract import EMB_VALID_SPARK, TEXT_VALID_DUCK, text_valid

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub emails and IPv4 addresses, report per-doc match counts and
    the redacted-text hash. Pure codegen'd regexp expressions — the
    whole op is a projection, no shuffle, embarrassingly parallel at
    any scale. The synthetic contact suffix (one email + one IP built
    from doc_id) guarantees the redaction path fires on every row."""
    docs = load_table(spark, sf_dir, "documents")
    body = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(body, _EMAIL_RE, "<EMAIL>"), _IPV4_RE, "<IP>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(body, F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(body, F.lit(_IPV4_RE)).cast("bigint").alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    )


_PII_SQL = f"""
WITH body AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.1' AS s
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(s, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(s, '{_IPV4_RE}')) AS BIGINT) AS n_ips,
       md5(regexp_replace(regexp_replace(s, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_IPV4_RE}', '<IP>', 'g')) AS redacted_md5
FROM body
"""


# ---------------------------------------------------------------------------
# Gopher-style repetition stats
# ---------------------------------------------------------------------------


def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition quality signals (Gopher rules): fraction of
    tokens belonging to the most frequent word, and duplicate-token
    fraction (1 - distinct/total). Explode -> two-level aggregation;
    the word-level partial aggregate combines map-side, so the shuffle
    carries (doc, word) counts, not token instances."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    per_word = words.groupBy("doc_id", "word").agg(F.count("*").alias("cnt"))
    return per_word.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.expr("CAST(MAX(cnt) * 1000000 DIV SUM(cnt) AS BIGINT)").alias(
            "top_word_ppm"
        ),
        F.expr(
            "CAST((SUM(cnt) - COUNT(*)) * 1000000 DIV SUM(cnt) AS BIGINT)"
        ).alias("dup_token_ppm"),
    )


_REPETITION_SQL = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), per_word AS (
  SELECT doc_id, word, COUNT(*) AS cnt FROM words GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_distinct,
       CAST(MAX(cnt) * 1000000 // SUM(cnt) AS BIGINT) AS top_word_ppm,
       CAST((SUM(cnt) - COUNT(*)) * 1000000 // SUM(cnt) AS BIGINT) AS dup_token_ppm
FROM per_word
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Corpus-level chunk dedup (exact substring blocks)
# ---------------------------------------------------------------------------

_CHUNK_TOKENS = 10


def text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of fixed-size token blocks ACROSS the corpus: every
    doc is cut into 10-token chunks, a chunk survives only at its first
    occurrence (min (doc_id, chunk_idx)) — the C4/RefinedWeb repeated-
    boilerplate remover. The shuffle key is md5(chunk), 32 bytes, never
    the text; the first-occurrence choice is one window over the hash
    partition. Per-doc output: chunks kept vs dropped."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    chunks = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(split(text, ' ')) / {_CHUNK_TOKENS}.0) AS INT) - 1),"
                f" i -> array_join(slice(split(text, ' '), i * {_CHUNK_TOKENS} + 1, {_CHUNK_TOKENS}), ' '))"
            )
        ).alias("chunk_idx", "chunk"),
    ).select("doc_id", "chunk_idx", F.md5("chunk").alias("h"))
    w = Window.partitionBy("h").orderBy("doc_id", "chunk_idx")
    flagged = chunks.withColumn("rn", F.row_number().over(w))
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_dropped"),
    )


_CHUNK_DEDUP_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
  WHERE text IS NOT NULL
), c AS (
  SELECT doc_id, i AS chunk_idx,
         md5(array_to_string(
               list_slice(words, i * {_CHUNK_TOKENS} + 1,
                          i * {_CHUNK_TOKENS} + {_CHUNK_TOKENS}), ' ')) AS h
  FROM w, UNNEST(range(CAST(ceil(len(words) / {_CHUNK_TOKENS}.0) AS BIGINT))) AS t(i)
), r AS (
  SELECT doc_id, chunk_idx,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn
  FROM c
)
SELECT doc_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM r
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Unicode NFC normalization (pandas UDF; no Spark builtin)
# ---------------------------------------------------------------------------


def _nfc_udf():
    """Arrow-vectorized NFC, built lazily (pandas_udf needs an active
    session, so decorating at import time would break registry
    collection). unicodedata implements the same Unicode normalization
    spec as DuckDB's utf8proc-backed nfc_normalize, so the two engines
    agree byte-for-byte on the composed result."""

    @pandas_udf("string")
    def _nfc_normalize(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return _nfc_normalize


def text_normalize_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC-normalize document text. The fixture corpus is ASCII (NFC
    no-op), so the query first derives a DECOMPOSED variant (combining
    acute accent after each 'e') — the normalizer then has real work:
    NFC composes e+U+0301 back into a single codepoint. Hashing the
    result proves the UDF output matches DuckDB's normalizer exactly;
    the char-count delta shows how many compositions happened."""
    # text char-class validity (contract.text_valid): invisible
    # formatting codepoints (soft hyphen, zero-widths, BOM) diverge
    # between unicodedata and utf8proc length/normalization semantics
    # (round-8 probe: NFC length 11 vs 3) and carry no text content
    docs = load_table(spark, sf_dir, "documents").where(text_valid())
    nfc = _nfc_udf()
    decomposed = F.regexp_replace(F.col("text"), "e", "é")
    return docs.select(
        "doc_id",
        F.length(decomposed).alias("len_decomposed"),
        F.length(nfc(decomposed)).alias("len_nfc"),
        F.md5(nfc(decomposed)).alias("nfc_md5"),
    )


_NFC_SQL = f"""
WITH d AS (
  SELECT doc_id, replace(text, 'e', 'e' || chr(769)) AS s FROM documents
  WHERE {TEXT_VALID_DUCK}
)
SELECT doc_id,
       CAST(length(s) AS INTEGER) AS len_decomposed,
       CAST(length(nfc_normalize(s)) AS INTEGER) AS len_nfc,
       md5(nfc_normalize(s)) AS nfc_md5
FROM d
"""


# ---------------------------------------------------------------------------
# Corpus vocabulary stats
# ---------------------------------------------------------------------------


def text_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row corpus summary: token count, vocabulary size, hapax
    count, and the modal term. The token->count aggregation combines
    map-side (the shuffle carries one row per distinct word per
    mapper); the final fold over ~vocab-size rows is trivial. The
    modal term ties break lexicographically via max(struct)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    counts = words.groupBy("word").agg(F.count("*").alias("cnt"))
    return counts.agg(
        F.sum("cnt").alias("total_tokens"),
        F.count("*").alias("vocab_size"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("hapax_count"),
        F.max(F.struct("cnt", "word")).getField("word").alias("top_term"),
        F.max(F.struct("cnt", "word")).getField("cnt").alias("top_term_count"),
    )


_VOCAB_SQL = """
WITH counts AS (
  SELECT word, COUNT(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY word
), top AS (
  SELECT word, cnt FROM counts ORDER BY cnt DESC, word DESC LIMIT 1
)
SELECT (SELECT CAST(SUM(cnt) AS BIGINT) FROM counts) AS total_tokens,
       (SELECT COUNT(*) FROM counts) AS vocab_size,
       (SELECT CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
        FROM counts) AS hapax_count,
       (SELECT word FROM top) AS top_term,
       (SELECT cnt FROM top) AS top_term_count
"""


# ---------------------------------------------------------------------------
# Blocked-matmul brute-force ANN (int64-exact scores)
# ---------------------------------------------------------------------------

_MM_TOPK = 3
_MM_NQ = 5
_MM_SCALE = 1_000_000


def sim_blocked_matmul_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k inner-product search as ONE numpy int64 matmul per
    Arrow batch (mapInPandas): candidates stream through executors in
    blocks, each block computes scores against the broadcast query
    block and emits only its block-local top-k — the classic
    map-side-top-k + global-top-k reduction, with per-row work done by
    BLAS instead of per-element SQL arithmetic. Vectors are scaled to
    int64 fixed-point (floor(x*1e6+0.5) per element) so the dot
    products are exact integers: identical under any blocking, any
    partitioning, and in the SQL oracle. Top-k under the total order
    (score DESC, cand_id ASC) is distributive, so block-local top-k is
    a lossless partial. The query block here is collect()ed (bounded:
    _MM_NQ rows) and closure-shipped; a large query set would be a
    broadcast join against LSH buckets instead (sim_rp_lsh_buckets)."""
    import numpy as np

    # np.stack needs rectangular input: a NULL/ragged/empty array or a
    # NULL element has no geometry and is dropped, symmetrically with
    # the oracle (contract.EMB_VALID_*, incl. size(embedding) = dims).
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.expr(EMB_VALID_SPARK))
        .select("vec_id", "embedding")
    )
    q_rows = (
        emb.where(F.col("vec_id") < _MM_NQ)
        .orderBy("vec_id")
        .collect()
    )
    if not q_rows:  # empty input: no queries, empty result
        return spark.createDataFrame(
            [], "q_id bigint, cand_id bigint, score_units bigint, rank int"
        )
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.floor(
        np.array([r["embedding"] for r in q_rows], dtype=np.float64) * _MM_SCALE
        + 0.5
    ).astype(np.int64)

    def block_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cand_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.floor(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                * _MM_SCALE
                + 0.5
            ).astype(np.int64)
            scores = mat @ q_mat.T  # (block, nq) exact int64
            for qi, q_id in enumerate(q_ids):
                col = scores[:, qi]
                mask = cand_ids != q_id
                ids, sc = cand_ids[mask], col[mask]
                order = np.lexsort((ids, -sc))[:_MM_TOPK]
                yield pd.DataFrame(
                    {
                        "q_id": q_id,
                        "cand_id": ids[order],
                        "score_units": sc[order],
                    }
                )

    partials = emb.mapInPandas(
        block_topk, "q_id bigint, cand_id bigint, score_units bigint"
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("score_units").desc(), F.col("cand_id")
    )
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _MM_TOPK)
        .select("q_id", "cand_id", "score_units", "rank")
    )


_MM_SQL = f"""
WITH s AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_MM_SCALE} + 0.5) AS BIGINT)) AS iv
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)) = 0
), q AS (
  SELECT * FROM s WHERE vec_id < {_MM_NQ}
), p AS (
  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         CAST(list_dot_product(q.iv, c.iv) AS BIGINT) AS score_units
  FROM q CROSS JOIN s c
  WHERE c.vec_id <> q.vec_id
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY score_units DESC, cand_id) AS rn
  FROM p
)
SELECT q_id, cand_id, score_units, CAST(rn AS INTEGER) AS rank
FROM r WHERE rn <= {_MM_TOPK}
"""


def text_symbol_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class quality signals (the rest of the Gopher rule
    inputs): digit / uppercase / symbol(non-alnum-non-space) counts
    and their ppm share of characters, plus the alphabetic-word share
    of tokens. Pure regexp_count projections — codegen, no shuffle.
    High symbol or digit share flags markup/tables/code; low alpha-word
    share flags delimiter soup."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    counted = docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(r"[0-9]"))
        .cast("bigint")
        .alias("n_digits"),
        F.regexp_count(F.col("text"), F.lit(r"[A-Z]"))
        .cast("bigint")
        .alias("n_upper"),
        F.regexp_count(F.col("text"), F.lit(r"[^A-Za-z0-9 ]"))
        .cast("bigint")
        .alias("n_symbols"),
        F.length("text").cast("bigint").alias("n_chars_measured"),
        F.expr("size(filter(split(text, ' '), w -> w rlike '^[A-Za-z]+$'))")
        .cast("bigint")
        .alias("__alpha_words"),
        F.size(F.split("text", " ")).cast("bigint").alias("__n_words"),
    )
    # integer DIV in BOTH engines: Spark's double-cast truncates while
    # DuckDB's CAST(double AS BIGINT) rounds — float division here
    # would hash-mismatch on half-ppm boundaries
    return counted.select(
        "doc_id",
        "n_digits",
        "n_upper",
        "n_symbols",
        "n_chars_measured",
        F.expr("__alpha_words * 1000000 DIV __n_words").alias("alpha_word_ppm"),
        F.expr("n_symbols * 1000000 DIV n_chars_measured").alias("symbol_ppm"),
    )


_SYMBOL_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
       CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper,
       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS n_symbols,
       CAST(length(text) AS BIGINT) AS n_chars_measured,
       CAST(CAST(len(list_filter(string_split(text, ' '),
                                 w -> regexp_full_match(w, '[A-Za-z]+'))) AS BIGINT)
            * 1000000 // len(string_split(text, ' ')) AS BIGINT) AS alpha_word_ppm,
       CAST(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT)
            * 1000000 // length(text) AS BIGINT) AS symbol_ppm
FROM documents
WHERE text IS NOT NULL
"""


QUERIES = {
    "text_pii_redaction": text_pii_redaction,
    "text_repetition_stats": text_repetition_stats,
    "text_chunk_dedup": text_chunk_dedup,
    "text_normalize_unicode": text_normalize_unicode,
    "text_vocab_stats": text_vocab_stats,
    "text_symbol_stats": text_symbol_stats,
    "sim_blocked_matmul_topk": sim_blocked_matmul_topk,
}

ORACLE = {
    "text_pii_redaction": _PII_SQL,
    "text_repetition_stats": _REPETITION_SQL,
    "text_chunk_dedup": _CHUNK_DEDUP_SQL,
    "text_normalize_unicode": _NFC_SQL,
    "text_vocab_stats": _VOCAB_SQL,
    "text_symbol_stats": _SYMBOL_SQL,
    "sim_blocked_matmul_topk": _MM_SQL,
}
