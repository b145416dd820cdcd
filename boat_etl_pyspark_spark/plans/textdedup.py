"""Text analysis + deduplication operators over the ``documents`` table.

These are the LLM-training-pipeline operators the reference lacks
(SURVEY.md §2.9): exact dedup, MinHash-LSH near-dup, n-gram Jaccard
near-dup, SimHash, token/quality stats, language ID, fingerprints.

Scale design (100 TB posture):
  * all per-document work is pure column expressions over arrays
    (split/transform/aggregate/zip_with) — whole-stage codegen, zero
    shuffle, zero Python;
  * exact dedup groups on md5(text) — shuffling a 32-byte hash, not
    document bodies;
  * MinHash-LSH shuffles only (band_idx, band_key) pairs; candidate
    verification touches only bucket-collision pairs (classic
    Broder/LSH banding — b=4 bands × r=3 rows, s-curve threshold
    ≈ (1/4)^(1/3) ≈ 0.63);
  * n-gram Jaccard uses a shared-rare-shingle inverted index with a
    document-frequency cap as its candidate generator (deterministic,
    skew-proof: hot shingles are dropped by the cap).

Determinism: every hash is md5 (identical in Spark and DuckDB);
fold orders are explicit sequential aggregates, so doubles are
bit-reproducible at any parallelism.

Where the logic is expression-dense, the Spark plan is declared via
``spark.sql`` over a temp view — the SQL is Catalyst-optimized exactly
like the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import track_persist
from ..sources.readers import load_table


def _docs_view(spark: SparkSession, sf_dir: str, name: str = "__docs") -> str:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(name)
    return name


# Session-scoped cache for expensive shared intermediates: shingle
# sets and verified near-dup pairs are needed by several operators
# (minhash, ngram, fingerprints, clustering, edit distance). Keyed by
# (applicationId, sf_dir) — the fixture dirs are immutable, so the
# cached plans never go stale within a session. Memory cost: each
# entry persists at the default MEMORY_AND_DISK level (pressure
# spills, it never OOMs), but entries live until ``release_shared``
# — a long-lived session that is DONE with the dedup family should
# call it to return executor storage memory (bench.py does).
_SHARED: dict = {}


def _cached(spark: SparkSession, sf_dir: str, kind: str, build):
    key = (spark.sparkContext.applicationId, sf_dir, kind)
    if key not in _SHARED:
        df = build().persist()
        # Materialize NOW, not at first consumption: a lazily-persisted
        # relation referenced by SEVERAL subtrees of one DAG (broadcast
        # builds racing the probe side) fills the cache partition-by-
        # partition under block locks, serializing the whole query —
        # measured 80s cold vs 8s with the same builds run eagerly for
        # dedup_embedding_cosine at sf0.1 (OPTIMIZATION_r11.md). The
        # count is one map-combined job over work the first consumer
        # was about to do anyway, still inside its timed region.
        df.count()
        _SHARED[key] = df
    return _SHARED[key]


def release_shared(spark: SparkSession | None = None) -> int:
    """Unpersist and drop cached dedup intermediates; returns the
    number of entries released. ``spark=None`` releases everything;
    otherwise only the given session's entries (keyed by appId)."""
    app = spark.sparkContext.applicationId if spark is not None else None
    keys = [k for k in _SHARED if app is None or k[0] == app]
    for k in keys:
        try:
            _SHARED.pop(k).unpersist()
        except Exception:
            pass  # a stopped context can't unpersist; dropping the ref suffices
    return len(keys)


def _docs_wide_view(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Documents repartitioned to full parallelism for expression-heavy
    per-doc pipelines. The fixture files are single-row-group parquet,
    so they scan as ONE input partition and any compute placed before
    the first exchange runs on one core of 32 (measured: the shingle
    build alone was 13.9s at sf0.1, ~4x faster after spreading). The
    repartition shuffles only the slim base table. At cluster scale
    the same guard covers the few-huge-files layout where splits are
    capped by row-group boundaries."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    docs.createOrReplaceTempView(name)
    return name


def _shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted (doc_id, lang, source, s=3-gram set) — shared by every
    shingle-consuming operator in the session."""
    def build():
        docs = _docs_wide_view(spark, sf_dir, "__docs_shared_sh")
        return spark.sql(_SPARK_SHINGLES.format(docs=docs))

    return _cached(spark, sf_dir, "shingles3", build)


# Shared SQL fragments (valid in BOTH Spark SQL and DuckDB unless
# stated otherwise). Tokens: whitespace split. Shingles: word 3-grams.
_SPARK_SHINGLES = """
  SELECT doc_id, lang, source,
         array_distinct(transform(sequence(1, greatest(size(t) - 2, 1)),
                        i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))) AS s
  FROM (SELECT doc_id, lang, source, split(text, ' ') AS t FROM {docs})
"""

_DUCK_SHINGLES = """
  SELECT doc_id, lang, source,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                       i -> concat_ws(' ', t[i], t[i + 1], t[i + 2]))) AS s
  FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS t FROM documents)
"""

# ---------------------------------------------------------------------------
# Exact dedup: group on content hash (hash-groupBy — never shuffle bodies)
# ---------------------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.col("text")).alias("text_md5"), "doc_id")
        .groupBy("text_md5")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


_DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_md5,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
"""


# ---------------------------------------------------------------------------
# MinHash-LSH near-duplicate pairs (k=12 hashes, b=4 bands × r=3)
# ---------------------------------------------------------------------------

# One md5 per shingle, then k affine permutations over GF(2^31-1):
# h_i(x) = (A[i] * (h0(x) mod p) + B[i]) mod p. ~10x cheaper than k
# salted md5s and still oracle-reproducible (hex->int parses
# identically in Spark's conv() and DuckDB's 0x-cast).
_MH_A = [7, 13, 31, 61, 127, 251, 509, 1021, 2039, 4093, 8191, 16381]
_MH_B = [3, 17, 29, 47, 71, 97, 113, 131, 149, 167, 181, 199]
_MH_P = 2147483647

_MINHASH_BANDS_SPARK = f"""
WITH hashed AS (
  SELECT doc_id,
         transform(s, x -> CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT) % {_MH_P}) AS h0
  FROM {{sh}}
),
sig AS (
  SELECT doc_id,
         transform(sequence(0, 11),
                   i -> array_min(transform(h0,
                        h -> (element_at(array({", ".join(map(str, _MH_A))}), CAST(i AS INT) + 1) * h
                              + element_at(array({", ".join(map(str, _MH_B))}), CAST(i AS INT) + 1)) % {_MH_P}))) AS mh
  FROM hashed
)
SELECT doc_id, b.band_idx, b.band_key
FROM (
  SELECT doc_id,
         explode(transform(sequence(0, 3),
             j -> struct(j AS band_idx,
                         md5(concat_ws(',', transform(slice(mh, j * 3 + 1, 3),
                                                      v -> CAST(v AS STRING)))) AS band_key))) AS b
  FROM sig
)
"""

_MINHASH_DUCK = f"""
WITH sh AS ({{shingles}}),
hashed AS (
  SELECT doc_id, s,
         list_transform(s, x -> CAST(concat('0x', substring(md5(x), 1, 15)) AS BIGINT) % {_MH_P}) AS h0
  FROM sh
),
sig AS (
  SELECT doc_id, s,
         list_transform(range(0, 12),
                        i -> list_min(list_transform(h0,
                             h -> (([{", ".join(map(str, _MH_A))}])[i + 1] * h
                                   + ([{", ".join(map(str, _MH_B))}])[i + 1]) % {_MH_P}))) AS mh
  FROM hashed
),
bands AS (
  SELECT doc_id, j AS band_idx,
         md5(concat_ws(',', CAST(mh[j * 3 + 1] AS VARCHAR), CAST(mh[j * 3 + 2] AS VARCHAR),
                            CAST(mh[j * 3 + 3] AS VARCHAR))) AS band_key
  FROM sig, range(0, 4) r(j)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
         / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS jaccard
FROM cand c
JOIN sh x ON x.doc_id = c.doc_a
JOIN sh y ON y.doc_id = c.doc_b
WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) >= 0.6
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle -> signature -> band buckets -> candidate pairs ->
    exact-Jaccard verify.

    The shingle sets and band table each feed two join sides; they are
    persisted so the (HOF-interpreted, non-codegen) signature pipeline
    runs once, not four times — at corpus scale recomputing signatures
    per join side is the difference between one pass and four.
    """
    def build():
        sh = _shingle_sets(spark, sf_dir)
        sh.createOrReplaceTempView("__mh_sh")
        bands = track_persist(spark.sql(_MINHASH_BANDS_SPARK.format(sh="__mh_sh")))
        a, b = bands.alias("a"), bands.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
        x = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
        y = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
        inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
        jac = inter.cast("double") / (F.size("sa") + F.size("sb") - inter)
        return (
            cand.join(x, "doc_a")
            .join(y, "doc_b")
            .withColumn("jaccard", jac)
            .where(F.col("jaccard") >= 0.6)
            .select("doc_a", "doc_b", "jaccard")
        )

    return _cached(spark, sf_dir, "minhash_pairs", build)


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup via shared-5-gram inverted index (df cap = 20)
# ---------------------------------------------------------------------------

# NOTE: generator stays INLINE in the projection — `LATERAL VIEW
# explode(expensive_expr)` re-evaluates the expression per OUTPUT row
# (measured 8.3s vs 0.3s on this exact query at sf0.1); the inline
# form evaluates it once per input row.
_NGRAM_INV_SPARK = """
SELECT doc_id,
       explode(array_distinct(transform(sequence(1, greatest(size(t) - 4, 1)),
           i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1), element_at(t, i + 2),
                               element_at(t, i + 3), element_at(t, i + 4))))) AS gram
FROM (SELECT doc_id, split(text, ' ') AS t FROM {docs})
"""

_NGRAM_DUCK = """
WITH sh AS ({shingles}),
g5 AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 4, 1) + 1),
             i -> concat_ws(' ', t[i], t[i + 1], t[i + 2], t[i + 3], t[i + 4]))) AS s5
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
),
inv AS (SELECT doc_id, unnest(s5) AS gram FROM g5),
rare AS (SELECT gram FROM inv GROUP BY gram HAVING COUNT(*) <= 20),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM inv a
  JOIN rare r ON a.gram = r.gram
  JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
         / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS jaccard
FROM cand c
JOIN sh x ON x.doc_id = c.doc_a
JOIN sh y ON y.doc_id = c.doc_b
WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) >= 0.5
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted 5-gram index (df cap 20 kills hot shingles, so no
    skewed join key) -> candidate pairs -> exact 3-gram Jaccard over
    the session-shared shingle sets."""
    docs = _docs_wide_view(spark, sf_dir, "__docs_ng")
    # ONE shuffle: group the inverted index into per-gram postings,
    # keep buckets with 2..20 docs (the df cap), and emit candidate
    # pairs directly from each tiny bucket with an expression-level
    # pair comprehension. df=1 grams (the vast majority) die in the
    # aggregation; no index self-join, no second shuffle of the index.
    cand = (
        spark.sql(_NGRAM_INV_SPARK.format(docs=docs))
        .groupBy("gram")
        .agg(F.collect_list("doc_id").alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= 20))
        .select(
            F.explode(
                F.expr(
                    "filter(flatten(transform(ds, a -> transform(ds, b -> struct(a, b)))),"
                    " p -> p.a < p.b)"
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )
    sh = _shingle_sets(spark, sf_dir)
    x = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    y = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    jac = inter.cast("double") / (F.size("sa") + F.size("sb") - inter)
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash: 64-bit signature, computed shuffle-free per document
# ---------------------------------------------------------------------------

_SIMHASH_SPARK = """
WITH h AS (
  SELECT doc_id,
         transform(array_distinct(split(text, ' ')), t -> substring(md5(t), 1, 16)) AS hs
  FROM {docs}
),
b AS (
  SELECT doc_id,
         aggregate(
           hs,
           transform(sequence(0, 63), p -> CAST(0 AS BIGINT)),
           (acc, hh) -> zip_with(
             acc,
             transform(sequence(0, 63),
               p -> CAST(2 * (((instr('0123456789abcdef', substring(hh, CAST(p DIV 4 AS INT) + 1, 1)) - 1)
                               DIV element_at(array(8, 4, 2, 1), CAST(p % 4 AS INT) + 1)) % 2) - 1 AS BIGINT)),
             (x, y) -> x + y)
         ) AS sums
  FROM h
)
SELECT doc_id,
       concat_ws('', transform(sums, v -> CASE WHEN v > 0 THEN '1' ELSE '0' END)) AS simhash,
       CAST(size(filter(sums, v -> v > 0)) AS BIGINT) AS nbits_set
FROM b
"""

_SIMHASH_DUCK = """
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t FROM documents
),
th AS (SELECT doc_id, substring(md5(t), 1, 16) AS h FROM tok),
bit AS (
  SELECT doc_id, p,
         2 * (((instr('0123456789abcdef', substring(h, p // 4 + 1, 1)) - 1)
               // ([8, 4, 2, 1])[p % 4 + 1]) % 2) - 1 AS c
  FROM th, range(0, 64) r(p)
),
s AS (SELECT doc_id, p, SUM(c) AS v FROM bit GROUP BY doc_id, p)
SELECT doc_id,
       string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS simhash,
       COUNT(*) FILTER (WHERE v > 0) AS nbits_set
FROM s
GROUP BY doc_id
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_wide_view(spark, sf_dir, "__docs_sh")
    return spark.sql(_SIMHASH_SPARK.format(docs=docs))


# ---------------------------------------------------------------------------
# Token statistics (whitespace tokens + BPE-ish regex word count)
# ---------------------------------------------------------------------------

_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

_TOKSTATS_SPARK = f"""
SELECT doc_id, lang, source,
       CAST(size(t) AS BIGINT) AS n_tokens,
       CAST(size(array_distinct(t)) AS BIGINT) AS n_unique,
       CAST(size(regexp_extract_all(text, '{_TOKEN_RE}', 0)) AS BIGINT) AS n_bpeish,
       CAST(aggregate(t, 0L, (acc, x) -> acc + length(x)) AS BIGINT) AS token_chars,
       CAST(aggregate(t, 0L, (acc, x) -> acc + length(x)) AS DOUBLE) / greatest(size(t), 1) AS avg_token_len
FROM (SELECT doc_id, lang, source, text, split(text, ' ') AS t FROM {{docs}}
      WHERE text IS NOT NULL)
"""

_TOKSTATS_DUCK = f"""
SELECT doc_id, lang, source,
       len(t) AS n_tokens,
       len(list_distinct(t)) AS n_unique,
       len(regexp_extract_all(text, '{_TOKEN_RE}')) AS n_bpeish,
       CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS token_chars,
       CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / greatest(len(t), 1) AS avg_token_len
FROM (SELECT doc_id, lang, source, text, string_split(text, ' ') AS t FROM documents
      WHERE text IS NOT NULL)
"""


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_view(spark, sf_dir, "__docs_ts")
    return spark.sql(_TOKSTATS_SPARK.format(docs=docs))


# ---------------------------------------------------------------------------
# Quality scoring: length / stopword / uniqueness signals
# ---------------------------------------------------------------------------

_STOPWORDS = "('the', 'a', 'of', 'and', 'is', 'to', 'in')"

_QUALITY_SPARK = f"""
SELECT doc_id,
       CAST(size(t) AS BIGINT) AS n_tokens,
       CAST(size(array_distinct(t)) AS DOUBLE) / greatest(size(t), 1) AS unique_ratio,
       CAST(size(filter(t, x -> x IN {_STOPWORDS})) AS DOUBLE) / greatest(size(t), 1) AS stop_ratio,
       0.4 * least(CAST(size(t) AS DOUBLE) / 100.0, 1.0)
         + 0.3 * (1.0 - CAST(size(filter(t, x -> x IN {_STOPWORDS})) AS DOUBLE) / greatest(size(t), 1))
         + 0.3 * (CAST(size(array_distinct(t)) AS DOUBLE) / greatest(size(t), 1)) AS quality
FROM (SELECT doc_id, split(text, ' ') AS t FROM {{docs}} WHERE text IS NOT NULL)
"""

_QUALITY_DUCK = f"""
SELECT doc_id,
       len(t) AS n_tokens,
       CAST(len(list_distinct(t)) AS DOUBLE) / greatest(len(t), 1) AS unique_ratio,
       CAST(len(list_filter(t, x -> x IN {_STOPWORDS})) AS DOUBLE) / greatest(len(t), 1) AS stop_ratio,
       0.4 * least(CAST(len(t) AS DOUBLE) / 100.0, 1.0)
         + 0.3 * (1.0 - CAST(len(list_filter(t, x -> x IN {_STOPWORDS})) AS DOUBLE) / greatest(len(t), 1))
         + 0.3 * (CAST(len(list_distinct(t)) AS DOUBLE) / greatest(len(t), 1)) AS quality
FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE text IS NOT NULL)
"""


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_view(spark, sf_dir, "__docs_q")
    return spark.sql(_QUALITY_SPARK.format(docs=docs))


# ---------------------------------------------------------------------------
# Language ID: marker-stopword + CJK-codepoint heuristic, then a
# confusion matrix against the labeled lang column
# ---------------------------------------------------------------------------

_LANGID_CASE = """
  CASE WHEN n_cjk > 0 THEN 'zh'
       WHEN greatest(c_en, c_de, c_fr, c_es) = 0 THEN 'und'
       WHEN c_en >= greatest(c_de, c_fr, c_es) THEN 'en'
       WHEN c_de >= greatest(c_fr, c_es) THEN 'de'
       WHEN c_fr >= c_es THEN 'fr'
       ELSE 'es' END
"""

_LANGID_SPARK = f"""
WITH f AS (
  SELECT doc_id, lang,
         CAST(size(filter(t, x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS BIGINT) AS c_en,
         CAST(size(filter(t, x -> x IN ('der', 'die', 'das', 'und', 'ist'))) AS BIGINT) AS c_de,
         CAST(size(filter(t, x -> x IN ('le', 'la', 'les', 'et', 'est'))) AS BIGINT) AS c_fr,
         CAST(size(filter(t, x -> x IN ('el', 'los', 'las', 'y', 'es'))) AS BIGINT) AS c_es,
         CAST(size(regexp_extract_all(text, '[\\\\x{{{{4e00}}}}-\\\\x{{{{9fff}}}}]', 0)) AS BIGINT) AS n_cjk
  FROM (SELECT doc_id, lang, text, split(text, ' ') AS t FROM {{docs}}
  WHERE text IS NOT NULL)
)
SELECT lang, {_LANGID_CASE} AS pred_lang, COUNT(*) AS n_docs
FROM f
GROUP BY lang, {_LANGID_CASE}
"""

_LANGID_DUCK = f"""
WITH f AS (
  SELECT doc_id, lang,
         len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS c_en,
         len(list_filter(t, x -> x IN ('der', 'die', 'das', 'und', 'ist'))) AS c_de,
         len(list_filter(t, x -> x IN ('le', 'la', 'les', 'et', 'est'))) AS c_fr,
         len(list_filter(t, x -> x IN ('el', 'los', 'las', 'y', 'es'))) AS c_es,
         len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) AS n_cjk
  FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS t FROM documents
  WHERE text IS NOT NULL)
)
SELECT lang, {_LANGID_CASE} AS pred_lang, COUNT(*) AS n_docs
FROM f
GROUP BY lang, {_LANGID_CASE}
"""


def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_view(spark, sf_dir, "__docs_li")
    return spark.sql(_LANGID_SPARK.format(docs=docs))


# ---------------------------------------------------------------------------
# Document fingerprints: content md5, k-min shingle sketch, rolling hash
# ---------------------------------------------------------------------------

_FP_SPARK = """
WITH sh AS ({shingles})
SELECT d.doc_id,
       md5(trim(regexp_replace(lower(d.text), ' +', ' '))) AS fp_md5,
       md5(concat_ws(',', slice(array_sort(transform(sh.s, x -> md5(x))), 1, 3))) AS fp_kmin,
       aggregate(split(d.text, ''), CAST(0 AS BIGINT),
                 (acc, c) -> (acc * 31 + ascii(c)) % 1000000007) AS fp_roll
FROM {docs} d JOIN sh ON sh.doc_id = d.doc_id
WHERE d.text IS NOT NULL
"""

_FP_DUCK = """
WITH sh AS ({shingles})
SELECT d.doc_id,
       md5(trim(regexp_replace(lower(d.text), ' +', ' ', 'g'))) AS fp_md5,
       md5(concat_ws(',',
           list_sort(list_transform(sh.s, x -> md5(x)))[1],
           list_sort(list_transform(sh.s, x -> md5(x)))[2],
           list_sort(list_transform(sh.s, x -> md5(x)))[3])) AS fp_kmin,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
                   -- greatest(.., 0): splitting an EMPTY string yields
                   -- [''] in both engines, but ord('') is -1 in DuckDB
                   -- vs ascii('') = 0 in Spark (degenerate-text net)
                   list_transform(string_split(d.text, ''),
                                  c -> CAST(greatest(ord(c), 0) AS BIGINT))),
                   (acc, c) -> (acc * 31 + c) % 1000000007) AS fp_roll
FROM documents d JOIN sh ON sh.doc_id = d.doc_id
WHERE d.text IS NOT NULL
"""


def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_view(spark, sf_dir, "__docs_fp")
    _shingle_sets(spark, sf_dir).createOrReplaceTempView("__fp_sh")
    return spark.sql(
        _FP_SPARK.format(shingles="SELECT * FROM __fp_sh", docs=docs)
    )


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: a new batch checked against a known corpus
    by content hash — the shape of continuous ingestion, where the
    corpus side is a persisted hash table (here: docs from sources
    src0-src9 as 'corpus', the rest as 'new batch'). Anti-join on the
    32-byte md5, never on document bodies. A source that does not
    match ``src<digits>`` is classified NEW BATCH in both engines
    (the empty-match guard below): the bare cast diverged — Spark
    non-ANSI cast('') -> NULL silently dropped the row from BOTH
    sides while DuckDB errored (caught by the degenerate-fixture
    net, tests/test_degenerate_vectors.py)."""
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract("source", r"src(\d+)", 1)
    is_corpus = F.when(src_num == "", F.lit(False)).otherwise(
        src_num.cast("int") < 10
    )
    hashed = docs.select(
        "doc_id", "source", F.md5("text").alias("text_md5"), is_corpus.alias("in_corpus")
    )
    corpus_hashes = hashed.where("in_corpus").select("text_md5").distinct()
    new_batch = hashed.where(~F.col("in_corpus"))
    fresh = new_batch.join(corpus_hashes, "text_md5", "left_anti")
    return fresh.groupBy("source").agg(
        F.count("*").alias("n_fresh_docs"),
        F.countDistinct("text_md5").alias("n_unique_texts"),
    )


_DEDUP_INCR_SQL = """
WITH hashed AS (
  SELECT doc_id, source, md5(text) AS text_md5,
         CASE WHEN regexp_extract(source, 'src(\\d+)', 1) = '' THEN FALSE
              ELSE CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) < 10
         END AS in_corpus
  FROM documents
),
corpus AS (SELECT DISTINCT text_md5 FROM hashed WHERE in_corpus)
SELECT source,
       COUNT(*) AS n_fresh_docs,
       COUNT(DISTINCT text_md5) AS n_unique_texts
FROM hashed
WHERE NOT in_corpus
  AND text_md5 NOT IN (SELECT text_md5 FROM corpus)
GROUP BY source
"""


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash-LSH near-dup pair graph:
    iterative min-label propagation (each round = one join + one
    aggregation, all distributed; rounds ~ graph diameter, which for
    dedup graphs is tiny). Output: every clustered doc with its
    cluster id (= min doc_id in the component) and the elected keeper
    — the stage that turns pairwise dedup into actual row removal.
    The result is session-cached: downstream consumers (representative
    election) and repeated sweeps reuse one propagation run — the
    result is partition-count independent, so caching is sound."""
    return _cached(spark, sf_dir, "cluster_labels", lambda: _dedup_clusters_build(spark, sf_dir))


def _dedup_clusters_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.unionByName(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
        .distinct()
        .persist()
    )
    # Seed with round one's result directly: from identity labels the
    # first propagation yields min(node, min(neighbors)), computable
    # as ONE aggregation over the (bidirectional) edge list — no join,
    # no convergence count. Near-dup components are mostly cliques, so
    # this alone converges them and the loop usually runs one confirm
    # round. (Any upper-bound seeding is sound: propagation is
    # monotone toward the component minimum.)
    labels = (
        edges.groupBy("doc_a")
        .agg(F.min("doc_b").alias("nb"))
        .select(
            F.col("doc_a").alias("node"),
            F.least(F.col("doc_a"), F.col("nb")).alias("label"),
        )
    )
    # Size the loop's shuffle width to the GRAPH, not the session
    # default: the near-dup graph is orders of magnitude smaller than
    # the corpus (it holds only verified near-dup pairs), and every
    # round pays per-partition scheduling on its shuffles. ~50k edges
    # per partition, floor 4; a billion-edge graph on a real cluster
    # still widens to the session default. The width is applied with
    # EXPLICIT repartition() on the loop DataFrames (never by mutating
    # session conf, which a concurrent query on the same session would
    # observe); AQE coalesces the remaining aggregate exchanges.
    # Results are width-independent, pinned by tests/test_determinism.
    n_edges = edges.count()
    default_width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    loop_width = max(4, min(default_width, n_edges // 50_000 + 4))
    edges_r = track_persist(edges.repartition(loop_width, "doc_b"))
    edges_r.count()
    edges.unpersist()
    edges = edges_r
    labels = labels.repartition(loop_width, "node").localCheckpoint(
        eager=False
    )

    def _free_ckpt(df) -> None:
        # explicitly drop a superseded round's checkpointed blocks
        # (the analyzed plan of a localCheckpoint IS the LogicalRDD)
        # instead of leaving up to 20 node-sized snapshots for the
        # ContextCleaner to GC eventually; best-effort — the cleaner
        # remains the backstop
        try:
            df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass

    prev_ckpt = labels
    for _ in range(20):  # >> diameter of any dedup component
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.node)
            .groupBy(F.col("doc_a").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # the convergence flag rides along in the same pass, so
        # each round costs ONE action (the count materializes the
        # checkpointed round result) instead of a second old-vs-new
        # join job. The LAZY localCheckpoint (not persist) is the
        # lineage cut: `labels` is referenced twice per round (the
        # neighbor join + the merge base), so a persist chain keeps a
        # logical plan that DOUBLES per round — by round 13 the
        # cached-labels plan carried ~8k Exchange nodes and every
        # consumer paid ~2s of pure analysis before touching the
        # (tiny, cached) data. Checkpointing pins the round result in
        # the block manager like persist did AND truncates the plan
        # to a LogicalRDD (the BFS/PageRank discipline); the RDD is
        # freed by the ContextCleaner when the reference drops.
        stepped = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("new_label"),
                (
                    F.coalesce(F.col("nbr_label"), F.col("label")) < F.col("label")
                ).alias("changed"),
            )
            .repartition(loop_width, "node")
            .localCheckpoint(eager=False)
        )
        changed = stepped.where("changed").count()
        # this round's result is materialized; the previous round's
        # checkpoint can no longer be referenced — free it now
        _free_ckpt(prev_ckpt)
        prev_ckpt = stepped
        labels = stepped.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    clusters = labels.groupBy("label").agg(
        F.count("*").alias("cluster_size"), F.min("node").alias("keeper_doc_id")
    )
    return (
        labels.join(clusters, "label")
        .select(
            F.col("node").alias("doc_id"),
            F.col("label").alias("cluster_id"),
            "cluster_size",
            "keeper_doc_id",
        )
    )


_DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS (
  {{minhash_pairs}}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r
  FROM edges e JOIN reach ON e.dst = reach.node
),
labels AS (
  SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node
),
clusters AS (
  SELECT cluster_id, COUNT(*) AS cluster_size, MIN(node) AS keeper_doc_id
  FROM labels GROUP BY cluster_id
)
SELECT node AS doc_id, labels.cluster_id, cluster_size, keeper_doc_id
FROM labels JOIN clusters ON labels.cluster_id = clusters.cluster_id
"""


def text_stopword_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword filtering as a map-only column expression: tokens
    dropped against a broadcast-literal stoplist, text reassembled."""
    docs = _docs_view(spark, sf_dir, "__docs_sw")
    return spark.sql(
        f"""
        SELECT doc_id,
               CAST(size(t) - size(kept) AS BIGINT) AS n_removed,
               concat_ws(' ', kept) AS clean_text
        FROM (
          SELECT doc_id, t, filter(t, x -> x NOT IN {_STOPWORDS}) AS kept
          FROM (SELECT doc_id, split(text, ' ') AS t FROM {docs}
                WHERE text IS NOT NULL)
        )
        """
    )


_STOPWORD_SQL = f"""
SELECT doc_id,
       len(t) - len(kept) AS n_removed,
       array_to_string(kept, ' ') AS clean_text
FROM (
  SELECT doc_id, t, list_filter(t, x -> x NOT IN {_STOPWORDS}) AS kept
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE text IS NOT NULL)
)
"""


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with exact integer term/document frequencies and a
    smoothed idf; top-3 terms per document. One shuffle for the
    per-(doc, term) counts, a broadcast for the term df table."""
    docs = _docs_view(spark, sf_dir, "__docs_tfidf")
    return spark.sql(
        f"""
        WITH tok AS (
          SELECT doc_id, explode(split(text, ' ')) AS tok FROM {docs}
        ),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
        -- df derives from tf (one row per (doc, term)), not from tok:
        -- a second pass over the raw token stream would re-tokenize
        -- every document (CTEs are not materialized)
        df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        n AS (SELECT COUNT(*) AS n_docs FROM {docs}),
        scored AS (
          SELECT tf.doc_id, tf.tok AS term, tf.tf, df.df,
                 tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) AS score
          FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
        )
        SELECT doc_id, term, tf, df, round(score, 6) AS score
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
          FROM scored
        )
        WHERE rk <= 3
        """
    )


_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY tok),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok AS term, tf.tf, df.df,
         tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) AS score
  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
)
SELECT doc_id, term, tf, df, round(score, 6) AS score
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
  FROM scored
)
WHERE rk <= 3
"""


_KEYWORDS = "('spark', 'hash', 'vector', 'stream')"


def text_keyword_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword span extraction: (doc, keyword, token position) rows —
    the built-in posexplode+filter form (the UDTF equivalence test in
    tests/test_udtf.py drives the same semantics through a Python
    UDTF, which stays off the contract hot path by design)."""
    docs = _docs_view(spark, sf_dir, "__docs_ks")
    return spark.sql(
        f"""
        SELECT doc_id, tok AS keyword, CAST(pos AS BIGINT) AS position
        FROM {docs}
        LATERAL VIEW posexplode(split(text, ' ')) e AS pos, tok
        WHERE tok IN {_KEYWORDS}
        """
    )


_KEYWORD_SPANS_SQL = f"""
SELECT doc_id, tok AS keyword, CAST(pos - 1 AS BIGINT) AS position
FROM (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
)
WHERE tok IN {_KEYWORDS}
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup: hashed bag-of-words embedding + centered
# sign-LSH candidate generation + exact sparse-dot verification.
# ---------------------------------------------------------------------------
# Pipeline (all integer-exact until the final cosine, so Spark and
# DuckDB agree bit-for-bit at any parallelism):
#   1. embed: token -> md5 -> dim in [0, 512); tf counts per (doc, dim)
#      — a sparse integer vector per document.
#   2. 32 deterministic hyperplanes h(j,d) (Knuth multiplicative hash
#      centered to [-2^31, 2^31)); plane score s(doc,j) = Σ c·h — an
#      exact BIGINT sum.
#   3. CENTERED sign bits: this corpus shares most of its vocabulary,
#      so every raw score is dominated by the common component and
#      plain sign-LSH bits are ~constant (measured 44% candidate rate).
#      Thresholding each plane at its corpus mean (s·n > Σs — cross-
#      multiplied to stay in exact integers) recenters the s-curve:
#      measured ~10% candidate rate with 100% recall of all
#      cos>=0.95 pairs at sf0.001 AND sf0.01 (pinned by
#      tests/test_embedding_dedup.py).
#   4. band signatures (8 bands x 8 rows, integer bit-packed —
#      order-insensitive SUM(bit<<pos), no collect_list ordering);
#      candidates = same (band, sig), doc_id_a < doc_id_b.
#   5. verify: exact integer sparse dot via the inverted-index join on
#      shared dims; cosine from integer dot and norms (sqrt/divide are
#      IEEE-correctly-rounded, identical in both engines).
# Scale: the only all-pairs surface is the LSH bucket self-join whose
# volume is tuned by (bands, rows); the verify join shuffles (pair,
# dim) integers, never documents. The 100 TB layout partitions by
# band signature.

# Spark side runs in three stages with the sparse-vector table (and
# the per-doc band signatures derived from it) persisted: `dims`
# feeds five consumers and `bands` two join sides — as CTEs the
# tokenize+explode+groupBy subtree would re-execute per consumer
# (Spark does not materialize WITH clauses; measured 8.7s -> ~1s at
# sf0.1).

_EMBCOS_DIMS_SPARK = """
SELECT doc_id,
       CAST(conv(substr(md5(tok), 1, 6), 16, 10) AS BIGINT) % 512 AS d,
       COUNT(*) AS c
FROM (SELECT doc_id, explode(split(text, ' ')) AS tok FROM {docs})
WHERE tok != ''
GROUP BY 1, 2
"""

# Plane scores via explode-then-aggregate: the (doc, dim) x 64-plane
# expansion stays in whole-stage codegen and the 64x-amplified rows
# are 3 BIGINTs wide. The map-side alternative (per-doc score ARRAYS
# via aggregate-inside-transform, shuffling one row per doc) was
# tried and measured 40% SLOWER here — nested higher-order lambdas
# run interpreted, and at this scale codegen arithmetic + a narrow
# shuffle beats interpreted map work. On a real cluster where the
# shuffle fabric (not CPU) is the constraint, flip to the array form.
_EMBCOS_BANDS_SPARK = """
WITH scores AS (
  SELECT doc_id, j,
         SUM(c * (((j * 512 + d) * 2654435761) % 4294967296 - 2147483648)) AS s
  FROM (SELECT doc_id, d, c, explode(sequence(0, 63)) AS j FROM {dims})
  GROUP BY doc_id, j
),
th AS (SELECT j, SUM(s) AS tot, COUNT(*) AS n FROM scores GROUP BY j),
bits AS (
  SELECT s.doc_id, s.j,
         CASE WHEN s.s * th.n > th.tot THEN 1L ELSE 0L END AS bit
  FROM scores s JOIN th ON s.j = th.j
)
SELECT doc_id, j DIV 8 AS band,
       SUM(shiftleft(bit, CAST(j % 8 AS INT))) AS sig
FROM bits GROUP BY 1, 2
"""

# Verification computes the sparse dot per candidate pair (one row
# per pair, no explode/re-aggregation shuffle) via map_zip_with: the
# key-union merge is built once per pair in O(|a|+|b|), where the old
# per-entry element_at(mb, ...) rescanned the whole b map per a entry
# — O(|a|x|b|) interpreted ops per pair, measured 2-4x slower at this
# round's candidate volume (1.25M pairs; see OPTIMIZATION_r11.md).
# Missing keys make the product NULL and coalesce to 0; the summed
# term set is identical and integer addition is associative-exact, so
# the result matches the oracle's join-then-SUM form bit-for-bit. The final stage is DataFrame API over the
# persisted stage DataFrames — referencing them through SQL temp
# views defeats nested-cache plan substitution and silently
# recomputes the signature subtree on both sides of the self-join
# (measured: 2s per side at sf0.1).
_EMBCOS_DOT = (
    "aggregate(map_values(map_zip_with(ma, mb, (k, p, q) -> p * q)), 0L, "
    "(acc, v) -> acc + coalesce(v, 0L))"
)

_EMBCOS_DUCK = """
WITH dims AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(tok), 1, 6) AS BIGINT) % 512 AS d,
         COUNT(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok != ''
  GROUP BY 1, 2
),
norms AS (SELECT doc_id, SUM(c * c) AS n2 FROM dims GROUP BY doc_id),
scores AS (
  SELECT doc_id, j,
         SUM(c * (((j * 512 + d) * 2654435761) % 4294967296 - 2147483648)) AS s
  FROM dims, (SELECT unnest(range(0, 64)) AS j)
  GROUP BY doc_id, j
),
th AS (SELECT j, SUM(s) AS tot, COUNT(*) AS n FROM scores GROUP BY j),
bits AS (
  SELECT s.doc_id, s.j,
         CASE WHEN s.s * th.n > th.tot THEN 1 ELSE 0 END AS bit
  FROM scores s JOIN th ON s.j = th.j
),
bands AS (
  SELECT doc_id, j // 8 AS band,
         SUM(bit << (j % 8)) AS sig
  FROM bits GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
dots AS (
  SELECT c.da, c.db, SUM(x.c * y.c) AS dot
  FROM cand c
  JOIN dims x ON x.doc_id = c.da
  JOIN dims y ON y.doc_id = c.db AND y.d = x.d
  GROUP BY c.da, c.db
)
SELECT da AS doc_id_a, db AS doc_id_b,
       CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
FROM dots JOIN norms na ON na.doc_id = da JOIN norms nb ON nb.doc_id = db
WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.95
"""


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by embedding cosine >= 0.95 over a hashed
    bag-of-words document embedding, with centered sign-LSH banding as
    the candidate generator (see block comment above)."""
    def build_dims():
        docs = _docs_wide_view(spark, sf_dir, "__docs_ec")
        return spark.sql(_EMBCOS_DIMS_SPARK.format(docs=docs))

    dims = _cached(spark, sf_dir, "embcos_dims", build_dims)
    dims.createOrReplaceTempView("__ec_dims")

    def build_bands():
        return spark.sql(_EMBCOS_BANDS_SPARK.format(dims="__ec_dims"))

    bands = _cached(spark, sf_dir, "embcos_bands", build_bands)
    bands.createOrReplaceTempView("__ec_bands")

    def build_vecs():
        return spark.sql(
            "SELECT doc_id, map_from_entries(collect_list(struct(d, c))) AS m, "
            "SUM(c * c) AS n2 FROM __ec_dims GROUP BY doc_id"
        )

    vecs = _cached(spark, sf_dir, "embcos_vecs", build_vecs)

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    x = vecs.select(
        F.col("doc_id").alias("da"), F.col("m").alias("ma"), F.col("n2").alias("na2")
    )
    y = vecs.select(
        F.col("doc_id").alias("db"), F.col("m").alias("mb"), F.col("n2").alias("nb2")
    )
    cos = F.expr(_EMBCOS_DOT) / (F.sqrt("na2") * F.sqrt("nb2"))
    return (
        cand.join(x, "da")
        .join(y, "db")
        .select(
            F.col("da").alias("doc_id_a"),
            F.col("db").alias("doc_id_b"),
            cos.alias("cos"),
        )
        .where(F.col("cos") >= 0.95)
    )


def curate_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last stage of the dedup pipeline: elect ONE survivor per
    near-dup cluster by QUALITY (longest document, doc_id tiebreak)
    instead of the arbitrary min-id keeper, and emit the drop
    decision per clustered doc. One broadcastable join of cluster
    labels (|clustered docs|, tiny vs corpus) against the doc-stats
    projection, one max(struct) fold per cluster — the pattern that
    turns pairwise near-dup detection into an actual curated corpus."""
    labels = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    stats = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    joined = labels.join(stats, "doc_id")
    reps = joined.groupBy("cluster_id").agg(
        F.max(F.struct("n_chars", "doc_id")).alias("m")
    )
    return (
        joined.join(F.broadcast(reps), "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            F.col("m.doc_id").alias("rep_doc_id"),
            (F.col("doc_id") != F.col("m.doc_id")).alias("drop"),
        )
    )


_CLUSTER_REPS_SQL = """
WITH RECURSIVE pairs AS (
  {minhash_pairs}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r
  FROM edges e JOIN reach ON e.dst = reach.node
),
labels AS (
  SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
),
joined AS (
  SELECT l.doc_id, l.cluster_id, d.n_chars
  FROM labels l JOIN documents d ON l.doc_id = d.doc_id
),
reps AS (
  SELECT cluster_id, doc_id AS rep_doc_id
  FROM (
    SELECT cluster_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY cluster_id
                              ORDER BY n_chars DESC, doc_id DESC) AS rn
    FROM joined
  ) WHERE rn = 1
)
SELECT j.doc_id, j.cluster_id, r.rep_doc_id, j.doc_id <> r.rep_doc_id AS drop
FROM joined j JOIN reps r ON j.cluster_id = r.cluster_id
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "curate_cluster_representatives": curate_cluster_representatives,
    "dedup_incremental": dedup_incremental,
    "dedup_clusters": dedup_clusters,
    "text_stopword_removal": text_stopword_removal,
    "text_tfidf_top_terms": text_tfidf_top_terms,
    "text_keyword_spans": text_keyword_spans,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_simhash": dedup_simhash,
    "text_token_stats": text_token_stats,
    "text_quality_score": text_quality_score,
    "text_language_id": text_language_id,
    "text_fingerprints": text_fingerprints,
}

ORACLE = {
    "dedup_exact": _DEDUP_EXACT_SQL,
    "dedup_embedding_cosine": _EMBCOS_DUCK,
    "dedup_incremental": _DEDUP_INCR_SQL,
    "dedup_clusters": _DEDUP_CLUSTERS_SQL.format(
        minhash_pairs=_MINHASH_DUCK.format(shingles=_DUCK_SHINGLES)
    ),
    "curate_cluster_representatives": _CLUSTER_REPS_SQL.format(
        minhash_pairs=_MINHASH_DUCK.format(shingles=_DUCK_SHINGLES)
    ),
    "text_stopword_removal": _STOPWORD_SQL,
    "text_tfidf_top_terms": _TFIDF_SQL,
    "text_keyword_spans": _KEYWORD_SPANS_SQL,
    "dedup_minhash_lsh": _MINHASH_DUCK.format(shingles=_DUCK_SHINGLES),
    "dedup_ngram_jaccard": _NGRAM_DUCK.format(shingles=_DUCK_SHINGLES),
    "dedup_simhash": _SIMHASH_DUCK,
    "text_token_stats": _TOKSTATS_DUCK,
    "text_quality_score": _QUALITY_DUCK,
    "text_language_id": _LANGID_DUCK,
    "text_fingerprints": _FP_DUCK.format(shingles=_DUCK_SHINGLES),
}
