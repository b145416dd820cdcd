"""Round-5 batch 39: uplift evaluation, probabilistic-forecast
decomposition, cross-source overlap, rank concordance, content
checksums and corpus keyness (SURVEY.md §2.9 ml/curation/
aggregation/validation/text families; no reference counterpart).

  * ``events_uplift_qini`` — the Qini curve for uplift models:
    users ranked by a deterministic hash score, cumulative
    treated-minus-scaled-control responses per decile.  Pure
    integer arithmetic (milli units, integer division).
  * ``ml_brier_decomposition`` — Murphy's reliability / resolution /
    uncertainty decomposition of the Brier score for the SAME
    value-as-probability model `ml_calibration_bins` audits, plus
    the raw Brier and the decomposition gap (within-bin variance +
    flooring) as an honest residual column.
  * ``curate_source_overlap_matrix`` — pairwise 5-gram shingle
    overlap between the 20 corpus sources via a single gram
    aggregation into per-gram source BITMASKS (sources ≤ 62, so one
    int64 carries the whole incidence row); every pairwise count
    then reads the tiny mask histogram, never the grams again.
  * ``agg_kendall_tau_sampled`` — Kendall's tau-b between
    per-customer order count and total spend under the repo's
    deterministic md5-capped sample contract (the O(n²) pair space
    is the reason tau is sampled where Spearman streams).
  * ``validate_table_checksum`` — order-independent content
    checksum of orders from per-row md5 fingerprints over
    canonicalized columns (ints, cents, date-string): the
    cheap end-to-end integrity audit for replicated snapshots.
  * ``text_keyness_llr`` — Dunning log-likelihood keyness: the
    most over-represented tokens per source vs the rest of the
    corpus, the standard distinctive-vocabulary extractor for
    corpus cards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table
from .contract import money_rounded_sql

# ---------------------------------------------------------------------------
# Qini uplift curve
# ---------------------------------------------------------------------------

_QINI_CORE = """
WITH users AS (
  SELECT user_id,
         CAST(user_id % 2 AS BIGINT) AS treated,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM {events} WHERE user_id IS NOT NULL GROUP BY user_id
), scored AS (
  SELECT treated, y,
         NTILE(10) OVER (ORDER BY md5(CAST(user_id AS {str})), user_id)
           AS decile
  FROM users
), per_d AS (
  SELECT decile,
         SUM(treated) AS n_t, SUM(1 - treated) AS n_c,
         SUM(treated * y) AS r_t, SUM((1 - treated) * y) AS r_c
  FROM scored GROUP BY decile
), cum AS (
  SELECT decile,
         SUM(n_t) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cn_t,
         SUM(n_c) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cn_c,
         SUM(r_t) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cr_t,
         SUM(r_c) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cr_c
  FROM per_d
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(cn_t AS BIGINT) AS cum_n_treat,
       CAST(cn_c AS BIGINT) AS cum_n_ctrl,
       CAST(cr_t AS BIGINT) AS cum_resp_treat,
       CAST(cr_c AS BIGINT) AS cum_resp_ctrl,
       CAST(CASE WHEN cn_c > 0
                 THEN 1000 * (cr_t * cn_c - cr_c * cn_t) {idiv} cn_c
                 ELSE 0 END AS BIGINT) AS qini_milli
FROM cum
ORDER BY decile
"""


def events_uplift_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini curve for uplift evaluation: users split into a
    deterministic treatment arm (user_id parity), ranked by a
    deterministic md5 'model score', and per cumulative decile the
    Qini value q(d) = cumR_t − cumR_c·(cumN_t/cumN_c) in exact
    integer milli units.  A random score yields a Qini hugging zero
    — which is the point: the harness (deciles, cumulative window,
    integer scaling) is the operator; a real uplift model drops its
    score column in.  One user-level aggregation, one 10-row
    window."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r52_qini_events"
    )
    return spark.sql(
        _QINI_CORE.format(
            events="r52_qini_events", str="STRING", idiv="DIV"
        )
    )


_QINI_DUCK = _QINI_CORE.format(events="events", str="VARCHAR", idiv="//")

# ---------------------------------------------------------------------------
# Brier decomposition
# ---------------------------------------------------------------------------

# Value-domain bound (contract.VALUE_DOMAIN_SQL, pinned by
# tests/test_contract_hygiene.py): keeps the cents x2500 ppm product
# exact INT64 in both engines — DuckDB throws on BIGINT overflow where
# Spark wraps (round-8 probe).
_BRIER_CORE = """
WITH v AS (
  SELECT least(TRY_CAST(round(value * 100) AS BIGINT) * 2500, 1000000)
           AS p_ppm,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM {events}
  WHERE value BETWEEN -1.0e12 AND 1.0e12  -- scan-pushdown half
    AND TRY_CAST(round(value * 100) AS BIGINT) IS NOT NULL
), g AS (
  SELECT COUNT(*) AS n, SUM(y) AS sy,
         SUM(CAST((p_ppm - y * 1000000) AS {big})
             * (p_ppm - y * 1000000)) AS sq
  FROM v
), b AS (
  SELECT least(p_ppm {idiv} 100000, 9) AS bin,
         COUNT(*) AS nk, SUM(p_ppm) AS sp, SUM(y) AS syk
  FROM v GROUP BY least(p_ppm {idiv} 100000, 9)
), terms AS (
  SELECT
    CAST(floor(nk * (CAST(sp AS DOUBLE) / nk
                     - CAST(syk AS DOUBLE) * 1000000 / nk)
                  * (CAST(sp AS DOUBLE) / nk
                     - CAST(syk AS DOUBLE) * 1000000 / nk)
               / 1000000) AS BIGINT) AS rel_t,
    CAST(floor(nk * (CAST(syk AS DOUBLE) * 1000000 / nk
                     - CAST(g.sy AS DOUBLE) * 1000000 / g.n)
                  * (CAST(syk AS DOUBLE) * 1000000 / nk
                     - CAST(g.sy AS DOUBLE) * 1000000 / g.n)
               / 1000000) AS BIGINT) AS res_t
  FROM b CROSS JOIN g
)
SELECT CAST(g.n AS BIGINT) AS n_events,
       CAST(g.sq {idiv} (g.n * 1000000) AS BIGINT) AS brier_ppm,
       CAST(SUM(rel_t) {idiv} g.n AS BIGINT) AS reliability_ppm,
       CAST(SUM(res_t) {idiv} g.n AS BIGINT) AS resolution_ppm,
       CAST(g.sy * (1000000 - g.sy * 1000000 {idiv} g.n) {idiv} g.n
            AS BIGINT) AS uncertainty_ppm,
       CAST(g.sq {idiv} (g.n * 1000000)
            - (SUM(rel_t) {idiv} g.n
               - SUM(res_t) {idiv} g.n
               + g.sy * (1000000 - g.sy * 1000000 {idiv} g.n) {idiv} g.n)
            AS BIGINT) AS decomposition_gap_ppm
FROM terms CROSS JOIN g
GROUP BY g.n, g.sy, g.sq
"""


def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score (reliability −
    resolution + uncertainty) for the same value-as-probability
    model `ml_calibration_bins` audits, over the same ten bins.  The
    raw Brier comes from an exact integer sum of squared ppm errors;
    the per-bin reliability/resolution terms are one fixed-shape
    float each, floored to integer contributions BEFORE summing
    (order-immune), and the gap column reports the residual the
    within-bin variance and flooring leave — an honest decomposition
    rather than one forced to balance.  Two conditional-aggregate
    scans, then ten rows."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r52_brier_events"
    )
    return spark.sql(
        _BRIER_CORE.format(
            events="r52_brier_events", big="DECIMAL(38,0)", idiv="DIV"
        )
    )


_BRIER_DUCK = _BRIER_CORE.format(events="events", big="HUGEINT", idiv="//")

# ---------------------------------------------------------------------------
# Source overlap matrix
# ---------------------------------------------------------------------------

_OVL_SHINGLE = 5

_OVL_CORE = f"""
WITH srcdim AS (
  SELECT source, ROW_NUMBER() OVER (ORDER BY source) AS rn
  FROM (SELECT DISTINCT source FROM {{docs}})
), grams AS (
  SELECT DISTINCT gh, source FROM {{grams}}
), masks AS (
  SELECT g.gh, SUM({{shl}}) AS mask
  FROM grams g JOIN srcdim s ON s.source = g.source
  GROUP BY g.gh
), mh AS (
  SELECT mask, COUNT(*) AS cnt FROM masks GROUP BY mask
), totals AS (
  SELECT s.rn, s.source, SUM(CASE WHEN (mh.mask & {{shl_s}}) > 0
                                  THEN mh.cnt ELSE 0 END) AS n_grams
  FROM srcdim s CROSS JOIN mh
  GROUP BY s.rn, s.source
), pairs AS (
  SELECT a.rn AS ra, a.source AS sa, a.n_grams AS ga,
         b.rn AS rb, b.source AS sb, b.n_grams AS gb
  FROM totals a JOIN totals b ON a.rn < b.rn
), inter AS (
  SELECT p.sa, p.sb, p.ga, p.gb,
         SUM(CASE WHEN (mh.mask & {{shl_a}}) > 0
                   AND (mh.mask & {{shl_b}}) > 0
                  THEN mh.cnt ELSE 0 END) AS shared
  FROM pairs p CROSS JOIN mh
  GROUP BY p.sa, p.sb, p.ga, p.gb
)
SELECT sa AS source_a, sb AS source_b,
       CAST(ga AS BIGINT) AS grams_a,
       CAST(gb AS BIGINT) AS grams_b,
       CAST(shared AS BIGINT) AS shared_grams,
       CAST(CASE WHEN ga + gb - shared > 0
                 THEN 1000 * shared {{idiv}} (ga + gb - shared)
                 ELSE 0 END AS BIGINT) AS jaccard_milli
FROM inter
ORDER BY source_a, source_b
"""


def curate_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise shingle overlap between corpus sources — 'which
    source scraped which' — via ONE gram aggregation into per-gram
    source bitmasks (20 sources ⇒ bits 0..19 of one int64), then a
    mask histogram small enough that all 190 pairwise
    intersection/Jaccard numbers are computed from it without
    touching the grams again.  The heavy work is exactly one shuffle
    of distinct (gram-HASH, source) pairs — shingles are folded to
    48-bit md5 ints map-side, so 8-byte keys shuffle, never text
    (locally neutral — the md5 cost offsets the smaller shuffle —
    but the honest posture at 100 TB where shuffle bytes are the
    bill; a 48-bit space holds ~10^7 grams before birthday
    collisions bias a Jaccard count by more than ~1e-5).
    At 62+ sources the mask becomes an array chunk — the contract is
    documented, not silently wrong (the row-number dimension makes
    the bit assignment deterministic in both engines)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "r52_ovl_docs"
    )
    spark.sql(
        f"""
        SELECT CAST(conv(substring(md5(
                 concat_ws(' ', slice(t, i, {_OVL_SHINGLE}))), 1, 12),
                 16, 10) AS BIGINT) AS gh,
               source
        FROM (SELECT source, filter(split(text, ' '), x -> x != '') AS t
              FROM r52_ovl_docs)
        LATERAL VIEW explode(sequence(1, size(t) - {_OVL_SHINGLE} + 1))
          e AS i
        WHERE size(t) >= {_OVL_SHINGLE}
        """
    ).createOrReplaceTempView("r52_ovl_grams")
    return spark.sql(
        _OVL_CORE.format(
            docs="r52_ovl_docs",
            grams="r52_ovl_grams",
            shl="shiftleft(CAST(1 AS BIGINT), CAST(s.rn AS INT) - 1)",
            shl_s="shiftleft(CAST(1 AS BIGINT), CAST(s.rn AS INT) - 1)",
            shl_a="shiftleft(CAST(1 AS BIGINT), CAST(p.ra AS INT) - 1)",
            shl_b="shiftleft(CAST(1 AS BIGINT), CAST(p.rb AS INT) - 1)",
            idiv="DIV",
        )
    )


_OVL_DUCK = _OVL_CORE.format(
    docs="documents",
    grams=(
        f"""(
  SELECT CAST(concat('0x', substring(md5(
           array_to_string(list_slice(t, i, i + {_OVL_SHINGLE} - 1), ' ')),
           1, 12)) AS BIGINT) AS gh,
         source
  FROM (SELECT source, list_filter(string_split(text, ' '), x -> x != '')
          AS t
        FROM documents),
       UNNEST(range(1, 1200)) AS u(i)
  WHERE i <= len(t) - {_OVL_SHINGLE} + 1
)"""
    ),
    shl="(CAST(1 AS BIGINT) << (CAST(s.rn AS INT) - 1))",
    shl_s="(CAST(1 AS BIGINT) << (CAST(s.rn AS INT) - 1))",
    shl_a="(CAST(1 AS BIGINT) << (CAST(p.ra AS INT) - 1))",
    shl_b="(CAST(1 AS BIGINT) << (CAST(p.rb AS INT) - 1))",
    idiv="//",
)

# ---------------------------------------------------------------------------
# Kendall tau-b (sampled)
# ---------------------------------------------------------------------------

_TAU_CAP = 1000

_TAU_CORE = f"""
WITH per_c AS (
  -- bounded cents (round-10 layer 2, caught by the sf0.01 hostile
  -- sweep): an absurd castable spend makes the concordance product
  -- (x-diff * y-diff) exceed INT64, where Spark wraps (flipping the
  -- pair's sign) while DuckDB's HUGEINT sum stays exact; a customer
  -- with no valid spend is not a sample point, and neither is a NULL
  -- customer key — md5(NULL) is NULL, which sorts FIRST in Spark and
  -- LAST in DuckDB, flipping its sample membership once the cap binds
  SELECT o_custkey AS ck, COUNT(*) AS x,
         SUM({money_rounded_sql('o_totalprice')}) AS y
  FROM {{orders}} WHERE o_custkey IS NOT NULL GROUP BY o_custkey
), samp AS (
  SELECT x, y, rn FROM (
    SELECT x, y,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(ck AS {{str}})), ck)
             AS rn
    FROM per_c WHERE y IS NOT NULL
  ) WHERE rn <= {_TAU_CAP}
), pairs AS (
  SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS conc,
         CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS disc,
         CASE WHEN a.x = b.x AND a.y != b.y THEN 1 ELSE 0 END AS tx,
         CASE WHEN a.y = b.y AND a.x != b.x THEN 1 ELSE 0 END AS ty
  FROM samp a JOIN samp b ON a.rn < b.rn
), s AS (
  SELECT COUNT(*) AS np, SUM(conc) AS c, SUM(disc) AS d,
         SUM(tx) AS tx, SUM(ty) AS ty
  FROM pairs
)
SELECT CAST((SELECT COUNT(*) FROM samp) AS BIGINT) AS n_sample,
       CAST(c AS BIGINT) AS concordant,
       CAST(d AS BIGINT) AS discordant,
       CAST(tx AS BIGINT) AS ties_x_only,
       CAST(ty AS BIGINT) AS ties_y_only,
       CAST(floor((CAST(c AS DOUBLE) - d)
                  / sqrt((CAST(c AS DOUBLE) + d + tx)
                         * (CAST(c AS DOUBLE) + d + ty))
                  * 1000) AS BIGINT) AS tau_b_milli
FROM s
"""


def agg_kendall_tau_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between per-customer order count and total
    spend, under the deterministic md5-capped 1000-row sample that
    bounds the O(n²) pair space (the same contract as
    `agg_hodges_lehmann` — tau is where sampling is the honest
    distributed answer, Spearman `agg_spearman_rho` is the
    streaming-rank complement).  Concordant/discordant/tie counts
    are exact integers; tau-b is one fixed-shape float."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r52_tau_orders"
    )
    return spark.sql(
        _TAU_CORE.format(orders="r52_tau_orders", str="STRING")
    )


_TAU_DUCK = _TAU_CORE.format(orders="orders", str="VARCHAR")

# ---------------------------------------------------------------------------
# Table content checksum
# ---------------------------------------------------------------------------

_CKS_MOD = 1_000_000_007

_CKS_CORE = f"""
WITH fp AS (
  SELECT {{hexint}} AS h
  FROM (
    SELECT md5(concat_ws('|',
             CAST(o_orderkey AS {{str}}),
             CAST(o_custkey AS {{str}}),
             o_orderstatus,
             CAST(TRY_CAST(round(o_totalprice * 100) AS BIGINT) AS {{str}}),
             CAST(CAST(o_orderdate AS DATE) AS {{str}}),
             o_orderpriority)) AS m
    FROM {{orders}}
  )
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct_fp,
       CAST(SUM(CAST(h % {_CKS_MOD} AS DECIMAL(38,0))) % {_CKS_MOD}
            AS BIGINT) AS checksum_sum,
       CAST(MIN(h) AS BIGINT) AS min_fp,
       CAST(MAX(h) AS BIGINT) AS max_fp
FROM fp
"""


def validate_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content checksum of the orders table:
    canonicalize every column to a stable string form (ints, exact
    cents, date-without-time — the float column never stringifies),
    md5 each row, fold the top 48 bits into an additive modular
    checksum.  Addition commutes, so the checksum is identical under
    any partitioning or row order — the property a distributed
    integrity audit needs; comparing two snapshots costs two scans
    and a 5-number diff.  Per-row residues (< 1e9) accumulate in
    DECIMAL(38,0) and the modulus is re-applied AFTER the sum: a
    plain BIGINT sum would wrap silently in Spark past ~9e9 rows
    while DuckDB's HUGEINT→BIGINT cast errors — a divergent failure
    mode for the one op whose job is cross-snapshot integrity.  One
    map-side projection + one aggregate."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r52_cks_orders"
    )
    return spark.sql(
        _CKS_CORE.format(
            orders="r52_cks_orders",
            str="STRING",
            hexint="CAST(conv(substring(m, 1, 12), 16, 10) AS BIGINT)",
        )
    )


_CKS_DUCK = _CKS_CORE.format(
    orders="orders",
    str="VARCHAR",
    hexint="CAST(concat('0x', substring(m, 1, 12)) AS BIGINT)",
)

# ---------------------------------------------------------------------------
# Dunning LLR keyness
# ---------------------------------------------------------------------------

_KEY_MIN_A = 5
_KEY_TOP = 5

_KEYNESS_CORE = f"""
WITH tokc AS (
  SELECT source, tok, COUNT(*) AS a FROM {{toks}} GROUP BY source, tok
), src_tot AS (
  SELECT source, SUM(a) AS ns FROM tokc GROUP BY source
), tok_tot AS (
  SELECT tok, SUM(a) AS ta FROM tokc GROUP BY tok
), n AS (
  SELECT SUM(ns) AS nn FROM src_tot
), scored AS (
  SELECT t.source, t.tok, t.a,
         tt.ta - t.a AS b,
         CAST(floor(2000000 * (
             t.a * ln(CAST(t.a AS DOUBLE) * nn
                      / (CAST(tt.ta AS DOUBLE) * st.ns))
             + CASE WHEN tt.ta - t.a > 0
                    THEN (tt.ta - t.a)
                         * ln(CAST(tt.ta - t.a AS DOUBLE) * nn
                              / (CAST(tt.ta AS DOUBLE) * (nn - st.ns)))
                    ELSE 0.0 END)) AS BIGINT) AS g2_micro
  FROM tokc t
  JOIN src_tot st ON st.source = t.source
  JOIN tok_tot tt ON tt.tok = t.tok
  CROSS JOIN n
  WHERE t.a >= {_KEY_MIN_A}
), ranked AS (
  SELECT source, tok, a, b, g2_micro,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY g2_micro DESC, tok) AS rk
  FROM scored
)
SELECT source, tok, CAST(a AS BIGINT) AS count_in_source,
       CAST(b AS BIGINT) AS count_elsewhere,
       g2_micro, CAST(rk AS BIGINT) AS rank
FROM ranked WHERE rk <= {_KEY_TOP}
ORDER BY source, rank
"""


def text_keyness_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood keyness: for every source, the five
    tokens most over-represented vs the rest of the corpus (G² =
    2Σ O·ln(O/E) over the 2×2 source/rest table; the E terms expand
    to exact integer rationals so each of the two ln calls takes a
    rational argument, and the whole per-term score is one
    fixed-shape float floored to micro units).  The distinctive-
    vocabulary extractor behind corpus dataset cards.  One token
    count shuffle; source and token totals re-aggregate from the
    counted relation, never the corpus."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "r52_key_docs"
    )
    spark.sql(
        """
        SELECT source, explode(filter(split(text, ' '), x -> x != ''))
          AS tok
        FROM r52_key_docs
        """
    ).createOrReplaceTempView("r52_key_toks")
    return spark.sql(_KEYNESS_CORE.format(toks="r52_key_toks"))


_KEYNESS_DUCK = _KEYNESS_CORE.format(
    toks=(
        """(
  SELECT source,
         unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
  FROM documents
)"""
    )
)


QUERIES = {
    "events_uplift_qini": events_uplift_qini,
    "ml_brier_decomposition": ml_brier_decomposition,
    "curate_source_overlap_matrix": curate_source_overlap_matrix,
    "agg_kendall_tau_sampled": agg_kendall_tau_sampled,
    "validate_table_checksum": validate_table_checksum,
    "text_keyness_llr": text_keyness_llr,
}

ORACLE = {
    "events_uplift_qini": _QINI_DUCK,
    "ml_brier_decomposition": _BRIER_DUCK,
    "curate_source_overlap_matrix": _OVL_DUCK,
    "agg_kendall_tau_sampled": _TAU_DUCK,
    "validate_table_checksum": _CKS_DUCK,
    "text_keyness_llr": _KEYNESS_DUCK,
}
