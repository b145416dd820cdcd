"""Round-5 batch 37: collocation mining, community modularity, exact
small-table inference, multiple-testing control, quantile-loss
evaluation and a robust location estimator (SURVEY.md §2.9 text/
graph/aggregation/ml families; no reference counterpart — the
reference is a single-dataset ETL, `src/pipeline_pyspark.py:30-364`).

  * ``text_pmi_collocations`` — pointwise mutual information over
    corpus bigrams: the collocation extractor behind phrase
    vocabularies and tokenizer merges.  PMI is ONE ln of an exact
    integer rational (c_xy·N_uni² / (N_big·c_x·c_y)), so the
    micro-nat floor is stable across engines.
  * ``graph_community_modularity`` — Newman modularity of the
    region partition over the symmetrized nation trade graph.  The
    per-community numerators (T·intra_c − deg_c²) accumulate in
    exact DECIMAL(38,0); only the final ppm ratio is one
    fixed-shape float.
  * ``agg_fisher_exact`` — Fisher's exact test on a bounded 2×2
    contingency table via a log-factorial table built with ONE
    sequential window cumsum.  Extremeness is decided by comparing
    in-engine lnpmf values under a deterministic 1e-9 tie guard
    (exact ties count as extreme in both engines), and only coarse
    summaries (centi-nat lnpmf, permille p) are floored — the
    precision discipline that keeps a long float cumsum from
    flipping a fine-grained floor between engines.
  * ``agg_bh_fdr`` — Benjamini–Hochberg step-up over per-nation
    Chebyshev-bound p-values.  Every p is derived from exact
    DECIMAL(38,0) power sums; the BH threshold comparison
    (p_micro·m ≤ 100000·rank) is pure integer arithmetic.
  * ``ml_pinball_quantile_eval`` — pinball (quantile) loss of the
    per-segment empirical-quantile predictor at τ ∈ {0.1,0.5,0.9};
    order-statistic quantiles by integer-ceil rank, loss in exact
    deci-cents.
  * ``agg_hodges_lehmann`` — the Hodges–Lehmann pseudomedian
    (median of pairwise Walsh sums) per market segment, under a
    deterministic hash-capped sample that bounds the quadratic pair
    blow-up (the intra-bucket contract every dedup verifier in this
    repo follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table
from .contract import money_rounded_sql

# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOP = 20

_PMI_CORE = f"""
WITH uni AS (
  SELECT tok, COUNT(*) AS c FROM {{unigrams}} GROUP BY tok
), nuni AS (
  SELECT SUM(c) AS n_uni FROM uni
), big AS (
  SELECT gram, left_tok, right_tok, COUNT(*) AS c
  FROM {{bigrams}} GROUP BY gram, left_tok, right_tok
), nbig AS (
  SELECT SUM(c) AS n_big FROM big
)
SELECT b.gram AS gram,
       CAST(b.c AS BIGINT) AS c_pair,
       CAST(ul.c AS BIGINT) AS c_left,
       CAST(ur.c AS BIGINT) AS c_right,
       CAST(floor(ln((CAST(b.c AS DOUBLE) * n_uni * n_uni)
                     / (CAST(n_big AS DOUBLE) * ul.c * ur.c))
                  * 1000000) AS BIGINT) AS pmi_micro_nats
FROM big b
JOIN uni ul ON ul.tok = b.left_tok
JOIN uni ur ON ur.tok = b.right_tok
CROSS JOIN nuni CROSS JOIN nbig
WHERE b.c >= {_PMI_MIN_COUNT}
ORDER BY pmi_micro_nats DESC, gram
LIMIT {_PMI_TOP}
"""


def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by PMI (min pair count 5, see
    ``_PMI_TOP``/``_PMI_MIN_COUNT``): ln(P(xy)/(P(x)P(y))) with all
    probabilities
    from the same tokenization, so the ln argument is an exact
    integer rational and the micro-nat floor is engine-stable.
    Two map-combined gram counts; the unigram side is vocabulary-
    sized and broadcast into the bigram join — at 100 TB the bigram
    count shuffles hashed grams only, never document bodies."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "r50_pmi_docs"
    )
    spark.sql(
        """
        SELECT filter(split(text, ' '), x -> x != '') AS t
        FROM r50_pmi_docs
        """
    ).createOrReplaceTempView("r50_pmi_words")
    spark.sql(
        """
        SELECT explode(t) AS tok FROM r50_pmi_words
        """
    ).createOrReplaceTempView("r50_pmi_uni")
    spark.sql(
        """
        SELECT concat_ws(' ', t[i - 1], t[i]) AS gram,
               t[i - 1] AS left_tok, t[i] AS right_tok
        FROM r50_pmi_words
        LATERAL VIEW explode(sequence(1, size(t) - 1)) e AS i
        WHERE size(t) >= 2
        """
    ).createOrReplaceTempView("r50_pmi_big")
    return spark.sql(
        _PMI_CORE.format(
            unigrams="r50_pmi_uni",
            bigrams="r50_pmi_big",
        )
    )


_PMI_DUCK = _PMI_CORE.format(
    unigrams=(
        """(
  SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
  FROM documents
)"""
    ),
    bigrams=(
        """(
  SELECT t[i] || ' ' || t[i + 1] AS gram,
         t[i] AS left_tok, t[i + 1] AS right_tok
  FROM (SELECT list_filter(string_split(text, ' '), x -> x != '') AS t
        FROM documents),
       UNNEST(range(1, 1200)) AS u(i)
  WHERE i <= len(t) - 1
)"""
    ),
)

# ---------------------------------------------------------------------------
# Community modularity
# ---------------------------------------------------------------------------

_MODULARITY_CORE = """
WITH und AS (
  SELECT src AS a, dst AS b, w FROM {edges}
  UNION ALL
  SELECT dst AS a, src AS b, w FROM {edges}
), comm AS (
  SELECT n_nationkey AS node, n_regionkey AS c FROM {nation}
), t AS (
  SELECT SUM(w) AS t_total FROM und
), intra AS (
  SELECT ca.c AS c, SUM(u.w) AS intra_w
  FROM und u
  JOIN comm ca ON ca.node = u.a
  JOIN comm cb ON cb.node = u.b
  WHERE ca.c = cb.c
  GROUP BY ca.c
), deg AS (
  SELECT cm.c AS c, SUM(u.w) AS deg_w
  FROM und u JOIN comm cm ON cm.node = u.a
  GROUP BY cm.c
), per_c AS (
  SELECT d.c,
         COALESCE(i.intra_w, 0) AS intra_w,
         d.deg_w,
         CAST(t_total AS DECIMAL(38,0)) * COALESCE(i.intra_w, 0)
           - CAST(d.deg_w AS DECIMAL(38,0)) * d.deg_w
           AS contrib_num,
         t_total
  FROM deg d LEFT JOIN intra i ON i.c = d.c CROSS JOIN t
)
SELECT r.r_name AS region,
       CAST(intra_w AS BIGINT) AS intra_w,
       CAST(deg_w AS BIGINT) AS deg_w,
       CASE WHEN contrib_num >  CAST(9223372036854775807 AS DECIMAL(38,0))
              OR contrib_num < CAST(-9223372036854775807 AS DECIMAL(38,0))
                               - CAST(1 AS DECIMAL(38,0))
            THEN CAST({err}('graph_community_modularity: contrib_num exceeds BIGINT')
                      AS BIGINT)
            ELSE CAST(contrib_num AS BIGINT) END AS contrib_num,
       CAST(t_total AS BIGINT) AS t_total,
       CAST(floor(CAST(SUM(contrib_num) OVER () AS DOUBLE)
                  / (CAST(t_total AS DOUBLE) * t_total)
                  * 1000000) AS BIGINT) AS modularity_ppm
FROM per_c JOIN {region} r ON r.r_regionkey = per_c.c
ORDER BY region
"""


def graph_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the region partition over the
    symmetrized nation trade graph: Q = Σ_c(intra_c/T − (deg_c/T)²)
    with T = Σ A_ij.  Per-community numerators T·intra_c − deg_c²
    accumulate in DECIMAL(38,0) — T is ~2× lineitem rows, so the
    int64 product would wrap around sf500; DECIMAL keeps it exact to
    ~1e38 and the reported BIGINT column raises identically in BOTH
    engines (raise_error / error) if a value ever exceeds int64
    instead of Spark silently wrapping while DuckDB errors.  Only the
    final ppm ratio is one fixed-shape float.  Consumes the
    session-shared
    ``trade_edges`` cache (one lineitem⋈orders build serves
    PageRank, BFS, routes and this), then everything is
    nations²-sized with broadcast community/region maps."""
    from .relational7 import trade_edges_cached

    trade_edges_cached(spark, sf_dir).createOrReplaceTempView(
        "r50_mod_edges"
    )
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "r50_mod_nation"
    )
    load_table(spark, sf_dir, "region").createOrReplaceTempView(
        "r50_mod_region"
    )
    return spark.sql(
        _MODULARITY_CORE.format(
            edges="r50_mod_edges",
            nation="r50_mod_nation",
            region="r50_mod_region",
            err="raise_error",
        )
    )


_MODULARITY_DUCK = (
    """
WITH trade_edges AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY s.s_nationkey, c.c_nationkey
)"""
    + _MODULARITY_CORE.replace("WITH und AS (", ", und AS (", 1).format(
        edges="trade_edges", nation="nation", region="region", err="error"
    )
)

# ---------------------------------------------------------------------------
# Fisher's exact test
# ---------------------------------------------------------------------------

# COALESCE mirrors the plan's `or 0` normalization of the collected
# counts: over an empty slice the SUMs are NULL, and without it the
# oracle's whole pmf pipeline emits NULLs where the plan inlines
# zeros (caught by the single-row parity net).
_FISHER_BASE_AGG = """
  SELECT COUNT(*) AS n,
         COALESCE(SUM(CASE WHEN p_brand LIKE 'Brand#1%'
                           THEN 1 ELSE 0 END), 0) AS r1,
         COALESCE(SUM(CASE WHEN p_type LIKE 'SMALL%'
                           THEN 1 ELSE 0 END), 0) AS c1,
         COALESCE(SUM(CASE WHEN p_brand LIKE 'Brand#1%'
                   AND p_type LIKE 'SMALL%' THEN 1 ELSE 0 END), 0) AS k_obs
  FROM {part} WHERE p_size <= 3
"""

# Tie guard for the extremeness census: lnpmf values on the two sides
# of the comparison come from independent ln() cumsums, so JVM
# Math.log vs libm can drift by a few ulps (~1e-13 accumulated over
# hundreds of terms) and near-symmetric marginals (r1 = c1 or
# r1 + c1 = n) produce EXACT pmf ties that land on either side of the
# raw double compare depending on the engine.  1e-9 is ~4 orders
# above the accumulated float error and ~3 orders below the smallest
# genuinely-distinct lnpmf gap a 2x2 hypergeometric with marginals in
# the hundreds can produce, so ties (and only ties) are counted as
# "as extreme" in BOTH engines — the scipy convention.
_FISHER_TIE_EPS = "1e-9"

_FISHER_CORE = """
WITH base AS (
{base}
), lf AS (
  SELECT i,
         SUM(CASE WHEN i > 1 THEN ln(CAST(i AS DOUBLE)) ELSE 0.0 END)
           OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS lf
  FROM ({series})
), const AS (
  SELECT b.n, b.r1, b.c1, b.k_obs,
         CASE WHEN b.r1 + b.c1 - b.n > 0 THEN b.r1 + b.c1 - b.n
              ELSE 0 END AS kmin,
         CASE WHEN b.r1 < b.c1 THEN b.r1 ELSE b.c1 END AS kmax,
         la.lf + lb.lf + lc.lf + ld.lf - le.lf AS lnconst
  FROM base b
  JOIN lf la ON la.i = b.r1
  JOIN lf lb ON lb.i = b.n - b.r1
  JOIN lf lc ON lc.i = b.c1
  JOIN lf ld ON ld.i = b.n - b.c1
  JOIN lf le ON le.i = b.n
), ks AS (
  SELECT c.*, {kexpand}
  FROM const c {kexpand_from}
), pmf AS (
  SELECT ks.n, ks.r1, ks.c1, ks.k_obs, ks.kmin, ks.kmax, ks.k,
         ks.lnconst - l1.lf - l2.lf - l3.lf - l4.lf AS lnpmf
  FROM ks
  JOIN lf l1 ON l1.i = ks.k
  JOIN lf l2 ON l2.i = ks.r1 - ks.k
  JOIN lf l3 ON l3.i = ks.c1 - ks.k
  JOIN lf l4 ON l4.i = ks.n - ks.r1 - ks.c1 + ks.k
), obs AS (
  SELECT lnpmf AS lnpmf_obs FROM pmf WHERE k = k_obs
)
SELECT CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(r1) AS BIGINT) AS r1,
       CAST(MAX(c1) AS BIGINT) AS c1,
       CAST(MAX(k_obs) AS BIGINT) AS k_obs,
       CAST(MAX(kmin) AS BIGINT) AS kmin,
       CAST(MAX(kmax) AS BIGINT) AS kmax,
       CAST(MAX((r1 + 1) * (c1 + 1) {idiv} (n + 2)) AS BIGINT) AS mode_k,
       CAST(MAX(1000000 * r1 * c1 {idiv} n) AS BIGINT)
         AS expected_k_micro,
       CAST(SUM(CASE WHEN lnpmf <= lnpmf_obs + {tie_eps} THEN 1 ELSE 0 END)
            AS BIGINT)
         AS n_more_extreme,
       CAST(floor(MAX(lnpmf_obs) * 100) AS BIGINT) AS lnpmf_obs_centi,
       CAST(floor(SUM(CASE WHEN lnpmf <= lnpmf_obs + {tie_eps}
                           THEN exp(lnpmf) ELSE 0.0 END) * 1000) AS BIGINT)
         AS p_two_sided_permille
FROM pmf CROSS JOIN obs
"""


def agg_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's exact test of brand family × type family on the
    bounded small-size part slice (p_size ≤ 3 keeps marginals in the
    hundreds — exactly the regime Fisher exists for; beyond ~1e6 the
    chi² path `agg_chi2_independence` is the estimator of record and
    the log-factorial table would be the wrong tool).  ln k! comes
    from ONE sequential window cumsum over a generated 0..n series;
    the hypergeometric support is exploded per k and each lnpmf is
    nine table lookups.  Extremeness uses a deterministic tie guard
    (`lnpmf ≤ lnpmf_obs + 1e-9`, see ``_FISHER_TIE_EPS``): symmetric
    marginals (r1 = c1 or r1 + c1 = n) produce EXACT pmf ties whose
    raw-double compare would flip with JVM-vs-libm ln() ulp drift;
    the epsilon counts ties as "as extreme" in both engines (the
    scipy convention) while staying orders below any genuinely
    distinct pmf gap.  Only the coarse summaries (centi-nat lnpmf,
    permille p) are floored, with boundary widths 4-6 orders above
    the accumulated float error.

    The 2×2 table itself is ONE bounded-scalar collect (4 ints —
    the same sanctioned pattern as PageRank's node count): inlining
    the counts as literals means the factorial series, the support
    explosion and the nine lookups all derive from generated
    relations, so the part table is scanned exactly once instead of
    once per CTE re-derivation."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView(
        "r50_fisher_part"
    )
    row = spark.sql(
        _FISHER_BASE_AGG.format(part="r50_fisher_part")
    ).collect()[0]
    # empty input: COUNT is 0 but the SUMs are NULL — normalize so the
    # literal inlining below stays well-typed (the oracle's aggregate
    # NULLs coalesce the same way through its CASE arithmetic)
    n = int(row.n or 0)
    r1 = int(row.r1 or 0)
    c1 = int(row.c1 or 0)
    k_obs = int(row.k_obs or 0)
    return spark.sql(
        _FISHER_CORE.format(
            # BIGINT casts are load-bearing: bare literals type as
            # INT32 and 1000000*r1*c1 wraps negative at sf0.1+
            # (DuckDB's aggregate-derived counts are BIGINT, so the
            # sf0.1 parity sweep caught the asymmetry).
            base=(
                f"  SELECT CAST({n} AS BIGINT) AS n, "
                f"CAST({r1} AS BIGINT) AS r1, "
                f"CAST({c1} AS BIGINT) AS c1, "
                f"CAST({k_obs} AS BIGINT) AS k_obs"
            ),
            series=(
                "SELECT explode(sequence(0, CAST(n AS INT))) AS i "
                "FROM base"
            ),
            kexpand="e.k",
            kexpand_from=(
                "LATERAL VIEW explode(sequence(CAST(c.kmin AS INT), "
                "CAST(c.kmax AS INT))) e AS k"
            ),
            idiv="DIV",
            tie_eps=_FISHER_TIE_EPS,
        )
    )


_FISHER_DUCK = _FISHER_CORE.format(
    base=_FISHER_BASE_AGG.format(part="part"),
    series=(
        "SELECT u.i FROM base, "
        "UNNEST(range(0, CAST(n AS INT) + 1)) AS u(i)"
    ),
    kexpand="u.k",
    kexpand_from=(
        ", UNNEST(range(CAST(c.kmin AS INT), CAST(c.kmax AS INT) + 1)) "
        "AS u(k)"
    ),
    idiv="//",
    tie_eps=_FISHER_TIE_EPS,
)

# ---------------------------------------------------------------------------
# Benjamini-Hochberg over Chebyshev p-values
# ---------------------------------------------------------------------------

_BH_ALPHA_MICRO = 100_000  # alpha = 0.1, in micro units

_BH_CORE = f"""
WITH cents AS (
  -- bounded money ingest (round-10 layer 2): x^2 on a castable
  -- absurd value times n overflows DECIMAL(38); NULL x has no test
  SELECT nk, x FROM (
    SELECT c.c_nationkey AS nk,
           {money_rounded_sql('o.o_totalprice')} AS x
    FROM {{orders}} o JOIN {{customer}} c ON o.o_custkey = c.c_custkey
  ) WHERE x IS NOT NULL
), per_n AS (
  SELECT nk, COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx
  FROM cents GROUP BY nk
), gtot AS (
  SELECT SUM(n) AS nn, SUM(sx) AS g FROM per_n
), p AS (
  SELECT nk, n,
         CASE
           WHEN n < 2 OR nn * sx - n * g = 0 THEN 1000000
           ELSE CAST(LEAST(CAST(1000000 AS DOUBLE),
                floor(1000000.0
                      * CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                      / (CAST(n - 1 AS DOUBLE)
                         * CAST(nn * sx - n * g AS DOUBLE)
                         * CAST(nn * sx - n * g AS DOUBLE))))
                AS BIGINT)
         END AS p_micro
  FROM per_n CROSS JOIN gtot
), ranked AS (
  SELECT nk, n, p_micro,
         ROW_NUMBER() OVER (ORDER BY p_micro, nk) AS bh_rank,
         COUNT(*) OVER () AS m
  FROM p
), cut AS (
  SELECT *,
         MAX(CASE WHEN p_micro * m <= {_BH_ALPHA_MICRO} * bh_rank
                  THEN bh_rank ELSE 0 END) OVER () AS i_star
  FROM ranked
)
SELECT nt.n_name AS nation,
       CAST(n AS BIGINT) AS n_orders,
       CAST(p_micro AS BIGINT) AS p_chebyshev_micro,
       CAST(bh_rank AS BIGINT) AS bh_rank,
       CAST(CASE WHEN bh_rank <= i_star THEN 1 ELSE 0 END AS BIGINT)
         AS discovered
FROM cut JOIN {{nation}} nt ON nt.n_nationkey = cut.nk
ORDER BY bh_rank, nation
"""


def agg_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg step-up (α=0.1) over per-nation 'does this
    nation's mean order value differ from the global mean' tests with
    Chebyshev-bound p-values: p ≤ (s²/n)/d² is a genuine conservative
    p-value that needs NO normal CDF, so the whole pipeline — power
    sums, p, the BH threshold p·m ≤ α·rank, and the step-up cut —
    is exact integer/DECIMAL arithmetic except one fixed-shape float
    division per group.  One orders-sized aggregation (customer keys
    broadcast), then everything is 25 rows; the multiple-testing
    discipline every per-segment metric sweep at 100 TB needs."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r50_bh_orders"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "r50_bh_customer"
    )
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "r50_bh_nation"
    )
    return spark.sql(
        _BH_CORE.format(
            orders="r50_bh_orders",
            customer="r50_bh_customer",
            nation="r50_bh_nation",
        )
    )


_BH_DUCK = _BH_CORE.format(
    orders="orders", customer="customer", nation="nation"
)

# ---------------------------------------------------------------------------
# Pinball quantile loss
# ---------------------------------------------------------------------------

_PINBALL_CORE = f"""
WITH cents AS (
  -- bounded balance (round-10 layer 2): the tau-weighted residual on
  -- a castable absurd value overflows INT64; NULL x has no rank
  SELECT segment, x FROM (
    SELECT c_mktsegment AS segment,
           {money_rounded_sql('c_acctbal')} AS x
    FROM {{customer}}
  ) WHERE x IS NOT NULL
), ranked AS (
  SELECT segment, x,
         ROW_NUMBER() OVER (PARTITION BY segment ORDER BY x) AS rn,
         COUNT(*) OVER (PARTITION BY segment) AS n
  FROM cents
), taus AS (
  {{taus}}
), qs AS (
  SELECT r.segment, t.tau, r.x AS q, r.n
  FROM ranked r JOIN taus t
    ON r.rn = (t.tau * r.n + 9) {{idiv}} 10
)
SELECT q.segment AS segment,
       CAST(q.tau AS BIGINT) AS tau_deci,
       CAST(q.q AS BIGINT) AS q_cents,
       CAST(MAX(q.n) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN c.x >= q.q THEN q.tau * (c.x - q.q)
                     ELSE (10 - q.tau) * (q.q - c.x) END) AS BIGINT)
         AS pinball_loss_deci_cents
FROM qs q JOIN cents c ON c.segment = q.segment
GROUP BY q.segment, q.tau, q.q
ORDER BY segment, tau_deci
"""


def ml_pinball_quantile_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball loss of the per-segment empirical-quantile predictor
    at τ ∈ {0.1, 0.5, 0.9} on customer balances — the evaluation
    metric for quantile regressors, computed against the exact
    order-statistic quantile (rank ⌈τ·n⌉ via pure integer ceil, so
    no interpolation-definition drift between engines) in exact
    deci-cents.  One window rank + one segment-joined aggregation;
    at 100 TB the quantile side is segment-count-sized and
    broadcast back onto the fact scan."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "r50_pin_customer"
    )
    return spark.sql(
        _PINBALL_CORE.format(
            customer="r50_pin_customer",
            taus="SELECT * FROM VALUES (1), (5), (9) AS t(tau)",
            idiv="DIV",
        )
    )


_PINBALL_DUCK = _PINBALL_CORE.format(
    customer="customer",
    taus="SELECT * FROM (VALUES (1), (5), (9)) AS t(tau)",
    idiv="//",
)

# ---------------------------------------------------------------------------
# Hodges-Lehmann pseudomedian
# ---------------------------------------------------------------------------

_HL_CAP = 400

_HL_CORE = f"""
WITH cents AS (
  -- bounded balance (round-10 layer 2): a Walsh pair sum of two
  -- castable absurd values overflows INT64; NULL x has no pair
  SELECT segment, ck, x FROM (
    SELECT c_mktsegment AS segment, c_custkey AS ck,
           {money_rounded_sql('c_acctbal')} AS x
    FROM {{customer}}
  ) WHERE x IS NOT NULL
), samp AS (
  SELECT segment, x, rn FROM (
    SELECT segment, x,
           ROW_NUMBER() OVER (PARTITION BY segment
                              ORDER BY md5(CAST(ck AS {{str}})), ck)
             AS rn
    FROM cents
  ) WHERE rn <= {_HL_CAP}
), walsh AS (
  SELECT a.segment, a.x + b.x AS s
  FROM samp a JOIN samp b
    ON a.segment = b.segment AND a.rn <= b.rn
), ranked AS (
  SELECT segment, s,
         ROW_NUMBER() OVER (PARTITION BY segment ORDER BY s) AS rn,
         COUNT(*) OVER (PARTITION BY segment) AS cnt
  FROM walsh
), med AS (
  SELECT segment, s AS hl_double_cents, cnt AS n_pairs
  FROM ranked WHERE rn = (cnt + 1) {{idiv}} 2
), plain AS (
  SELECT segment, 2 * x AS med_double_cents
  FROM (
    SELECT segment, x,
           ROW_NUMBER() OVER (PARTITION BY segment ORDER BY x) AS rn,
           COUNT(*) OVER (PARTITION BY segment) AS cnt
    FROM samp
  ) WHERE rn = (cnt + 1) {{idiv}} 2
)
SELECT m.segment AS segment,
       CAST(m.n_pairs AS BIGINT) AS n_pairs,
       CAST(m.hl_double_cents AS BIGINT) AS hl_double_cents,
       CAST(p.med_double_cents AS BIGINT) AS med_double_cents
FROM med m JOIN plain p ON p.segment = m.segment
ORDER BY segment
"""


def agg_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann pseudomedian (lower median of the n(n+1)/2
    Walsh pair sums, reported in doubled cents so everything stays
    integer) per market segment, next to the plain sample median it
    robustifies.  The quadratic pair space is bounded by a
    DETERMINISTIC hash-capped sample (``_HL_CAP`` rows/segment via
    md5(custkey) order — the same bounded-bucket contract as the
    dedup verifiers), so the op costs O(segments · cap²) regardless
    of table size; the cap is the explicit knob a 100 TB run would
    raise on a larger cluster.  All arithmetic is exact integers."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "r50_hl_customer"
    )
    return spark.sql(
        _HL_CORE.format(customer="r50_hl_customer", str="STRING", idiv="DIV")
    )


_HL_DUCK = _HL_CORE.format(customer="customer", str="VARCHAR", idiv="//")


QUERIES = {
    "text_pmi_collocations": text_pmi_collocations,
    "graph_community_modularity": graph_community_modularity,
    "agg_fisher_exact": agg_fisher_exact,
    "agg_bh_fdr": agg_bh_fdr,
    "ml_pinball_quantile_eval": ml_pinball_quantile_eval,
    "agg_hodges_lehmann": agg_hodges_lehmann,
}

ORACLE = {
    "text_pmi_collocations": _PMI_DUCK,
    "graph_community_modularity": _MODULARITY_DUCK,
    "agg_fisher_exact": _FISHER_DUCK,
    "agg_bh_fdr": _BH_DUCK,
    "ml_pinball_quantile_eval": _PINBALL_DUCK,
    "agg_hodges_lehmann": _HL_DUCK,
}
