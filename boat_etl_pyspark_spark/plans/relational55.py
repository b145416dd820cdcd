"""Round-5 batch 42: contrastive-pair mining, composite price
indices, engagement stickiness, embedding isotropy and optimal
thresholding (SURVEY.md §2.9 ml/aggregation/events/embedding
families; no reference counterpart).

  * ``ml_hard_negative_mining`` — for each anchor embedding, the
    most similar WRONG-label vector (the hard negative contrastive
    training wants) next to the best same-label positive and the
    margin between them.  Vectors quantize to int64 milli-units so
    every dot product is exact integer arithmetic; anchors are the
    deterministic md5-capped sample.
  * ``agg_price_index_fisher`` — Laspeyres, Paasche and Fisher
    price indices between two order years over the common part
    basket, with the per-part revaluations floored to exact cents
    (the integer definition is the contract, stated in the
    docstring).
  * ``events_dau_mau_stickiness`` — DAU/MAU stickiness per 30-day
    epoch month: the engagement ratio every product dashboard
    leads with, in pure integer arithmetic.
  * ``embed_isotropy_participation`` — participation ratio
    (Σλ)²/Σλ² of the embedding covariance WITHOUT an
    eigendecomposition (trace and Frobenius norm read off the
    integer Gram entries), plus the mean-vector anisotropy share:
    the 'is this embedding space collapsed' audit.
  * ``ml_threshold_youden`` — the decision threshold maximizing
    Youden's J = TPR − FPR over the full score grid via one
    cumulative window — the principled version of the fixed
    threshold list in `ml_confusion_threshold`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table

# ---------------------------------------------------------------------------
# Hard-negative mining
# ---------------------------------------------------------------------------

_HNM_ANCHORS = 50

_HNM_CORE = f"""
WITH q AS (
  SELECT vec_id, label, {{quant}} AS qv FROM {{emb}} WHERE {{valid}}
), anchors AS (
  SELECT vec_id, label, qv FROM (
    SELECT vec_id, label, qv,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS {{str}})),
                              vec_id) AS rn
    FROM q
  ) WHERE rn <= {_HNM_ANCHORS}
), dots AS (
  SELECT a.vec_id AS aid, a.label AS alabel,
         b.vec_id AS bid, b.label AS blabel,
         {{dot}} AS dot
  FROM anchors a JOIN q b ON b.vec_id != a.vec_id
), best AS (
  SELECT aid, alabel,
         MAX(CASE WHEN blabel = alabel THEN dot END) AS pos_dot,
         MAX(CASE WHEN blabel != alabel THEN dot END) AS neg_dot
  FROM dots GROUP BY aid, alabel
), hardest AS (
  SELECT d.aid, MIN(d.bid) AS neg_id
  FROM dots d JOIN best b
    ON b.aid = d.aid AND d.blabel != b.alabel AND d.dot = b.neg_dot
  GROUP BY d.aid
)
SELECT b.aid AS anchor_id,
       CAST(b.alabel AS BIGINT) AS label,
       CAST(b.pos_dot AS BIGINT) AS best_pos_dot,
       CAST(b.neg_dot AS BIGINT) AS hardest_neg_dot,
       CAST(b.pos_dot - b.neg_dot AS BIGINT) AS margin,
       CAST(h.neg_id AS BIGINT) AS hardest_neg_id
FROM best b JOIN hardest h ON h.aid = b.aid
ORDER BY anchor_id
"""

_HNM_QUANT_SPARK = (
    "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000)"
    " AS BIGINT))"
)
_HNM_DOT_SPARK = (
    "aggregate(zip_with(a.qv, b.qv, (x, y) -> x * y), 0L,"
    " (acc, v) -> acc + v)"
)
_HNM_QUANT_DUCK = (
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000)"
    " AS BIGINT))"
)
_HNM_DOT_DUCK = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(range(1, len(a.qv) + 1), i -> a.qv[i] * b.qv[i])),"
    " (acc, x) -> acc + x)"
)


def ml_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor
    (deterministic md5-capped sample of 50), the maximum-dot-product
    WRONG-label vector, the best same-label positive, and the
    pos−neg margin — negative margins are exactly the anchors a
    triplet loss would spend gradient on.  Embeddings quantize to
    int64 milli-units so every dot is exact integer arithmetic (ties
    broken by MIN vec_id, engine-exact).  The anchor×corpus dot
    relation is anchors·n rows — the capped-sample contract; at
    100 TB the candidate set comes from the IVF buckets
    (`sim_ivf_topk`) instead of the full corpus."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "r55_hnm_emb"
    )
    return spark.sql(
        _HNM_CORE.format(
            emb="r55_hnm_emb", quant=_HNM_QUANT_SPARK,
            dot=_HNM_DOT_SPARK, str="STRING",
            valid="embedding IS NOT NULL AND NOT exists(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)",
        )
    )


_HNM_DUCK = _HNM_CORE.format(
    emb="embeddings", quant=_HNM_QUANT_DUCK,
    dot=_HNM_DOT_DUCK, str="VARCHAR",
    valid="embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)) = 0",
)

# ---------------------------------------------------------------------------
# Price indices
# ---------------------------------------------------------------------------

_PI_Y0 = 1996
_PI_Y1 = 1997

_PRICEIDX_CORE = f"""
WITH li AS (
  SELECT l.l_partkey AS pk,
         CAST(year(o.o_orderdate) AS BIGINT) AS y,
         SUM(CAST(round(l.l_quantity) AS BIGINT)) AS qty,
         SUM(TRY_CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS ext
  FROM {{lineitem}} l JOIN {{orders}} o ON o.o_orderkey = l.l_orderkey
  WHERE year(o.o_orderdate) IN ({_PI_Y0}, {_PI_Y1})
  GROUP BY l.l_partkey, year(o.o_orderdate)
), common AS (
  SELECT a.pk, a.qty AS q0, a.ext AS e0, b.qty AS q1, b.ext AS e1
  FROM (SELECT * FROM li WHERE y = {_PI_Y0}) a
  JOIN (SELECT * FROM li WHERE y = {_PI_Y1}) b ON b.pk = a.pk
  WHERE a.qty > 0 AND b.qty > 0
), s AS (
  SELECT COUNT(*) AS n_parts,
         SUM(e0) AS se0, SUM(e1) AS se1,
         SUM(e1 * q0 {{idiv}} q1) AS l_num,
         SUM(e0 * q1 {{idiv}} q0) AS p_den
  FROM common
)
SELECT CAST(n_parts AS BIGINT) AS n_common_parts,
       CAST(se0 AS BIGINT) AS base_revenue_cents,
       CAST(se1 AS BIGINT) AS current_revenue_cents,
       CAST(1000000 * l_num {{idiv}} se0 AS BIGINT) AS laspeyres_ppm,
       CAST(1000000 * se1 {{idiv}} p_den AS BIGINT) AS paasche_ppm,
       CAST(floor(sqrt((1000000.0 * l_num / se0)
                       * (1000000.0 * se1 / p_den))) AS BIGINT)
         AS fisher_ppm
FROM s
"""


def agg_price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres, Paasche and Fisher price indices between order
    years 1996 and 1997 over the common part basket.  The per-part
    revaluation e1·q0/q1 (what the base basket would cost at current
    unit prices) floors to exact cents per part — that integer
    definition IS the published contract, so both engines and the
    Python cross-check agree to the last ppm; Fisher's geometric
    mean is the single fixed-shape float.  One fact aggregation by
    (part, year), then a part-keyed self-join of the two bounded
    year slices."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "r55_pi_lineitem"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r55_pi_orders"
    )
    return spark.sql(
        _PRICEIDX_CORE.format(
            lineitem="r55_pi_lineitem", orders="r55_pi_orders", idiv="DIV"
        )
    )


_PRICEIDX_DUCK = _PRICEIDX_CORE.format(
    lineitem="lineitem", orders="orders", idiv="//"
)

# ---------------------------------------------------------------------------
# DAU/MAU stickiness
# ---------------------------------------------------------------------------

_DAU_CORE = """
WITH days AS (
  SELECT {epoch_us} {idiv} 86400000000 AS d, user_id
  FROM {events}
), dau AS (
  SELECT d, d {idiv} 30 AS mo, COUNT(DISTINCT user_id) AS dau
  FROM days GROUP BY d
), mau AS (
  SELECT d {idiv} 30 AS mo, COUNT(DISTINCT user_id) AS mau
  FROM days GROUP BY d {idiv} 30
), agg AS (
  SELECT dau.mo, COUNT(*) AS n_days, SUM(dau.dau) AS sum_dau,
         MAX(mau.mau) AS mau
  FROM dau JOIN mau ON mau.mo = dau.mo
  GROUP BY dau.mo
)
SELECT CAST(mo AS BIGINT) AS month_idx,
       CAST(n_days AS BIGINT) AS n_days,
       CAST(sum_dau {idiv} n_days AS BIGINT) AS avg_dau,
       CAST(mau AS BIGINT) AS mau,
       CAST(1000 * sum_dau {idiv} (n_days * mau) AS BIGINT)
         AS stickiness_milli
FROM agg
ORDER BY month_idx
"""


def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per 30-day epoch month (epoch months keep
    the bucketing timezone-free and engine-exact; calendar months
    are one date_trunc swap): average daily actives over monthly
    actives, the engagement ratio product dashboards lead with.
    Two distinct-count aggregations over (day, user) — at 100 TB
    both swap to the documented HLL sketch contract — and a
    month-bounded join."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r55_dau_events"
    )
    return spark.sql(
        _DAU_CORE.format(
            events="r55_dau_events", epoch_us="unix_micros(ts)", idiv="DIV"
        )
    )


_DAU_DUCK = _DAU_CORE.format(
    events="events", epoch_us="epoch_us(ts)", idiv="//"
)

# ---------------------------------------------------------------------------
# Embedding isotropy
# ---------------------------------------------------------------------------

_ISO_DIMS = 16

_ISO_CORE = f"""
WITH q AS (
  SELECT {{quant}} AS qv FROM {{emb}} WHERE {{valid}}
), pairs AS (
  SELECT i, j, qv[{{ix}}] * qv[{{jx}}] AS prod
  FROM q {{expand}}
), gram AS (
  SELECT i, j, SUM(prod) AS g FROM pairs GROUP BY i, j
), stats AS (
  SELECT SUM(CASE WHEN i = j THEN g ELSE 0 END) AS trace,
         SUM(CAST(g AS DECIMAL(38,0)) * g) AS fro2
  FROM gram
), mean_num AS (
  SELECT SUM(CAST(s AS DECIMAL(38,0)) * s) AS mean2_num
  FROM (
    SELECT i, SUM(qv[{{ix}}]) AS s
    FROM q {{expand_i}}
    GROUP BY i
  )
), n AS (
  SELECT COUNT(*) AS n FROM q
)
SELECT CAST(n.n AS BIGINT) AS n_vectors,
       CAST({_ISO_DIMS} AS BIGINT) AS n_dims,
       CAST(stats.trace AS BIGINT) AS trace,
       CAST(floor(CAST(stats.trace AS DOUBLE) * stats.trace
                  / CAST(stats.fro2 AS DOUBLE) * 1000) AS BIGINT)
         AS participation_ratio_milli,
       CAST((1000000 * mean_num.mean2_num
             - (1000000 * mean_num.mean2_num)
               % (n.n * CAST(stats.trace AS DECIMAL(38,0))))
            / (n.n * CAST(stats.trace AS DECIMAL(38,0)))
            AS BIGINT) AS mean_vector_share_ppm
FROM stats CROSS JOIN mean_num CROSS JOIN n
"""


def embed_isotropy_participation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space isotropy WITHOUT an eigendecomposition: the
    participation ratio (Σλ)²/Σλ² = trace(G)²/‖G‖²_F needs only the
    integer Gram entries (1 ⇒ collapsed to one direction, d ⇒
    perfectly isotropic), and the mean-vector share ‖Σv‖²/(n·trace)
    measures the common-direction bias contrastive papers correct
    for.  Vectors quantize to int64 milli-units over the first 16
    dims; the Gram accumulates exact integers through a 256-row
    groupBy, so everything but the final ratio is exact."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "r55_iso_emb"
    )
    return spark.sql(
        _ISO_CORE.format(
            emb="r55_iso_emb",
            quant=(
                f"transform(slice(embedding, 1, {_ISO_DIMS}), "
                "x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
            ),
            expand=(
                f"LATERAL VIEW explode(sequence(1, {_ISO_DIMS})) ei AS i "
                f"LATERAL VIEW explode(sequence(1, {_ISO_DIMS})) ej AS j"
            ),
            expand_i=(
                f"LATERAL VIEW explode(sequence(1, {_ISO_DIMS})) ei AS i"
            ),
            ix="i - 1",
            jx="j - 1",
            idiv="DIV",
            valid="embedding IS NOT NULL AND NOT exists(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)",
        )
    )


_ISO_DUCK = _ISO_CORE.format(
    emb="embeddings",
    quant=(
        f"list_transform(list_slice(embedding, 1, {_ISO_DIMS}), "
        "x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    ),
    expand=(
        f", UNNEST(range(1, {_ISO_DIMS} + 1)) AS ei(i), "
        f"UNNEST(range(1, {_ISO_DIMS} + 1)) AS ej(j)"
    ),
    expand_i=f", UNNEST(range(1, {_ISO_DIMS} + 1)) AS ei(i)",
    ix="i",
    jx="j",
    idiv="//",
    valid="embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)) = 0",
)

# ---------------------------------------------------------------------------
# Youden-optimal threshold
# ---------------------------------------------------------------------------

# Score-grid quantization knob — see relational30._SCORE_GRID_CENTS
# (the `_SPEAR_GRID_CENTS` pattern on the events-cents rank keys).
# 1 = exact cents, bit-identical default; coarser values sweep
# thresholds on the grid, symmetrically in plan and oracle.
_SCORE_GRID_CENTS = 1

_YOUDEN_CORE = """
WITH v AS (
  SELECT TRY_CAST(round(value * 100) AS BIGINT) {idiv} {grid} AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM {events}
  WHERE value IS NOT NULL  -- scan-pushdown half of the predicate
    AND TRY_CAST(round(value * 100) AS BIGINT) IS NOT NULL
), grid AS (
  SELECT s, COUNT(*) AS n, SUM(y) AS pos FROM v GROUP BY s
), cum AS (
  SELECT s,
         SUM(pos) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING) AS tp,
         SUM(n - pos) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
           AS fp,
         SUM(pos) OVER () AS p,
         SUM(n - pos) OVER () AS neg
  FROM grid
), j AS (
  SELECT s, tp, fp, p, neg,
         1000000 * tp {idiv} p - 1000000 * fp {idiv} neg AS youden_micro
  FROM cum
)
SELECT CAST(s AS BIGINT) AS threshold_cents,
       CAST(tp AS BIGINT) AS tp,
       CAST(fp AS BIGINT) AS fp,
       CAST(1000000 * tp {idiv} p AS BIGINT) AS tpr_ppm,
       CAST(1000000 * fp {idiv} neg AS BIGINT) AS fpr_ppm,
       CAST(youden_micro AS BIGINT) AS youden_micro
FROM j
ORDER BY youden_micro DESC, threshold_cents
LIMIT 1
"""


def ml_threshold_youden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decision threshold maximizing Youden's J = TPR − FPR over
    the FULL score grid (value-predicts-purchase, the
    `ml_confusion_threshold` setup without its fixed threshold
    list): one cumulative window over the bounded distinct-cents
    grid evaluates every cut at once, J in exact integer micro
    units, deterministic tie-break toward the lower threshold.  The
    same one-pass sweep shape as the exact ROC AUC op."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r55_yj_events"
    )
    return spark.sql(
        _YOUDEN_CORE.format(events="r55_yj_events", idiv="DIV",
                            grid=_SCORE_GRID_CENTS)
    )


_YOUDEN_DUCK = _YOUDEN_CORE.format(events="events", idiv="//",
                                   grid=_SCORE_GRID_CENTS)


QUERIES = {
    "ml_hard_negative_mining": ml_hard_negative_mining,
    "agg_price_index_fisher": agg_price_index_fisher,
    "events_dau_mau_stickiness": events_dau_mau_stickiness,
    "embed_isotropy_participation": embed_isotropy_participation,
    "ml_threshold_youden": ml_threshold_youden,
}

ORACLE = {
    "ml_hard_negative_mining": _HNM_DUCK,
    "agg_price_index_fisher": _PRICEIDX_DUCK,
    "events_dau_mau_stickiness": _DAU_DUCK,
    "embed_isotropy_participation": _ISO_DUCK,
    "ml_threshold_youden": _YOUDEN_DUCK,
}
