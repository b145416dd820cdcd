"""Round-5 batch 29: boosted-stump training, learning-curve
evaluation, and Pythagorean means (SURVEY.md §2.9 aggregation/ML
families; no reference counterpart).

  * ``ml_gbdt_boosted_stumps`` — 3 unrolled rounds of least-squares
    gradient boosting with depth-1 trees over a 64-bin feature
    histogram. After ONE binning scan, every round (split search +
    residual update) runs on the persisted 64-row histogram: the
    per-bin residual sum is linear in the leaf constants, so
    boosting never revisits the data — the LightGBM histogram trick
    taken to its logical end for stumps.
  * ``ml_learning_curve`` — does more data help? Trains the same
    stump on nested 20%/40%/80% hash-split fractions and scores each
    on the SAME held-out 20%, all from one conditional histogram
    pass. The sample-efficiency question every data-curation loop
    asks, answered in one scan.
  * ``agg_geometric_harmonic_means`` — exact arithmetic/geometric/
    harmonic means per order priority: log terms floored to integer
    micro-nats and reciprocals to integer picos BEFORE summation, so
    both nonlinear means are addition-order independent.

Determinism contract: leaf values use explicit floor(double)
division (NOT `DIV`/`//`, which disagree on negatives — Spark
truncates toward zero, DuckDB floors; residuals go negative from
round 2); split scores are fixed-shape doubles shared textually by
both engines with a bin-ascending tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .contract import money_cents, money_cents_sql

_BINS = 64
_ROUNDS = 3


def _binned_orders(spark: SparkSession, sf_dir: str):
    """(bin, n, sY) histogram of order totalprice cents over the
    order-date day index — one distributed scan, <= 64 rows (bin is
    never NULL: LEAST/GREATEST skip NULL operands in both engines, so
    a NULL day index pins to bin 63)."""
    f = load_table(spark, sf_dir, "orders").select(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("bigint")
        .alias("d"),
        money_cents("o_totalprice").alias("y"),
    )
    span = f.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    b = f.crossJoin(F.broadcast(span)).select(
        F.expr(
            f"LEAST((d - lo) * {_BINS} DIV GREATEST(hi - lo, 1), {_BINS} - 1)"
        ).alias("bin"),
        "y",
    )
    return b.groupBy("bin").agg(F.count("*").alias("n"), F.sum("y").alias("sY"))


_GBDT_HIST_DUCK = f"""
WITH f AS (
  SELECT CAST(datediff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
         {money_cents_sql('o_totalprice')} AS y
  FROM orders
), span AS (
  SELECT MIN(d) AS lo, MAX(d) AS hi FROM f
), b AS (
  SELECT LEAST((d - lo) * {_BINS} // GREATEST(hi - lo, 1),
               {_BINS} - 1) AS bin, y
  FROM f CROSS JOIN span
), hist0 AS (
  SELECT bin, COUNT(*) AS n, SUM(y) AS sY FROM b GROUP BY bin
)"""


def _gbdt_rounds(hist0: str) -> str:
    """CTE chain: cum_r -> best_r -> hist_r, r = 1.._ROUNDS, over a
    64-row relation. Leaves are floor(double) cents; the split score
    maximizes sl^2/nl + sr^2/nr (the exact SSE-reduction order)."""
    ctes = []
    prev = hist0
    for r in range(1, _ROUNDS + 1):
        ctes.append(f"""cum{r} AS (
  SELECT bin, SUM(n) OVER (ORDER BY bin) AS nl,
         SUM(sY) OVER (ORDER BY bin) AS sl,
         SUM(n) OVER () AS nt, SUM(sY) OVER () AS st
  FROM {prev}
), best{r} AS (
  SELECT bin AS cut, nl, nt - nl AS nr,
         CAST(floor(CAST(sl AS DOUBLE) / nl) AS BIGINT) AS leafl,
         CAST(floor(CAST(st - sl AS DOUBLE) / (nt - nl)) AS BIGINT)
           AS leafr
  FROM cum{r} WHERE nl > 0 AND nt - nl > 0
  ORDER BY CAST(sl AS DOUBLE) * sl / nl
           + CAST(st - sl AS DOUBLE) * (st - sl) / (nt - nl) DESC, bin
  LIMIT 1
), hist{r} AS (
  SELECT h.bin, h.n,
         h.sY - h.n * (CASE WHEN h.bin <= b.cut THEN b.leafl
                            ELSE b.leafr END) AS sY
  FROM {prev} h CROSS JOIN best{r} b
)""")
        prev = f"hist{r}"
    finals = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, CAST(cut AS BIGINT) AS cut_bin,"
        f" CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,"
        f" leafl AS leaf_left_cents, leafr AS leaf_right_cents FROM best{r}"
        for r in range(1, _ROUNDS + 1)
    )
    return ", ".join(ctes) + "\n" + finals + "\nORDER BY round"


def ml_gbdt_boosted_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round least-squares boosted stumps on order totalprice over
    the order-date axis. One scan bins the data; the 64-row histogram
    carries (bin, n, residual-sum), and because a stump's prediction
    is constant per side, each round's residual update is pure
    integer arithmetic ON THE HISTOGRAM — rounds cost 64 rows each
    regardless of table size, which is why histogram GBDT scales.
    Output: each round's cut, sizes and integer-cent leaves. Every
    number is exact (see module determinism contract).

    The histogram is bounded by the bin constant (<= 64 rows at ANY
    fact volume), so the three boosting rounds run driver-side (guide
    §1.2/§5): the old unrolled cum->best->hist CTE chain referenced
    each round's output twice, doubling the plan per round and
    scheduling ~22 tiny stage-jobs of pure coordination. Replication
    is exact: the split score keeps the SQL's float64 operation order
    (CAST(sl AS DOUBLE) * sl / nl left-to-right), leaves floor a
    float64 quotient, SUM-over-prefix is NULL until the first
    non-NULL residual sum (reachable only on hostile money), the
    DESC sort places NULL scores last like Spark, and an empty best
    relation empties every later round exactly like the CROSS JOIN
    did. Oracle parity at two SFs plus the hostile/NULL/empty nets
    and the pure-Python third implementation prove the replication."""
    import math

    # bounded collect: <= _BINS rows at any scale (bin is never NULL)
    hist = {
        r["bin"]: (r["n"], r["sY"])
        for r in _binned_orders(spark, sf_dir).collect()
    }
    schema = (
        "round bigint, cut_bin bigint, n_left bigint, n_right bigint, "
        "leaf_left_cents bigint, leaf_right_cents bigint"
    )
    n = {b: v[0] for b, v in hist.items()}
    sY = {b: v[1] for b, v in hist.items()}
    out = []
    for rnd in range(1, _ROUNDS + 1):
        bins = sorted(n)
        nt = sum(n.values())
        st_vals = [v for v in sY.values() if v is not None]
        st = sum(st_vals) if st_vals else None
        best = None  # (sortkey, cut, nl, nr, sl, sr)
        nl = 0
        sl = None
        for b in bins:
            nl += n[b]
            if sY[b] is not None:
                sl = (sl or 0) + sY[b]
            if not (nl > 0 and nt - nl > 0):
                continue
            if sl is None or st is None:
                score, sr = None, None
            else:
                sr = st - sl
                score = (
                    float(sl) * sl / nl + float(sr) * sr / (nt - nl)
                )
            # ORDER BY score DESC (NULLS LAST), bin ASC
            key = (1, 0.0, b) if score is None else (0, -score, b)
            if best is None or key < best[0]:
                best = (key, b, nl, nt - nl, sl, sr)
        if best is None:
            break  # empty best -> every later round's CROSS JOIN is empty
        _, cut, bnl, bnr, bsl, bsr = best
        leafl = (
            None if bsl is None else int(math.floor(float(bsl) / bnl))
        )
        leafr = (
            None if bsr is None else int(math.floor(float(bsr) / bnr))
        )
        out.append((rnd, cut, bnl, bnr, leafl, leafr))
        for b in bins:
            leaf = leafl if b <= cut else leafr
            sY[b] = (
                None
                if sY[b] is None or leaf is None
                else sY[b] - n[b] * leaf
            )
    return spark.createDataFrame(out, schema)


_GBDT_DUCK = _GBDT_HIST_DUCK + ", " + _gbdt_rounds("hist0")

# ---------------------------------------------------------------------------
# Learning curve
# ---------------------------------------------------------------------------

_LC_FRACS = (1, 2, 4)  # hash buckets 1..k train; bucket 0 is holdout


def _lc_hist_spark(spark: SparkSession, sf_dir: str):
    f = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 5).alias("g"),
        money_cents("o_totalprice").alias("v"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    span = f.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    b = f.crossJoin(F.broadcast(span)).select(
        "g",
        "y",
        F.expr(
            f"LEAST((v - lo) * {_BINS} DIV GREATEST(hi - lo, 1), {_BINS} - 1)"
        ).alias("bin"),
    )
    aggs = [F.count("*").alias("n_all")]
    for k in _LC_FRACS:
        aggs.append(
            F.sum(F.expr(f"CASE WHEN g >= 1 AND g <= {k} THEN 1 ELSE 0 END"))
            .alias(f"n{k}")
        )
        aggs.append(
            F.sum(F.expr(f"CASE WHEN g >= 1 AND g <= {k} THEN y ELSE 0 END"))
            .alias(f"p{k}")
        )
    aggs.append(F.sum(F.expr("CASE WHEN g = 0 THEN 1 ELSE 0 END")).alias("hn"))
    aggs.append(F.sum(F.expr("CASE WHEN g = 0 THEN y ELSE 0 END")).alias("hp"))
    return b.groupBy("bin").agg(*aggs)


def _lc_hist_duck() -> str:
    conds = []
    for k in _LC_FRACS:
        conds.append(
            f"SUM(CASE WHEN g >= 1 AND g <= {k} THEN 1 ELSE 0 END) AS n{k},\n"
            f"  SUM(CASE WHEN g >= 1 AND g <= {k} THEN y ELSE 0 END) AS p{k}"
        )
    return f"""
WITH f AS (
  SELECT o_orderkey % 5 AS g,
         {money_cents_sql('o_totalprice')} AS v,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), span AS (
  SELECT MIN(v) AS lo, MAX(v) AS hi FROM f
), b AS (
  SELECT g, y, LEAST((v - lo) * {_BINS} // GREATEST(hi - lo, 1),
               {_BINS} - 1) AS bin
  FROM f CROSS JOIN span
), hist AS (
  SELECT bin, COUNT(*) AS n_all, {', '.join(conds)},
  SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS hn,
  SUM(CASE WHEN g = 0 THEN y ELSE 0 END) AS hp
  FROM b GROUP BY bin
)"""


def _lc_rounds(hist: str) -> str:
    """Per fraction k: windowed split search on (n{k}, p{k}) by Gini,
    then holdout misclassification of the chosen stump, evaluated by
    joining the best cut back against the same histogram."""
    ctes, selects = [], []
    for k in _LC_FRACS:
        ctes.append(f"""cum{k} AS (
  SELECT bin, SUM(n{k}) OVER (ORDER BY bin) AS nl,
         SUM(p{k}) OVER (ORDER BY bin) AS posl,
         SUM(n{k}) OVER () AS nt, SUM(p{k}) OVER () AS post
  FROM {hist}
), best{k} AS (
  SELECT bin AS cut, nl, posl, nt - nl AS nr, post - posl AS posr, nt
  FROM cum{k} WHERE nl > 0 AND nt - nl > 0
  ORDER BY CAST(nl AS DOUBLE) / nt
             * (1 - (CAST(posl AS DOUBLE) / nl) * (CAST(posl AS DOUBLE) / nl)
                  - (CAST(nl - posl AS DOUBLE) / nl)
                    * (CAST(nl - posl AS DOUBLE) / nl))
           + CAST(nt - nl AS DOUBLE) / nt
             * (1 - (CAST(post - posl AS DOUBLE) / (nt - nl))
                    * (CAST(post - posl AS DOUBLE) / (nt - nl))
                  - (CAST((nt - nl) - (post - posl) AS DOUBLE) / (nt - nl))
                    * (CAST((nt - nl) - (post - posl) AS DOUBLE) / (nt - nl)))
           ASC, bin
  LIMIT 1
), eval{k} AS (
  SELECT b.cut, b.nt,
         SUM(CASE WHEN h.bin <= b.cut THEN h.hn ELSE 0 END) AS hnl,
         SUM(CASE WHEN h.bin <= b.cut THEN h.hp ELSE 0 END) AS hpl,
         SUM(CASE WHEN h.bin > b.cut THEN h.hn ELSE 0 END) AS hnr,
         SUM(CASE WHEN h.bin > b.cut THEN h.hp ELSE 0 END) AS hpr,
         MIN(b.posl) AS posl, MIN(b.nl) AS nl,
         MIN(b.posr) AS posr, MIN(b.nr) AS nr
  FROM {hist} h CROSS JOIN best{k} b
  GROUP BY b.cut, b.nt
)""")
        # leaf label = majority class on the TRAIN side (2*pos > n);
        # holdout error counts the minority class of each side
        selects.append(
            f"SELECT CAST({k} AS BIGINT) AS train_buckets,"
            f" CAST(nt AS BIGINT) AS train_n,"
            f" CAST(cut AS BIGINT) AS cut_bin,"
            f" CAST(hnl + hnr AS BIGINT) AS holdout_n,"
            f" CAST((CASE WHEN 2 * posl > nl THEN hnl - hpl ELSE hpl END"
            f" + CASE WHEN 2 * posr > nr THEN hnr - hpr ELSE hpr END)"
            f" * 1000000 {{idiv}} (hnl + hnr) AS BIGINT)"
            f" AS holdout_err_ppm FROM eval{k}"
        )
    return (
        ", ".join(ctes)
        + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY train_buckets"
    )


def ml_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning curve for the finalized-status stump: train on nested
    1/2/4-bucket hash fractions (20/40/80% of orders), evaluate each
    on the same held-out bucket 0. ONE conditional-histogram scan
    feeds all three split searches AND the holdout scoring (the
    holdout's per-bin class counts ride in the same 64 rows), so the
    whole curve costs one pass + work on 64 rows — the 'will more
    data move the metric' answer a curation loop needs before paying
    for more data. Holdout labels never leak into training: leaf
    labels come from train-side majorities only.

    Like ml_gbdt_boosted_stumps, the three split searches + holdout
    scoring run driver-side over the <= 64-row bounded histogram
    (guide §1.2/§5; the old per-fraction cum->best->eval CTE chain
    scheduled ~23 tiny jobs). Replication is exact: Gini keeps the
    SQL's float64 operation order, the ASC sort ties on bin, a
    fraction with no valid split emits no row (the SQL's empty-best
    GROUP BY), NULL-bin rows cannot occur (LEAST/GREATEST skip NULL
    operands, pinning NULL cents to bin 63), and the ppm division
    mirrors Spark's NULL-on-zero-divisor DIV. Proven by oracle parity
    at two SFs, the hostile/NULL/empty nets, and the pure-Python
    third implementation in tests/test_round5_batch29.py."""
    # bounded collect: <= _BINS rows at any scale (bin is never NULL)
    rows = _lc_hist_spark(spark, sf_dir).collect()
    schema = (
        "train_buckets bigint, train_n bigint, cut_bin bigint, "
        "holdout_n bigint, holdout_err_ppm bigint"
    )
    out = []
    bins = sorted(r["bin"] for r in rows)
    byb = {r["bin"]: r for r in rows}
    for k in _LC_FRACS:
        nt = sum(byb[b][f"n{k}"] for b in bins)
        post = sum(byb[b][f"p{k}"] for b in bins)
        best = None  # (sortkey, cut, nl, posl)
        nl = posl = 0
        for b in bins:
            nl += byb[b][f"n{k}"]
            posl += byb[b][f"p{k}"]
            if not (nl > 0 and nt - nl > 0):
                continue
            # the SQL's exact float64 shape, left-to-right
            score = (
                float(nl) / nt
                * (
                    1
                    - (float(posl) / nl) * (float(posl) / nl)
                    - (float(nl - posl) / nl) * (float(nl - posl) / nl)
                )
                + float(nt - nl) / nt
                * (
                    1
                    - (float(post - posl) / (nt - nl))
                    * (float(post - posl) / (nt - nl))
                    - (float((nt - nl) - (post - posl)) / (nt - nl))
                    * (float((nt - nl) - (post - posl)) / (nt - nl))
                )
            )
            key = (score, b)  # ORDER BY score ASC, bin ASC
            if best is None or key < best[0]:
                best = (key, b, nl, posl)
        if best is None:
            continue  # empty best{k}: the eval GROUP BY emits no row
        _, cut, bnl, bposl = best
        bnr, bposr = nt - bnl, post - bposl
        hnl = sum(byb[b]["hn"] for b in bins if b <= cut)
        hpl = sum(byb[b]["hp"] for b in bins if b <= cut)
        hnr = sum(byb[b]["hn"] for b in bins if b > cut)
        hpr = sum(byb[b]["hp"] for b in bins if b > cut)
        err_num = (hnl - hpl if 2 * bposl > bnl else hpl) + (
            hnr - hpr if 2 * bposr > bnr else hpr
        )
        denom = hnl + hnr
        # Spark DIV returns NULL on a zero divisor; operands are
        # non-negative so floor-div equals truncating DIV here
        err = None if denom == 0 else err_num * 1_000_000 // denom
        out.append((k, nt, cut, denom, err))
    return spark.createDataFrame(out, schema)


_LC_DUCK = (_lc_hist_duck() + ", " + _lc_rounds("hist")).format(idiv="//")

# ---------------------------------------------------------------------------
# Pythagorean means
# ---------------------------------------------------------------------------

_MEANS_CORE = f"""
WITH f AS (
  SELECT o_orderpriority AS pri,
         {money_cents_sql('o_totalprice')} AS y
  FROM {{orders}} WHERE o_totalprice > 0
), s AS (
  SELECT pri, COUNT(*) AS n, SUM(y) AS sy,
         SUM(CAST(floor(ln(CAST(y AS DOUBLE)) * 1000000) AS BIGINT))
           AS slog_micro,
         SUM(CAST(floor(1000000000000.0 / y) AS BIGINT)) AS sinv_pico
  FROM f GROUP BY pri
)
SELECT pri,
       CAST(n AS BIGINT) AS n_orders,
       CAST(sy {{idiv}} n AS BIGINT) AS arith_mean_cents,
       CAST(floor(exp(CAST(slog_micro AS DOUBLE) / n / 1000000))
            AS BIGINT) AS geo_mean_cents,
       CAST(floor(CAST(n AS DOUBLE) * 1000000000000.0 / sinv_pico)
            AS BIGINT) AS harm_mean_cents
FROM s ORDER BY pri
"""


def agg_geometric_harmonic_means(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Arithmetic / geometric / harmonic mean of order value per
    priority. The nonlinear means accumulate per-term integers
    (micro-nats of ln y; picos of 1/y), so the sums are exact and
    partition-order independent; only the final exp/divide is float,
    fixed-shape in both engines. One map-combined scan. AM >= GM >=
    HM is asserted by the cross-check as a structural sanity bound."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r43_means_orders"
    )
    return spark.sql(_MEANS_CORE.format(orders="r43_means_orders", idiv="DIV"))


_MEANS_DUCK = _MEANS_CORE.format(orders="orders", idiv="//")


QUERIES = {
    "ml_gbdt_boosted_stumps": ml_gbdt_boosted_stumps,
    "ml_learning_curve": ml_learning_curve,
    "agg_geometric_harmonic_means": agg_geometric_harmonic_means,
}

ORACLE = {
    "ml_gbdt_boosted_stumps": _GBDT_DUCK,
    "ml_learning_curve": _LC_DUCK,
    "agg_geometric_harmonic_means": _MEANS_DUCK,
}
