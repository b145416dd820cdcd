"""Round-5 batch 35: k-core decomposition, lead-lag correlation, and
McNemar's paired test (SURVEY.md §2.9 graph/time-series/aggregation
families; no reference counterpart).

  * ``graph_kcore_peeling`` — iterative k-core peeling of the
    co-purchase graph with a DATA-DERIVED k (1.1x the average
    degree, so the peeling is non-trivial at every fixture scale).
    Six rounds; each round keeps nodes whose degree WITHIN the
    surviving subgraph is >= k. Spark materializes (persists) each
    round's survivor set — expressing the chain as CTEs would
    re-inline round r-1 TWICE per round and recompute the cascade
    2^6 times; the DuckDB oracle pins the same semantics with
    ``AS MATERIALIZED`` CTEs.
  * ``ts_lead_lag_xcorr`` — which daily series leads: same-day,
    views-lead and purchases-lead Pearson correlations over the
    observed-day sequence from exact DECIMAL power sums.
  * ``agg_mcnemar_paired`` — the PAIRED classifier comparison the
    unpaired chi-square can't do: discordant-pair counts between the
    char-length and word-count annotators against the en-language
    label, continuity-corrected statistic in integer milli.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

# ---------------------------------------------------------------------------
# k-core peeling
# ---------------------------------------------------------------------------

_KCORE_ROUNDS = 6


def graph_kcore_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six peeling rounds toward the k-core of the co-purchase graph,
    k = 0.8x average degree (integer-derived from edge/node counts,
    so both engines agree exactly). Every round is edge-sized work:
    join the persisted edge list against the current survivor set on
    both endpoints, recount degrees, keep >= k. Per-round persists
    cut the lineage (the BFS/label-propagation discipline); the
    output row per round reports the survivor count, so convergence
    — or collapse to empty — is visible data, not a claim. At 100 TB
    this is the standard iterative-subgraph shape: state = one node
    list, work = one edge join per round. The edge list is the
    session-shared `copurchase_pairs` cache (one build serves
    similarity, assortativity and the six rounds here)."""
    from .relational42 import copurchase_pairs

    pairs = copurchase_pairs(spark, sf_dir)
    deg = pairs.selectExpr("pa AS node").unionAll(
        pairs.selectExpr("pb AS node")
    )
    # k is ONE bounded scalar (integer-derived, identical in both
    # engines). Pull it once: as a one-row relation it cost a
    # broadcast-exchange job in EVERY round plus the final crossJoin
    # (each round is its own query execution, so the exchange is
    # rebuilt, never reused) — 7 of the ~20 tiny jobs this loop
    # schedules, all for the same constant.
    #
    # Round 11: the k pull and the initial survivor set each ran a
    # FULL groupBy/distinct pass over the 2|E|-row endpoint relation
    # (measured ~2s each at sf0.1). One node-sized degree relation
    # now feeds both — the checkpoint materializes during the k pull,
    # and surv0 = its keys is set-identical to deg.distinct() (a
    # groupBy's grouping keys ARE the distinct endpoints).
    d0 = deg.groupBy("node").count().localCheckpoint(eager=False)
    kv = (
        d0.agg(
            F.count("*").alias("n"),
            F.sum("count").alias("twom"),
        )
        .select(F.expr("(twom DIV n) * 8 DIV 10").alias("kv"))
        .first()[0]
    )
    # empty graph: the old one-row kdf relation held NULL here, so
    # every round filtered to zero survivors and k reported NULL —
    # F.lit(None) reproduces both (NULL comparison is never true)
    surv = d0.select("node")
    out = None
    for r in range(1, _KCORE_ROUNDS + 1):
        # surv is node-sized; without stats on a checkpointed
        # relation Spark would sort-merge both endpoint joins every
        # round — broadcast it explicitly (measured 8s -> ~2s for
        # the six rounds at sf0.1). The pa/pb renames canonicalize to
        # the same exchange, so the second join is a ReusedExchange —
        # one broadcast job per round, not two.
        e = (
            pairs.join(F.broadcast(surv.withColumnRenamed("node", "pa")), "pa")
            .join(F.broadcast(surv.withColumnRenamed("node", "pb")), "pb")
        )
        # explode(array(pa, pb)) emits both endpoints in ONE pass —
        # the union-of-two-selects form re-derives the endpoint join
        # twice per round.
        ends = e.select(
            F.explode(F.array("pa", "pb")).alias("node")
        )
        # surv is referenced TWICE per round (both endpoint joins);
        # left alone the duplicated subtree doubles every round (2^6
        # plan copies blew the driver heap at sf0.001 before this
        # cut). Lazy localCheckpoint keeps the plan linear in rounds
        # — the relational17 BFS discipline; the checkpointed
        # relation is node-sized.
        surv = (
            ends.groupBy("node")
            .count()
            .where(F.col("count") >= F.lit(kv))
            .select("node")
            .localCheckpoint(eager=False)
        )
        row = surv.agg(F.count("*").alias("n_core")).select(
            F.lit(r).cast("bigint").alias("round"),
            F.col("n_core").cast("bigint"),
        )
        out = row if out is None else out.unionAll(row)
    return out.select(
        "round", F.lit(kv).cast("bigint").alias("k"), "n_core"
    ).orderBy("round")


def _kcore_duck() -> str:
    ctes = [
        """li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), pairs AS MATERIALIZED (
  SELECT a.p AS pa, b.p AS pb
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
), deg AS MATERIALIZED (
  SELECT node, COUNT(*) AS d FROM (
    SELECT pa AS node FROM pairs UNION ALL SELECT pb AS node FROM pairs
  ) GROUP BY node
), k AS MATERIALIZED (
  SELECT CAST((SUM(d) // COUNT(*)) * 8 // 10 AS BIGINT) AS kv FROM deg
), s0 AS MATERIALIZED (SELECT node FROM deg)"""
    ]
    for r in range(1, _KCORE_ROUNDS + 1):
        ctes.append(f"""s{r} AS MATERIALIZED (
  SELECT node FROM (
    SELECT e.pa AS node FROM pairs e
      JOIN s{r - 1} x ON e.pa = x.node JOIN s{r - 1} y ON e.pb = y.node
    UNION ALL
    SELECT e.pb FROM pairs e
      JOIN s{r - 1} x ON e.pa = x.node JOIN s{r - 1} y ON e.pb = y.node
  ) GROUP BY node
  HAVING COUNT(*) >= (SELECT kv FROM k)
)""")
    finals = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round,"
        f" (SELECT kv FROM k) AS k,"
        f" CAST(COUNT(*) AS BIGINT) AS n_core FROM s{r}"
        for r in range(1, _KCORE_ROUNDS + 1)
    )
    return "WITH " + ", ".join(ctes) + "\n" + finals + "\nORDER BY round"


# ---------------------------------------------------------------------------
# Lead-lag cross-correlation
# ---------------------------------------------------------------------------

_XCORR_CORE = """
WITH daily AS (
  SELECT ({epoch_us}) {idiv} 86400000000 AS d,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM {events} WHERE ts IS NOT NULL GROUP BY 1
), lagged AS (
  SELECT x, y,
         LAG(x) OVER (ORDER BY d) AS xp,
         LAG(y) OVER (ORDER BY d) AS yp
  FROM daily
), inner_rows AS (
  SELECT * FROM lagged WHERE xp IS NOT NULL
), s AS (
  SELECT COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(xp) AS sxp, SUM(yp) AS syp,
         SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
         SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy,
         SUM(CAST(xp AS DECIMAL(38,0)) * xp) AS sxpxp,
         SUM(CAST(yp AS DECIMAL(38,0)) * yp) AS sypyp,
         SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
         SUM(CAST(xp AS DECIMAL(38,0)) * y) AS sxpy,
         SUM(CAST(yp AS DECIMAL(38,0)) * x) AS sypx
  FROM inner_rows
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                  * 1000000) AS BIGINT) AS corr_same_micro,
       CAST(floor((CAST(n AS DOUBLE) * CAST(sxpy AS DOUBLE)
                   - CAST(sxp AS DOUBLE) * CAST(sy AS DOUBLE))
                  / sqrt((CAST(n AS DOUBLE) * CAST(sxpxp AS DOUBLE)
                          - CAST(sxp AS DOUBLE) * CAST(sxp AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                  * 1000000) AS BIGINT) AS corr_views_lead_micro,
       CAST(floor((CAST(n AS DOUBLE) * CAST(sypx AS DOUBLE)
                   - CAST(syp AS DOUBLE) * CAST(sx AS DOUBLE))
                  / sqrt((CAST(n AS DOUBLE) * CAST(sypyp AS DOUBLE)
                          - CAST(syp AS DOUBLE) * CAST(syp AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                  * 1000000) AS BIGINT) AS corr_purchases_lead_micro
FROM s
"""


def ts_lead_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does view traffic lead purchases (or vice versa)? Pearson
    correlations at lag 0 and +/-1 day over the observed-day
    sequence: the event stream collapses to a daily (views,
    purchases) rollup first, LAG runs over that bounded relation
    (ts_periodogram's documented pattern), and all eleven power sums
    are exact integers — the three coefficients are fixed-shape
    floats micro-floored at the end. The triage query behind 'should
    the forecasting model include the other series as a feature'."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r48_xcorr_events"
    )
    return spark.sql(
        _XCORR_CORE.format(
            events="r48_xcorr_events",
            epoch_us="unix_micros(ts)",
            idiv="DIV",
        )
    )


_XCORR_DUCK = _XCORR_CORE.format(
    events="events", epoch_us="epoch_us(ts)", idiv="//"
)

# ---------------------------------------------------------------------------
# McNemar's paired test
# ---------------------------------------------------------------------------

_MCNEMAR_CRIT_MILLI = 3841  # chi2(1) at alpha 0.05

_MCNEMAR_CORE = f"""
WITH d AS (
  SELECT (n_chars >= 300) AS a_pred, ({{wc}} >= 45) AS b_pred,
         (lang = 'en') AS label
  FROM {{docs}}
), s AS (
  SELECT SUM(CASE WHEN a_pred = label AND b_pred != label
             THEN 1 ELSE 0 END) AS b,
         SUM(CASE WHEN b_pred = label AND a_pred != label
             THEN 1 ELSE 0 END) AS c,
         COUNT(*) AS n
  FROM d
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(b AS BIGINT) AS n_only_a_correct,
       CAST(c AS BIGINT) AS n_only_b_correct,
       CAST(GREATEST(ABS(b - c) - 1, 0) * GREATEST(ABS(b - c) - 1, 0)
              * 1000 {{idiv}} (b + c) AS BIGINT) AS mcnemar_milli,
       (GREATEST(ABS(b - c) - 1, 0) * GREATEST(ABS(b - c) - 1, 0)
          * 1000 {{idiv}} (b + c)) > {_MCNEMAR_CRIT_MILLI} AS significant
FROM s
"""


def agg_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on the two document annotators (char-length vs
    word-count gates) against the en-language label: only the
    DISCORDANT pairs carry information about which classifier is
    better on the same data — the paired comparison an unpaired
    chi-square silently gets wrong. Continuity-corrected statistic
    in exact integer milli from one conditional-sum scan."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "r48_mcnemar_docs"
    )
    return spark.sql(
        _MCNEMAR_CORE.format(
            docs="r48_mcnemar_docs",
            wc="size(filter(split(text, ' '), x -> x != ''))",
            idiv="DIV",
        )
    )


_MCNEMAR_DUCK = _MCNEMAR_CORE.format(
    docs="documents",
    wc="len(list_filter(string_split(text, ' '), x -> x != ''))",
    idiv="//",
)


QUERIES = {
    "graph_kcore_peeling": graph_kcore_peeling,
    "ts_lead_lag_xcorr": ts_lead_lag_xcorr,
    "agg_mcnemar_paired": agg_mcnemar_paired,
}

ORACLE = {
    "graph_kcore_peeling": _kcore_duck(),
    "ts_lead_lag_xcorr": _XCORR_DUCK,
    "agg_mcnemar_paired": _MCNEMAR_DUCK,
}
