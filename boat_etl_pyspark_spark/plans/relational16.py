"""Round-4 batch 8: distribution-level diagnostics (SURVEY.md §2.9
aggregation families; no reference counterpart — these are the
statistics a corpus/warehouse engine reports about its own data).

  * ``agg_chi2_independence`` — Pearson chi-square of customer market
    segment x order priority. The contingency table is one
    shuffle-join + aggregate; row/column margins are windows over the
    25-row cell relation; each cell's (O-E)^2/E term is floored to
    integer micro units BEFORE the final sum, keeping the statistic
    order-independent. At 100 TB the cost is the orders⋈customer
    join — the statistic itself is free.
  * ``agg_gini_concentration`` — Gini coefficient of per-customer
    spend via the sorted-cumulative formula G = (2·Σ i·s_i − (n+1)·
    Σ s_i) / (n·Σ s_i). The global sort-rank comes from the
    ``global_rank`` primitive (range exchange + broadcast offsets —
    no single-partition window), moments accumulate in DECIMAL(38,0)
    / HUGEINT, and one double division finishes.
  * ``text_zipf_fit`` — fit the Zipf exponent of the corpus
    vocabulary: rank tokens by frequency (global_rank again — at
    trillion-token scale the vocabulary is itself a big table), take
    fixed-point logs (micro-precision, the op's declared contract, so
    both engines floor the same doubles), and reuse the exact-
    power-sum OLS finish. Slope ≈ −1 is the healthy-corpus signal.
  * ``events_rate_spike_zscore`` — per event-type daily volume
    z-scored against the trailing 7 observed days (ROWS frame).
    Variance comes from integer sum/sum-of-squares in the same
    window, so z = (7n − Σ) / sqrt(7·Σx² − Σ²) is a fixed-shape
    double expression over exact integers; days without a full
    trailing week report NULL. One exchange on event_type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.library import global_rank
from ..sources.readers import load_table
from . import track_persist
from .contract import money_rounded, money_rounded_sql

# ---------------------------------------------------------------------------
# Chi-square independence
# ---------------------------------------------------------------------------

_CHI2_SPARK = """
WITH cells AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
         COUNT(*) AS o_cnt
  FROM {orders} o JOIN {customer} c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_orderpriority
), margins AS (
  SELECT seg, pri, o_cnt,
         SUM(o_cnt) OVER (PARTITION BY seg) AS row_tot,
         SUM(o_cnt) OVER (PARTITION BY pri) AS col_tot,
         SUM(o_cnt) OVER () AS n
  FROM cells
), terms AS (
  SELECT seg, pri, o_cnt, n,
         CAST(row_tot AS DOUBLE) * col_tot / n AS e
  FROM margins
)
SELECT CAST(max(n) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_segments,
       CAST(COUNT(DISTINCT pri) AS BIGINT) AS n_priorities,
       CAST((COUNT(DISTINCT seg) - 1) * (COUNT(DISTINCT pri) - 1)
            AS BIGINT) AS dof,
       CAST(SUM(CAST(floor((o_cnt - e) * (o_cnt - e) / e * 1e6)
                     AS BIGINT)) AS BIGINT) AS chi2_micro
FROM terms
"""

_CHI2_DUCK = """
WITH cells AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
         COUNT(*) AS o_cnt
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_orderpriority
), margins AS (
  SELECT seg, pri, o_cnt,
         SUM(o_cnt) OVER (PARTITION BY seg) AS row_tot,
         SUM(o_cnt) OVER (PARTITION BY pri) AS col_tot,
         SUM(o_cnt) OVER () AS n
  FROM cells
), terms AS (
  SELECT seg, pri, o_cnt, n,
         CAST(row_tot AS DOUBLE) * col_tot / n AS e
  FROM margins
)
SELECT CAST(max(n) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_segments,
       CAST(COUNT(DISTINCT pri) AS BIGINT) AS n_priorities,
       CAST((COUNT(DISTINCT seg) - 1) * (COUNT(DISTINCT pri) - 1)
            AS BIGINT) AS dof,
       CAST(SUM(CAST(floor((o_cnt - e) * (o_cnt - e) / e * 1e6)
                     AS BIGINT)) AS BIGINT) AS chi2_micro
FROM terms
"""


def agg_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between customer segment and
    order priority. One key-shuffle join feeds a 25-cell contingency
    aggregate; everything after operates on those 25 rows."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "r16_chi_orders"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "r16_chi_customer"
    )
    return spark.sql(
        _CHI2_SPARK.format(orders="r16_chi_orders", customer="r16_chi_customer")
    )


# ---------------------------------------------------------------------------
# Gini concentration of customer spend
# ---------------------------------------------------------------------------


def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer order spend. The ascending
    global rank (ties broken by custkey) comes from ``global_rank``
    — ONE range exchange over the per-customer aggregate, never a
    single-partition window — and the i·s_i moment accumulates in
    DECIMAL(38,0), overflow-proof past 1e9 customers.

    Hostile-ingest rules (round-10 layer 2): per-order cents are
    money-domain bounded and the rank·s_cents product widens BEFORE
    multiplying (rank alone reaches 1e9+; a castable absurd spend
    overflows INT64 where DuckDB throws and Spark wraps). A customer
    whose every price is corrupt has NULL spend and no position on
    the Lorenz curve — excluded symmetrically (engine NULL ordering
    differs)."""
    # persisted: global_rank's auto-sizing counts its input, and an
    # unpersisted aggregate would run twice (count + rank passes)
    spend = track_persist(
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(money_rounded("o_totalprice")).alias("s_cents"))
        .where(F.col("s_cents").isNotNull())
    )
    ranked = global_rank(spend, order_by=["s_cents", "o_custkey"])
    return ranked.agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("s_cents").cast("bigint").alias("total_cents"),
        F.expr(
            "CAST(floor(CAST(2 * SUM(CAST(rank AS DECIMAL(38,0)) * s_cents)"
            "            - CAST(COUNT(*) + 1 AS DECIMAL(38,0))"
            "              * SUM(CAST(s_cents AS DECIMAL(38,0))) AS DOUBLE)"
            "  / CAST(CAST(COUNT(*) AS DECIMAL(38,0))"
            "         * SUM(CAST(s_cents AS DECIMAL(38,0))) AS DOUBLE)"
            " * 1e6) AS BIGINT)"
        ).alias("gini_micro"),
    )


_GINI_DUCK = f"""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM({money_rounded_sql('o_totalprice')}) AS BIGINT)
           AS s_cents
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT s_cents,
         ROW_NUMBER() OVER (ORDER BY s_cents, o_custkey) AS rank
  FROM spend WHERE s_cents IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(s_cents) AS BIGINT) AS total_cents,
       CAST(floor(CAST(2 * SUM(CAST(rank AS HUGEINT) * s_cents)
                       - CAST(COUNT(*) + 1 AS HUGEINT)
                         * SUM(CAST(s_cents AS HUGEINT)) AS DOUBLE)
                  / CAST(CAST(COUNT(*) AS HUGEINT)
                         * SUM(CAST(s_cents AS HUGEINT)) AS DOUBLE)
                  * 1e6) AS BIGINT) AS gini_micro
FROM ranked
"""


# ---------------------------------------------------------------------------
# Zipf exponent of the vocabulary
# ---------------------------------------------------------------------------

_ZIPF_MIN_COUNT = 5

_ZIPF_FINISH = """
SELECT CAST(n AS BIGINT) AS n_vocab,
       CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6)
            AS BIGINT) AS slope_micro,
       CAST(floor((CAST(sy AS DOUBLE)
                   - CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                     * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) * 1e6)
            AS BIGINT) AS intercept_micro,
       CAST(floor(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
                  / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)) * 1e6)
            AS BIGINT) AS r2_micro
FROM mom
"""


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit: OLS of log-frequency on log-rank over the token
    vocabulary (count >= 5). Logs are floored to micro fixed-point —
    the declared precision of the op — so every downstream sum is an
    exact integer/decimal. Ranking uses ``global_rank`` on (-count,
    token): at web-corpus scale the vocabulary is far too large for a
    single-partition ORDER BY window."""
    docs = load_table(spark, sf_dir, "documents")
    # persisted: the tokenize+count aggregate would otherwise run twice
    # (global_rank's auto-sizing count pass + the rank pass)
    vocab = track_persist(
        docs.select(
            F.explode(
                F.expr("filter(split(text, ' '), x -> x != '')")
            ).alias("tok")
        )
        .groupBy("tok")
        .count()
        .where(F.col("count") >= _ZIPF_MIN_COUNT)
        .select("tok", F.col("count").alias("c"), (-F.col("count")).alias("negc"))
    )
    ranked = global_rank(vocab, order_by=["negc", "tok"])
    # Stay in the DataFrame API end to end: re-analyzing the ranked
    # relation through a temp view + spark.sql makes the CacheManager
    # re-map the rank fence's InMemoryRelation output and Spark 4.1
    # fails the attribute mapping (NoSuchElementException on the
    # computed order column). The chained selects below are the same
    # logical plan without the re-analysis round-trip.
    pts = ranked.selectExpr(
        "CAST(floor(ln(CAST(rank AS DOUBLE)) * 1e6) AS BIGINT) AS x",
        "CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS y",
    )
    sums = pts.selectExpr(
        "COUNT(*) AS n",
        "CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx",
        "CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy",
        "CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx",
        "CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy",
        "CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy",
    )
    mom = sums.selectExpr(
        "n",
        "sx",
        "sy",
        "CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS num",
        "CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS den",
        "CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS deny",
    )
    return mom.selectExpr(
        "CAST(n AS BIGINT) AS n_vocab",
        "CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6)"
        " AS BIGINT) AS slope_micro",
        "CAST(floor((CAST(sy AS DOUBLE)"
        "            - CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"
        "              * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) * 1e6)"
        " AS BIGINT) AS intercept_micro",
        "CAST(floor(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)"
        "           / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)) * 1e6)"
        " AS BIGINT) AS r2_micro",
    )


_ZIPF_DUCK = f"""
WITH tok AS (
  SELECT tok
  FROM (SELECT list_filter(string_split(text, ' '), x -> x != '') AS t
        FROM documents), UNNEST(t) AS u(tok)
), vocab AS (
  SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok
  HAVING COUNT(*) >= {_ZIPF_MIN_COUNT}
), ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY -c, tok) AS rank FROM vocab
), pts AS (
  SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1e6) AS BIGINT) AS x,
         CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS y
  FROM ranked
), sums AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx,
         SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM pts
), mom AS (
  SELECT n, sx, sy,
         CAST(n AS HUGEINT) * sxy - sx * sy AS num,
         CAST(n AS HUGEINT) * sxx - sx * sx AS den,
         CAST(n AS HUGEINT) * syy - sy * sy AS deny
  FROM sums
)
{_ZIPF_FINISH}
"""


# ---------------------------------------------------------------------------
# Event-rate spike detection
# ---------------------------------------------------------------------------

_SPIKE_SPARK = """
WITH daily AS (
  SELECT event_type,
         date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
         COUNT(*) AS n
  FROM {events}
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY event_type, date_format(date_trunc('day', ts), 'yyyy-MM-dd')
), trail AS (
  SELECT event_type, day, n,
         COUNT(n) OVER w AS t_cnt,
         SUM(n) OVER w AS t_sum,
         SUM(n * n) OVER w AS t_sumsq
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, CAST(n AS BIGINT) AS n,
       CASE WHEN t_cnt = 7 AND 7 * t_sumsq - t_sum * t_sum > 0
            THEN CAST(floor(CAST(7 * n - t_sum AS DOUBLE)
                            / sqrt(CAST(7 * t_sumsq - t_sum * t_sum
                                        AS DOUBLE)) * 1000) AS BIGINT)
            ELSE NULL END AS z_milli
FROM trail
"""

_SPIKE_DUCK = """
WITH daily AS (
  SELECT event_type,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         COUNT(*) AS n
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY event_type, strftime(date_trunc('day', ts), '%Y-%m-%d')
), trail AS (
  SELECT event_type, day, n,
         COUNT(n) OVER w AS t_cnt,
         CAST(SUM(n) OVER w AS BIGINT) AS t_sum,
         CAST(SUM(n * n) OVER w AS BIGINT) AS t_sumsq
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, CAST(n AS BIGINT) AS n,
       CASE WHEN t_cnt = 7 AND 7 * t_sumsq - t_sum * t_sum > 0
            THEN CAST(floor(CAST(7 * n - t_sum AS DOUBLE)
                            / sqrt(CAST(7 * t_sumsq - t_sum * t_sum
                                        AS DOUBLE)) * 1000) AS BIGINT)
            ELSE NULL END AS z_milli
FROM trail
"""


def events_rate_spike_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event volume z-scored against the trailing 7 observed
    days per event type. The daily rollup and the trailing window
    share the event_type exchange; variance is derived from integer
    sum / sum-of-squares inside the same frame, so the z statistic is
    a fixed-shape double expression over exact integers."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "r16_spike_events"
    )
    return spark.sql(_SPIKE_SPARK.format(events="r16_spike_events"))


QUERIES = {
    "agg_chi2_independence": agg_chi2_independence,
    "agg_gini_concentration": agg_gini_concentration,
    "text_zipf_fit": text_zipf_fit,
    "events_rate_spike_zscore": events_rate_spike_zscore,
}

ORACLE = {
    "agg_chi2_independence": _CHI2_DUCK,
    "agg_gini_concentration": _GINI_DUCK,
    "text_zipf_fit": _ZIPF_DUCK,
    "events_rate_spike_zscore": _SPIKE_DUCK,
}
