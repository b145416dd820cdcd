"""Round-4 batch 1: robust statistics, data-contract validation,
seasonality, graph triangles, and interval-overlap joins.

  * ``anomaly_mad_outliers`` — median-absolute-deviation outlier
    detection per order status, built on TWO passes of the library's
    ``global_rank(partition_by=...)`` primitive (exact median of the
    values, then exact median of the absolute deviations). All math
    stays in scaled integers (2x / 4x units) so the result is
    bit-identical at any parallelism — the robust-statistics shape
    (median/MAD beats mean/stddev under heavy tails) that a quality
    gate over 100 TB of training data actually needs.
  * ``ts_weekday_seasonality`` — day-of-week seasonal profile per
    event type with an integer ppm seasonal index (observed share vs
    the uniform 1/7 expectation).
  * ``validate_data_contract`` — a data-contract scan: every rule
    (domain, range, nullability, uniqueness, cross-table ordering,
    referential integrity) evaluated in ONE conditional-aggregation
    pass per table plus one anti-join, emitted as (rule,
    n_violations) rows. The declarative form of the reference's
    pandera gate (SURVEY.md §2.4, ``src/pipeline_pyspark.py:275-308``)
    generalized to multi-table contracts: violations are COUNTED in a
    single scan instead of aborting row-at-a-time on the driver.
  * ``graph_triangle_count`` — triangle counting on the part
    co-purchase graph (parts sharing an order), using the id-ordered
    edge orientation so every triangle is generated exactly once.
  * ``join_interval_overlap`` — interval-overlap join between per-day
    purchase-activity and view-activity intervals of the same user.
    The Spark plan is the SCALABLE form: intervals explode into
    fixed-width time buckets, the join is an equi-join on (user,
    bucket), the exact overlap predicate filters, and a distinct
    collapses multi-bucket duplicates — never the O(n^2)
    broadcast-nested-loop a raw theta join would pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import cents
from .contract import money_rounded, money_rounded_sql
from ..operators.library import global_rank, interval_overlap_join
from ..sources.readers import load_table
from . import track_persist

# ---------------------------------------------------------------------------
# MAD outliers (robust statistics on the exact-rank primitive)
# ---------------------------------------------------------------------------


def _exact_median_2x(ranked: DataFrame, counts: DataFrame, value_col: str,
                     out_col: str) -> DataFrame:
    """Per-group 2x-median from a ``global_rank``-ed frame: pick the
    middle rank(s); odd counts double the single middle value so the
    result is an exact integer either way."""
    lo = F.expr("(__n + 1) DIV 2")
    hi = F.expr("(__n + 2) DIV 2")
    return (
        ranked.join(F.broadcast(counts), "o_orderstatus")
        .where((F.col("rank") == lo) | (F.col("rank") == hi))
        .groupBy("o_orderstatus")
        .agg(
            F.sum(
                F.col(value_col) * F.when(lo == hi, F.lit(2)).otherwise(F.lit(1))
            ).alias(out_col)
        )
    )


def anomaly_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total deviates from their status-group median by
    more than 5 MADs, counted per status. Medians are EXACT and
    distributed (``global_rank`` range-partitions; no per-group value
    buffers, no single-partition window), and every comparison is in
    scaled integers: ``median_2x_cents`` is twice the median (so
    even-count middles stay integral), ``mad_4x_cents`` is four times
    the MAD (the deviations are already doubled), and the outlier
    rule |x - med| > 5 * MAD becomes 2*dev > 5*mad2 — associative
    integer math, identical at any parallelism or engine.

    Hostile-ingest rules (round-10 layer 2): cents are money-domain
    bounded (the 2x/5x products overflow INT64 on a castable absurd
    value — DuckDB throws, Spark wraps) and NULL cents never enter
    the order statistic (engine NULL-ordering differs; a corrupt
    price has no rank). Both rules are the same predicate in the
    oracle below."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderstatus",
            money_rounded("o_totalprice").alias("p"),
        )
        .where(F.col("p").isNotNull())
    )
    counts = orders.groupBy("o_orderstatus").agg(F.count("*").alias("__n"))
    ranked = global_rank(orders, ["p"], partition_by=["o_orderstatus"])
    # med/mad are |statuses|-row relations but sit on expensive rank
    # subtrees with multiple downstream consumers — without a persist
    # the dev->mad->final chain re-executes the rank pipeline
    # multiplicatively (measured 9.3s -> 1.4s at sf0.1).
    med = track_persist(_exact_median_2x(ranked, counts, "p", "med2"))

    dev = track_persist(
        orders.join(F.broadcast(med), "o_orderstatus")
        .select(
            "o_orderstatus",
            F.abs(F.lit(2) * F.col("p") - F.col("med2")).alias("d"),
        )
    )
    ranked_dev = global_rank(dev, ["d"], partition_by=["o_orderstatus"])
    mad = track_persist(_exact_median_2x(ranked_dev, counts, "d", "mad2"))

    return (
        dev.join(F.broadcast(mad), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.when(F.lit(2) * F.col("d") > F.lit(5) * F.col("mad2"), 1)
                .otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
        .join(F.broadcast(med), "o_orderstatus")
        .join(F.broadcast(mad), "o_orderstatus")
        .select(
            "o_orderstatus",
            "n_orders",
            F.col("med2").cast("bigint").alias("median_2x_cents"),
            F.col("mad2").cast("bigint").alias("mad_4x_cents"),
            "n_outliers",
        )
    )


_MAD_SQL = f"""
WITH o AS (
  SELECT o_orderstatus, p FROM (
    SELECT o_orderstatus, {money_rounded_sql('o_totalprice')} AS p
    FROM orders
  ) WHERE p IS NOT NULL
), r1 AS (
  SELECT o_orderstatus, p,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY p) AS rk,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM o
), med AS (
  SELECT o_orderstatus,
         CAST(SUM(p * CASE WHEN (n+1)//2 = (n+2)//2 THEN 2 ELSE 1 END)
              AS BIGINT) AS med2
  FROM r1 WHERE rk IN ((n+1)//2, (n+2)//2) GROUP BY o_orderstatus
), dev AS (
  SELECT o.o_orderstatus, ABS(2*o.p - m.med2) AS d
  FROM o JOIN med m USING (o_orderstatus)
), r2 AS (
  SELECT o_orderstatus, d,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY d) AS rk,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM dev
), mad AS (
  SELECT o_orderstatus,
         CAST(SUM(d * CASE WHEN (n+1)//2 = (n+2)//2 THEN 2 ELSE 1 END)
              AS BIGINT) AS mad2
  FROM r2 WHERE rk IN ((n+1)//2, (n+2)//2) GROUP BY o_orderstatus
)
SELECT dev.o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MAX(med.med2) AS BIGINT) AS median_2x_cents,
       CAST(MAX(mad.mad2) AS BIGINT) AS mad_4x_cents,
       CAST(SUM(CASE WHEN 2*dev.d > 5*mad.mad2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev
JOIN mad USING (o_orderstatus)
JOIN med USING (o_orderstatus)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Weekday seasonality (integer ppm index)
# ---------------------------------------------------------------------------


def ts_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: how each ISO weekday's event share compares to
    the uniform 1/7 expectation, as an integer parts-per-million index
    (1_000_000 = exactly at expectation). One narrow aggregate plus a
    broadcast of the per-type totals; no floats anywhere."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy(
        "event_type",
        F.expr("CAST(extract(DAYOFWEEK_ISO FROM ts) AS BIGINT)").alias("iso_dow"),
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(cents(F.col("value"))).alias("value_cents"),
    )
    tot = per.groupBy("event_type").agg(F.sum("n_events").alias("__tot"))
    return (
        per.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "iso_dow",
            "n_events",
            "value_cents",
            F.expr("1000000 * n_events DIV __tot").alias("share_ppm"),
            F.expr("1000000 * n_events * 7 DIV __tot").alias("seasonal_index_ppm"),
        )
    )


_SEASONALITY_SQL = """
WITH per AS (
  SELECT event_type,
         CAST(isodow(ts) AS BIGINT) AS iso_dow,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(TRY_CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS tot FROM per GROUP BY 1
)
SELECT per.event_type, iso_dow, n_events, value_cents,
       CAST(1000000 * n_events // tot AS BIGINT) AS share_ppm,
       CAST(1000000 * n_events * 7 // tot AS BIGINT) AS seasonal_index_ppm
FROM per JOIN tot USING (event_type)
"""


# ---------------------------------------------------------------------------
# Data-contract validation scan
# ---------------------------------------------------------------------------


def validate_data_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table data contract evaluated as COUNTS, not aborts: one
    conditional-aggregation scan over orders, one over lineitem, one
    equi-join for the cross-table ordering rule, one anti-join for
    referential integrity — then ``stack`` unpivots the single-row
    aggregates into (rule, n_violations) rows. At 100 TB each rule
    adds one codegen'd CASE WHEN to a scan that was happening anyway;
    the reference's row-at-a-time pandera abort (SURVEY.md §2.4)
    becomes a declarative, restartable report."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    o_agg = orders.agg(
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("bigint").alias("orders_nonpositive_price"),
        F.sum(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0))
        .cast("bigint").alias("orders_bad_status"),
        F.sum(
            F.when(
                F.col("o_orderdate").isNull()
                | (F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
                | (F.col("o_orderdate") > F.lit("2001-12-31").cast("date")),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("orders_date_out_of_range"),
        (F.count("*") - F.countDistinct("o_orderkey"))
        .cast("bigint").alias("orders_duplicate_orderkey"),
    )
    l_agg = li.agg(
        F.sum(F.when(~F.col("l_quantity").between(1, 50), 1).otherwise(0))
        .cast("bigint").alias("lineitem_qty_out_of_range"),
        F.sum(
            F.when(~cents(F.col("l_discount")).between(0, 10), 1).otherwise(0)
        ).cast("bigint").alias("lineitem_discount_out_of_range"),
    )
    # ONE left join answers both cross-table rules (round 11, guide
    # §2.4: the inner + anti join pair scanned and shuffled lineitem
    # twice). Equivalence is exact even on hostile keys: a duplicated
    # o_orderkey fans matched rows out identically to the old inner
    # join, an unmatched lineitem surfaces exactly once with a NULL
    # marker (the anti-join count), and a NULL-date match makes the
    # ship predicate NULL -> counts 0, just as before.
    join_rules = (
        li.select("l_orderkey", "l_shipdate")
        .join(
            orders.select(
                F.col("o_orderkey"),
                F.col("o_orderdate"),
                F.lit(1).alias("__matched"),
            ),
            li.l_orderkey == F.col("o_orderkey"),
            "left",
        )
        .agg(
            # the old inner-join SUM is NULL when zero rows MATCH —
            # gate the per-row 0/1 on the match marker so unmatched
            # rows contribute NULL (skipped), not 0
            F.sum(
                F.when(
                    F.col("__matched").isNotNull(),
                    F.when(
                        F.col("l_shipdate") < F.col("o_orderdate"), 1
                    ).otherwise(0),
                )
            )
            .cast("bigint").alias("lineitem_ship_before_order"),
            # the old anti-join COUNT(*) is 0 (never NULL) on empty
            # input — count the unmatched markers, don't sum
            F.count(F.when(F.col("__matched").isNull(), F.lit(1)))
            .cast("bigint").alias("lineitem_orphan_orderkey"),
        )
    )
    # documents ingest contract (round 6): the text analytics / dedup
    # families DEFINE their semantics over non-null text — a NULL
    # text/lang/source row is a contract violation surfaced HERE, not
    # a value every downstream tokenizer must invent NULL semantics
    # for (SCALE.md "NULL posture"). Counts, not aborts, as above.
    docs = load_table(spark, sf_dir, "documents")
    d_agg = docs.agg(
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0))
        .cast("bigint").alias("documents_null_text"),
        F.sum(F.when(F.col("lang").isNull(), 1).otherwise(0))
        .cast("bigint").alias("documents_null_lang"),
        F.sum(F.when(F.col("source").isNull(), 1).otherwise(0))
        .cast("bigint").alias("documents_null_source"),
        (F.count("*") - F.countDistinct("doc_id"))
        .cast("bigint").alias("documents_duplicate_doc_id"),
        F.sum(
            F.when(
                F.col("text").isNotNull()
                & F.col("n_chars").isNotNull()
                & (F.col("n_chars") != F.length("text")),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("documents_nchars_mismatch"),
    )

    # events + embeddings ingest contract (round 7): the per-query
    # NULL/non-finite filters DROP invalid rows; this audit COUNTS
    # them, so the pipeline operator sees how much the filters ate
    # before trusting any downstream metric. Same scan-side
    # conditional-aggregate shape as every rule above.
    ev = load_table(spark, sf_dir, "events")
    e_agg = ev.agg(
        F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0))
        .cast("bigint").alias("events_null_ts"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0))
        .cast("bigint").alias("events_null_user_id"),
        F.sum(F.when(F.col("event_type").isNull(), 1).otherwise(0))
        .cast("bigint").alias("events_null_event_type"),
        F.sum(
            F.when(
                F.isnan("value")
                | (F.abs(F.col("value")) == F.lit(float("inf"))),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("events_nonfinite_value"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    emb_agg = emb.agg(
        F.sum(
            F.when(
                F.col("embedding").isNull()
                | F.expr(
                    "exists(embedding, x -> x IS NULL OR isnan(x)"
                    " OR abs(x) > 1e6)"
                ),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("embeddings_invalid_vector"),
    )

    def unpivot(df: DataFrame) -> DataFrame:
        cols = df.columns
        pairs = ", ".join(f"'{c}', {c}" for c in cols)
        return df.selectExpr(
            f"stack({len(cols)}, {pairs}) AS (rule, n_violations)"
        )

    return (
        unpivot(o_agg)
        .unionAll(unpivot(l_agg))
        .unionAll(unpivot(join_rules))
        .unionAll(unpivot(d_agg))
        .unionAll(unpivot(e_agg))
        .unionAll(unpivot(emb_agg))
    )


_CONTRACT_SQL = """
SELECT 'orders_nonpositive_price' AS rule,
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations FROM orders
UNION ALL
SELECT 'orders_bad_status',
       CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
            AS BIGINT) FROM orders
UNION ALL
SELECT 'orders_date_out_of_range',
       CAST(SUM(CASE WHEN o_orderdate IS NULL
                      OR o_orderdate < DATE '1992-01-01'
                      OR o_orderdate > DATE '2001-12-31'
                     THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'orders_duplicate_orderkey',
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders
UNION ALL
SELECT 'lineitem_qty_out_of_range',
       CAST(SUM(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END)
            AS BIGINT) FROM lineitem
UNION ALL
SELECT 'lineitem_discount_out_of_range',
       CAST(SUM(CASE WHEN TRY_CAST(ROUND(l_discount * 100) AS BIGINT)
                     NOT BETWEEN 0 AND 10 THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
UNION ALL
SELECT 'lineitem_ship_before_order',
       CAST(SUM(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END)
            AS BIGINT)
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'lineitem_orphan_orderkey',
       CAST(COUNT(*) AS BIGINT)
  FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'documents_null_text',
       CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM documents
UNION ALL
SELECT 'documents_null_lang',
       CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM documents
UNION ALL
SELECT 'documents_null_source',
       CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM documents
UNION ALL
SELECT 'documents_duplicate_doc_id',
       CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT) FROM documents
UNION ALL
SELECT 'documents_nchars_mismatch',
       CAST(SUM(CASE WHEN text IS NOT NULL AND n_chars IS NOT NULL
                      AND n_chars != length(text)
                     THEN 1 ELSE 0 END) AS BIGINT) FROM documents
UNION ALL
SELECT 'events_null_ts',
       CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM events
UNION ALL
SELECT 'events_null_user_id',
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM events
UNION ALL
SELECT 'events_null_event_type',
       CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM events
UNION ALL
SELECT 'events_nonfinite_value',
       CAST(SUM(CASE WHEN isnan(value) OR isinf(value) THEN 1 ELSE 0 END)
            AS BIGINT)
  FROM events
UNION ALL
SELECT 'embeddings_invalid_vector',
       CAST(SUM(CASE WHEN embedding IS NULL
                      OR len(list_filter(embedding,
                             x -> x IS NULL OR isnan(x)
                                  OR abs(x) > 1e6)) > 0
                     THEN 1 ELSE 0 END) AS BIGINT)
  FROM embeddings
"""


# ---------------------------------------------------------------------------
# Triangle counting on the part co-purchase graph
# ---------------------------------------------------------------------------

_TRI_FROM = "1995-01-01"
_TRI_TO = "1995-03-31"


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the part co-purchase graph (two parts are adjacent
    iff some order contains both), on a one-quarter order slice.
    Edges are oriented a < b so each triangle (a < b < c) is produced
    by exactly one wedge join — the standard distributed triangle
    scheme: edges ⋈ edges on the shared middle vertex, then one more
    equi-join to close the wedge. The edge list is built once and
    persisted (three consumers). At 100 TB the same plan holds with
    degree-based orientation to bound wedge skew; the date slice is
    the partition-pruning knob."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sliced = orders.where(
        F.col("o_orderdate").between(_TRI_FROM, _TRI_TO)
    ).select("o_orderkey")
    op = (
        li.join(sliced, li.l_orderkey == sliced.o_orderkey)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    x, y = op.alias("x"), op.alias("y")
    edges = track_persist(
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .select(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .distinct()
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    n_tri = tri.agg(F.count("*").alias("n_triangles"))
    return n_edges.crossJoin(n_tri)


_TRIANGLE_SQL = f"""
WITH op AS (
  SELECT DISTINCT l.l_orderkey, l.l_partkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate BETWEEN DATE '{_TRI_FROM}' AND DATE '{_TRI_TO}'
), edges AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM op x JOIN op y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM edges e1
        JOIN edges e2 ON e1.b = e2.a
        JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
"""


# ---------------------------------------------------------------------------
# Interval-overlap join (bucketed, not nested-loop)
# ---------------------------------------------------------------------------

_BUCKET_US = 6 * 3600 * 1_000_000


def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap join between each user's per-day purchase-activity
    interval and per-day view-activity interval. A raw theta join
    (s1 <= e2 AND s2 <= e1) plans as a nested loop; the scalable form
    used here explodes every interval into the fixed 6-hour buckets
    it covers, equi-joins on (user, bucket) — so only co-located,
    time-adjacent intervals ever meet — applies the exact overlap
    predicate, and dedups the multi-bucket matches. Bucket width is
    the tuning knob: ~max interval length keeps the explode factor
    ≤ 2 while the join stays hash-partitioned."""
    ev = load_table(spark, sf_dir, "events")

    def intervals(kind: str, day_alias: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == kind)
            .groupBy(
                "user_id",
                F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                    day_alias
                ),
            )
            .agg(
                F.min(F.unix_micros("ts")).alias("s_us"),
                F.max(F.unix_micros("ts")).alias("e_us"),
            )
        )

    a = intervals("purchase", "purchase_day").withColumnsRenamed(
        {"s_us": "ps_us", "e_us": "pe_us"}
    )
    b = intervals("view", "view_day").withColumnsRenamed(
        {"s_us": "vs_us", "e_us": "ve_us"}
    )
    return interval_overlap_join(
        a, b, ["user_id"], ("ps_us", "pe_us"), ("vs_us", "ve_us"), _BUCKET_US
    ).select(
        "user_id",
        "purchase_day",
        "view_day",
        (F.least("pe_us", "ve_us") - F.greatest("ps_us", "vs_us")).alias("overlap_us"),
    )


_INTERVAL_SQL = """
WITH p AS (
  SELECT user_id,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS purchase_day,
         MIN(epoch_us(ts)) AS ps_us, MAX(epoch_us(ts)) AS pe_us
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), v AS (
  SELECT user_id,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS view_day,
         MIN(epoch_us(ts)) AS vs_us, MAX(epoch_us(ts)) AS ve_us
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT p.user_id, purchase_day, view_day,
       CAST(LEAST(pe_us, ve_us) - GREATEST(ps_us, vs_us) AS BIGINT)
         AS overlap_us
FROM p JOIN v ON p.user_id = v.user_id
WHERE ps_us <= ve_us AND vs_us <= pe_us
"""


QUERIES = {
    "anomaly_mad_outliers": anomaly_mad_outliers,
    "ts_weekday_seasonality": ts_weekday_seasonality,
    "validate_data_contract": validate_data_contract,
    "graph_triangle_count": graph_triangle_count,
    "join_interval_overlap": join_interval_overlap,
}

ORACLE = {
    "anomaly_mad_outliers": _MAD_SQL,
    "ts_weekday_seasonality": _SEASONALITY_SQL,
    "validate_data_contract": _CONTRACT_SQL,
    "graph_triangle_count": _TRIANGLE_SQL,
    "join_interval_overlap": _INTERVAL_SQL,
}
