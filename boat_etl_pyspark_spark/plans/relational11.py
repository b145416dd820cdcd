"""Round-4 batch 2b: spatial joins, streaming outer joins, running
distincts, and product quantization.

  * ``join_spatial_grid`` — proximity join between two synthetic
    point sets (coordinates derived deterministically from key
    hashes) via GRID BUCKETING: each probe point explodes to its 3×3
    neighbor cells, the join is an equi-join on the cell id, and the
    exact Chebyshev predicate filters. The scalable form of a spatial
    theta join — the same shape as geohash/S2 joins at 100 TB, where
    a raw distance join would be a cross product.
  * ``window_running_distinct`` — running COUNT(DISTINCT) per user
    over event time. Spark windows don't support DISTINCT frames;
    the standard decomposition is first-occurrence flag (row_number
    per (user, type) == 1) + running sum — two narrow window passes
    over one user-key exchange.
  * ``stream_stream_left_outer`` — watermarked stream-stream LEFT
    OUTER join: purchases with their preceding-hour views, or NULLs
    once the watermark proves no view can arrive. Needs multi-batch
    replay (null rows emit only when a LATER batch's watermark closes
    the join window); both engines filter to purchases a safety
    margin older than the final watermark so the emission boundary is
    not load-bearing.
  * ``sim_product_quantize`` — product quantization: the embedding
    splits into 8 subspaces of 8 dims; each subspace quantizes
    against its own k=4 codebook (deterministic seed vectors);
    reported per-(subspace, code) population and integer distortion.
    PQ is the memory layout behind billion-vector ANN (8 bytes/vector
    here vs 256); all math integer-quantized, so assignments are
    engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.library import grid_join, running_distinct
from ..sources.readers import load_table
from .contract import ts_valid, ts_valid_sql
from ..streaming.events import (
    read_events_stream,
    run_stream_to_memory,
    stream_dir_multi,
)

# ---------------------------------------------------------------------------
# Spatial grid join
# ---------------------------------------------------------------------------

_GRID = 1000      # coordinate domain [0, 1000)^2
_RADIUS = 20      # Chebyshev join radius; cell size == radius


def _xy(key_col: str):
    x = F.expr(
        f"CAST(conv(substr(md5(CAST({key_col} AS STRING)), 1, 6), 16, 10) "
        f"AS BIGINT) % {_GRID}"
    )
    y = F.expr(
        f"CAST(conv(substr(md5(CAST({key_col} AS STRING)), 7, 6), 16, 10) "
        f"AS BIGINT) % {_GRID}"
    )
    return x, y


def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers within Chebyshev distance 20 of each supplier, on
    hash-derived coordinates. Suppliers (the small side) explode to
    their 9 neighbor cells; the join is equi on cell id and stays
    hash-partitioned — probe volume is 9 rows per supplier, never
    |suppliers| × |customers|.

    Pinned duplicate-key rule (round-10 layer 2): a duplicate entity
    key is ONE point — coordinates are key-derived, so the inputs
    dedup on key; without the rule the multi-cell candidate dedup
    inside grid_join collapses duplicate ROWS in one engine while the
    oracle's row-wise join multiplies them."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    cx, cy = _xy("c_custkey")
    sx, sy = _xy("s_suppkey")
    c = cust.select("c_custkey", cx.alias("cx"), cy.alias("cy")).distinct()
    s = supp.select("s_suppkey", sx.alias("sx"), sy.alias("sy")).distinct()
    return grid_join(
        c, s, ("cx", "cy"), ("sx", "sy"), radius=_RADIUS
    ).select(
        "s_suppkey",
        "c_custkey",
        F.greatest(
            F.abs(F.col("cx") - F.col("sx")),
            F.abs(F.col("cy") - F.col("sy")),
        ).alias("chebyshev_dist"),
    )


_SPATIAL_SQL = f"""
WITH c AS (
  SELECT DISTINCT c_custkey,
         CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 6) AS BIGINT)
           % {_GRID} AS cx,
         CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 7, 6) AS BIGINT)
           % {_GRID} AS cy
  FROM customer
), s AS (
  SELECT DISTINCT s_suppkey,
         CAST('0x' || substr(md5(CAST(s_suppkey AS VARCHAR)), 1, 6) AS BIGINT)
           % {_GRID} AS sx,
         CAST('0x' || substr(md5(CAST(s_suppkey AS VARCHAR)), 7, 6) AS BIGINT)
           % {_GRID} AS sy
  FROM supplier
)
SELECT s_suppkey, c_custkey,
       GREATEST(ABS(cx - sx), ABS(cy - sy)) AS chebyshev_dist
FROM s JOIN c
  ON ABS(cx - sx) <= {_RADIUS} AND ABS(cy - sy) <= {_RADIUS}
"""


# ---------------------------------------------------------------------------
# Running distinct count per user
# ---------------------------------------------------------------------------


def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: how many DISTINCT event types this user has produced
    up to and including this event. count(distinct) is not a window
    aggregate in Spark (nor most engines); the associative
    decomposition — flag each (user, type)'s first occurrence, then
    running-sum the flags — needs one exchange on user_id and two
    codegen'd window passes."""
    # NULL ts meets opposite engine NULL-ordering defaults in the
    # running frame — dropped symmetrically with the oracle.
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    return running_distinct(
        ev.select("user_id", "event_id", "event_type",
                  F.unix_micros("ts").alias("ts_us")),
        partition_by="user_id",
        distinct_col="event_type",
        order_by=["ts_us", "event_id"],
        out_col="n_distinct_types",
    ).select("user_id", "event_id", "ts_us", "n_distinct_types")


_RUNNING_DISTINCT_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY user_id, event_type
                ORDER BY epoch_us(ts), event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
  WHERE ts IS NOT NULL
)
SELECT user_id, event_id, ts_us,
       CAST(SUM(first_seen) OVER (
         PARTITION BY user_id ORDER BY ts_us, event_id
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_distinct_types
FROM flagged
"""


# ---------------------------------------------------------------------------
# Stream-stream LEFT OUTER join
# ---------------------------------------------------------------------------

_SSLO_WM_MIN = 30
_SSLO_JOIN_INTERVAL_SEC = 3600  # the join's "views from the preceding hour"
# Null-row cut: a left row's state is evicted (and its NULL emitted)
# only once the watermark passes p_time + the join interval — Spark
# holds the row for the full interval even though the condition
# (v_time <= p_time) means no later view could match. The safety cut
# therefore subtracts watermark + interval + a 1-minute margin from
# the global max (margin validated empirically: 2 unmatched purchases
# inside the final hour never emitted at sf0.01 with an interval-free
# cut). Derived from the same constant the join condition uses, so the
# two can't drift apart.
_SSLO_MARGIN_US = (_SSLO_JOIN_INTERVAL_SEC + 60) * 1_000_000


def stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases LEFT OUTER JOIN same-user views from the preceding
    hour, on a 3-file replay so the watermark genuinely advances
    across micro-batches (an unmatched purchase's NULL row can only
    emit once a later watermark proves its join window closed). Both
    the stream result and the oracle keep purchases at least one
    minute older than the final watermark, so the exact emission
    boundary (inclusive vs exclusive) is not load-bearing."""
    ev = read_events_stream(
        spark, sf_dir,
        dir_override=stream_dir_multi(sf_dir, 3),
        max_files_per_trigger=1,
        state_partitions=4,
    )
    views = (
        # event-time validity window (contract.ts_valid): pre-epoch
        # rows are watermark-late by construction (commit b285e49)
        ev.where(ts_valid("ev_time"))
        .where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ev_time").alias("v_time"),
        )
        .withWatermark("v_time", f"{_SSLO_WM_MIN} minutes")
    )
    purchases = (
        read_events_stream(
            ev.sparkSession, sf_dir,
            dir_override=stream_dir_multi(sf_dir, 3),
            max_files_per_trigger=1,
            reuse_session=True,
        )
        .where(ts_valid("ev_time"))
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ev_time").alias("p_time"),
        )
        .withWatermark("p_time", f"{_SSLO_WM_MIN} minutes")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_time") <= F.col("p_time"))
        & (
            F.col("v_time")
            >= F.col("p_time")
            - F.expr(f"INTERVAL {_SSLO_JOIN_INTERVAL_SEC} SECONDS")
        ),
        "left_outer",
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        F.unix_micros("p_time").alias("purchase_ts_us"),
        "view_id",
        F.unix_micros("v_time").alias("view_ts_us"),
    )
    result = run_stream_to_memory(joined, "append")
    # Cut both engines at (final watermark - margin): bounded scalar
    # from the batch copy of the same fixture. An empty/cold-start
    # source has no max timestamp — nothing can have emitted, so any
    # cutoff works; 0 keeps the filter well-typed.
    mx = (
        load_table(spark, sf_dir, "events")
        .where(ts_valid("CAST(ts AS TIMESTAMP)"))
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase",
                       F.unix_micros("ts"))
            ).alias("mp"),
            F.max(
                F.when(F.col("event_type") == "view", F.unix_micros("ts"))
            ).alias("mv"),
        )
        .collect()[0]
    )
    # global watermark = MIN over both sides' own maxima (each
    # withWatermark node only sees its type's rows); None if a side
    # never advanced — then nothing can have emitted
    max_ts = (
        None
        if mx["mp"] is None or mx["mv"] is None
        else min(mx["mp"], mx["mv"])
    )
    wm_us = (max_ts or 0) - _SSLO_WM_MIN * 60 * 1_000_000
    return result.where(F.col("purchase_ts_us") <= F.lit(wm_us - _SSLO_MARGIN_US))


_SSLO_SQL = f"""
WITH ev AS (
  SELECT * FROM events WHERE {ts_valid_sql('ts')}
), mx AS (
  SELECT MAX(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS mp,
         MAX(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS mv
  FROM ev
), wm AS (
  -- global watermark = MIN of the two sides' maxima (NULL if either
  -- side is empty: that stream never advanced, nothing emitted)
  SELECT CASE WHEN mp IS NULL OR mv IS NULL THEN NULL
              ELSE LEAST(mp, mv) END - {_SSLO_WM_MIN * 60 * 1_000_000}
           AS wm_us
  FROM mx
)
SELECT p.event_id AS purchase_id,
       p.user_id,
       epoch_us(p.ts) AS purchase_ts_us,
       v.event_id AS view_id,
       epoch_us(v.ts) AS view_ts_us
FROM ev p
LEFT JOIN ev v
  ON v.event_type = 'view'
 AND p.user_id = v.user_id
 AND v.ts <= p.ts
 AND v.ts >= p.ts - INTERVAL {_SSLO_JOIN_INTERVAL_SEC} SECONDS
CROSS JOIN wm
WHERE p.event_type = 'purchase'
  AND epoch_us(p.ts) <= wm.wm_us - {_SSLO_MARGIN_US}
"""


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------

_PQ_SPARK = """
WITH q AS (
  SELECT vec_id,
         transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM {emb}
  WHERE embedding IS NOT NULL AND size(embedding) = 64
    AND NOT exists(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)
), e AS (
  SELECT vec_id, CAST(pos DIV 8 AS BIGINT) AS sub, pos, val
  FROM (SELECT vec_id, posexplode(qv) AS (pos, val) FROM q)
), cb AS (
  SELECT vec_id AS code, sub, pos, val AS cval FROM e WHERE vec_id < 4
), d AS (
  SELECT /*+ BROADCAST(cb) */ e.vec_id, e.sub, cb.code,
         SUM((e.val - cb.cval) * (e.val - cb.cval)) AS dist
  FROM e JOIN cb ON e.pos = cb.pos AND e.sub = cb.sub
  GROUP BY e.vec_id, e.sub, cb.code
), assigned AS (
  SELECT vec_id, sub, code, dist FROM (
    SELECT vec_id, sub, code, dist,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY dist, code) AS rk
    FROM d
  ) WHERE rk = 1
)
SELECT sub AS subspace, code,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(dist) AS BIGINT) AS distortion
FROM assigned GROUP BY sub, code
"""

_PQ_DUCK = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
           AS qv
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)) = 0
), e AS (
  SELECT vec_id, CAST((i - 1) // 8 AS BIGINT) AS sub, i AS pos,
         CAST(qv[i] AS BIGINT) AS val
  FROM q, (SELECT unnest(range(1, 65)) AS i)
), cb AS (
  SELECT vec_id AS code, sub, pos, val AS cval FROM e WHERE vec_id < 4
), d AS (
  SELECT e.vec_id, e.sub, cb.code,
         CAST(SUM((e.val - cb.cval) * (e.val - cb.cval)) AS BIGINT) AS dist
  FROM e JOIN cb ON e.pos = cb.pos AND e.sub = cb.sub
  GROUP BY e.vec_id, e.sub, cb.code
), assigned AS (
  SELECT vec_id, sub, code, dist FROM (
    SELECT vec_id, sub, code, dist,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY dist, code) AS rk
    FROM d
  ) t WHERE rk = 1
)
SELECT sub AS subspace, code,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(dist) AS BIGINT) AS distortion
FROM assigned GROUP BY sub, code
"""


def sim_product_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantize every embedding: 8 subspaces × 8 dims, k=4
    codes per subspace (codebook = the 4 lowest vec_ids — pluggable,
    deterministic, oracle-checkable). Output: per-(subspace, code)
    population and total integer distortion. The codebook is k×d rows
    broadcast; the corpus is touched once."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("__emb_pq")
    return spark.sql(_PQ_SPARK.format(emb="__emb_pq"))


# ---------------------------------------------------------------------------
# Stream-stream FULL OUTER join (completes the inner / left / full matrix)
# ---------------------------------------------------------------------------
# Same user-keyed preceding-hour interval as the LEFT OUTER op; full
# outer additionally emits a NULL-purchase row for every view no
# purchase ever picked up. Eviction symmetry: a view's state can
# match purchases with p_time in [v_time, v_time + interval], so its
# null row emits once the watermark passes v_time + interval — the
# cut applied per side on its own timestamp (purchase rows cut on
# purchase_ts, view-only rows on view_ts). The view-side eviction
# boundary is NOT the naive wm - interval: measured, a view at
# wm - 4120s never emitted its null row at sf0.01 while the boundary
# sat at wm - 3904s at sf0.1 — the state flush runs against a
# watermark that can lag the final one by batch-commit mechanics.
# The cut therefore dominates every lag a single trailing
# micro-batch can introduce: 2*interval + watermark_delay + a
# 1-minute margin (covers eviction needing wm > t + interval
# evaluated under a watermark itself lagging by up to
# interval + delay). Derived from the same declared constants as
# the join condition so plan and oracle cannot drift; parity holds
# at sf0.001/0.01/0.1 with >2x slack over the worst observed
# non-emission.


_SSFO_CUT_US = (
    2 * _SSLO_JOIN_INTERVAL_SEC + _SSLO_WM_MIN * 60 + 60
) * 1_000_000


def stream_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases FULL OUTER JOIN same-user views from the preceding
    hour on a 3-file replay: unmatched purchases emit a NULL-view
    row, unmatched views a NULL-purchase row, each only after a
    later micro-batch's watermark proves its join window closed.
    State on both sides is bounded by watermark + the 1h interval;
    the emission cut keeps rows at least one minute clear of the
    final watermark so the exact eviction boundary is not
    load-bearing (same margin the LEFT OUTER op validated)."""
    ev = read_events_stream(
        spark, sf_dir,
        dir_override=stream_dir_multi(sf_dir, 3),
        max_files_per_trigger=1,
        state_partitions=4,
    )
    views = (
        # event-time validity window (contract.ts_valid): pre-epoch
        # rows are watermark-late by construction (commit b285e49)
        ev.where(ts_valid("ev_time"))
        .where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ev_time").alias("v_time"),
        )
        .withWatermark("v_time", f"{_SSLO_WM_MIN} minutes")
    )
    purchases = (
        read_events_stream(
            ev.sparkSession, sf_dir,
            dir_override=stream_dir_multi(sf_dir, 3),
            max_files_per_trigger=1,
            reuse_session=True,
        )
        .where(ts_valid("ev_time"))
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ev_time").alias("p_time"),
        )
        .withWatermark("p_time", f"{_SSLO_WM_MIN} minutes")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_time") <= F.col("p_time"))
        & (
            F.col("v_time")
            >= F.col("p_time")
            - F.expr(f"INTERVAL {_SSLO_JOIN_INTERVAL_SEC} SECONDS")
        ),
        "full_outer",
    ).select(
        "purchase_id",
        F.coalesce(F.col("p_user"), F.col("v_user")).alias("user_id"),
        F.unix_micros("p_time").alias("purchase_ts_us"),
        "view_id",
        F.unix_micros("v_time").alias("view_ts_us"),
    )
    result = run_stream_to_memory(joined, "append")
    mx = (
        load_table(spark, sf_dir, "events")
        .where(ts_valid("CAST(ts AS TIMESTAMP)"))
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase",
                       F.unix_micros("ts"))
            ).alias("mp"),
            F.max(
                F.when(F.col("event_type") == "view", F.unix_micros("ts"))
            ).alias("mv"),
        )
        .collect()[0]
    )
    # global watermark = MIN over both sides' own maxima (each
    # withWatermark node only sees its type's rows); None if a side
    # never advanced — then nothing can have emitted
    max_ts = (
        None
        if mx["mp"] is None or mx["mv"] is None
        else min(mx["mp"], mx["mv"])
    )
    wm_us = (max_ts or 0) - _SSLO_WM_MIN * 60 * 1_000_000
    cut = wm_us - _SSFO_CUT_US
    return result.where(
        F.when(F.col("purchase_ts_us").isNotNull(),
               F.col("purchase_ts_us") <= F.lit(cut))
        .otherwise(F.col("view_ts_us") <= F.lit(cut))
    )


_SSFO_SQL = f"""
WITH ev AS (
  SELECT * FROM events WHERE {ts_valid_sql('ts')}
), mx AS (
  SELECT MAX(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS mp,
         MAX(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS mv
  FROM ev
), wm AS (
  -- global watermark = MIN of the two sides' maxima (see _SSLO_SQL)
  SELECT CASE WHEN mp IS NULL OR mv IS NULL THEN NULL
              ELSE LEAST(mp, mv) END - {_SSLO_WM_MIN * 60 * 1_000_000}
         - {_SSFO_CUT_US} AS cut_us
  FROM mx
), p AS (
  SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'
), v AS (
  SELECT event_id, user_id, ts FROM ev WHERE event_type = 'view'
), matched AS (
  SELECT p.event_id AS purchase_id,
         p.user_id,
         epoch_us(p.ts) AS purchase_ts_us,
         v.event_id AS view_id,
         epoch_us(v.ts) AS view_ts_us
  FROM p
  LEFT JOIN v
    ON p.user_id = v.user_id
   AND v.ts <= p.ts
   AND v.ts >= p.ts - INTERVAL {_SSLO_JOIN_INTERVAL_SEC} SECONDS
  CROSS JOIN wm
  WHERE epoch_us(p.ts) <= wm.cut_us
), view_only AS (
  SELECT CAST(NULL AS BIGINT) AS purchase_id,
         v.user_id,
         CAST(NULL AS BIGINT) AS purchase_ts_us,
         v.event_id AS view_id,
         epoch_us(v.ts) AS view_ts_us
  FROM v CROSS JOIN wm
  WHERE epoch_us(v.ts) <= wm.cut_us
    AND NOT EXISTS (
      SELECT 1 FROM p
      WHERE p.user_id = v.user_id
        AND v.ts <= p.ts
        AND v.ts >= p.ts - INTERVAL {_SSLO_JOIN_INTERVAL_SEC} SECONDS
    )
)
SELECT * FROM matched
UNION ALL
SELECT * FROM view_only
"""


QUERIES = {
    "join_spatial_grid": join_spatial_grid,
    "window_running_distinct": window_running_distinct,
    "stream_stream_left_outer": stream_stream_left_outer,
    "stream_stream_full_outer": stream_stream_full_outer,
    "sim_product_quantize": sim_product_quantize,
}

ORACLE = {
    "join_spatial_grid": _SPATIAL_SQL,
    "window_running_distinct": _RUNNING_DISTINCT_SQL,
    "stream_stream_left_outer": _SSLO_SQL,
    "stream_stream_full_outer": _SSFO_SQL,
    "sim_product_quantize": _PQ_DUCK,
}
