"""Round-3 batch 2: runtime-filter join, statistical mode, linear
interpolation, and append-mode streaming windows.

  * ``join_bloom_prefilter`` — the runtime-filter pattern: a compact
    bloom bitmap built from the (filtered) dim keys prunes the fact
    scan BEFORE the exact semi join. Catalyst injects this itself for
    shuffle joins (spark.sql.optimizer.runtime.bloomFilter.enabled);
    the explicit form is the tool when the filter must cross a
    boundary Catalyst can't see (stream-static, pre-shuffle persist,
    handoff between jobs). The oracle is the PLAIN semi join — bloom
    false positives are removed by the exact join, so the hash match
    proves the prefilter is semantics-free.
  * ``agg_mode_per_group`` — statistical mode with a deterministic
    tiebreak via one max(struct) fold (no sort, no window).
  * ``interp_linear_fill`` — linear interpolation across calendar
    gaps (vs LOCF in ``window_locf_fill``): integer-cents endpoints,
    integer day distances, integer division — bit-stable.
  * ``stream_append_mode_windows`` — append-mode tumbling windows
    under a watermark: only windows CLOSED by the final watermark
    emit. The held-back tail is exactly SQL-expressible, so append
    semantics get a driver-grade oracle row (the in-repo streaming
    tests check the strictness property; this checks the numbers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import cents
from .contract import ts_valid, ts_valid_sql, value_bounded
from ..sources.readers import load_table
from ..streaming.events import (
    read_events_stream,
    run_stream_to_memory,
    stream_dir_multi,
)

# ---------------------------------------------------------------------------
# Bloom-prefiltered join (runtime filter across an optimizer boundary)
# ---------------------------------------------------------------------------

_BLOOM_BITS = 4096  # 64 longs; sized for the filtered dim cardinality


def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems shipped by EUROPE-region suppliers.

    Stage 1 builds a 4096-bit bloom (two xxhash64-derived bit
    positions per key) from the FILTERED supplier keys — 64 longs,
    collected to the driver (bounded scalar: the bitmap size is fixed
    by design, independent of data volume) and inlined as a literal
    array so the probe is pure codegen bit arithmetic on the fact
    scan. Stage 2 removes false positives with the exact broadcast
    semi join. At 100 TB the bloom drops ~|non-matching|·(1-fpr) of
    fact rows before the join's hash probe; the pattern's value is
    that the bitmap can be built once and applied where Catalyst's
    own runtime filter can't reach."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supp = load_table(spark, sf_dir, "supplier")
    dim = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey")
    )
    bits = dim.select(
        F.expr(f"pmod(xxhash64(s_suppkey), {_BLOOM_BITS})").alias("b1"),
        F.expr(
            f"pmod(xxhash64(s_suppkey) DIV {_BLOOM_BITS}, {_BLOOM_BITS})"
        ).alias("b2"),
    )
    words = (
        bits.select(F.explode(F.array("b1", "b2")).alias("bit"))
        .select(
            F.expr("CAST(bit DIV 64 AS INT)").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    bitmap = [0] * (_BLOOM_BITS // 64)
    for r in words:
        bitmap[r["word"]] = r["bits"]
    lit_bitmap = F.array(*[F.lit(w).cast("long") for w in bitmap])

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    # the bit test is `& 1`, NOT `% 2`: shiftrightunsigned by 0 keeps
    # the sign bit, and Spark's % takes the dividend's sign, so a word
    # with bit 63 set would probe (-odd) % 2 = -1 and read as ABSENT —
    # a false negative that only appears once the bitmap is dense
    # enough to co-locate bit 63 with a probed bit (bit at sf0.1,
    # invisible at sf0.01)
    probe_sql = (
        "(shiftrightunsigned(element_at(bm, CAST({b} DIV 64 AS INT) + 1),"
        " CAST({b} % 64 AS INT)) & 1) = 1"
    )
    lb1 = f"pmod(xxhash64(l_suppkey), {_BLOOM_BITS})"
    lb2 = f"pmod(xxhash64(l_suppkey) DIV {_BLOOM_BITS}, {_BLOOM_BITS})"
    prefiltered = (
        li.withColumn("bm", lit_bitmap)
        .where(F.expr(probe_sql.format(b=lb1)) & F.expr(probe_sql.format(b=lb2)))
        .drop("bm")
    )
    exact = prefiltered.join(F.broadcast(dim), prefiltered.l_suppkey == dim.s_suppkey, "semi")
    return exact.agg(
        F.count("*").alias("n_items"),
        F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue_cents"
        ),
    )


_BLOOM_SQL = """
SELECT COUNT(*) AS n_items,
       CAST(SUM(TRY_CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_suppkey IN (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
"""


# ---------------------------------------------------------------------------
# Statistical mode per group (deterministic tiebreak, no window)
# ---------------------------------------------------------------------------


def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal event type per user via two-level aggregation and ONE
    max(struct) fold — no sort, no window, both levels combine
    map-side. Ties break toward the lexicographically larger type
    (encoded in the struct order), so the answer is total-order
    deterministic."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    top = counts.groupBy("user_id").agg(
        F.max(F.struct("cnt", "event_type")).alias("m"),
        F.sum("cnt").alias("n_events"),
    )
    return top.select(
        "user_id",
        F.col("m.event_type").alias("mode_event"),
        F.col("m.cnt").alias("mode_count"),
        "n_events",
    )


_MODE_SQL = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT user_id, event_type, cnt,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY cnt DESC, event_type DESC) AS rn,
         CAST(SUM(cnt) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
  FROM counts
)
SELECT user_id, event_type AS mode_event, cnt AS mode_count, n_events
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Linear interpolation across calendar gaps
# ---------------------------------------------------------------------------


def interp_linear_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify each event type's daily value series to the full
    calendar and LINEARLY interpolate missing days (the step up from
    LOCF): interp = prev + (next - prev) * days_since_prev DIV span.
    Endpoints are integer cents and distances integer days, so the
    division is engine-identical. One window partition per event type
    — embarrassingly parallel across series; at scale the calendar
    densification is a broadcast range join against a generated
    dimension, exactly as here."""
    ev = load_table(spark, sf_dir, "events")
    # value-level domain bound (contract.VALUE_DOMAIN_DOLLARS): an
    # out-of-domain value contributes like NULL but its day still
    # exists, keeping the p_cents*d_next interpolation products exact
    # INT64 in both engines (round-8 probe overflow class).
    daily = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.sum(cents(value_bounded(F.col("value")))).alias("day_cents"))
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = bounds.select(
        "event_type", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    dense = calendar.join(daily, ["event_type", "day"], "left")
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.last(
        F.when(F.col("day_cents").isNotNull(), F.struct("day", "day_cents")),
        ignorenulls=True,
    ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    nxt = F.first(
        F.when(F.col("day_cents").isNotNull(), F.struct("day", "day_cents")),
        ignorenulls=True,
    ).over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    withends = dense.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "day_cents",
        prev.alias("p"),
        nxt.alias("n"),
        F.datediff(F.col("day"), prev.getField("day")).alias("d_prev"),
        F.datediff(nxt.getField("day"), F.col("day")).alias("d_next"),
    )
    # weighted-average form: the numerator is non-negative (cents >= 0),
    # so integer division agrees between Spark's DIV (truncate) and
    # DuckDB's // (floor) — the delta form would differ on negatives
    interp = F.when(F.col("day_cents").isNotNull(), F.col("day_cents")).otherwise(
        F.expr(
            "(p.day_cents * d_next + n.day_cents * d_prev) DIV (d_prev + d_next)"
        )
    )
    return withends.select(
        "event_type",
        "day",
        interp.alias("filled_cents"),
        F.col("day_cents").isNull().alias("interpolated"),
    )


_INTERP_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(TRY_CAST(ROUND((CASE WHEN value BETWEEN -1.0e12 AND 1.0e12
                                   THEN value END) * 100) AS BIGINT))
              AS BIGINT) AS day_cents
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
), calendar AS (
  SELECT event_type, CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), dense AS (
  SELECT c.event_type, c.day, d.day_cents
  FROM calendar c LEFT JOIN daily d
    ON c.event_type = d.event_type AND c.day = d.day
), ends AS (
  SELECT event_type, day, day_cents,
         last_value(CASE WHEN day_cents IS NOT NULL THEN day END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_day,
         last_value(CASE WHEN day_cents IS NOT NULL THEN day_cents END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_cents,
         first_value(CASE WHEN day_cents IS NOT NULL THEN day END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_day,
         first_value(CASE WHEN day_cents IS NOT NULL THEN day_cents END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_cents
  FROM dense
)
SELECT event_type,
       strftime(day, '%Y-%m-%d') AS day,
       CAST(CASE WHEN day_cents IS NOT NULL THEN day_cents
                 ELSE (p_cents * (n_day - day) + n_cents * (day - p_day))
                      // (n_day - p_day)
            END AS BIGINT) AS filled_cents,
       day_cents IS NULL AS interpolated
FROM ends
"""


# ---------------------------------------------------------------------------
# Append-mode streaming windows (watermark-closed only)
# ---------------------------------------------------------------------------

_APPEND_WINDOW = "6 hours"
_APPEND_DELAY_H = 2


def stream_append_mode_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling windows in APPEND output mode: a window emits only
    once the watermark (max event time - 2h) passes its end, so the
    in-flight tail is held back — the contract that lets a downstream
    consumer treat every emitted row as FINAL (exactly-once window
    handoff). The 3-file event-time-ordered replay advances the
    watermark between micro-batches; the oracle recomputes the same
    rule in SQL: windows with end <= max(ts) - 2h."""
    ev = read_events_stream(
        spark,
        sf_dir,
        dir_override=stream_dir_multi(sf_dir, 3),
        max_files_per_trigger=1,
        # narrower state width for the 3-batch replay; see
        # stream_chained_agg's note + SCALE.md floor analysis
        state_partitions=4,
    ).where(ts_valid("ev_time"))  # event-time validity window: the
    #   stream watermark initializes at epoch 0, so pre-1970 rows are
    #   late-by-construction (round-8 probe, commit b285e49); bound
    #   symmetrically with the oracle per contract.ts_valid
    agg = (
        ev.withWatermark("ev_time", f"{_APPEND_DELAY_H} hours")
        .groupBy(
            F.window("ev_time", _APPEND_WINDOW).alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents(F.col("value"))).alias("value_cents"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("ws_us"),
            F.unix_micros(F.col("w.end")).alias("we_us"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )
    return run_stream_to_memory(agg, output_mode="append")


_DELAY_US = _APPEND_DELAY_H * 3600 * 1_000_000
_WIN_US = 6 * 3600 * 1_000_000

_APPEND_SQL = f"""
WITH ev AS (
  SELECT * FROM events WHERE {ts_valid_sql('ts')}
), wm AS (
  SELECT MAX(epoch_us(ts)) - {_DELAY_US} AS wm_us FROM ev
), win AS (
  SELECT (epoch_us(ts) // {_WIN_US}) * {_WIN_US} AS ws_us,
         event_type,
         COUNT(*) AS n_events,
         CAST(SUM(TRY_CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM ev
  GROUP BY 1, 2
)
SELECT ws_us, ws_us + {_WIN_US} AS we_us, event_type, n_events, value_cents
FROM win, wm
WHERE ws_us + {_WIN_US} <= wm.wm_us
"""


QUERIES = {
    "join_bloom_prefilter": join_bloom_prefilter,
    "agg_mode_per_group": agg_mode_per_group,
    "interp_linear_fill": interp_linear_fill,
    "stream_append_mode_windows": stream_append_mode_windows,
}

ORACLE = {
    "join_bloom_prefilter": _BLOOM_SQL,
    "agg_mode_per_group": _MODE_SQL,
    "interp_linear_fill": _INTERP_SQL,
    "stream_append_mode_windows": _APPEND_SQL,
}
