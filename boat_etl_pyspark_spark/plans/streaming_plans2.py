"""Round-5 batch 30 (streaming part): watermark late-data drop audit
(SURVEY.md §2.9 streaming family; no reference counterpart).

``stream_late_data_audit`` proves Structured Streaming's late-data
contract with numbers instead of prose. The events fixture is split
into a deliberately disordered 4-file replay — on-time [0,20%) and
[30,40%) slices, the on-time [40,100%) tail (which carries the
corpus max event time), then the LATE [20,30%) slice delivered last.
With a 1-hour watermark over 6-hour tumbling windows in APPEND mode:

  * late rows whose window closed (window end <= the watermark in
    force when they arrive) are DROPPED by the stateful operator;
  * emitted rows therefore aggregate EXACTLY the on-time files'
    contribution to windows at or below the final watermark.

Why FOUR files: Spark updates the operator-visible watermark with a
micro-batch of lag (measured here: a 3-file replay filtered the late
batch against the watermark derived from file 1 alone, absorbing
every late row). Placing TWO on-time batches — and ~70% of the event
-time span — between the late slice's event-time region and its
arrival makes every late window closed under ANY lag interpretation:
even the most conservative in-force watermark (max of the [30,40%)
file minus 1h) clears the late region's window ends by days. The
audit is therefore deterministic, not a bet on scheduler timing.

The Spark side takes the emitted numbers from the real memory sink
and the audit counts from a static replay of the slice arithmetic;
the DuckDB oracle derives ALL numbers (including 'emitted') from the
declared drop rule in batch SQL — a hash match means Spark's runtime
drop semantics equal the documented rule, row for row and cent for
cent.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import cents
from .contract import EV_TIME_HI_US, EV_TIME_LO_US, ts_valid, ts_valid_sql
from ..sources.readers import load_table
from ..streaming.events import read_events_stream, run_stream_to_memory, scratch_dir

_WIN_US = 21_600_000_000  # 6h tumbling
_DELAY_US = 3_600_000_000  # 1h watermark


def _late_split_dir(sf_dir: str) -> str:
    """4-file replay with a deliberately late last file: rows sorted
    by (microsecond ts, event_id); file0 = [0, 20%), file1 =
    [30%, 40%), file2 = [40%, n) (carries the max event time), file3
    = the late [20%, 30%) slice, delivered LAST via strictly
    increasing mtimes (see module docstring for why the late slice
    sits two batches behind its event-time region). The sort key
    truncates to microseconds so the slice boundaries match the SQL
    row_number over the engines' microsecond timestamps exactly.
    Cache keyed on the source fixture's mtime (same contract as
    ``stream_dir_multi``)."""
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "events.parquet")
    src_mtime = os.stat(src).st_mtime_ns
    key = hashlib.md5(f"{sf_dir}:late4v2:{src_mtime}".encode()).hexdigest()[:12]
    d = os.path.join(scratch_dir(), f"spark_graft_streamL_{key}")
    if os.path.isdir(d):
        return d
    stage = f"{d}.build.{os.getpid()}"
    os.makedirs(stage, exist_ok=True)
    table = pq.read_table(src)
    # event-time validity window at the ingest boundary (contract):
    # the audit's slice arithmetic recomputes file membership by
    # row_number, so the replay files and the audit's `ordered` CTE
    # must count exactly the same rows
    us = table.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
    table = table.filter(
        pc.and_(
            pc.greater_equal(us, EV_TIME_LO_US),
            pc.less(us, EV_TIME_HI_US),
        )
    )
    sort_us = table.column("ts").cast(pa.timestamp("us"))
    table = table.append_column("__sort_us", sort_us)
    table = table.take(
        pc.sort_indices(
            table,
            sort_keys=[("__sort_us", "ascending"), ("event_id", "ascending")],
        )
    ).drop_columns(["__sort_us"])
    n = table.num_rows
    i1, i2, i3 = (2 * n) // 10, (3 * n) // 10, (4 * n) // 10
    slices = [
        table.slice(0, i1),  # on-time head [0, 20%)
        table.slice(i2, i3 - i2),  # on-time [30%, 40%)
        table.slice(i3, n - i3),  # on-time tail (has the max ts)
        table.slice(i1, i2 - i1),  # the late [20%, 30%), delivered last
    ]
    base = time.time()
    for i, part in enumerate(slices):
        path = os.path.join(stage, f"events_{i}.parquet")
        pq.write_table(part, path)
        os.utime(path, (base + i, base + i))
    try:
        os.rename(stage, d)
    except OSError:
        shutil.rmtree(stage, ignore_errors=True)  # another builder won
    return d


# Shared audit arithmetic: slice membership by row_number over
# (ts, event_id), watermark from the on-time files, drop rule =
# window end <= watermark. The oracle additionally derives the
# emitted aggregate from the same rule; the Spark plan reads emitted
# numbers from the actual memory sink instead.
_AUDIT_CORE = f"""
ordered AS (
  SELECT ({{epoch_us}}) AS u,
         TRY_CAST(ROUND(value * 100) AS BIGINT) AS c,
         ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER () AS n
  FROM {{events}}
  WHERE {ts_valid_sql('ts')}
), marks AS (
  SELECT u, c, rn, n, (2 * n) {{idiv}} 10 AS i1, (3 * n) {{idiv}} 10 AS i2
  FROM ordered
), wm AS (
  SELECT MAX(CASE WHEN rn <= i1 OR rn > i2 THEN u END) - {_DELAY_US}
           AS wm_us
  FROM marks
), aud AS (
  SELECT CAST(MIN(n) AS BIGINT) AS n_total,
         CAST(MIN(i2) - MIN(i1) AS BIGINT) AS n_late,
         CAST(SUM(CASE WHEN rn > i1 AND rn <= i2
                  AND ((u {{idiv}} {_WIN_US}) + 1) * {_WIN_US} <= w.wm_us
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_late_dropped
  FROM marks CROSS JOIN wm w
)
SELECT a.n_total, a.n_late, a.n_late_dropped,
       CAST(a.n_late - a.n_late_dropped AS BIGINT) AS n_late_parked,
       s.n_windows_emitted, s.n_events_emitted, s.value_emitted_cents
FROM aud a CROSS JOIN {{sink}} s
"""

_SINK_SPARK = """(
  SELECT CAST(COUNT(*) AS BIGINT) AS n_windows_emitted,
         CAST(COALESCE(SUM(n_events), 0) AS BIGINT) AS n_events_emitted,
         CAST(COALESCE(SUM(value_cents), 0) AS BIGINT)
           AS value_emitted_cents
  FROM {table})"""

_SINK_DUCK = f"""(
  SELECT CAST(COUNT(*) AS BIGINT) AS n_windows_emitted,
         CAST(COALESCE(SUM(ne), 0) AS BIGINT) AS n_events_emitted,
         CAST(COALESCE(SUM(vc), 0) AS BIGINT) AS value_emitted_cents
  FROM (
    SELECT (u // {_WIN_US}) AS wk, COUNT(*) AS ne, SUM(c) AS vc
    FROM marks CROSS JOIN wm
    WHERE (rn <= i1 OR rn > i2)
      AND ((u // {_WIN_US}) + 1) * {_WIN_US} <= wm_us
    GROUP BY 1
  ))"""


def stream_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the disordered replay through a real watermarked append
    stream and reconcile: emitted windows/events/cents from the
    memory sink vs the slice/drop arithmetic from a static scan (see
    module docstring). State is bounded by the watermark (the open
    tail only), the late file costs one micro-batch, and the audit
    itself is one static scan — the shape of a production
    late-arrival monitor."""
    d = _late_split_dir(sf_dir)
    ev = read_events_stream(
        spark,
        sf_dir,
        dir_override=d,
        max_files_per_trigger=1,
        state_partitions=4,
    ).where(ts_valid("ev_time"))
    win = (
        ev.withWatermark("ev_time", "1 hour")
        .groupBy(F.window("ev_time", "6 hours").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents(F.col("value"))).alias("value_cents"),
        )
    )
    sink = run_stream_to_memory(win, "append")
    s2 = sink.sparkSession
    sink.createOrReplaceTempView("sl2_audit_sink")
    load_table(s2, sf_dir, "events").createOrReplaceTempView(
        "sl2_audit_events"
    )
    return s2.sql(
        "WITH "
        + _AUDIT_CORE.format(
            events="sl2_audit_events",
            epoch_us="unix_micros(ts)",
            idiv="DIV",
            sink=_SINK_SPARK.format(table="sl2_audit_sink"),
        )
    )


_LATE_DUCK = "WITH " + _AUDIT_CORE.format(
    events="events", epoch_us="epoch_us(ts)", idiv="//", sink=_SINK_DUCK
)


QUERIES = {"stream_late_data_audit": stream_late_data_audit}
ORACLE = {"stream_late_data_audit": _LATE_DUCK}
