"""Streaming semantics beyond the oracle gate: watermark progression
and append-mode late/held-back behavior that SQL can't express."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from boat_etl_pyspark_spark.functions.numeric import cents
from boat_etl_pyspark_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
)

SF = "/root/testdata/sf0.001"
GAP_US = 30 * 60 * 1_000_000


@pytest.fixture(scope="module")
def ordered_event_files(tmp_path_factory):
    """events.parquet split into 4 files in strict event-time order,
    so a maxFilesPerTrigger=1 stream sees time advance batch by batch."""
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("events_by_time"))
    src = os.path.join(SF, "events.parquet")
    # pyarrow preserves the fixture's timestamp[ns] physical type
    # (DuckDB COPY would silently downcast to micros)
    table = pq.read_table(src)
    table = table.sort_by("ts")
    n = table.num_rows
    step = (n + 3) // 4
    for i in range(4):
        chunk = table.slice(i * step, step)
        path = f"{out}/part-{i:02d}.parquet"
        pq.write_table(chunk, path, version="2.6")
        # distinct mtimes so the file source processes them in order
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    return out


def _session_agg(stream_df):
    return (
        stream_df.withWatermark("ev_time", "1 hour")
        .groupBy(F.session_window("ev_time", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("start_us"),
            F.unix_micros(F.col("w.end")).alias("end_us"),
            "n_events",
        )
    )


def test_append_mode_watermark_holds_back_tail_sessions(spark, ordered_event_files):
    complete = {
        tuple(r)
        for r in run_stream_to_memory(
            _session_agg(read_events_stream(spark, SF)), "complete"
        ).collect()
    }
    appended = {
        tuple(r)
        for r in run_stream_to_memory(
            _session_agg(
                read_events_stream(
                    spark, SF,
                    dir_override=ordered_event_files,
                    max_files_per_trigger=1,
                )
            ),
            "append",
        ).collect()
    }
    # append emits only sessions finalized by the watermark: a strict,
    # non-empty subset of the complete answer (tail sessions held back)
    assert appended, "append mode emitted nothing — watermark never advanced"
    assert appended < complete, "append mode should hold back in-flight sessions"
    # and everything emitted must be closed before the final watermark
    max_end_appended = max(e for (_, _, e, _) in appended)
    max_end_complete = max(e for (_, _, e, _) in complete)
    assert max_end_appended < max_end_complete


def test_stateful_operator_accumulates_across_batches(spark, ordered_event_files):
    """applyInPandasWithState must carry state between micro-batches:
    stream the 4 time-ordered files one per trigger and check the
    final running totals equal a batch aggregation — and that users
    got multiple intermediate updates (proof of multi-batch state)."""
    from pyspark.sql import functions as F

    from boat_etl_pyspark_spark.sources.readers import load_table
    from boat_etl_pyspark_spark.streaming.events import stateful_user_totals

    ev = read_events_stream(
        spark, SF, dir_override=ordered_event_files, max_files_per_trigger=1
    )
    updates = run_stream_to_memory(stateful_user_totals(ev), "update")
    finals = updates.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    batch = load_table(spark, SF, "events").groupBy("user_id").count()
    got = {r["user_id"]: r["n_events"] for r in finals.collect()}
    want = {r["user_id"]: r["count"] for r in batch.collect()}
    assert got == want
    # multiple updates per user across the 4 micro-batches
    n_updates = updates.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    assert n_updates >= 2


def test_stream_tumbling_equals_batch(spark):
    """complete-mode streaming agg == the same agg computed in batch."""
    from boat_etl_pyspark_spark.sources.readers import load_table

    streamed = run_stream_to_memory(
        read_events_stream(spark, SF)
        .withWatermark("ev_time", "1 hour")
        .groupBy(F.window("ev_time", "6 hours").alias("w"))
        .agg((F.sum(cents(F.col("value"))) / 100.0).alias("value_sum")),
        "complete",
    ).select(F.unix_micros("w.start").alias("ws"), "value_sum")
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.window("ts", "6 hours").alias("w"))
        .agg((F.sum(cents(F.col("value"))) / 100.0).alias("value_sum"))
        .select(F.unix_micros("w.start").alias("ws"), "value_sum")
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def test_checkpoint_restart_cleanup_spares_live_owners(spark):
    """The stale-triple reaper must delete ONLY dirs whose embedded
    owner pid is dead. Round 9 reproduced two concurrent replays on
    one host deleting each other's arrival dirs mid-replay
    (FAILED_READ_FILE.FILE_NOT_EXIST); the fix probes the owner with
    os.kill(pid, 0) before rmtree. This net plants one triple owned
    by a LIVE foreign process and one owned by a DEAD pid, runs the
    query, and checks exactly the dead one was reaped."""
    import subprocess
    import tempfile

    import __spark_entry__ as m

    live = subprocess.Popen(["sleep", "120"])
    dead = subprocess.Popen(["true"])
    dead.wait()
    from boat_etl_pyspark_spark.streaming.events import scratch_dir

    tmp = scratch_dir()
    live_dir = os.path.join(tmp, f"spark_graft_ckr_a_feedbeef0001_{live.pid}")
    dead_dir = os.path.join(tmp, f"spark_graft_ckr_a_feedbeef0002_{dead.pid}")
    os.makedirs(live_dir, exist_ok=True)
    os.makedirs(dead_dir, exist_ok=True)
    marker = os.path.join(live_dir, "marker.txt")
    with open(marker, "w") as fh:
        fh.write("live owner's data\n")
    try:
        df = m.queries()["stream_checkpoint_restart"](spark, SF)
        assert df.count() > 0
        assert os.path.exists(marker), "live foreign triple was reaped"
        assert not os.path.exists(dead_dir), "dead triple survived"
    finally:
        live.kill()
        live.wait()
        import shutil

        shutil.rmtree(live_dir, ignore_errors=True)
        shutil.rmtree(dead_dir, ignore_errors=True)
