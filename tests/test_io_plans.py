"""Plan-shape and invariant tests for the IO round-trip and
sessionization queries (beyond the oracle parity every registry entry
already gets in test_oracle_parity)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import Window
from pyspark.sql import functions as F

from boat_etl_pyspark_spark.plans.io_plans import (
    io_csv_roundtrip,
    io_partitioned_scan,
)
from boat_etl_pyspark_spark.plans.sessionize import _GAP_US, events_sessionize
from tests.conftest import SF_SMOKE


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_partitioned_scan_prunes(spark):
    df = io_partitioned_scan(spark, SF_SMOKE)
    plan = plan_of(df)
    # The event_type predicate must be a partition filter on the
    # read-back scan, not a post-scan Filter over all partitions.
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:200]
    assert "event_type" in seg


def test_csv_roundtrip_is_content_sensitive(spark):
    # The round-trip aggregate must reflect the decorated text (the
    # part that exercises quoting); if the reader dropped or split
    # records the distinct-text count could not match the doc count.
    out = io_csv_roundtrip(spark, SF_SMOKE).agg(
        F.sum("n_docs").alias("docs"),
        F.sum("n_distinct_texts").alias("texts"),
    ).collect()[0]
    assert out.docs > 0
    assert out.texts > 0


def test_sessionize_invariants(spark):
    sessions = events_sessionize(spark, SF_SMOKE)
    # Sessions of one user never overlap, and consecutive sessions are
    # separated by more than the gap.
    bad_order = (
        sessions.withColumn(
            "prev_end",
            F.lag("t_end_us").over(
                Window.partitionBy("user_id").orderBy("session_seq")
            ),
        )
        .where(F.col("prev_end").isNotNull())
        .where(F.col("t_start_us") - F.col("prev_end") <= _GAP_US)
        .count()
    )
    assert bad_order == 0
    # Every event lands in exactly one session.
    from boat_etl_pyspark_spark.sources.readers import load_table

    n_events = load_table(spark, SF_SMOKE, "events").count()
    assert sessions.agg(F.sum("n_events")).collect()[0][0] == n_events
