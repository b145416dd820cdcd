"""Kafka shim: wire-schema fidelity and lossless round-trip in batch
mode (the streaming path is covered by the `stream_kafka_roundtrip`
oracle query)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from boat_etl_pyspark_spark.sources.kafka_shim import (
    N_PARTITIONS,
    parse_event_records,
    to_kafka_records,
)

# the column set spark.readStream.format("kafka") produces
KAFKA_COLUMNS = [
    "key",
    "value",
    "topic",
    "partition",
    "offset",
    "timestamp",
    "timestampType",
]


def _events(spark):
    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0, 0), 7, "view", 1.25),
        (2, datetime.datetime(2024, 1, 1, 0, 5, 0), 8, "click", 0.1),
        (3, datetime.datetime(2024, 1, 1, 0, 9, 30), 7, "purchase", 99.999),
    ]
    return spark.createDataFrame(
        rows, "event_id BIGINT, ev_time TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
    )


def test_wire_schema_matches_kafka(spark):
    rec = to_kafka_records(_events(spark))
    assert rec.columns == KAFKA_COLUMNS
    types = dict(rec.dtypes)
    assert types["key"] == "binary" and types["value"] == "binary"
    assert types["partition"] == "int" and types["offset"] == "bigint"
    assert types["timestamp"] == "timestamp"


def test_roundtrip_is_lossless(spark):
    ev = _events(spark)
    back = parse_event_records(to_kafka_records(ev))
    orig = {
        (r.event_id, r.user_id, r.event_type, r.value, r.ev_time)
        for r in ev.collect()
    }
    got = {
        (r.event_id, r.user_id, r.event_type, r.value, r.ev_time)
        for r in back.collect()
    }
    assert got == orig  # exact double + timestamp-micros round-trip
    parts = {r.partition for r in back.collect()}
    assert parts <= set(range(N_PARTITIONS))
    # keyed-partitioner contract: same user -> same partition
    per_user = back.groupBy("user_id").agg(
        F.countDistinct("partition").alias("np")
    )
    assert all(r.np == 1 for r in per_user.collect())
