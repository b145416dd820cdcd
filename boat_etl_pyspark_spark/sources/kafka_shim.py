"""Kafka-shaped streaming source shim.

This container has no Kafka broker, but the engine's streaming surface
must be source-agnostic: a consumer written against Kafka's wire
schema (`key`/`value` binary, `topic`, `partition`, `offset`,
`timestamp`, `timestampType` — what `spark.readStream.format("kafka")`
yields) should run unchanged here. The shim provides:

  * ``to_kafka_records`` — project any event DataFrame (batch OR
    stream) into the exact Kafka record schema: JSON-serialized value
    payload, key bytes, deterministic partition assignment (hash of
    the key modulo the partition count — Kafka's own default
    partitioner shape) and a monotonic offset per source record.
  * ``read_kafka_shaped_stream`` — file-source stream of the events
    fixture already projected into that schema; swapping it for a
    real broker is a one-line change to ``.format("kafka")``.
  * ``parse_event_records`` — the consumer side: ``CAST(value AS
    STRING)`` → ``from_json`` with an explicit schema → typed event
    columns. This is the half that carries all the business logic,
    and it is what the round-trip query verifies against the oracle.

Scale posture: serialization and parsing are pure column expressions
(`to_json`/`from_json`, JVM-side); partition assignment is a hash —
the same records land on the same partitions at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_PARTITIONS = 4

# The consumer-side schema for event payloads. `ts_us` rides as a
# long (unix micros): timestamps inside JSON round-trip as strings
# otherwise, and micros are the engine's oracle-safe timestamp
# representation throughout.
EVENT_VALUE_SCHEMA = (
    "event_id BIGINT, ts_us BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
)


def to_kafka_records(events: DataFrame, topic: str = "events") -> DataFrame:
    """Project typed events into the Kafka record schema. Works on
    batch and streaming DataFrames alike (pure column expressions).

    Partition = pmod(user_id, N) mirrors Kafka's keyed-partitioner
    contract (same key -> same partition, hence per-key ordering);
    offset reuses the source's monotonic event_id — a real broker
    assigns its own, and nothing downstream may depend on more than
    (partition, offset) uniqueness, which both properties satisfy.
    """
    value = F.to_json(
        F.struct(
            F.col("event_id"),
            F.unix_micros(F.col("ev_time")).alias("ts_us"),
            F.col("user_id"),
            F.col("event_type"),
            F.col("value"),
        )
    )
    return events.select(
        F.encode(F.col("user_id").cast("string"), "UTF-8").alias("key"),
        F.encode(value, "UTF-8").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.col("user_id"), F.lit(N_PARTITIONS)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ev_time").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def read_kafka_shaped_stream(
    spark: SparkSession, sf_dir: str, topic: str = "events"
) -> DataFrame:
    """Streaming DataFrame with Kafka's exact record schema, fed from
    the events fixture. Replace with
    ``spark.readStream.format("kafka").option(...)`` against a real
    broker; consumers are unchanged."""
    from ..streaming.events import read_events_stream

    return to_kafka_records(read_events_stream(spark, sf_dir), topic)


def parse_event_records(records: DataFrame) -> DataFrame:
    """Consumer side: decode + parse the JSON value payload back into
    typed event columns, keeping the Kafka metadata columns."""
    parsed = F.from_json(F.col("value").cast("string"), EVENT_VALUE_SCHEMA)
    return records.select(
        "topic",
        "partition",
        "offset",
        parsed.alias("e"),
    ).select(
        "topic",
        "partition",
        "offset",
        "e.event_id",
        "e.ts_us",
        "e.user_id",
        "e.event_type",
        "e.value",
        F.timestamp_micros(F.col("e.ts_us")).alias("ev_time"),
    )
