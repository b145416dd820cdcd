"""Custom Python DataSource: registration, partition-parallel read,
and partitioning-independence of the generated data."""

from __future__ import annotations

from pyspark.sql import functions as F

from boat_etl_pyspark_spark.sources.pydatasource import register


def test_reads_expected_rows_and_schema(spark):
    register(spark)
    df = spark.read.format("synthetic_events").option("rows", "1000").load()
    assert df.count() == 1000
    assert df.columns == ["event_id", "ts_us", "user_id", "event_type", "value"]
    assert df.rdd.getNumPartitions() == 4  # one task per InputPartition
    stats = df.agg(
        F.countDistinct("event_id").alias("ids"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    ).first()
    assert stats.ids == 1000
    assert 0.0 <= stats.vmin <= stats.vmax < 350.0


def test_output_independent_of_partitioning(spark):
    register(spark)

    def rows(parts: int):
        df = (
            spark.read.format("synthetic_events")
            .option("rows", "500")
            .option("partitions", str(parts))
            .load()
        )
        return sorted(map(tuple, df.collect()))

    assert rows(1) == rows(7) == rows(32)


def test_composes_with_engine_operators(spark):
    """The custom source is a normal DataFrame: windowed aggregation
    over its event time works like any other table."""
    register(spark)
    df = spark.read.format("synthetic_events").option("rows", "600").load()
    hourly = (
        df.withColumn("ev_time", F.timestamp_micros("ts_us"))
        .groupBy(F.window("ev_time", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    out = hourly.collect()
    assert sum(r.n for r in out) == 600
