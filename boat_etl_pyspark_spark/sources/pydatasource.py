"""Custom Python DataSource (PySpark 4 `pyspark.sql.datasource` API).

Demonstrates the engine's extension point for sources Spark has no
built-in reader for (an internal service API, a proprietary log
format, a synthetic generator): implement `DataSource` +
`DataSourceReader`, register once, then `spark.read.format(name)` —
the source participates in normal planning, and `partitions()` gives
Spark real parallelism (one task per InputPartition, executed on
executors, not the driver).

`SyntheticEventsDataSource` generates a deterministic event stream —
the same generator pattern a load-test or backfill harness uses. All
values are pure functions of (partition, row index), so output is
identical at any parallelism and the reader is testable without a
fixture file.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _EventsPartition(InputPartition):
    def __init__(self, pid: int, start: int, count: int):
        self.pid = pid
        self.start = start
        self.count = count


class _EventsReader(DataSourceReader):
    _TYPES = ("view", "click", "purchase")

    def __init__(self, options):
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = int(options.get("partitions", "4"))

    def partitions(self):
        per = (self.n_rows + self.n_parts - 1) // self.n_parts
        return [
            _EventsPartition(p, p * per, min(per, self.n_rows - p * per))
            for p in range(self.n_parts)
            if min(per, self.n_rows - p * per) > 0
        ]

    def read(self, partition: _EventsPartition):
        base_ts = 1_700_000_000_000_000  # 2023-11-14 epoch micros
        for i in range(partition.start, partition.start + partition.count):
            # deterministic pure functions of the row index — output
            # is independent of partitioning
            yield (
                i,
                base_ts + i * 60_000_000,
                (i * 2654435761) % 500,
                self._TYPES[i % 3],
                float((i * 37) % 35000) / 100.0,
            )


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("synthetic_events").option("rows", N)`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id BIGINT, ts_us BIGINT, user_id BIGINT, "
            "event_type STRING, value DOUBLE"
        )

    def reader(self, schema) -> DataSourceReader:
        return _EventsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
