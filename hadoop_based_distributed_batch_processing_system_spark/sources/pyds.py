"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API).

The reference system's extensible-input surface is the InputFormat:
users plug arbitrary record readers into the scan layer (SURVEY.md
§2.1). Spark 4's Python Data Source API is that surface on this
engine: a pure-Python ``DataSource`` declares its schema and a
partitioned ``DataSourceReader``, and the scan parallelizes like any
built-in source — each ``InputPartition`` becomes one task, rows
arrive Arrow-batched, and downstream Catalyst treats it as a normal
relation (filters/projections compose on top).

At 100 TB this is how a proprietary feed (REST cursor pages, an
internal message queue, a bespoke binary format) joins the lakehouse
without a JVM connector: partition the keyspace in ``partitions()``,
read one shard per task in ``read()``.

The demo source generates a deterministic synthetic event table —
every cell a closed-form function of ``event_id`` — so the whole
custom-source path (registration → partition planning → per-task
reads → Arrow transfer) is hash-checkable against a DuckDB
``generate_series`` oracle, not just smoke-tested.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_DEFAULT_ROWS = 10_000
_DEFAULT_PARTITIONS = 8


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id BIGINT, bucket INT, value DOUBLE"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("rows", _DEFAULT_ROWS))
        self.num_parts = int(options.get("partitions", _DEFAULT_PARTITIONS))

    def partitions(self):
        # Round-robin keyspace split: partition i owns ids {i, i+P, ...}.
        # Each becomes one Spark task — this list is the custom source's
        # split planning, the InputFormat.getSplits() equivalent.
        return [InputPartition(i) for i in range(self.num_parts)]

    def read(self, partition):
        import math

        i = partition.value
        for eid in range(i, self.n, self.num_parts):
            # closed-form cells: deterministic, partition-independent
            yield (eid, eid % 10, round(math.sqrt(eid + 1.0), 6))


def register_synthetic_source(spark: SparkSession) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticEventsDataSource)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Bounded deterministic micro-batch stream: offset = next row id;
    each ``read`` emits up to ``batch`` rows until ``rows`` are out.
    ``readBetweenOffsets`` replays any committed range exactly —
    that determinism is what gives the source exactly-once semantics
    under checkpoint replay (same contract a Kafka offset range
    gives a JVM source)."""

    def __init__(self, options):
        self.n = int(options.get("rows", _DEFAULT_ROWS))
        self.batch = int(options.get("batch", 1000))

    def initialOffset(self):
        return {"next": 0}

    def _rows(self, start: int, end: int):
        import math

        return [(i, i % 10, round(math.sqrt(i + 1.0), 6)) for i in range(start, end)]

    def read(self, start):
        lo = start["next"]
        hi = min(lo + self.batch, self.n)
        return iter(self._rows(lo, hi)), {"next": hi}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(start["next"], end["next"]))


class SyntheticEventsStreamSource(DataSource):
    """``spark.readStream.format("synthetic_events_stream")``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return "event_id BIGINT, bucket INT, value DOUBLE"

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_stream_source(spark: SparkSession) -> None:
    spark.dataSource.register(SyntheticEventsStreamSource)
