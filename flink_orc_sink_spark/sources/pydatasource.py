"""Custom connector via Spark 4's Python DataSource API.

The reference's source surface is "whatever Flink connector you
attach" (`OrcSinkTest.java:32` uses the socket source; `README.md:22`
assumes Kafka). Spark's equivalent extension point for sources the
built-ins don't cover is the DataSource V2 Python API (Spark 4):
``spark.dataSource.register`` + ``spark.read.format("name")`` /
``spark.readStream.format("name")``.

This module implements a complete BATCH + STREAMING connector:
a deterministic synthetic event generator whose every value is pure
``event_id`` arithmetic — so a DuckDB oracle can verify what the
connector produced without the connector (the same
arithmetic-oracle trick as the planted-PNG pixel tier):

- ``event_id``  = row index
- ``user_id``   = event_id % n_users
- ``etype``     = TYPES[event_id % 5]
- ``value_cents`` = (event_id * 37 + 11) % 10000

Batch reads split the id range into ``n_partitions`` independent
partitions (real parallel scan). The streaming reader exposes the
row index as the OFFSET — replayable, exactly-once-compatible, the
S2 contract (`README.md:22`: rewind to the checkpointed offset) in
~40 lines of Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

TYPES = ("view", "click", "purchase", "signup", "error")

SCHEMA = (
    "event_id long, user_id long, etype string, value_cents long"
)


def _row(i: int, n_users: int):
    return (i, i % n_users, TYPES[i % 5], (i * 37 + 11) % 10000)


@dataclass
class _Range(InputPartition):
    start: int
    end: int
    n_users: int


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 100_000))
        self.n_users = int(options.get("n_users", 100))
        self.n_parts = int(options.get("n_partitions", 8))

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _Range(lo, min(lo + step, self.n_rows), self.n_users)
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield _row(i, partition.n_users)


class _StreamReader(DataSourceStreamReader):
    """Replayable micro-batch source: the offset is the row index.
    ``latestOffset`` advances by ``rows_per_batch`` until ``n_rows``
    is exhausted; a restart resumes from the checkpointed offset —
    the exactly-once replay contract the reference assumes of Kafka."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 100_000))
        self.n_users = int(options.get("n_users", 100))
        self.per_batch = int(options.get("rows_per_batch", 20_000))
        self._current = 0

    def initialOffset(self):
        return {"idx": 0}

    def latestOffset(self):
        self._current = min(self._current + self.per_batch, self.n_rows)
        return {"idx": self._current}

    def partitions(self, start, end):
        # RESTART SAFETY: a fresh reader instance knows nothing about
        # the checkpoint, and a rewound latestOffset would let Spark
        # plan an already-covered window again (measured: exactly one
        # per_batch window duplicated). The WAL replay calls
        # partitions() with the checkpointed offsets before any new
        # batch is planned — fast-forward the generator to the
        # highest offset Spark has ever named.
        self._current = max(self._current, start["idx"], end["idx"])
        if end["idx"] <= start["idx"]:
            return []
        return [_Range(start["idx"], end["idx"], self.n_users)]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield _row(i, partition.n_users)

    def commit(self, end):
        self._current = max(self._current, end["idx"])


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _Reader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
