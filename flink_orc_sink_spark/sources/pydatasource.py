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
partitions (real parallel scan). The streaming reader is
KAFKA-SHAPED: ``n_stream_parts`` independent source partitions, each
with its own replayable cursor — the committed offset is a
``{partition: cursor}`` map, exactly the shape of a Kafka consumer
position, not one global counter. Each partition owns a disjoint id
namespace (``id = partition · id_stride + k``) and partitions advance
at deliberately SKEWED rates per micro-batch (real partitions are
never balanced). Restart semantics:

- a fresh reader fast-forwards every cursor it recognises to the
  WAL-replayed offsets in ``partitions()``/``commit()`` (a rewound
  ``latestOffset`` would let Spark re-plan a covered window);
- a partition ADDED across restart (count 2 → 3) starts from cursor
  0 — the offset map simply lacks its key;
- a partition REMOVED across restart keeps its committed rows and
  stops advancing.

That is the full S2 rewind contract (`README.md:22`) in the real
per-partition shape; swapping in ``format("kafka")`` changes the
line that names the source, nothing downstream.
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


# Rows per emitted RecordBatch: bounds a read task's resident memory
# to one chunk (4 int64/object columns ≈ a few MB) regardless of how
# large the requested id range is, while staying big enough that the
# NumPy vectorization and Arrow framing amortize.
ARROW_CHUNK_ROWS = 65_536


def _arrow_batches(start: int, end: int, n_users: int, base: int = 0):
    """Arrow RecordBatches for ids ``base + [start, end)`` — the same
    pure arithmetic as :func:`_row`, vectorized. Yielding RecordBatches
    instead of per-row tuples keeps the generator out of the pickle
    path entirely (Spark 4 Python DataSource readers accept Arrow
    batches): measured on the 100k-row batch read, the per-row
    generator spent its whole wall in tuple pickling. The range is
    emitted in ``ARROW_CHUNK_ROWS`` chunks so one task never
    materializes an arbitrarily large partition in memory at once."""
    import numpy as np
    import pyarrow as pa

    types = np.asarray(TYPES, dtype=object)
    for lo in range(start, end, ARROW_CHUNK_ROWS):
        ids = np.arange(
            base + lo, base + min(lo + ARROW_CHUNK_ROWS, end), dtype=np.int64
        )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(ids % n_users, type=pa.int64()),
                pa.array(types[ids % 5]),
                pa.array((ids * 37 + 11) % 10000, type=pa.int64()),
            ],
            names=["event_id", "user_id", "etype", "value_cents"],
        )


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
        yield from _arrow_batches(
            partition.start, partition.end, partition.n_users
        )


@dataclass
class _PartRange(InputPartition):
    part: int
    start: int
    end: int
    n_users: int
    stride: int


class _StreamReader(DataSourceStreamReader):
    """Replayable micro-batch source with PER-PARTITION offsets (the
    Kafka consumer-position shape). ``n_rows`` is the cap PER
    partition; partition ``p`` emits ids ``p·id_stride + (0..k)`` so
    namespaces never collide and a SQL oracle can reproduce any
    cursor state arithmetically. ``latestOffset`` advances each
    cursor at a skewed per-partition rate until exhausted; a restart
    resumes every cursor from the checkpointed map — the
    exactly-once replay contract the reference assumes of Kafka,
    per partition."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 100_000))
        self.n_users = int(options.get("n_users", 100))
        self.per_batch = int(options.get("rows_per_batch", 20_000))
        self.n_parts = int(options.get("n_stream_parts", 1))
        self.stride = int(options.get("id_stride", 1_000_000))
        if self.n_rows > self.stride:
            raise ValueError(
                f"n_rows ({self.n_rows}) must fit the id namespace"
                f" (id_stride={self.stride}) or partition ids collide"
            )
        self._cur = {p: 0 for p in range(self.n_parts)}

    def _step(self, p: int) -> int:
        # Skewed on purpose: real topic partitions never advance in
        # lockstep. Partition p gets ~(p+1)/n of the batch budget.
        if self.n_parts == 1:
            return self.per_batch
        return max(1, self.per_batch * (p + 1) // self.n_parts)

    def initialOffset(self):
        return {str(p): 0 for p in range(self.n_parts)}

    def _fast_forward(self, *offsets) -> None:
        # RESTART SAFETY: a fresh reader instance knows nothing about
        # the checkpoint, and a rewound latestOffset would let Spark
        # plan an already-covered window again (measured: exactly one
        # per_batch window duplicated). The WAL replay calls
        # partitions()/commit() with the checkpointed offsets before
        # any new batch is planned — fast-forward every cursor we
        # recognise to the highest offset Spark has ever named.
        # Unknown keys (a partition removed across restart) are left
        # alone: their rows are already committed and they simply
        # stop advancing.
        for off in offsets:
            for key, v in off.items():
                p = int(key)
                if p in self._cur:
                    self._cur[p] = max(self._cur[p], int(v))

    def latestOffset(self):
        for p in range(self.n_parts):
            self._cur[p] = min(self._cur[p] + self._step(p), self.n_rows)
        return {str(p): self._cur[p] for p in range(self.n_parts)}

    def partitions(self, start, end):
        self._fast_forward(start, end)
        out = []
        for p in range(self.n_parts):
            # a partition ADDED across restart is absent from the
            # checkpointed start map: it begins at cursor 0
            lo = int(start.get(str(p), 0))
            hi = int(end.get(str(p), lo))
            if hi > lo:
                out.append(_PartRange(p, lo, hi, self.n_users, self.stride))
        return out

    def read(self, partition: _PartRange):
        yield from _arrow_batches(
            partition.start,
            partition.end,
            partition.n_users,
            base=partition.part * partition.stride,
        )

    def commit(self, end):
        self._fast_forward(end)


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
