"""Python DataSource V2 SINK with the reference's two-phase commit.

The reference sink's whole reason to exist is a hand-rolled
file-commit protocol: tasks write files nobody may read yet, and a
coordinator publishes them atomically at checkpoint time
(``RowOrcBucketingSink.java:153-177`` — in-process → in-pending →
committed renames, ``README.md:7-22``). Spark 4's Python DataSource
writer API exposes EXACTLY that contract as first-class hooks, so
this module re-expresses the protocol on it:

- executor tasks (``DataSourceArrowWriter.write``) stream their Arrow
  batches into ONE ORC file each under ``data/`` — written via
  pyarrow, invisible to readers (the directory is never listed);
- the driver's ``commit(messages)`` is ``notifyCheckpointComplete``:
  it publishes the task files in a JSON manifest via
  write-temp-then-``os.replace`` (atomic on POSIX) — readers see the
  whole batch of files or none of it;
- ``abort(messages)`` is the reference's pending-file cleanup: the
  named files are unlinked; a crash that skips even abort leaves
  orphans that no manifest references — invisible, GC-able;
- the STREAMING form (``DataSourceStreamArrowWriter``) keys the
  manifest by ``batchId``: a crash-replayed micro-batch REWRITES its
  own manifest (the replay's fresh files replace the originals, which
  become unreferenced orphans) — idempotent exactly-once, the same
  mechanism as the engine's ``foreachBatch`` sinks but spoken through
  the official connector API.

``read_manifest_orc`` is the reader side of the contract: it unions
the manifested file lists and reads ONLY those (an orphan planted in
``data/`` must not surface — pytest-probed), exactly like
``read_committed_orc`` trusts ``_spark_metadata``.

Scale: one ORC file per writer task (size it upstream via
``repartition``), manifests are O(files) JSON — the same metadata
shape the engine's snapshot tables use at any corpus size.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)


# The only names the sink ever publishes: vNNNNNNNN.json from batch
# commits, batch-NNNNNNNN.json from streaming epochs — 8+ digits
# ({8,}, not {8}: the :08d format is a MINIMUM width, so version or
# batch id 10^8 widens to 9 digits and an exact-width match would
# silently orphan its committed files). Readers and the vacuum filter
# on this so a stray foreign .json in manifests/ can neither KeyError
# a read nor pin phantom files as live.
_BATCH_MANIFEST_NAME = re.compile(r"v(\d{8,})\.json")
_MANIFEST_NAME = re.compile(r"(v|batch-)\d{8,}\.json")


@dataclass
class FileCommit(WriterCommitMessage):
    relpath: str | None
    n_rows: int


def _naive_ts_schema(schema):
    """Spark hands tz-aware (UTC-instant) timestamps; pyarrow would
    write them as ORC timestamp_instant, which Spark's reader maps to
    the unparseable "timestamp with local time zone". Store them
    tz-naive — the session runs UTC, so the instant is preserved,
    exactly how Spark's own ORC writer stores TIMESTAMP."""
    import pyarrow as pa

    fields = [
        f.with_type(pa.timestamp(f.type.unit))
        if pa.types.is_timestamp(f.type) and f.type.tz is not None
        else f
        for f in schema
    ]
    return pa.schema(fields)


def _write_task_file(path: str, iterator) -> FileCommit:
    import pyarrow as pa
    import pyarrow.orc as paorc

    # stream batch-by-batch: peak memory is O(one Arrow batch), not
    # O(task partition) — the writer opens lazily on the first
    # non-empty batch so empty tasks produce no file at all
    writer = None
    rel = None
    n_rows = 0
    try:
        for b in iterator:
            if not b.num_rows:
                continue
            schema = _naive_ts_schema(b.schema)
            if writer is None:
                os.makedirs(os.path.join(path, "data"), exist_ok=True)
                rel = os.path.join(
                    "data", f"task-{uuid.uuid4().hex}.orc"
                )
                writer = paorc.ORCWriter(
                    os.path.join(path, rel), compression="zstd"
                )
            writer.write(pa.Table.from_batches([b]).cast(schema))
            n_rows += b.num_rows
    finally:
        if writer is not None:
            writer.close()
    return FileCommit(rel, n_rows)


def _publish(path: str, manifest_name: str, files: list[str]) -> None:
    mdir = os.path.join(path, "manifests")
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".{manifest_name}.tmp")
    with open(tmp, "w") as fh:
        json.dump({"files": files}, fh)
    os.replace(tmp, os.path.join(mdir, manifest_name))


def _abort(path: str, messages) -> None:
    for m in messages:
        if m is not None and m.relpath:
            try:
                os.unlink(os.path.join(path, m.relpath))
            except OSError:
                pass


class _BatchWriter(DataSourceArrowWriter):
    def __init__(self, path: str, overwrite: bool):
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator):
        return _write_task_file(self.path, iterator)

    def commit(self, messages):
        files = [m.relpath for m in messages if m is not None and m.relpath]
        mdir = os.path.join(self.path, "manifests")
        # fullmatch, not startswith/endswith: a stray non-versioned
        # 'v*.json' (say 'version.json') must neither crash the int
        # parse nor be unlinked by an overwrite.
        prior = (
            sorted(
                f
                for f in os.listdir(mdir)
                if _BATCH_MANIFEST_NAME.fullmatch(f)
            )
            if os.path.isdir(mdir)
            else []
        )  # batch manifests only: a batch overwrite must not count
        # or unlink streaming batch-NNNNNNNN.json manifests
        if self.overwrite:
            for f in prior:
                os.unlink(os.path.join(mdir, f))
            version = 1
        else:
            # max(existing)+1, NOT len(prior)+1: an overwrite that
            # crashed mid-unlink can leave a gap (v2 present, v1
            # gone); len-based numbering would then recompute v2 and
            # _publish would atomically REPLACE the live manifest,
            # silently dropping its committed files from readers.
            version = (
                max(
                    (
                        int(_BATCH_MANIFEST_NAME.fullmatch(f).group(1))
                        for f in prior
                    ),
                    default=0,
                )
                + 1
            )
        _publish(self.path, f"v{version:08d}.json", files)

    def abort(self, messages):
        _abort(self.path, messages)


class _StreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, path: str):
        self.path = path

    def write(self, iterator):
        return _write_task_file(self.path, iterator)

    def commit(self, messages, batchId: int):
        files = [m.relpath for m in messages if m is not None and m.relpath]
        # keyed by batch id: a crash-replayed batch REPLACES its own
        # manifest; the superseded files become invisible orphans
        _publish(self.path, f"batch-{batchId:08d}.json", files)

    def abort(self, messages, batchId: int):
        _abort(self.path, messages)


class ManifestOrcSinkDataSource(DataSource):
    """``format("manifest_orc_py")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "manifest_orc_py"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("manifest_orc_py requires a path")
        return path

    def writer(self, schema, overwrite: bool):
        return _BatchWriter(self._path(), overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return _StreamWriter(self._path())


def register_sink(spark) -> None:
    spark.dataSource.register(ManifestOrcSinkDataSource)


def read_manifest_orc(spark, path: str):
    """Committed-files-only reader: union of every manifest's file
    list. Orphans under ``data/`` (crashed tasks, superseded replay
    files) are invisible because the data directory is never listed."""
    mdir = os.path.join(path, "manifests")
    files: list[str] = []
    for name in sorted(os.listdir(mdir)):
        if _MANIFEST_NAME.fullmatch(name):
            with open(os.path.join(mdir, name)) as fh:
                files.extend(json.load(fh)["files"])
    if not files:
        raise ValueError(f"no committed files under {path}")
    return spark.read.orc([os.path.join(path, f) for f in files])


def vacuum_manifest_orc(path: str, grace_seconds: float = 600.0) -> dict:
    """GC for the sink's documented failure contract: delete every
    ``data/`` file no manifest references — crashed tasks that never
    reached ``abort``, and files superseded when a crash-replayed
    micro-batch rewrote its manifest. Mirrors ``snapshot_expire``'s
    crash-safe ordering trivially: manifests are never touched, so a
    crash mid-vacuum just leaves fewer orphans for the next run. At
    100 TB this is the same metadata-only driver job every
    manifest-committed table format schedules (Iceberg
    ``remove_orphan_files``). Returns counts.

    Concurrency contract: an IN-FLIGHT write has task files on disk
    before its manifest is published; an unguarded vacuum would
    delete them and the subsequent commit would publish a manifest
    pointing at missing files. ``grace_seconds`` (Iceberg's
    ``older_than`` analogue, default 10 min) skips any unreferenced
    file younger than the grace window, so a vacuum is safe alongside
    writers whose task-attempt lifetime is under the grace period.
    Pass ``grace_seconds=0`` only when the caller holds the same
    single-writer exclusivity ``compact_index`` requires."""
    mdir = os.path.join(path, "manifests")
    live: set[str] = set()
    if os.path.isdir(mdir):
        for name in os.listdir(mdir):
            if _MANIFEST_NAME.fullmatch(name):
                with open(os.path.join(mdir, name)) as fh:
                    live.update(json.load(fh)["files"])
    deleted = 0
    skipped_young = 0
    now = time.time()
    data_dir = os.path.join(path, "data")
    if os.path.isdir(data_dir):
        for f in os.listdir(data_dir):
            rel = os.path.join("data", f)
            if f.endswith(".orc") and rel not in live:
                full = os.path.join(path, rel)
                try:
                    age = now - os.path.getmtime(full)
                except OSError:
                    continue  # racing abort/unlink already removed it
                if age < grace_seconds:
                    skipped_young += 1
                    continue
                os.unlink(full)
                deleted += 1
    return {
        "files_deleted": deleted,
        "files_retained": len(live),
        "files_skipped_young": skipped_young,
    }
