"""Deletion + retention for the persisted dedup/ANN indexes.

The three index families (MinHash bands+shingles, IVF inverted lists,
perceptual-hash bands — ``operators/dedup.py`` / ``similarity.py`` /
``multimodal.py``) persist per-document rows in parquet. When source
rows are erased (GDPR, takedown, retention windows — the batch twin is
``queries/events.py::orc_gdpr_erase``), their index rows must stop
producing matches too, or the index keeps "remembering" deleted data.

Two-phase shape, the same trade every merge-on-read table format makes
(Delta deletion vectors, Iceberg positional deletes):

- :func:`forget_ids` — O(deleted) APPEND of ids into a ``tombstones/``
  table; every probe anti-joins it at read time. No index rewrite on
  the delete path, so deletes are cheap and immediate at any scale.
- :func:`compact_index` — periodic copy-on-write rewrite that drops
  tombstoned rows physically and clears the tombstone table, bounding
  probe-side anti-join cost between compactions.

The compaction swap follows the reference sink's commit protocol
(``RowOrcBucketingSink.java:153-213``: write to a pending name, rename
into place only when complete): each table is fully rewritten to
``<subdir>__compacting`` first, and only then swapped in. A crash
leaves either the old table intact (before the swap) or a complete new
copy recoverable by :func:`recover_index` (between delete and rename);
a crash before the tombstone clear is idempotent, since subtracting
already-removed ids is a no-op. Compaction is an exclusive maintenance
operation: probes must not run concurrently with the swap, exactly as
with any parquet-directory overwrite.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TOMBSTONES = "tombstones"
_PENDING_SUFFIX = "__compacting"


@dataclass(frozen=True)
class IndexTable:
    """One per-id parquet table of a persisted index.

    ``partition_cols`` are rewritten with ``partitionBy`` (directory
    layout preserved); ``range_cols`` reproduce the build path's
    ``repartitionByRange`` + ``sortWithinPartitions`` so a compacted
    index keeps the same pruning/clustering properties as a fresh
    :func:`build_*` — compaction must never degrade the layout the
    probe cost model depends on.
    """

    subdir: str
    id_col: str
    partition_cols: tuple = ()
    range_cols: tuple = ()
    repartition_cols: tuple = ()


# The concrete layouts, kept next to the machinery so the per-family
# forget/compact wrappers share one source of truth.
MINHASH_TABLES = (
    IndexTable("bands", "doc", ("band",), ("band", "bkey")),
    IndexTable("shingles", "doc"),
)
IVF_TABLES = (IndexTable("data", "cid", ("cell",), (), ("cell",)),)
AHASH_TABLES = (IndexTable("bands", "mid", ("band",), ("band", "key")),)


def _fs(spark: SparkSession, path: str):
    """Hadoop FileSystem + Path for ``path`` — works on any FS Spark
    can write to (local, HDFS, S3A), not just the local disk."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return fs.exists(p)


def forget_ids(ids: DataFrame, index_path: str) -> None:
    """Tombstone ids (single-column DataFrame, any name/integer type)
    so every subsequent probe of the index excludes them. O(deleted)
    work: one distinct + append — nothing index-sized runs."""
    (id_col,) = ids.columns
    (
        ids.select(F.col(id_col).cast("long").alias("id"))
        .distinct()
        .write.mode("append")
        .parquet(f"{index_path}/{_TOMBSTONES}")
    )


def read_tombstones(spark: SparkSession, index_path: str) -> DataFrame | None:
    """The tombstone set, or None when nothing was ever forgotten
    (the common case — probes skip the anti-join entirely)."""
    path = f"{index_path}/{_TOMBSTONES}"
    if not _exists(spark, path):
        return None
    return spark.read.parquet(path).select("id").distinct()


def subtract_tombstones(
    df: DataFrame, id_col: str, spark: SparkSession, index_path: str
) -> DataFrame:
    """Merge-on-read: drop tombstoned rows from an index scan. The
    anti-join's build side is the tombstone table — bounded by the
    deletes since the last compaction, not by the index (AQE picks a
    broadcast for the usual small case)."""
    ts = read_tombstones(spark, index_path)
    if ts is None:
        return df
    return df.join(
        ts.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )


def recover_index(
    spark: SparkSession, index_path: str, tables: tuple[IndexTable, ...]
) -> None:
    """Finish an interrupted compaction swap: a crash between delete
    and rename leaves a complete ``__compacting`` copy and no live
    table — rename it into place. Safe to call any time (no-op unless
    exactly that state is found); :func:`compact_index` calls it
    first, so simply re-running compaction heals a crashed one."""
    for t in tables:
        live = f"{index_path}/{t.subdir}"
        pending = live + _PENDING_SUFFIX
        if _exists(spark, pending) and not _exists(spark, live):
            fs, live_p = _fs(spark, live)
            _, pend_p = _fs(spark, pending)
            if not fs.rename(pend_p, live_p):
                raise IOError(f"recovery rename failed: {pending}")


def compact_index(
    spark: SparkSession, index_path: str, tables: tuple[IndexTable, ...]
) -> None:
    """Copy-on-write: physically drop tombstoned rows from every table
    of the index, preserving each table's partition layout and range
    clustering, then clear the tombstone table. See the module
    docstring for the crash-safety protocol."""
    recover_index(spark, index_path, tables)
    ts = read_tombstones(spark, index_path)
    if ts is None:
        return
    pending: list[tuple[str, str]] = []
    for t in tables:
        live = f"{index_path}/{t.subdir}"
        out = live + _PENDING_SUFFIX
        df = spark.read.parquet(live).join(
            ts.select(F.col("id").alias(t.id_col)), t.id_col, "left_anti"
        )
        if t.range_cols:
            df = df.repartitionByRange(*t.range_cols).sortWithinPartitions(
                *t.range_cols
            )
        elif t.repartition_cols:
            df = df.repartition(*t.repartition_cols)
        w = df.write.mode("overwrite")
        if t.partition_cols:
            w = w.partitionBy(*t.partition_cols)
        w.parquet(out)
        pending.append((live, out))
    # every new copy is complete on disk — now swap. A crash mid-loop
    # leaves each table either old (recoverable: pending copy still
    # present, rerun compacts again) or new (recover_index finishes
    # the rename); probes see a consistent table either way.
    for live, out in pending:
        fs, live_p = _fs(spark, live)
        _, out_p = _fs(spark, out)
        fs.delete(live_p, True)
        if not fs.rename(out_p, live_p):
            raise IOError(f"compaction swap failed: {out} -> {live}")
    fs, ts_p = _fs(spark, f"{index_path}/{_TOMBSTONES}")
    fs.delete(ts_p, True)
