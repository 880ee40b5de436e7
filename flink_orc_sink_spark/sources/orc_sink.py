"""Partitioned, atomically-committed ORC output — batch side.

This is the engine's batch equivalent of the reference's whole raison
d'être (``RowOrcBucketingSink.java``): typed rows → bucketed (Hive
partition) directories of ORC files that a downstream warehouse can
read, with files becoming visible only on successful commit.

What the reference hand-rolls and Spark provides natively:

- Row→columnar transposition in 1024-row batches
  (``RowOrcWriter.java:38,116-119``) → Spark's native vectorized ORC
  writer (``spark.sql.orc.impl=native``).
- Bucket routing via a pluggable ``Bucketer``
  (``RowOrcBucketingSink.java:41,111,251-254``) → ``partitionBy(cols)``
  (Hive-style ``k=v/`` directories), with computed partition columns
  standing in for custom bucketers.
- Collision-safe part-file naming with a retry counter
  (``RowOrcBucketingSink.java:124-151,226-228``) → unique
  ``part-{task}-{uuid}`` names plus a commit protocol; no probe loop.
- Rename-based two-phase commit aligned to checkpoints
  (``RowOrcBucketingSink.java:153-213``) → for batch writes, the file
  output committer publishes files only on job success; for streaming
  see ``flink_orc_sink_spark.streaming.orc_sink``.

Scale notes: dynamic-partition writes shuffle-free by default (each
task writes every partition it sees). For very high-cardinality
partition columns pass ``repartition_by_partition_cols=True`` so each
partition's rows are clustered into few tasks — fewer, bigger ORC
files, which is what a 100 TB table wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "zstd",
    repartition_by_partition_cols: bool = False,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` to ``path`` as (optionally partitioned) ORC.

    ``partition_cols`` plays the reference ``Bucketer`` role; pass a
    computed column (e.g. ``df.withColumn("dt", F.to_date("ts"))``)
    for date bucketing like the reference demo's Hive layout
    (``OrcSinkTest.java:23``).
    """
    if repartition_by_partition_cols and partition_cols:
        df = df.repartition(*partition_cols)
    writer = df.write.mode(mode).format("orc").option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC back (vectorized reader; partition columns recovered
    from the Hive-style directory layout)."""
    return spark.read.orc(path)


def write_orc_bucketed(
    df: DataFrame,
    name: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (hash-clustered) ORC table into the session
    catalog — the co-located-join layout.

    Two tables bucketed on the same key with the same bucket count
    join with NO exchange on either side (the scan itself satisfies
    the join's distribution requirement) — at 100 TB that removes the
    single largest cost of repeated fact-to-fact joins. Bucketing
    needs catalog metadata, hence ``saveAsTable`` rather than a bare
    path; ``sort_by`` additionally orders within buckets so the join
    degrades to a merge without sorting.
    """
    writer = df.write.format("orc").mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(name)
