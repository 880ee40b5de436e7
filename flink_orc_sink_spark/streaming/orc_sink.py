"""Exactly-once streaming ORC sink + watermark observability.

The reference's core capability (``RowOrcBucketingSink.java``) is a
hand-rolled three-state file lifecycle — in-process → in-pending →
committed, renamed at checkpoint boundaries (``README.md:7-22``,
``snapshotState`` at ``RowOrcBucketingSink.java:153-170``,
``notifyCheckpointComplete`` at ``:172-177``). Spark's Structured
Streaming file sink provides the same contract natively and strictly
stronger:

- **Epoch = micro-batch**: each trigger is one transactional unit,
  like the reference's checkpoint interval (``OrcSinkTest.java:20``).
- **Commit = manifest, not rename**: completed files are recorded in
  ``_spark_metadata``; readers trust only the manifest, so partially
  written or orphaned files are invisible without any rename race —
  the improvement over the reference's rename protocol, and it also
  survives the cancel-with-savepoint hole ``README.md:4`` concedes.
- **Recovery = source replay + idempotent batch ids** from
  ``checkpointLocation`` — the reference instead rebuilds empty state
  and leans on Kafka offset rewind (``README.md:19-22``).

Watermarks: the reference tracks ``context.currentWatermark()`` per
bucket and publishes a gauge shifted −8h for UTC+8 display
(``RowOrcBucketingSink.java:86,114,196-198``). Spark equivalents: the
``withWatermark`` operator on the stream plus
``StreamingQueryProgress["eventTime"]["watermark"]``; the
:class:`WatermarkTracker` listener below reports UTC, un-shifted
(SURVEY.md §2.3 T4 "report UTC").
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery, StreamingQueryListener

# State probes route through the shared Hadoop-FS helpers in
# ``session.py`` (one definition for sinks + index retention): replay
# markers and state-existence checks must resolve against the SAME
# filesystem Spark writes to — driver-local ``os.path`` probes would
# silently answer False for an ``hdfs://``/``s3a://`` state_path (the
# 100 TB shape) and recompute deltas against a phantom 'absent' state.
from flink_orc_sink_spark.lease import process_owner, state_lease
from flink_orc_sink_spark.session import (
    fs_exists as _hfs_exists,
    fs_list_names as _hfs_list_names,
    fs_mkdirs as _hfs_mkdirs,
    fs_rmtree as _hfs_rmtree,
    local_df,
    orc_data_files_exist as _orc_files_exist,
    release_local_checkpoint,
)


def stream_write_orc(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_cols: list[str] | None = None,
    trigger: dict | None = None,
    compression: str = "zstd",
    query_name: str | None = None,
) -> StreamingQuery:
    """Start the exactly-once streaming ORC sink.

    Equivalent of constructing + ``addSink``-ing the reference's
    ``RowOrcBucketingSink`` (``OrcSinkTest.java:29,37``):

    - ``path`` ↔ the sink base path (``RowOrcBucketingSink.java:76``)
    - ``partition_cols`` ↔ the ``Bucketer`` (``:41,111``) — pass
      computed columns (e.g. a ``to_date(ts)`` day column) for the
      date-bucketed Hive layout the reference demo targets.
    - ``checkpoint`` ↔ ``env.enableCheckpointing`` + state backend
      (``OrcSinkTest.java:20``); commit cadence = trigger interval.
    - ``trigger`` e.g. ``{"processingTime": "30 seconds"}`` for the
      demo's 30 s epoch, or ``{"availableNow": True}`` for drain-and-
      stop (deterministic tests, backfills).

    At scale: one writer task per partition of the final stage; use
    ``df.repartition(cols)`` upstream to control file count per epoch
    (few big ORC files beat many small ones at 100 TB).
    """
    writer = (
        df.writeStream.format("orc")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .option("compression", compression)
        .outputMode("append")
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if query_name:
        writer = writer.queryName(query_name)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def stream_write_orc_foreachbatch(
    df: DataFrame,
    path: str,
    checkpoint: str,
    trigger: dict | None = None,
    compression: str = "zstd",
) -> StreamingQuery:
    """The CUSTOM-SINK escape hatch: ``foreachBatch`` with
    batch-id-keyed idempotent writes — the pattern every warehouse
    sink without a native streaming writer uses (JDBC upserts, Delta
    MERGE, multi-table fan-out).

    Exactly-once here comes from idempotence, not a manifest: each
    micro-batch lands in its own ``batch_id=<id>`` partition via
    DYNAMIC partition overwrite, so a crash-replayed batch rewrites
    the same partition instead of duplicating rows (the checkpoint
    guarantees replay delivers the same batch id with the same data).
    This is the second exactly-once mechanism next to the manifest
    file sink (``stream_write_orc``) — the reference's rename protocol
    plays the same role for its ``part-{subtask}-{seq}`` files.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .option("compression", compression)
            .partitionBy("batch_id")
            .orc(path)
        )

    writer = df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def stream_fanout_orc(
    df: DataFrame,
    outputs: dict,
    commit_path: str,
    checkpoint: str,
    trigger: dict | None = None,
    compression: str = "zstd",
) -> StreamingQuery:
    """ATOMIC MULTI-TABLE fan-out: one stream feeding several ORC
    tables (raw + per-source stats, accepted + audit, …) with a
    SINGLE commit point per micro-batch — the reference's 2-phase
    rename protocol (`RowOrcBucketingSink.java:153-213` commits all
    of a checkpoint's buckets together) generalized to N tables.

    ``outputs`` maps table name → ``(path, transform)``; each
    micro-batch writes ``transform(batch)`` (identity when ``None``)
    into every table's ``batch_id=<id>`` partition via dynamic
    overwrite, THEN appends one marker row for the batch under
    ``commit_path`` — strictly after every table landed.
    ``read_committed_fanout`` filters any table to marked batches, so
    a crash between table writes leaves the half-written batch
    invisible in ALL tables (no cross-table torn snapshot — the
    failure mode per-table idempotence alone cannot exclude), and the
    checkpoint replay rewrites the same partitions (transforms must
    be deterministic) and only then re-marks. A replay that crashed
    after the tables but before/after the marker can at worst
    duplicate MARKER ROWS, which read-time ``distinct`` absorbs —
    result rows are never duplicated.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        staged = batch_df.localCheckpoint(eager=True)
        try:
            for _name, (path, transform) in outputs.items():
                out = transform(staged) if transform is not None else staged
                (
                    out.withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .option("compression", compression)
                    .partitionBy("batch_id")
                    .orc(path)
                )
            # the commit point: one tiny append AFTER all tables —
            # the only write whose visibility readers trust
            (
                local_df(
                    staged.sparkSession, [(batch_id,)], "batch_id long"
                )
                .coalesce(1)
                .write.mode("append")
                .parquet(commit_path)
            )
        finally:
            release_local_checkpoint(staged)

    writer = df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def read_committed_fanout(
    spark: SparkSession, table_path: str, commit_path: str
) -> DataFrame:
    """Read a fan-out table at the transaction boundary: only batches
    whose commit marker exists — every table filtered this way shows
    the SAME set of batches (all-or-nothing across the fan-out). The
    marker set is tiny (one row per micro-batch); broadcast semi
    join, so the filter costs nothing against the table scan."""
    committed = spark.read.parquet(commit_path).select("batch_id").distinct()
    return spark.read.orc(table_path).join(
        F.broadcast(committed), "batch_id", "left_semi"
    )


def stream_cdc_apply_orc(
    changes: DataFrame,
    state_path: str,
    checkpoint: str,
    key_col: str,
    order_cols: list[str],
    n_key_partitions: int = 16,
    trigger: dict | None = None,
    compression: str = "zstd",
) -> StreamingQuery:
    """Streaming CDC MERGE into a keyed ORC state table — the
    ``foreachBatch`` upsert every warehouse runs on a change feed when
    the sink has no native MERGE. Each micro-batch:

    1. hashes keys into ``n_key_partitions`` buckets (``kp``),
    2. reads ONLY the state partitions the batch touches (partition
       pruning on ``kp`` — a batch touching 3 of 10 000 key buckets
       reads 3),
    3. keeps the latest row per key across state ∪ batch (strict
       total order via ``order_cols`` — latest-wins is idempotent, so
       a crash-replayed batch converges to the same table), and
    4. rewrites only the touched partitions (dynamic partition
       overwrite).

    State size is O(live keys), never O(stream length); per-batch I/O
    is O(touched partitions). Deletes stay in the table as tombstone
    rows (``op='D'``) so re-inserts win later batches; readers filter
    them. Production engines get snapshot isolation from a table
    format (Delta/Iceberg MERGE); here the merged frame is eagerly
    localCheckpoint-ed before the overwrite so the read and the
    rewrite of the same files never overlap.
    Each micro-batch holds the ``state_path`` single-writer lease
    (round 8): the merge's pruned read + dynamic overwrite is the same
    read-modify-write cycle the retract sinks protect, so an external
    writer on the state dir fails loudly instead of interleaving.
    """
    order_desc = [F.col(c).desc() for c in order_cols]
    lease_owner = f"sink:{checkpoint}"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        with state_lease(batch_df.sparkSession, state_path, lease_owner):
            _apply(batch_df, batch_id)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        spark = batch_df.sparkSession
        ch = batch_df.withColumn(
            "kp", F.pmod(F.hash(F.col(key_col)), F.lit(n_key_partitions))
        )
        if _orc_files_exist(spark, state_path):
            kps = [r.kp for r in ch.select("kp").distinct().collect()]
            cur = spark.read.orc(state_path).filter(F.col("kp").isin(kps))
            allrows = cur.unionByName(ch)
        else:
            allrows = ch
        w = Window.partitionBy(key_col).orderBy(*order_desc)
        merged = (
            allrows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .localCheckpoint(eager=True)
        )
        try:
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .option("compression", compression)
                .partitionBy("kp")
                .orc(state_path)
            )
        finally:
            # Checkpointed blocks otherwise linger until the JVM
            # ContextCleaner notices — one leaked block per trigger
            # is unbounded executor storage growth on a long-running
            # stream. Release as soon as the overwrite lands (same
            # hygiene as stream_quarantine_orc below).
            release_local_checkpoint(merged)

    writer = changes.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def stream_scd2_apply_orc(
    changes: DataFrame,
    state_path: str,
    checkpoint: str,
    key_col: str,
    attr_col: str,
    ts_col: str,
    order_cols: list[str],
    n_key_partitions: int = 16,
    trigger: dict | None = None,
    compression: str = "zstd",
) -> StreamingQuery:
    """Streaming SCD TYPE-2 dimension maintenance — the history-table
    twin of :func:`stream_cdc_apply_orc` (which keeps latest-per-key;
    this keeps every attribute interval with validity bounds). Each
    micro-batch:

    1. hashes keys into ``n_key_partitions`` buckets (``kp``) and
       reads ONLY the touched buckets of the ``changes/`` archive,
    2. merges batch ∪ archive by FULL-ROW DISTINCT — the change
       archive is the warehouse's CDC source-of-truth table, and
       row-identity dedup is what makes a crash-replayed batch an
       exact no-op,
    3. rebuilds the SCD2 chain (collapse consecutive repeats →
       version / effective_from / effective_to / is_current) for the
       touched buckets only, via ``operators/relational.py::
       scd2_history`` — per-key windows inside a bucket-bounded
       frame, and
    4. dynamically overwrites the touched ``kp`` partitions of BOTH
       ``changes/`` and ``history/``.

    Keeping raw change rows (not just collapsed intervals) is what
    buys OUT-OF-ORDER exactness: a late row can split or merge
    existing intervals, and the per-bucket chain rebuild from raw
    rows reproduces exactly what a batch SCD2 over the full feed
    would emit — regardless of arrival order (the registered query's
    oracle feeds hash-scattered batches and must hash-match the
    one-shot ``SCD2_SQL``). An interval-only state cannot do this:
    consecutive-repeat rows it discarded may become version starts
    once a late row lands between them.

    100 TB shape: per-batch I/O is O(touched buckets), never
    O(history); state is the change archive a warehouse already
    keeps. The merged frame is localCheckpoint-ed before the
    overwrite (read and rewrite of the same files never overlap) and
    released as soon as both writes land.

    Each micro-batch holds the ``state_path`` single-writer lease
    (round 8), like every other read-modify-write state sink."""
    from flink_orc_sink_spark.operators.relational import scd2_history

    lease_owner = f"sink:{checkpoint}"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        with state_lease(batch_df.sparkSession, state_path, lease_owner):
            _apply(batch_df, batch_id)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ch = batch_df.withColumn(
            "kp", F.pmod(F.hash(F.col(key_col)), F.lit(n_key_partitions))
        )
        changes_path = os.path.join(state_path, "changes")
        if _orc_files_exist(spark, changes_path):
            kps = [r.kp for r in ch.select("kp").distinct().collect()]
            cur = spark.read.orc(changes_path).filter(F.col("kp").isin(kps))
            allrows = cur.unionByName(ch)
        else:
            allrows = ch
        merged = allrows.distinct().localCheckpoint(eager=True)
        try:
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .option("compression", compression)
                .partitionBy("kp")
                .orc(changes_path)
            )
            (
                scd2_history(
                    merged, [key_col], attr_col, ts_col, order_cols
                )
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .option("compression", compression)
                .partitionBy("kp")
                .orc(os.path.join(state_path, "history"))
            )
        finally:
            release_local_checkpoint(merged)

    writer = changes.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def stream_retract_agg_orc(
    changes: DataFrame,
    state_path: str,
    checkpoint: str,
    key_col: str,
    group_col: str,
    val_col: str,
    order_cols: list[str],
    n_key_partitions: int = 16,
    trigger: dict | None = None,
    compression: str = "zstd",
    cleanup_every_n_batches: int | None = None,
    horizon_fn=None,
) -> StreamingQuery:
    """RETRACTION-correct streaming aggregation over a CDC feed — the
    Flink "dynamic table → retract stream" pattern (the ecosystem the
    reference sink serves) on the micro-batch runtime: maintain
    per-group SUM/COUNT of each key's LATEST value while updates
    retract the key's previous contribution (including moving it
    between groups) and delete tombstones retract it entirely.

    The scale contract is ADDITIVITY — per batch:

    1. merge latest-per-key for the touched key-buckets exactly as
       :func:`stream_cdc_apply_orc` (partition-pruned read, dynamic
       overwrite),
    2. emit per-group DELTA rows = (new contribution − old
       contribution) for the batch's keys only: +`(val, 1)` into the
       key's new group, −`(val, 1)` out of its old one. No group is
       ever rescanned — a group's members never need to be
       co-located, which is what makes this O(batch) instead of the
       O(group) reaggregation a naive "recompute touched groups"
       design pays (a hot group would otherwise make every batch a
       full-group scan),
    3. land the deltas in a ``batch_id`` result partition.

    The aggregate readback (:func:`read_retract_agg`) sums the delta
    partitions — O(batches × groups) rows, corpus-size-independent.

    Crash-replay: deltas must be computed against the PRE-batch
    state, so they are written (and a marker committed) BEFORE the
    state overwrite. A replay with the marker present skips the delta
    step and redoes only the idempotent state merge; a replay without
    it recomputes identical deltas from the untouched state. Every
    crash window is covered: before the marker the state is
    unmodified, after it the delta partition is final.

    Tombstone retention: ``op='D'`` rows are KEPT in the key state —
    they are what masks a replayed pre-delete update (an old ``U``
    with a lower seq re-delivered by a feed replay would otherwise
    win the latest-per-key merge and resurrect the key). They may
    only be aged out once the source's replay horizon has passed the
    delete's seq (Flink's state-TTL contract; Kafka retention is the
    usual horizon). For a delete-heavy feed this means the key state
    grows with every key ever deleted between cleanups — run
    :func:`cleanup_retract_state` (drop ``D`` rows with
    ``seq < horizon``, a partition-parallel filter+overwrite) on the
    compaction cadence, exactly like the index families'
    ``compact_index``. The recorded horizon is also enforced on
    ingest: each batch drops arriving rows older than it, so even a
    source that replays PAST its declared horizon cannot resurrect a
    cleaned-up key.

    With ``cleanup_every_n_batches`` + ``horizon_fn`` set, that
    state-TTL pass runs ON the sink's own cadence: every Nth batch,
    after the batch's state lands and still under the batch's
    single-writer lease, :func:`cleanup_retract_state` is invoked at
    ``horizon_fn()`` — no external cron, no second writer to schedule.

    Every micro-batch runs under the ``state_path`` single-writer
    LEASE (``lease.py``), owner-keyed to this checkpoint: a restarted
    stream reclaims instantly, while an external maintenance op
    holding the lease makes the batch fail LOUDLY instead of
    interleaving with a partition overwrite."""
    order_desc = [F.col(c).desc() for c in order_cols]
    lease_owner = f"sink:{checkpoint}"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        with state_lease(spark, state_path, lease_owner):
            _apply(batch_df, batch_id)
            if (
                cleanup_every_n_batches
                and horizon_fn is not None
                and (batch_id + 1) % cleanup_every_n_batches == 0
            ):
                cleanup_retract_state(
                    spark,
                    state_path,
                    int(horizon_fn()),
                    order_cols,
                    compression,
                    lease=False,  # already held by this batch
                )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        spark = batch_df.sparkSession
        state_dir = os.path.join(state_path, "state")
        horizon = _read_replay_horizon(spark, state_path)
        if horizon is not None:
            # rows older than the cleanup horizon can only be replays
            # of already-retired history; admitting one could win the
            # latest-per-key merge against a cleaned-up tombstone.
            # NULL-safe: cleanup_retract_state deliberately KEEPS
            # NULL-order rows (coalesce'd negation), so the guard must
            # admit them too — a bare >= would silently drop them
            batch_df = batch_df.filter(
                F.coalesce(
                    F.col(order_cols[0]) >= F.lit(horizon), F.lit(True)
                )
            )
        ch = batch_df.withColumn(
            "kp", F.pmod(F.hash(F.col(key_col)), F.lit(n_key_partitions))
        )
        cur = None
        if _orc_files_exist(spark, state_dir):
            kps = [r.kp for r in ch.select("kp").distinct().collect()]
            cur = spark.read.orc(state_dir).filter(F.col("kp").isin(kps))
        allrows = cur.unionByName(ch) if cur is not None else ch
        w = Window.partitionBy(key_col).orderBy(*order_desc)
        merged = (
            allrows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .localCheckpoint(eager=True)
        )
        try:
            marker = os.path.join(
                state_path, "applied", f"batch_{batch_id}"
            )
            if not _hfs_exists(spark, marker):
                bkeys = ch.select(key_col).distinct()

                def contrib(df: DataFrame, sign: int) -> DataFrame:
                    live = F.col("op") == "U"
                    return df.join(bkeys, key_col, "left_semi").select(
                        F.col(group_col).alias("grp"),
                        F.when(live, F.col(val_col) * sign)
                        .otherwise(F.lit(0))
                        .cast("long")
                        .alias("d_sum"),
                        F.when(live, F.lit(sign))
                        .otherwise(F.lit(0))
                        .cast("long")
                        .alias("d_count"),
                    )

                deltas = contrib(merged, 1)
                if cur is not None:
                    deltas = deltas.unionByName(contrib(cur, -1))
                (
                    deltas.groupBy("grp")
                    .agg(
                        F.sum("d_sum").alias("d_sum"),
                        F.sum("d_count").alias("d_count"),
                    )
                    .withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .option("compression", compression)
                    .partitionBy("batch_id")
                    .orc(os.path.join(state_path, "agg_deltas"))
                )
                _hfs_mkdirs(spark, marker)
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .option("compression", compression)
                .partitionBy("kp")
                .orc(state_dir)
            )
        finally:
            release_local_checkpoint(merged)

    writer = changes.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def read_retract_agg(spark: SparkSession, state_path: str) -> DataFrame:
    """Current per-group aggregate of a :func:`stream_retract_agg_orc`
    table: sum the additive delta partitions. Groups whose live-key
    count nets to zero (fully deleted or fully moved away) vanish,
    exactly as a from-scratch aggregate would omit them."""
    return (
        spark.read.orc(os.path.join(state_path, "agg_deltas"))
        .groupBy("grp")
        .agg(
            F.sum("d_sum").alias("sum_val"),
            F.sum("d_count").alias("n_keys"),
        )
        .filter(F.col("n_keys") > 0)
    )


def _record_replay_horizon(
    spark: SparkSession, state_path: str, horizon: int
) -> None:
    """Record ``horizon`` as a marker dir and prune the markers it
    supersedes (only the max matters — monotone — and every
    micro-batch lists this directory, so letting one marker per
    cleanup accumulate forever would grow per-batch list cost with
    deployment age)."""
    hdir = os.path.join(state_path, "replay_horizon")
    _hfs_mkdirs(spark, os.path.join(hdir, f"h={horizon}"))
    for name in _hfs_list_names(spark, hdir):
        if name.startswith("h=") and int(name[2:]) < horizon:
            _hfs_rmtree(spark, os.path.join(hdir, name))


def _read_replay_horizon(spark: SparkSession, state_path: str):
    """Current replay horizon of a retract state dir, or None. The
    horizon is encoded in MARKER DIRECTORY NAMES (``replay_horizon/
    h=<value>``) so recording it is a single atomic ``mkdirs`` on any
    Hadoop filesystem — no read-modify-write file, no partial-content
    crash window; reading it back is one ``listStatus``. Monotone:
    the max marker wins."""
    names = _hfs_list_names(
        spark, os.path.join(state_path, "replay_horizon")
    )
    vals = [int(n[2:]) for n in names if n.startswith("h=")]
    return max(vals) if vals else None


def cleanup_retract_state(
    spark: SparkSession,
    state_path: str,
    horizon: int,
    order_cols: list[str] | tuple = ("seq",),
    compression: str = "zstd",
    lease: bool = True,
) -> dict:
    """Horizon-bounded tombstone cleanup for a
    :func:`stream_retract_agg_orc` state dir — the state-TTL pass the
    retention contract in that docstring promises: physically drop
    ``op='D'`` rows whose ``order_cols[0]`` is below ``horizon``, the
    caller's guarantee that the source can no longer replay anything
    older (Kafka retention is the usual horizon). Without this, a
    delete-heavy feed grows the key state with every key ever deleted.

    Crash-safe ordering: the horizon marker is recorded BEFORE the
    rewrite. A crash in between leaves the tombstones in place
    (harmless — masking still works, the next cleanup re-drops them);
    the reverse order would open a window where the tombstone is gone
    but below-horizon replays are still admitted. The sink enforces
    the recorded horizon on every subsequent batch, so a pre-delete
    update replayed after cleanup is dropped at ingest instead of
    resurrecting its key.

    Partition-parallel and pruned: only the ``kp`` buckets that
    actually hold expired tombstones are rewritten (dynamic partition
    overwrite; a bucket left EMPTY by the rewrite has its directory
    dropped — the ``_overwrite_buckets`` contract). Cost is O(touched
    buckets × bucket size), never a full-state rewrite when deletes
    cluster. SINGLE-WRITER like ``compact_index`` — and since round 8
    ENFORCED: the run takes the ``state_path`` lease (``lease.py``)
    and fails loudly with ``LeaseHeldError`` if the sink (or another
    maintenance op) holds it. Schedule between triggers, while the
    stream is stopped — or let the sink run it itself on its own
    cadence (``cleanup_every_n_batches``), which passes ``lease=False``
    because the batch already holds the lease.

    Pass the SAME ``order_cols`` the sink was started with: the sink
    enforces the recorded horizon against ``order_cols[0]`` on every
    batch, so a cleanup keyed to any other column would record the
    horizon in one column's units and enforce it in another — the
    replayed-row guard would silently not guard.

    Returns ``{"tombstones_dropped": n, "buckets_rewritten": k}``.
    """
    if isinstance(order_cols, str):  # tolerate the scalar form
        order_cols = (order_cols,)
    if lease:
        with state_lease(
            spark,
            state_path,
            process_owner("maintenance:cleanup-retract"),
        ):
            return cleanup_retract_state(
                spark,
                state_path,
                horizon,
                order_cols,
                compression,
                lease=False,
            )
    # coerce FIRST so the drop predicate and the recorded marker use
    # the identical value — a fractional horizon would otherwise drop
    # tombstones up to h while the ingest guard admits [int(h), h)
    horizon = int(horizon)
    state_dir = os.path.join(state_path, "state")
    _record_replay_horizon(spark, state_path, horizon)
    if not _orc_files_exist(spark, state_dir):
        return {"tombstones_dropped": 0, "buckets_rewritten": 0}
    st = spark.read.orc(state_dir)
    expired = (F.col("op") == "D") & (
        F.col(order_cols[0]) < F.lit(horizon)
    )
    # one scan yields both the touched buckets and the drop count
    # (bounded by n_key_partitions rows)
    per_bucket = (
        st.filter(expired).groupBy("kp").count().collect()
    )
    if not per_bucket:
        return {"tombstones_dropped": 0, "buckets_rewritten": 0}
    touched = [(r.kp,) for r in per_bucket]
    n_doomed = sum(r["count"] for r in per_bucket)
    kps = [kp for (kp,) in touched]
    # null-safe negation: ~NULL is NULL and would silently DELETE any
    # row with a NULL op/order value from the rewritten buckets
    keep = (
        st.filter(F.col("kp").isin(kps))
        .filter(~F.coalesce(expired, F.lit(False)))
        .localCheckpoint(eager=True)
    )  # materialize BEFORE overwriting the directory being read
    try:
        _overwrite_buckets(keep, state_dir, ["kp"], touched, compression)
    finally:
        release_local_checkpoint(keep)
    return {
        "tombstones_dropped": n_doomed,
        "buckets_rewritten": len(touched),
    }


def cleanup_retract_join_state(
    spark: SparkSession,
    state_path: str,
    horizon: int,
    compression: str = "zstd",
    lease: bool = True,
) -> dict:
    """:func:`cleanup_retract_state`'s twin for a
    :func:`stream_retract_join_orc` state dir. Only the PK layer
    retains ``op='D'`` tombstones (the jk layer and the view hold
    live images only), so this drops expired ``D`` rows from the
    ``(side, kp)``-partitioned pk store — same crash-safe ordering
    (horizon marker recorded FIRST, then a partition-pruned
    rewrite), same ingest enforcement (the sink drops arriving rows
    with ``seq`` below the recorded horizon), same ENFORCED
    single-writer lease as the agg twin (``lease=False`` only from a
    caller already holding the ``state_path`` lease — the sink's own
    cadence does).

    Returns ``{"tombstones_dropped": n, "buckets_rewritten": k}``.
    """
    if lease:
        with state_lease(
            spark,
            state_path,
            process_owner("maintenance:cleanup-retract"),
        ):
            return cleanup_retract_join_state(
                spark, state_path, horizon, compression, lease=False
            )
    horizon = int(horizon)  # same coercion contract as the agg twin
    pk_dir = os.path.join(state_path, "pk_state")
    _record_replay_horizon(spark, state_path, horizon)
    if not _orc_files_exist(spark, pk_dir):
        return {"tombstones_dropped": 0, "buckets_rewritten": 0}
    st = spark.read.orc(pk_dir)
    expired = (F.col("op") == "D") & (F.col("seq") < F.lit(horizon))
    # one scan yields both the touched (side, kp) pairs and the drop
    # count (bounded by 2 x n_key_partitions rows)
    per_bucket = (
        st.filter(expired).groupBy("side", "kp").count().collect()
    )
    if not per_bucket:
        return {"tombstones_dropped": 0, "buckets_rewritten": 0}
    touched = [(r.side, r.kp) for r in per_bucket]
    n_doomed = sum(r["count"] for r in per_bucket)
    keep = (
        st.filter(_pair_filter("kp", touched))
        .filter(~F.coalesce(expired, F.lit(False)))
        .localCheckpoint(eager=True)
    )
    try:
        _overwrite_buckets(
            keep, pk_dir, ["side", "kp"], touched, compression
        )
    finally:
        release_local_checkpoint(keep)
    return {
        "tombstones_dropped": n_doomed,
        "buckets_rewritten": len(touched),
    }


def _overwrite_buckets(
    df: DataFrame,
    path: str,
    part_cols: list[str],
    touched: list[tuple],
    compression: str,
) -> None:
    """Overwrite exactly the ``touched`` partitions of ``path`` with
    ``df`` (whose ``part_cols`` tuples are all in ``touched``).

    Dynamic partition overwrite only replaces partitions PRESENT in
    the frame — a touched bucket whose new content is EMPTY would
    silently keep its stale files. Finish the job by dropping the
    directories of touched-but-now-empty buckets (on a metastore
    table this is ``ALTER TABLE .. DROP PARTITION``; here a
    recursive Hadoop-FS delete, so remote state paths work). Both
    steps are idempotent, so a crash-replay that repeats them lands
    in the same state."""
    spark = df.sparkSession
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", compression)
        .partitionBy(*part_cols)
        .orc(path)
    )
    present = {
        tuple(r) for r in df.select(*part_cols).distinct().collect()
    }
    for vals in touched:
        if tuple(vals) not in present:
            sub = os.path.join(
                *(f"{c}={v}" for c, v in zip(part_cols, vals))
            )
            _hfs_rmtree(spark, os.path.join(path, sub))


def _pair_filter(bucket_col: str, pairs: list):
    """Exact ``(side, bucket)``-pair predicate (grouped per side into
    one ``isin``) — ONE definition shared by the retract-join sink's
    partition-pruned reads and the pk-layer tombstone cleanup."""
    by_side: dict = {}
    for s, b in pairs:
        by_side.setdefault(s, []).append(b)
    cond = F.lit(False)
    for s, bs in by_side.items():
        cond = cond | (
            (F.col("side") == s) & F.col(bucket_col).isin(bs)
        )
    return cond


def stream_retract_join_orc(
    changes: DataFrame,
    state_path: str,
    checkpoint: str,
    n_key_partitions: int = 16,
    n_join_buckets: int = 16,
    trigger: dict | None = None,
    compression: str = "zstd",
    agg_group_col: str | None = None,
    agg_val_col: str | None = None,
    how: str = "inner",
    cleanup_every_n_batches: int | None = None,
    horizon_fn=None,
) -> StreamingQuery:
    """RETRACTION-correct streaming JOIN over two CDC feeds — Flink's
    delta-join / incremental-view-maintenance pattern (dynamic table ⋈
    dynamic table → retract stream → upsert sink, the ecosystem the
    reference ORC sink serves, ``README.md:19-22``) on the micro-batch
    runtime. The maintained view is::

        SELECT l.*, r.*  FROM latest-live-L l JOIN latest-live-R r
        ON l.jk = r.jk

    where each side is a CDC feed of (pk, jk, seq, op) rows: latest
    ``seq`` per ``pk`` wins, ``op='D'`` is a delete tombstone, and —
    the hard case — an update may MOVE a row to a different join key,
    which must retract every joined row it produced under the OLD key.

    Input stream schema: ``side ('L'|'R'), pk, jk, seq, op,
    val (left payload), attr (right payload)``.

    Two-layer state, exactly the Flink shape:

    1. **pk layer** (one store partitioned ``(side, kp)``, ``kp =
       hash(pk) % n_key_partitions``): latest-per-pk merge over the
       touched buckets only (partition-pruned read, dynamic
       overwrite), from
       which the batch's RETRACTION stream is derived: for every pk in
       the batch, a ``retract`` row carrying the pk's PRE-batch live
       image (its OLD join key — the only place that information
       exists) and an ``add`` row carrying its post-batch live image.
    2. **jk layer** (one store partitioned ``(side, jb)``, ``jb =
       hash(jk) % n_join_buckets``): apply the retraction stream —
       remove every
       mentioned pk from the buckets its retract/add rows name, insert
       the add images — then re-join ONLY the touched ``jb`` buckets
       of the two sides and overwrite those partitions of the
       materialized view.

    With ``agg_group_col``/``agg_val_col`` set, the sink ALSO
    maintains an aggregate over the view — additive per-group deltas
    (agg of new bucket content − agg of old), marker-guarded like the
    retract stream and landed before the view overwrite; readback is
    :func:`read_retract_agg`. That completes the Flink pipeline
    CDC ⋈ CDC → retract stream → aggregate without ever rescanning a
    group.

    COST MODEL (measured, tools/scale_probe_retract_join.py):
    per-batch I/O = touched buckets × bucket size. Bucket count is
    the knob and must be provisioned like any partitioned table's
    layout — buckets sized to a constant byte target, so count grows
    with state. A batch whose keys cluster in few buckets (the
    production CDC shape: churn skews to recent/hot entities) then
    costs O(batch's key-neighborhood) regardless of total state —
    the probe holds wall-clock FLAT across a 20× state growth at
    fixed touched-bucket count. The degenerate case is honest too: a
    batch with ≥ bucket-count uniformly-random keys touches every
    bucket and pays a full merge-on-write pass — the same
    churn-vs-compaction-cadence trade every copy-on-write table
    format makes (batch it, or provision more buckets). No group of
    join-key partners is ever rescanned unless its bucket was
    touched, and a batch that moves a pk between join keys touches
    exactly its old and new buckets; the two-layer double-store is
    the textbook IVM space-for-locality trade (the pk layer alone
    cannot prune by jk).

    Tombstone retention mirrors :func:`stream_retract_agg_orc`: the
    pk layer keeps ``op='D'`` rows to mask below-horizon replays;
    age them out with :func:`cleanup_retract_join_state` once the
    source's replay horizon passes, after which the sink also drops
    below-horizon arrivals at ingest.

    Crash-replay: the retraction stream must be computed against the
    PRE-batch pk state, so it is persisted to a ``batch_id`` delta
    partition and a marker committed BEFORE the pk-state overwrite;
    every other step is an idempotent function of authoritative
    state (latest-wins pk merge; jk-layer apply removes the
    mentioned pks from the mentioned buckets and re-inserts their
    CURRENT latest images — a fixpoint; view recompute is pure), so
    a replayed batch — crash recovery on the same checkpoint, or
    even a full feed replay through a fresh checkpoint against
    populated state — converges to byte-identical state in every
    crash window.
    The registered ``stream_retract_join`` query feeds hash-scattered
    out-of-order batches and must hash-match a one-shot batch join —
    including resurrections (D then later U) and join-key moves.

    Lease + cadence: every micro-batch holds the ``state_path``
    single-writer lease (owner-keyed to the checkpoint — restart
    reclaims instantly, a concurrent maintenance op fails loudly),
    and with ``cleanup_every_n_batches`` + ``horizon_fn`` set the
    sink runs :func:`cleanup_retract_join_state` itself every Nth
    batch under that same lease."""
    lease_owner = f"sink:{checkpoint}"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        with state_lease(spark, state_path, lease_owner):
            _apply(batch_df, batch_id)
            if (
                cleanup_every_n_batches
                and horizon_fn is not None
                and (batch_id + 1) % cleanup_every_n_batches == 0
            ):
                cleanup_retract_join_state(
                    spark,
                    state_path,
                    int(horizon_fn()),
                    compression,
                    lease=False,  # already held by this batch
                )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        spark = batch_df.sparkSession
        deltas_root = os.path.join(state_path, "deltas")
        marker = os.path.join(state_path, "applied", f"batch_{batch_id}")
        w = Window.partitionBy("side", "pk").orderBy(
            F.col("seq").desc()
        )

        horizon = _read_replay_horizon(spark, state_path)
        if horizon is not None:
            # same ingest guard as the retract-agg sink: rows older
            # than the cleanup horizon are retired history whose
            # tombstones may already be gone — admitting one could
            # resurrect a cleaned-up pk. NULL-safe like the cleanup's
            # keep-predicate: NULL-seq rows stay admitted
            batch_df = batch_df.filter(
                F.coalesce(F.col("seq") >= F.lit(horizon), F.lit(True))
            )

        # --- pk layer: merge + derive the retraction stream ---
        # One store for both sides, partitioned (side, kp): one
        # pruned read, one merge, one write per batch. The merge and
        # state overwrite run on EVERY invocation (idempotent
        # latest-wins); the marker guards only the delta derivation,
        # which must see the PRE-batch state.
        ch = batch_df.withColumn(
            "kp",
            F.pmod(F.hash(F.col("pk")), F.lit(n_key_partitions)),
        )
        pk_dir = os.path.join(state_path, "pk_state")
        cur = None
        if _orc_files_exist(spark, pk_dir):
            kpairs = [
                tuple(r)
                for r in ch.select("side", "kp").distinct().collect()
            ]
            if kpairs:
                cur = spark.read.orc(pk_dir).filter(
                    _pair_filter("kp", kpairs)
                )
        allrows = ch if cur is None else cur.unionByName(ch)
        merged = (
            allrows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .localCheckpoint(eager=True)
        )
        try:
            live = F.col("op") == "U"
            if not _hfs_exists(spark, marker):
                bpks = ch.select("side", "pk").distinct()
                # pre-batch live image of every batch pk -> retract;
                # post-batch live image -> add (the retract stream a
                # downstream Flink-style consumer would subscribe to)
                deltas = (
                    merged.join(bpks, ["side", "pk"], "left_semi")
                    .filter(live)
                    .withColumn("kind", F.lit("add"))
                )
                if cur is not None:
                    deltas = deltas.unionByName(
                        cur.join(bpks, ["side", "pk"], "left_semi")
                        .filter(live)
                        .withColumn("kind", F.lit("retract"))
                    )
                (
                    deltas.drop("kp")
                    .withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .option("compression", compression)
                    .partitionBy("batch_id")
                    .orc(deltas_root)
                )
                _hfs_mkdirs(spark, marker)
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .option("compression", compression)
                .partitionBy("side", "kp")
                .orc(pk_dir)
            )

            # --- jk layer: apply the batch's stored retraction
            # stream. The stored rows supply WHICH (side, jb)
            # buckets and (side, pk) keys were touched — including
            # the old join key, which exists nowhere else after the
            # pk overwrite — but the IMAGES inserted are the pks'
            # CURRENT latest from ``merged``, restricted to touched
            # buckets. That makes the apply a fixpoint of the
            # authoritative state: replaying ANY batch (crash
            # recovery, or a full feed replay through a fresh
            # checkpoint) converges instead of resurrecting stale
            # images or double-removing moved keys.
            if not _orc_files_exist(spark, deltas_root):
                return  # empty batch: nothing retracted or added
            jb_of = F.pmod(F.hash(F.col("jk")), F.lit(n_join_buckets))
            d = (
                spark.read.orc(deltas_root)
                .filter(F.col("batch_id") == batch_id)
                .withColumn("jb", jb_of)
            )
            jk_dir = os.path.join(state_path, "jk_state")
            pairs = [
                tuple(r)
                for r in d.select("side", "jb").distinct().collect()
            ]
            if not pairs:
                return
            mentioned = d.select("side", "pk").distinct()
            adds = (
                merged.join(mentioned, ["side", "pk"], "left_semi")
                .filter(live)
                .withColumn("jb", jb_of)
                .filter(_pair_filter("jb", pairs))
                .select(
                    "side", "pk", "jk", "seq", "op", "val", "attr",
                    "jb",
                )
            )
            if _orc_files_exist(spark, jk_dir):
                kept = (
                    spark.read.orc(jk_dir)
                    .filter(_pair_filter("jb", pairs))
                    .join(mentioned, ["side", "pk"], "left_anti")
                )
                new_state = kept.unionByName(adds)
            else:
                new_state = adds
            new_state = new_state.localCheckpoint(eager=True)
            try:
                _overwrite_buckets(
                    new_state,
                    jk_dir,
                    ["side", "jb"],
                    pairs,
                    compression,
                )
            finally:
                release_local_checkpoint(new_state)
        finally:
            release_local_checkpoint(merged)

        # --- view recompute: both sides of every touched jb bucket ---
        touched = sorted({b for _, b in pairs})
        jstate = spark.read.orc(jk_dir).filter(
            F.col("jb").isin(touched)
        )
        lstate = jstate.filter(F.col("side") == "L").select(
            F.col("pk").alias("l_pk"),
            "jk",
            F.col("val").alias("l_val"),
            "jb",
        )
        rstate = jstate.filter(F.col("side") == "R").select(
            F.col("pk").alias("r_pk"),
            F.col("jk").alias("r_jk"),
            F.col("attr").alias("r_attr"),
            F.col("jb").alias("r_jb"),
        )
        # ``how="left"`` buys OUTER-join IVM — the textbook-hard case
        # (a newly-arriving right partner must RETRACT the left row's
        # null-extended image, a disappearing one must re-extend it)
        # — for free: the touched bucket is recomputed from both
        # sides' current state, so null-extension flips fall out of
        # the recompute instead of needing bookkeeping deltas.
        view = lstate.join(
            rstate,
            (lstate.jk == rstate.r_jk) & (lstate.jb == rstate.r_jb),
            how=how,
        ).select(
            "l_pk",
            lstate.jk.alias("jk"),
            "l_val",
            "r_pk",
            "r_attr",
            lstate.jb.alias("jb"),
        )
        view_dir = os.path.join(state_path, "view")
        # materialize once: the overwrite AND the present-partition
        # probe in _overwrite_buckets (and the agg deltas, when
        # enabled) would otherwise each re-run the bucket join
        view = view.localCheckpoint(eager=True)

        # --- optional maintained AGGREGATE over the view: per-group
        # additive deltas = agg(new bucket content) − agg(old bucket
        # content), bounded by the touched buckets — the full Flink
        # dynamic-table pipeline (CDC ⋈ CDC → retract stream → agg)
        # without ever rescanning a group. Deltas must see the
        # PRE-overwrite view, so they land (marker-guarded, like the
        # pk-layer retract stream) BEFORE the view overwrite; a
        # replayed batch with the marker present skips straight to
        # the idempotent overwrite.
        if agg_group_col is not None:
            marker2 = os.path.join(
                state_path, "agg_applied", f"batch_{batch_id}"
            )
            if not _hfs_exists(spark, marker2):

                def gd(df: DataFrame, sign: int) -> DataFrame:
                    return df.select(
                        F.col(agg_group_col).alias("grp"),
                        (
                            F.coalesce(F.col(agg_val_col), F.lit(0))
                            * sign
                        )
                        .cast("long")
                        .alias("d_sum"),
                        F.lit(sign).cast("long").alias("d_count"),
                    )

                dparts = gd(view, 1)
                if _orc_files_exist(spark, view_dir):
                    dparts = dparts.unionByName(
                        gd(
                            spark.read.orc(view_dir).filter(
                                F.col("jb").isin(touched)
                            ),
                            -1,
                        )
                    )
                (
                    dparts.groupBy("grp")
                    .agg(
                        F.sum("d_sum").alias("d_sum"),
                        F.sum("d_count").alias("d_count"),
                    )
                    .withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .option("compression", compression)
                    .partitionBy("batch_id")
                    .orc(os.path.join(state_path, "agg_deltas"))
                )
                _hfs_mkdirs(spark, marker2)

        try:
            _overwrite_buckets(
                view,
                view_dir,
                ["jb"],
                [(b,) for b in touched],
                compression,
            )
        finally:
            release_local_checkpoint(view)

    writer = changes.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def stream_quarantine_orc(
    df: DataFrame,
    valid_path: str,
    quarantine_path: str,
    checkpoint: str,
    expectation,
    trigger: dict | None = None,
    compression: str = "zstd",
) -> StreamingQuery:
    """STREAMING validated ingestion with a dead-letter path — the
    ``foreachBatch`` composition of ``write_orc_validated``'s
    contract with batch-id-keyed idempotent writes: per micro-batch,
    rows satisfying ``expectation`` land under ``valid_path``, the
    rest UNCHANGED under ``quarantine_path`` (inspectable,
    replayable), each in its own ``batch_id=<id>`` partition so a
    crash-replayed batch rewrites instead of duplicating — on BOTH
    sides. NULL-expectation rows quarantine rather than vanish. The
    production DLQ shape: a bad record must never poison the table,
    stall the stream, nor disappear.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        staged = batch_df.localCheckpoint(eager=True)  # split reads it twice
        try:
            for target, pred in (
                (valid_path, expectation),
                (quarantine_path, ~F.coalesce(expectation, F.lit(False))),
            ):
                (
                    staged.filter(pred)
                    .withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .option("compression", compression)
                    .partitionBy("batch_id")
                    .orc(target)
                )
        finally:
            # Checkpointed blocks otherwise linger until the JVM
            # ContextCleaner notices — on a long-running stream that
            # is unbounded executor storage growth, one batch per
            # trigger. Release them as soon as both writes land.
            release_local_checkpoint(staged)

    writer = df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def read_committed_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read back ONLY committed files.

    Spark's ORC reader honors the ``_spark_metadata`` manifest when
    present, so uncommitted/abandoned part files are never visible —
    the reader-side half of exactly-once (the reference relies on the
    leading-``_`` Hive convention instead, ``README.md:9-13``).
    """
    return spark.read.orc(path)


def stream_from_files(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Replayable file source for deterministic streaming tests
    (SURVEY.md §7.3: socket sources aren't replayable; file sources
    are the test-friendly stand-in with identical sink semantics)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def csv_parse(lines: DataFrame, schema_ddl: str = "x INT, y INT") -> DataFrame:
    """The reference demo's map operator (P1): CSV line → typed row.

    ``OrcSinkTest.java:32-37`` splits on ',' and parses two ints into
    ``Row.of(x, y)``; here it's a single ``from_csv`` over the
    ``value`` column — JVM-side, codegen-friendly, and it handles
    quoting/nulls the hand-split never did.
    """
    return lines.select(
        F.from_csv(F.col("value"), schema_ddl).alias("r")
    ).select("r.*")


def demo_socket_to_orc(
    spark: SparkSession,
    host: str,
    port: int,
    out_path: str,
    checkpoint: str,
    trigger_seconds: int = 30,
) -> StreamingQuery:
    """End-to-end parity with the reference demo (``OrcSinkTest.java:
    16-40``): socket text source → CSV parse → exactly-once ORC sink,
    30 s commit cadence. Kept as a demo — tests use the replayable
    file-source path instead (SURVEY.md §7.3)."""
    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    rows = csv_parse(lines)
    return stream_write_orc(
        rows,
        out_path,
        checkpoint,
        trigger=({"processingTime": f"{trigger_seconds} seconds"}),
        query_name="demo_socket_to_orc",
    )


class WatermarkTracker(StreamingQueryListener):
    """Watermark observability replacing the reference's per-bucket
    gauge (``watermarkPerOrcBucketing``, ``RowOrcBucketingSink.java:86,
    196-198``): records the event-time watermark from every progress
    event, in UTC (no −8h display hack — SURVEY.md §2.3 T4).

    Usage::

        tracker = WatermarkTracker()
        spark.streams.addListener(tracker)
        ... run query ...
        tracker.last_watermark  # ISO-8601 UTC string or None
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.last_watermark: str | None = None
        self.history: list[tuple[str, str]] = []  # (query_id, watermark)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        progress = event.progress
        wm = (progress.eventTime or {}).get("watermark")
        if wm:
            with self._lock:
                self.last_watermark = wm
                self.history.append((str(progress.id), wm))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
