"""Engine-surface queries: the ORC sink and Structured Streaming
runtime themselves, pushed through the driver's DuckDB oracle gate.

The reference's whole product is "stream → exactly-once ORC"
(`RowOrcBucketingSink.java`, `README.md:3`). The other query modules
check the *operator* surface; these two check the *engine* surface at
value level:

- ``orc_roundtrip_events``: every events row written through the ORC
  sink and read back must equal the source rows bit-for-bit (the
  batch half of S3/S4; the streaming half — checkpointed exactly-once
  — is the kill/restart pytest in ``tests/test_streaming_sink.py``).
- ``stream_tumbling_hourly``: the SAME tumbling-window aggregation the
  batch module runs, but executed by the Structured Streaming runtime
  (file source → ``window()`` agg → memory sink, ``availableNow``
  replay) — proving the streaming path produces the batch answer,
  which is the Dataflow-model property Spark promises and the
  reference approximates with checkpoint-aligned commits.
"""

from __future__ import annotations

import os
import tempfile
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_orc_sink_spark.queries.events import (
    SCD2_SQL,
    SLIDING_SQL,
    TUMBLING_SQL,
)
from flink_orc_sink_spark.queries.llm import BM25_SQL, CUT_DUP_SPANS_SQL
from flink_orc_sink_spark.session import local_df, release_local_checkpoint
from flink_orc_sink_spark.sources.catalog import normalize_events_ts, table
from flink_orc_sink_spark.sources.orc_sink import read_orc, write_orc


STREAM_STATE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8")
)


@contextmanager
def stream_partitions(spark: SparkSession, n: int | None = None):
    """Pin ``spark.sql.shuffle.partitions`` (= the stream's STATE
    partition count, captured at first checkpoint) for the duration of
    a stream start, then restore the batch setting.

    State-store overhead is per partition per operator per micro-batch
    (open + commit + snapshot), so a stream's partition count must be
    sized to its sustained throughput, NOT inherited from the batch
    shuffle default: these bounded local replays want 8 (32 wastes
    ~4x the commit work on near-empty stores — measured 12.2 s -> 3.3 s
    on the running-totals replay); a production 100 TB/day stream
    wants hundreds, chosen ONCE before the first checkpoint (the
    count is frozen into the checkpoint thereafter). Results are
    partition-count independent by the engine's determinism rules.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(n or STREAM_STATE_PARTITIONS)
    )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


_STREAM_SEQ = 0



def _drain_or_fail(q, secs: int, what: str) -> None:
    """``awaitTermination`` with LOUD failure: a silently partial
    drain would surface as a confusing oracle mismatch, and a
    still-running query would leak past its checkpoint tempdir and
    into later (exclusively-timed) bench queries. Shared by every
    bounded availableNow drain in this module."""
    if q.awaitTermination(secs):
        return
    try:
        q.stop()
        q.awaitTermination(30)
    except Exception:
        # a query that died with its own error between the timeout
        # and stop() must not mask the primary diagnostic below
        pass
    raise TimeoutError(f"{what} did not drain in {secs}s")


def _run_feed_stream(
    spark: SparkSession,
    feed: str,
    schema,
    on_batch,
    what: str,
    owner_cell: list | None = None,
    ckpt: str | None = None,
) -> None:
    """The shared harness of every index-ingest stream: one
    ``availableNow`` ``foreachBatch`` pass over a parquet feed
    directory, one file per trigger, loud on a stuck drain. Keeping
    it single-sourced keeps the replay contract (checkpointed batch
    ids driving per-batch markers inside ``on_batch``) from drifting
    between the four ingest queries.

    ``owner_cell``: pass a one-element list and the harness fills
    ``owner_cell[0]`` with the CHECKPOINT-DERIVED lease owner before
    the first trigger, demonstrating the owner rule the stateful
    sinks use (``lease.py`` rule 2): a PRODUCTION stream with a
    stable checkpoint reclaims its own orphan lease instantly after
    a crash-restart. In THESE bounded demo harnesses the checkpoint
    is a fresh tempdir per invocation (and the state dir is rebuilt
    from scratch), so the reclaim path isn't what protects reruns
    here — the rebuild is; the owner plumbing exists so the
    registered queries exercise the same call shape production code
    should use.

    ``ckpt``: an explicit, PERSISTENT checkpoint dir — pass it to
    resume the same stream across calls (the bench-only phase split of
    the forget lifecycle drains its add and control batches in
    separate timed calls over one source WAL). Default stays a fresh
    tempdir per invocation."""
    import contextlib

    if ckpt is None:
        ckpt_cm = tempfile.TemporaryDirectory(prefix="stream_feed_ckpt_")
    else:
        os.makedirs(ckpt, exist_ok=True)
        ckpt_cm = contextlib.nullcontext(ckpt)
    with ckpt_cm as ckpt_dir, stream_partitions(spark):
        if owner_cell is not None:
            owner_cell[0] = f"sink:{ckpt_dir}"
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
            .writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        _drain_or_fail(q, 180, what)


def orc_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → ORC (zstd, vectorized writer) → read back, unchanged.

    The oracle is simply ``SELECT * FROM events``: a value-hash match
    means the sink round-trips every type exactly — int64 keys, µs
    timestamps, strings, doubles — through the on-disk format. Scale
    shape: one pass, no shuffle; the write parallelizes per input
    partition exactly like the reference's per-subtask writers."""
    e = table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_orc_roundtrip_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    write_orc(e, out)
    return read_orc(spark, out).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


ORC_ROUNDTRIP_SQL = """
SELECT event_id, ts, user_id, event_type, value, props FROM events
"""


def orc_partition_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION-LEVEL UPSERT at value level: events written as a
    date-partitioned ORC table, then a correction batch (every value
    doubled for the latest date) upserted via dynamic partition
    overwrite — only the touched partition is rewritten
    (``sources/orc_sink.py::upsert_orc_partitions``; untouched-
    partition preservation is separately pytest-asserted by mtime in
    tests/test_maintenance.py). The oracle applies the correction
    relationally, so a hash match proves the upsert replaced exactly
    the right rows and carried everything else over — the backfill/
    correction shape every warehouse table needs at 100 TB, where
    rewriting the whole table for one bad day is not an option."""
    from flink_orc_sink_spark.sources.orc_sink import upsert_orc_partitions

    e = table(spark, sf_dir, "events").withColumn("dt", F.to_date("ts"))
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_orc_upsert_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    write_orc(e, out, partition_cols=["dt"])
    # Bounded driver-side read by design: ONE scalar (the latest date).
    max_dt = e.agg(F.max("dt")).collect()[0][0]
    corrections = e.filter(F.col("dt") == F.lit(max_dt)).withColumn(
        "value", F.col("value") * 2
    )
    upsert_orc_partitions(
        spark, out, corrections, key_cols=["event_id"], partition_cols=["dt"]
    )
    return read_orc(spark, out).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


ORC_UPSERT_SQL = """
SELECT event_id, ts, user_id, event_type,
  CASE WHEN CAST(ts AS DATE) = (SELECT MAX(CAST(ts AS DATE)) FROM events)
       THEN value * 2 ELSE value END AS value,
  props
FROM events
"""


def orc_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMALL-FILE COMPACTION at value level: events deliberately
    written as 64 fragment files (what a streaming sink leaves behind
    — one file per task per epoch), then compacted to ~target-size
    files with ``sources/orc_sink.py::compact_orc`` (size-derived file
    count, atomic directory swap), then read back. The oracle is
    ``SELECT * FROM events``: a value-hash match proves the
    maintenance job is loss-free and dup-free, and the query itself
    asserts the file count actually shrank — the property that keeps
    a 100 TB streaming table readable (NameNode/manifest pressure and
    per-file open cost scale with file count, not bytes)."""
    import glob
    import shutil

    from flink_orc_sink_spark.sources.orc_sink import compact_orc

    e = table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_orc_compact_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(out, ignore_errors=True)
    e.repartition(64).write.format("orc").option(
        "compression", "zstd"
    ).save(out)

    def data_files(p):
        return [
            f
            for f in glob.glob(os.path.join(p, "*.orc"))
            if not os.path.basename(f).startswith(("_", "."))
        ]

    before = len(data_files(out))
    compact_orc(spark, out, target_file_mb=256)
    after = len(data_files(out))
    if after >= before:
        raise ValueError(
            f"compaction did not reduce file count: {before} -> {after}"
        )
    return read_orc(spark, out).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


ORC_COMPACT_SQL = """
SELECT event_id, ts, user_id, event_type, value, props FROM events
"""


def orc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL at value level: events committed as snapshot v1,
    then a corrupting overwrite (every value doubled) committed as
    v2 INTO THE SAME TREE — and the query reads **as of v1**. The
    oracle is plain ``SELECT * FROM events``: a hash match proves the
    manifest pins exactly the v1 file set (v2's files sit adjacent on
    disk and MUST stay invisible). Versioned manifests + immutable
    data files are the miniature of the Delta/Iceberg snapshot
    contract (``sources/orc_sink.py::snapshot_write``); v2
    readability and orphan invisibility are pytest-asserted in
    tests/test_maintenance.py."""
    import shutil

    from flink_orc_sink_spark.sources.orc_sink import (
        snapshot_read,
        snapshot_write,
    )

    e = table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_orc_snap_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(out, ignore_errors=True)
    v1 = snapshot_write(e, out, mode="append")
    snapshot_write(
        e.withColumn("value", F.col("value") * 2), out, mode="overwrite"
    )
    return snapshot_read(spark, out, version=v1).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def orc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED between snapshots at value level: events
    committed as v1, then v2 committed with deletes (event_id % 5),
    updates (+1.0 to value where event_id % 3, deletes win on
    overlap) and synthetic inserts (% 11, shifted ids) — and the
    query emits ``snapshot_diff(v1, v2)``: one row per changed key,
    classified insert/update/delete, new-side values for
    insert/update, old-side for delete, unchanged keys absent. The
    oracle rebuilds both versions from ``events`` and full-outer
    diffs them in SQL, so a hash match proves the manifest-driven
    diff (``sources/orc_sink.py::snapshot_diff``) reproduces the
    logical table delta exactly. The 100 TB lever — append-only diffs
    prune the ``from`` side to zero files off the manifests alone —
    is pytest-asserted on inputFiles in tests/test_maintenance.py."""
    import shutil

    from flink_orc_sink_spark.sources.orc_sink import (
        snapshot_diff,
        snapshot_write,
    )

    e = table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1e6 + 0.5).cast("long").alias("value_micro"),
        "props",
    )
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_orc_snapdiff_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(out, ignore_errors=True)
    v1 = snapshot_write(e, out, mode="append")
    v2_rows = e.filter(F.col("event_id") % 5 != 0).withColumn(
        "value_micro",
        F.when(
            F.col("event_id") % 3 == 0, F.col("value_micro") + 1000000
        ).otherwise(F.col("value_micro")),
    ).unionByName(
        e.filter(F.col("event_id") % 11 == 0).select(
            (F.col("event_id") + F.lit(10**9)).alias("event_id"),
            "ts_us",
            "user_id",
            F.lit("synthetic").alias("event_type"),
            "value_micro",
            "props",
        )
    )
    v2 = snapshot_write(v2_rows, out, mode="overwrite")
    return snapshot_diff(spark, out, ["event_id"], v1, v2)


ORC_SNAPSHOT_DIFF_SQL = """
WITH base AS (
  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
    CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS value_micro, props
  FROM events
),
v2 AS (
  SELECT event_id, ts_us, user_id, event_type,
    CASE WHEN event_id % 3 = 0 THEN value_micro + 1000000
         ELSE value_micro END AS value_micro,
    props
  FROM base WHERE event_id % 5 <> 0
  UNION ALL
  SELECT event_id + 1000000000, ts_us, user_id, 'synthetic',
    value_micro, props
  FROM base WHERE event_id % 11 = 0
)
SELECT
  CASE WHEN a.event_id IS NULL THEN 'insert'
       WHEN b.event_id IS NULL THEN 'delete'
       ELSE 'update' END AS change_type,
  COALESCE(b.event_id, a.event_id) AS event_id,
  COALESCE(b.ts_us, a.ts_us) AS ts_us,
  COALESCE(b.user_id, a.user_id) AS user_id,
  COALESCE(b.event_type, a.event_type) AS event_type,
  COALESCE(b.value_micro, a.value_micro) AS value_micro,
  COALESCE(b.props, a.props) AS props
FROM base a FULL OUTER JOIN v2 b ON a.event_id = b.event_id
WHERE NOT (a.event_id IS NOT NULL AND b.event_id IS NOT NULL
  AND a.ts_us IS NOT DISTINCT FROM b.ts_us
  AND a.user_id IS NOT DISTINCT FROM b.user_id
  AND a.event_type IS NOT DISTINCT FROM b.event_type
  AND a.value_micro IS NOT DISTINCT FROM b.value_micro
  AND a.props IS NOT DISTINCT FROM b.props)
"""


def orc_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustered layout at value level: orders rewritten
    clustered on the Morton curve of (o_custkey, o_orderdate) and read
    back — the hash match proves the multi-dimensional re-layout
    (quantize → bit-interleave → range-partition → sort) moves every
    row and loses none. The data-skipping payoff (a range filter on
    EITHER clustered column touches a minority of files, where a
    linear sort serves only its own column) is measured in
    tests/test_scale_layouts.py::test_zorder_layout_serves_both_dimensions."""
    from flink_orc_sink_spark.sources.orc_sink import write_orc_zordered

    o = table(spark, sf_dir, "orders")
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_orc_zorder_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    write_orc_zordered(o, out, ["o_custkey", "o_orderdate"])
    return read_orc(spark, out).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )


ORC_ZORDER_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM orders
"""


def orc_stats_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-SKIPPING INDEX at value level: orders written Z-ordered,
    a file-level min/max index built over it
    (``sources/orc_sink.py::build_minmax_index``), then a key-range
    selection answered by reading ONLY the files the index admits
    (``pruned_read``). The oracle is the plain relational filter, so a
    hash match proves plan-time file skipping loses no rows and admits
    no extras — the Iceberg-manifest-style read path that turns "open
    100k files" into "open the 40 the range touches" at 100 TB."""
    from flink_orc_sink_spark.sources.orc_sink import (
        build_minmax_index,
        pruned_read,
        write_orc_zordered,
    )

    o = table(spark, sf_dir, "orders")
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_orc_statsidx_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    data, idx = os.path.join(base, "data"), os.path.join(base, "index")
    write_orc_zordered(o, data, ["o_custkey", "o_orderdate"])
    build_minmax_index(spark, data, ["o_custkey"], idx)
    # fixed relative range: [10%, 30%] of the key span
    lo_k, hi_k = o.agg(F.min("o_custkey"), F.max("o_custkey")).first()
    lo = lo_k + (hi_k - lo_k) // 10
    hi = lo_k + 3 * (hi_k - lo_k) // 10
    return pruned_read(spark, data, idx, "o_custkey", lo, hi).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )


ORC_STATS_PRUNED_SQL = """
WITH span AS (
  SELECT MIN(o_custkey) AS lo_k, MAX(o_custkey) AS hi_k FROM orders
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM orders, span
WHERE o_custkey >= lo_k + (hi_k - lo_k) // 10
  AND o_custkey <= lo_k + 3 * (hi_k - lo_k) // 10
"""


def orc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MATERIALIZED AGGREGATE at value level: a daily
    revenue rollup maintained the way a 100 TB warehouse maintains it
    — the historical days aggregated once, then "a new day arrives"
    and ONLY that day's partition is scanned (partition-pruned read)
    and upserted into the aggregate table (dynamic partition
    overwrite). The oracle recomputes the rollup from scratch, so a
    hash match proves incremental maintenance equals full recompute —
    the invariant that lets daily pipelines cost a day, not a table.
    """
    o = table(spark, sf_dir, "orders").withColumn(
        "m", F.date_format("o_orderdate", "yyyy-MM")
    )
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_orc_incragg_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    fact, agg_path = os.path.join(base, "fact"), os.path.join(base, "agg")
    # cluster rows into their partition before writing: one file per
    # month instead of (tasks × months) small files — the layout a
    # real fact table wants, and ~3× faster to write locally
    write_orc(o, fact, partition_cols=["m"], repartition_by_partition_cols=True)
    # Bounded driver-side read by design: ONE scalar (the "new" month).
    max_m = o.agg(F.max("m")).collect()[0][0]

    def monthly_agg(df: DataFrame) -> DataFrame:
        return df.groupBy("m").agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2
            )
            .cast("double")
            .alias("revenue"),
        )

    # historical build: everything before the new month
    hist = spark.read.orc(fact).filter(F.col("m") < F.lit(max_m))
    write_orc(monthly_agg(hist), agg_path, partition_cols=["m"])
    # incremental step: scan ONLY the new month's partition, upsert it
    new_month = spark.read.orc(fact).filter(F.col("m") == F.lit(max_m))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            monthly_agg(new_month)
            .write.mode("overwrite")
            .format("orc")
            .partitionBy("m")
            .save(agg_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return read_orc(spark, agg_path).select(
        F.to_timestamp(F.concat(F.col("m"), F.lit("-01"))).alias(
            "month_start"
        ),
        "n_orders",
        "revenue",
    )


ORC_INCR_AGG_SQL = """
SELECT DATE_TRUNC('month', o_orderdate) AS month_start,
  COUNT(*) AS n_orders,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
    AS revenue
FROM orders GROUP BY month_start
"""


def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour counts/sums computed BY THE STREAMING RUNTIME.

    File source replays the events parquet as a stream
    (``availableNow`` = bounded replay, the standard backfill
    trigger), the aggregation state lives in the streaming state
    store, and the memory sink holds the complete result. Must equal
    ``events_tumbling_hourly``'s batch oracle exactly.
    """
    global _STREAM_SEQ
    # table() pins nanosAsLong + UTC on this session (events ts is a
    # nanosecond parquet timestamp; the streaming reader needs the
    # same ingestion contract).
    table(spark, sf_dir, "events")
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    # The file stream source wants a directory; stage a symlink to the
    # (read-only) source file in a scratch dir.
    stage = tempfile.mkdtemp(prefix="stream_q_src_")
    os.symlink(src, os.path.join(stage, "events.parquet"))
    sdf = normalize_events_ts(
        spark.readStream.schema(raw_schema).parquet(stage)
    )
    agg = (
        sdf.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    _STREAM_SEQ += 1
    name = f"stream_tumbling_hourly_{_STREAM_SEQ}"
    with tempfile.TemporaryDirectory(prefix="stream_q_ckpt_") as ckpt, stream_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # Memory-sink table is fully materialized once the replay
    # terminates.
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    return spark.table(name)


def orc_roundtrip_typeedge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip of the §1.4 EDGE types the plain events round-trip
    doesn't reach (round-2 verdict item 8): DECIMAL(38,10) at both
    extremes of the precision range (plus the smallest positive step
    and an exact integral value), pre-1970 (negative-epoch) timestamps,
    and non-ASCII strings (CJK, emoji/astral-plane, combining
    accents, empty). Rows are derived deterministically from events
    and pushed through the real ORC sink → committed read; the oracle
    computes the same derivation directly, so a hash match proves the
    sink stores and returns every edge value losslessly (the Hive-
    readability claim at value level). Decimals are compared as
    post-read-back strings — exact textual form, no double rounding.
    Pre-1970 instants use pure epoch-µs arithmetic (no calendar-year
    interval), so both engines land on the identical instant."""
    e = table(spark, sf_dir, "events").select("event_id", "ts")
    edge = e.select(
        "event_id",
        F.expr(
            """CASE event_id % 4
         WHEN 0 THEN CAST('9999999999999999999999999999.9999999999' AS DECIMAL(38,10))
         WHEN 1 THEN CAST('-9999999999999999999999999999.9999999999' AS DECIMAL(38,10))
         WHEN 2 THEN CAST('0.0000000001' AS DECIMAL(38,10))
         ELSE CAST(event_id AS DECIMAL(38,10)) END"""
        ).alias("dec_edge"),
        F.timestamp_micros(
            F.unix_micros("ts") - F.lit(3_000_000_000_000_000)
        ).alias("ts_pre1970"),
        F.expr(
            """CASE event_id % 3
         WHEN 0 THEN concat('é中文🚀-', CAST(event_id AS STRING))
         WHEN 1 THEN 'Ω≈ç√ naïve café'
         ELSE '' END"""
        ).alias("s_unicode"),
    )
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_orc_typeedge_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    write_orc(edge, out)
    r = read_orc(spark, out)
    return r.select(
        "event_id",
        F.col("dec_edge").cast("string").alias("dec_edge_str"),
        "ts_pre1970",
        "s_unicode",
    )


ORC_TYPEEDGE_SQL = """
SELECT event_id,
  CAST(CASE event_id % 4
    WHEN 0 THEN CAST('9999999999999999999999999999.9999999999' AS DECIMAL(38,10))
    WHEN 1 THEN CAST('-9999999999999999999999999999.9999999999' AS DECIMAL(38,10))
    WHEN 2 THEN CAST('0.0000000001' AS DECIMAL(38,10))
    ELSE CAST(event_id AS DECIMAL(38,10)) END AS VARCHAR) AS dec_edge_str,
  make_timestamp(epoch_us(ts) - 3000000000000000) AS ts_pre1970,
  CASE event_id % 3
    WHEN 0 THEN 'é中文🚀-' || CAST(event_id AS VARCHAR)
    WHEN 1 THEN 'Ω≈ç√ naïve café'
    ELSE '' END AS s_unicode
FROM events
"""


def stream_sessionize_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 10-minute-gap SESSION WINDOWS computed BY THE STREAMING
    RUNTIME via ``session_window`` (dynamic-gap merging in the
    streaming state store) — the streaming counterpart of the batch
    ``events_sessionize_10m`` gaps-and-islands query (round-2 verdict
    item 5). ``availableNow`` bounded replay, complete-mode memory
    sink; the oracle is the batch gaps-and-islands SQL aggregated to
    (user, session) rows, so a hash match proves the streaming session
    merge produces exactly the batch sessions. Boundary semantics
    agree: ``session_window``'s half-open [ts, ts+gap) merge means a
    gap of exactly 10 min starts a new session, same as the batch
    ``>= gap`` rule."""
    global _STREAM_SEQ
    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stage = tempfile.mkdtemp(prefix="stream_sess_src_")
    os.symlink(src, os.path.join(stage, "events.parquet"))
    sdf = normalize_events_ts(
        spark.readStream.schema(raw_schema).parquet(stage)
    )
    agg = (
        sdf.groupBy(
            F.session_window("ts", "10 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            "session_value",
        )
    )
    _STREAM_SEQ += 1
    name = f"stream_sessionize_10m_{_STREAM_SEQ}"
    with tempfile.TemporaryDirectory(prefix="stream_sess_ckpt_") as ckpt, stream_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    return spark.table(name)


STREAM_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN LAG(ts) OVER w IS NULL
              OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) >= 600000000
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
  SELECT user_id, ts, value,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
  COUNT(*) AS n_events,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS session_value
FROM sessions GROUP BY user_id, session_seq
"""


def stream_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length / 30 min slide) computed BY THE
    STREAMING RUNTIME — each event contributes to two overlapping
    window states in the state store. Same bounded-replay harness as
    ``stream_tumbling_hourly``; the oracle is the batch sliding-window
    SQL, so a hash match proves overlap assignment and the exact-
    decimal average agree with the batch engine."""
    global _STREAM_SEQ
    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stage = tempfile.mkdtemp(prefix="stream_slide_src_")
    os.symlink(src, os.path.join(stage, "events.parquet"))
    sdf = normalize_events_ts(
        spark.readStream.schema(raw_schema).parquet(stage)
    )
    agg = (
        sdf.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            (
                F.floor(
                    F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                    / F.count(F.lit(1))
                    * 10000
                    + 0.5
                )
                / 10000
            )
            .cast("double")
            .alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )
    _STREAM_SEQ += 1
    name = f"stream_sliding_{_STREAM_SEQ}"
    with tempfile.TemporaryDirectory(prefix="stream_slide_ckpt_") as ckpt, stream_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    return spark.table(name)


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING exactly-once dedup across source files: the stage dir
    holds the events file TWICE (two names → the file source replays
    every row twice, possibly in different micro-batches), and
    ``dropDuplicates("event_id")`` in the streaming state store must
    collapse the duplicates back to exactly the source rows. The
    oracle is plain ``SELECT * FROM events`` — a hash match is the
    duplicate-elimination guarantee the reference's two-phase commit
    provides at file level (`README.md:3`), asserted at row level
    through the state store. Append mode, bounded replay; state is
    dropped with the checkpoint."""
    global _STREAM_SEQ
    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stage = tempfile.mkdtemp(prefix="stream_dedup_src_")
    os.symlink(src, os.path.join(stage, "events_a.parquet"))
    os.symlink(src, os.path.join(stage, "events_b.parquet"))
    sdf = normalize_events_ts(
        spark.readStream.schema(raw_schema).parquet(stage)
    )
    deduped = sdf.dropDuplicates(["event_id"]).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    _STREAM_SEQ += 1
    name = f"stream_dedup_{_STREAM_SEQ}"
    with tempfile.TemporaryDirectory(prefix="stream_dedup_ckpt_") as ckpt, stream_partitions(spark):
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    return spark.table(name)


def _ts_quartile(e: DataFrame):
    """(lo, step, q_of) for splitting a normalized events frame into
    four ts-range quartiles — the deterministic time-ordered replay
    used by ``stream_dedup_ttl`` and ``stream_temporal_enrich``. The
    oracle replicates the same integer arithmetic
    (``step = (hi-lo)//4+1``, ``q = (ts_us-lo)//step``)."""
    lo, hi = e.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    step = (hi - lo) // 4 + 1
    q_of = ((F.unix_micros("ts") - F.lit(lo)) / F.lit(step)).cast("int")
    return lo, step, q_of


def _stage_ordered_files(parts: list[DataFrame], stage: str) -> None:
    """Write each frame as ONE parquet file under ``stage`` with
    name- and mtime-ordered filenames, so the file stream source
    drains them oldest-first deterministically."""
    import glob as _glob
    import shutil

    build = tempfile.mkdtemp(prefix="stage_build_")
    for i, part in enumerate(parts):
        part.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(build, f"f{i}")
        )
        pf = _glob.glob(os.path.join(build, f"f{i}", "part-*.parquet"))
        shutil.copy(pf[0], os.path.join(stage, f"{i:03d}.parquet"))
    shutil.rmtree(build, ignore_errors=True)


def stream_dedup_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL-BOUNDED streaming dedup — the production twin of
    ``stream_dedup_events``: ``dropDuplicatesWithinWatermark`` keeps a
    key's dedup state only until the watermark passes its event time
    + delay, so state is O(keys per TTL window) instead of O(all
    history) (unbounded ``dropDuplicates`` state is impossible on a
    100 TB/day stream; boundedness is pytest-asserted from
    ``stateOperators.numRowsTotal``). The replay: events split into
    four TS-RANGE files drained oldest-first, every 10th event
    duplicated INSIDE its own file (within-TTL duplicate → must
    collapse), and every 97th event of the oldest quartile replayed
    again in the newest file (a duplicate arriving long past the
    TTL → below the watermark, dropped as late data — verified
    empirically: Spark drops sub-watermark rows in this operator
    rather than re-emitting them). Output must therefore hash-match
    plain ``SELECT * FROM events``: exactly-once survives BOTH the
    in-window duplicates and the expired-state replay."""
    global _STREAM_SEQ
    import glob as _glob
    import shutil

    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    src = os.path.join(sf_dir, "events.parquet")
    # staged files carry the NORMALIZED schema (µs timestamps) — the
    # stream reads them back with e.schema, no re-normalize
    e = normalize_events_ts(spark.read.parquet(src))
    _, _, q_of = _ts_quartile(e)
    stage = tempfile.mkdtemp(prefix="stream_dedupttl_src_")
    parts = []
    for i in range(4):
        part = e.filter(q_of == i)
        # within-TTL duplicates: every 10th event twice in its file
        part = part.unionByName(
            part.filter(F.col("event_id") % 10 == 0)
        )
        if i == 3:
            # expired-state replay: oldest-quartile rows again, far
            # past the 30-minute TTL -> dropped as late
            part = part.unionByName(
                e.filter(
                    (q_of == 0) & (F.col("event_id") % 97 == 0)
                )
            )
        parts.append(part)
    _stage_ordered_files(parts, stage)
    deduped = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    _STREAM_SEQ += 1
    name = f"stream_dedupttl_{_STREAM_SEQ}"
    with tempfile.TemporaryDirectory(
        prefix="stream_dedupttl_ckpt_"
    ) as ckpt, stream_partitions(spark):
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    shutil.rmtree(stage, ignore_errors=True)
    return spark.table(name)


def stream_temporal_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL TABLE JOIN — Flink's processing-time dim enrichment
    (each event joins the dimension version CURRENT WHEN IT ARRIVES,
    not a frozen snapshot), the pattern the reference sink's pipelines
    feed from: events replayed as four ts-ordered micro-batches; the
    per-type rate dimension is REFRESHED BETWEEN BATCHES (version k =
    ``len(event_type) + k``), and each ``foreachBatch`` broadcast-joins
    its batch against the dim version of that moment before landing
    an idempotent ``batch_id`` partition. The readback aggregate must
    hash-match an oracle that reproduces the same quartile arithmetic
    — proving each event was priced by exactly its arrival-time dim
    version (a static-enrich plan would weight every event with one
    version and hash-mismatch). Scale: the dim is broadcast per batch
    (dims are small by definition); events never shuffle."""
    global _STREAM_SEQ
    import shutil

    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    src = os.path.join(sf_dir, "events.parquet")
    e = normalize_events_ts(spark.read.parquet(src)).select(
        "event_id", "ts", "event_type", "value"
    )
    _, _, q_of = _ts_quartile(e)
    etypes = [
        r[0] for r in e.select("event_type").distinct().collect()
    ]
    stage = tempfile.mkdtemp(prefix="stream_tenrich_src_")
    _stage_ordered_files(
        [e.filter(q_of == i) for i in range(4)], stage
    )
    _STREAM_SEQ += 1
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_tenrich_"
        f"{os.path.basename(os.path.normpath(sf_dir))}_{_STREAM_SEQ}",
    )
    shutil.rmtree(out, ignore_errors=True)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        bspark = batch_df.sparkSession
        # the dim refresh: version of THIS processing moment
        dim = local_df(
            bspark,
            [(t, len(t) + batch_id) for t in sorted(etypes)],
            "event_type string, rate long",
        )
        (
            batch_df.join(F.broadcast(dim), "event_type")
            .select(
                "event_id",
                "event_type",
                (
                    F.floor(F.col("value") * 1e6 + 0.5).cast("long")
                    * F.col("rate")
                ).alias("weighted_micro"),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out)
        )

    with tempfile.TemporaryDirectory(
        prefix="stream_tenrich_ckpt_"
    ) as ckpt, stream_partitions(spark):
        q = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stage)
            .writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain_or_fail(q, 180, "temporal-enrich stream")
    shutil.rmtree(stage, ignore_errors=True)
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("weighted_micro").alias("sum_weighted_micro"),
        )
    )


STREAM_TEMPORAL_ENRICH_SQL = """
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS lo,
         (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 4 + 1 AS step
  FROM events
),
e AS (
  SELECT event_type,
    CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)
      * (length(event_type)
         + (epoch_us(ts) - (SELECT lo FROM b)) // (SELECT step FROM b))
      AS weighted_micro
  FROM events
)
SELECT event_type, COUNT(*) AS n_events,
  CAST(SUM(weighted_micro) AS BIGINT) AS sum_weighted_micro
FROM e GROUP BY event_type
"""


def orc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC SCHEMA EVOLUTION round-trip: generation 0 written without a
    column, generation 1 written with it (the add-a-column migration
    every long-lived warehouse table goes through), read back merged.
    Old rows must surface the new column as NULL, new rows must keep
    exact values — checked against a UNION ALL oracle. Uses the ORC
    ``mergeSchema`` reader path; at 100 TB this is how a sink keeps
    appending after a producer upgrade without rewriting history."""
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    sq = (
        F.floor(F.col("value") * F.col("value") * 1e6 + 0.5) / 1e6
    ).cast("double")
    gen0 = e.filter(F.col("event_id") % 2 == 0)
    gen1 = e.filter(F.col("event_id") % 2 == 1).withColumn("value_sq", sq)
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_orc_evolution_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    write_orc(gen0, os.path.join(out, "gen=0"))
    write_orc(gen1, os.path.join(out, "gen=1"))
    return (
        spark.read.option("mergeSchema", "true")
        .orc(out)
        .select("event_id", "user_id", "value", "value_sq")
    )


ORC_EVOLUTION_SQL = """
SELECT event_id, user_id, value, CAST(NULL AS DOUBLE) AS value_sq
FROM events WHERE event_id % 2 = 0
UNION ALL
SELECT event_id, user_id, value,
  CAST(FLOOR(value * value * 1000000 + 0.5) / 1000000 AS DOUBLE) AS value_sq
FROM events WHERE event_id % 2 = 1
"""


def stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM STATEFUL streaming operator (``applyInPandasWithState``)
    pushed through the value-level oracle gate: per-user running
    (count, sum) held in Arrow-batched per-key state across the
    bounded replay; the final state per key must equal the batch
    GROUP BY. Money math rides int64 micro-units end to end
    (``floor(value*1e6+0.5)`` quantized by Spark, accumulated exactly
    in state, descaled identically on both engines) so the hash match
    is bit-for-bit regardless of how micro-batches split the stream.
    Update-mode memory sink emits one row per key per micro-batch; the
    final state is selected by max event count (monotone per key)."""
    global _STREAM_SEQ
    from pyspark.sql import Window

    from flink_orc_sink_spark.streaming.stateful import running_totals_exact

    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stage = tempfile.mkdtemp(prefix="stream_rt_src_")
    os.symlink(src, os.path.join(stage, "events.parquet"))
    sdf = normalize_events_ts(
        spark.readStream.schema(raw_schema).parquet(stage)
    ).withColumn(
        "value_us", F.floor(F.col("value") * 1e6 + 0.5).cast("long")
    )
    totals = running_totals_exact(sdf, "user_id", "value_us")
    _STREAM_SEQ += 1
    name = f"stream_running_totals_{_STREAM_SEQ}"
    with tempfile.TemporaryDirectory(prefix="stream_rt_ckpt_") as ckpt, stream_partitions(spark):
        q = (
            totals.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        spark.table(name)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "n_events",
            (F.col("total").cast("double") / F.lit(1_000_000.0)).alias(
                "total_value"
            ),
        )
    )


STREAM_RUNNING_TOTALS_SQL = """
SELECT user_id, COUNT(*) AS n_events,
  CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
    / 1000000.0 AS total_value
FROM events GROUP BY user_id
"""


def stream_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming TOP-K PER WINDOW: the runtime maintains per-(hour,
    user) counts in the state store across the bounded replay; the
    top-3 ranking per window is the post-materialization select (the
    standard serving split — streaming keeps the additive state,
    ranking happens on read, because rank is not an incremental
    aggregate). Ties broken by user_id, so the result is
    deterministic and value-checkable against the batch oracle."""
    global _STREAM_SEQ
    from pyspark.sql import Window

    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stage = tempfile.mkdtemp(prefix="stream_topk_src_")
    os.symlink(src, os.path.join(stage, "events.parquet"))
    sdf = normalize_events_ts(
        spark.readStream.schema(raw_schema).parquet(stage)
    )
    agg = (
        sdf.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "user_id", "n_events")
    )
    _STREAM_SEQ += 1
    name = f"stream_topk_per_window_{_STREAM_SEQ}"
    with tempfile.TemporaryDirectory(prefix="stream_topk_ckpt_") as ckpt, stream_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("user_id").asc()
    )
    return (
        spark.table(name)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("window_start", "user_id", "n_events", "rank")
    )


STREAM_TOPK_WINDOW_SQL = """
WITH counts AS (
  SELECT DATE_TRUNC('hour', ts) AS window_start, user_id,
         COUNT(*) AS n_events
  FROM events GROUP BY window_start, user_id
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY window_start ORDER BY n_events DESC, user_id
    ) AS INTEGER) AS rank
  FROM counts
)
SELECT window_start, user_id, n_events, rank FROM ranked WHERE rank <= 3
"""


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner interval join on the real runtime: clicks
    and views replayed as two independent file streams, joined per
    user on an event-time interval (view within the 10 minutes before
    the click) with watermarks bounding both sides' join state. The
    oracle is the equivalent batch theta-join, so a hash match proves
    the streaming join buffers and matches across sources exactly.
    (The batch as-of variant is ``events_click_attribution``; this is
    the ALL-pairs-in-window semantics, Spark's native stream-stream
    join shape.) Watermarks are generous (24 h) because correctness
    here is value parity, not eviction timing — eviction is bounded
    state, covered by the interval condition itself at scale."""
    global _STREAM_SEQ
    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stage_c = tempfile.mkdtemp(prefix="stream_ij_clicks_")
    stage_v = tempfile.mkdtemp(prefix="stream_ij_views_")
    os.symlink(src, os.path.join(stage_c, "events.parquet"))
    os.symlink(src, os.path.join(stage_v, "events.parquet"))
    clicks = (
        normalize_events_ts(spark.readStream.schema(raw_schema).parquet(stage_c))
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "24 hours")
    )
    views = (
        normalize_events_ts(spark.readStream.schema(raw_schema).parquet(stage_v))
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "24 hours")
    )
    joined = clicks.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 10 MINUTES")),
    ).select(
        "click_id",
        "view_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )
    _STREAM_SEQ += 1
    name = f"stream_interval_join_{_STREAM_SEQ}"
    with tempfile.TemporaryDirectory(prefix="stream_ij_ckpt_") as ckpt, stream_partitions(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    import shutil

    shutil.rmtree(stage_c, ignore_errors=True)
    shutil.rmtree(stage_v, ignore_errors=True)
    return spark.table(name)


STREAM_INTERVAL_JOIN_SQL = """
SELECT c.event_id AS click_id, v.event_id AS view_id,
  epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
FROM events c JOIN events v
  ON c.user_id = v.user_id
 AND c.event_type = 'click' AND v.event_type = 'view'
 AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 10 MINUTE
"""


def stream_interval_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM LEFT OUTER interval join on the real runtime —
    the harder half of stream-stream joins: unmatched left rows can
    only be emitted once the watermark PROVES no matching view can
    still arrive, so null-padding is a state-eviction decision, not a
    lookup miss. Tight 1-hour watermarks make eviction actually
    happen during the bounded replay; rows whose no-match verdict
    the final watermark cannot yet decide (the last ~1 h 10 m of the
    stream) are excluded by an IDENTICAL deterministic cutoff on
    both engines (``click_ts ≤ max(ts) − 2 h``), so the value-hash
    compares exactly the decidable region. A hash match proves the
    runtime's eviction emits every unmatched click exactly once with
    the right nulls."""
    global _STREAM_SEQ
    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stage_c = tempfile.mkdtemp(prefix="stream_loj_clicks_")
    stage_v = tempfile.mkdtemp(prefix="stream_loj_views_")
    os.symlink(src, os.path.join(stage_c, "events.parquet"))
    os.symlink(src, os.path.join(stage_v, "events.parquet"))
    clicks = (
        normalize_events_ts(spark.readStream.schema(raw_schema).parquet(stage_c))
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    views = (
        normalize_events_ts(spark.readStream.schema(raw_schema).parquet(stage_v))
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    joined = clicks.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 10 MINUTES")),
        "left_outer",
    ).select(
        "click_id",
        "click_ts",
        "view_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )
    _STREAM_SEQ += 1
    name = f"stream_interval_join_left_{_STREAM_SEQ}"
    with tempfile.TemporaryDirectory(prefix="stream_loj_ckpt_") as ckpt, stream_partitions(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    import shutil

    shutil.rmtree(stage_c, ignore_errors=True)
    shutil.rmtree(stage_v, ignore_errors=True)
    max_ts = (
        table(spark, sf_dir, "events").agg(F.max("ts").alias("m"))
    )
    return (
        spark.table(name)
        .crossJoin(F.broadcast(max_ts))
        .filter(F.col("click_ts") <= F.col("m") - F.expr("INTERVAL 2 HOURS"))
        .select("click_id", "view_id", "gap_us")
    )


STREAM_INTERVAL_JOIN_LEFT_SQL = """
WITH mx AS (SELECT MAX(ts) AS maxts FROM events)
SELECT c.event_id AS click_id, v.event_id AS view_id,
  epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
FROM events c
LEFT JOIN events v
  ON c.user_id = v.user_id
 AND v.event_type = 'view'
 AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 10 MINUTE
WHERE c.event_type = 'click'
  AND c.ts <= (SELECT maxts FROM mx) - INTERVAL 2 HOUR
"""


def stream_interval_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM FULL OUTER interval join on the real runtime —
    the rarest join mode and the hardest state contract: BOTH sides'
    unmatched rows are null-padded, each only once its own watermark
    proves no partner can still arrive. Clicks join views of the same
    user within the preceding 10 minutes; the decidable region is cut
    identically on both engines (each side's ts ≤ max(ts) − 3 h, with
    NULL sides passing), so the value-hash compares exactly the rows
    whose match/no-match verdict the final watermark has settled. A
    hash match proves the runtime emits every match once AND every
    unmatched row of either side once with the right nulls."""
    global _STREAM_SEQ
    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stage_c = tempfile.mkdtemp(prefix="stream_foj_clicks_")
    stage_v = tempfile.mkdtemp(prefix="stream_foj_views_")
    os.symlink(src, os.path.join(stage_c, "events.parquet"))
    os.symlink(src, os.path.join(stage_v, "events.parquet"))
    clicks = (
        normalize_events_ts(spark.readStream.schema(raw_schema).parquet(stage_c))
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    views = (
        normalize_events_ts(spark.readStream.schema(raw_schema).parquet(stage_v))
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    joined = clicks.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 10 MINUTES")),
        "full_outer",
    ).select("click_id", "click_ts", "view_id", "view_ts")
    _STREAM_SEQ += 1
    name = f"stream_interval_join_full_{_STREAM_SEQ}"
    with tempfile.TemporaryDirectory(prefix="stream_foj_ckpt_") as ckpt, stream_partitions(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    import shutil

    shutil.rmtree(stage_c, ignore_errors=True)
    shutil.rmtree(stage_v, ignore_errors=True)
    max_ts = table(spark, sf_dir, "events").agg(F.max("ts").alias("m"))
    cutoff = F.col("m") - F.expr("INTERVAL 3 HOURS")
    return (
        spark.table(name)
        .crossJoin(F.broadcast(max_ts))
        .filter(
            (F.col("click_ts").isNull() | (F.col("click_ts") <= cutoff))
            & (F.col("view_ts").isNull() | (F.col("view_ts") <= cutoff))
        )
        .select(
            "click_id",
            "view_id",
            (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias(
                "gap_us"
            ),
        )
    )


STREAM_INTERVAL_JOIN_FULL_SQL = """
WITH mx AS (SELECT MAX(ts) AS maxts FROM events),
c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
      FROM events WHERE event_type = 'click'),
v AS (SELECT event_id AS view_id, user_id, ts AS view_ts
      FROM events WHERE event_type = 'view')
SELECT click_id, view_id,
  epoch_us(click_ts) - epoch_us(view_ts) AS gap_us
FROM c
FULL JOIN v
  ON c.user_id = v.user_id
 AND v.view_ts <= c.click_ts
 AND v.view_ts >= c.click_ts - INTERVAL 10 MINUTE
WHERE (click_ts IS NULL
       OR click_ts <= (SELECT maxts FROM mx) - INTERVAL 3 HOUR)
  AND (view_ts IS NULL
       OR view_ts <= (SELECT maxts FROM mx) - INTERVAL 3 HOUR)
"""


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC broadcast enrichment on the real runtime: the
    events stream joined per micro-batch against the static nation
    dimension (broadcast — no stream state, no shuffle of the stream).
    This is the standard streaming dimension-enrichment pattern; the
    oracle is the plain batch join. At 100 TB/day the static side
    refreshes by swapping the broadcast table between restarts."""
    global _STREAM_SEQ
    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stage = tempfile.mkdtemp(prefix="stream_enrich_src_")
    os.symlink(src, os.path.join(stage, "events.parquet"))
    nation = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), F.col("n_name").alias("nation_name")
    )
    sdf = normalize_events_ts(
        spark.readStream.schema(raw_schema).parquet(stage)
    ).withColumn("nk", F.col("user_id") % 25)
    joined = sdf.join(F.broadcast(nation), "nk").select(
        "event_id", "user_id", "event_type", "nation_name"
    )
    _STREAM_SEQ += 1
    name = f"stream_static_enrich_{_STREAM_SEQ}"
    with tempfile.TemporaryDirectory(prefix="stream_enrich_ckpt_") as ckpt, stream_partitions(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    return spark.table(name)


STREAM_STATIC_ENRICH_SQL = """
SELECT event_id, user_id, event_type, n_name AS nation_name
FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
"""


def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC MERGE on the real runtime, pushed through the
    value gate: the event change feed (``error`` = delete tombstone,
    else upsert) replayed in THREE micro-batches
    (``maxFilesPerTrigger=1`` over a 3-file stage) through
    ``stream_cdc_apply_orc`` — each batch partition-prunes the keyed
    ORC state table, merges latest-per-key, and dynamically overwrites
    only touched key partitions. The final table must equal the batch
    CDC oracle's latest-per-key state exactly, proving the incremental
    merge composes across batches (latest-wins is associative) and
    tombstones suppress deleted keys."""
    global _STREAM_SEQ
    from flink_orc_sink_spark.streaming.orc_sink import (
        stream_cdc_apply_orc,
        stream_from_files,
    )

    e = table(spark, sf_dir, "events")
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    # 3-file stage so availableNow + maxFilesPerTrigger=1 replays the
    # feed as three genuine micro-batches (a symlinked single file
    # would merge everything in one batch and never exercise the
    # state-table read-back path).
    stage = tempfile.mkdtemp(prefix="stream_cdc_src_")
    spark.read.parquet(src).repartitionByRange(3, "event_id").write.mode(
        "overwrite"
    ).parquet(stage)
    _STREAM_SEQ += 1
    state = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_cdc_"
        f"{os.path.basename(os.path.normpath(sf_dir))}_{_STREAM_SEQ}",
    )
    import shutil

    shutil.rmtree(state, ignore_errors=True)
    with tempfile.TemporaryDirectory(prefix="stream_cdc_ckpt_") as ckpt, stream_partitions(spark):
        sdf = normalize_events_ts(
            stream_from_files(spark, stage, raw_schema, max_files_per_trigger=1)
        ).select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_id",
            F.when(F.col("event_type") == "error", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.floor(F.col("value") * 1e6 + 0.5)
            .cast("long")
            .alias("value_micro"),
        )
        q = stream_cdc_apply_orc(
            sdf,
            state,
            checkpoint=ckpt,
            key_col="user_id",
            order_cols=["ts_us", "event_id"],
            trigger={"availableNow": True},
        )
        q.awaitTermination()
    shutil.rmtree(stage, ignore_errors=True)
    from flink_orc_sink_spark.streaming import read_cdc_table

    return (
        read_cdc_table(spark, state)
        .filter(F.col("op") == "U")
        .select(
            "user_id",
            F.col("ts_us").alias("last_ts_us"),
            F.col("value_micro").alias("last_value_micro"),
        )
    )


STREAM_CDC_APPLY_SQL = """
WITH ch AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
    CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS value_micro
  FROM events
),
r AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts_us DESC, event_id DESC) AS rn
  FROM ch
)
SELECT user_id, ts_us AS last_ts_us, value_micro AS last_value_micro
FROM r WHERE rn = 1 AND op = 'U'
"""


def stream_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD TYPE-2 dimension maintenance on the real
    runtime, pushed through the value gate: the event feed replayed
    as FOUR HASH-SCATTERED micro-batches (``repartition(4,
    event_id)`` — so each user's status changes arrive split across
    batches in NO particular time order) through
    ``streaming/orc_sink.py::stream_scd2_apply_orc``. Each batch
    prunes the change archive to touched key-buckets, merges by
    full-row distinct (replay-idempotent), and rebuilds the SCD2
    interval chain for those buckets only. The final history table
    must hash-match the one-shot batch ``SCD2_SQL`` over all events —
    proving the incremental per-bucket rebuild composes across
    batches AND tolerates out-of-order arrival, the property an
    interval-splicing design cannot give (a late change can split an
    existing interval or turn a discarded consecutive-repeat into a
    version start; see the sink docstring)."""
    global _STREAM_SEQ
    import shutil

    from flink_orc_sink_spark.streaming.orc_sink import (
        stream_from_files,
        stream_scd2_apply_orc,
    )

    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    # hash-scatter (not range-split) so micro-batches interleave each
    # key's timeline — the out-of-order arrival the sink must absorb
    stage = tempfile.mkdtemp(prefix="stream_scd2_src_")
    spark.read.parquet(src).repartition(4, "event_id").write.mode(
        "overwrite"
    ).parquet(stage)
    _STREAM_SEQ += 1
    state = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_scd2_"
        f"{os.path.basename(os.path.normpath(sf_dir))}_{_STREAM_SEQ}",
    )
    shutil.rmtree(state, ignore_errors=True)
    with tempfile.TemporaryDirectory(
        prefix="stream_scd2_ckpt_"
    ) as ckpt, stream_partitions(spark):
        sdf = normalize_events_ts(
            stream_from_files(
                spark, stage, raw_schema, max_files_per_trigger=1
            )
        ).select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
            "event_id",
        )
        q = stream_scd2_apply_orc(
            sdf,
            state,
            checkpoint=ckpt,
            key_col="user_id",
            attr_col="event_type",
            ts_col="ts_us",
            order_cols=["ts_us", "event_id"],
            trigger={"availableNow": True},
        )
        q.awaitTermination()
    shutil.rmtree(stage, ignore_errors=True)
    from flink_orc_sink_spark.streaming import read_scd2_history

    return read_scd2_history(spark, state).select(
        "user_id",
        F.col("event_type").alias("status"),
        "version",
        F.col("effective_from").alias("effective_from_us"),
        F.col("effective_to").alias("effective_to_us"),
        "is_current",
    )


def stream_retract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRACTION-correct streaming aggregation on the real runtime,
    pushed through the value gate: the event change feed (``error`` =
    delete tombstone, else upsert of the user's latest
    (event_type, value)) replayed as four HASH-SCATTERED micro-batches
    through ``streaming/orc_sink.py::stream_retract_agg_orc``. Each
    update retracts the user's previous contribution — including
    MOVING the user between event_type groups — as additive per-group
    deltas; no group is ever rescanned. The summed delta partitions
    must hash-match the one-shot batch aggregate over latest-per-key,
    proving retraction arithmetic composes across out-of-order
    batches (a later-arriving OLDER row must change nothing — the
    latest-wins merge retracts only when the batch actually changes a
    key's latest). This is the Flink dynamic-table → retract-stream →
    upsert-sink triangle the reference sink serves, value-checked."""
    global _STREAM_SEQ
    import shutil

    from flink_orc_sink_spark.streaming.orc_sink import (
        read_retract_agg,
        stream_from_files,
        stream_retract_agg_orc,
    )

    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stage = tempfile.mkdtemp(prefix="stream_retract_src_")
    spark.read.parquet(src).repartition(4, "event_id").write.mode(
        "overwrite"
    ).parquet(stage)
    _STREAM_SEQ += 1
    state = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_retract_"
        f"{os.path.basename(os.path.normpath(sf_dir))}_{_STREAM_SEQ}",
    )
    shutil.rmtree(state, ignore_errors=True)
    with tempfile.TemporaryDirectory(
        prefix="stream_retract_ckpt_"
    ) as ckpt, stream_partitions(spark):
        sdf = normalize_events_ts(
            stream_from_files(
                spark, stage, raw_schema, max_files_per_trigger=1
            )
        ).select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_id",
            "event_type",
            F.when(F.col("event_type") == "error", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.floor(F.col("value") * 1e6 + 0.5)
            .cast("long")
            .alias("value_micro"),
        )
        q = stream_retract_agg_orc(
            sdf,
            state,
            checkpoint=ckpt,
            key_col="user_id",
            group_col="event_type",
            val_col="value_micro",
            order_cols=["ts_us", "event_id"],
            trigger={"availableNow": True},
        )
        q.awaitTermination()
    shutil.rmtree(stage, ignore_errors=True)
    return read_retract_agg(spark, state).select(
        F.col("grp").alias("status"),
        F.col("sum_val").alias("sum_value_micro"),
        F.col("n_keys").alias("n_users"),
    )


STREAM_RETRACT_AGG_SQL = """
WITH ch AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
    CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS value_micro
  FROM events
),
r AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts_us DESC, event_id DESC) AS rn
  FROM ch
)
SELECT event_type AS status,
  CAST(SUM(value_micro) AS BIGINT) AS sum_value_micro,
  COUNT(*) AS n_users
FROM r WHERE rn = 1 AND op = 'U'
GROUP BY event_type
"""


def _retract_join_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-sided CDC feed shared by ``stream_retract_join`` and
    ``stream_retract_join_agg``: orders as the left feed (latest
    version per o_orderkey; 'F'-status v1 rows are delete tombstones;
    every 7th order's v2 MOVES it to a different custkey) and customer
    as the right (every 5th customer tombstoned by a later version),
    unioned under a ``side`` tag."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    customer = spark.read.parquet(
        os.path.join(sf_dir, "customer.parquet")
    )
    maxck = int(customer.agg(F.max("c_custkey")).first()[0])
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    l1 = orders.select(
        F.lit("L").alias("side"),
        F.col("o_orderkey").cast("long").alias("pk"),
        F.col("o_custkey").cast("long").alias("jk"),
        F.lit(1).cast("long").alias("seq"),
        F.when(F.col("o_orderstatus") == "F", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        cents.alias("val"),
        null_s.alias("attr"),
    )
    l2 = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        F.lit("L").alias("side"),
        F.col("o_orderkey").cast("long").alias("pk"),
        (F.pmod(F.col("o_custkey") + 13, F.lit(maxck)) + 1)
        .cast("long")
        .alias("jk"),
        F.lit(2).cast("long").alias("seq"),
        F.lit("U").alias("op"),
        cents.alias("val"),
        null_s.alias("attr"),
    )
    r1 = customer.select(
        F.lit("R").alias("side"),
        F.col("c_custkey").cast("long").alias("pk"),
        F.col("c_custkey").cast("long").alias("jk"),
        F.lit(1).cast("long").alias("seq"),
        F.lit("U").alias("op"),
        null_l.alias("val"),
        F.col("c_mktsegment").alias("attr"),
    )
    r2 = customer.filter(F.col("c_custkey") % 5 == 0).select(
        F.lit("R").alias("side"),
        F.col("c_custkey").cast("long").alias("pk"),
        F.col("c_custkey").cast("long").alias("jk"),
        F.lit(2).cast("long").alias("seq"),
        F.lit("D").alias("op"),
        null_l.alias("val"),
        F.col("c_mktsegment").alias("attr"),
    )
    return l1.unionByName(l2).unionByName(r1).unionByName(r2)


def _run_retract_join_stream(
    spark: SparkSession,
    sf_dir: str,
    tag: str,
    **sink_kwargs,
) -> str:
    """Stage the shared CDC feed hash-scattered into four out-of-order
    micro-batches, drain it through ``stream_retract_join_orc``, and
    return the state path."""
    global _STREAM_SEQ
    import shutil

    from flink_orc_sink_spark.streaming.orc_sink import (
        stream_from_files,
        stream_retract_join_orc,
    )

    # bucket counts are a layout knob sized to state (see the sink's
    # cost model + tools/scale_probe_retract_join.py); 8 suits the
    # bounded local replays exactly as stream_partitions pins 8 state
    # partitions (measured 25.8 s -> 15.0 s at sf0.01 vs 16 buckets)
    sink_kwargs.setdefault("n_key_partitions", 8)
    sink_kwargs.setdefault("n_join_buckets", 8)
    feed = _retract_join_feed(spark, sf_dir)
    stage = tempfile.mkdtemp(prefix=f"stream_{tag}_src_")
    # scatter each key's VERSIONS across batches (seq in the hash) —
    # out-of-order arrival is the property under test; three batches
    # exercise it fully (split versions + interleaved sides) at 3/4
    # the per-batch fixed cost of four
    feed.repartition(3, "side", "pk", "seq").write.mode(
        "overwrite"
    ).parquet(stage)
    _STREAM_SEQ += 1
    state = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_stream_{tag}_"
        f"{os.path.basename(os.path.normpath(sf_dir))}_{_STREAM_SEQ}",
    )
    shutil.rmtree(state, ignore_errors=True)
    with tempfile.TemporaryDirectory(
        prefix=f"stream_{tag}_ckpt_"
    ) as ckpt, stream_partitions(spark):
        raw_schema = spark.read.parquet(stage).schema
        sdf = stream_from_files(
            spark, stage, raw_schema, max_files_per_trigger=1
        )
        q = stream_retract_join_orc(
            sdf,
            state,
            checkpoint=ckpt,
            trigger={"availableNow": True},
            **sink_kwargs,
        )
        q.awaitTermination()
    shutil.rmtree(stage, ignore_errors=True)
    return state


def stream_retract_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRACTION-correct streaming JOIN (incremental view
    maintenance) on the real runtime, pushed through the value gate:
    two CDC feeds — orders (left: latest version per o_orderkey,
    'F'-status rows as delete tombstones, and every 7th order's v2
    MOVING it to a different custkey) and customer (right: every 5th
    customer tombstoned by a later version) — unioned, hash-scattered
    into four micro-batches so each key's versions arrive split and
    out of order, and run through ``streaming/orc_sink.py::
    stream_retract_join_orc`` (the Flink delta-join pattern: pk-keyed
    retraction layer → jk-keyed join state → partition-pruned view
    recompute). The maintained view aggregated per market segment
    must hash-match a one-shot batch join of latest-live-left with
    latest-live-right — proving retractions compose across
    out-of-order batches, including the hard cases: a join-key MOVE
    must retract the rows the pk produced under its OLD key, and a
    tombstoned customer must take all its joined orders with it.
    The view is MERGE-ON-READ since round 9 (``view/`` base as of the
    last fold ⊕ the unfolded delta log) — ``read_retract_join_view``
    is the snapshot reader."""
    from flink_orc_sink_spark.streaming import read_retract_join_view

    state = _run_retract_join_stream(spark, sf_dir, "rjoin")
    return (
        read_retract_join_view(spark, state)
        .groupBy(F.col("r_attr").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("jk").alias("n_customers"),
            F.sum("l_val").alias("sum_price_cents"),
        )
    )


# Shared oracle CTEs for the retract-join family: latest-live left
# (orders CDC with tombstones + key moves) and right (customer CDC
# with tombstones). One definition — the three oracles differ only in
# join type and output columns.
RETRACT_JOIN_CTES = """
WITH lfeed AS (
  SELECT o_orderkey AS pk, o_custkey AS jk, 1 AS seq,
    CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS val
  FROM orders
  UNION ALL
  SELECT o_orderkey,
    ((o_custkey + 13) % (SELECT MAX(c_custkey) FROM customer)) + 1,
    2, 'U', CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
  FROM orders WHERE o_orderkey % 7 = 0
),
llast AS (
  SELECT pk, jk, val FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY pk
                                 ORDER BY seq DESC) AS rn
    FROM lfeed
  ) WHERE rn = 1 AND op = 'U'
),
rlast AS (
  SELECT c_custkey AS jk, c_mktsegment AS attr
  FROM customer WHERE c_custkey % 5 <> 0
)
"""


STREAM_RETRACT_JOIN_SQL = f"""{RETRACT_JOIN_CTES}
SELECT r.attr AS segment,
  COUNT(*) AS n_orders,
  COUNT(DISTINCT l.jk) AS n_customers,
  CAST(SUM(l.val) AS BIGINT) AS sum_price_cents
FROM llast l JOIN rlast r ON l.jk = r.jk
GROUP BY r.attr
"""


def stream_retract_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Flink dynamic-table PIPELINE, value-checked: CDC ⋈ CDC
    → retract stream → incrementally-maintained AGGREGATE. Same
    two-sided out-of-order feed as ``stream_retract_join``, but the
    per-segment aggregate is NOT computed from the materialized view
    at read time — the sink lands additive per-group deltas
    (agg(new bucket content) − agg(old), bounded by the batch's
    touched join buckets) every micro-batch, and the readback merely
    SUMS the delta partitions (``read_retract_agg``). The summed
    deltas must hash-match the one-shot batch join+aggregate —
    proving the delta arithmetic composes across join-key moves,
    tombstones, resurrections and replay, without ever rescanning a
    group or the view. 100 TB shape: per-batch aggregate cost is
    O(touched buckets); the readback is O(batches × groups),
    corpus-size-independent."""
    from flink_orc_sink_spark.streaming.orc_sink import read_retract_agg

    state = _run_retract_join_stream(
        spark,
        sf_dir,
        "rjoinagg",
        agg_group_col="r_attr",
        agg_val_col="l_val",
    )
    return read_retract_agg(spark, state).select(
        F.col("grp").alias("segment"),
        F.col("n_keys").alias("n_orders"),
        F.col("sum_val").alias("sum_price_cents"),
    )


def stream_retract_join_left(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """OUTER-join incremental view maintenance — the textbook-hard
    retraction case: an order with no live customer appears
    NULL-EXTENDED in the view; when its customer arrives (or is
    resurrected) the null-extended row must be retracted and replaced,
    and when the customer is tombstoned the order must flip back to
    null-extended — all while join-key moves shuttle orders between
    buckets. Same out-of-order two-sided CDC feed as
    ``stream_retract_join``, run with ``how='left'`` and the
    maintained aggregate enabled; the summed deltas (including the
    NULL segment = currently-unmatched orders) must hash-match a
    one-shot batch LEFT JOIN + aggregate. The bucket-recompute design
    makes null-extension flips fall out of the recompute — no
    separate bookkeeping stream, which is where classical outer-join
    IVM implementations grow their bugs."""
    from flink_orc_sink_spark.streaming.orc_sink import read_retract_agg

    state = _run_retract_join_stream(
        spark,
        sf_dir,
        "rjoinleft",
        agg_group_col="r_attr",
        agg_val_col="l_val",
        how="left",
    )
    return read_retract_agg(spark, state).select(
        F.col("grp").alias("segment"),
        F.col("n_keys").alias("n_orders"),
        F.col("sum_val").alias("sum_price_cents"),
    )


STREAM_RETRACT_JOIN_LEFT_SQL = f"""{RETRACT_JOIN_CTES}
SELECT r.attr AS segment,
  COUNT(*) AS n_orders,
  CAST(SUM(l.val) AS BIGINT) AS sum_price_cents
FROM llast l LEFT JOIN rlast r ON l.jk = r.jk
GROUP BY r.attr
"""


STREAM_RETRACT_JOIN_AGG_SQL = f"""{RETRACT_JOIN_CTES}
SELECT r.attr AS segment,
  COUNT(*) AS n_orders,
  CAST(SUM(l.val) AS BIGINT) AS sum_price_cents
FROM llast l JOIN rlast r ON l.jk = r.jk
GROUP BY r.attr
"""


def stream_foreachbatch_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``foreachBatch`` CUSTOM SINK pushed through the value gate:
    events streamed through batch-id-keyed idempotent ORC writes
    (dynamic partition overwrite per micro-batch — the exactly-once
    mechanism for sinks without a native streaming writer), read back
    and compared to the source rows. Restart idempotence (same
    checkpoint, crash-replayed batch) is pytest-asserted in
    tests/test_streaming_sink.py."""
    global _STREAM_SEQ
    from flink_orc_sink_spark.streaming.orc_sink import (
        stream_from_files,
        stream_write_orc_foreachbatch,
    )

    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stage = tempfile.mkdtemp(prefix="stream_feb_src_")
    os.symlink(src, os.path.join(stage, "events.parquet"))
    _STREAM_SEQ += 1
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_feb_"
        f"{os.path.basename(os.path.normpath(sf_dir))}_{_STREAM_SEQ}",
    )
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    with tempfile.TemporaryDirectory(prefix="stream_feb_ckpt_") as ckpt, stream_partitions(spark):
        sdf = normalize_events_ts(stream_from_files(spark, stage, raw_schema))
        q = stream_write_orc_foreachbatch(
            sdf, out, checkpoint=ckpt, trigger={"availableNow": True}
        )
        q.awaitTermination()
    shutil.rmtree(stage, ignore_errors=True)
    return spark.read.orc(out).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def stream_fanout_atomic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATOMIC MULTI-TABLE FAN-OUT through the value gate: one event
    stream feeds TWO ORC tables (per-event-type and per-user partial
    aggregates), three micro-batches, each batch made visible by a
    SINGLE commit marker written only after BOTH tables landed
    (``streaming/orc_sink.py::stream_fanout_orc`` — the reference's
    2-phase rename commit generalized to N tables; a crash between
    table writes leaves the torn batch invisible in ALL of them,
    pytest-pinned in tests/test_streaming_sink.py). Readback goes
    through ``read_committed_fanout`` and reaggregates the per-batch
    decimal partials, so the result must equal the whole-input batch
    aggregate exactly."""
    global _STREAM_SEQ
    from flink_orc_sink_spark.streaming.orc_sink import (
        read_committed_fanout,
        stream_fanout_orc,
    )

    import shutil

    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    src = os.path.join(sf_dir, "events.parquet")
    raw = normalize_events_ts(spark.read.parquet(src))
    feed = tempfile.mkdtemp(prefix="stream_fan_feed_")
    # three replayable micro-batches (flat part files, one per
    # trigger — the module's feed-staging convention)
    for part in range(3):
        raw.filter(F.col("event_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(feed)
    _STREAM_SEQ += 1
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_fan_"
        f"{os.path.basename(os.path.normpath(sf_dir))}_{_STREAM_SEQ}",
    )
    shutil.rmtree(base, ignore_errors=True)
    by_type = os.path.join(base, "by_type")
    by_user = os.path.join(base, "by_user")
    commits = os.path.join(base, "_commits")

    def agg_type(d: DataFrame) -> DataFrame:
        return d.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
        )

    def agg_user(d: DataFrame) -> DataFrame:
        return d.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
        )

    schema = raw.schema
    with tempfile.TemporaryDirectory(
        prefix="stream_fan_ckpt_"
    ) as ckpt, stream_partitions(spark):
        q = stream_fanout_orc(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed),
            {
                "by_type": (by_type, agg_type),
                "by_user": (by_user, agg_user),
            },
            commits,
            ckpt,
            trigger={"availableNow": True},
        )
        _drain_or_fail(q, 180, "stream_fanout_atomic")
    shutil.rmtree(feed, ignore_errors=True)
    # per-batch decimal partials reaggregate EXACTLY to the global sum
    t = (
        read_committed_fanout(spark, by_type, commits)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sv"), 4).cast("double").alias("sum_value"),
        )
        .select(
            F.lit("etype").alias("side"),
            F.col("event_type").alias("key"),
            "n_events",
            "sum_value",
        )
    )
    u = (
        read_committed_fanout(spark, by_user, commits)
        .groupBy("user_id")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sv"), 4).cast("double").alias("sum_value"),
        )
        .select(
            F.lit("user").alias("side"),
            F.col("user_id").cast("string").alias("key"),
            "n_events",
            "sum_value",
        )
    )
    return t.unionByName(u)


FANOUT_ATOMIC_SQL = """
SELECT 'etype' AS side, event_type AS key, COUNT(*) AS n_events,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
UNION ALL
SELECT 'user' AS side, CAST(user_id AS VARCHAR) AS key, COUNT(*) AS n_events,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
FROM events GROUP BY user_id
"""


def stream_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATERMARK LATE-DATA SEMANTICS at value level (SURVEY §2.3 T6):
    three micro-batches in forced order — (a) every event older than
    max_ts − 4 h, (b) the recent events, whose processing advances the
    watermark and EVICTS the old windows' state, then (c) replayed
    duplicate copies of old events (≥ 8 h behind max_ts) plus one
    far-future sentinel. Spark's watermark guarantee is ONE-SIDED:
    late rows are only dropped once their window's state has been
    evicted, and eviction uses the watermark committed by the
    PREVIOUS batch — so the copies must arrive a full batch after the
    advancer (a two-batch version measurably double-counts; that
    sequencing subtlety is exactly what this query pins). The
    append-mode hourly counts must equal counting every original
    event exactly once (plain tumbling oracle; the sentinel's window
    stays beyond the final watermark and never emits)."""
    global _STREAM_SEQ
    import glob
    import shutil

    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    e = table(spark, sf_dir, "events").select("ts", "event_type", "value")
    max_ts = e.agg(F.max("ts")).collect()[0][0]  # one scalar, bounded
    pivot = F.lit(max_ts) - F.expr("INTERVAL 4 HOURS")
    a_rows = e.filter(F.col("ts") <= pivot)
    m_rows = e.filter(F.col("ts") > pivot)
    late_copies = e.filter(
        F.col("ts") <= F.lit(max_ts) - F.expr("INTERVAL 8 HOURS")
    )
    sentinel = e.limit(1).select(
        (F.lit(max_ts) + F.expr("INTERVAL 10 HOURS")).alias("ts"),
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
    )
    b_rows = late_copies.unionByName(sentinel)
    stage = tempfile.mkdtemp(prefix="stream_late_src_")

    def _stage_one(df, name: str, mtime: int) -> None:
        tmp = os.path.join(stage, f"_tmp_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(stage, name)
        shutil.move(part, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (mtime, mtime))  # file source orders by mtime

    _stage_one(a_rows, "a.parquet", 1_000_000_000)
    _stage_one(m_rows, "m.parquet", 1_000_000_100)
    _stage_one(b_rows, "b.parquet", 1_000_000_200)
    sdf = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .withWatermark("ts", "1 hour")
    )
    agg = (
        sdf.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
    )
    _STREAM_SEQ += 1
    name = f"stream_late_{_STREAM_SEQ}"
    with tempfile.TemporaryDirectory(prefix="stream_late_ckpt_") as ckpt, stream_partitions(spark):
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    shutil.rmtree(stage, ignore_errors=True)
    return spark.table(name).filter(F.col("event_type") != "sentinel")


STREAM_LATE_DROP_SQL = """
SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events
FROM events GROUP BY window_start, event_type
"""


def stream_orc_pipeline_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE reference pipeline, end to end, value-checked: replayable
    source → exactly-once streaming ORC sink (checkpointed,
    date-partitioned like the demo's Hive layout) → committed read.

    The oracle is ``SELECT * FROM events``: a hash match proves no
    row was lost, duplicated, or altered crossing the streaming
    commit boundary — the reference's exactly-once claim
    (``README.md:3``) as a value-level assertion. (Crash/restart
    idempotence is the kill/restart pytest; this query gates the
    happy path on every driver run.)"""
    global _STREAM_SEQ
    from flink_orc_sink_spark.streaming.orc_sink import (
        read_committed_orc,
        stream_from_files,
        stream_write_orc,
    )

    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stage = tempfile.mkdtemp(prefix="stream_pipe_src_")
    os.symlink(src, os.path.join(stage, "events.parquet"))
    _STREAM_SEQ += 1
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_pipe_"
        f"{os.path.basename(os.path.normpath(sf_dir))}_{_STREAM_SEQ}",
    )
    import shutil

    # A stale run's _spark_metadata manifest under the same path would
    # conflict with this run's fresh checkpoint (batch ids restart at
    # 0); the sink owns the directory, so start clean.
    shutil.rmtree(out, ignore_errors=True)
    with tempfile.TemporaryDirectory(prefix="stream_pipe_ckpt_") as ckpt, stream_partitions(spark):
        sdf = normalize_events_ts(
            stream_from_files(spark, stage, raw_schema)
        ).withColumn("dt", F.to_date("ts"))
        q = stream_write_orc(
            sdf,
            out,
            checkpoint=ckpt,
            partition_cols=["dt"],
            trigger={"availableNow": True},
        )
        q.awaitTermination()
    shutil.rmtree(stage, ignore_errors=True)
    return read_committed_orc(spark, out).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def _bucketed_table(
    spark: SparkSession, df: DataFrame, name: str, key: str, path: str
) -> DataFrame:
    """Write ``df`` as an 8-bucket, bucket-sorted external ORC table
    at ``path`` and return it re-read through the catalog (so Spark
    knows the bucketing and can plan shuffle-free joins on ``key``)."""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(path, ignore_errors=True)
    (
        df.write.format("orc")
        .option("path", path)
        .bucketBy(8, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(name)
    )
    return spark.table(name)


def orc_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CO-LOCATED JOIN via bucketed ORC tables: orders and customer
    are both written ``bucketBy(8, custkey)`` + bucket-sorted, then
    joined on the bucket key and rolled up to revenue per market
    segment. Because both sides hash into the SAME bucket layout,
    Spark plans the sort-merge join with NO shuffle exchange on
    either side (asserted in tests/test_maintenance.py with broadcast
    disabled) — the bucketing is the *storage-level* answer to the
    biggest cost at 100 TB, where re-shuffling a fact table for every
    fact-fact join dwarfs the query itself. This is the Spark
    equivalent of the reference's bucketer routing rows to fixed
    directories (``RowOrcBucketingSink.java:251-254``), promoted from
    a write-path detail to a query-time join strategy.

    Value gate: revenue rides int64 cents, so the rollup hash-matches
    the plain parquet-join oracle exactly — proving the bucketed
    write+read path loses nothing."""
    sf_tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_bucketed_{sf_tag}"
    )
    ot = _bucketed_table(
        spark,
        table(spark, sf_dir, "orders"),
        f"sg_bucketed_orders_{sf_tag}",
        "o_custkey",
        os.path.join(base, "orders"),
    )
    ct = _bucketed_table(
        spark,
        table(spark, sf_dir, "customer"),
        f"sg_bucketed_customer_{sf_tag}",
        "c_custkey",
        os.path.join(base, "customer"),
    )
    return (
        ot.join(ct, ot.o_custkey == ct.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


ORC_BUCKETED_JOIN_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
    AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def orc_snapshot_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT RETENTION / VACUUM at value level: a junk snapshot v1
    (every value doubled), a clean overwrite v2, then
    ``snapshot_expire(keep_last=1)`` deletes v1's manifest AND its
    now-unreferenced data files. The oracle is plain
    ``SELECT * FROM events``: the hash match proves GC left the live
    snapshot bit-identical while physically reclaiming the expired
    one (deletion-actually-happened and crash-order safety are
    pytest-asserted in tests/test_maintenance.py). This is the
    Delta VACUUM / Iceberg expire-snapshots half of the manifest
    lifecycle that ``orc_time_travel`` opens."""
    import shutil

    from flink_orc_sink_spark.sources.orc_sink import (
        snapshot_expire,
        snapshot_read,
        snapshot_write,
    )

    e = table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_orc_expire_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(out, ignore_errors=True)
    snapshot_write(e.withColumn("value", F.col("value") * 2), out)
    snapshot_write(e, out, mode="overwrite")
    snapshot_expire(out, keep_last=1)
    return snapshot_read(spark, out).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def stream_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED STATEFUL OPERATORS on the streaming runtime: a 10-minute
    tumbling count per event_type feeding a SECOND windowed
    aggregation that rolls the partials up to hourly — two stateful
    operators in one query (``window()`` over the first agg's window
    column), legal since Spark 3.5's multi-stateful-operator support
    and the shape of every streaming medallion pipeline (fine-grained
    bronze agg → coarse silver rollup without a batch hop).

    Append mode requires the watermark to pass a window before it
    emits, so the replay appends a far-future sentinel to flush all
    real windows (same trick as ``stream_late_data_drop``); counts
    are exact integers and must equal the batch hourly oracle.
    """
    global _STREAM_SEQ
    import glob
    import shutil

    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    e = table(spark, sf_dir, "events").select("ts", "event_type")
    # the sentinel only needs to outrun every real event so the final
    # watermark flushes all real windows — a fixed far-future literal
    # does that without a max(ts) scan
    sentinel = spark.range(1).select(
        F.lit("2100-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit("sentinel").alias("event_type"),
    )
    stage = tempfile.mkdtemp(prefix="stream_chain_src_")
    tmp = os.path.join(stage, "_tmp")
    e.unionByName(sentinel).coalesce(4).write.mode("overwrite").parquet(tmp)
    for i, part in enumerate(
        glob.glob(os.path.join(tmp, "part-*.parquet"))
    ):
        shutil.move(part, os.path.join(stage, f"{i}.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)
    sdf = (
        spark.readStream.schema("ts timestamp, event_type string")
        .parquet(stage)
        .withWatermark("ts", "1 hour")
    )
    ten_min = (
        sdf.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_10m"))
    )
    hourly = (
        ten_min.groupBy(
            F.window(F.col("w"), "1 hour").alias("h"), "event_type"
        )
        .agg(F.sum("n_10m").alias("n_events"))
        .select(
            F.col("h.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    _STREAM_SEQ += 1
    name = f"stream_chained_{_STREAM_SEQ}"
    with tempfile.TemporaryDirectory(prefix="stream_chain_ckpt_") as ckpt, stream_partitions(spark):
        q = (
            hourly.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    shutil.rmtree(stage, ignore_errors=True)
    return spark.table(name).filter(F.col("event_type") != "sentinel")


STREAM_CHAINED_SQL = """
SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
  COUNT(*) AS n_events
FROM events GROUP BY window_start, event_type
"""


def orc_bloom_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-FILTER FILE SKIPPING at value level: orders written
    hash-clustered on ``o_custkey`` into 8 ORC files (every file's
    [min,max] custkey range spans the whole domain, so the min/max
    index of ``orc_stats_pruned_read`` can skip NOTHING here), a
    file-level bloom index built over the key, then a point lookup
    answered by opening only the files whose bloom admits the key —
    hash clustering puts each key in exactly one file, so that's 1
    file (+ false positives) of 8. The oracle is the plain equality
    filter: blooms have no false negatives, so the hash match proves
    plan-time point-lookup skipping loses no rows. File-open counts
    are asserted in tests/test_scale_layouts.py."""
    import shutil

    from flink_orc_sink_spark.sources.orc_sink import (
        bloom_pruned_read,
        build_bloom_index,
    )

    o = table(spark, sf_dir, "orders")
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_orc_bloomidx_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    data = os.path.join(base, "data")
    idx = os.path.join(base, "index")
    o.repartition(8, "o_custkey").write.format("orc").save(data)
    build_bloom_index(spark, data, "o_custkey", idx)
    return bloom_pruned_read(spark, data, idx, "o_custkey", 7).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )


ORC_BLOOM_PRUNED_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM orders WHERE o_custkey = 7
"""


def orc_gdpr_erase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-TO-ERASURE at value level: events stored key-bucketed
    (``kb = user_id % 16``), three users physically deleted via
    ``erase_keys_orc`` — which rewrites ONLY the buckets those users
    hash to — then the whole table read back. The oracle is the plain
    ``NOT IN`` filter: a hash match proves the pruned rewrite removed
    exactly the requested keys and disturbed nothing else. Bucket
    mtime stability (untouched buckets not rewritten) is asserted in
    tests/test_maintenance.py."""
    import shutil

    from flink_orc_sink_spark.sources.orc_sink import erase_keys_orc

    e = table(spark, sf_dir, "events")
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_orc_gdpr_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    (
        e.withColumn("kb", F.pmod("user_id", F.lit(16)))
        .repartition("kb")
        .write.format("orc")
        .partitionBy("kb")
        .save(base)
    )
    erase = local_df(spark, [(3,), (9,), (27,)], "user_id long")
    erase_keys_orc(spark, base, erase, "user_id", "kb")
    return spark.read.orc(base).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


ORC_GDPR_SQL = """
SELECT event_id, ts, user_id, event_type, value, props
FROM events WHERE user_id NOT IN (3, 9, 27)
"""


def orc_quarantine_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALIDATED INGESTION with a dead-letter path at value level:
    events plus 50 planted-bad rows (negative values, NULL types)
    written through ``write_orc_validated`` — good rows to the table,
    bad rows UNCHANGED to quarantine. The oracle is plain
    ``SELECT * FROM events``: a hash match proves the expectation
    split admitted exactly the clean corpus and leaked nothing.
    Quarantine completeness (all 50 bad rows present, replayable) is
    pytest-asserted in tests/test_maintenance.py."""
    import shutil

    from flink_orc_sink_spark.sources.orc_sink import write_orc_validated

    e = table(spark, sf_dir, "events")
    bad = spark.range(50).select(
        (F.col("id") + 1_000_000_000).alias("event_id"),
        F.lit("2024-01-15 00:00:00").cast("timestamp").alias("ts"),
        F.col("id").alias("user_id"),
        F.when(F.col("id") % 2 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("click"))
        .alias("event_type"),
        F.lit(-1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_orc_quar_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    expectation = (
        F.col("event_type").isNotNull() & (F.col("value") >= 0)
    )
    write_orc_validated(
        e.unionByName(bad),
        os.path.join(base, "valid"),
        os.path.join(base, "quarantine"),
        expectation,
    )
    return spark.read.orc(os.path.join(base, "valid")).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def pyds_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM CONNECTOR (Spark 4 Python DataSource API) at value
    level: a pure-Python batch source generating 100k deterministic
    events across 8 real partitions
    (``sources/pydatasource.py``), aggregated per type. Every cell is
    ``event_id`` arithmetic, so the DuckDB oracle reproduces the
    connector's entire output from a ``range()`` — the hash match
    verifies the connector's partitioning and content end to end.
    This is the extension point for sources Spark lacks built-in
    (the reference's answer was "attach any Flink connector";
    ours is ~60 lines of Python)."""
    from flink_orc_sink_spark.sources.pydatasource import register

    register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 100_000)
        .option("n_users", 100)
        .option("n_partitions", 8)
        .load()
    )
    return df.groupBy("etype").agg(
        F.count("*").alias("n_events"),
        F.sum("value_cents").alias("sum_cents"),
        F.count_distinct("user_id").alias("n_users"),
    )


PYDS_AGG_SQL = """
WITH g AS (
  SELECT i AS event_id, i % 100 AS user_id,
    ['view', 'click', 'purchase', 'signup', 'error'][(i % 5) + 1]
      AS etype,
    (i * 37 + 11) % 10000 AS value_cents
  FROM (SELECT unnest(range(0, 100000)) AS i)
)
SELECT etype, COUNT(*) AS n_events,
  CAST(SUM(value_cents) AS BIGINT) AS sum_cents,
  COUNT(DISTINCT user_id) AS n_users
FROM g GROUP BY etype
"""


def stream_pyds_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python connector as a STREAMING source: offsets are
    row indices (replayable — the S2/Kafka rewind contract,
    ``README.md:22``), drained in 10k-row micro-batches into a
    complete-mode aggregation until the generator is exhausted. Same
    arithmetic oracle as the batch read: the hash match proves the
    offset-ranged micro-batches covered every row exactly once —
    no gap, no replayed overlap — across 5 distinct batches."""
    import time

    from flink_orc_sink_spark.sources.pydatasource import register

    global _STREAM_SEQ
    register(spark)
    sdf = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", 50_000)
        .option("n_users", 100)
        .option("rows_per_batch", 10_000)
        .load()
    )
    agg = sdf.groupBy("etype").agg(
        F.count("*").alias("n_events"),
        F.sum("value_cents").alias("sum_cents"),
    )
    _STREAM_SEQ += 1
    name = f"stream_pyds_{_STREAM_SEQ}"
    with tempfile.TemporaryDirectory(prefix="stream_pyds_ckpt_") as ckpt, stream_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            done = spark.sql(
                f"SELECT COALESCE(SUM(n_events), 0) AS t FROM {name}"
            ).collect()[0].t
            if done >= 50_000:
                break
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(30)
    return spark.table(name)


STREAM_PYDS_SQL = """
WITH g AS (
  SELECT i AS event_id,
    ['view', 'click', 'purchase', 'signup', 'error'][(i % 5) + 1]
      AS etype,
    (i * 37 + 11) % 10000 AS value_cents
  FROM (SELECT unnest(range(0, 50000)) AS i)
)
SELECT etype, COUNT(*) AS n_events,
  CAST(SUM(value_cents) AS BIGINT) AS sum_cents
FROM g GROUP BY etype
"""


def stream_pyds_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom connector with KAFKA-SHAPED offsets at value level:
    3 independent source partitions, each with its own cursor in the
    committed ``{partition: offset}`` map, advancing at deliberately
    skewed rates (p0 advances at a third of p2's rate — real topic
    partitions are never balanced), each owning a disjoint id
    namespace (``id = p·10⁶ + k``). Drained to exhaustion and
    aggregated per (partition, etype); the arithmetic oracle
    reproduces every cursor's full range, so the hash match proves
    per-partition offset tracking covered all three namespaces
    exactly once — no partition starved, none replayed. The restart/
    rebalance half of the contract (resume cursors, add a partition
    mid-stream) is pytest-pinned in tests/test_pydatasource.py."""
    import time

    from flink_orc_sink_spark.sources.pydatasource import register

    global _STREAM_SEQ
    register(spark)
    per_part, stride = 10_000, 1_000_000
    sdf = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", per_part)
        .option("n_users", 100)
        # skewed steps 4k/8k/12k per batch: the slowest partition
        # (p0) drains in 3 micro-batches — enough to prove multi-batch
        # per-partition cursor tracking without paying 5+ rounds of
        # micro-batch overhead (the restart/rebalance contract is
        # pytest-pinned separately)
        .option("rows_per_batch", 12_000)
        .option("n_stream_parts", 3)
        .option("id_stride", stride)
        .load()
    )
    agg = (
        sdf.groupBy(
            (F.col("event_id") / stride).cast("long").alias("partition"),
            F.col("etype"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value_cents").alias("sum_cents"),
        )
    )
    _STREAM_SEQ += 1
    name = f"stream_pyds_part_{_STREAM_SEQ}"
    with tempfile.TemporaryDirectory(prefix="stream_pydsp_ckpt_") as ckpt, stream_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + 120
        done = 0
        while time.time() < deadline:
            done = spark.sql(
                f"SELECT COALESCE(SUM(n_events), 0) AS t FROM {name}"
            ).collect()[0].t
            if done >= 3 * per_part:
                break
            time.sleep(0.25)
        q.stop()
        q.awaitTermination(30)
        if done < 3 * per_part:
            # the last poll can be one interval stale and stop()
            # lets an in-flight batch land in the memory sink —
            # re-read once before declaring failure
            done = spark.sql(
                f"SELECT COALESCE(SUM(n_events), 0) AS t FROM {name}"
            ).collect()[0].t
        if done < 3 * per_part:
            # Fail loudly: a partial complete-mode aggregate would
            # otherwise surface as a confusing oracle hash mismatch
            # instead of the real problem (slow/stuck stream).
            raise TimeoutError(
                f"stream_pyds_partitioned drained {done}/{3 * per_part} "
                "rows within 120s"
            )
    return spark.table(name)


def pyds_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's TWO-PHASE COMMIT protocol re-built on Spark 4's
    Python DataSource WRITER API and pushed through the value gate:
    events written via ``format("manifest_orc_py")`` (executor tasks
    write pyarrow-ORC files to ``data/``; the driver's ``commit``
    publishes them in an atomically-renamed manifest — the
    pending→committed lifecycle of ``RowOrcBucketingSink.java:153-177``
    spoken through the official connector hooks, see
    ``sources/pyds_sink.py``), an ORPHAN file planted in ``data/``
    (invisible: the committed reader never lists the directory), then
    read back manifest-only and hash-matched against
    ``SELECT * FROM events``."""
    import glob as _glob
    import shutil

    from flink_orc_sink_spark.sources.pyds_sink import (
        read_manifest_orc,
        register_sink,
    )

    register_sink(spark)
    e = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_pyds_sink_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(out, ignore_errors=True)
    e.repartition(4).write.format("manifest_orc_py").mode(
        "append"
    ).save(out)
    committed = _glob.glob(os.path.join(out, "data", "task-*.orc"))
    shutil.copy(
        committed[0], os.path.join(out, "data", "task-9999-orphan.orc")
    )
    return read_manifest_orc(spark, out).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def stream_pyds_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING side of the Python-DataSource sink: events
    replayed as three micro-batches through
    ``DataSourceStreamArrowWriter`` — per-batch manifests keyed by
    batch id, so a crash-replayed batch REPLACES its own manifest
    (originals become unreferenced orphans) instead of duplicating
    rows; restart exactly-once and replay idempotence are
    pytest-pinned in tests/test_pydatasource.py. Read back
    manifest-only, hash-matched against ``SELECT * FROM events``."""
    import shutil

    from flink_orc_sink_spark.sources.pyds_sink import (
        read_manifest_orc,
        register_sink,
    )

    register_sink(spark)
    src = os.path.join(sf_dir, "events.parquet")
    e = normalize_events_ts(spark.read.parquet(src)).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    stage = tempfile.mkdtemp(prefix="stream_pyds_sink_src_")
    e.repartition(3, "event_id").write.mode("overwrite").parquet(stage)
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_pyds_sink_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(out, ignore_errors=True)
    with tempfile.TemporaryDirectory(
        prefix="stream_pyds_sink_ckpt_"
    ) as ckpt, stream_partitions(spark):
        q = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stage)
            .writeStream.format("manifest_orc_py")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain_or_fail(q, 180, "python-datasource sink stream")
    shutil.rmtree(stage, ignore_errors=True)
    return read_manifest_orc(spark, out).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def stream_minhash_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS near-dup discovery ON the streaming runtime against
    the PERSISTED MinHash index: the documents corpus arrives as
    micro-batches (file source, one id-range file per trigger);
    each ``foreachBatch`` (1) finds within-batch pairs with the
    standard LSH pipeline, (2) probes the persisted band index for
    matches against everything already ingested (corpus text never
    re-read — ``operators/dedup.py::minhash_probe_index``), (3)
    appends the batch into the index (``append_to_minhash_index``)
    so later batches dedup against it, and (4) lands both pair sets
    in a batch-id-partitioned result table (idempotent under
    crash-replay). Because every pair is discovered exactly once —
    when its LATER member arrives — the accumulated pair set is
    INDEPENDENT of batch order and equals the one-shot batch answer:
    the oracle is the very same full-corpus MinHash SQL as
    ``docs_minhash_pairs``, so the hash match proves the streamed
    index accumulates to exactly the batch computation. The 100 TB
    shape of continuous training-data ingest: per-trigger cost is
    batch-sized, index probe cost is pre-bucketed, nothing ever
    rescans the corpus."""
    import shutil

    from flink_orc_sink_spark.operators.dedup import (
        append_to_minhash_index,
        build_minhash_index,
        minhash_dedup_pairs,
        minhash_probe_index,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    n_ranges = 4
    hi = d.agg(F.max("doc_id")).collect()[0][0] + 1
    step = -(-hi // n_ranges)

    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_mhidx_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    feed, idx, results = (
        os.path.join(base, "feed"),
        os.path.join(base, "idx"),
        os.path.join(base, "results"),
    )
    # range 0 bootstraps the index (build); ranges 1..3 arrive as the
    # stream — one file each, so each micro-batch is one id range
    boot = d.filter(F.col("doc_id") < step)
    build_minhash_index(boot, "doc_id", "text", idx)
    # pairs wholly inside the bootstrap range still need discovering
    (
        minhash_dedup_pairs(boot, "doc_id", "text", threshold=0.7)
        .withColumn("batch_id", F.lit(-1))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(results)
    )
    for i in range(1, n_ranges):
        (
            d.filter(
                (F.col("doc_id") >= i * step)
                & (F.col("doc_id") < (i + 1) * step)
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(feed)
        )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        from flink_orc_sink_spark.operators.dedup import shingle_hash_sets

        batch_df = batch_df.localCheckpoint(eager=True)  # consumed 3×
        # ONE tokenize+md5 pass per trigger (round 13): the batch's
        # shingle-hash sets feed the within-batch banding, the index
        # probe (bands + verification), and the append — five
        # signature/shingle passes used to re-hash the same batch text
        # per trigger. Materialized inside the try so a failure still
        # releases batch_df's blocks in the finally.
        sh = None
        try:
            sh = shingle_hash_sets(
                batch_df, "doc_id", "text"
            ).localCheckpoint(eager=True)
            within = minhash_dedup_pairs(
                batch_df, "doc_id", "text", threshold=0.7, shingles=sh
            ).select("doc_a", "doc_b", "jaccard")
            cross = minhash_probe_index(
                spark, batch_df, "doc_id", "text", idx, threshold=0.7,
                shingles=sh,
            ).select(
                F.least("new_doc", "match_doc").alias("doc_a"),
                F.greatest("new_doc", "match_doc").alias("doc_b"),
                "jaccard",
            )
            (
                within.unionByName(cross)
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(results)
            )
            # crash-replay idempotence: a marker per appended batch —
            # a replayed batch recomputes (and overwrites) its pair
            # partition but never re-appends the index. (The probe's
            # self-match guard covers the crash window between append
            # and marker.) Local-FS os.path here because the demo
            # index is local; on a cluster the marker is the same
            # one-element write against the DFS the index lives on.
            marker = os.path.join(idx, "appended", f"batch_{batch_id}")
            if not os.path.exists(marker):
                append_to_minhash_index(
                    batch_df, "doc_id", "text", idx,
                    owner=owner_cell[0], shingles=sh,
                )
                os.makedirs(marker, exist_ok=True)
        finally:
            if sh is not None:
                release_local_checkpoint(sh)
            release_local_checkpoint(batch_df)

    owner_cell = [None]
    _run_feed_stream(
        spark, feed, d.schema, on_batch, "index-ingest stream",
        owner_cell=owner_cell,
    )

    return (
        spark.read.parquet(results)
        .select("doc_a", "doc_b", "jaccard")
        .distinct()
    )


def stream_gram_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS exact-substring span excision ON the streaming
    runtime against the PERSISTED gram index — the fourth streaming
    index-ingest (after MinHash, IVF, aHash): documents arrive as
    ascending-id-range micro-batches; each ``foreachBatch`` (1) cuts
    the batch against the accumulated gram index (``operators/
    dedup.py::cut_spans_against_index`` — batch gram hashes broadcast
    onto a map-only index scan, the index never shuffles), (2) lands
    the cleaned docs in a batch-id result partition (idempotent
    overwrite under crash-replay), and (3) appends the batch's grams
    under its batch-id TAG — presence semantics make the replayed
    append itself a no-op, and the tag is the self-match guard: a
    replayed batch excludes its own earlier append at probe time,
    without which every replayed token would look corpus-duplicated
    and the batch would be cut to ''. Because ranges arrive in id
    order, ingest-order keep-first EQUALS global (doc, pos)
    keep-first, so the accumulated cleaned corpus must hash-match the
    one-shot ``docs_cut_dup_spans`` oracle verbatim — the streamed
    index provably accumulates to the batch computation."""
    import shutil

    from flink_orc_sink_spark.operators.dedup import (
        append_to_gram_index,
        build_gram_index,
        cut_dup_spans,
        cut_spans_against_index,
    )
    from flink_orc_sink_spark.queries.llm import _DUP_NGRAM_N

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    n_ranges = 4
    hi = d.agg(F.max("doc_id")).collect()[0][0] + 1
    step = -(-hi // n_ranges)

    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_gramidx_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    feed, idx, results = (
        os.path.join(base, "feed"),
        os.path.join(base, "idx"),
        os.path.join(base, "results"),
    )
    boot = d.filter(F.col("doc_id") < step)
    build_gram_index(boot, "doc_id", "text", idx, n=_DUP_NGRAM_N)
    (
        cut_dup_spans(boot, "doc_id", "text", n=_DUP_NGRAM_N)
        .withColumn("batch_id", F.lit(-1))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(results)
    )
    for i in range(1, n_ranges):
        (
            d.filter(
                (F.col("doc_id") >= i * step)
                & (F.col("doc_id") < (i + 1) * step)
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(feed)
        )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        from flink_orc_sink_spark.operators.dedup import (
            _gram_occurrences,
        )

        batch_df = batch_df.localCheckpoint(eager=True)  # consumed 2x
        # the batch's gram stream feeds FOUR plans (index probe,
        # within-batch dup agg, flag join, index append): materialize
        # the trigger-bounded fanout once instead of re-running
        # tokenize+posexplode per consumer. Job count is ~flat (each
        # broadcast keeps its own job; +1 checkpoint job per batch) —
        # the saving is the three redundant batch-text fanout PASSES,
        # which is CPU noise at sf0.1 but real work per trigger at
        # production batch sizes. occ materializes INSIDE the try so a
        # failure there still releases batch_df's blocks in the finally.
        occ = None
        try:
            occ = _gram_occurrences(
                batch_df, "doc_id", "text", _DUP_NGRAM_N
            ).localCheckpoint(eager=True)
            (
                cut_spans_against_index(
                    spark,
                    batch_df,
                    "doc_id",
                    "text",
                    idx,
                    n=_DUP_NGRAM_N,
                    exclude_tag=batch_id,
                    occurrences=occ,
                )
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(results)
            )
            append_to_gram_index(
                batch_df, "doc_id", "text", idx, n=_DUP_NGRAM_N,
                tag=batch_id, owner=owner_cell[0], occurrences=occ,
            )
        finally:
            if occ is not None:
                release_local_checkpoint(occ)
            release_local_checkpoint(batch_df)

    owner_cell = [None]
    _run_feed_stream(
        spark, feed, d.schema, on_batch, "gram-ingest stream",
        owner_cell=owner_cell,
    )

    return spark.read.parquet(results).select(
        F.col("doc").alias("doc_id"), "clean_text", "n_kept", "n_removed"
    )


def stream_bm25_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS retrieval-index ingest ON the streaming runtime —
    the FIFTH streaming index-ingest (after MinHash, IVF, aHash,
    gram), the production "search index stays fresh as the corpus
    streams in" shape: documents arrive as id-range micro-batches;
    each ``foreachBatch`` admits its batch into the persisted BM25
    index by PURE INSERTION (``operators/retrieval.py::
    append_to_bm25_index`` — bucket-partitioned postings plus one
    additive stats delta, no read, no merge, no corpus pass). After
    the drain, ONE probe of the accumulated index must hash-match the
    one-shot ``BM25_SQL`` over all documents — the streamed index
    provably converges to the batch build, with exact df (recomputed
    from pruned postings at probe time) and bit-identical avgdl
    (delta-summed longs divide exactly like the one-shot average).
    Crash-replay: a replayed batch double-appends identical postings
    and stats rows; the probe dedups AT READ TIME — postings by
    (token, doc_id), stats by tag — so replay shifts no score
    (hazard + guard pinned in pytest). 100 TB shape: per-trigger cost
    is batch-sized; the probe reads only the query terms' bucket
    directories at the file listing."""
    import shutil

    from flink_orc_sink_spark.operators.retrieval import (
        append_to_bm25_index,
        bm25_probe_index,
        build_bm25_index,
    )
    from flink_orc_sink_spark.queries.llm import BM25_TERMS

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    n_ranges = 4
    hi = d.agg(F.max("doc_id")).collect()[0][0] + 1
    step = -(-hi // n_ranges)

    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_bm25idx_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    feed, idx = os.path.join(base, "feed"), os.path.join(base, "idx")
    build_bm25_index(
        d.filter(F.col("doc_id") < step), "doc_id", "text", idx
    )
    for i in range(1, n_ranges):
        (
            d.filter(
                (F.col("doc_id") >= i * step)
                & (F.col("doc_id") < (i + 1) * step)
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(feed)
        )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        append_to_bm25_index(
            batch_df, "doc_id", "text", idx, tag=batch_id,
            owner=owner_cell[0],
        )

    owner_cell = [None]
    _run_feed_stream(
        spark, feed, d.schema, on_batch, "bm25-ingest stream",
        owner_cell=owner_cell,
    )

    return bm25_probe_index(spark, idx, list(BM25_TERMS), k=20)


def stream_emb_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS embedding near-dup discovery ON the streaming
    runtime against the PERSISTED IVF index — the vector-side twin of
    ``stream_minhash_index_ingest``, closing the multimodal ingest
    loop: embedding vectors (the planted near-dup corpus of
    ``emb_neardup_pairs``) arrive as micro-batches; each
    ``foreachBatch`` (1) finds within-batch pairs exactly
    (batch-sized all-pairs — batches are small by construction), (2)
    probes the persisted cell-partitioned IVF index for cosine ≥ 0.9
    matches against everything already ingested — a partition-pruned
    read of the ``nprobe`` probed cells only, never a corpus scan —
    then (3) appends the batch into the index under a replay marker
    so a crash-replayed batch rewrites its result partition but never
    double-appends. Every pair is discovered exactly once, when its
    LATER member arrives, so the accumulated set is batch-order
    independent and equals the one-shot exact answer: the oracle is
    the very same all-pairs SQL as ``emb_neardup_pairs`` (validated
    batch-wise at sf0.001/0.01/0.1 before wiring the stream). The
    probe is honest IVF (nprobe=8 of 32 cells) — a near-identical
    pair straddling probe cells would be the documented approximation
    trade. For the planted corpus the original's cell lands in every
    clone's probe set (EMPIRICALLY pinned at sf0.001/0.01/0.1 with
    the fixed seed — near-identical vectors sit far from Voronoi
    boundaries in practice, but this is a measured property, not a
    theorem), so the value hash is exact; contrast
    ``stream_media_index_ingest`` where banding makes the same claim
    pigeonhole-PROVABLE.
    100 TB shape: per-trigger cost is batch-sized; index reads prune
    to probed cells at the FILE LISTING; centroid drift stays a
    rebuild decision exactly as in production IVF systems."""
    import shutil

    from flink_orc_sink_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        embedding_neardup_pairs,
        ivf_threshold_matches,
    )
    from flink_orc_sink_spark.queries.llm import _plant_emb_neardups

    # the planted corpus is consumed by ~6 downstream jobs (max, boot
    # build, boot pairs, two feed writes); checkpoint the pandas-UDF
    # planting once instead of re-running it per job (measured 26 s ->
    # 11 s on the index build alone at sf0.1)
    e = _plant_emb_neardups(
        table(spark, sf_dir, "embeddings")
    ).localCheckpoint(eager=True)
    hi = (
        e.filter(F.col("vec_id") < 1_000_000)
        .agg(F.max("vec_id"))
        .collect()[0][0]
        + 1
    )
    half = hi // 2

    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_ivfidx_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    feed, idx, results = (
        os.path.join(base, "feed"),
        os.path.join(base, "idx"),
        os.path.join(base, "results"),
    )
    # the first id range bootstraps the index (train + build); the
    # rest of the corpus and then the clone range arrive as the
    # stream, one file per micro-batch
    boot = e.filter(F.col("vec_id") < half)
    # centroids are immutable between rebuilds (appends assign to the
    # EXISTING quantizer), so load-once here replaces two parquet-scan
    # + collect jobs per micro-batch below
    centroids = build_ivf_index(boot, "vec_id", "embedding", idx, nlist=32)
    (
        embedding_neardup_pairs(boot, "vec_id", "embedding", 0.9)
        .withColumn("batch_id", F.lit(-1))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(results)
    )
    for rng in (
        (F.col("vec_id") >= half) & (F.col("vec_id") < 1_000_000),
        F.col("vec_id") >= 1_000_000,
    ):
        e.filter(rng).coalesce(1).write.mode("append").parquet(feed)
    schema = e.schema
    release_local_checkpoint(e)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)  # consumed 3×
        try:
            within = embedding_neardup_pairs(
                batch_df, "vec_id", "embedding", 0.9
            )
            # threshold-complete probe (no top-k cap): near-dup
            # semantics are "every pair above the line", so a query
            # with >k true neighbors must not silently lose matches
            cross = ivf_threshold_matches(
                spark, batch_df, idx, "vec_id", "embedding",
                threshold=0.9, nprobe=8, centroids=centroids,
            ).select(
                F.least("qid", "cid").alias("id_a"),
                F.greatest("qid", "cid").alias("id_b"),
                "cos_sim",
            )
            (
                within.unionByName(cross)
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(results)
            )
            marker = os.path.join(idx, "appended", f"batch_{batch_id}")
            if not os.path.exists(marker):
                append_to_ivf_index(
                    batch_df, "vec_id", "embedding", idx,
                    owner=owner_cell[0], centroids=centroids,
                )
                os.makedirs(marker, exist_ok=True)
        finally:
            release_local_checkpoint(batch_df)

    owner_cell = [None]
    _run_feed_stream(
        spark, feed, schema, on_batch, "index-ingest stream",
        owner_cell=owner_cell,
    )

    return (
        spark.read.parquet(results)
        .select("id_a", "id_b", "cos_sim")
        .distinct()
    )


def stream_media_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS perceptual-dedup ingest for MEDIA — the third leg of
    the persisted-index triad (text: ``stream_minhash_index_ingest``,
    embeddings: ``stream_emb_index_ingest``): real planted PNGs (the
    ``multimodal_phash_neardup`` corpus — 100 originals + 100
    two-pixel-perturbed clones) arrive as micro-batches of binary
    blobs; each ``foreachBatch`` (1) DECODES and average-hashes the
    batch (the only pass that ever touches pixels), (2) finds
    within-batch pairs by banded Hamming search, (3) probes the
    PERSISTED band-partitioned hash index for matches against
    everything already ingested — hashes only, media bytes never
    re-decoded — and (4) appends the batch under a replay marker.
    Unlike the IVF probe, banding at Hamming ≤ 3 over 4 bands is
    pigeonhole-COMPLETE, so the accumulated pair set is EXACTLY the
    one-shot answer and the oracle is the very same arithmetic SQL as
    ``multimodal_phash_neardup``. The 100 TB shape of a media
    curation pipeline: per-trigger decode cost is batch-sized, the
    index carries ~70 B/image, and dedup cost scales with the batch,
    never the corpus of stored media."""
    import shutil

    from flink_orc_sink_spark.operators.multimodal import (
        ahash_neardup_pairs,
        ahash_probe_index,
        append_to_ahash_index,
        attach_planted_png,
        build_ahash_index,
        image_ahash,
    )

    # 2 partitions per 100-image range (round 13): the planted encode
    # kernel is ~ms per image, so the old 8-way ranges just paid the
    # ~250 ms fixed Python-task overhead 16× per downstream UDF stage
    base_ids = spark.range(0, 100, 1, 2).select(F.col("id").alias("media_id"))
    clone_ids = spark.range(0, 100, 1, 2).select(
        (F.col("id") + 1000).alias("media_id")
    )
    # the planted-PNG corpus is consumed by ~5 downstream jobs (boot
    # hash, index build, boot pairs, two feed writes); checkpoint the
    # Python PNG-encode once instead of re-running it per job
    blobs = (
        attach_planted_png(base_ids, "media_id")
        .unionByName(
            attach_planted_png(
                clone_ids.withColumn("src_id", F.col("media_id") - 1000)
                .select(F.col("src_id").alias("plant_id"), "media_id"),
                "plant_id",
                perturb=True,
            ).select("media_id", "png")
        )
        .localCheckpoint(eager=True)
    )

    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_mediaidx_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    feed, idx, results = (
        os.path.join(base, "feed"),
        os.path.join(base, "idx"),
        os.path.join(base, "results"),
    )
    # first half of the originals bootstraps the index; the rest of
    # the originals and then the clone wave arrive as the stream.
    # The boot HASHES are checkpointed too (round 13): the index
    # build's repartitionByRange samples its upstream once more and
    # the within-boot banded self-join references the frame from two
    # branches, so the un-materialized form re-ran the decode+hash
    # UDF ~4× (measured 21 s worker CPU on this query, mostly fixed
    # per-task overhead of those repeated Python stages)
    boot = image_ahash(
        blobs.filter(F.col("media_id") < 50), "media_id", "png"
    ).localCheckpoint(eager=True)
    try:
        build_ahash_index(boot, "media_id", "ahash", idx)
        (
            ahash_neardup_pairs(boot, max_hamming=3)
            .withColumn("batch_id", F.lit(-1))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(results)
        )
    finally:
        release_local_checkpoint(boot)
    for rng in (
        (F.col("media_id") >= 50) & (F.col("media_id") < 1000),
        F.col("media_id") >= 1000,
    ):
        blobs.filter(rng).coalesce(1).write.mode("append").parquet(feed)
    release_local_checkpoint(blobs)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        hashes = image_ahash(batch_df, "media_id", "png").localCheckpoint(
            eager=True  # decode ONCE; consumed by pairs + probe + append
        )
        try:
            within = ahash_neardup_pairs(hashes, max_hamming=3)
            cross = ahash_probe_index(
                spark, hashes, "media_id", "ahash", idx, max_hamming=3
            ).select(
                F.least("new_id", "match_id").alias("id_a"),
                F.greatest("new_id", "match_id").alias("id_b"),
                "hamming",
            )
            (
                within.unionByName(cross)
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(results)
            )
            marker = os.path.join(idx, "appended", f"batch_{batch_id}")
            if not os.path.exists(marker):
                append_to_ahash_index(
                    hashes, "media_id", "ahash", idx,
                    owner=owner_cell[0],
                )
                os.makedirs(marker, exist_ok=True)
        finally:
            release_local_checkpoint(hashes)

    owner_cell = [None]
    _run_feed_stream(
        spark, feed, "media_id long, png binary", on_batch,
        "index-ingest stream", owner_cell=owner_cell,
    )

    return (
        spark.read.parquet(results)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def _apply_index_commands(
    spark: SparkSession,
    idx: str,
    batch_df: DataFrame,
    batch_id: int,
    owner: str | None = None,
) -> None:
    """Apply one ``(op, doc_id, text)`` command batch (adds + deletes)
    to the persisted MinHash index, IDEMPOTENT under crash-replay:

    - deletes run first and always (tombstone appends are
      duplicate-insensitive), so within one batch a del of X followed
      by a re-add of X leaves X live;
    - the append is guarded by a per-batch marker (a replayed batch
      must never double-append — read-time dedup would hide row
      duplicates, but bucket-cap decisions count distinct docs and
      the index should not grow unboundedly under replay);
    - on REPLAY of a committed batch (marker present) the adds'
      readmission is re-applied anyway: the replayed deletes above
      just re-tombstoned any re-added ids, and skipping the readmit
      would leave them forgotten — changing probe results, the one
      thing a replay must never do.
    """
    from flink_orc_sink_spark.operators.dedup import (
        append_to_minhash_index,
        forget_from_minhash_index,
    )
    from flink_orc_sink_spark.operators.retention import readmit_ids

    dels = batch_df.filter(F.col("op") == "del").select("doc_id")
    if not dels.isEmpty():
        forget_from_minhash_index(dels, idx)
    adds = batch_df.filter(F.col("op") == "add").select("doc_id", "text")
    if adds.isEmpty():
        return
    marker = os.path.join(idx, "appended", f"batch_{batch_id}")
    if not os.path.exists(marker):
        # appends readmit their ids internally (retention.py)
        append_to_minhash_index(
            adds, "doc_id", "text", idx, owner=owner
        )
        os.makedirs(marker, exist_ok=True)
    else:
        readmit_ids(adds.select("doc_id"), idx)


def stream_index_forget_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAKEDOWNS ARRIVING IN-STREAM: the persisted MinHash index is
    maintained by a command stream of adds AND deletes — the
    production shape where GDPR/erasure requests interleave with
    ingest (the streaming capstone of the retention family,
    ``operators/retention.py``). The corpus's %3==0 docs bootstrap the
    index; two micro-batches append the rest; a third CONTROL batch
    carries ``op='del'`` rows tombstoning every boot doc with
    doc_id%7==3 (``forget_from_minhash_index`` — O(deleted), no index
    rewrite mid-stream) and then RE-ADDS the odd half of them in the
    same trigger (appends readmit their ids — GDPR re-consent). Batch
    effects are order-independent by construction: add batches touch
    ids disjoint from the control batch, and the control batch's
    del→add ordering is internal to one ``foreachBatch``. After the
    stream drains, the %10==0 batch probes the index merge-on-read;
    the value oracle is the from-scratch probe SQL over corpus minus
    the still-forgotten ids (%3==0 ∧ %7==3 ∧ even) — one hash proves
    in-stream deletes stop matching immediately, re-added docs match
    again, and the readmit-duplicated index rows change nothing
    (read-time dedup). 100 TB shape: per-trigger cost is batch-sized
    for adds and deleted-sized for tombstones; the probe's
    merge-on-read tax is one broadcast anti-join."""
    import shutil

    from flink_orc_sink_spark.operators.dedup import (
        build_minhash_index,
        minhash_probe_index,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    new = d.filter(F.col("doc_id") % 10 == 0)

    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_fidx_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    feed, idx = os.path.join(base, "feed"), os.path.join(base, "idx")

    boot = corpus.filter(F.col("doc_id") % 3 == 0)
    build_minhash_index(boot, "doc_id", "text", idx)

    add = F.lit("add")
    for i in (1, 2):
        (
            corpus.filter(F.col("doc_id") % 3 == i)
            .select(add.alias("op"), "doc_id", "text")
            .coalesce(1)
            .write.mode("append")
            .parquet(feed)
        )
    # control batch: forget boot∩(%7==3), re-add its odd members —
    # one trigger, so the del→add order is ours, not the scheduler's
    forget = boot.filter(F.col("doc_id") % 7 == 3)
    (
        forget.select(
            F.lit("del").alias("op"), "doc_id", F.lit(None).cast("string").alias("text")
        )
        .unionByName(
            forget.filter(F.col("doc_id") % 2 == 1).select(
                add.alias("op"), "doc_id", "text"
            )
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(feed)
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)  # consumed 2×
        try:
            _apply_index_commands(
                spark, idx, batch_df, batch_id, owner=owner_cell[0]
            )
        finally:
            release_local_checkpoint(batch_df)

    owner_cell = [None]
    _run_feed_stream(
        spark, feed, "op string, doc_id long, text string", on_batch,
        "forget-ingest stream", owner_cell=owner_cell,
    )

    return minhash_probe_index(
        spark, new, "doc_id", "text", idx, threshold=0.7
    )


# --- Bench-only phase split of the forget lifecycle (round-10 verdict
# #6): ``stream_index_forget_ingest`` times four distinct phases as
# one ~26 s blob — the single largest headline entry, which cost a
# round of warm-up archaeology to attribute. The phases below get
# their own regression-gated numbers; the registered lifecycle query
# keeps the value oracle (correctness unchanged). Phases CHAIN through
# one persistent base dir and ONE streaming checkpoint: the source WAL
# carries the file cursor across the timed calls, so the forget phase
# drains exactly the control batch — the same per-trigger cost a
# production stream pays for a takedown, not a replay of the adds.


def _bench_fidx_paths(sf_dir: str) -> tuple[str, str, str, str]:
    # per-process token (round-11 advice #3): the phases chain through
    # one base dir WITHIN a run, but two concurrent runs on the same
    # scale factor (bench + pytest, or two bench invocations) must not
    # share an index/feed/checkpoint tree — the chained WAL cursors
    # would corrupt each other mid-run. The PID scopes the tree to the
    # driver process that runs all four phases; SPARK_GRAFT_RUN_TOKEN
    # (set once by bench.py) lets a multi-process harness opt into one
    # shared token explicitly.
    token = os.environ.get("SPARK_GRAFT_RUN_TOKEN") or str(os.getpid())
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_fidx_bench_"
        f"{os.path.basename(os.path.normpath(sf_dir))}_{token}",
    )
    return (
        base,
        os.path.join(base, "feed"),
        os.path.join(base, "idx"),
        os.path.join(base, "ckpt"),
    )


def _fidx_on_batch(spark: SparkSession, idx: str, owner_cell: list):
    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)  # consumed 2×
        try:
            _apply_index_commands(
                spark, idx, batch_df, batch_id, owner=owner_cell[0]
            )
        finally:
            release_local_checkpoint(batch_df)

    return on_batch


def bench_fidx_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENCH-ONLY: the bootstrap phase alone — one-time banded-LSH
    index build over the %3==0 boot corpus (the amortized cost a
    production index pays once, not per takedown)."""
    import shutil

    from flink_orc_sink_spark.operators.dedup import build_minhash_index

    base, _feed, idx, _ckpt = _bench_fidx_paths(sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    boot = d.filter(
        (F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 3 == 0)
    )
    build_minhash_index(boot, "doc_id", "text", idx)
    return spark.range(1)


def bench_fidx_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENCH-ONLY: steady-state ingest — the two add micro-batches
    drained through the checkpointed feed stream (per-trigger cost is
    batch-sized; this is the number that must stay flat as the index
    grows)."""
    _base, feed, idx, ckpt = _bench_fidx_paths(sf_dir)
    if not os.path.isdir(idx):
        raise RuntimeError("stream_fidx_build must run before ingest")
    corpus = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 10 != 0)
    )
    for i in (1, 2):
        (
            corpus.filter(F.col("doc_id") % 3 == i)
            .select(F.lit("add").alias("op"), "doc_id", "text")
            .coalesce(1)
            .write.mode("append")
            .parquet(feed)
        )
    owner_cell = [None]
    _run_feed_stream(
        spark,
        feed,
        "op string, doc_id long, text string",
        _fidx_on_batch(spark, idx, owner_cell),
        "fidx ingest phase",
        owner_cell=owner_cell,
        ckpt=ckpt,
    )
    return spark.range(1)


def bench_fidx_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENCH-ONLY: the takedown trigger — del tombstones for
    boot∩(%7==3) plus the re-add of their odd half, ONE control batch
    resumed from the same checkpoint (the WAL cursor skips the already
    -committed add files, so this times exactly the O(deleted)
    tombstone append + the readmit)."""
    _base, feed, idx, ckpt = _bench_fidx_paths(sf_dir)
    if not os.path.isdir(ckpt):
        raise RuntimeError("stream_fidx_ingest must run before forget")
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    forget = d.filter(
        (F.col("doc_id") % 10 != 0)
        & (F.col("doc_id") % 3 == 0)
        & (F.col("doc_id") % 7 == 3)
    )
    (
        forget.select(
            F.lit("del").alias("op"),
            "doc_id",
            F.lit(None).cast("string").alias("text"),
        )
        .unionByName(
            forget.filter(F.col("doc_id") % 2 == 1).select(
                F.lit("add").alias("op"), "doc_id", "text"
            )
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(feed)
    )
    owner_cell = [None]
    _run_feed_stream(
        spark,
        feed,
        "op string, doc_id long, text string",
        _fidx_on_batch(spark, idx, owner_cell),
        "fidx forget phase",
        owner_cell=owner_cell,
        ckpt=ckpt,
    )
    return spark.range(1)


def bench_fidx_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENCH-ONLY: the merge-on-read probe of the maintained index —
    the steady-state query cost (tombstone anti-join included)."""
    from flink_orc_sink_spark.operators.dedup import minhash_probe_index

    _base, _feed, idx, _ckpt = _bench_fidx_paths(sf_dir)
    if not os.path.isdir(idx):
        raise RuntimeError("stream_fidx_build must run before the probe")
    new = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 10 == 0)
    )
    return minhash_probe_index(
        spark, new, "doc_id", "text", idx, threshold=0.7
    )


BENCH_ONLY = {
    "stream_fidx_build": bench_fidx_build,
    "stream_fidx_ingest": bench_fidx_ingest,
    "stream_fidx_forget": bench_fidx_forget,
    "stream_fidx_probe": bench_fidx_probe,
}


def stream_backfill_live_handoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's replay contract (``README.md:19-22``: rebuild
    state, rewind Kafka offsets) as the Spark-native BACKFILL → LIVE
    handoff, pushed through the VALUE gate: the historical backlog
    (¾ of events, three files — a multi-batch drain) arrives under
    ``trigger=availableNow``
    into the exactly-once ORC sink; then the SAME checkpoint reopens
    under a continuous ``processingTime`` trigger and the live tail
    (the remaining ¼) arrives while the query runs. The source WAL
    must carry the file cursor across the trigger-mode switch — the
    oracle is the plain full-table SELECT, so the hash match proves
    no row was lost, duplicated, or altered crossing the handoff.
    This is how a production pipeline bootstraps: batch-drain years
    of history, then flip the same checkpoint to live ingestion
    (the trigger-switch twin of ``stream_orc_pipeline_events``;
    crash/restart idempotence and the pytest variant live in
    tests/test_streaming_sink.py)."""
    global _STREAM_SEQ
    import shutil
    import time

    from flink_orc_sink_spark.streaming.orc_sink import (
        read_committed_orc,
        stream_from_files,
        stream_write_orc,
    )

    d = table(spark, sf_dir, "events")  # normalized µs ts, UTC
    total = d.count()
    _STREAM_SEQ += 1
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_handoff_"
        f"{os.path.basename(os.path.normpath(sf_dir))}_{_STREAM_SEQ}",
    )
    shutil.rmtree(base, ignore_errors=True)
    feed, out = os.path.join(base, "feed"), os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    for part in (0, 1, 2):  # the backlog: one file per id class
        d.filter(F.col("event_id") % 4 == part).coalesce(1).write.mode(
            "append"
        ).parquet(feed)

    with stream_partitions(spark):
        q = stream_write_orc(
            stream_from_files(
                spark, feed, d.schema, max_files_per_trigger=1
            ),
            out,
            checkpoint=ckpt,
            trigger={"availableNow": True},
        )
        _drain_or_fail(q, 120, "backfill drain")

        # live phase: SAME checkpoint, continuous trigger; the tail
        # arrives while the query runs
        q = stream_write_orc(
            stream_from_files(spark, feed, d.schema),
            out,
            checkpoint=ckpt,
            trigger={"processingTime": "0 seconds"},
        )
        try:
            d.filter(F.col("event_id") % 4 == 3).coalesce(1).write.mode(
                "append"
            ).parquet(feed)
            deadline = time.time() + 120
            done = 0
            while time.time() < deadline:
                done = read_committed_orc(spark, out).count()
                if done >= total:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
            q.awaitTermination(30)
        if done < total:
            # the last poll can be up to one interval stale, and
            # stop() lets an in-flight batch commit — re-read once
            # before declaring failure so a drain finishing in the
            # final window is not misreported
            done = read_committed_orc(spark, out).count()
        if done < total:
            raise TimeoutError(
                f"handoff drained {done}/{total} rows within 120s"
            )
    return read_committed_orc(spark, out).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def _stream_media_ingest_sql() -> str:
    # pigeonhole-complete banding ⇒ the streamed accumulation IS the
    # one-shot answer; reuse the planted-arithmetic oracle verbatim
    from flink_orc_sink_spark.queries.llm import PHASH_NEARDUP_SQL

    return PHASH_NEARDUP_SQL


def _stream_emb_ingest_sql() -> str:
    # the ONE-SHOT exact oracle: identical pair set, because each pair
    # is discovered exactly once (when its later member arrives)
    from flink_orc_sink_spark.queries.llm import EMB_NEARDUP_SQL

    return EMB_NEARDUP_SQL


def _stream_minhash_ingest_sql() -> str:
    # the ONE-SHOT batch oracle: identical pair set, because each pair
    # is discovered exactly once (when its later member arrives)
    from flink_orc_sink_spark.queries.llm import _minhash_sql

    return _minhash_sql(0.7)


STREAM_MINHASH_INGEST_SQL = _stream_minhash_ingest_sql()


def _stream_index_forget_sql() -> str:
    # from-scratch probe over corpus minus the STILL-forgotten ids:
    # tombstoned in the control batch (%3==0 ∧ %7==3) and not
    # re-added (re-adds are the odd half)
    from flink_orc_sink_spark.queries.llm import _minhash_ctes

    return f"""
WITH {_minhash_ctes(0.7)}
SELECT
  CASE WHEN doc_a % 10 = 0 THEN doc_a ELSE doc_b END AS new_doc,
  CASE WHEN doc_a % 10 = 0 THEN doc_b ELSE doc_a END AS match_doc,
  jaccard
FROM verified
WHERE (doc_a % 10 = 0) <> (doc_b % 10 = 0)
  AND NOT (
    CASE WHEN doc_a % 10 = 0 THEN doc_b ELSE doc_a END % 3 = 0
    AND CASE WHEN doc_a % 10 = 0 THEN doc_b ELSE doc_a END % 7 = 3
    AND CASE WHEN doc_a % 10 = 0 THEN doc_b ELSE doc_a END % 2 = 0
  )
"""


STREAM_INDEX_FORGET_SQL = _stream_index_forget_sql()


STREAM_PYDS_PART_SQL = """
WITH g AS (
  SELECT p.p * 1000000 + k.k AS event_id, p.p AS partition
  FROM (SELECT unnest(range(0, 3)) AS p) p,
       (SELECT unnest(range(0, 10000)) AS k) k
),
e AS (
  SELECT partition,
    ['view', 'click', 'purchase', 'signup', 'error']
      [(event_id % 5) + 1] AS etype,
    (event_id * 37 + 11) % 10000 AS value_cents
  FROM g
)
SELECT CAST(partition AS BIGINT) AS partition, etype,
  COUNT(*) AS n_events,
  CAST(SUM(value_cents) AS BIGINT) AS sum_cents
FROM e GROUP BY partition, etype
"""


def stream_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING DEAD-LETTER QUEUE at value level: the events stream
    plus 50 planted-bad rows (NULL types, negative values) replayed
    through ``stream_quarantine_orc`` — per micro-batch, good rows to
    the table, bad rows unchanged to quarantine, both sides
    batch-id-idempotent. The oracle is plain ``SELECT * FROM
    events``: a hash match proves the streaming split admitted
    exactly the clean corpus across every micro-batch. Quarantine
    completeness + NULL routing are pytest-asserted in
    tests/test_streaming_sink.py."""
    global _STREAM_SEQ
    import glob
    import shutil

    from flink_orc_sink_spark.streaming.orc_sink import (
        stream_quarantine_orc,
    )

    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    e = table(spark, sf_dir, "events")
    bad = spark.range(50).select(
        (F.col("id") + 1_000_000_000).alias("event_id"),
        F.lit("2024-01-15 00:00:00").cast("timestamp").alias("ts"),
        F.col("id").alias("user_id"),
        F.when(F.col("id") % 2 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("click"))
        .alias("event_type"),
        F.lit(-1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    stage = tempfile.mkdtemp(prefix="stream_quar_src_")
    tmp = os.path.join(stage, "_tmp")
    e.unionByName(bad).coalesce(4).write.mode("overwrite").parquet(tmp)
    for i, part in enumerate(glob.glob(os.path.join(tmp, "part-*.parquet"))):
        shutil.move(part, os.path.join(stage, f"{i}.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stage)
    )
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_quar_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    valid, quar = os.path.join(base, "valid"), os.path.join(base, "dlq")
    expectation = F.col("event_type").isNotNull() & (F.col("value") >= 0)
    _STREAM_SEQ += 1
    with tempfile.TemporaryDirectory(prefix="stream_quar_ckpt_") as ckpt, stream_partitions(spark):
        q = stream_quarantine_orc(
            sdf,
            valid,
            quar,
            ckpt,
            expectation,
            trigger={"availableNow": True},
        )
        q.awaitTermination()
    shutil.rmtree(stage, ignore_errors=True)
    return spark.read.orc(valid).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def stream_sessionize_dynamic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DYNAMIC-GAP session windows ON THE STREAMING RUNTIME:
    ``session_window`` with a per-event gap EXPRESSION (click/view
    keep the session alive 5 minutes, everything else 30) — the
    session-store merge now depends on each event's type, the
    hardest built-in session shape. The batch
    ``events_sessionize_dynamic`` uses the identical
    previous-event-gap semantics, so the streaming state-store
    result must hash-match the batch gaps-and-islands SQL aggregated
    to (user, session) rows."""
    global _STREAM_SEQ
    table(spark, sf_dir, "events")  # pin nanosAsLong + UTC
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stage = tempfile.mkdtemp(prefix="stream_dsess_src_")
    os.symlink(src, os.path.join(stage, "events.parquet"))
    sdf = normalize_events_ts(
        spark.readStream.schema(raw_schema).parquet(stage)
    )
    gap = F.when(
        F.col("event_type").isin("click", "view"), F.lit("5 minutes")
    ).otherwise(F.lit("30 minutes"))
    agg = (
        sdf.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )
    _STREAM_SEQ += 1
    name = f"stream_sessionize_dynamic_{_STREAM_SEQ}"
    with tempfile.TemporaryDirectory(prefix="stream_dsess_ckpt_") as ckpt, stream_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    return spark.table(name)


STREAM_SESSIONIZE_DYNAMIC_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN MAX(EPOCH_US(ts)
                  + (CASE WHEN event_type IN ('click', 'view')
                          THEN 5 ELSE 30 END) * 60000000)
             OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             IS NULL
              OR EPOCH_US(ts) >= MAX(EPOCH_US(ts)
                  + (CASE WHEN event_type IN ('click', 'view')
                          THEN 5 ELSE 30 END) * 60000000)
             OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
  SELECT user_id, ts,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS session_seq
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
  COUNT(*) AS n_events
FROM sessions GROUP BY user_id, session_seq
"""


QUERIES = {
    "stream_sessionize_dynamic": stream_sessionize_dynamic,
    "stream_quarantine": stream_quarantine,
    "pyds_source_agg": pyds_source_agg,
    "stream_pyds_source": stream_pyds_source,
    "stream_pyds_partitioned": stream_pyds_partitioned,
    "pyds_sink_roundtrip": pyds_sink_roundtrip,
    "stream_pyds_sink": stream_pyds_sink,
    "stream_minhash_index_ingest": stream_minhash_index_ingest,
    "stream_emb_index_ingest": stream_emb_index_ingest,
    "stream_media_index_ingest": stream_media_index_ingest,
    "stream_index_forget_ingest": stream_index_forget_ingest,
    "stream_backfill_live_handoff": stream_backfill_live_handoff,
    "orc_quarantine_write": orc_quarantine_write,
    "orc_gdpr_erase": orc_gdpr_erase,
    "orc_bloom_pruned_read": orc_bloom_pruned_read,
    "orc_snapshot_expire": orc_snapshot_expire,
    "stream_chained_windows": stream_chained_windows,
    "orc_bucketed_join": orc_bucketed_join,
    "orc_roundtrip_events": orc_roundtrip_events,
    "orc_roundtrip_typeedge": orc_roundtrip_typeedge,
    "orc_schema_evolution": orc_schema_evolution,
    "orc_partition_upsert": orc_partition_upsert,
    "orc_compact_roundtrip": orc_compact_roundtrip,
    "stream_tumbling_hourly": stream_tumbling_hourly,
    "stream_sessionize_10m": stream_sessionize_10m,
    "stream_sliding_1h_30m": stream_sliding_1h_30m,
    "stream_dedup_events": stream_dedup_events,
    "stream_dedup_ttl": stream_dedup_ttl,
    "stream_temporal_enrich": stream_temporal_enrich,
    "stream_running_totals": stream_running_totals,
    "stream_topk_per_window": stream_topk_per_window,
    "stream_interval_join": stream_interval_join,
    "stream_interval_join_left": stream_interval_join_left,
    "stream_interval_join_full": stream_interval_join_full,
    "stream_static_enrich": stream_static_enrich,
    "stream_late_data_drop": stream_late_data_drop,
    "stream_foreachbatch_orc": stream_foreachbatch_orc,
    "stream_fanout_atomic": stream_fanout_atomic,
    "stream_gram_index_ingest": stream_gram_index_ingest,
    "stream_bm25_index_ingest": stream_bm25_index_ingest,
    "stream_cdc_apply": stream_cdc_apply,
    "stream_scd2_apply": stream_scd2_apply,
    "stream_retract_agg": stream_retract_agg,
    "stream_retract_join": stream_retract_join,
    "stream_retract_join_agg": stream_retract_join_agg,
    "stream_retract_join_left": stream_retract_join_left,
    "orc_time_travel": orc_time_travel,
    "orc_snapshot_diff": orc_snapshot_diff,
    "orc_zorder_layout": orc_zorder_layout,
    "orc_stats_pruned_read": orc_stats_pruned_read,
    "orc_incremental_agg": orc_incremental_agg,
    "stream_orc_pipeline_events": stream_orc_pipeline_events,
}

ORACLES = {
    "stream_sessionize_dynamic": STREAM_SESSIONIZE_DYNAMIC_SQL,
    "stream_quarantine": ORC_ROUNDTRIP_SQL,
    "pyds_source_agg": PYDS_AGG_SQL,
    "stream_pyds_source": STREAM_PYDS_SQL,
    "stream_pyds_partitioned": STREAM_PYDS_PART_SQL,
    "pyds_sink_roundtrip": ORC_ROUNDTRIP_SQL,
    "stream_pyds_sink": ORC_ROUNDTRIP_SQL,
    "stream_minhash_index_ingest": STREAM_MINHASH_INGEST_SQL,
    "stream_emb_index_ingest": _stream_emb_ingest_sql(),
    "stream_media_index_ingest": _stream_media_ingest_sql(),
    "stream_index_forget_ingest": STREAM_INDEX_FORGET_SQL,
    "stream_backfill_live_handoff": ORC_ROUNDTRIP_SQL,
    "orc_quarantine_write": ORC_ROUNDTRIP_SQL,
    "orc_gdpr_erase": ORC_GDPR_SQL,
    "orc_bloom_pruned_read": ORC_BLOOM_PRUNED_SQL,
    "orc_snapshot_expire": ORC_ROUNDTRIP_SQL,
    "stream_chained_windows": STREAM_CHAINED_SQL,
    "orc_bucketed_join": ORC_BUCKETED_JOIN_SQL,
    "orc_roundtrip_events": ORC_ROUNDTRIP_SQL,
    "orc_roundtrip_typeedge": ORC_TYPEEDGE_SQL,
    "orc_schema_evolution": ORC_EVOLUTION_SQL,
    "orc_partition_upsert": ORC_UPSERT_SQL,
    "orc_compact_roundtrip": ORC_COMPACT_SQL,
    "stream_tumbling_hourly": TUMBLING_SQL,
    "stream_sessionize_10m": STREAM_SESSIONIZE_SQL,
    "stream_sliding_1h_30m": SLIDING_SQL,
    "stream_dedup_events": ORC_ROUNDTRIP_SQL,
    "stream_dedup_ttl": ORC_ROUNDTRIP_SQL,
    "stream_temporal_enrich": STREAM_TEMPORAL_ENRICH_SQL,
    "stream_running_totals": STREAM_RUNNING_TOTALS_SQL,
    "stream_topk_per_window": STREAM_TOPK_WINDOW_SQL,
    "stream_interval_join": STREAM_INTERVAL_JOIN_SQL,
    "stream_interval_join_left": STREAM_INTERVAL_JOIN_LEFT_SQL,
    "stream_interval_join_full": STREAM_INTERVAL_JOIN_FULL_SQL,
    "stream_static_enrich": STREAM_STATIC_ENRICH_SQL,
    "stream_late_data_drop": STREAM_LATE_DROP_SQL,
    "stream_foreachbatch_orc": ORC_ROUNDTRIP_SQL,
    "stream_fanout_atomic": FANOUT_ATOMIC_SQL,
    "stream_gram_index_ingest": CUT_DUP_SPANS_SQL,
    "stream_bm25_index_ingest": BM25_SQL,
    "stream_cdc_apply": STREAM_CDC_APPLY_SQL,
    "stream_scd2_apply": SCD2_SQL,
    "stream_retract_agg": STREAM_RETRACT_AGG_SQL,
    "stream_retract_join": STREAM_RETRACT_JOIN_SQL,
    "stream_retract_join_agg": STREAM_RETRACT_JOIN_AGG_SQL,
    "stream_retract_join_left": STREAM_RETRACT_JOIN_LEFT_SQL,
    "orc_time_travel": ORC_ROUNDTRIP_SQL,
    "orc_snapshot_diff": ORC_SNAPSHOT_DIFF_SQL,
    "orc_zorder_layout": ORC_ZORDER_SQL,
    "orc_stats_pruned_read": ORC_STATS_PRUNED_SQL,
    "orc_incremental_agg": ORC_INCR_AGG_SQL,
    "stream_orc_pipeline_events": ORC_ROUNDTRIP_SQL,
}
