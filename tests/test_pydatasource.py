"""Custom Python DataSource (Spark 4 DataSource V2 API): batch
partitioning, streaming offset replay, and the full custom-source →
exactly-once-ORC composition with a mid-stream restart."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from flink_orc_sink_spark.sources.pydatasource import register


def test_batch_read_partitioned(spark):
    register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 1000)
        .option("n_users", 10)
        .option("n_partitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    # deterministic content: spot-check the arithmetic
    row = df.filter("event_id = 123").collect()[0]
    assert (row.user_id, row.etype, row.value_cents) == (
        3,
        "signup",
        (123 * 37 + 11) % 10000,
    )


def test_stream_restart_exactly_once(spark, tmp_path):
    """Kill the stream mid-generator and restart from the same
    checkpoint: the committed ORC output must contain every event id
    EXACTLY once — offset replay resumes, never duplicates (the S2
    contract, via our own connector)."""
    from flink_orc_sink_spark.streaming.orc_sink import (
        read_committed_orc,
        stream_write_orc,
    )

    register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    n_rows = 3000

    def start():
        sdf = (
            spark.readStream.format("synthetic_events")
            .option("n_rows", n_rows)
            .option("rows_per_batch", 500)
            .load()
        )
        return stream_write_orc(
            sdf,
            out,
            ckpt,
            trigger={"processingTime": "0 seconds"},
            query_name="pyds_restart",
        )

    q = start()
    # let a few micro-batches commit, then kill mid-stream
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            if read_committed_orc(spark, out).count() >= 1000:
                break
        except Exception:
            pass
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)
    mid = read_committed_orc(spark, out).count()
    assert 500 <= mid < n_rows  # genuinely mid-stream

    q2 = start()
    deadline = time.time() + 90
    while time.time() < deadline:
        if read_committed_orc(spark, out).count() >= n_rows:
            break
        time.sleep(0.5)
    q2.stop()
    q2.awaitTermination(30)

    got = read_committed_orc(spark, out)
    assert got.count() == n_rows  # no gaps, no duplicates
    assert got.select("event_id").distinct().count() == n_rows
    s = got.agg(F.sum("value_cents").alias("s")).collect()[0].s
    assert s == sum((i * 37 + 11) % 10000 for i in range(n_rows))


def test_stream_partitioned_offsets_rebalance_restart(spark, tmp_path):
    """Kafka-shaped offsets: run with 2 source partitions (skewed
    advance rates), kill mid-stream, restart the SAME checkpoint with
    3 partitions. Surviving partitions must resume from their own
    cursors (no replay, no gap) and the added partition must start
    from 0 — the committed output holds every id of every partition
    EXACTLY once."""
    from flink_orc_sink_spark.streaming.orc_sink import (
        read_committed_orc,
        stream_write_orc,
    )

    register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    per_part, stride = 1500, 1_000_000

    def start(n_parts):
        sdf = (
            spark.readStream.format("synthetic_events")
            .option("n_rows", per_part)
            .option("rows_per_batch", 500)
            .option("n_stream_parts", n_parts)
            .option("id_stride", stride)
            .load()
        )
        return stream_write_orc(
            sdf,
            out,
            ckpt,
            trigger={"processingTime": "0 seconds"},
            query_name="pyds_rebalance",
        )

    q = start(2)
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            if read_committed_orc(spark, out).count() >= 1200:
                break
        except Exception:
            pass
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)
    mid = read_committed_orc(spark, out).count()
    assert 500 <= mid < 2 * per_part  # genuinely mid-stream

    q2 = start(3)  # REBALANCE: one partition added across restart
    total = 3 * per_part
    deadline = time.time() + 90
    while time.time() < deadline:
        if read_committed_orc(spark, out).count() >= total:
            break
        time.sleep(0.5)
    q2.stop()
    q2.awaitTermination(30)

    got = read_committed_orc(spark, out)
    assert got.count() == total
    assert got.select("event_id").distinct().count() == total
    per_ns = {
        r.p: r.n
        for r in got.groupBy(
            (F.col("event_id") / stride).cast("long").alias("p")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # every partition — survivors AND the added one — fully drained,
    # exactly once
    assert per_ns == {0: per_part, 1: per_part, 2: per_part}
    s = got.agg(F.sum("value_cents").alias("s")).collect()[0].s
    want = sum(
        ((p * stride + k) * 37 + 11) % 10000
        for p in range(3)
        for k in range(per_part)
    )
    assert s == want


def test_pyds_sink_restart_replay_orphans(spark, tmp_path):
    """The Python-DataSource SINK's two-phase commit contract
    (sources/pyds_sink.py): restart on the same checkpoint is
    exactly-once; a crash-replayed micro-batch REPLACES its own
    manifest (no duplicate rows, superseded files become invisible
    orphans); planted orphans never surface; task abort unlinks its
    pending file."""
    import glob
    import os
    import shutil
    import time

    from flink_orc_sink_spark.sources.pyds_sink import (
        FileCommit,
        _BatchWriter,
        read_manifest_orc,
        register_sink,
    )

    register_sink(spark)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def feed(a, b):
        spark.range(a, b).selectExpr("id", "id*2 as v").coalesce(
            1
        ).write.mode("append").parquet(src)

    def run():
        for attempt in range(5):
            q = (
                spark.readStream.schema("id long, v long")
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
                .writeStream.format("manifest_orc_py")
                .option("path", out)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            try:
                assert q.awaitTermination(120), "stream did not drain"
                return
            except Exception:
                q.stop()
                if attempt == 4:
                    raise
                time.sleep(1)

    feed(0, 100)
    run()
    assert read_manifest_orc(spark, out).count() == 100

    # restart same checkpoint with new data: exactly-once
    feed(100, 250)
    run()
    assert read_manifest_orc(spark, out).count() == 250

    # crash-replay: drop the last commit; the replayed batch rewrites
    # its own manifest — same count, new files, old ones orphaned
    files_before = set(glob.glob(f"{out}/data/*.orc"))
    commits = sorted(
        c
        for c in os.listdir(os.path.join(ck, "commits"))
        if not c.startswith(".")
    )
    os.remove(os.path.join(ck, "commits", commits[-1]))
    run()
    assert read_manifest_orc(spark, out).count() == 250
    files_after = set(glob.glob(f"{out}/data/*.orc"))
    assert files_after > files_before  # replay wrote fresh files...
    # ...and they are invisible except through the manifests

    # planted orphan: never surfaces
    shutil.copy(
        sorted(files_after)[0], f"{out}/data/task-9999-orphan.orc"
    )
    assert read_manifest_orc(spark, out).count() == 250

    # abort cleanup: the pending file named in the message is gone
    victim = sorted(files_after)[1]
    rel = os.path.relpath(victim, out)
    _BatchWriter(out, overwrite=False).abort(
        [FileCommit(rel, 1), None]
    )
    assert not os.path.exists(victim)


def test_pyds_sink_vacuum_orphans(spark, tmp_path):
    """vacuum_manifest_orc removes exactly the unreferenced files —
    crashed-task leftovers and replay-superseded files — and the
    committed read is byte-identical before and after."""
    import glob
    import os
    import shutil

    from flink_orc_sink_spark.sources.pyds_sink import (
        read_manifest_orc,
        register_sink,
        vacuum_manifest_orc,
    )

    register_sink(spark)
    out = str(tmp_path / "t")
    df = spark.range(100).selectExpr("id", "id * 3 as v")
    df.repartition(2).write.format("manifest_orc_py").mode(
        "append"
    ).save(out)
    committed = sorted(glob.glob(f"{out}/data/*.orc"))
    # plant two orphans: a crashed-task leftover and a stray copy
    shutil.copy(committed[0], f"{out}/data/task-crashed.orc")
    shutil.copy(committed[1], f"{out}/data/task-stray.orc")
    before = {tuple(r) for r in read_manifest_orc(spark, out).collect()}

    # default grace period: just-written orphans look like an
    # in-flight writer's task files and are skipped, not deleted
    stats = vacuum_manifest_orc(out)
    assert stats["files_deleted"] == 0
    assert stats["files_skipped_young"] == 2

    stats = vacuum_manifest_orc(out, grace_seconds=0)
    assert stats == {
        "files_deleted": 2,
        "files_retained": 2,
        "files_skipped_young": 0,
    }
    assert sorted(glob.glob(f"{out}/data/*.orc")) == committed
    after = {tuple(r) for r in read_manifest_orc(spark, out).collect()}
    assert after == before and len(after) == 100

    # idempotent
    assert vacuum_manifest_orc(out, grace_seconds=0)["files_deleted"] == 0


def test_pyds_sink_gapped_manifest_version_and_stray_json(spark, tmp_path):
    """Version derivation after a crash-gapped manifest sequence
    (sources/pyds_sink.py:151-160): with v1 deleted mid-overwrite-crash
    but v2 live, the next append must publish v3 — a len-based v2 would
    atomically REPLACE the live manifest and drop its committed rows.
    A stray non-versioned .json in manifests/ must neither crash the
    int parse nor be counted."""
    import json
    import os

    from flink_orc_sink_spark.sources.pyds_sink import (
        read_manifest_orc,
        register_sink,
    )

    register_sink(spark)
    out = str(tmp_path / "t")

    def append(a, b):
        spark.range(a, b).selectExpr("id", "id * 3 as v").coalesce(
            1
        ).write.format("manifest_orc_py").mode("append").save(out)

    append(0, 10)   # v1
    append(10, 30)  # v2
    mdir = os.path.join(out, "manifests")
    assert sorted(os.listdir(mdir)) == [
        "v00000001.json",
        "v00000002.json",
    ]
    # crash-gap: v1 unlinked (as an interrupted overwrite would), and a
    # stray metadata file that matches a naive startswith/endswith scan
    os.remove(os.path.join(mdir, "v00000001.json"))
    # worst-shape stray: not even manifest-schema'd — readers and the
    # vacuum must SKIP it (name filter), not KeyError on it
    with open(os.path.join(mdir, "version.json"), "w") as fh:
        json.dump({"v": 2}, fh)

    append(30, 35)  # must become v3, NOT recompute and replace v2
    names = sorted(os.listdir(mdir))
    assert "v00000003.json" in names and "v00000002.json" in names
    got = {r.id for r in read_manifest_orc(spark, out).collect()}
    assert got == set(range(10, 35))  # v2 rows survive, v3 rows land

    from flink_orc_sink_spark.sources.pyds_sink import (
        vacuum_manifest_orc,
    )

    stats = vacuum_manifest_orc(out, grace_seconds=0)
    assert stats["files_deleted"] == 1  # exactly v1's now-orphaned file
    assert {r.id for r in read_manifest_orc(spark, out).collect()} == got
