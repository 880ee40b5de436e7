"""Single-writer lease: the round-8 enforcement of the documented
'do not run maintenance concurrently with the sink' contract."""

from __future__ import annotations

import time

import pytest

from flink_orc_sink_spark.lease import (

    LeaseHeldError,
    acquire_lease,
    release_lease,
    state_lease,
)

# slow tier: multiprocess lease races with real TTL waits — excluded from the default (driver) gate, see pytest.ini
pytestmark = pytest.mark.slow


def test_lease_mutual_exclusion_and_release(spark, tmp_path):
    d = str(tmp_path / "state")
    acquire_lease(spark, d, "sink:ckA")
    # a different owner conflicts LOUDLY while the lease is fresh
    with pytest.raises(LeaseHeldError, match="sink:ckA"):
        acquire_lease(spark, d, "maintenance:cleanup-retract")
    # the SAME logical writer (restart) reclaims instantly
    acquire_lease(spark, d, "sink:ckA")
    release_lease(spark, d, "sink:ckA")
    # released: anyone may take it
    acquire_lease(spark, d, "maintenance:cleanup-retract")
    release_lease(spark, d, "maintenance:cleanup-retract")


def test_lease_context_manager_releases_on_error(spark, tmp_path):
    d = str(tmp_path / "state")
    with pytest.raises(RuntimeError, match="boom"):
        with state_lease(spark, d, "owner-1"):
            raise RuntimeError("boom")
    acquire_lease(spark, d, "owner-2")  # no orphan left behind
    release_lease(spark, d, "owner-2")


def test_lease_crash_orphan_stolen_after_ttl(spark, tmp_path):
    """Age-based recovery: a crashed writer's lease blocks only until
    ttl_sec, then a different owner steals it atomically."""
    from flink_orc_sink_spark.session import hadoop_fs

    d = str(tmp_path / "state")
    acquire_lease(spark, d, "sink:crashed")  # never released
    with pytest.raises(LeaseHeldError):
        acquire_lease(spark, d, "maintenance:compact", ttl_sec=3600)
    # backdate the lease file instead of sleeping out a real TTL
    fs, p = hadoop_fs(spark, d + "/_lease")
    old_ms = int((time.time() - 7200) * 1000)
    fs.setTimes(p, old_ms, old_ms)
    acquire_lease(spark, d, "maintenance:compact", ttl_sec=3600)
    # ...and the thief's lease is fresh again
    with pytest.raises(LeaseHeldError):
        acquire_lease(spark, d, "sink:other", ttl_sec=3600)
    # the presumed-dead writer's release must NOT delete the new lease
    release_lease(spark, d, "sink:crashed")
    with pytest.raises(LeaseHeldError):
        acquire_lease(spark, d, "sink:other", ttl_sec=3600)
    release_lease(spark, d, "maintenance:compact")


def test_cleanup_fails_loudly_while_sink_holds_lease(spark, tmp_path):
    """The verdict's scenario: a cron-mistake cleanup firing while a
    micro-batch is mid-flight must fail LOUDLY, not interleave."""
    from flink_orc_sink_spark.streaming import (
        cleanup_retract_join_state,
        cleanup_retract_state,
    )

    d = str(tmp_path / "state")
    acquire_lease(spark, d, "sink:ck")  # a batch is mid-flight
    with pytest.raises(LeaseHeldError, match="sink:ck"):
        cleanup_retract_state(spark, d, horizon=100)
    with pytest.raises(LeaseHeldError, match="sink:ck"):
        cleanup_retract_join_state(spark, d, horizon=100)
    release_lease(spark, d, "sink:ck")
    # stream stopped: the cleanup acquires and runs (empty state no-op)
    assert cleanup_retract_state(spark, d, horizon=100) == {
        "tombstones_dropped": 0,
        "buckets_rewritten": 0,
    }


def test_sink_batch_fails_loudly_while_maintenance_holds_lease(
    spark, tmp_path
):
    """...and the mirror image: a micro-batch arriving while a
    maintenance op holds the lease fails the query loudly instead of
    racing the op's partition overwrite."""
    from flink_orc_sink_spark.streaming import (
        stream_from_files,
        stream_retract_agg_orc,
    )

    src = str(tmp_path / "in")
    state = str(tmp_path / "state")
    schema = "k long, grp string, v long, op string, seq long"
    spark.createDataFrame(
        [(1, "a", 10, "U", 1)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    acquire_lease(spark, state, "maintenance:cleanup-retract")
    q = stream_retract_agg_orc(
        stream_from_files(spark, src, schema),
        state,
        checkpoint=str(tmp_path / "ck"),
        key_col="k",
        group_col="grp",
        val_col="v",
        order_cols=["seq"],
        trigger={"availableNow": True},
    )
    try:
        drained = q.awaitTermination(120)
    except Exception as exc:
        assert "LeaseHeldError" in str(exc) or "lease" in str(exc), exc
    else:
        raise AssertionError(
            f"query ran under a held lease (drained={drained}, "
            f"exception={q.exception()})"
        )
    release_lease(spark, state, "maintenance:cleanup-retract")

    # with the lease released the SAME checkpoint replays cleanly
    q = stream_retract_agg_orc(
        stream_from_files(spark, src, schema),
        state,
        checkpoint=str(tmp_path / "ck"),
        key_col="k",
        group_col="grp",
        val_col="v",
        order_cols=["seq"],
        trigger={"availableNow": True},
    )
    assert q.awaitTermination(120)
    from flink_orc_sink_spark.streaming import read_retract_agg

    assert {
        (r.grp, r.sum_val, r.n_keys)
        for r in read_retract_agg(spark, state).collect()
    } == {("a", 10, 1)}


def test_heartbeat_keeps_long_holder_unstealable(spark, tmp_path):
    """A LIVE holder whose section outlives the TTL must never be
    stolen: the state_lease heartbeat refreshes the file's mtime every
    ttl/3, so staleness only ever fires on a crashed holder."""
    import time

    d = str(tmp_path / "state")
    with state_lease(spark, d, "long-compaction", ttl_sec=2.0):
        time.sleep(4.5)  # > 2 TTLs inside the held section
        with pytest.raises(LeaseHeldError):
            acquire_lease(spark, d, "impatient-sink", ttl_sec=2.0)
    # released: the next writer proceeds
    acquire_lease(spark, d, "impatient-sink", ttl_sec=2.0)
    release_lease(spark, d, "impatient-sink")


def test_process_owner_unique_per_invocation(spark, tmp_path):
    """Two overlapping maintenance runs of the SAME kind must be
    different owners (no silent same-name reclaim): process_owner is
    unique per call."""
    from flink_orc_sink_spark.lease import process_owner

    a = process_owner("maintenance:compact")
    b = process_owner("maintenance:compact")
    assert a != b
    d = str(tmp_path / "state")
    acquire_lease(spark, d, a)
    with pytest.raises(LeaseHeldError):
        acquire_lease(spark, d, b)
    release_lease(spark, d, a)


def test_forget_conflicts_with_appender_lease(spark, tmp_path):
    """forget_ids takes the index lease: a forget racing an appender's
    readmit tombstone-swap would be silently destroyed, so it must
    fail loudly while the appender holds the lease."""
    from flink_orc_sink_spark.operators.dedup import (
        build_minhash_index,
        forget_from_minhash_index,
        minhash_probe_index,
    )

    idx = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(i, f"shared shingle body text number {i}") for i in range(6)],
        "doc long, text string",
    )
    build_minhash_index(docs, "doc", "text", idx)
    victims = spark.createDataFrame([(3,)], "doc long")

    acquire_lease(spark, idx, "ingest:append:mid-flight")
    with pytest.raises(LeaseHeldError, match="ingest:append"):
        forget_from_minhash_index(victims, idx)
    release_lease(spark, idx, "ingest:append:mid-flight")
    forget_from_minhash_index(victims, idx)  # clean run works
    # and the forget took effect: doc 3 no longer matches itself
    probe = minhash_probe_index(
        spark,
        spark.createDataFrame(
            [(103, "shared shingle body text number 3")],
            "doc long, text string",
        ),
        "doc",
        "text",
        idx,
    )
    assert probe.filter("match_doc = 3").count() == 0


def test_compact_and_append_share_the_index_lease(spark, tmp_path):
    """compact_index and the appenders take the same index_path lease:
    holding it as the ingest side blocks compaction loudly."""
    from flink_orc_sink_spark.operators.dedup import (
        append_to_minhash_index,
        build_minhash_index,
        compact_minhash_index,
    )

    idx = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(i, f"some shared shingle text body number {i}") for i in range(8)],
        "doc long, text string",
    )
    build_minhash_index(docs, "doc", "text", idx)

    acquire_lease(spark, idx, "ingest:append")  # an append mid-flight
    with pytest.raises(LeaseHeldError, match="ingest:append"):
        compact_minhash_index(spark, idx)
    release_lease(spark, idx, "ingest:append")
    compact_minhash_index(spark, idx)  # clean runs still work

    # and the appender itself conflicts with a held maintenance lease
    acquire_lease(spark, idx, "maintenance:compact")
    more = spark.createDataFrame(
        [(100, "an entirely new late-arriving document")],
        "doc long, text string",
    )
    with pytest.raises(LeaseHeldError, match="maintenance:compact"):
        append_to_minhash_index(more, "doc", "text", idx)
    release_lease(spark, idx, "maintenance:compact")
    append_to_minhash_index(more, "doc", "text", idx)


def test_wait_sec_zero_fails_fast_and_budget_raises(spark, tmp_path):
    """wait_sec=0 (the default) preserves the round-8 loud-failure
    contract — no hidden retry loop; a positive budget that expires
    without the lease freeing raises the SAME error after ~budget."""
    d = str(tmp_path / "state")
    acquire_lease(spark, d, "sink:busy")
    t0 = time.monotonic()
    with pytest.raises(LeaseHeldError):
        acquire_lease(spark, d, "maintenance:compact")
    assert time.monotonic() - t0 < 2.0  # immediate, not a retry loop
    t0 = time.monotonic()
    with pytest.raises(LeaseHeldError):
        acquire_lease(spark, d, "maintenance:compact", wait_sec=1.5)
    elapsed = time.monotonic() - t0
    assert 1.0 <= elapsed < 15.0  # waited out the budget, then raised
    release_lease(spark, d, "sink:busy")


def test_wait_sec_serializes_behind_a_live_holder(spark, tmp_path):
    """The composition ergonomics the verdict asked for: a writer with
    a wait budget parks behind the holder and wins the lease when it
    frees, instead of crashing the caller."""
    import threading

    d = str(tmp_path / "state")
    acquire_lease(spark, d, "sink:busy")

    def free_soon() -> None:
        time.sleep(2.0)
        release_lease(spark, d, "sink:busy")

    t = threading.Thread(target=free_soon)
    t.start()
    t0 = time.monotonic()
    acquire_lease(spark, d, "maintenance:compact", wait_sec=60.0)
    assert time.monotonic() - t0 < 30.0
    t.join()
    release_lease(spark, d, "maintenance:compact")


def test_concurrent_appenders_serialize_with_wait(spark, tmp_path):
    """Two live index appenders with a wait budget must BOTH succeed
    (serialized by the lease), and the index must contain both
    batches — the 'two overlapping ingest jobs' production shape that
    previously required external scheduling."""
    import threading

    from flink_orc_sink_spark.operators.dedup import (
        append_to_minhash_index,
        build_minhash_index,
        minhash_probe_index,
    )

    idx = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(i, f"shared shingle body text number {i}") for i in range(6)],
        "doc long, text string",
    )
    build_minhash_index(docs, "doc", "text", idx)

    errors: list[Exception] = []

    def append(doc_id: int) -> None:
        try:
            batch = spark.createDataFrame(
                [(doc_id, f"shared shingle body text number {doc_id}")],
                "doc long, text string",
            )
            append_to_minhash_index(
                batch, "doc", "text", idx, lease_wait_sec=120.0
            )
        except Exception as exc:  # pragma: no cover - failure detail
            errors.append(exc)

    threads = [
        threading.Thread(target=append, args=(100,)),
        threading.Thread(target=append, args=(101,)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    # both appended batches are probe-visible
    probe = minhash_probe_index(
        spark,
        spark.createDataFrame(
            [
                (200, "shared shingle body text number 100"),
                (201, "shared shingle body text number 101"),
            ],
            "doc long, text string",
        ),
        "doc",
        "text",
        idx,
        threshold=0.9,
    )
    matched = {r.match_doc for r in probe.collect()}
    assert {100, 101} <= matched


def test_lease_lost_flag_set_and_raised_on_clean_exit(spark, tmp_path):
    """A dispossessed holder must not silently report success: when
    the heartbeat observes the lease re-owned, the handle's ``lost``
    flag is set for polling sections and a clean exit raises
    LeaseLostError."""
    from flink_orc_sink_spark.lease import LeaseLostError
    from flink_orc_sink_spark.session import hadoop_fs

    d = str(tmp_path / "state")
    with pytest.raises(LeaseLostError):
        # ttl 1.5s -> heartbeat every 0.5s observes the hijack fast
        with state_lease(spark, d, "victim", ttl_sec=1.5) as handle:
            fs, p = hadoop_fs(spark, d + "/_lease")
            out = fs.create(p, True)  # out-of-band interference
            try:
                out.write(bytearray(b"hijacker"))
            finally:
                out.close()
            deadline = time.monotonic() + 10.0
            while not handle.lost.is_set():
                assert time.monotonic() < deadline, "lost flag never set"
                time.sleep(0.1)
            with pytest.raises(LeaseLostError):
                handle.check()  # pollable mid-section
    # the hijacker's lease survives the victim's release attempt
    from flink_orc_sink_spark.lease import _read_lease

    assert _read_lease(spark, d + "/_lease") == "hijacker"


_CHILD_PRELUDE = """
import os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .appName("lease-child")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)
"""


def _spawn(script: str, tmp_path, name: str):
    import pathlib
    import subprocess
    import sys

    path = pathlib.Path(tmp_path) / f"{name}.py"
    path.write_text(script)
    return subprocess.Popen(
        [sys.executable, str(path)],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.STDOUT,
        cwd=str(tmp_path),
    )


def _wait_for(path, timeout: float = 180.0) -> None:
    import os

    deadline = time.monotonic() + timeout
    while not os.path.exists(str(path)):
        assert time.monotonic() < deadline, f"timeout waiting for {path}"
        time.sleep(0.2)


def test_multiprocess_holder_heartbeats_then_sigkill_steal(
    spark, tmp_path
):
    """The cross-process lease contract, with a REAL second process
    (the round-8 suite only exercised threads): the child holds and
    heartbeats the lease past the TTL (live holder never stolen),
    then is SIGKILLed and its orphan is stolen only after a full TTL
    of silence."""
    import os
    import signal

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    state = str(tmp_path / "state")
    held = str(tmp_path / "held")
    script = _CHILD_PRELUDE.format(repo=repo) + f"""
from flink_orc_sink_spark.lease import state_lease
with state_lease(spark, {state!r}, "sink:child-process", ttl_sec=5.0):
    open({held!r}, "w").write("1")
    time.sleep(600)
"""
    child = _spawn(script, tmp_path, "holder")
    try:
        _wait_for(held)
        # live holder, fresh heartbeats: unstealable even after > TTL
        time.sleep(6.0)
        with pytest.raises(LeaseHeldError, match="sink:child-process"):
            acquire_lease(spark, state, "thief", ttl_sec=5.0)
        # hard-kill the child mid-hold (heartbeats stop, no release)
        os.kill(child.pid, signal.SIGKILL)
        child.wait(timeout=30)
        # immediately after the kill the heartbeat is still fresh
        with pytest.raises(LeaseHeldError):
            acquire_lease(spark, state, "thief", ttl_sec=30.0)
        # ... but a full TTL of silence makes the orphan stealable
        deadline = time.monotonic() + 60.0
        while True:
            try:
                acquire_lease(spark, state, "thief", ttl_sec=5.0)
                break
            except LeaseHeldError:
                assert time.monotonic() < deadline, "steal never succeeded"
                time.sleep(1.0)
        release_lease(spark, state, "thief")
    finally:
        if child.poll() is None:
            child.kill()


def test_multiprocess_barrier_race_exactly_one_winner(spark, tmp_path):
    """Two real processes racing acquire from a barrier: EXACTLY one
    wins (the local-FS primitive is kernel-arbitrated O_EXCL, not
    Hadoop's exists-then-create)."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    state = str(tmp_path / "state")
    go = str(tmp_path / "go")
    children = []
    for who in ("racer-a", "racer-b"):
        script = _CHILD_PRELUDE.format(repo=repo) + f"""
from flink_orc_sink_spark.lease import LeaseHeldError, acquire_lease
open(os.path.join({str(tmp_path)!r}, "ready-" + {who!r}), "w").write("1")
while not os.path.exists({go!r}):
    time.sleep(0.005)
try:
    acquire_lease(spark, {state!r}, {who!r}, ttl_sec=3600.0)
    open(os.path.join({str(tmp_path)!r}, "win-" + {who!r}), "w").write("1")
except LeaseHeldError:
    open(os.path.join({str(tmp_path)!r}, "lose-" + {who!r}), "w").write("1")
"""
        children.append(_spawn(script, tmp_path, who))
    try:
        _wait_for(tmp_path / "ready-racer-a")
        _wait_for(tmp_path / "ready-racer-b")
        open(go, "w").write("1")  # barrier release: race starts NOW
        for c in children:
            c.wait(timeout=180)
        import glob as _glob

        wins = _glob.glob(str(tmp_path / "win-*"))
        loses = _glob.glob(str(tmp_path / "lose-*"))
        assert len(wins) == 1 and len(loses) == 1, (wins, loses)
        # the winner's (never-released) lease names the actual winner
        from flink_orc_sink_spark.lease import _read_lease

        winner = os.path.basename(wins[0])[len("win-"):]
        assert _read_lease(spark, state + "/_lease") == winner
    finally:
        for c in children:
            if c.poll() is None:
                c.kill()
