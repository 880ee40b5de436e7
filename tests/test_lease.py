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
