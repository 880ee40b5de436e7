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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_orc_sink_spark.queries.events import TUMBLING_SQL
from flink_orc_sink_spark.sources.catalog import normalize_events_ts, table
from flink_orc_sink_spark.sources.orc_sink import read_orc, write_orc

_STREAM_SEQ = 0


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
    with tempfile.TemporaryDirectory(prefix="stream_q_ckpt_") as ckpt:
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
    with tempfile.TemporaryDirectory(prefix="stream_pipe_ckpt_") as ckpt:
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


QUERIES = {
    "orc_roundtrip_events": orc_roundtrip_events,
    "stream_tumbling_hourly": stream_tumbling_hourly,
    "stream_orc_pipeline_events": stream_orc_pipeline_events,
}

ORACLES = {
    "orc_roundtrip_events": ORC_ROUNDTRIP_SQL,
    "stream_tumbling_hourly": TUMBLING_SQL,
    "stream_orc_pipeline_events": ORC_ROUNDTRIP_SQL,
}
