"""Stateful streaming operators: keyed dedup within watermark and
custom per-key state via applyInPandasWithState."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_orc_sink_spark.streaming import stream_from_files
from flink_orc_sink_spark.streaming.stateful import running_totals, stream_dedup


def test_stream_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:01:00"),  # dup key within horizon -> dropped
        (2, "2024-01-01 00:02:00"),
        (2, "2024-01-01 00:02:30"),  # dup
        (3, "2024-01-01 00:03:00"),
    ]
    (
        spark.createDataFrame(rows, "id long, ts_s string")
        .withColumn("ts", F.to_timestamp("ts_s"))
        .drop("ts_s")
        .coalesce(1)
        .write.mode("append")
        .parquet(src)
    )
    stream = stream_from_files(spark, src, "id LONG, ts TIMESTAMP")
    deduped = stream_dedup(stream, ["id"], "ts", delay="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.id for r in spark.sql("SELECT id FROM dedup_sink").collect()}
    assert got == {1, 2, 3}
    assert spark.sql("SELECT COUNT(*) n FROM dedup_sink").collect()[0].n == 3


def test_running_totals_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    def feed(rows):
        spark.createDataFrame(rows, "user long, v double").coalesce(
            1
        ).write.mode("append").parquet(src)

    # two input files + maxFilesPerTrigger=1 => two micro-batches in
    # one run; per-key state must carry from batch 1 into batch 2.
    # (A kill/restart state test needs a fault-tolerant sink; the
    # memory sink used for assertions doesn't support recovery —
    # sink-level restart semantics are covered in test_streaming_sink.)
    feed([(1, 10.0), (1, 5.0), (2, 1.0)])
    feed([(1, 2.0), (3, 7.0)])
    stream = stream_from_files(
        spark, src, "user LONG, v DOUBLE", max_files_per_trigger=1
    )
    counts = running_totals(stream, "user", "v")
    q = (
        counts.writeStream.format("memory")
        .queryName("totals_sink")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM totals_sink").collect()
    final = {}
    for r in rows:
        prev = final.get(r.user, (0, 0.0))
        if r.n_events >= prev[0]:
            final[r.user] = (r.n_events, r.total)
    # user 1: appears in both batches -> final state accumulates
    assert final[1] == (3, 17.0)
    assert final[2] == (1, 1.0)
    assert final[3] == (1, 7.0)
    # state really did update across batches: user 1 was emitted more
    # than once with growing counts
    user1_counts = sorted(r.n_events for r in rows if r.user == 1)
    assert user1_counts[-1] == 3 and len(user1_counts) >= 2


def test_session_window_streaming(spark, tmp_path):
    """Built-in session_window (SURVEY §2.4 streaming row): per-user
    sessions with a 10-minute gap, closed by the watermark."""
    src = str(tmp_path / "in_sess")
    ckpt = str(tmp_path / "ckpt_sess")
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:05:00"),   # same session (gap 5m < 10m)
        (1, "2024-01-01 01:00:00"),   # new session
        (2, "2024-01-01 00:00:00"),
        # late sentinel far in the future closes all sessions
        (99, "2024-01-02 00:00:00"),
    ]
    (
        spark.createDataFrame(rows, "user long, ts_s string")
        .withColumn("ts", F.to_timestamp("ts_s"))
        .drop("ts_s")
        .coalesce(1)
        .write.mode("append")
        .parquet(src)
    )
    stream = stream_from_files(spark, src, "user LONG, ts TIMESTAMP")
    sessions = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.session_window("ts", "10 minutes"), F.col("user"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user, r.n)
        for r in spark.sql("SELECT user, n FROM sess_sink").collect()
    }
    assert (1, 2) in got      # first session has two events
    assert (1, 1) in got      # second session
    assert (2, 1) in got


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream inner join with an event-time interval condition
    — the streaming analogue of the range/as-of join family. Both
    sides carry watermarks so join state is bounded."""
    clicks_p = str(tmp_path / "clicks")
    views_p = str(tmp_path / "views")
    ckpt = str(tmp_path / "ckpt_join")
    views = [
        (100, "2024-01-01 00:00:00"),
        (200, "2024-01-01 01:00:00"),
    ]
    clicks = [
        (100, "2024-01-01 00:00:30"),   # 30s after view 100 -> joins
        (200, "2024-01-01 02:30:00"),   # 90min after view 200 -> outside window
    ]
    (
        spark.createDataFrame(views, "ad long, ts_s string")
        .withColumn("view_ts", F.to_timestamp("ts_s")).drop("ts_s")
        .coalesce(1).write.mode("append").parquet(views_p)
    )
    (
        spark.createDataFrame(clicks, "ad long, ts_s string")
        .withColumn("click_ts", F.to_timestamp("ts_s")).drop("ts_s")
        .coalesce(1).write.mode("append").parquet(clicks_p)
    )
    vs = stream_from_files(spark, views_p, "ad LONG, view_ts TIMESTAMP").withWatermark(
        "view_ts", "1 minute"
    )
    cs = stream_from_files(spark, clicks_p, "ad LONG, click_ts TIMESTAMP").withWatermark(
        "click_ts", "1 minute"
    ).withColumnRenamed("ad", "c_ad")
    joined = vs.join(
        cs,
        (F.col("ad") == F.col("c_ad"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("join_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r.ad for r in spark.sql("SELECT ad FROM join_sink").collect()]
    assert got == [100]  # only the in-window click joins


def test_running_totals_exact_cross_batch_bit_identical(spark, tmp_path):
    """The int64 variant (the one the registered stream_running_totals
    query uses): state accumulates exactly across micro-batches and the
    final totals are bit-identical to batch integer sums however the
    stream is split."""
    from flink_orc_sink_spark.streaming.stateful import running_totals_exact

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    def feed(rows):
        spark.createDataFrame(rows, "user long, v_us long").coalesce(
            1
        ).write.mode("append").parquet(src)

    feed([(1, 10_000_001), (1, 4_999_999), (2, 1_000_000)])
    feed([(1, 2_000_000), (3, -7_000_000)])
    stream = stream_from_files(
        spark, src, "user LONG, v_us LONG", max_files_per_trigger=1
    )
    totals = running_totals_exact(stream, "user", "v_us")
    q = (
        totals.writeStream.format("memory")
        .queryName("totals_exact_sink")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM totals_exact_sink").collect()
    final = {}
    for r in rows:
        prev = final.get(r.user, (0, 0))
        if r.n_events >= prev[0]:
            final[r.user] = (r.n_events, r.total)
    assert final[1] == (3, 17_000_000)  # exact, no float drift
    assert final[2] == (1, 1_000_000)
    assert final[3] == (1, -7_000_000)
    assert sorted(r.n_events for r in rows if r.user == 1)[-1] == 3


