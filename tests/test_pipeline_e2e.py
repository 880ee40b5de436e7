"""End-to-end pipeline: the real events table streamed through
windowed aggregation into the exactly-once partitioned ORC sink, read
back and reconciled against the batch computation — the full
reference workflow (ingest → window → typed partitioned ORC → Hive
readback) on actual testdata."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_orc_sink_spark.sources.catalog import table
from flink_orc_sink_spark.streaming import (

    read_committed_orc,
    stream_write_orc,
)

# slow tier: end-to-end pipeline examples — excluded from the default (driver) gate, see pytest.ini
pytestmark = pytest.mark.slow


def test_events_to_orc_pipeline(spark, sf_dir, tmp_path):
    # stage the events table as streamable parquet (ns->us converted
    # by the catalog; file source replays it as micro-batches)
    staged = str(tmp_path / "staged")
    events = table(spark, sf_dir, "events")
    events.write.mode("overwrite").parquet(staged)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(staged)
    )
    hourly = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.to_date("w.start").alias("day"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    out = str(tmp_path / "orc_out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_write_orc(
        hourly, out, ckpt,
        partition_cols=["day"], trigger={"availableNow": True},
    )
    q.awaitTermination(300)

    back = read_committed_orc(spark, out)
    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    # the streaming run can only emit watermark-closed windows; every
    # emitted window must match the batch result exactly
    joined = back.join(batch, ["window_start", "event_type"], "left")
    assert back.count() > 0
    mismatches = joined.filter(
        (F.col(back.columns[3]).isNull())
        | (back["n_events"] != batch["n_events"])
    )
    assert mismatches.count() == 0
    # Hive-style partition layout exists
    import os

    assert any(d.startswith("day=") for d in os.listdir(out))


def test_curation_pipeline_example(spark, sf_dir, tmp_path):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "curation_pipeline",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "examples",
            "curation_pipeline.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    counts = mod.run(spark, sf_dir, str(tmp_path / "curated"))
    assert counts["input"] >= counts["after_quality_gate"] >= counts["after_exact_dedup"]
    assert counts["after_exact_dedup"] >= counts["after_neardup_dedup"] > 0
    assert counts["written"] == counts["after_neardup_dedup"]


def test_media_pipeline_example(spark, tmp_path):
    """The media example end to end: real decode across PNG + JPEG +
    GIF in ONE corpus, perceptual dedup drops every planted clone,
    WAV audio features and MJPEG frame sampling run, catalog lands as
    committed ORC."""
    import examples.media_pipeline as mp

    out = str(tmp_path / "catalog")
    counts = mp.run(spark, out)
    assert counts["ingested"] == 300
    # every planted clone (ids 200-299) pairs with its source
    assert counts["neardup_pairs"] >= 100
    # survivors: clones dropped (plus a few honest cross-collisions)
    assert 150 <= counts["survivors"] <= 200
    assert counts["audio_clips"] == 40
    assert counts["video_frames"] == 20 * 3  # 6 frames, every 2nd
    got = spark.read.orc(out)
    assert got.count() == counts["survivors"]
    assert set(got.columns) == {
        "media_id", "width", "height", "mean_gray", "byte_len", "sha256",
    }


def test_streaming_ingest_pipeline_example(spark, sf_dir, tmp_path):
    """The continuous-ingest example end to end on the real streaming
    runtime: three arriving shards, per-batch quality gate +
    index-probe dedup + append, idempotent ORC landing. Invariant:
    an admitted doc has no verified near-dup among the seed corpus or
    earlier-id admitted docs (the greedy-ingest guarantee)."""
    import examples.streaming_ingest_pipeline as sip
    from pyspark.sql import functions as F

    out = str(tmp_path / "corpus")
    counts = sip.run(spark, sf_dir, out)
    assert counts["batches"] == 3
    assert 0 < counts["admitted"] <= counts["arrived"]

    landed = spark.read.orc(out)
    assert landed.count() == counts["admitted"]
    # only arriving shards land (the seed is index-only)
    assert landed.agg(F.min("doc_id")).collect()[0][0] >= counts[
        "seed_indexed"
    ]
    # PII scrub ran on the landed text
    assert (
        landed.filter(
            F.col("text").rlike(r"[\w.+-]+@[\w-]+\.[\w.]+")
        ).count()
        == 0
    )


def test_embedding_pipeline_example(spark, sf_dir, tmp_path):
    """The embedding example end to end: semantic dedup keeps a
    nonempty survivor set no larger than the corpus, the fixed-point
    projections land as ORC one row per survivor, and the IVF probe
    answers for every query (each query's own vector is in the index,
    so hit counts are positive)."""
    import examples.embedding_pipeline as ep

    out = str(tmp_path / "embp")
    counts = ep.run(spark, sf_dir, out)
    assert 0 < counts["after_semantic_dedup"] <= counts["corpus"]
    assert counts["written"] == counts["after_semantic_dedup"]
    assert counts["probe_hits"] >= 5  # >= 1 hit per query (self)
    got = spark.read.orc(str(tmp_path / "embp" / "catalog"))
    assert set(got.columns) == {"vec_id", "pc1", "pc2", "pc3", "pc4"}
