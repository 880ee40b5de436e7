"""Engine-surface queries: ORC round-trip and streaming-vs-batch
equivalence (queries/engine.py)."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _rowset(df):
    return {tuple(r) for r in df.collect()}


def test_orc_roundtrip_events_identical(spark):
    from flink_orc_sink_spark.queries.engine import orc_roundtrip_events
    from flink_orc_sink_spark.sources.catalog import table

    src = table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    back = orc_roundtrip_events(spark, SF_DIR)
    assert _rowset(back) == _rowset(src)


def test_stream_tumbling_matches_batch(spark):
    from flink_orc_sink_spark.queries.engine import stream_tumbling_hourly
    from flink_orc_sink_spark.queries.events import events_tumbling_hourly

    streamed = stream_tumbling_hourly(spark, SF_DIR)
    batch = events_tumbling_hourly(spark, SF_DIR)
    assert _rowset(streamed) == _rowset(batch)
