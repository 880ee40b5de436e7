"""Streaming layer: exactly-once ORC sink, watermark observability,
and the reference demo pipeline (SURVEY.md §2.1 S1-S3, §2.3 T1-T6)."""

from flink_orc_sink_spark.streaming.orc_sink import (
    WatermarkTracker,
    csv_parse,
    demo_socket_to_orc,
    read_committed_fanout,
    read_committed_orc,
    read_retract_agg,
    cleanup_retract_state,
    stream_cdc_apply_orc,
    stream_retract_agg_orc,
    stream_retract_join_orc,
    stream_scd2_apply_orc,
    stream_fanout_orc,
    stream_from_files,
    stream_write_orc,
    stream_write_orc_foreachbatch,
)

__all__ = [
    "WatermarkTracker",
    "csv_parse",
    "demo_socket_to_orc",
    "read_committed_fanout",
    "read_committed_orc",
    "read_retract_agg",
    "cleanup_retract_state",
    "stream_cdc_apply_orc",
    "stream_retract_agg_orc",
    "stream_retract_join_orc",
    "stream_scd2_apply_orc",
    "stream_fanout_orc",
    "stream_from_files",
    "stream_write_orc",
    "stream_write_orc_foreachbatch",
]
