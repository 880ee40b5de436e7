"""Sources: batch/stream readers and the test-table catalog."""

from flink_orc_sink_spark.sources.catalog import TABLES, load_tables, table

__all__ = ["TABLES", "load_tables", "table"]
