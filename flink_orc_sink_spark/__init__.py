"""flink_orc_sink_spark — a PySpark-native analytics engine.

A brand-new engine with the capabilities of the reference
``hiliuxg/flink-orc-sink`` (an exactly-once streaming ORC file sink for
Apache Flink, see ``/root/reference``), re-expressed Spark-first and
extended into a full query surface plus LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis).

Design stance (SURVEY.md §7.0): the reference's capabilities —
typed schema declaration, streaming ingest, partitioned columnar ORC
output, exactly-once commit, watermark observability — are Spark
built-ins; this package provides a clean, tested operator library and
query surface over them, designed for 100 TB scale:

- Declarative DataFrame/SQL plans everywhere; Catalyst does pushdown,
  pruning, join selection, AQE re-planning.
- No driver-side loops over data; every operator is
  partition-parallel.
- Broadcast hints for dimension joins; LSH instead of O(n^2)
  similarity at scale; map-side partial aggregation by construction.
- Python only at the edges (Arrow-batched Pandas UDFs), never
  row-at-a-time in a hot path.
"""

from flink_orc_sink_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
