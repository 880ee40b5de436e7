"""Operator library: relational extensions + LLM-pipeline operators.

Everything the reference lacks (SURVEY.md §2.4) plus the operators
Spark itself lacks (as-of join, sessionize-as-batch, dedup families,
ANN search), each built as a composition of DataFrame primitives so
Catalyst/AQE still plan them — no hand-scheduled execution.
"""

from flink_orc_sink_spark.operators import dedup, relational, similarity

__all__ = ["dedup", "relational", "similarity"]
