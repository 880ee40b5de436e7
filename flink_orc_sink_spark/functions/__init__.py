"""Column-expression function library (JVM-side, codegen-friendly).

Everything here returns Spark ``Column`` expressions built from
``pyspark.sql.functions`` — no Python UDFs — so whole-stage codegen
keeps the hot path on the JVM (SURVEY.md §7.3 scale rules).
"""

from flink_orc_sink_spark.functions import text, vector

__all__ = ["text", "vector"]
