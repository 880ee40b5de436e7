"""Column profiling — the data-quality sweep a training pipeline runs
before trusting a new source.

One pass over the table computes per-column: null count, approximate
distinct count (HLL++, bounded memory), min/max for orderable types,
and mean length for strings. All measures are single-shuffle
aggregates with map-side partials; the output is COLUMNS × metrics,
tiny regardless of input size — the correct 100 TB shape (a naive
per-column loop would scan the table once per column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ORDERABLE = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
    T.DateType, T.TimestampType, T.TimestampNTZType, T.StringType,
)


def profile_table(df: DataFrame, approx_rsd: float = 0.05) -> DataFrame:
    """Profile every column of ``df`` in ONE aggregation pass.

    Returns one row per column: ``(column, n_rows, n_nulls,
    approx_distinct, min_str, max_str, mean_len)`` — min/max are
    stringified so heterogeneous column types fit one output schema.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        c = f.name
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}")
        )
        aggs.append(
            F.approx_count_distinct(c, rsd=approx_rsd).alias(f"__dist_{c}")
        )
        if isinstance(f.dataType, _ORDERABLE):
            aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
            aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
        if isinstance(f.dataType, T.StringType):
            aggs.append(F.avg(F.length(c)).alias(f"__len_{c}"))

    row = df.agg(*aggs)

    # pivot the single wide row into one output row per column —
    # a driver-free unpivot via stack()
    parts = []
    for f in df.schema.fields:
        c = f.name
        min_c = f"__min_{c}" if isinstance(f.dataType, _ORDERABLE) else None
        len_c = f"__len_{c}" if isinstance(f.dataType, T.StringType) else None
        parts.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").alias("approx_distinct"),
                (F.col(min_c) if min_c else F.lit(None).cast("string")).alias(
                    "min_str"
                ),
                (
                    F.col(f"__max_{c}")
                    if min_c
                    else F.lit(None).cast("string")
                ).alias("max_str"),
                (
                    F.round(F.col(len_c), 4).cast("double")
                    if len_c
                    else F.lit(None).cast("double")
                ).alias("mean_len"),
            )
        )
    return row.select(F.explode(F.array(*parts)).alias("p")).select("p.*")
