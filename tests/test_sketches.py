"""Sketch accuracy: HLL++ approx_count_distinct within its rsd."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_accuracy(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rows = (
        c.groupBy("c_mktsegment")
        .agg(
            F.approx_count_distinct("c_custkey", rsd=0.05).alias("approx"),
            F.countDistinct("c_custkey").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) <= max(0.10 * r.exact, 2), (
            f"{r.c_mktsegment}: approx {r.approx} vs exact {r.exact}"
        )
