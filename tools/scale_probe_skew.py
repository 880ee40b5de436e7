"""Skew-join probe: does the engine survive a pathological hot key?

Builds a synthetic skewed fact table (N rows, 50% of them on ONE hot
key, the rest uniform over 10k keys) joined to a uniform dimension of
all keys, and runs the join+agg three ways:

1. AQE skew-join ON (the engine default, session.py) — AQE splits the
   oversized shuffle partition into sub-partitions at runtime.
2. AQE skew-join OFF — the classic one-straggler-task shape.
3. Explicit salting (`operators/relational.py::salted_join`) — the
   pre-AQE mitigation, kept for engines/paths where AQE can't see the
   skew (e.g. non-shuffle-join plans).

What "pass" looks like: (1) ≈ (3) and both beat (2) as N grows, and
the AQE plan shows the skew split actually fired. Local thread
scheduling softens the difference vs a real cluster (a straggler task
still runs at full speed here); the plan evidence is the durable part.

Usage: python tools/scale_probe_skew.py [n_rows] (default 2_000_000)
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from flink_orc_sink_spark.operators.relational import salted_join
    from flink_orc_sink_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("scale-probe-skew")
    # force the shuffle path: a broadcast dim would hide the skew
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE's skew detector is tuned for multi-GB cluster shuffles
    # (256 MiB threshold); scale it to this probe's MiB-sized shuffle
    # so the mechanism — not the constant — is what's exercised.
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")

    fact = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.hash("id"), F.lit(10_000)))
        .alias("k"),
        (F.col("id") % 97).alias("v"),
        # payload so per-partition bytes (what the detector sees)
        # track the row skew
        F.repeat(F.lit("x"), 64).alias("pad"),
    )
    dim = spark.range(10_000).select(
        F.col("id").cast("int").alias("k"), (F.col("id") % 7).alias("w")
    )

    def join_agg(f, d):
        return (
            f.join(d, "k")
            .groupBy("w")
            .agg(F.sum("v").alias("sv"), F.count("*").alias("n"))
        )

    def timed(df):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df.collect()
            best = min(best, time.time() - t0)
        return best

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t_aqe = timed(join_agg(fact, dim))
    plan = join_agg(fact, dim)
    plan.collect()
    skew_fired = "skew=true" in plan._jdf.queryExecution().toString()

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t_noaqe = timed(join_agg(fact, dim))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    t_salted = timed(
        salted_join(fact, dim, "k", salt_buckets=32).groupBy("w").agg(
            F.sum("v").alias("sv"), F.count("*").alias("n")
        )
    )

    print(
        f"n={n}: aqe_skew_join={t_aqe:.2f}s (split fired: {skew_fired})  "
        f"no_skew_handling={t_noaqe:.2f}s  salted_join={t_salted:.2f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
