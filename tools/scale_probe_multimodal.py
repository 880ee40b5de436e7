"""Multimodal codec-tier scale probe: does pixel decode stay linear?

Plants mixed-format corpora (PNG / baseline JPEG / GIF round-robin by
id) at growing sizes, runs the magic-dispatch decode-stats stage
(`operators/multimodal.py::decode_image_stats`) end to end, and
prints wall + throughput per size. The stage is map-only
(`mapInPandas`, zero shuffle — pinned in tests/test_plan_budgets.py),
so the probe verifies the only way it can fail at scale: per-row
Python codec cost drifting super-linear (e.g. an accidental
quadratic in a codec loop) or Arrow batch overhead dominating tiny
blobs.

Usage: python tools/scale_probe_multimodal.py [sizes ...]
       (default: 2000 20000 100000)
"""

from __future__ import annotations

import os
import sys
import time

# module-level so pandas_udf type-hint resolution can see it
import pandas as pd


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from flink_orc_sink_spark.operators import multimodal as mm
    from flink_orc_sink_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [2000, 20000, 100000]
    spark = get_spark("scale-probe-multimodal")

    @F.pandas_udf(T.BinaryType())
    def mixed_blob(ids: pd.Series) -> pd.Series:
        def plant(i: int) -> bytes:
            if i % 3 == 0:
                return mm.plant_png_pixels(i)
            if i % 3 == 1:
                return mm.plant_jpeg_pixels(i)
            return mm.plant_gif_pixels(i)

        return ids.map(lambda i: plant(int(i)))

    # warm the UDF daemon so size[0] doesn't pay worker spin-up
    warm = spark.range(0, 64, 1, 8).select(
        F.col("id").alias("media_id"), mixed_blob(F.col("id")).alias("blob")
    )
    mm.decode_image_stats(warm, "media_id", "blob").count()

    for n in sizes:
        ids = spark.range(0, n, 1, 32).select(
            F.col("id").alias("media_id"),
            mixed_blob(F.col("id")).alias("blob"),
        )
        t0 = time.time()
        out = mm.decode_image_stats(ids, "media_id", "blob")
        cnt = out.count()
        wall = time.time() - t0
        print(
            f"images={n:7d}  wall={wall:6.1f}s "
            f" throughput={cnt / wall:8.0f} img/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
