"""Persisted-aHash-index scale probe: does MEDIA probe cost scale with
the BATCH, not the stored-image corpus?

Builds the band-partitioned perceptual-hash index
(`operators/multimodal.py::build_ahash_index`) over planted-PNG corpora
of growing size, then probes each with the SAME fixed-size new batch
(200 images, half of them two-pixel perturbations of corpus images —
known planted matches at Hamming ≤ 3). The claim under test mirrors the
MinHash and IVF probes: probe wall = batch-sized hashing (the only
decode pass) + a band-pruned index join, so corpus growth moves BUILD
wall (one-off) but leaves probe wall ~flat, with planted recall 100%.

Usage: python tools/scale_probe_media_index.py [corpus sizes ...]
       (default: 1000 5000 20000)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from flink_orc_sink_spark.operators.multimodal import (
        ahash_probe_index,
        attach_planted_png,
        build_ahash_index,
        image_ahash,
    )
    from flink_orc_sink_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [1000, 5000, 20000]
    spark = get_spark("scale-probe-media-index")
    work = tempfile.mkdtemp(prefix="scale_probe_mediaidx_")
    batch, planted = 200, 100
    try:
        for n in sizes:
            n_plant = min(planted, n)  # victims must exist in corpus
            ids = spark.range(0, n, 1, 32).select(F.col("id").alias("media_id"))
            corpus_h = image_ahash(
                attach_planted_png(ids, "media_id"), "media_id", "png"
            ).localCheckpoint()  # hash generation outside the timings

            idx = os.path.join(work, f"idx_{n}")
            t0 = time.time()
            build_ahash_index(corpus_h, "media_id", "ahash", idx)
            t_build = time.time() - t0

            # probe batch: `n_plant` perturbed clones of corpus images
            # (ids 10^9+i clone corpus image i) + novel images from far
            # outside the corpus id range
            clone_ids = spark.range(0, n_plant, 1, 8).select(
                F.col("id").alias("plant_id"),
                (F.col("id") + 1_000_000_000).alias("media_id"),
            )
            novel_ids = spark.range(0, batch - n_plant, 1, 8).select(
                (F.col("id") + 2_000_000_000).alias("media_id")
            )
            probe_blobs = attach_planted_png(
                clone_ids, "plant_id", perturb=True
            ).select("media_id", "png").unionByName(
                attach_planted_png(novel_ids, "media_id")
            )
            # time the FULL probe (hash + band join + Hamming verify
            # over every candidate) — computing recall inside the
            # timed action would let Catalyst push the planted-pair
            # filter into the band join and prune away the very work
            # being measured
            t0 = time.time()
            probe_h = image_ahash(probe_blobs, "media_id", "png")
            rows = ahash_probe_index(
                spark, probe_h, "media_id", "ahash", idx, max_hamming=3
            ).collect()
            t_probe = time.time() - t0
            found = {
                r.new_id - 1_000_000_000
                for r in rows
                if r.match_id == r.new_id - 1_000_000_000
            }
            print(
                f"corpus={n}: build={t_build:.2f}s probe={t_probe:.2f}s "
                f"planted_recall={len(found)}/{n_plant}",
                flush=True,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
