"""Multimodal media pipeline — the image half of a training-data run,
end to end on real bytes (no PIL/ffmpeg anywhere):

1. ingest       — binary blobs as opaque columns (here: planted,
                  REAL zlib-compressed PNGs built executor-side)
2. audit        — byte-level meta (size/sha256/mime sniff) +
                  container-header dims, map-only
3. pixel decode — the stdlib PNG codec (functions/png.py): inflate,
                  filter reconstruction, exact pixel statistics
4. normalize    — nearest-neighbour resize to 8×8 through re-encode
5. dedup        — perceptual average-hash + banded Hamming pairing
                  (no all-pairs comparison)
6. sink         — committed ORC of the deduped media catalog

Usage:
    python examples/media_pipeline.py [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run(spark, out: str) -> dict[str, int]:
    from flink_orc_sink_spark.operators.multimodal import (
        ahash_neardup_pairs,
        attach_planted_png,
        decode_image_stats,
        extract_media_meta,
        image_ahash,
        resize_images,
    )
    from flink_orc_sink_spark.sources.orc_sink import write_orc

    ids = spark.range(300).select(F.col("id").alias("media_id"))
    # 0-199 distinct images; 200-299 are perturbed clones of 0-99
    blobs = attach_planted_png(ids.filter("media_id < 200"), "media_id")
    clones = attach_planted_png(
        ids.filter("media_id >= 200").select(
            (F.col("media_id") - 200).alias("plant_id"), "media_id"
        ),
        "plant_id",
        perturb=True,
    ).select("media_id", "png")
    corpus = blobs.unionByName(clones)

    meta = extract_media_meta(corpus, "media_id", "png")
    stats = decode_image_stats(corpus, "media_id", "png")
    resized = resize_images(corpus, "media_id", "png", 8, 8)
    pairs = ahash_neardup_pairs(
        image_ahash(corpus, "media_id", "png"), max_hamming=3
    )
    # survivors: drop the higher id of every near-dup pair
    drop = pairs.select(F.col("id_b").alias("media_id")).distinct()
    catalog = (
        stats.join(drop, "media_id", "left_anti")
        .join(meta, "media_id")
        .select(
            "media_id", "width", "height", "mean_gray", "byte_len", "sha256"
        )
    )
    write_orc(catalog, out)
    counts = {
        "ingested": corpus.count(),
        "neardup_pairs": pairs.count(),
        "resized": resized.count(),
        "survivors": catalog.count(),
    }
    return counts


def main() -> None:
    from flink_orc_sink_spark.session import get_spark

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/media_catalog_orc"
    spark = get_spark("media-pipeline")
    counts = run(spark, out)
    for k, v in counts.items():
        print(f"{k:>14}: {v}")
    print(f"catalog ORC at {out}")


if __name__ == "__main__":
    main()
