"""Multimodal media pipeline — a training-data run over MIXED media,
end to end on real bytes (no PIL/ffmpeg anywhere):

1. ingest       — binary blobs as opaque columns (here: planted,
                  REAL files built executor-side — PNG, baseline
                  JPEG, and GIF images; PCM WAV audio; MJPEG-AVI
                  video)
2. audit        — byte-level meta (size/sha256/mime sniff) +
                  container-header dims, map-only
3. pixel decode — the stdlib codecs (functions/png.py, jpeg.py,
                  gif.py) behind one magic-dispatch kernel: exact
                  pixel statistics for every image format
4. normalize    — nearest-neighbour resize to 8×8 through re-encode
5. dedup        — perceptual average-hash + banded Hamming pairing
                  (no all-pairs comparison), across formats
6. audio/video  — WAV waveform features (functions/wav.py) and
                  MJPEG frame sampling (functions/avi.py)
7. sink         — committed ORC of the deduped media catalog

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
        attach_planted_avi,
        attach_planted_gif,
        attach_planted_jpeg,
        attach_planted_png,
        attach_planted_wav,
        decode_image_stats,
        extract_audio_features,
        extract_media_meta,
        image_ahash,
        resize_images,
        sample_frames,
    )
    from flink_orc_sink_spark.sources.orc_sink import write_orc

    ids = spark.range(300).select(F.col("id").alias("media_id"))
    # 0-119 PNGs; 120-159 JPEGs; 160-199 GIFs; 200-299 perturbed PNG
    # clones of 0-99 (the near-dup tier)
    pngs = attach_planted_png(
        ids.filter("media_id < 120"), "media_id"
    ).withColumnRenamed("png", "blob")
    jpegs = attach_planted_jpeg(
        ids.filter("media_id >= 120 and media_id < 160"), "media_id"
    ).withColumnRenamed("jpeg", "blob")
    gifs = attach_planted_gif(
        ids.filter("media_id >= 160 and media_id < 200"), "media_id"
    ).withColumnRenamed("gif", "blob")
    clones = (
        attach_planted_png(
            ids.filter("media_id >= 200").select(
                (F.col("media_id") - 200).alias("plant_id"), "media_id"
            ),
            "plant_id",
            perturb=True,
        )
        .select("media_id", F.col("png").alias("blob"))
    )
    corpus = pngs.unionByName(jpegs).unionByName(gifs).unionByName(clones)

    meta = extract_media_meta(corpus, "media_id", "blob")
    stats = decode_image_stats(corpus, "media_id", "blob")
    resized = resize_images(corpus, "media_id", "blob", 8, 8)
    pairs = ahash_neardup_pairs(
        image_ahash(corpus, "media_id", "blob"), max_hamming=3
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

    # audio + video tiers on their own planted corpora
    aud_ids = spark.range(40).select(F.col("id").alias("media_id"))
    audio = extract_audio_features(
        attach_planted_wav(aud_ids, "media_id"), "media_id", "wav"
    )
    vid_ids = spark.range(20).select(F.col("id").alias("media_id"))
    frames = sample_frames(
        attach_planted_avi(vid_ids, "media_id"), "media_id", "avi", every_n=2
    )

    counts = {
        "ingested": corpus.count(),
        "neardup_pairs": pairs.count(),
        "resized": resized.count(),
        "survivors": catalog.count(),
        "audio_clips": audio.count(),
        "video_frames": frames.count(),
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
