"""Multimodal plumbing: real mapInPandas stages driven end-to-end with
deterministic fake kernels (the container has no PIL/ffmpeg — the
kernels are the documented stub seam, the plumbing is real)."""

from __future__ import annotations

import hashlib

import pytest

from flink_orc_sink_spark.operators.multimodal import (
    attach_binary_from_text,
    decode_image_kernel,
    decode_images,
    extract_media_meta,
    sample_frames,
    sample_frames_kernel,
    sniff_mime,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
JPEG = b"\xff\xd8\xff\xe0" + b"\x00" * 32
WAV = b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE" + b"\x00" * 16
MP4 = b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 16


def test_sniff_mime_magic_bytes():
    assert sniff_mime(PNG) == "image/png"
    assert sniff_mime(JPEG) == "image/jpeg"
    assert sniff_mime(WAV) == "audio/wav"
    assert sniff_mime(MP4) == "video/mp4"
    assert sniff_mime(b"plain text") == "application/octet-stream"


def test_extract_media_meta_distributed(spark):
    blobs = [(1, PNG), (2, JPEG), (3, WAV), (4, MP4)]
    df = spark.createDataFrame(blobs, "media_id long, blob binary")
    out = {r.media_id: r for r in extract_media_meta(df, "media_id", "blob").collect()}
    assert out[1].mime_sniff == "image/png"
    assert out[3].mime_sniff == "audio/wav"
    assert out[2].byte_len == len(JPEG)
    assert out[4].sha256 == hashlib.sha256(MP4).hexdigest()


def test_decode_images_with_injected_kernel(spark):
    def fake_kernel(raw: bytes):
        # deterministic fake: dims from the byte length, 4 features
        return len(raw), len(raw) // 2, [float(raw[0]), 1.0, 2.0, 3.0]

    df = spark.createDataFrame([(1, PNG), (2, JPEG)], "media_id long, blob binary")
    rows = {
        r.media_id: r
        for r in decode_images(df, "media_id", "blob", kernel=fake_kernel).collect()
    }
    assert rows[1].width == len(PNG) and rows[1].height == len(PNG) // 2
    assert rows[2].features[0] == float(JPEG[0])


def test_decode_images_stub_raises_for_non_image(spark):
    # PNG and baseline JPEG decode are REAL now (functions/png.py,
    # functions/jpeg.py); the codec seam only remains for formats
    # that genuinely need ffmpeg-class libs
    wav = b"RIFF\x24\x00\x00\x00WAVEfmt " + b"\x00" * 16
    df = spark.createDataFrame([(1, wav)], "media_id long, blob binary")
    with pytest.raises(Exception, match="codec|NotImplemented"):
        decode_images(df, "media_id", "blob", kernel=decode_image_kernel).collect()


def test_decode_images_real_png_kernel(spark):
    """The default kernel decodes real PNG bytes distributed — widths,
    heights, and histogram features from actual pixels."""
    from flink_orc_sink_spark.functions.png import png_encode

    import numpy as np

    px = np.full((4, 6), 255, dtype=np.uint8)  # all-white image
    df = spark.createDataFrame(
        [(7, bytearray(png_encode(px)))], "media_id long, blob binary"
    )
    row = decode_images(df, "media_id", "blob").collect()[0]
    assert (row.width, row.height) == (6, 4)
    # all pixels land in the top histogram bin
    assert row.features[7] == 1.0 and sum(row.features[:7]) == 0.0


def test_sample_frames_fanout_with_injected_kernel(spark):
    def fake_frames(raw: bytes, every_n: int):
        # 3 fake frames per blob, payload derived from input bytes
        return [(i * every_n, raw[:4] + bytes([i])) for i in range(3)]

    df = spark.createDataFrame([(1, MP4), (2, MP4)], "media_id long, blob binary")
    out = sample_frames(df, "media_id", "blob", every_n=10, kernel=fake_frames)
    rows = out.collect()
    assert len(rows) == 6  # 2 blobs x 3 frames
    idxs = sorted(r.frame_idx for r in rows if r.media_id == 1)
    assert idxs == [0, 10, 20]
    assert all(bytes(r.frame_png)[:4] == MP4[:4] for r in rows)


def test_sample_frames_stub_raises(spark):
    df = spark.createDataFrame([(1, MP4)], "media_id long, blob binary")
    with pytest.raises(Exception, match="ffmpeg|NotImplemented"):
        sample_frames(df, "media_id", "blob", kernel=sample_frames_kernel).collect()


def test_attach_binary_roundtrip(spark):
    df = spark.createDataFrame([(1, "héllo")], "doc_id long, text string")
    blob = attach_binary_from_text(df, "text").collect()[0].blob
    assert bytes(blob).decode("utf-8") == "héllo"


def test_resize_images_with_injected_kernel(spark):
    from flink_orc_sink_spark.operators.multimodal import resize_images

    def fake_resize(raw: bytes, w: int, h: int) -> bytes:
        return raw[:8] + bytes([w % 256, h % 256])

    df = spark.createDataFrame([(1, PNG), (2, JPEG)], "media_id long, blob binary")
    rows = {
        r.media_id: r
        for r in resize_images(
            df, "media_id", "blob", width=224, height=224, kernel=fake_resize
        ).collect()
    }
    assert rows[1].width == 224 and rows[1].height == 224
    assert bytes(rows[1].resized) == PNG[:8] + bytes([224, 224])
    assert bytes(rows[2].resized)[:4] == JPEG[:4]


def test_extract_audio_features_with_injected_kernel(spark):
    from flink_orc_sink_spark.operators.multimodal import extract_audio_features

    def fake_audio(raw: bytes) -> tuple[int, int, list[float]]:
        return (len(raw) * 10, 16000, [float(raw[0]), float(len(raw))])

    df = spark.createDataFrame([(1, PNG), (2, MP4)], "media_id long, blob binary")
    rows = {
        r.media_id: r
        for r in extract_audio_features(
            df, "media_id", "blob", kernel=fake_audio
        ).collect()
    }
    assert rows[1].sample_rate == 16000
    assert rows[1].duration_ms == len(PNG) * 10
    assert rows[2].features == [float(MP4[0]), float(len(MP4))]


def test_extract_audio_features_stub_raises(spark):
    from flink_orc_sink_spark.operators.multimodal import (
        extract_audio_features,
        extract_audio_kernel,
    )

    df = spark.createDataFrame([(1, MP4)], "media_id long, blob binary")
    with pytest.raises(Exception, match="librosa|NotImplemented"):
        extract_audio_features(
            df, "media_id", "blob", kernel=extract_audio_kernel
        ).collect()


# --- real container-header parsing (no codecs needed) -----------------

def test_parse_media_dims_roundtrips_planted_containers():
    from flink_orc_sink_spark.operators.multimodal import (
        parse_media_dims,
        plant_media_blob,
    )

    for mid in list(range(0, 40)) + [1023, 4095, 65537]:
        fmt, w, h, sr, dur = parse_media_dims(plant_media_blob(mid))
        m = mid % 4
        if m == 0:
            assert (fmt, w, h, sr, dur) == (
                "png", mid % 1024 + 1, mid % 768 + 1, None, None)
        elif m == 1:
            assert (fmt, w, h, sr, dur) == (
                "gif", mid % 640 + 1, mid % 480 + 1, None, None)
        elif m == 2:
            rate = 8000 + (mid % 8) * 1000
            data = (mid % 64 + 1) * 32
            assert (fmt, w, h, sr, dur) == (
                "wav", None, None, rate, data * 1000 // (rate * 2))
        else:
            assert (fmt, w, h, sr, dur) == (
                "jpeg", mid % 2048 + 1, mid % 1536 + 1, None, None)


def test_parse_media_dims_garbage_and_truncated():
    from flink_orc_sink_spark.operators.multimodal import (
        parse_media_dims,
        plant_media_blob,
    )

    assert parse_media_dims(b"") == (None, None, None, None, None)
    assert parse_media_dims(b"not a container") == (
        None, None, None, None, None)
    # Truncated PNG (signature only, no IHDR): unknown, not a crash.
    assert parse_media_dims(b"\x89PNG\r\n\x1a\n")[0] is None
    # Truncated JPEG (SOI only): recognized container, no dims.
    assert parse_media_dims(b"\xff\xd8\xff") == (
        "jpeg", None, None, None, None)
    # Truncated WAV (no chunks after the RIFF/WAVE preamble).
    assert parse_media_dims(b"RIFF\x04\x00\x00\x00WAVE") == (
        "wav", None, None, None, None)
    # JPEG whose SOF sits behind an APP0 segment (marker walk).
    real = plant_media_blob(3)
    app0 = b"\xff\xd8" + b"\xff\xe0" + (6).to_bytes(2, "big") + b"JFIF" + real[2:]
    assert parse_media_dims(app0)[0] == "jpeg"
    assert parse_media_dims(app0)[1] == 3 % 2048 + 1


def test_decode_media_dims_distributed(spark):
    from flink_orc_sink_spark.operators.multimodal import (
        attach_planted_media,
        decode_media_dims,
    )

    df = spark.range(0, 64).withColumnRenamed("id", "media_id")
    out = decode_media_dims(
        attach_planted_media(df, "media_id"), "media_id", "blob"
    )
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 64
    assert rows[0].format == "png" and rows[0].width == 1
    assert rows[1].format == "gif" and rows[1].height == 2
    assert rows[2].format == "wav" and rows[2].sample_rate == 10000
    assert rows[3].format == "jpeg" and rows[3].width == 4
    # NULL columns stay NULL through Arrow (Int32, not NaN-float).
    assert rows[0].sample_rate is None and rows[2].width is None


def test_png_codec_roundtrip_and_filters():
    """The stdlib PNG codec: encode→decode is exact for grey/RGB/RGBA,
    and the decoder reconstructs all five scanline filter types."""
    import struct
    import zlib

    import numpy as np

    from flink_orc_sink_spark.functions.png import (
        SIGNATURE,
        _chunk,
        png_decode,
        png_encode,
    )

    rng = np.random.RandomState(7)
    for shape in [(3, 3), (11, 5, 3), (6, 8, 4)]:
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        out = png_decode(png_encode(px))
        assert out.shape == px.shape and (out == px).all()

    # hand-filtered RGB image exercising Sub/Up/Average/Paeth
    px = rng.randint(0, 256, size=(4, 5, 3), dtype=np.uint8).astype("int32")
    h, w, c = px.shape
    stride, bpp = w * c, c
    flat = px.reshape(h, stride)
    rows = []
    for y, ft in zip(range(h), [1, 2, 3, 4]):
        line = flat[y]
        above = flat[y - 1] if y else np.zeros(stride, "int32")
        enc = np.zeros(stride, "int32")
        for x in range(stride):
            left = line[x - bpp] if x >= bpp else 0
            up = above[x]
            ul = above[x - bpp] if x >= bpp else 0
            if ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc2 = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc2 else (up if pb <= pc2 else ul)
            enc[x] = (line[x] - pred) & 0xFF
        rows.append(bytes([ft]) + bytes(enc.astype(np.uint8)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    assert (png_decode(raw) == px.astype(np.uint8)).all()


def test_decode_image_stats_matches_plant_arithmetic(spark):
    """The distributed decode path (real inflate + unfilter) must
    reproduce the planted-pixel arithmetic exactly."""
    from pyspark.sql import functions as F

    from flink_orc_sink_spark.operators.multimodal import (
        attach_planted_png,
        decode_image_stats,
    )

    ids = spark.range(30).select(F.col("id").alias("media_id"))
    got = {
        r.media_id: (r.width, r.height, r.pixel_sum)
        for r in decode_image_stats(
            attach_planted_png(ids, "media_id"), "media_id", "png"
        ).collect()
    }
    for mid in range(30):
        w, h = mid % 24 + 8, mid % 18 + 8
        a, b, c = 3 + 2 * (mid % 5), 7 + 5 * (mid % 3), mid % 7
        s = sum(
            (a * x + b * y + c * x * y + mid) % 256
            for x in range(w)
            for y in range(h)
        )
        assert got[mid] == (w, h, s), mid


def test_phash_neardup_finds_planted_clones(spark):
    """Perceptual-hash dedup must pair every planted clone with its
    source at Hamming ≤ 3 (100% recall on the planted set)."""
    from pyspark.sql import functions as F

    from flink_orc_sink_spark.operators.multimodal import (
        ahash_neardup_pairs,
        attach_planted_png,
        image_ahash,
    )

    base = spark.range(40).select(F.col("id").alias("media_id"))
    clones = (
        spark.range(40)
        .select((F.col("id") + 1000).alias("media_id"),
                F.col("id").alias("plant_id"))
    )
    blobs = attach_planted_png(base, "media_id").unionByName(
        attach_planted_png(clones, "plant_id", perturb=True).select(
            "media_id", "png"
        )
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in ahash_neardup_pairs(
            image_ahash(blobs, "media_id", "png"), max_hamming=3
        ).collect()
    }
    for i in range(40):
        assert (i, i + 1000) in pairs, i


def test_ahash_index_lifecycle_and_replay(spark, tmp_path):
    """Persisted perceptual-hash index: build → probe → append →
    probe again must equal the one-shot banded search (pigeonhole-
    complete, so exact), and a replay double-append must not
    duplicate probe rows or self-match."""
    from pyspark.sql import functions as F

    from flink_orc_sink_spark.operators.multimodal import (
        ahash_neardup_pairs,
        ahash_probe_index,
        append_to_ahash_index,
        attach_planted_png,
        build_ahash_index,
        image_ahash,
    )

    base = spark.range(0, 30, 1, 4).select(F.col("id").alias("media_id"))
    clones = spark.range(0, 30, 1, 4).select(
        (F.col("id") + 1000).alias("media_id")
    )
    blobs = attach_planted_png(base, "media_id").unionByName(
        attach_planted_png(
            clones.withColumn("src_id", F.col("media_id") - 1000)
            .select(F.col("src_id").alias("plant_id"), "media_id"),
            "plant_id",
            perturb=True,
        ).select("media_id", "png")
    )
    hashes = image_ahash(blobs, "media_id", "png").localCheckpoint()
    orig_h = hashes.filter(F.col("media_id") < 1000)
    clone_h = hashes.filter(F.col("media_id") >= 1000)

    idx = str(tmp_path / "ahashidx")
    build_ahash_index(orig_h, "media_id", "ahash", idx)
    probed = ahash_probe_index(
        spark, clone_h, "media_id", "ahash", idx, max_hamming=3
    )
    got = {(r.new_id, r.match_id, r.hamming) for r in probed.collect()}
    # one-shot reference over the full corpus, restricted to
    # cross(clone, original) pairs
    ref = {
        (r.id_b, r.id_a, r.hamming)
        for r in ahash_neardup_pairs(hashes, max_hamming=3).collect()
        if r.id_b >= 1000 and r.id_a < 1000
    }
    assert got == ref and len(got) >= 30  # every planted pair found

    # replay: append the clone batch TWICE, then probe it again —
    # rows must not duplicate, and self-matches must not appear
    append_to_ahash_index(clone_h, "media_id", "ahash", idx)
    append_to_ahash_index(clone_h, "media_id", "ahash", idx)
    rows = ahash_probe_index(
        spark, clone_h, "media_id", "ahash", idx, max_hamming=3
    ).collect()
    keys = [(r.new_id, r.match_id) for r in rows]
    assert len(keys) == len(set(keys))
    assert all(a != b for a, b in keys)

    # pigeonhole guard carries over to the index probe
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ahash_probe_index(
            spark, clone_h, "media_id", "ahash", idx, max_hamming=4
        )
