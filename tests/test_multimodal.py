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


def test_decode_images_stub_raises(spark):
    df = spark.createDataFrame([(1, PNG)], "media_id long, blob binary")
    with pytest.raises(Exception, match="PIL|NotImplemented"):
        decode_images(df, "media_id", "blob", kernel=decode_image_kernel).collect()


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
