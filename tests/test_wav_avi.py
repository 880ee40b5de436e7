"""Unit tests for the dependency-free WAV/PCM codec (functions/wav.py)
and the MJPEG-AVI container codec (functions/avi.py), plus their
multimodal kernel wiring."""

import numpy as np
import pytest

from flink_orc_sink_spark.functions.wav import (
    wav_decode,
    wav_encode,
    waveform_features,
)


def test_wav_roundtrip_mono_and_stereo():
    x = (np.arange(3000) % 700 - 350).astype(np.int16)
    sr, d = wav_decode(wav_encode(x, 22050))
    assert sr == 22050 and d.shape == (3000, 1) and (d[:, 0] == x).all()
    st = np.stack([x, (-x).astype(np.int16)], axis=1)
    sr2, d2 = wav_decode(wav_encode(st, 8000))
    assert sr2 == 8000 and d2.shape == (3000, 2) and (d2 == st).all()


def test_wav_skips_extra_chunks():
    """Real WAVs carry LIST/INFO chunks between fmt and data — the
    walk must skip them by size, not assume adjacency."""
    import struct

    x = np.array([100, -100, 50], dtype=np.int16)
    raw = bytearray(wav_encode(x, 8000))
    # splice a LIST chunk right after the fmt chunk (ends at 12+8+16)
    insert_at = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    spliced = bytes(raw[:insert_at]) + junk + bytes(raw[insert_at:])
    sr, d = wav_decode(spliced)
    assert sr == 8000 and (d[:, 0] == x).all()


def test_wav_8bit_pcm():
    import struct

    samples = bytes([0, 128, 255, 64])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 4) + samples
    )
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    sr, d = wav_decode(raw)
    assert list(d[:, 0]) == [-32768, 0, 32512, -16384]


def test_wav_rejects_non_pcm():
    import struct

    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float PCM
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        wav_decode(raw)


def test_waveform_features_integer_exact():
    x = np.array([[3], [-4], [0], [5], [-5]], dtype=np.int16)
    dur, sr, feats = waveform_features(1000, x)
    assert (dur, sr) == (5, 1000)
    # peak 5; strict crossings: 3/-4, -4/0 no, 0/5 no, 5/-5 -> 2
    assert feats == [5.0, 2.0, float((9 + 16 + 0 + 25 + 25) // 5),
                     float((3 + 4 + 0 + 5 + 5) * 100 // 5)]


def test_avi_roundtrip_frames():
    from flink_orc_sink_spark.functions.avi import (
        avi_encode_mjpeg,
        avi_extract_frames,
    )
    from flink_orc_sink_spark.functions.jpeg import jpeg_decode, jpeg_encode

    frames = []
    for f in range(4):
        px = np.full((16, 16), 40 * f + 7, dtype=np.uint8)
        frames.append(jpeg_encode(px, flat_quant=True))
    raw = avi_encode_mjpeg(frames, 16, 16, fps=5)
    out = avi_extract_frames(raw)
    assert len(out) == 4
    for f, fb in enumerate(out):
        assert fb == frames[f]
        assert (jpeg_decode(fb) == 40 * f + 7).all()


def test_sample_frames_kernel_stride_and_png():
    from flink_orc_sink_spark.functions.png import png_decode
    from flink_orc_sink_spark.operators.multimodal import (
        plant_mjpeg_avi,
        sample_frames_kernel,
    )

    sampled = sample_frames_kernel(plant_mjpeg_avi(3, n_frames=7), 3)
    assert [i for i, _ in sampled] == [0, 3, 6]
    for _, png in sampled:
        assert png_decode(png).shape == (16, (3 % 3 + 2) * 8)


def test_audio_kernel_rejects_compressed():
    from flink_orc_sink_spark.operators.multimodal import (
        extract_audio_kernel,
    )

    with pytest.raises(NotImplementedError):
        extract_audio_kernel(b"ID3\x04\x00" + b"\x00" * 32)  # mp3


def test_frame_kernel_rejects_codec_video(spark):
    """Non-MJPEG video keeps the honest ffmpeg seam, and the Spark
    operator surfaces it."""
    from flink_orc_sink_spark.operators.multimodal import (
        sample_frames,
    )

    mp4 = b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 32
    df = spark.createDataFrame([(1, mp4)], "media_id long, blob binary")
    with pytest.raises(Exception, match="ffmpeg|NotImplemented"):
        sample_frames(df, "media_id", "blob", every_n=2).collect()


def test_audio_features_distributed(spark):
    """The full Spark path: planted WAVs through mapInPandas match the
    local kernel exactly."""
    from flink_orc_sink_spark.operators.multimodal import (
        attach_planted_wav,
        extract_audio_kernel,
        extract_audio_features,
        plant_wav_samples,
    )

    ids = spark.range(0, 20, 1, 4).selectExpr("id as media_id")
    rows = {
        r.media_id: r
        for r in extract_audio_features(
            attach_planted_wav(ids, "media_id"), "media_id", "wav"
        ).collect()
    }
    assert len(rows) == 20
    for mid in (0, 7, 19):
        dur, sr, feats = extract_audio_kernel(plant_wav_samples(mid))
        r = rows[mid]
        assert (r.duration_ms, r.sample_rate) == (dur, sr)
        assert [float(v) for v in r.features] == feats


def test_wav_truncated_data_chunk_drops_partial_frame():
    """A data chunk whose declared size exceeds the file must not
    crash: the payload slice truncates and a trailing partial frame
    (odd byte count for 16-bit stereo) is dropped."""
    import struct

    from flink_orc_sink_spark.functions.wav import wav_decode, wav_encode

    x = np.stack(
        [np.arange(10, dtype=np.int16), np.arange(10, dtype=np.int16)], 1
    )
    raw = bytearray(wav_encode(x, 8000))
    # inflate the data chunk's declared size and chop 3 real bytes
    raw[-7:] = b""  # drop into the final frame
    sr, d = wav_decode(bytes(raw))
    assert sr == 8000 and d.shape[1] == 2 and d.shape[0] <= 9


def test_avi_decoder_tolerates_missing_idx1():
    """The frame walk trusts the movi LIST only — a file with its
    idx1 stripped (some muxers omit it) must still yield frames."""
    import struct

    from flink_orc_sink_spark.functions.avi import (
        avi_encode_mjpeg,
        avi_extract_frames,
    )
    from flink_orc_sink_spark.functions.jpeg import jpeg_encode

    frames = [
        jpeg_encode(np.full((8, 8), v, np.uint8), flat_quant=True)
        for v in (10, 200)
    ]
    raw = bytearray(avi_encode_mjpeg(frames, 8, 8))
    i = raw.find(b"idx1")
    stripped = bytes(raw[: i - 0 - 0][: raw.find(b"idx1")])
    # fix the RIFF size field for the shorter file
    stripped = bytearray(stripped)
    struct.pack_into("<I", stripped, 4, len(stripped) - 8)
    assert avi_extract_frames(bytes(stripped)) == frames


def test_wav_rejects_zero_channels_and_zero_rate():
    """A malformed fmt chunk declaring channels=0 (or sample_rate=0)
    must raise the module's ValueError for bad input, not leak a
    ZeroDivisionError from the frame math (round-4 advisory)."""
    import struct

    for ch, rate in ((0, 8000), (1, 0)):
        fmt = struct.pack("<HHIIHH", 1, ch, rate, 16000, 2, 16)
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x01\x00\x02\x00"
        )
        raw = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(ValueError):
            wav_decode(raw)
