"""Unit tests for the dependency-free GIF codec (functions/gif.py)."""

import numpy as np
import pytest

from flink_orc_sink_spark.functions.gif import gif_decode, gif_encode


def test_roundtrip_noise_exercises_width_growth():
    """Random pixels push the LZW dictionary through every code width
    (9→12 bits) — any encoder/decoder width-handshake slip corrupts
    the stream immediately."""
    px = np.random.RandomState(3).randint(0, 256, (64, 80)).astype(np.uint8)
    assert np.array_equal(gif_decode(gif_encode(px)), px)


def test_roundtrip_large_noise_exercises_dictionary_reset():
    """60k noise pixels overflow the 4095-entry table repeatedly —
    the clear-code reset path must resynchronise both sides."""
    px = np.random.RandomState(4).randint(0, 256, (200, 300)).astype(np.uint8)
    assert np.array_equal(gif_decode(gif_encode(px)), px)


def test_roundtrip_repetitive_data_kwkwk():
    """Long runs produce the KwKwK case (a code referencing the entry
    being defined)."""
    px = np.tile(np.array([5, 5, 5, 9, 9], np.uint8), (40, 50))[:40, :250]
    assert np.array_equal(gif_decode(gif_encode(px)), px)


def test_gradient_and_constant():
    x, y = np.arange(80), np.arange(48)
    grad = ((3 * x[None, :] + 5 * y[:, None]) % 256).astype(np.uint8)
    assert np.array_equal(gif_decode(gif_encode(grad)), grad)
    const = np.full((20, 30), 77, np.uint8)
    assert np.array_equal(gif_decode(gif_encode(const)), const)


def test_decoder_skips_extensions():
    """GIF89a files carry graphic-control extensions before the image
    descriptor — the block walk must skip them by sub-block size."""
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    raw = bytearray(gif_encode(px))
    # splice a Graphic Control Extension after the palette
    # (header 13 bytes + 768-byte palette)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    at = 13 + 768
    spliced = bytes(raw[:at]) + gce + bytes(raw[at:])
    assert np.array_equal(gif_decode(spliced), px)


def test_rejects_non_gif():
    with pytest.raises(ValueError):
        gif_decode(b"NOTAGIF" + b"\x00" * 20)


def test_planted_gif_matches_arithmetic():
    from flink_orc_sink_spark.operators.multimodal import plant_gif_pixels

    for mid in (0, 1, 42, 123, 199):
        px = gif_decode(plant_gif_pixels(mid))
        w, h = mid % 20 + 9, mid % 14 + 9
        assert px.shape == (h, w)
        a, b, c = 2 + mid % 6, 5 + mid % 4, mid % 5
        xs = np.arange(w, dtype=np.int64)[None, :]
        ys = np.arange(h, dtype=np.int64)[:, None]
        want = ((a * xs + b * ys + c * xs * ys + 3 * mid) % 256).astype(
            np.uint8
        )
        assert np.array_equal(px, want), mid


def test_decode_kernel_dispatches_gif():
    from flink_orc_sink_spark.operators.multimodal import decode_image_kernel

    px = np.random.RandomState(5).randint(0, 256, (12, 20)).astype(np.uint8)
    w, h, feats = decode_image_kernel(gif_encode(px))
    assert (w, h) == (20, 12)
    assert len(feats) == 8 and abs(sum(feats) - 1.0) < 0.01


def test_animated_gif_roundtrip_and_sampling():
    from flink_orc_sink_spark.functions.gif import (
        gif_decode_frames,
        gif_encode_animated,
    )
    from flink_orc_sink_spark.functions.png import png_decode
    from flink_orc_sink_spark.operators.multimodal import (
        sample_frames_kernel,
    )

    rng = np.random.RandomState(9)
    frames = [rng.randint(0, 256, (12, 18)).astype(np.uint8) for _ in range(6)]
    raw = gif_encode_animated(frames, delay_cs=5)
    dec = gif_decode_frames(raw)
    assert len(dec) == 6
    assert all(np.array_equal(a, b) for a, b in zip(frames, dec))
    sampled = sample_frames_kernel(raw, 2)
    assert [i for i, _ in sampled] == [0, 2, 4]
    for i, png in sampled:
        assert np.array_equal(png_decode(png), frames[i])


def test_partial_canvas_frame_rejected():
    """A frame not covering the full logical screen needs disposal
    compositing — refuse rather than return wrong pixels."""
    import struct

    from flink_orc_sink_spark.functions.gif import gif_decode

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    raw = bytearray(gif_encode(px))
    # enlarge the logical screen so the frame becomes partial
    raw[6:8] = struct.pack("<H", 16)
    with pytest.raises(NotImplementedError):
        gif_decode(bytes(raw))


def test_interlaced_gif_decodes():
    """Interlace flag: rows arrive in the 8/8/4/2 pass order; the
    decoder must reorder them back."""
    px = np.random.RandomState(12).randint(0, 256, (16, 10)).astype(np.uint8)
    h = px.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    raw = bytearray(gif_encode(px[order]))  # rows stored in pass order
    desc_at = 13 + 768  # header + palette -> image descriptor
    assert raw[desc_at] == 0x2C
    raw[desc_at + 9] |= 0x40  # set the interlace flag
    assert np.array_equal(gif_decode(bytes(raw)), px)
