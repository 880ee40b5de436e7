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


def test_partial_canvas_frame_composites_onto_background():
    """A frame not covering the full logical screen composites onto
    the background-initialized canvas (round-8: the disposal seam is
    closed — previously NotImplementedError)."""
    import struct

    from flink_orc_sink_spark.functions.gif import gif_decode

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    raw = bytearray(gif_encode(px))
    # enlarge the logical screen so the frame becomes partial
    raw[6:8] = struct.pack("<H", 16)
    got = gif_decode(bytes(raw))
    assert got.shape == (8, 16)
    assert np.array_equal(got[:, :8], px)
    assert (got[:, 8:] == 0).all()  # background index 0 -> grey 0


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


# ---- disposal-method compositing (GIF89a §23) -----------------------


def _reference_composite(size, patches, background=0):
    """Pure-NumPy oracle for the compositing semantics: greyscale
    identity palette makes decoded grey value == palette index, so
    the whole pipeline is integer-exact and oracle-checkable."""
    h, w = size
    canvas = np.full((h, w), background, dtype=np.uint8)
    outs = []
    for p in patches:
        px = np.asarray(p["pixels"], dtype=np.uint8)
        ph, pw = px.shape
        x, y = p.get("x", 0), p.get("y", 0)
        region = canvas[y : y + ph, x : x + pw]
        saved = region.copy()
        tr = p.get("transparent")
        if tr is None:
            region[...] = px
        else:
            m = px != tr
            region[m] = px[m]
        outs.append(canvas.copy())
        disp = p.get("disposal", 0)
        if disp == 2:
            canvas[y : y + ph, x : x + pw] = background
        elif disp == 3:
            canvas[y : y + ph, x : x + pw] = saved
    return outs


def _check(size, patches, background=0):
    from flink_orc_sink_spark.functions.gif import (
        gif_decode_frames,
        gif_encode_patches,
    )

    raw = gif_encode_patches(size, patches, background=background)
    got = gif_decode_frames(raw)
    want = _reference_composite(size, patches, background)
    assert len(got) == len(want)
    for i, (g, w_) in enumerate(zip(got, want)):
        assert np.array_equal(g, w_), f"frame {i}"


def test_disposal_none_overlays_accumulate():
    base = np.full((6, 6), 100, dtype=np.uint8)
    patch = np.full((2, 3), 200, dtype=np.uint8)
    _check(
        (6, 6),
        [
            {"x": 0, "y": 0, "pixels": base, "disposal": 0},
            {"x": 2, "y": 1, "pixels": patch, "disposal": 1},
            {"x": 0, "y": 4, "pixels": patch, "disposal": 0},
        ],
    )


def test_disposal_background_clears_region():
    from flink_orc_sink_spark.functions.gif import (
        gif_decode_frames,
        gif_encode_patches,
    )

    base = np.full((5, 5), 50, dtype=np.uint8)
    blink = np.full((2, 2), 250, dtype=np.uint8)
    patches = [
        {"x": 0, "y": 0, "pixels": base, "disposal": 0},
        {"x": 1, "y": 1, "pixels": blink, "disposal": 2},
        {"x": 0, "y": 0, "pixels": np.full((1, 1), 7, np.uint8)},
    ]
    _check((5, 5), patches, background=9)
    # spot-check the semantic: frame 3 shows the blink region
    # restored to BACKGROUND (9), not to the base image (50)
    f3 = gif_decode_frames(gif_encode_patches((5, 5), patches, 9))[2]
    assert (f3[1:3, 1:3] == 9).all()
    assert f3[0, 0] == 7 and f3[4, 4] == 50


def test_disposal_previous_restores_pre_frame_canvas():
    from flink_orc_sink_spark.functions.gif import (
        gif_decode_frames,
        gif_encode_patches,
    )

    base = np.arange(36, dtype=np.uint8).reshape(6, 6)
    pop = np.full((3, 3), 255, dtype=np.uint8)
    patches = [
        {"x": 0, "y": 0, "pixels": base, "disposal": 0},
        {"x": 2, "y": 2, "pixels": pop, "disposal": 3},
        {"x": 0, "y": 0, "pixels": np.full((1, 1), 9, np.uint8)},
    ]
    _check((6, 6), patches)
    # frame 3: the pop region is back to base (disposal 3), only the
    # 1x1 corner overwrite differs
    f3 = gif_decode_frames(gif_encode_patches((6, 6), patches))[2]
    want = base.copy()
    want[0, 0] = 9
    assert np.array_equal(f3, want)


def test_transparent_pixels_let_canvas_through():
    base = np.full((4, 4), 10, dtype=np.uint8)
    overlay = np.array([[1, 2], [2, 1]], dtype=np.uint8)
    _check(
        (4, 4),
        [
            {"x": 0, "y": 0, "pixels": base},
            {"x": 1, "y": 1, "pixels": overlay, "transparent": 2},
        ],
    )


def test_full_canvas_animated_gif_unchanged_by_compositing():
    """gif_encode_animated output (full-canvas, opaque, disposal 0)
    decodes to exactly the per-frame images — compositing is a no-op
    for the pre-round-8 surface."""
    from flink_orc_sink_spark.functions.gif import (
        gif_decode_frames,
        gif_encode_animated,
    )

    rng = np.random.RandomState(5)
    frames = [
        rng.randint(0, 256, (7, 9)).astype(np.uint8) for _ in range(4)
    ]
    got = gif_decode_frames(gif_encode_animated(frames))
    assert len(got) == 4
    for g, f in zip(got, frames):
        assert np.array_equal(g, f)
