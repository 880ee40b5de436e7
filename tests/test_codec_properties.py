"""Property-based tests (hypothesis) for the stdlib media codecs:
random images/waveforms round-trip through the real byte formats.
These are pure-Python properties (no Spark job per example), so
example counts can be generous."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

# derandomize: the exploration already happened during development
# (incl. the error-2 flat-quant counterexample); CI runs the same
# example corpus every time so a gate run can never flake on a fresh
# random draw.
SETTINGS = settings(max_examples=40, deadline=None, derandomize=True)

dims = st.integers(min_value=1, max_value=40)


@st.composite
def grey_images(draw):
    h, w = draw(dims), draw(dims)
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    return np.random.RandomState(seed).randint(0, 256, (h, w)).astype(
        np.uint8
    )


@SETTINGS
@given(grey_images())
def test_gif_roundtrip_lossless(px):
    from flink_orc_sink_spark.functions.gif import gif_decode, gif_encode

    assert np.array_equal(gif_decode(gif_encode(px)), px)


@SETTINGS
@given(grey_images())
def test_png_roundtrip_lossless(px):
    from flink_orc_sink_spark.functions.png import png_decode, png_encode

    assert np.array_equal(png_decode(png_encode(px)), px)


@SETTINGS
@given(grey_images())
def test_jpeg_flat_quant_bounded_error(px):
    """Flat quantisation: the only loss is coefficient rounding
    (≤ 0.5 per quantised coefficient), which can COMPOUND across the
    64 coefficients touching a pixel — hypothesis found real inputs
    at error 2, so the honest bound is a few counts, not ±1. (Bit
    exactness holds only in the constant-block window the oracles
    use, where AC ≡ 0.)"""
    from flink_orc_sink_spark.functions.jpeg import jpeg_decode, jpeg_encode

    dec = jpeg_decode(jpeg_encode(px, flat_quant=True))
    assert dec.shape == px.shape
    assert np.abs(px.astype(int) - dec.astype(int)).max() <= 4


@SETTINGS
@given(grey_images(), st.integers(min_value=1, max_value=5))
def test_jpeg_restart_interval_any_stride(px, dri):
    from flink_orc_sink_spark.functions.jpeg import jpeg_decode, jpeg_encode

    dec = jpeg_decode(jpeg_encode(px, flat_quant=True, restart_interval=dri))
    assert np.abs(px.astype(int) - dec.astype(int)).max() <= 4


@st.composite
def waveforms(draw):
    n = draw(st.integers(min_value=1, max_value=500))
    ch = draw(st.integers(min_value=1, max_value=3))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    sr = draw(st.sampled_from([8000, 16000, 44100]))
    x = (
        np.random.RandomState(seed)
        .randint(-32768, 32768, (n, ch))
        .astype(np.int16)
    )
    return sr, x


@SETTINGS
@given(waveforms())
def test_wav_roundtrip_any_channels(args):
    from flink_orc_sink_spark.functions.wav import wav_decode, wav_encode

    sr, x = args
    sr2, d = wav_decode(wav_encode(x, sr))
    assert sr2 == sr and d.shape == x.shape and (d == x).all()


@SETTINGS
@given(waveforms())
def test_waveform_features_match_reference(args):
    """Features vs a straightforward pure-Python reference."""
    from flink_orc_sink_spark.functions.wav import waveform_features

    sr, x = args
    dur, sr2, feats = waveform_features(sr, x)
    n, ch = x.shape
    mono = [int(sum(int(v) for v in row)) // ch for row in x]
    assert dur == n * 1000 // sr and sr2 == sr
    assert feats[0] == float(max(abs(v) for v in mono))
    assert feats[1] == float(
        sum(1 for i in range(1, n) if mono[i - 1] * mono[i] < 0)
    )
    assert feats[2] == float(sum(v * v for v in mono) // n)
    assert feats[3] == float(sum(abs(v) for v in mono) * 100 // n)


@SETTINGS
@given(
    st.lists(grey_images(), min_size=1, max_size=5),
    st.integers(min_value=1, max_value=4),
)
def test_avi_frame_sampling_any_stride(frames_px, every_n):
    """Container round trip: frames out == frames in, stride honored.
    AVI stores one frame size in the header but the chunk walk must
    not assume it, so frames deliberately vary in size."""
    from flink_orc_sink_spark.functions.avi import (
        avi_encode_mjpeg,
        avi_extract_frames,
    )
    from flink_orc_sink_spark.functions.jpeg import jpeg_encode

    frames = [jpeg_encode(px, flat_quant=True) for px in frames_px]
    h, w = frames_px[0].shape
    out = avi_extract_frames(avi_encode_mjpeg(frames, w, h))
    assert out == frames


@st.composite
def gif_patch_sequences(draw):
    """Random disposal-compositing scenario: canvas size + 1-5 patches
    with random offsets, disposal methods, and transparency."""
    h = draw(st.integers(min_value=2, max_value=24))
    w = draw(st.integers(min_value=2, max_value=24))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.RandomState(seed)
    n = draw(st.integers(min_value=1, max_value=5))
    patches = []
    for k in range(n):
        ph = draw(st.integers(min_value=1, max_value=h))
        pw = draw(st.integers(min_value=1, max_value=w))
        patches.append(
            {
                "x": draw(st.integers(min_value=0, max_value=w - pw)),
                "y": draw(st.integers(min_value=0, max_value=h - ph)),
                "pixels": rng.randint(0, 256, (ph, pw)).astype(np.uint8),
                "disposal": draw(st.sampled_from([0, 1, 2, 3])),
                "transparent": draw(
                    st.one_of(
                        st.none(),
                        st.integers(min_value=0, max_value=255),
                    )
                ),
            }
        )
    bg = draw(st.integers(min_value=0, max_value=255))
    return (h, w), patches, bg


@SETTINGS
@given(gif_patch_sequences())
def test_gif_disposal_compositing_matches_reference(args):
    """Every random patch/disposal/transparency sequence composites
    byte-identically to the pure-NumPy reference (greyscale identity
    palette => decoded grey value == palette index)."""
    from flink_orc_sink_spark.functions.gif import (
        gif_decode_frames,
        gif_encode_patches,
    )

    size, patches, bg = args
    h, w = size
    canvas = np.full((h, w), bg, dtype=np.uint8)
    want = []
    for p in patches:
        px, ph, pw = p["pixels"], *p["pixels"].shape
        x, y, tr = p["x"], p["y"], p["transparent"]
        region = canvas[y : y + ph, x : x + pw]
        saved = region.copy()
        if tr is None:
            region[...] = px
        else:
            m = px != tr
            region[m] = px[m]
        want.append(canvas.copy())
        if p["disposal"] == 2:
            canvas[y : y + ph, x : x + pw] = bg
        elif p["disposal"] == 3:
            canvas[y : y + ph, x : x + pw] = saved

    got = gif_decode_frames(
        gif_encode_patches(size, patches, background=bg)
    )
    assert len(got) == len(want)
    for g, w_ in zip(got, want):
        assert np.array_equal(g, w_)
