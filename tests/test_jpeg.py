"""Unit tests for the dependency-free baseline JPEG codec
(functions/jpeg.py) and its multimodal wiring."""

import numpy as np
import pytest

from flink_orc_sink_spark.functions.jpeg import jpeg_decode, jpeg_encode


def _checker(h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w)).astype(np.uint8)


def test_constant_blocks_flat_quant_bit_exact():
    """The exactness window the SQL oracle relies on: constant 8×8
    blocks under all-ones quantisation round-trip with ZERO loss."""
    rng = np.random.RandomState(7)
    blocks = rng.randint(0, 256, (5, 7))
    px = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
    assert np.array_equal(jpeg_decode(jpeg_encode(px, flat_quant=True)), px)


def test_gradient_flat_quant_near_lossless():
    x, y = np.arange(64), np.arange(48)
    px = ((3 * x[None, :] + 5 * y[:, None]) % 256).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(px, flat_quant=True))
    assert np.abs(px.astype(int) - dec.astype(int)).max() <= 1


def test_standard_tables_bounded_error():
    """Real Annex-K quantisation at quality 90 on noise: lossy but
    bounded — proves non-trivial AC runs / ZRL / magnitude coding."""
    px = _checker(40, 40)
    dec = jpeg_decode(jpeg_encode(px, quality=90))
    assert dec.shape == px.shape
    assert np.abs(px.astype(int) - dec.astype(int)).max() <= 40
    assert abs(float(px.mean()) - float(dec.mean())) < 3.0


def test_color_444_round_trip():
    rgb = np.stack(
        [_checker(24, 33, s) for s in range(3)], axis=-1
    ).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(rgb, flat_quant=True, subsampling="444"))
    assert dec.shape == rgb.shape
    # only colour-transform rounding remains under flat quant
    assert np.abs(rgb.astype(int) - dec.astype(int)).max() <= 4


def test_color_420_subsampling():
    """4:2:0: chroma at quarter resolution — smooth chroma survives,
    odd dimensions crop correctly."""
    h, w = 41, 53
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = (np.arange(w)[None, :] * 2 % 200).astype(np.uint8)
    img[..., 1] = (np.arange(h)[:, None] * 3 % 200).astype(np.uint8)
    img[..., 2] = 128
    dec = jpeg_decode(jpeg_encode(img, quality=85, subsampling="420"))
    assert dec.shape == img.shape
    assert np.abs(img.astype(int) - dec.astype(int)).max() <= 12


def test_restart_intervals():
    """DRI/RSTn: predictors reset, bit realign, marker split."""
    x, y = np.arange(48), np.arange(32)
    px = ((7 * x[None, :] + 11 * y[:, None]) % 256).astype(np.uint8)
    raw = jpeg_encode(px, flat_quant=True, restart_interval=2)
    assert b"\xff\xd0" in raw or b"\xff\xd1" in raw
    dec = jpeg_decode(raw)
    assert np.abs(px.astype(int) - dec.astype(int)).max() <= 1


def test_odd_dimensions_pad_and_crop():
    px = _checker(19, 21)
    dec = jpeg_decode(jpeg_encode(px, flat_quant=True))
    assert dec.shape == (19, 21)


def test_header_dims_agree_with_sniffer():
    """The pixel decoder and the header-level dims parser must agree
    on the same bytes."""
    from flink_orc_sink_spark.operators.multimodal import sniff_mime

    px = _checker(24, 40)
    raw = jpeg_encode(px, quality=75)
    assert sniff_mime(raw) == "image/jpeg"
    import struct

    # find SOF0 and read its dims directly
    pos = 2
    while pos < len(raw):
        marker = raw[pos + 1]
        (length,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
        if marker == 0xC0:
            _, h, w, _ = struct.unpack(">BHHB", raw[pos + 4 : pos + 10])
            assert (h, w) == (24, 40)
            break
        pos += 2 + length


def test_progressive_rejected():
    px = _checker(16, 16)
    raw = bytearray(jpeg_encode(px, flat_quant=True))
    idx = raw.find(b"\xff\xc0")
    raw[idx + 1] = 0xC2  # pretend progressive
    with pytest.raises(NotImplementedError):
        jpeg_decode(bytes(raw))


def test_planted_jpeg_matches_arithmetic():
    """plant_jpeg_pixels decodes to exactly the arithmetic block grid
    the SQL oracle sums — locally, without Spark."""
    from flink_orc_sink_spark.operators.multimodal import plant_jpeg_pixels

    for mid in (0, 1, 17, 123, 199):
        px = jpeg_decode(plant_jpeg_pixels(mid))
        bw, bh = mid % 5 + 3, mid % 4 + 2
        assert px.shape == (bh * 8, bw * 8)
        a, b, c = 11 + 2 * (mid % 5), 23 + 5 * (mid % 3), mid % 7
        for by in range(bh):
            for bx in range(bw):
                want = (a * bx + b * by + c * bx * by + mid) % 256
                block = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                assert (block == want).all(), (mid, bx, by)


def test_decode_kernel_and_resize_dispatch_jpeg():
    """decode_image_kernel / resize_image_kernel accept JPEG bytes via
    the magic dispatch; resize output is lossless PNG."""
    from flink_orc_sink_spark.functions.png import png_decode
    from flink_orc_sink_spark.operators.multimodal import (
        decode_image_kernel,
        resize_image_kernel,
    )

    px = _checker(32, 48)
    raw = jpeg_encode(px, flat_quant=True)
    w, h, feats = decode_image_kernel(raw)
    assert (w, h) == (48, 32)
    assert len(feats) == 8 and abs(sum(feats) - 1.0) < 0.01
    small = png_decode(resize_image_kernel(raw, 8, 8))
    assert small.shape == (8, 8)


def test_16bit_quant_tables_decode():
    """DQT with pq=1 (16-bit entries) is legal baseline JPEG; rewrite
    a flat 8-bit table as 16-bit and the decode must be unchanged."""
    import struct

    px = _checker(16, 24, seed=11)
    raw = jpeg_encode(px, flat_quant=True)
    i = raw.find(b"\xff\xdb")
    (length,) = struct.unpack(">H", raw[i + 2 : i + 4])
    assert length == 2 + 1 + 64  # one 8-bit table
    tq = raw[i + 4] & 0x0F
    vals = raw[i + 5 : i + 5 + 64]
    wide = struct.pack(">H", 2 + 1 + 128) + bytes([0x10 | tq]) + b"".join(
        struct.pack(">H", v) for v in vals
    )
    patched = raw[: i + 2] + wide + raw[i + 4 + 1 + 64 :]
    ref = jpeg_decode(raw)
    assert np.array_equal(jpeg_decode(patched), ref)


def test_fill_bytes_and_standalone_markers_tolerated():
    """Spec-legal variations other encoders emit (round-4 advisory):
    0xFF fill bytes may pad before any marker (T.81 B.1.1.2), and
    standalone TEM (0xFF01) markers carry no length field. Both must
    be skipped by the header walk, leaving pixels bit-identical."""
    blocks = np.random.RandomState(11).randint(0, 256, (2, 2))
    px = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
    raw = jpeg_encode(px, flat_quant=True)
    assert np.array_equal(jpeg_decode(raw), px)
    # insert fill bytes + a TEM marker after SOI, before the first
    # real marker segment
    patched = raw[:2] + b"\xff\xff\xff" + b"\xff\x01" + raw[2:]
    assert np.array_equal(jpeg_decode(patched), px)
    # fill bytes alone, deeper in the header: before the SOS marker
    sos = raw.index(b"\xff\xda")
    patched2 = raw[:sos] + b"\xff\xff" + raw[sos:]
    assert np.array_equal(jpeg_decode(patched2), px)
