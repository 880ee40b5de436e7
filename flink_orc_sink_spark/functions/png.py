"""Dependency-free PNG codec (stdlib zlib + NumPy).

The container has no PIL/torchvision, but PNG's format needs nothing
beyond DEFLATE (stdlib ``zlib``), CRC32 (stdlib ``binascii``), and
per-scanline filter arithmetic (NumPy). This module implements the
subset that covers the overwhelming majority of real PNGs — 8-bit
greyscale / RGB / RGBA, non-interlaced, all five scanline filters —
which upgrades the multimodal decode tier from "container-header
facts" to REAL PIXELS: decode, statistics, nearest-neighbour resize,
re-encode, and perceptual hashing all run on actual image content.

Everything is deterministic (no float codec paths), so decoded pixel
statistics of arithmetically-planted images are value-checkable by a
SQL oracle that never touches a byte of PNG.
"""

from __future__ import annotations

import binascii
import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # grey, RGB, RGBA


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", binascii.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode a (h, w) grey or (h, w, 3|4) colour uint8 array as a
    real PNG (filter 0 scanlines, valid CRCs — readable by any
    viewer)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color_type, channels = 0, 1
        px = px[:, :, None]
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type, channels = 2, 3
    elif px.ndim == 3 and px.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported pixel shape {px.shape}")
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.zeros((h, 1 + w * channels), dtype=np.uint8)
    raw[:, 1:] = px.reshape(h, w * channels)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def png_decode(raw: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced greyscale/RGB/RGBA PNG to a
    uint8 array of shape (h, w) or (h, w, channels). Implements all
    five scanline filters (None/Sub/Up/Average/Paeth) per the spec."""
    if raw[:8] != SIGNATURE:
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(raw):
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color_type not in _CHANNELS:
        raise NotImplementedError(
            f"unsupported PNG (depth={depth}, color={color_type},"
            f" interlace={interlace})"
        )
    channels = _CHANNELS[color_type]
    stride = w * channels
    flat = np.frombuffer(
        zlib.decompress(b"".join(idat)), dtype=np.uint8
    ).reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        ftype, line = int(flat[y, 0]), flat[y, 1:].astype(np.int32)
        above = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up
            rec = (line + above) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left recon
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                up = above[x]
                ul = above[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = (
                        left
                        if pa <= pb and pa <= pc
                        else (up if pb <= pc else ul)
                    )
                rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
        out[y] = rec.astype(np.uint8)
    px = out.reshape(h, w, channels)
    return px[:, :, 0] if channels == 1 else px


def to_grey(px: np.ndarray) -> np.ndarray:
    """Integer-exact luma approximation (Rec.601 weights in /256
    fixed point) — deterministic across platforms."""
    if px.ndim == 2:
        return px
    r, g, b = (px[:, :, i].astype(np.int64) for i in range(3))
    return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resize via integer index maps — deterministic
    (``src = floor(dst * src_len / dst_len)``), no float sampling."""
    h, w = px.shape[:2]
    ys = (np.arange(height, dtype=np.int64) * h) // height
    xs = (np.arange(width, dtype=np.int64) * w) // width
    return px[np.ix_(ys, xs)] if px.ndim == 2 else px[np.ix_(ys, xs)]


def average_hash(px: np.ndarray, hash_size: int = 8) -> int:
    """Perceptual average-hash: grey → nearest-resize to
    ``hash_size²`` → threshold at the integer mean → 64-bit int.
    Near-duplicate images differ in a few bits (Hamming distance);
    integer arithmetic end to end, so the hash is exact and
    engine-independent."""
    g = resize_nearest(to_grey(px), hash_size, hash_size).astype(np.int64)
    mean = g.sum() // (hash_size * hash_size)
    bits = (g > mean).astype(np.uint64).reshape(-1)
    weights = np.left_shift(
        np.uint64(1), np.arange(hash_size * hash_size, dtype=np.uint64)
    )
    return int((bits * weights).sum(dtype=np.uint64))
