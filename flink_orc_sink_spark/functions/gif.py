"""Dependency-free GIF codec (stdlib struct + NumPy).

GIF is LZW over an indexed palette — no float path anywhere, so like
PNG it is LOSSLESS and decoded pixel statistics of
arithmetically-planted images are value-checkable by a SQL oracle
that never parses a byte. This completes the pixel tier for every
image format the header sniffer knows (PNG, JPEG, GIF).

Scope: GIF87a/89a, single image frame, global color table up to 256
entries, interlaced or sequential, extension blocks skipped; encoder
writes non-interlaced GIF89a with a 256-entry greyscale palette and a
spec-correct variable-width LZW stream (clear/EOI codes, 9→12-bit
growth, dictionary reset).

Parity note: the reference sink has no image path; this serves the
north-star multimodal tier.
"""

from __future__ import annotations

import struct

import numpy as np


def gif_encode(pixels: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 greyscale array as a real GIF89a file
    (greyscale palette, LZW-compressed, readable by any viewer)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError(f"greyscale (h, w) expected, got {px.shape}")
    h, w = px.shape
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, 8 bits, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):  # greyscale palette
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor

    # ---- LZW encode (min code size 8) ---------------------------
    min_code = 8
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = {bytes([i]): i for i in range(1 << min_code)}
    next_code = eoi + 1
    width = min_code + 1
    acc = nbits = 0
    stream = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # GIF packs LSB-first
        nbits += width
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prefix = b""
    for v in px.reshape(-1).tobytes():
        cand = prefix + bytes([v])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        table[cand] = next_code
        next_code += 1
        # width grows at 2^width + 1 (the decoder, one add behind,
        # bumps at its own 2^width — see gif_decode)
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        elif next_code == 4097:  # table full: reset
            emit(clear)
            table = {bytes([i]): i for i in range(1 << min_code)}
            next_code = eoi + 1
            width = min_code + 1
        prefix = bytes([v])
    if prefix:
        emit(table[prefix])
    emit(eoi)
    if nbits:
        stream.append(acc & 0xFF)

    out += bytes([min_code])
    for i in range(0, len(stream), 255):
        block = stream[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def gif_encode_animated(
    frames: "list[np.ndarray]", delay_cs: int = 10
) -> bytes:
    """Encode (h, w) uint8 greyscale frames as a real animated GIF89a
    (full-canvas frames, one Graphic Control Extension per frame,
    shared greyscale palette). Every frame must share the first
    frame's dimensions."""
    if not frames:
        raise ValueError("no frames")
    h, w = np.asarray(frames[0]).shape
    first = gif_encode(np.asarray(frames[0], dtype=np.uint8))
    # header + LSD + palette from the single-frame encoder
    head_len = 13 + 3 * 256
    out = bytearray(first[:head_len])
    for f in frames:
        px = np.asarray(f, dtype=np.uint8)
        if px.shape != (h, w):
            raise ValueError("all frames must share dimensions")
        gce = b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        body = gif_encode(px)[head_len:-1]  # descriptor..data, no trailer
        out += gce + body
    out += b"\x3b"
    return bytes(out)


def gif_decode(raw: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF to a uint8 array — (h, w) when
    the palette is pure grey, else (h, w, 3) RGB. Handles local and
    global palettes, interlacing, and extension blocks."""
    return gif_decode_frames(raw, max_frames=1)[0]


def gif_decode_frames(
    raw: bytes, max_frames: int | None = None
) -> list[np.ndarray]:
    """Decode every frame of a (possibly animated) GIF. Scope: FULL-
    CANVAS frames only (each image descriptor covers the whole
    logical screen — what :func:`gif_encode_animated` writes and what
    screen-capture/synthetic GIFs use); partial-patch frames would
    need disposal-method compositing and raise ``NotImplementedError``
    instead of returning wrong pixels."""
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", raw[6:13])
    pos = 13
    frames: list[np.ndarray] = []
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = np.frombuffer(raw[pos : pos + 3 * n], dtype=np.uint8)
        palette = palette.reshape(n, 3)
        pos += 3 * n
    while pos < len(raw):
        b = raw[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while raw[pos]:
                pos += 1 + raw[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _x, _y, w, h, iflags = struct.unpack("<HHHHB", raw[pos + 1 : pos + 10])
        if (_x, _y, w, h) != (0, 0, sw, sh):
            raise NotImplementedError(
                "partial-canvas GIF frame (needs disposal compositing)"
            )
        pos += 10
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            palette = np.frombuffer(
                raw[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF image without a palette")
        min_code = raw[pos]
        pos += 1
        data = bytearray()
        while raw[pos]:
            ln = raw[pos]
            data += raw[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1

        # ---- LZW decode -----------------------------------------
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        base = {i: bytes([i]) for i in range(1 << min_code)}
        table = dict(base)
        next_code = eoi + 1  # first dynamic code (clear/eoi reserved)
        width = min_code + 1
        acc = nbits = 0
        out = bytearray()
        prev: bytes | None = None
        i = 0
        n_data = len(data)
        while True:
            while nbits < width and i < n_data:
                acc |= data[i] << nbits
                nbits += 8
                i += 1
            if nbits < width:
                break
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = dict(base)
                next_code = eoi + 1
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                break
            if code in table:
                entry = table[code]
            elif code == next_code and prev is not None:  # KwKwK
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            if prev is not None and next_code <= 4095:
                table[next_code] = prev + entry[:1]
                next_code += 1
            prev = entry
            # the decoder lags the encoder by one add, so it bumps at
            # next_code == 2^width where the encoder bumps at +1
            if next_code == (1 << width) and width < 12:
                width += 1

        idx = np.frombuffer(bytes(out[: w * h]), dtype=np.uint8)
        if len(idx) < w * h:
            raise ValueError("truncated GIF image data")
        idx = idx.reshape(h, w)
        if iflags & 0x40:  # interlaced: rows stored in 4 passes
            order = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            de = np.zeros_like(idx)
            de[order] = idx
            idx = de
        rgb = palette[idx]
        if (rgb[..., 0] == rgb[..., 1]).all() and (
            rgb[..., 1] == rgb[..., 2]
        ).all():
            frames.append(rgb[..., 0].copy())
        else:
            frames.append(rgb)
        if max_frames is not None and len(frames) >= max_frames:
            return frames
    if not frames:
        raise ValueError("no image frame in GIF")
    return frames
