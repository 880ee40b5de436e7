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


def _lzw_encode_blocks(indices: bytes, min_code: int = 8) -> bytes:
    """Spec-correct variable-width GIF LZW over ``indices``, returned
    as ``min_code_size + 255-byte sub-blocks + terminator`` — exactly
    the image-data section of an image block (shared by the
    full-canvas and the patch-frame encoders)."""
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
    for v in indices:
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

    out = bytearray([min_code])
    for i in range(0, len(stream), 255):
        block = stream[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00"  # block terminator
    return bytes(out)


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
    out += _lzw_encode_blocks(px.reshape(-1).tobytes())
    out += b"\x3b"  # trailer
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


def gif_encode_patches(
    size: "tuple[int, int]",
    patches: "list[dict]",
    background: int = 0,
    delay_cs: int = 10,
) -> bytes:
    """Encode an animated GIF89a from PARTIAL-canvas frames — the
    disposal-method surface :func:`gif_decode_frames` composites.

    ``size`` is the logical screen ``(h, w)``; each patch dict::

        {"x": int, "y": int, "pixels": (ph, pw) uint8,
         "disposal": 0|1|2|3, "transparent": int | None}

    writes one Graphic Control Extension (disposal method +
    transparency flag) and one image block at ``(x, y)``. Greyscale
    global palette; ``background`` is the LSD background color index
    (what disposal 2 restores to)."""
    h, w = size
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, background & 0xFF, 0)
    for i in range(256):
        out += bytes((i, i, i))
    for p in patches:
        px = np.asarray(p["pixels"], dtype=np.uint8)
        ph, pw = px.shape
        x, y = int(p.get("x", 0)), int(p.get("y", 0))
        if x < 0 or y < 0 or x + pw > w or y + ph > h:
            raise ValueError(f"patch {pw}x{ph}@({x},{y}) exceeds canvas")
        disposal = int(p.get("disposal", 0))
        if disposal not in (0, 1, 2, 3):
            raise ValueError(f"disposal method {disposal} not in 0..3")
        trans = p.get("transparent")
        packed = (disposal & 0x07) << 2 | (1 if trans is not None else 0)
        out += (
            b"\x21\xf9\x04"
            + bytes([packed])
            + struct.pack("<H", delay_cs)
            + bytes([trans & 0xFF if trans is not None else 0, 0])
        )
        out += b"\x2c" + struct.pack("<HHHHB", x, y, pw, ph, 0)
        out += _lzw_encode_blocks(px.reshape(-1).tobytes())
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
    """Decode every frame of a (possibly animated) GIF to FULL-canvas
    snapshots, with GIF89a disposal-method compositing:

    - each image block is rendered at its ``(x, y)`` offset onto a
      persistent canvas (transparent pixels — the Graphic Control
      Extension's transparent index — leave the canvas through);
    - the emitted frame is the canvas AFTER the render (what a viewer
      shows), one snapshot per image block;
    - then the frame's disposal method is applied: 0/1 leave the
      rendered region in place, 2 restores it to the logical screen's
      BACKGROUND color (the LSD background index resolved through the
      global palette — the deterministic choice; browsers render
      "background" as transparent, but a decode-to-array has no alpha
      channel), 3 restores the region to the canvas as it was before
      this frame rendered.

    Palettes may be global or per-frame local; interlaced patches are
    deinterlaced before compositing. A canvas with no global palette
    starts black. Full-canvas, no-transparency GIFs (what
    :func:`gif_encode_animated` writes) decode to exactly the
    per-frame images, compositing or not."""
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, bg, _ar = struct.unpack("<HHBBB", raw[6:13])
    pos = 13
    frames: list[np.ndarray] = []
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = np.frombuffer(raw[pos : pos + 3 * n], dtype=np.uint8)
        palette = palette.reshape(n, 3)
        pos += 3 * n
    if palette is not None and bg < len(palette):
        bg_rgb = palette[bg].copy()
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    disposal, transparent = 0, None
    while pos < len(raw):
        b = raw[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            label = raw[pos + 1]
            pos += 2
            if label == 0xF9 and raw[pos] >= 4:  # Graphic Control Ext
                packed = raw[pos + 1]
                disposal = (packed >> 2) & 0x07
                transparent = raw[pos + 4] if packed & 0x01 else None
            while raw[pos]:
                pos += 1 + raw[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        x, y, w, h, iflags = struct.unpack("<HHHHB", raw[pos + 1 : pos + 10])
        if x + w > sw or y + h > sh:
            raise ValueError(
                f"GIF frame {w}x{h}@({x},{y}) exceeds the "
                f"{sw}x{sh} logical screen"
            )
        pos += 10
        if iflags & 0x80:  # local palette: THIS image only
            n = 2 << (iflags & 0x07)
            fpal = np.frombuffer(
                raw[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        else:
            fpal = palette
        if fpal is None:
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

        # ---- composite onto the canvas --------------------------
        region = canvas[y : y + h, x : x + w]
        saved = region.copy() if disposal == 3 else None
        patch_rgb = fpal[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = patch_rgb[mask]
        else:
            region[...] = patch_rgb
        snap = canvas.copy()
        if (snap[..., 0] == snap[..., 1]).all() and (
            snap[..., 1] == snap[..., 2]
        ).all():
            frames.append(snap[..., 0].copy())
        else:
            frames.append(snap)
        if disposal == 2:  # restore region to background
            canvas[y : y + h, x : x + w] = bg_rgb
        elif disposal == 3 and saved is not None:  # restore previous
            canvas[y : y + h, x : x + w] = saved
        disposal, transparent = 0, None  # a GCE scopes ONE image
        if max_frames is not None and len(frames) >= max_frames:
            return frames
    if not frames:
        raise ValueError("no image frame in GIF")
    return frames
