"""Dependency-free baseline JPEG codec (stdlib + NumPy).

The container has no PIL/libjpeg, but baseline sequential JPEG (the
format of the overwhelming majority of real-world JPEGs) needs nothing
beyond Huffman coding, an 8×8 DCT, and the JFIF colour transform — all
implementable with ``struct`` + NumPy. This closes the last stubbed
image seam left after ``functions/png.py``: decode, pixel statistics,
resize, and perceptual hashing now run on REAL pixels for JPEG too.

Scope (encoder and decoder symmetric, so round trips are self-checking):

- baseline DCT sequential (SOF0), 8-bit samples
- greyscale (1 component) and YCbCr colour, 4:4:4 and 4:2:0
- multiple DQT/DHT segments, 8- and 16-bit quant tables
- restart intervals (DRI + RSTn markers, predictor reset, bit realign)
- 0xFF00 byte stuffing/unstuffing

Determinism: the only float path is the DCT itself (float64 matrix
multiply, identical on every executor), and the codec offers a
``flat`` quantisation mode (all-ones tables) under which CONSTANT 8×8
blocks round-trip BIT-EXACTLY — the forward DCT of a constant block c
is DC=8·(c−128), all AC exactly 0, so quantise/dequantise/IDCT
reproduce c with zero loss. That property is what lets a SQL oracle
value-check decoded-pixel statistics of arithmetically-planted JPEGs
without touching a byte of JPEG (see
``operators/multimodal.py::plant_jpeg_pixels``).

Performance note: entropy decode is sequential by nature and runs in
Python here — right for value-level verification fixtures and small
images; a production deployment swaps libjpeg-turbo into the same
injectable kernel seam (``operators/multimodal.py::decode_images``)
without touching any Spark-side plumbing.

Parity target: reference sink treats media as opaque bytes
(flink-orc-sink has no image path at all); this module serves the
north-star multimodal tier, not reference parity.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan: position in zigzag order -> row-major index 0..63.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIG = np.argsort(ZIGZAG)

# Annex K (ITU-T T.81) reference quantisation tables, row-major.
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99]
    + [18, 21, 26, 66, 99, 99, 99, 99]
    + [24, 26, 56, 99, 99, 99, 99, 99]
    + [47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32,
    dtype=np.int64,
)

# Annex K typical Huffman tables: (bits[1..16], huffval).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal 8×8 DCT basis: T @ block @ T.T gives exactly the JPEG
# FDCT definition (constant block c ⇒ DC = 8c, AC = 0).
_k = np.arange(8)
_T = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.sqrt(0.25)
_T[0, :] = np.sqrt(0.125)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical T.81 algorithm."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(ln, code): sym for sym, (code, ln) in _huff_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def byte_align(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


class _BitReader:
    """Reads the UNSTUFFED entropy bytes of one restart interval."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        byte = self.data[self.pos >> 3]
        bit = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (category size, appended bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    if v < 0:
        v += (1 << size) - 1
    return size, v


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _scaled_tables(quality: int | None, flat: bool) -> tuple[np.ndarray, np.ndarray]:
    if flat:
        ones = np.ones(64, dtype=np.int64)
        return ones, ones
    if quality is None:
        return QUANT_LUMA, QUANT_CHROMA
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    luma = np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255)
    chroma = np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return luma, chroma


def _plane_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a (h, w) plane to 8-multiples by edge replication and return
    (blocks[by, bx, 8, 8] float64 level-shifted, bh, bw)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    bh, bw = hh // 8, ww // 8
    blocks = (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    return blocks, bh, bw


def _fdct_quant(blocks: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """blocks (bh, bw, 8, 8) -> quantised zigzag coeffs (bh, bw, 64)."""
    coef = np.einsum("ux,byxw,vw->byuv", _T, blocks, _T)
    q = np.round(coef / qtab.reshape(8, 8)).astype(np.int64)
    return q.reshape(*q.shape[:2], 64)[:, :, ZIGZAG]


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht_payload(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tclass << 4 | tid] + bits + vals)


def jpeg_encode(
    pixels: np.ndarray,
    quality: int | None = None,
    flat_quant: bool = False,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode a (h, w) grey or (h, w, 3) RGB uint8 array as a real
    baseline JFIF JPEG (readable by any viewer). ``flat_quant=True``
    uses all-ones quant tables — visually lossless and BIT-EXACT for
    constant 8×8 blocks, the property the value-level oracles use."""
    px = np.asarray(pixels, dtype=np.uint8)
    grey = px.ndim == 2
    if not grey and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError(f"unsupported pixel shape {px.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = px.shape[:2]
    luma_q, chroma_q = _scaled_tables(quality, flat_quant)

    if grey:
        planes = [px.astype(np.float64)]
    else:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [np.round(p).clip(0, 255) for p in (y, cb, cr)]

    sub = 2 if (not grey and subsampling == "420") else 1
    if sub == 2:
        # chroma planes: pad to even, then 2×2 box mean
        for i in (1, 2):
            p = planes[i]
            p = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge")
            planes[i] = np.round(
                (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])
                / 4.0
            )

    comp_coef = []
    for ci, plane in enumerate(planes):
        blocks, bh, bw = _plane_blocks(plane)
        qtab = luma_q if ci == 0 else chroma_q
        comp_coef.append((_fdct_quant(blocks, qtab), bh, bw))

    # ---- headers -------------------------------------------------
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _seg(0xFFDB, bytes([0]) + bytes(luma_q[ZIGZAG].astype(np.uint8)))
    if not grey:
        out += _seg(0xFFDB, bytes([1]) + bytes(chroma_q[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if grey else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hv = (sub << 4 | sub) if ci == 0 else 0x11
        sof += bytes([ci + 1, hv if not grey else 0x11, 0 if ci == 0 else 1])
    out += _seg(0xFFC0, sof)
    out += _seg(0xFFC4, _dht_payload(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _seg(0xFFC4, _dht_payload(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if not grey:
        out += _seg(0xFFC4, _dht_payload(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
        out += _seg(0xFFC4, _dht_payload(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp]) + b"".join(
        bytes([ci + 1, 0x00 if ci == 0 else 0x11]) for ci in range(ncomp)
    ) + bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)

    # ---- entropy-coded scan -------------------------------------
    dc_codes = [_huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)] + [
        _huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ] * (ncomp - 1)
    ac_codes = [_huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)] + [
        _huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    ] * (ncomp - 1)

    y_bh, y_bw = comp_coef[0][1], comp_coef[0][2]
    mcu_rows = (y_bh + sub - 1) // sub
    mcu_cols = (y_bw + sub - 1) // sub

    def encode_block(wtr: _BitWriter, zz: np.ndarray, ci: int, pred: int) -> int:
        dc = int(zz[0])
        size, bits = _magnitude(dc - pred)
        code, ln = dc_codes[ci][size]
        wtr.write(code, ln)
        wtr.write(bits, size)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[ci][0xF0]
                wtr.write(code, ln)
                run -= 16
            size, bits = _magnitude(v)
            code, ln = ac_codes[ci][run << 4 | size]
            wtr.write(code, ln)
            wtr.write(bits, size)
            run = 0
        if run:
            code, ln = ac_codes[ci][0x00]
            wtr.write(code, ln)
        return dc

    wtr = _BitWriter()
    preds = [0] * ncomp
    mcu_index = 0
    rst = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                wtr.byte_align()
                out += wtr.out
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                wtr = _BitWriter()
                preds = [0] * ncomp
            for ci, (coef, bh, bw) in enumerate(comp_coef):
                reps = sub if ci == 0 else 1
                for dy in range(reps):
                    for dx in range(reps):
                        by = min(my * reps + dy, bh - 1)
                        bx = min(mx * reps + dx, bw - 1)
                        preds[ci] = encode_block(wtr, coef[by, bx], ci, preds[ci])
            mcu_index += 1
    wtr.byte_align()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_decode(raw: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to uint8 (h, w) grey or
    (h, w, 3) RGB. Supports multi-table DQT/DHT, 4:4:4 and 4:2:0
    sampling, restart intervals, and byte unstuffing."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qtables: dict[int, np.ndarray] = {}
    dc_dec: dict[int, dict] = {}
    ac_dec: dict[int, dict] = {}
    frame = None  # (h, w, comps) comps: list of (cid, hs, vs, tq)
    restart_interval = 0
    scan_comps = None
    pos = 2
    entropy_start = None
    while pos + 2 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # Spec-legal 0xFF fill bytes may pad before any marker
        # (ITU-T T.81 §B.1.1.2); skip them so JPEGs from other
        # encoders don't misparse.
        while pos + 1 < len(raw) and raw[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(raw):
            # stream truncated inside a fill run — malformed input,
            # not an index error
            raise ValueError(f"truncated marker at {pos}")
        marker = raw[pos + 1]
        if marker == 0xD9:
            break
        # Standalone (zero-payload) markers outside the entropy
        # stream: TEM (0x01) and RSTn (0xD0-0xD7) carry no length
        # field — skip the 2 marker bytes and continue the walk.
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(raw):
            raise ValueError(f"truncated marker segment at {pos}")
        (length,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
        payload = raw[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq:
                    vals = np.frombuffer(
                        payload[p : p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(
                        payload[p : p + 64], dtype=np.uint8
                    ).astype(np.int64)
                    p += 64
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = vals  # stored in zigzag order
                qtables[tq] = tab
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nvals])
                p += 17 + nvals
                (ac_dec if tc else dc_dec)[th] = _huff_decoder(bits, vals)
        elif marker == 0xC0:
            precision, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit baseline JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:
            ns = payload[0]
            scan_comps = [
                (payload[1 + 2 * i], payload[2 + 2 * i] >> 4, payload[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            entropy_start = pos
            break
        # APPn/COM and others: skipped via the length field
    if frame is None or scan_comps is None:
        raise ValueError("missing SOF0/SOS")
    h, w, comps = frame

    # Split entropy data into restart intervals, unstuffing as we go.
    intervals: list[bytes] = []
    cur = bytearray()
    p = entropy_start
    while p < len(raw):
        b = raw[p]
        if b == 0xFF:
            nxt = raw[p + 1] if p + 1 < len(raw) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                intervals.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            if nxt == 0xD9:
                break
            raise ValueError(f"unexpected marker FF{nxt:02X} in scan")
        cur.append(b)
        p += 1
    intervals.append(bytes(cur))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_cols = (w + 8 * hmax - 1) // (8 * hmax)
    mcu_rows = (h + 8 * vmax - 1) // (8 * vmax)

    planes = {}
    for cid, hs, vs, tq in comps:
        planes[cid] = np.zeros(
            (mcu_rows * vs * 8, mcu_cols * hs * 8), dtype=np.float64
        )

    def read_symbol(rdr: _BitReader, table: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | rdr.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    n_mcu_total = mcu_rows * mcu_cols
    mcu_index = 0
    for interval in intervals:
        rdr = _BitReader(interval)
        preds = {cid: 0 for cid, _, _ in scan_comps}
        limit = (
            min(mcu_index + restart_interval, n_mcu_total)
            if restart_interval
            else n_mcu_total
        )
        while mcu_index < limit:
            my, mx = divmod(mcu_index, mcu_cols)
            for cid, td, ta in scan_comps:
                _, hs, vs, tq = next(c for c in comps if c[0] == cid)
                qtab = qtables[tq]
                for dy in range(vs):
                    for dx in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        size = read_symbol(rdr, dc_dec[td])
                        diff = _extend(rdr.read_bits(size), size)
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            sym = read_symbol(rdr, ac_dec[ta])
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(rdr.read_bits(size), size)
                            k += 1
                        coef = (zz[_UNZIG] * qtab).reshape(8, 8).astype(np.float64)
                        block = _T.T @ coef @ _T + 128.0
                        by = (my * vs + dy) * 8
                        bx = (mx * hs + dx) * 8
                        planes[cid][by : by + 8, bx : bx + 8] = block
            mcu_index += 1

    # Upsample subsampled components to full resolution and crop.
    full = {}
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full[cid] = p[:h, :w]
    if len(comps) == 1:
        return np.clip(np.round(full[comps[0][0]]), 0, 255).astype(np.uint8)
    y, cb, cr = (full[c[0]] for c in comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)
