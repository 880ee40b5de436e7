"""Dependency-free MJPEG-AVI container codec (stdlib struct).

Motion-JPEG in an AVI RIFF container is the one video format that
needs no video library once a JPEG codec exists — every frame is a
standalone baseline JPEG (``functions/jpeg.py``), and AVI is a chunk
walk. This closes the video frame-sampling seam in
``operators/multimodal.py`` for MJPEG: real container parse, real
frame bytes, real pixel decode. Codec-compressed video (H.264 etc.)
still genuinely needs ffmpeg and keeps the injectable-kernel seam.

Encoder writes a spec-shaped file (RIFF AVI: hdrl(avih, strl(strh,
strf)) + movi(00dc frames) + idx1) that standard tools recognise;
decoder is a tolerant chunk walk that only trusts the movi LIST.
"""

from __future__ import annotations

import struct


def _chunk(cid: bytes, payload: bytes) -> bytes:
    out = cid + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"  # RIFF chunks are word-aligned
    return out


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def avi_encode_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Pack baseline-JPEG frames into a real AVI file."""
    n = len(frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(1, fps),  # microseconds per frame
        0, 0, 0x10, n, 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0,
        0, 0, width, height,
    )
    # BITMAPINFOHEADER
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1: one entry per frame, offsets relative to movi list start
    idx_entries = []
    off = 4  # past the 'movi' fourcc
    for f in frames:
        idx_entries.append(
            struct.pack("<4sII I", b"00dc", 0x10, off, len(f))
        )
        off += 8 + len(f) + (len(f) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_extract_frames(raw: bytes) -> list[bytes]:
    """Walk the RIFF tree and return the raw bytes of every video
    frame chunk (``??dc``/``??db``) inside the ``movi`` LIST, in
    stream order."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int, in_movi: bool) -> None:
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            payload_start = pos + 8
            payload_end = min(payload_start + size, end)
            if cid == b"LIST":
                kind = buf[payload_start : payload_start + 4]
                walk(
                    buf,
                    payload_start + 4,
                    payload_end,
                    in_movi or kind == b"movi",
                )
            elif in_movi and cid[2:4] in (b"dc", b"db"):
                frames.append(buf[payload_start:payload_end])
            pos = payload_start + size + (size & 1)

    walk(raw, 12, len(raw), False)
    return frames
