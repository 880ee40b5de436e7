"""Dependency-free WAV/PCM codec (stdlib struct + NumPy).

WAV is a RIFF container around raw PCM — no compression, nothing that
needs an audio library. This closes the audio seam left in
``operators/multimodal.py``: real waveform decode and integer-exact
feature extraction (peak, zero crossings, mean square, fixed-point
mean absolute amplitude), all value-checkable by a SQL oracle against
arithmetically-planted waveforms.

Scope: PCM 16-bit signed and 8-bit unsigned, any channel count, any
sample rate; chunk walk skips LIST/fact/etc. Everything integer —
no float DSP path, so outputs hash identically cross-engine.

Parity note: the reference sink never touches audio; this serves the
north-star multimodal tier.
"""

from __future__ import annotations

import struct

import numpy as np


def wav_encode(
    samples: np.ndarray, sample_rate: int = 16_000
) -> bytes:
    """Encode int16 PCM samples — shape (n,) mono or (n, ch) — as a
    real RIFF/WAVE file readable by any audio tool."""
    x = np.asarray(samples, dtype=np.int16)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    data = x.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(raw: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM WAV to (sample_rate, int16 array of shape
    (n, channels)). 8-bit unsigned PCM is centred to int16 range
    (x·256 − 32768) so downstream features are format-independent."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, end = 12, len(raw)
    sample_rate = channels = bits = None
    data = None
    while pos + 8 <= end:
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        payload = raw[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate, _br, _ba, bits = (
                struct.unpack("<HHIIHH", payload[:16])
            )
            if audio_fmt != 1:
                raise NotImplementedError(
                    f"only PCM WAV supported (format tag {audio_fmt})"
                )
            if channels < 1 or sample_rate <= 0:
                raise ValueError(
                    f"malformed fmt chunk: channels={channels}, "
                    f"sample_rate={sample_rate}"
                )
        elif cid == b"data":
            data = payload
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits == 16:
        # a truncated file can leave an odd byte count; drop the
        # partial sample rather than crash in frombuffer
        x = np.frombuffer(
            data[: len(data) // 2 * 2], dtype="<i2"
        ).astype(np.int16)
    elif bits == 8:
        x = (
            np.frombuffer(data, dtype=np.uint8).astype(np.int32) * 256
            - 32768
        ).astype(np.int16)
    else:
        raise NotImplementedError(f"{bits}-bit PCM unsupported")
    n = len(x) // channels
    return int(sample_rate), x[: n * channels].reshape(n, channels)


def waveform_features(
    sample_rate: int, x: np.ndarray
) -> tuple[int, int, list[float]]:
    """Integer-exact features from an int16 PCM array (n, ch):
    (duration_ms, sample_rate, [peak, zero_crossings, mean_square,
    mean_abs_fp]).

    - mono mixdown is floor-division mean across channels (matches
      SQL ``//`` on possibly-negative sums)
    - ``mean_square`` = Σx² div n (≤ 2³⁰/n·n — bounded)
    - ``mean_abs_fp`` = Σ|x|·100 div n (2-decimal fixed point)
    - zero crossing = strict sign change (x[k−1]·x[k] < 0)

    Every feature is an integer; features below 2²⁴ survive the Arrow
    float32 feature column EXACTLY (peak always does — ≤ 32767; the
    others do for the bounded-amplitude planted fixtures the oracle
    uses, |sample| ≤ 1000 ⇒ mean_square ≤ 10⁶). Full-scale audio can
    push mean_square past float32's integer window — callers needing
    bit-exactness there should read it as the documented fixed-point
    int, not the float cast.
    """
    n, ch = x.shape
    mono = x.astype(np.int64).sum(axis=1) // ch
    duration_ms = n * 1000 // sample_rate
    peak = int(np.abs(mono).max()) if n else 0
    zc = int(((mono[:-1] * mono[1:]) < 0).sum()) if n > 1 else 0
    mean_square = int((mono * mono).sum() // n) if n else 0
    mean_abs_fp = int(np.abs(mono).sum() * 100 // n) if n else 0
    return (
        int(duration_ms),
        int(sample_rate),
        [float(peak), float(zc), float(mean_square), float(mean_abs_fp)],
    )
