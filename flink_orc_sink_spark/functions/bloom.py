"""Portable Bloom filter over 64-bit hashes, NumPy-vectorized.

Spark's JVM ``bloom_filter_agg``/``might_contain`` expressions are not
exposed to SQL in this build, and ``DataFrame.stat.bloomFilter``
returns a JVM object unusable inside Python workers — so this module
builds the filter driver-side from a BOUNDED key set (an eval set, a
blocklist — sets that are small by definition next to the corpus) and
ships the raw bitset bytes through a broadcast into an Arrow-batched
pandas UDF. Membership tests are whole-batch NumPy bit arithmetic —
no per-row Python.

Scale shape: the bitset is ~1.2 bytes/key at 1% false-positive rate —
a 10M-key eval set rides in a 12 MB broadcast, 100× smaller than
broadcasting the strings themselves. The false positives are removed
by an exact confirm join downstream (see
``queries/llm.py::docs_contamination_bloom``), so results stay exact.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

_MIX_SEED = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 golden gamma


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — avalanche a uint64 array in place-free
    vectorized form (same constants as the reference splitmix64)."""
    x = (x + _MIX_SEED) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(31)
    return x


def sizing(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """(n_bits, n_hashes) for a target false-positive rate; n_bits is
    rounded up to a byte multiple."""
    n_keys = max(1, n_keys)
    n_bits = max(64, int(math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2))))
    n_bits = (n_bits + 7) // 8 * 8
    n_hashes = max(1, round(n_bits / n_keys * math.log(2)))
    return n_bits, n_hashes


def _positions(hashes: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(len(hashes), n_hashes) bit positions via k independent
    splitmix64 remixes of the input hash (xor-ed with the probe index)."""
    h = hashes.astype(np.uint64).reshape(-1, 1)
    probes = np.arange(1, n_hashes + 1, dtype=np.uint64).reshape(1, -1)
    return (_mix64(h ^ (probes * _MIX_SEED)) % np.uint64(n_bits)).astype(
        np.int64
    )


def build_bloom(hashes, n_bits: int, n_hashes: int) -> bytes:
    """Pack a bitset (little-endian within each byte) containing every
    64-bit hash in ``hashes``."""
    arr = np.zeros(n_bits // 8, dtype=np.uint8)
    if len(hashes):
        # int64 first: NumPy deprecates (→ will error on) casting
        # negative Python ints straight to uint64; int64→uint64 astype
        # wraps two's-complement, which is the intended bit pattern.
        pos = _positions(
            np.asarray(hashes, dtype=np.int64).astype(np.uint64),
            n_bits,
            n_hashes,
        )
        flat = pos.reshape(-1)
        np.bitwise_or.at(arr, flat >> 3, np.uint8(1) << (flat & 7).astype(np.uint8))
    return arr.tobytes()


def might_contain(bitset: bytes, n_bits: int, n_hashes: int, s: pd.Series) -> pd.Series:
    """Vectorized membership test of an int64 hash Series against a
    packed bitset (as produced by ``build_bloom``). No false negatives."""
    arr = np.frombuffer(bitset, dtype=np.uint8)
    h = s.to_numpy(dtype=np.int64, na_value=0).astype(np.uint64)
    pos = _positions(h, n_bits, n_hashes)
    bits = (arr[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return pd.Series(bits.all(axis=1))
