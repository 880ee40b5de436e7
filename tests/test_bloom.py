"""Unit tests for the portable Bloom filter (functions/bloom.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from flink_orc_sink_spark.functions import bloom as bl


def test_no_false_negatives():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    n_bits, n_hashes = bl.sizing(len(keys), fpp=0.01)
    bits = bl.build_bloom(keys.astype(np.uint64), n_bits, n_hashes)
    hit = bl.might_contain(bits, n_bits, n_hashes, pd.Series(keys))
    assert hit.all(), "a member key tested negative"


def test_false_positive_rate_near_target():
    rng = np.random.default_rng(11)
    members = rng.integers(0, 2**63, size=10_000, dtype=np.int64)
    probes = rng.integers(-(2**63), 0, size=20_000, dtype=np.int64)
    n_bits, n_hashes = bl.sizing(len(members), fpp=0.01)
    bits = bl.build_bloom(members.astype(np.uint64), n_bits, n_hashes)
    fp = bl.might_contain(bits, n_bits, n_hashes, pd.Series(probes)).mean()
    # target 1%; allow generous slack — the point is "filter works",
    # not "exact fpp math"
    assert fp < 0.03, f"false-positive rate {fp:.3f} too high"


def test_empty_filter_rejects_everything():
    n_bits, n_hashes = bl.sizing(0, fpp=0.01)
    bits = bl.build_bloom([], n_bits, n_hashes)
    probe = pd.Series(np.arange(100, dtype=np.int64))
    assert not bl.might_contain(bits, n_bits, n_hashes, probe).any()


def test_deterministic_across_builds():
    keys = np.arange(1000, dtype=np.uint64) * 7919
    n_bits, n_hashes = bl.sizing(len(keys), fpp=0.01)
    assert bl.build_bloom(keys, n_bits, n_hashes) == bl.build_bloom(
        keys, n_bits, n_hashes
    )


def test_distributed_build_bit_identical(spark):
    """build_bloom_distributed must produce the EXACT bytes of the
    driver-side build_bloom over the same hash set — the contract
    that lets might_contain stay unchanged (round-9 verdict #5)."""
    rng = np.random.default_rng(23)
    keys = rng.integers(-(2**62), 2**62, size=4000, dtype=np.int64)
    n_bits, n_hashes = bl.sizing_words(len(keys), fpp=0.01)
    want = bl.build_bloom(keys.astype(np.uint64), n_bits, n_hashes)
    df = spark.createDataFrame(
        [(int(k),) for k in keys], "h long"
    ).repartition(8)
    got = bl.build_bloom_distributed(df, "h", n_bits, n_hashes)
    assert got == want


def test_distributed_build_empty(spark):
    n_bits, n_hashes = bl.sizing_words(0, fpp=0.01)
    df = spark.createDataFrame([], "h long")
    got = bl.build_bloom_distributed(df, "h", n_bits, n_hashes)
    assert got == bytes(n_bits // 8)
    probe = pd.Series(np.arange(50, dtype=np.int64))
    assert not bl.might_contain(got, n_bits, n_hashes, probe).any()


def test_sizing_words_alignment():
    for n in (0, 1, 7, 100, 99999):
        n_bits, _ = bl.sizing_words(n)
        assert n_bits % 64 == 0


def test_distributed_build_rejects_nulls(spark):
    """A null hash must RAISE, matching the driver-side build_bloom —
    silently mapping nulls to 0 would insert a phantom key and break
    the bit-identical contract on null-bearing columns (round-10
    advice)."""
    import pytest

    n_bits, n_hashes = bl.sizing_words(4, fpp=0.01)
    df = spark.createDataFrame([(1,), (None,), (3,)], "h long")
    with pytest.raises(Exception) as ei:
        bl.build_bloom_distributed(df, "h", n_bits, n_hashes)
    assert "null hash" in str(ei.value)
