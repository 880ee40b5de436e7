"""Round-13 optimization invariants for the MinHash family's shared
shingle-hash pass: the signature DERIVED from a doc's distinct
shingle-hash set (``minhash_signatures_from_sets``) must be
bit-identical to the direct tokenize+md5+permute signature, the
``shingles=`` parameter of probe/append/dedup-pairs must be pure
plumbing (byte-equal results and index contents), and the
per-doc-memoized pair-Jaccard must equal the unmemoized math."""

import pytest
from pyspark.sql import functions as F

from flink_orc_sink_spark.operators.dedup import (
    _py_shingles,
    append_to_minhash_index,
    build_minhash_index,
    minhash_dedup_pairs,
    minhash_probe_index,
    minhash_signatures,
    minhash_signatures_from_sets,
    shingle_hash_sets,
)

DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (3, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (4, "one two three four five six seven eight nine ten eleven"),
    (5, "short doc"),
    (6, ""),
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sig_from_sets_bit_identical(spark, sf_dir):
    """Derived signatures == direct signatures, element for element —
    on the synthetic docs AND a real sf0.001 corpus slice."""
    for df in (
        spark.createDataFrame(DOCS, ["doc_id", "text"]),
        spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        ),
    ):
        direct = _rows(minhash_signatures(df, "doc_id", "text"))
        derived = _rows(
            minhash_signatures_from_sets(
                shingle_hash_sets(df, "doc_id", "text")
            )
        )
        assert direct == derived


def test_probe_shingles_param_equivalent(spark, tmp_path):
    corpus = spark.createDataFrame(DOCS[:3], ["doc_id", "text"])
    batch = spark.createDataFrame(DOCS[3:], ["doc_id", "text"])
    idx = str(tmp_path / "mhidx")
    build_minhash_index(corpus, "doc_id", "text", idx)
    base = minhash_probe_index(spark, batch, "doc_id", "text", idx)
    sh = shingle_hash_sets(batch, "doc_id", "text").localCheckpoint(
        eager=True
    )
    try:
        with_param = minhash_probe_index(
            spark, batch, "doc_id", "text", idx, shingles=sh
        )
        assert _rows(base) == _rows(with_param)
    finally:
        sh.rdd.unpersist(False)


def test_append_shingles_param_equivalent(spark, tmp_path):
    corpus = spark.createDataFrame(DOCS[:2], ["doc_id", "text"])
    batch = spark.createDataFrame(DOCS[2:], ["doc_id", "text"])
    idx_a, idx_b = str(tmp_path / "a"), str(tmp_path / "b")
    for idx in (idx_a, idx_b):
        build_minhash_index(corpus, "doc_id", "text", idx)
    append_to_minhash_index(batch, "doc_id", "text", idx_a)
    sh = shingle_hash_sets(batch, "doc_id", "text").localCheckpoint(
        eager=True
    )
    try:
        append_to_minhash_index(
            batch, "doc_id", "text", idx_b, shingles=sh
        )
    finally:
        sh.rdd.unpersist(False)
    for sub in ("bands", "shingles"):
        assert _rows(spark.read.parquet(f"{idx_a}/{sub}")) == _rows(
            spark.read.parquet(f"{idx_b}/{sub}")
        )
    probe = spark.createDataFrame(DOCS[:1], ["doc_id", "text"])
    assert _rows(
        minhash_probe_index(spark, probe, "doc_id", "text", idx_a)
    ) == _rows(minhash_probe_index(spark, probe, "doc_id", "text", idx_b))


def test_dedup_pairs_shingles_param_equivalent(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    base = minhash_dedup_pairs(df, "doc_id", "text", threshold=0.5)
    sh = shingle_hash_sets(df, "doc_id", "text").localCheckpoint(
        eager=True
    )
    try:
        with_param = minhash_dedup_pairs(
            df, "doc_id", "text", threshold=0.5, shingles=sh
        )
        assert _rows(base) == _rows(with_param)
    finally:
        sh.rdd.unpersist(False)


def test_pair_jaccard_matches_direct_math(spark):
    """The verify UDF's ratios == plain per-pair set math."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_dedup_pairs(
            df, "doc_id", "text", threshold=0.0
        ).collect()
    }
    toks = {
        r.doc_id: (r.text or "").lower().split()
        for r in df.collect()
    }
    for (a, b), j in got.items():
        sa, sb = _py_shingles(toks[a], 3), _py_shingles(toks[b], 3)
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        expect = round(inter / union if union else 0.0, 6)
        assert j == expect, (a, b, j, expect)
