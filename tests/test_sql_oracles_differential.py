"""Differential tests for the generated SQL oracles (DuckDB-only, no
Spark): the unrolled fixed-point PCA and BPE oracles must reproduce
their Python recipes bit-for-bit on SYNTHETIC tables, including
adversarial shapes the real testdata never exercises (overlapping
merge runs, sample/corpus vocabulary splits, near-degenerate
spectra). The driver gate proves Spark == SQL on the shipped data;
these prove the SQL stays faithful to the algorithm when the data is
hostile, without needing a SparkSession."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest


@pytest.fixture()
def con():
    c = duckdb.connect()
    yield c
    c.close()


def test_pca_sql_matches_python_recipe(con):
    from flink_orc_sink_spark.operators.linalg import (
        power_pca_components,
    )
    from flink_orc_sink_spark.queries.llm import _pca_sql

    rng = np.random.default_rng(11)
    basis = np.linalg.qr(rng.standard_normal((64, 64)))[0]
    scales = np.ones(64) * 0.01
    scales[:4] = [0.3, 0.15, 0.08, 0.079]  # nearly-degenerate tail pair
    x = (rng.standard_normal((40, 64)) * scales) @ basis.T
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {list(map(float, x[i]))})" for i in range(len(x))
        )
        + ") t(vec_id, embedding)"
    )
    sql = {r[0]: r[1:] for r in con.execute(_pca_sql()).fetchall()}

    q = np.floor(x * 1000 + 0.5).astype(np.int64)
    n = len(q)
    s = [int(v) for v in q.sum(axis=0)]
    g = [[int(v) for v in row] for row in (q.T @ q)]
    mu, comps = power_pca_components(n, s, g, 64, k=4)
    py = {
        i: tuple(
            sum((int(q[i][d]) * 1000 - mu[d]) * comps[c][d]
                for d in range(64))
            for c in range(4)
        )
        for i in range(n)
    }
    assert sql == py


def test_bpe_sql_matches_python_recipe_adversarial(con):
    """Sample (first 100 docs) trains the merges; the corpus encode
    covers words ABSENT from the sample, overlapping-run merges
    (aaaa), punctuation-bearing tokens, case folding, and an empty
    document."""
    from flink_orc_sink_spark.functions.bpe import (
        _words,
        encode_word,
        train_bpe,
    )
    from flink_orc_sink_spark.queries.llm import _bpe_encode_sql

    rng = np.random.default_rng(5)
    vocab = [
        "aaaa", "aaa", "ab", "abab", "banana", "bandana",
        "lo", "low", "lower", "lowest", "new", "newer", "news",
        "wid", "wide", "wider", "widest", "x,y.", "a!b?", "zzz",
    ]
    docs = []
    for i in range(110):
        k = int(rng.integers(3, 12))
        words = [vocab[int(j)] for j in rng.integers(0, len(vocab), k)]
        if i % 7 == 0:
            words = [w.upper() for w in words]  # case folding
        docs.append((i, " ".join(words)))
    docs.append((110, ""))  # empty doc
    # corpus-only words: never in the 100-doc training sample
    docs.append((111, "unseenword banananana aaaaaaaa"))
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in docs)
        + ") t(doc_id, text)"
    )
    sql = {r[0]: r[1:] for r in con.execute(_bpe_encode_sql()).fetchall()}

    sample = [t for _, t in sorted(docs)[:100]]
    merges = train_bpe(sample, n_merges=40)
    ranks = {p: i for i, p in enumerate(merges)}
    py = {}
    for did, text in docs:
        ws = _words(text)
        nb = sum(len(encode_word(w, ranks)) for w in ws)
        nw = len(ws)
        fert = math.floor(nb * 10000 / nw) / 10000 if nw else 0.0
        py[did] = (nw, nb, fert)
    assert sql == py


def test_bpe_oracle_unroll_bound_holds_on_shipped_corpora():
    """The BPE oracle's encode unroll (enc_steps) must cover the
    longest tokenized word of every shipped SF — an under-unrolled
    oracle would under-merge and report a FALSE driver-gate failure
    with the oracle being the wrong side. Asserted here so a corpus
    regeneration that violates the bound fails loudly in CI instead."""
    import inspect

    from flink_orc_sink_spark.queries.llm import _bpe_encode_sql

    enc_steps = inspect.signature(_bpe_encode_sql).parameters[
        "enc_steps"
    ].default
    con = duckdb.connect()
    for sf in ("0.001", "0.01", "0.1"):
        longest = con.execute(
            "SELECT MAX(length(w)) FROM (SELECT unnest(list_filter("
            "regexp_split_to_array(lower(trim(text)), '\\s+'),"
            " x -> x <> '')) AS w FROM read_parquet("
            f"'/root/testdata/sf{sf}/documents.parquet'))"
        ).fetchone()[0]
        assert longest <= enc_steps, (sf, longest, enc_steps)
