"""The optional pre-materialized ``occurrences=`` parameter of the
gram-index probe/append (round-12 optimization: the streaming ingest
materializes the batch's gram stream once instead of four
tokenize+posexplode passes) must be a pure plumbing change: byte-equal
results and byte-equal index contents vs the self-computed path."""

import os

import pytest
from pyspark.sql import functions as F

from flink_orc_sink_spark.operators.dedup import (
    _gram_occurrences,
    append_to_gram_index,
    build_gram_index,
    cut_spans_against_index,
)


DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (3, "one two three four five six seven eight nine ten eleven"),
    (4, "short doc"),
]


@pytest.fixture()
def corpus_index(spark, tmp_path):
    idx = str(tmp_path / "gramidx")
    corpus = spark.createDataFrame(DOCS[:1], ["doc_id", "text"])
    build_gram_index(corpus, "doc_id", "text", idx, n=8)
    return idx


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cut_spans_occurrences_param_equivalent(spark, corpus_index):
    batch = spark.createDataFrame(DOCS[1:], ["doc_id", "text"])
    base = cut_spans_against_index(
        spark, batch, "doc_id", "text", corpus_index, n=8
    )
    occ = _gram_occurrences(batch, "doc_id", "text", 8).localCheckpoint(
        eager=True
    )
    try:
        with_param = cut_spans_against_index(
            spark, batch, "doc_id", "text", corpus_index, n=8,
            occurrences=occ,
        )
        assert _sorted_rows(base) == _sorted_rows(with_param)
    finally:
        occ.rdd.unpersist(False)


def test_append_occurrences_param_equivalent(spark, corpus_index, tmp_path):
    batch = spark.createDataFrame(DOCS[1:], ["doc_id", "text"])
    # two sibling copies of the index, one appended each way
    idx_a = str(tmp_path / "a")
    idx_b = str(tmp_path / "b")
    corpus = spark.createDataFrame(DOCS[:1], ["doc_id", "text"])
    for p in (idx_a, idx_b):
        build_gram_index(corpus, "doc_id", "text", p, n=8)
    append_to_gram_index(batch, "doc_id", "text", idx_a, n=8, tag=7)
    occ = _gram_occurrences(batch, "doc_id", "text", 8).localCheckpoint(
        eager=True
    )
    try:
        append_to_gram_index(
            batch, "doc_id", "text", idx_b, n=8, tag=7, occurrences=occ
        )
    finally:
        occ.rdd.unpersist(False)
    rows_a = _sorted_rows(spark.read.parquet(os.path.join(idx_a, "grams")))
    rows_b = _sorted_rows(spark.read.parquet(os.path.join(idx_b, "grams")))
    assert rows_a == rows_b
    # sanity: the appended tag is present alongside the build tag
    tags = {r[0] for r in spark.read.parquet(
        os.path.join(idx_b, "grams")).select("tag").distinct().collect()}
    assert tags == {-1, 7}
