"""Persisted BM25 index: build/append/probe lifecycle, replay
hygiene, and the bucket-pruning scale contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_orc_sink_spark.operators.retrieval import (
    append_to_bm25_index,
    bm25_probe_index,
    build_bm25_index,
    term_buckets,
)

TERMS = ["spark", "merge", "filter"]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(spark):
    # spread across buckets; includes an EMPTY doc (no postings rows,
    # but it must still count in n_docs/avgdl) and tf>1 cases
    return _docs(
        spark,
        [
            (1, "spark merge filter spark spark"),
            (2, "merge filter alpha beta gamma delta"),
            (3, "filter filter filter epsilon zeta"),
            (4, "eta theta iota kappa"),
            (5, ""),
            (6, "spark lambda mu nu xi omicron pi rho"),
        ],
    )


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_probe_matches_inmemory_scorer(spark, tmp_path):
    """Probing the persisted index must reproduce the one-shot
    in-memory scorer bit-for-bit — same df, same avgdl arithmetic,
    same rounding — on a corpus with an empty doc and repeated
    terms."""
    from flink_orc_sink_spark.queries.llm import _bm25_scored

    d = _corpus(spark)
    idx = str(tmp_path / "idx")
    build_bm25_index(d, "doc_id", "text", idx)
    got = _rows(bm25_probe_index(spark, idx, TERMS, k=20))
    want = _rows(
        _bm25_scored(d).orderBy(F.desc("bm25"), F.asc("doc_id")).limit(20)
    )
    assert got == want and len(got) > 0


def test_append_equals_oneshot_build(spark, tmp_path):
    """build(corpus) + append(batch) must probe identically to
    build(corpus ∪ batch) — the incremental-ingest contract."""
    d = _corpus(spark)
    corpus = d.filter(F.col("doc_id") <= 4)
    batch = d.filter(F.col("doc_id") > 4)

    inc = str(tmp_path / "inc")
    build_bm25_index(corpus, "doc_id", "text", inc)
    append_to_bm25_index(batch, "doc_id", "text", inc, tag=7)

    full = str(tmp_path / "full")
    build_bm25_index(d, "doc_id", "text", full)

    assert _rows(bm25_probe_index(spark, inc, TERMS)) == _rows(
        bm25_probe_index(spark, full, TERMS)
    )


def test_replay_double_append_shifts_no_score(spark, tmp_path):
    """A crash-replayed append double-writes postings AND doclens
    rows; without read-time dedup every tf and the corpus N/avgdl
    would shift. Assert the hazard is real (raw rows doubled) and the
    guard holds (probe unchanged)."""
    d = _corpus(spark)
    corpus = d.filter(F.col("doc_id") <= 4)
    batch = d.filter(F.col("doc_id") > 4)
    idx = str(tmp_path / "idx")
    build_bm25_index(corpus, "doc_id", "text", idx)
    append_to_bm25_index(batch, "doc_id", "text", idx, tag=3)
    want = _rows(bm25_probe_index(spark, idx, TERMS))

    append_to_bm25_index(batch, "doc_id", "text", idx, tag=3)  # replay
    post = spark.read.parquet(f"{idx}/postings").filter(F.col("tag") == 3)
    assert post.count() == 2 * post.dropDuplicates(["token", "doc_id"]).count()
    dls = spark.read.parquet(f"{idx}/doclens").filter(F.col("tag") == 3)
    assert dls.count() == 2 * dls.dropDuplicates(["doc_id"]).count()

    assert _rows(bm25_probe_index(spark, idx, TERMS)) == want


def test_probe_prunes_to_term_buckets(spark, tmp_path):
    """The scale contract: the postings scan must carry a partition
    filter on the query terms' buckets — pruning at the file listing,
    so probe cost scales with the query, not the corpus."""
    d = _corpus(spark)
    idx = str(tmp_path / "idx")
    build_bm25_index(d, "doc_id", "text", idx)
    probe = bm25_probe_index(spark, idx, TERMS)
    probe.collect()
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the pushed filter names the bucket column with the exact ids
    buckets = term_buckets(TERMS)
    scan = plan[plan.index("PartitionFilters"):][:500]
    assert "bucket" in scan and str(buckets[0]) in scan, scan


def test_term_buckets_matches_writer_bucket(spark, tmp_path):
    """Driver-side zlib.crc32 % N must equal the writer's
    F.crc32-derived partition value for every indexed token —
    otherwise the probe would prune away live postings."""
    d = _corpus(spark)
    idx = str(tmp_path / "idx")
    build_bm25_index(d, "doc_id", "text", idx)
    rows = (
        spark.read.parquet(f"{idx}/postings")
        .select("token", "bucket")
        .distinct()
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        assert term_buckets([r["token"]]) == [r["bucket"]]


def test_forget_readmit_compact_lifecycle(spark, tmp_path):
    """Retention on the retrieval index: a forgotten doc stops
    matching AND stops counting toward N/avgdl/df (scores equal a
    from-scratch index over the remaining docs); compaction changes
    nothing but bytes; re-appending the id readmits it exactly."""
    from flink_orc_sink_spark.operators.retrieval import (
        compact_bm25_index,
        forget_from_bm25_index,
    )

    d = _corpus(spark)
    idx = str(tmp_path / "idx")
    build_bm25_index(d, "doc_id", "text", idx)

    gone = d.filter(F.col("doc_id").isin(1, 6))
    forget_from_bm25_index(gone.select("doc_id"), idx)
    got = _rows(bm25_probe_index(spark, idx, TERMS))
    scratch = str(tmp_path / "scratch")
    build_bm25_index(
        d.filter(~F.col("doc_id").isin(1, 6)), "doc_id", "text", scratch
    )
    want = _rows(bm25_probe_index(spark, scratch, TERMS))
    assert got == want and all(r[0] not in (1, 6) for r in got)

    compact_bm25_index(spark, idx)
    assert _rows(bm25_probe_index(spark, idx, TERMS)) == want
    import os

    assert not os.path.isdir(os.path.join(idx, "tombstones"))

    # re-ingest doc 1 (same content id, same text): readmitted, and
    # the index equals a from-scratch build over corpus-minus-doc-6
    append_to_bm25_index(
        d.filter(F.col("doc_id") == 1), "doc_id", "text", idx, tag=9
    )
    scratch2 = str(tmp_path / "scratch2")
    build_bm25_index(
        d.filter(F.col("doc_id") != 6), "doc_id", "text", scratch2
    )
    assert _rows(bm25_probe_index(spark, idx, TERMS)) == _rows(
        bm25_probe_index(spark, scratch2, TERMS)
    )


def test_forget_before_compact_readmit_covers_prior_rows(spark, tmp_path):
    """Readmit WITHOUT an intervening compaction: the pre-forget
    postings rows are still physically present, so the re-append's
    identical rows must collapse in the read-time dedup — scores
    equal the never-forgotten index."""
    from flink_orc_sink_spark.operators.retrieval import (
        forget_from_bm25_index,
    )

    d = _corpus(spark)
    idx = str(tmp_path / "idx")
    build_bm25_index(d, "doc_id", "text", idx)
    want = _rows(bm25_probe_index(spark, idx, TERMS))

    forget_from_bm25_index(
        d.filter(F.col("doc_id") == 1).select("doc_id"), idx
    )
    assert _rows(bm25_probe_index(spark, idx, TERMS)) != want
    append_to_bm25_index(
        d.filter(F.col("doc_id") == 1), "doc_id", "text", idx, tag=5
    )
    assert _rows(bm25_probe_index(spark, idx, TERMS)) == want
