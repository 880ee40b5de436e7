"""Dedup-family tests on constructed corpora with known duplicates."""

from __future__ import annotations

import pytest

from flink_orc_sink_spark.operators.dedup import (
    dedup_exact,
    exact_duplicate_groups,
    jaccard_pairs,
    minhash_dedup_pairs,
    simhash_pairs,
)

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "the  quick brown fox jumps over the lazy dog"),  # ws/case dup of 1
    (3, "The quick brown fox jumps over the lazy cat"),   # near-dup of 1
    (4, "Completely different text about database engines and storage"),
    (5, "Completely different text about database engines and compute"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_groups(docs):
    groups = {
        (r.n_docs, r.keeper_id)
        for r in exact_duplicate_groups(docs, "doc_id", "text").collect()
    }
    # docs 1+2 normalize to the same fingerprint; 3,4,5 are singletons
    assert (2, 1) in groups
    assert sum(n for n, _ in groups) == 5


def test_dedup_exact_survivors(docs):
    survivors = {r.doc_id for r in dedup_exact(docs, "doc_id", "text").collect()}
    assert survivors == {1, 3, 4, 5}


def test_jaccard_pairs_finds_near_dups(docs):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical after norm
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert (4, 5) in pairs
    assert (1, 4) not in pairs


def test_jaccard_df_cap_drops_hot_shingles(spark):
    # 4 docs all sharing one hot shingle; cap=2 kills that shingle's
    # postings so no pairs survive.
    hot = [(i, "common shared phrase") for i in range(4)]
    df = spark.createDataFrame(hot, "doc_id long, text string")
    assert jaccard_pairs(df, "doc_id", "text", threshold=0.1, df_cap=2).count() == 0
    assert jaccard_pairs(df, "doc_id", "text", threshold=0.1, df_cap=None).count() == 6


def test_minhash_agrees_with_exact_jaccard(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(docs, "doc_id", "text", threshold=0.7).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.7).collect()
    }
    # LSH can only miss (false negatives), never invent pairs, because
    # every candidate is verified with exact Jaccard.
    assert lsh <= exact
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.9, f"minhash recall {recall:.2f} vs exact"


def test_simhash_identical_docs_hamming_zero(docs):
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0


def test_neardup_clusters_transitive(spark):
    from flink_orc_sink_spark.operators.dedup import neardup_clusters

    # chain a-b-c plus isolated pair (x,y): {1,2,3} -> keeper 1, {8,9} -> 8
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.8), (8, 9, 0.95)],
        "doc_a long, doc_b long, jaccard double",
    )
    got = {
        (r.doc, r.cluster_keeper) for r in neardup_clusters(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (8, 8), (9, 8)}


def test_neardup_clusters_long_chain(spark):
    from flink_orc_sink_spark.operators.dedup import neardup_clusters

    # a 12-node path graph needs several propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(12)],
        "doc_a long, doc_b long, jaccard double",
    )
    labels = {r.doc: r.cluster_keeper for r in neardup_clusters(pairs).collect()}
    assert set(labels.values()) == {0}
    assert len(labels) == 13


def test_minhash_incremental_pairs_semantics(spark):
    """New-batch docs match against the corpus AND earlier-id docs of
    the same batch, never later-id ones; disjoint docs match nothing."""
    from flink_orc_sink_spark.operators.dedup import minhash_incremental_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different words entirely here now")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, base + " lambda"),        # near-dup of corpus doc 1
            (11, "unrelated fresh content nobody wrote before today"),
            (12, base + " lambda"),        # dup of EARLIER new doc 10 (and corpus 1)
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.new_doc, r.match_doc)
        for r in minhash_incremental_pairs(
            new, corpus, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert (10, 1) in pairs          # new vs corpus
    assert (12, 10) in pairs         # within-batch, earlier id only
    assert (10, 12) not in pairs     # never matches a LATER new doc
    assert not any(a == 11 for a, _ in pairs)  # disjoint doc is clean


def test_minhash_index_probe_never_touches_corpus_text(spark, tmp_path):
    """The persisted-index probe must answer from the INDEX alone:
    build the index, then DELETE the corpus parquet — the probe still
    finds every planted near-dup with exact Jaccard. Pins the
    production property docs_index_probe_dedup claims: incremental
    ingest never re-reads corpus text."""
    import shutil

    from flink_orc_sink_spark.operators.dedup import (
        build_minhash_index,
        minhash_probe_index,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus_path = str(tmp_path / "corpus")
    spark.createDataFrame(
        [
            (1, base),
            (2, "completely different words entirely here right now"),
            (3, base + " appended tail words"),
        ],
        "doc_id long, text string",
    ).write.parquet(corpus_path)

    idx = str(tmp_path / "idx")
    corpus = spark.read.parquet(corpus_path)
    build_minhash_index(corpus, "doc_id", "text", idx)

    # the probe's only allowed source of corpus knowledge is the index
    shutil.rmtree(corpus_path)

    new = spark.createDataFrame(
        [
            (10, base + " lambda"),  # near-dup of corpus docs 1 and 3
            (11, "unrelated fresh content nobody wrote before today"),
        ],
        "doc_id long, text string",
    )
    rows = minhash_probe_index(
        spark, new, "doc_id", "text", idx, threshold=0.5
    ).collect()
    pairs = {(r.new_doc, r.match_doc) for r in rows}
    assert (10, 1) in pairs
    assert not any(nd == 11 for nd, _ in pairs)
    # exact verification survived the round trip through hash sets
    for r in rows:
        assert 0.5 <= r.jaccard <= 1.0


def test_minhash_index_append_lifecycle(spark, tmp_path):
    """Full incremental-ingest lifecycle: index corpus -> probe batch 1
    -> append its survivors -> probe batch 2. Batch 2 must match docs
    admitted in batch 1 (via the appended index rows), and the whole
    two-step state must equal a from-scratch index over
    corpus + admitted batch 1."""
    from flink_orc_sink_spark.operators.dedup import (
        append_to_minhash_index,
        build_minhash_index,
        minhash_probe_index,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(1, "completely different words entirely here right now")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_minhash_index(corpus, "doc_id", "text", idx)

    batch1 = spark.createDataFrame(
        [(10, base)], "doc_id long, text string"
    )
    assert (
        minhash_probe_index(
            spark, batch1, "doc_id", "text", idx, threshold=0.5
        ).count()
        == 0
    )  # novel -> admitted
    append_to_minhash_index(batch1, "doc_id", "text", idx)

    batch2 = spark.createDataFrame(
        [(20, base + " lambda")], "doc_id long, text string"
    )
    rows = minhash_probe_index(
        spark, batch2, "doc_id", "text", idx, threshold=0.5
    ).collect()
    assert {(r.new_doc, r.match_doc) for r in rows} == {(20, 10)}

    # equivalence with a from-scratch index over corpus + batch1
    idx2 = str(tmp_path / "idx2")
    build_minhash_index(
        corpus.unionByName(batch1), "doc_id", "text", idx2
    )
    rows2 = minhash_probe_index(
        spark, batch2, "doc_id", "text", idx2, threshold=0.5
    ).collect()
    assert {(r.new_doc, r.match_doc, r.jaccard) for r in rows} == {
        (r.new_doc, r.match_doc, r.jaccard) for r in rows2
    }


def test_minhash_probe_never_self_matches(spark, tmp_path):
    """Crash-replay shape: a batch probed against an index that
    already CONTAINS it (append ran, marker write didn't) must not
    emit jaccard-1.0 self-pairs — only genuine cross-doc matches."""
    from flink_orc_sink_spark.operators.dedup import (
        build_minhash_index,
        minhash_probe_index,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " tail"), (3, "totally other words here")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_minhash_index(docs, "doc_id", "text", idx)
    rows = minhash_probe_index(
        spark, docs, "doc_id", "text", idx, threshold=0.5
    ).collect()
    assert all(r.new_doc != r.match_doc for r in rows)
    # the genuine near-dup pair is still found (both directions,
    # since both docs probe)
    assert {(r.new_doc, r.match_doc) for r in rows} == {(1, 2), (2, 1)}


def test_minhash_probe_replay_double_append_no_duplicate_rows(spark, tmp_path):
    """Crash-replay shape #2 (round-4 advisory): a crash between
    append_to_minhash_index's two writes plus replay can double-append
    a doc's band AND shingle rows. The probe must still emit each
    (new_doc, match_doc) pair exactly once — the shingle table is
    deduped by doc at read time."""
    from flink_orc_sink_spark.operators.dedup import (
        append_to_minhash_index,
        build_minhash_index,
        minhash_probe_index,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(1, "completely different words entirely here right now")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_minhash_index(corpus, "doc_id", "text", idx)
    batch1 = spark.createDataFrame([(10, base)], "doc_id long, text string")
    append_to_minhash_index(batch1, "doc_id", "text", idx)
    append_to_minhash_index(batch1, "doc_id", "text", idx)  # the replay

    rows = minhash_probe_index(
        spark,
        spark.createDataFrame(
            [(20, base + " lambda")], "doc_id long, text string"
        ),
        "doc_id",
        "text",
        idx,
        threshold=0.5,
    ).collect()
    assert [(r.new_doc, r.match_doc) for r in rows] == [(20, 10)]


def test_dup_ngram_spans_hand_computed(spark):
    """Exact substring spans on a corpus small enough to verify by
    hand: cross-doc duplication, within-doc repetition, overlapping
    gram merging, and the no-duplicates case."""
    from flink_orc_sink_spark.operators.dedup import dup_ngram_spans

    boiler = "all rights reserved by the original author"  # 7 tokens
    docs = spark.createDataFrame(
        [
            # doc 1 & 2 share the 7-token boilerplate prefix (one
            # 3-gram at every position 0..4 -> one merged span 0..6)
            (1, boiler + " alpha beta gamma delta"),
            (2, boiler + " epsilon zeta eta theta"),
            # doc 3 repeats a 3-gram WITHIN itself: positions 0 and 5
            # are separate spans (gap of 2 uncovered tokens)
            (3, "x y z a b x y z c d"),
            # doc 4 shares nothing
            (4, "totally unique words nobody else ever wrote here"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.doc, r.span_start, r.span_end)
        for r in dup_ngram_spans(docs, "doc_id", "text", n=3).collect()
    }
    assert rows == {
        (1, 0, 6),
        (2, 0, 6),
        (3, 0, 2),
        (3, 5, 7),
    }


def test_dup_ngram_spans_adjacent_spans_merge(spark):
    """Two duplicated grams whose spans touch end-to-start merge into
    one maximal span (pos2 == pos1 + n)."""
    from flink_orc_sink_spark.operators.dedup import dup_ngram_spans

    docs = spark.createDataFrame(
        [
            # "a b c" dup at pos 0, "d e f" dup at pos 3: spans [0,2]
            # and [3,5] are contiguous -> one span [0,5]
            (1, "a b c d e f tail1 x1"),
            (2, "a b c left pad d e f"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.doc, r.span_start, r.span_end)
        for r in dup_ngram_spans(docs, "doc_id", "text", n=3).collect()
    }
    assert rows == {(1, 0, 5), (2, 0, 2), (2, 5, 7)}


def test_cut_dup_spans_keep_first_policy(spark):
    """Keep-first excision: the globally-first occurrence (min
    (doc, pos)) of each duplicated gram survives; later copies are
    cut; an exact-duplicate doc that sorts after its twin collapses
    to ''; short and empty docs pass through whole."""
    from flink_orc_sink_spark.operators.dedup import cut_dup_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e unique tail one"),
            (2, "x y a b c d e other words here"),
            (3, "x y a b c d e other words here"),  # exact dup of 2
            (4, "short"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc: (r.clean_text, r.n_kept, r.n_removed)
        for r in cut_dup_spans(docs, "doc_id", "text", n=3).collect()
    }
    assert got == {
        1: ("a b c d e unique tail one", 8, 0),  # first occurrence kept
        2: ("x y other words here", 5, 5),  # shared run cut in place
        3: ("", 0, 10),  # whole-doc dedup as the degenerate case
        4: ("short", 1, 0),
        5: ("", 0, 0),
    }


def test_contamination_spans_marks_eval_grams(spark):
    """Positions covered by an eval-set gram are returned as merged
    spans; docs with no eval overlap produce no rows."""
    from flink_orc_sink_spark.operators.dedup import contamination_spans

    train = spark.createDataFrame(
        [
            (1, "intro words c d e closing remark"),
            (2, "nothing shared at all here"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "c d e")], "doc_id long, text string"
    )
    rows = {
        (r.doc, r.span_start, r.span_end)
        for r in contamination_spans(
            train, eval_df, "doc_id", "text", n=3
        ).collect()
    }
    assert rows == {(1, 2, 4)}


def test_gram_index_incremental_matches_batch_cut(spark, tmp_path):
    """With corpus ids below batch ids, incremental index-probed
    excision equals the one-shot cut_dup_spans over corpus ∪ batch
    (restricted to batch docs); appends admit a batch for later
    batches; a replayed append is a no-op (presence semantics)."""
    from flink_orc_sink_spark.operators.dedup import (
        append_to_gram_index,
        build_gram_index,
        cut_dup_spans,
        cut_spans_against_index,
    )

    corpus = spark.createDataFrame(
        [(1, "a b c d e unique tail one"), (2, "p q r s t something")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "x y a b c d e other words here"),
            (11, "x y a b c d e other words here"),  # dup of 10
            (12, "fresh totally new content right here"),
            (13, "short"),
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "gram_idx")
    build_gram_index(corpus, "doc_id", "text", idx, n=3)
    got = {
        r.doc: (r.clean_text, r.n_kept, r.n_removed)
        for r in cut_spans_against_index(
            spark, batch, "doc_id", "text", idx, n=3
        ).collect()
    }
    ref = {
        r.doc: (r.clean_text, r.n_kept, r.n_removed)
        for r in cut_dup_spans(
            corpus.unionByName(batch), "doc_id", "text", n=3
        ).collect()
        if r.doc >= 10
    }
    assert got == ref
    assert got[11] == ("", 0, 10)  # within-batch exact dup collapses

    append_to_gram_index(batch, "doc_id", "text", idx, n=3)
    b2 = spark.createDataFrame(
        [(20, "fresh totally new content right here plus more")],
        "doc_id long, text string",
    )

    def cut_b2():
        return {
            r.doc: (r.clean_text, r.n_removed)
            for r in cut_spans_against_index(
                spark, b2, "doc_id", "text", idx, n=3
            ).collect()
        }

    assert cut_b2() == {20: ("plus more", 6)}
    append_to_gram_index(batch, "doc_id", "text", idx, n=3)  # replay
    assert cut_b2() == {20: ("plus more", 6)}


def test_gram_index_ingest_order_beats_doc_id_order(spark, tmp_path):
    """The index policy is INGEST order: a corpus gram wins even when
    the batch doc has the LOWER doc id (where global cut_dup_spans
    would keep the batch copy) — the already-admitted corpus copy
    must not be re-cut retroactively."""
    from flink_orc_sink_spark.operators.dedup import (
        build_gram_index,
        cut_spans_against_index,
    )

    corpus = spark.createDataFrame(
        [(100, "a b c d e unique tail")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1, "a b c prefix stolen early")], "doc_id long, text string"
    )
    idx = str(tmp_path / "gram_idx")
    build_gram_index(corpus, "doc_id", "text", idx, n=3)
    got = cut_spans_against_index(
        spark, batch, "doc_id", "text", idx, n=3
    ).collect()
    assert {(r.doc, r.clean_text) for r in got} == {
        (1, "prefix stolen early")
    }


def test_gram_index_replay_self_match_guard(spark, tmp_path):
    """The crash-replay window: a batch whose grams were ALREADY
    appended (crash after append, before checkpoint commit) must cut
    identically on replay — excluding its own tag. Without the guard
    its every token looks corpus-duplicated and the whole batch
    collapses to '' (asserted too, so the hazard stays real)."""
    from flink_orc_sink_spark.operators.dedup import (
        append_to_gram_index,
        build_gram_index,
        cut_spans_against_index,
    )

    corpus = spark.createDataFrame(
        [(1, "a b c d e unique tail")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10, "a b c fresh new material here")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "gram_idx")
    build_gram_index(corpus, "doc_id", "text", idx, n=3)

    def cut(**kw):
        return {
            r.doc: r.clean_text
            for r in cut_spans_against_index(
                spark, batch, "doc_id", "text", idx, n=3, **kw
            ).collect()
        }

    before = cut()
    assert before == {10: "fresh new material here"}
    # crash: append landed (tag = the replayed batch id), commit didn't
    append_to_gram_index(batch, "doc_id", "text", idx, n=3, tag=7)
    assert cut(exclude_tag=7) == before  # replay with guard: identical
    assert cut() == {10: ""}  # without the guard: self-match wipeout
