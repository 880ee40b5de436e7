"""Deletion + retention lifecycle for the persisted indexes
(``operators/retention.py``): tombstoned ids must stop matching
IMMEDIATELY, compaction must change nothing but bytes on disk, and the
swap must be crash-recoverable — the index-side completion of the
reference sink's commit protocol (``RowOrcBucketingSink.java:153-213``:
write pending, rename into place only when complete)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_orc_sink_spark.operators.retention import (
    AHASH_TABLES,
    IVF_TABLES,
    MINHASH_TABLES,
    compact_index,
    forget_ids,
    read_tombstones,
    readmit_ids,
    recover_index,
    subtract_tombstones,
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _ids(spark, vals, col="id"):
    return spark.createDataFrame([(int(v),) for v in vals], f"{col} long")


def _probe_pairs(spark, new, idx):
    from flink_orc_sink_spark.operators.dedup import minhash_probe_index

    return {
        (r.new_doc, r.match_doc, round(r.jaccard, 9))
        for r in minhash_probe_index(
            spark, new, "doc_id", "text", idx, threshold=0.5
        ).collect()
    }


@pytest.fixture()
def minhash_world(spark, tmp_path):
    corpus = spark.createDataFrame(
        [
            (1, BASE),
            (2, BASE + " appended tail"),
            (3, "completely different words entirely here right now"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, BASE + " lambda"), (11, "fresh unrelated content today")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    from flink_orc_sink_spark.operators.dedup import build_minhash_index

    build_minhash_index(corpus, "doc_id", "text", idx)
    return corpus, new, idx


def test_minhash_forget_stops_matches_and_compact_is_invisible(
    spark, minhash_world, tmp_path
):
    """forget(1) -> doc 1 never matches again, doc 2 still does; the
    merge-on-read probe, the post-compaction probe, and a from-scratch
    rebuild over corpus-minus-forgotten all agree exactly."""
    from flink_orc_sink_spark.operators.dedup import (
        build_minhash_index,
        compact_minhash_index,
        forget_from_minhash_index,
    )

    corpus, new, idx = minhash_world
    before = _probe_pairs(spark, new, idx)
    assert {(nd, md) for nd, md, _ in before} >= {(10, 1), (10, 2)}

    forget_from_minhash_index(_ids(spark, [1], "doc_id"), idx)
    tombstoned = _probe_pairs(spark, new, idx)
    assert not any(md == 1 for _, md, _ in tombstoned)
    assert any(md == 2 for _, md, _ in tombstoned)

    compact_minhash_index(spark, idx)
    assert _probe_pairs(spark, new, idx) == tombstoned
    assert read_tombstones(spark, idx) is None

    # band partition layout survives compaction (probe pruning intact)
    bands = os.path.join(idx, "bands")
    assert any(d.startswith("band=") for d in os.listdir(bands))
    # physically gone, not just filtered
    assert (
        spark.read.parquet(bands).filter(F.col("doc") == 1).count() == 0
    )

    rebuilt = str(tmp_path / "rebuilt")
    build_minhash_index(
        corpus.filter("doc_id <> 1"), "doc_id", "text", rebuilt
    )
    assert _probe_pairs(spark, new, rebuilt) == tombstoned


def test_forget_is_idempotent_and_recompaction_noop(spark, minhash_world):
    """Double-forget (crash-replay of the delete request) and a second
    compaction over already-removed ids must both be no-ops."""
    from flink_orc_sink_spark.operators.dedup import (
        compact_minhash_index,
        forget_from_minhash_index,
    )

    _, new, idx = minhash_world
    forget_from_minhash_index(_ids(spark, [1], "doc_id"), idx)
    forget_from_minhash_index(_ids(spark, [1], "doc_id"), idx)
    expect = _probe_pairs(spark, new, idx)
    compact_minhash_index(spark, idx)
    assert _probe_pairs(spark, new, idx) == expect
    # crash before the tombstone clear: re-forgetting the same (now
    # physically absent) id and recompacting changes nothing
    forget_from_minhash_index(_ids(spark, [1], "doc_id"), idx)
    compact_minhash_index(spark, idx)
    assert _probe_pairs(spark, new, idx) == expect


def test_compact_without_tombstones_is_noop(spark, minhash_world):
    from flink_orc_sink_spark.operators.dedup import compact_minhash_index

    _, new, idx = minhash_world
    before = _probe_pairs(spark, new, idx)
    compact_minhash_index(spark, idx)
    assert _probe_pairs(spark, new, idx) == before


def test_recover_index_finishes_interrupted_swap(spark, minhash_world):
    """Simulate a crash between delete(live) and rename(pending->live):
    recover_index (and therefore any rerun of compact_index) must
    rename the complete pending copy into place."""
    _, new, idx = minhash_world
    expect = _probe_pairs(spark, new, idx)
    live = os.path.join(idx, "bands")
    pending = live + "__compacting"
    os.rename(live, pending)  # pending complete, live gone
    recover_index(spark, idx, MINHASH_TABLES)
    assert os.path.isdir(live) and not os.path.exists(pending)
    assert _probe_pairs(spark, new, idx) == expect


@pytest.mark.slow  # minute-scale lifecycle — slow tier, see pytest.ini
def test_compact_heals_crashed_swap_then_applies_tombstones(
    spark, minhash_world
):
    """compact_index calls recover_index first: a crashed swap plus a
    pending tombstone must resolve to the fully-compacted state."""
    from flink_orc_sink_spark.operators.dedup import (
        compact_minhash_index,
        forget_from_minhash_index,
    )

    _, new, idx = minhash_world
    forget_from_minhash_index(_ids(spark, [1], "doc_id"), idx)
    expect = _probe_pairs(spark, new, idx)
    live = os.path.join(idx, "shingles")
    os.rename(live, live + "__compacting")
    compact_minhash_index(spark, idx)
    assert _probe_pairs(spark, new, idx) == expect
    assert read_tombstones(spark, idx) is None


def test_subtract_tombstones_passthrough_when_none(spark, tmp_path):
    """No tombstones ever written -> the scan plan is returned as-is
    (no anti-join tax on the common case)."""
    df = spark.range(5)
    out = subtract_tombstones(df, "id", spark, str(tmp_path / "nothing"))
    assert out is df


def test_forget_ids_is_o_deleted_append(spark, tmp_path):
    """The delete path writes ONLY the tombstone table — no index
    table is rewritten (mtimes untouched)."""
    idx = str(tmp_path / "idx")
    from flink_orc_sink_spark.operators.dedup import build_minhash_index

    build_minhash_index(
        spark.createDataFrame([(1, BASE)], "doc_id long, text string"),
        "doc_id",
        "text",
        idx,
    )
    snap = {
        sub: os.path.getmtime(os.path.join(idx, sub))
        for sub in ("bands", "shingles")
    }
    forget_ids(_ids(spark, [1]), idx)
    for sub, mt in snap.items():
        assert os.path.getmtime(os.path.join(idx, sub)) == mt
    ts = read_tombstones(spark, idx)
    assert ts is not None and [r.id for r in ts.collect()] == [1]


@pytest.mark.slow  # minute-scale lifecycle — slow tier, see pytest.ini
def test_forget_everything_compact_keeps_index_alive(spark, minhash_world):
    """Tombstoning EVERY indexed doc and compacting must not brick the
    index: a zero-row partitioned rewrite has no readable footer, so
    the swap aborts and the index keeps serving merge-on-read (empty
    results), with tombstones intact until rows are appended again."""
    from flink_orc_sink_spark.operators.dedup import (
        append_to_minhash_index,
        compact_minhash_index,
        forget_from_minhash_index,
    )

    corpus, new, idx = minhash_world
    forget_from_minhash_index(corpus.select("doc_id"), idx)
    compact_minhash_index(spark, idx)
    # probe still answers (empty), tombstones still present
    assert _probe_pairs(spark, new, idx) == set()
    assert read_tombstones(spark, idx) is not None
    # the lifecycle continues: append fresh docs, probe, compact
    append_to_minhash_index(
        spark.createDataFrame(
            [(50, BASE + " mu nu")], "doc_id long, text string"
        ),
        "doc_id",
        "text",
        idx,
    )
    got = _probe_pairs(spark, new, idx)
    assert {(nd, md) for nd, md, _ in got} == {(10, 50)}
    compact_minhash_index(spark, idx)
    assert _probe_pairs(spark, new, idx) == got
    assert read_tombstones(spark, idx) is None


@pytest.mark.slow  # minute-scale lifecycle — slow tier, see pytest.ini
def test_reappend_readmits_forgotten_doc(spark, minhash_world):
    """GDPR re-consent: re-ingesting a forgotten id makes it live
    again (appends readmit their batch ids), and compaction must NOT
    physically erase the re-appended rows."""
    from flink_orc_sink_spark.operators.dedup import (
        append_to_minhash_index,
        compact_minhash_index,
        forget_from_minhash_index,
    )

    corpus, new, idx = minhash_world
    forget_from_minhash_index(_ids(spark, [1, 2], "doc_id"), idx)
    assert not any(
        md in (1, 2) for _, md, _ in _probe_pairs(spark, new, idx)
    )
    append_to_minhash_index(
        corpus.filter("doc_id = 1"), "doc_id", "text", idx
    )
    after = _probe_pairs(spark, new, idx)
    assert any(md == 1 for _, md, _ in after)
    assert not any(md == 2 for _, md, _ in after)
    compact_minhash_index(spark, idx)
    assert _probe_pairs(spark, new, idx) == after
    # doc 2's rows are physically gone, doc 1's are physically back
    bands = spark.read.parquet(os.path.join(idx, "bands"))
    assert bands.filter(F.col("doc") == 2).count() == 0
    assert bands.filter(F.col("doc") == 1).count() > 0


def test_explicit_readmit_ids(spark, minhash_world):
    """readmit_ids removes exactly the given ids from the tombstone
    set; readmitting the last one drops the table entirely."""
    _, new, idx = minhash_world
    forget_ids(_ids(spark, [1, 2]), idx)
    readmit_ids(_ids(spark, [1]), idx)
    got = _probe_pairs(spark, new, idx)
    assert any(md == 1 for _, md, _ in got)
    assert not any(md == 2 for _, md, _ in got)
    assert {r.id for r in read_tombstones(spark, idx).collect()} == {2}
    readmit_ids(_ids(spark, [2]), idx)
    assert read_tombstones(spark, idx) is None
    assert not os.path.exists(os.path.join(idx, "tombstones"))


# --- IVF ---------------------------------------------------------------


@pytest.mark.slow  # minute-scale lifecycle — slow tier, see pytest.ini
def test_ivf_forget_and_compact_equal_rebuild(spark, tmp_path):
    """Forgotten vectors neither match nor crowd a top-k; compaction
    preserves the cell layout and leaves centroids untouched; both
    paths equal a rebuild (same centroids) over corpus-minus-forgotten."""
    from flink_orc_sink_spark.operators.similarity import (
        build_ivf_index,
        compact_ivf_index,
        forget_from_ivf_index,
        ivf_threshold_matches,
        train_centroids,
    )

    rng = np.random.RandomState(11)
    centers = rng.standard_normal((8, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(12):
            v = c + 0.1 * rng.standard_normal(16) / 4.0
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter("vec_id % 12 = 0")
    cents = train_centroids(corpus, "embedding", nlist=8)

    idx = str(tmp_path / "ivf")
    build_ivf_index(corpus, "vec_id", "embedding", idx, centroids=cents)

    def matches(path):
        return {
            (r.qid, r.cid, round(r.cos_sim, 9))
            for r in ivf_threshold_matches(
                spark, queries, path, "vec_id", "embedding",
                threshold=0.9, nprobe=4,
            ).collect()
        }

    gone = [1, 13, 25]
    before = matches(idx)
    assert any(cid in gone for _, cid, _ in before)

    forget_from_ivf_index(_ids(spark, gone, "vec_id"), idx)
    tombstoned = matches(idx)
    assert not any(cid in gone for _, cid, _ in tombstoned)

    cent_mtime = os.path.getmtime(os.path.join(idx, "centroids"))
    compact_ivf_index(spark, idx)
    assert matches(idx) == tombstoned
    assert read_tombstones(spark, idx) is None
    assert os.path.getmtime(os.path.join(idx, "centroids")) == cent_mtime
    data = os.path.join(idx, "data")
    assert any(d.startswith("cell=") for d in os.listdir(data))

    rebuilt = str(tmp_path / "ivf_rebuilt")
    build_ivf_index(
        corpus.filter(~F.col("vec_id").isin(gone)),
        "vec_id",
        "embedding",
        rebuilt,
        centroids=cents,
    )
    assert matches(rebuilt) == tombstoned


def test_ivf_tables_layout_matches_build():
    """IVF_TABLES must mirror build_ivf_index's physical layout (cell
    partitioning, repartition-by-cell clustering) so compaction cannot
    silently degrade probe pruning."""
    (t,) = IVF_TABLES
    assert t.subdir == "data" and t.id_col == "cid"
    assert t.partition_cols == ("cell",)
    assert t.repartition_cols == ("cell",)


# --- aHash (media) ------------------------------------------------------


def test_ahash_forget_and_compact(spark, tmp_path):
    """Media takedown: forgotten originals never match their clones
    again; survivors still do; compaction is invisible to the probe."""
    from flink_orc_sink_spark.operators.multimodal import (
        ahash_probe_index,
        attach_planted_png,
        build_ahash_index,
        compact_ahash_index,
        forget_from_ahash_index,
        image_ahash,
    )

    base = spark.range(0, 20, 1, 4).select(F.col("id").alias("media_id"))
    originals = image_ahash(
        attach_planted_png(base, "media_id"), "media_id", "png"
    )
    idx = str(tmp_path / "ahash")
    build_ahash_index(originals, "media_id", "ahash", idx)

    clones = image_ahash(
        attach_planted_png(
            base.select(
                F.col("media_id").alias("plant_id"),
                (F.col("media_id") + 1000).alias("media_id"),
            ),
            "plant_id",
            perturb=True,
        ).select("media_id", "png"),
        "media_id",
        "png",
    )

    def probe():
        return {
            (r.new_id, r.match_id, r.hamming)
            for r in ahash_probe_index(
                spark, clones, "media_id", "ahash", idx, max_hamming=3
            ).collect()
        }

    before = probe()
    assert any(mid % 5 == 0 for _, mid, _ in before)

    forget_from_ahash_index(
        base.filter(F.col("media_id") % 5 == 0), idx
    )
    tombstoned = probe()
    assert not any(mid % 5 == 0 for _, mid, _ in tombstoned)
    assert tombstoned == {p for p in before if p[1] % 5 != 0}

    compact_ahash_index(spark, idx)
    assert probe() == tombstoned
    assert read_tombstones(spark, idx) is None
    assert (
        spark.read.parquet(os.path.join(idx, "bands"))
        .filter(F.col("mid") % 5 == 0)
        .count()
        == 0
    )


def test_ahash_recover_after_crash(spark, tmp_path):
    """Crash between delete and rename on the single-table aHash index:
    recover_index restores the complete pending copy."""
    from flink_orc_sink_spark.operators.multimodal import (
        attach_planted_png,
        build_ahash_index,
        image_ahash,
    )

    base = spark.range(0, 8, 1, 2).select(F.col("id").alias("media_id"))
    originals = image_ahash(
        attach_planted_png(base, "media_id"), "media_id", "png"
    )
    idx = str(tmp_path / "ahash")
    build_ahash_index(originals, "media_id", "ahash", idx)
    live = os.path.join(idx, "bands")
    n = spark.read.parquet(live).count()
    os.rename(live, live + "__compacting")
    recover_index(spark, idx, AHASH_TABLES)
    assert spark.read.parquet(live).count() == n


def test_stream_command_batch_replay_idempotent(spark, minhash_world):
    """Crash-replay of a mixed del+add command batch
    (queries/engine.py::_apply_index_commands): the replayed deletes
    re-tombstone ids whose re-add is marker-skipped, so the replay
    path must re-apply the adds' readmission — probe results must be
    IDENTICAL after the replay."""
    from flink_orc_sink_spark.queries.engine import _apply_index_commands

    corpus, new, idx = minhash_world
    batch = (
        spark.createDataFrame(
            [("del", 1, None), ("del", 2, None)],
            "op string, doc_id long, text string",
        ).unionByName(
            corpus.filter("doc_id = 1").select(
                F.lit("add").alias("op"), "doc_id", "text"
            )
        )
    )
    _apply_index_commands(spark, idx, batch, 7)
    once = _probe_pairs(spark, new, idx)
    assert any(md == 1 for _, md, _ in once)  # re-added: live
    assert not any(md == 2 for _, md, _ in once)  # forgotten: gone
    # the batch commits, the process dies, the batch replays verbatim
    _apply_index_commands(spark, idx, batch, 7)
    assert _probe_pairs(spark, new, idx) == once
