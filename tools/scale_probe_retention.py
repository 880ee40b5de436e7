"""Retention scale probe: are deletes really O(deleted), and is the
merge-on-read tax really bounded by the tombstone set?

For growing corpora, builds the persisted MinHash index
(`operators/dedup.py::build_minhash_index`), forgets a FIXED number of
docs (500 — including half of the planted originals the probe batch
will look for), and measures four walls:

- forget:        must stay ~flat as the corpus grows (one distinct +
                 append of the id set, nothing index-sized)
- probe+tomb:    merge-on-read probe — forget's read-time tax is one
                 anti-join against a 500-row broadcast, so it should
                 track the no-tombstone probe, not the corpus
- compact:       the copy-on-write rewrite — the one corpus-sized
                 cost, paid on the maintenance cadence, not the
                 delete or probe path
- probe+compact: after compaction, identical results at
                 no-tombstone cost

Correctness is asserted inline at every size: forgotten planted
originals never match (tombstoned AND compacted paths), surviving
planted recall is 100%, and the two paths return identical pair sets.

Usage: python tools/scale_probe_retention.py [corpus sizes ...]
       (default: 5000 25000 100000)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import numpy as np


def make_docs(n_docs: int, seed: int = 11):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:03d}" for i in range(500)])
    rows = []
    for i in range(n_docs):
        toks = rng.choice(vocab, size=int(rng.integers(80, 160)))
        rows.append((i, " ".join(str(w) for w in toks)))
    return rows


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from flink_orc_sink_spark.operators.dedup import (
        build_minhash_index,
        compact_minhash_index,
        forget_from_minhash_index,
        minhash_probe_index,
    )
    from flink_orc_sink_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [5000, 25000, 100000]
    spark = get_spark("scale-probe-retention")
    work = tempfile.mkdtemp(prefix="scale_probe_ret_")
    planted, n_forget = 100, 500
    print(
        f"{'corpus':>8} {'forget_s':>9} {'probe_tomb_s':>13} "
        f"{'compact_s':>10} {'probe_comp_s':>13} "
        f"{'recall':>7} {'leaks':>6}"
    )
    try:
        for n in sizes:
            corpus_rows = make_docs(n)
            corpus = spark.createDataFrame(
                corpus_rows, "doc_id long, text string"
            ).repartition(32)
            corpus.count()
            idx = os.path.join(work, f"idx_{n}")
            build_minhash_index(corpus, "doc_id", "text", idx)

            # probe batch: `planted` perturbed corpus docs (ids known)
            rng = np.random.default_rng(99)
            victims = rng.choice(n, size=planted, replace=False)
            batch_rows = []
            for j, v in enumerate(victims):
                toks = corpus_rows[int(v)][1].split()
                for p in rng.integers(0, len(toks), size=3):
                    toks[int(p)] = f"w{int(rng.integers(0, 500)):03d}"
                batch_rows.append((1_000_000 + j, " ".join(toks)))
            batch = spark.createDataFrame(
                batch_rows, "doc_id long, text string"
            ).repartition(8)
            batch.count()

            # forget half the victims + filler up to a FIXED delete
            # count — the forget wall must not scale with the corpus
            gone = {int(v) for v in victims[: planted // 2]}
            filler = [
                i for i in range(n) if i not in set(map(int, victims))
            ][: n_forget - len(gone)]
            forget_df = spark.createDataFrame(
                [(d,) for d in sorted(gone) + filler], "doc_id long"
            )
            t0 = time.time()
            forget_from_minhash_index(forget_df, idx)
            t_forget = time.time() - t0

            def run_probe():
                t0 = time.time()
                rows = minhash_probe_index(
                    spark, batch, "doc_id", "text", idx, threshold=0.6
                ).collect()
                return time.time() - t0, {
                    (r.new_doc, r.match_doc) for r in rows
                }

            t_tomb, pairs_tomb = run_probe()
            t0 = time.time()
            compact_minhash_index(spark, idx)
            t_compact = time.time() - t0
            t_comp, pairs_comp = run_probe()

            assert pairs_tomb == pairs_comp, "paths diverged"
            matched = {m for _, m in pairs_comp}
            leaks = len(matched & gone)
            surviving = {int(v) for v in victims} - gone
            recall = len(matched & surviving) / len(surviving)
            print(
                f"{n:>8} {t_forget:>9.2f} {t_tomb:>13.2f} "
                f"{t_compact:>10.2f} {t_comp:>13.2f} "
                f"{recall:>7.2%} {leaks:>6}"
            )
            assert leaks == 0, "forgotten doc matched"
            assert recall == 1.0, "surviving planted doc missed"
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
