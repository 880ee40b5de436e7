"""Persisted-MinHash-index scale probe: does probe cost really scale
with the BATCH, not the corpus?

Builds the band index (`operators/dedup.py::build_minhash_index`) over
synthetic corpora of growing size, then probes each with the SAME
fixed-size new batch (1000 docs, 10% of them light perturbations of
random corpus docs — known planted matches). The claim under test is
the central one of the incremental-ingest design: a probe's wall is
batch-sized signature work + a pre-bucketed index join, so corpus
growth should move index-BUILD wall (one-off, at ingest) but leave
probe wall ~flat, with planted recall at 100%.

Usage: python tools/scale_probe_index.py [corpus sizes ...]
       (default: 5000 25000 100000)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import numpy as np


def make_docs(spark, n_docs: int, seed: int = 11):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:03d}" for i in range(500)])
    rows = []
    for i in range(n_docs):
        toks = rng.choice(vocab, size=int(rng.integers(80, 160)))
        rows.append((i, " ".join(str(w) for w in toks)))
    return rows


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from flink_orc_sink_spark.operators.dedup import (
        build_minhash_index,
        minhash_probe_index,
    )
    from flink_orc_sink_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [5000, 25000, 100000]
    spark = get_spark("scale-probe-index")
    work = tempfile.mkdtemp(prefix="scale_probe_idx_")
    batch_size, planted = 1000, 100
    try:
        for n in sizes:
            corpus_rows = make_docs(spark, n)
            corpus = spark.createDataFrame(
                corpus_rows, "doc_id long, text string"
            ).repartition(32)
            corpus.count()  # materialize generation outside the timings

            idx = os.path.join(work, f"idx_{n}")
            t0 = time.time()
            build_minhash_index(corpus, "doc_id", "text", idx)
            t_build = time.time() - t0

            # fixed batch: `planted` perturbed corpus docs + novel rest
            rng = np.random.default_rng(99)
            batch_rows = []
            victims = rng.choice(n, size=planted, replace=False)
            for j, v in enumerate(victims):
                toks = corpus_rows[int(v)][1].split()
                for p in rng.integers(0, len(toks), size=3):
                    toks[int(p)] = f"w{int(rng.integers(0, 500)):03d}"
                batch_rows.append((1_000_000 + j, " ".join(toks)))
            novel = make_docs(spark, batch_size - planted, seed=77)
            batch_rows += [
                (2_000_000 + i, t) for i, t in
                ((r[0], r[1]) for r in novel)
            ]
            batch = spark.createDataFrame(
                batch_rows, "doc_id long, text string"
            ).repartition(8)
            batch.count()

            t0 = time.time()
            pairs = minhash_probe_index(
                spark, batch, "doc_id", "text", idx, threshold=0.7
            )
            matched_new = {
                r.new_doc
                for r in pairs.select("new_doc").distinct().collect()
            }
            t_probe = time.time() - t0
            hits = sum(
                1 for j in range(planted) if 1_000_000 + j in matched_new
            )
            print(
                f"corpus={n:7d}  build={t_build:6.1f}s "
                f" probe={t_probe:5.1f}s  planted_recall={hits}/{planted}",
                flush=True,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
