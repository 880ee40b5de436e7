"""Dedup-pipeline scale probe: does the MinHash path stay linear?

Generates seeded synthetic corpora at 1x / 5x / 10x the sf0.1 document
count (plus ~1% planted near-dup pairs), runs the MinHash-LSH dedup
pipeline end-to-end at each size, and prints per-stage wall times. The
thing being verified is the SHAPE: signatures are embarrassingly
parallel, banding is one bounded shuffle, verification touches only
candidates — so total time should grow ~linearly in docs while planted
pairs are still found. A quadratic blow-up here is the classic dedup
scale failure (hot shingle / degenerate bucket), capped by ``df_cap``
and ``bucket_cap``.

Planted-pair RECALL is measured at every size: doc ``i`` with
``i % 100 == 99`` is a 3-token perturbation of doc ``i-1``, so the
expected pair set is known exactly and recall is a join, not an
estimate.

Usage: python tools/scale_probe.py [sizes ...]   (default: 5000 25000 50000)
100× probe: python tools/scale_probe.py 5000 50000 500000
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import numpy as np


def make_corpus(spark, n_docs: int, path: str, seed: int = 7) -> None:
    """Word-salad docs (~120 tokens, 500-word vocab) + planted
    near-dups: every 100th doc is a lightly perturbed copy of its
    predecessor (same prefix, a few tokens swapped at the tail)."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:03d}" for i in range(500)])
    lengths = rng.integers(80, 160, size=n_docs)
    rows = []
    prev_tokens = None
    for i in range(n_docs):
        if prev_tokens is not None and i % 100 == 99:
            toks = list(prev_tokens)
            for j in rng.integers(0, len(toks), size=3):
                toks[int(j)] = str(rng.choice(vocab))
        else:
            toks = [str(w) for w in rng.choice(vocab, size=int(lengths[i]))]
        prev_tokens = toks
        rows.append((i, " ".join(toks)))
    spark.createDataFrame(rows, "doc_id long, text string").repartition(
        32
    ).write.mode("overwrite").parquet(path)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from flink_orc_sink_spark.operators import dedup as dd
    from flink_orc_sink_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [5000, 25000, 50000]
    spark = get_spark("scale-probe")
    work = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        for n in sizes:
            path = os.path.join(work, f"docs_{n}")
            make_corpus(spark, n, path)
            df = spark.read.parquet(path)
            df.count()  # warm the scan

            t0 = time.time()
            sigs = dd.minhash_signatures(df, "doc_id", "text")
            sigs.count()
            t_sig = time.time() - t0

            t0 = time.time()
            cands = dd.minhash_candidate_pairs(
                dd.minhash_signatures(df, "doc_id", "text")
            )
            n_cands = cands.count()
            t_cand = time.time() - t0

            t0 = time.time()
            pairs = dd.minhash_dedup_pairs(df, "doc_id", "text", threshold=0.7)
            n_pairs = pairs.count()
            t_full = time.time() - t0

            # exact planted recall: pair (i-1, i) for every i%100==99
            from pyspark.sql import functions as F

            planted_df = (
                spark.range(n)
                .filter((F.col("id") % 100) == 99)
                .select(
                    (F.col("id") - 1).alias("doc_a"),
                    F.col("id").alias("doc_b"),
                )
            )
            n_planted = planted_df.count()
            found = planted_df.join(
                pairs.select(
                    F.least("doc_a", "doc_b").alias("doc_a"),
                    F.greatest("doc_a", "doc_b").alias("doc_b"),
                ),
                ["doc_a", "doc_b"],
                "left_semi",
            ).count()
            print(
                f"docs={n:6d}  sig={t_sig:5.1f}s  sig+cand={t_cand:5.1f}s "
                f"full={t_full:5.1f}s  cands={n_cands}  pairs={n_pairs} "
                f"planted_recall={found}/{n_planted}",
                flush=True,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
