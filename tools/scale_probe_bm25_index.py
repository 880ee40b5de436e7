"""Persisted-BM25-index scale probe: does PROBE cost scale with the
query, not the indexed corpus?

Builds the bucket-partitioned retrieval index
(`operators/retrieval.py::build_bm25_index`) over synthetic corpora of
growing size, then probes each with the SAME fixed 3-term query. The
claim under test: the postings read prunes at the file listing to the
query terms' bucket directories and the corpus globals aggregate the
slim doclens table, so corpus growth moves BUILD wall (one-off,
O(corpus tokens)) while PROBE wall grows only with the matching
postings — sub-linearly in corpus size, never a corpus text re-read.
A second probe against the same index also reports the append path:
one fixed-size batch appended, then re-probed (the ingest steady
state).

Usage: python tools/scale_probe_bm25_index.py [corpus sizes ...]
       (default: 20000 100000 400000)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from flink_orc_sink_spark.operators.retrieval import (
        append_to_bm25_index,
        bm25_probe_index,
        build_bm25_index,
    )
    from flink_orc_sink_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 100_000, 400_000]
    terms = ["alpha", "quux", "zeta"]
    spark = get_spark("scale-probe-bm25-index")
    work = tempfile.mkdtemp(prefix="scale_probe_bm25idx_")

    # synthetic docs: ~20 tokens from a 1000-word vocab, seeded by id
    # (pure Catalyst, deterministic), with the query terms mixed into
    # a minority of docs so matches exist at every size
    vocab = F.array(
        *[F.lit(f"w{i}") for i in range(997)],
        F.lit("alpha"), F.lit("quux"), F.lit("zeta"),
    )

    def docs(ids):
        return ids.select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(20)),
                    lambda i: F.element_at(
                        vocab,
                        (
                            (F.xxhash64(F.col("id") * 31 + i) % 1000 + 1000)
                            % 1000
                            + 1
                        ).cast("int"),
                    ),
                ),
            ).alias("text"),
        )

    batch = 2000
    try:
        for n in sizes:
            corpus = docs(spark.range(0, n, 1, 32))
            idx = os.path.join(work, f"idx_{n}")
            t0 = time.time()
            build_bm25_index(corpus, "doc_id", "text", idx)
            t_build = time.time() - t0

            t0 = time.time()
            rows = bm25_probe_index(spark, idx, terms, k=20).collect()
            t_probe = time.time() - t0

            newb = docs(
                spark.range(n, n + batch, 1, 8)
            )
            t0 = time.time()
            append_to_bm25_index(newb, "doc_id", "text", idx, tag=1)
            t_append = time.time() - t0
            t0 = time.time()
            rows2 = bm25_probe_index(spark, idx, terms, k=20).collect()
            t_probe2 = time.time() - t0
            print(
                f"corpus={n}: build={t_build:.2f}s probe={t_probe:.2f}s "
                f"append({batch})={t_append:.2f}s reprobe={t_probe2:.2f}s "
                f"hits={len(rows)}/{len(rows2)}",
                flush=True,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
