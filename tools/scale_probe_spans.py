"""Exact-substring span scale probe: is dup_ngram_spans really linear
in corpus token count?

Corpora of growing size: 10% of docs carry a shared 12-token
boilerplate prefix (the planted duplication a real corpus has —
licenses, headers, quoted chunks); the rest is random text whose
8-grams are effectively unique. The claims under test:

- wall grows ~linearly with the corpus (one gram stream, one count
  aggregation, one semi join — nothing pairwise);
- every planted doc gets a span covering its boilerplate prefix
  (recall 100%), and the span count grows linearly with the planted
  count — hot boilerplate grams cost their occurrence count, never a
  quadratic candidate set.

Usage: python tools/scale_probe_spans.py [corpus sizes ...]
       (default: 5000 25000 100000)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

BOILER = " ".join(f"b{i:02d}" for i in range(12))


def make_docs(n_docs: int, seed: int = 11):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:04d}" for i in range(5000)])
    rows = []
    for i in range(n_docs):
        body = " ".join(
            str(w) for w in rng.choice(vocab, size=int(rng.integers(60, 120)))
        )
        if i % 10 == 0:
            rows.append((i, BOILER + " " + body))
        else:
            rows.append((i, body))
    return rows


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from flink_orc_sink_spark.operators.dedup import dup_ngram_spans
    from flink_orc_sink_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [5000, 25000, 100000]
    spark = get_spark("scale-probe-spans")
    print(f"{'corpus':>8} {'wall_s':>7} {'spans':>8} {'planted_recall':>15}")
    for n in sizes:
        df = spark.createDataFrame(
            make_docs(n), "doc_id long, text string"
        ).repartition(32)
        df.count()
        t0 = time.time()
        rows = dup_ngram_spans(df, "doc_id", "text", n=8).collect()
        wall = time.time() - t0
        planted = {i for i in range(n) if i % 10 == 0}
        # a planted doc's boilerplate occupies token positions 0..11
        covered = {
            r.doc
            for r in rows
            if r.doc in planted and r.span_start == 0 and r.span_end >= 11
        }
        recall = len(covered) / len(planted)
        print(f"{n:>8} {wall:>7.2f} {len(rows):>8} {recall:>15.2%}")
        assert recall == 1.0, "planted boilerplate span missed"


if __name__ == "__main__":
    main()
