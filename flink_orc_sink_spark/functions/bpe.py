"""Byte-pair-encoding tokenizer: train on a bounded sample, apply
distributed.

The training-data pipeline's tokenization step in its real shape:
BPE merge tables are trained on a SAMPLE (GPT-2's 40 GB → a merges
file of kilobytes; the sample is bounded by design, so driver-side
training is not a scale compromise), then the learned table ships to
executors as a broadcastable constant and encoding runs as an
Arrow-batched pandas UDF over the full corpus — per-batch word
caching, no per-row Python in the driver, no shuffle at all.

Word tokenization matches the package convention
(``functions/text.py::tokens``): lowercase, whitespace-split. Words
are sequences of single characters plus an end-of-word marker; a
merge joins the most frequent adjacent symbol pair, ties broken
deterministically (count desc, then pair lexicographic) so the same
sample always yields the same merge table on any machine.

Related: ``queries/llm.py::docs_bpe_pair_counts`` is the distributed
form of ONE training iteration's pair count (how you'd train on the
full corpus if you wanted to); this module completes the loop:
train (sample) → encode (corpus).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd

EOW = "</w>"


def _words(text: str) -> list[str]:
    return [w for w in text.lower().strip().split() if w]


def train_bpe(
    texts: list[str], n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from sample texts. Pure,
    deterministic (tie-break: count desc, then lexicographic pair).
    """
    word_freq = Counter()
    for t in texts:
        word_freq.update(_words(t))
    # each distinct word as a mutable symbol sequence
    seqs: list[tuple[list[str], int]] = [
        (list(w) + [EOW], n) for w, n in sorted(word_freq.items())
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for sym, n in seqs:
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] += n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for sym, _n in seqs:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i : i + 2] = [ab]
                else:
                    i += 1
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word by repeatedly applying the LOWEST-RANK
    applicable merge (the standard BPE apply order — merge priority
    is training order, not left-to-right position)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def make_bpe_encode_udf(merges: list[tuple[str, str]]):
    """Pandas UDF ``text -> array<string>`` of BPE tokens. The merge
    ranks dict is a closure constant (kilobytes — ships with the
    task); encoded words are memoized per batch, so cost scales with
    DISTINCT words per batch, not tokens."""
    from pyspark.sql import functions as F

    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cache: dict[str, list[str]] = {}
        for s in batches:
            out = []
            for text in s:
                toks: list[str] = []
                for w in _words(text or ""):
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        cache[w] = enc
                    toks.extend(enc)
                out.append(toks)
            yield pd.Series(out)

    return encode
