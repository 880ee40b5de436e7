"""Fuzzy-join scale probe: does SymSpell deletion blocking stay
near-linear in dictionary size, with zero false negatives?

Generates seeded random dictionaries at growing sizes, plants one
typo'd duplicate (1-2 edits) for every 20th word, runs
``symspell_pairs`` at each size, and checks:

- every planted (word, typo) pair is found (the no-false-negative
  guarantee, end to end through the Spark plan);
- wall time grows ~linearly with dictionary size (the blocking
  join's candidate volume tracks shared-variant pairs, not n²).

The thing verified is the SHAPE: variants fan out per word by
O(L²) (key length), candidates come from one equi-join on the
variant key — a quadratic blow-up would indicate the blocking
degenerating (e.g. a hot variant bucket).

Usage: python tools/scale_probe_fuzzy.py [sizes ...]
       (default: 2000 10000 50000)
"""

from __future__ import annotations

import random
import string
import sys
import time


def make_dictionary(n: int, seed: int = 5):
    rng = random.Random(seed)
    words = set()
    while len(words) < n:
        words.add(
            "".join(
                rng.choice(string.ascii_lowercase)
                for _ in range(rng.randint(6, 12))
            )
        )
    words = sorted(words)
    planted = []
    for i in range(0, len(words), 20):
        w = words[i]
        # typo: one substitution + maybe one deletion (edit dist 1-2)
        pos = rng.randrange(len(w))
        typo = w[:pos] + rng.choice(string.ascii_lowercase) + w[pos + 1 :]
        if rng.random() < 0.5 and len(typo) > 6:
            dpos = rng.randrange(len(typo))
            typo = typo[:dpos] + typo[dpos + 1 :]
        if typo != w and typo not in words:
            planted.append((min(w, typo), max(w, typo)))
            words.append(typo)
    return words, set(planted)


def main() -> None:
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from flink_orc_sink_spark.operators.dedup import symspell_pairs
    from flink_orc_sink_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [2000, 10000, 50000]
    spark = get_spark("scale-probe-fuzzy")
    for n in sizes:
        words, planted = make_dictionary(n)
        df = spark.createDataFrame(
            [(w,) for w in words], "name string"
        ).repartition(32).cache()
        df.count()
        t0 = time.time()
        pairs = {
            (r.name_a, r.name_b)
            for r in symspell_pairs(df, "name", max_edit=2).collect()
        }
        wall = time.time() - t0
        missed = planted - pairs
        print(
            f"dict={len(words):>7,}  planted={len(planted):>5}  "
            f"found_planted={len(planted) - len(missed):>5}  "
            f"total_pairs={len(pairs):>6}  wall={wall:6.2f}s"
        )
        assert not missed, f"false negatives: {sorted(missed)[:5]}"
        df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
