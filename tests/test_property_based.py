"""Property-based tests (hypothesis): distributed operators vs
straightforward pandas/pure-Python reference implementations on
randomized inputs. Catches the edge cases hand-picked fixtures miss —
equal timestamps, empty groups, single-element arrays, all-duplicate
corpora.

Examples are deliberately small (Spark job per example); deadline is
disabled because executor scheduling jitter would trip it.
"""

from __future__ import annotations

import pytest

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from flink_orc_sink_spark.operators.dedup import _py_shingles
from flink_orc_sink_spark.operators.relational import asof_join, topk_per_group
from pyspark.sql import functions as F

# slow tier: hypothesis sweeps vs reference implementations — excluded from the default (driver) gate, see pytest.ini
pytestmark = pytest.mark.slow

# derandomize: CI replays the same example corpus every run — a gate
# run can never flake on a fresh random draw (exploration happens when
# a developer temporarily flips it off).
SETTINGS = settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=1, max_value=3)
times = st.integers(min_value=0, max_value=50)
vals = st.integers(min_value=0, max_value=1000)


@st.composite
def asof_inputs(draw):
    left = draw(
        st.lists(st.tuples(keys, times), min_size=1, max_size=12, unique=True)
    )
    right = draw(
        st.lists(st.tuples(keys, times, vals), min_size=0, max_size=12,
                 unique_by=lambda r: (r[0], r[1]))
    )
    return left, right


def _ref_asof(left, right, direction):
    """Pure-Python as-of reference: per left row, scan all right rows."""
    out = {}
    for k, t in left:
        cands = [(rt, v) for rk, rt, v in right if rk == k]
        back = max(((rt, v) for rt, v in cands if rt <= t), default=None)
        fwd = min(((rt, v) for rt, v in cands if rt >= t), default=None)
        if direction == "backward":
            pick = back
        elif direction == "forward":
            pick = fwd
        else:  # nearest, backward-biased ties
            if back is None:
                pick = fwd
            elif fwd is None:
                pick = back
            else:
                pick = back if (t - back[0]) <= (fwd[0] - t) else fwd
        out[(k, t)] = pick[1] if pick else None
    return out


@given(asof_inputs(), st.sampled_from(["backward", "forward", "nearest"]))
@SETTINGS
def test_asof_join_matches_reference(spark, inputs, direction):
    left, right = inputs
    ldf = spark.createDataFrame(left, "k long, t long")
    rdf = spark.createDataFrame(
        right or [(99, 99, 0)], "k long, t long, v long"
    )
    got = {
        (r.k, r.t): r.v
        for r in asof_join(
            ldf, rdf,
            left_on="k", right_on="k",
            left_time="t", right_time="t",
            right_value_cols=["v"],
            direction=direction,
        ).collect()
    }
    assert got == _ref_asof(left, right or [(99, 99, 0)], direction)


@given(
    st.lists(st.tuples(keys, vals, st.integers(0, 10**6)), min_size=1,
             max_size=20, unique_by=lambda r: r[2]),
    st.integers(min_value=1, max_value=4),
)
@SETTINGS
def test_topk_per_group_matches_pandas(spark, rows, k):
    df = spark.createDataFrame(rows, "g long, v long, id long")
    got = sorted(
        (r.g, r.v, r.id)
        for r in topk_per_group(
            df, ["g"], [F.col("v").desc(), F.col("id").asc()], k
        ).collect()
    )
    pdf = pd.DataFrame(rows, columns=["g", "v", "id"])
    pdf = pdf.sort_values(["v", "id"], ascending=[False, True])
    expected = sorted(
        pdf.groupby("g").head(k).itertuples(index=False, name=None)
    )
    assert got == expected


@given(
    st.lists(st.text(alphabet="ab ", min_size=0, max_size=30), max_size=6),
)
@SETTINGS
def test_exact_dedup_keeps_one_per_normalized_text(spark, texts):
    from flink_orc_sink_spark.operators.dedup import dedup_exact

    rows = [(i, t) for i, t in enumerate(texts)] or [(0, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    survivors = dedup_exact(df, "doc_id", "text").collect()
    norm = lambda s: " ".join(s.lower().split())
    groups: dict[str, int] = {}
    for i, t in rows:
        groups.setdefault(norm(t), i)  # min doc_id = first (ids ascend)
    assert sorted(r.doc_id for r in survivors) == sorted(groups.values())


@given(st.lists(st.sampled_from(["wa", "wb", "wc", "wd"]), max_size=12),
       st.integers(min_value=1, max_value=4))
@SETTINGS
def test_py_shingles_reference(spark, toks, k):
    got = _py_shingles(toks, k)
    if len(toks) >= k:
        expected = {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}
    else:
        expected = {" ".join(toks)}
    assert got == expected


@given(st.binary(max_size=256))
@settings(max_examples=300, deadline=None, derandomize=True)
def test_parse_media_dims_total_on_arbitrary_bytes(raw):
    """The header parser is TOTAL: any byte string yields a 5-tuple
    (no exception, no negative dims), since at 100 TB some blobs WILL
    be corrupt and a decode stage must classify, not crash."""
    from flink_orc_sink_spark.operators.multimodal import parse_media_dims

    fmt, w, h, sr, dur = parse_media_dims(raw)
    assert fmt in (None, "png", "gif", "wav", "jpeg", "video/mp4")
    for v in (w, h, sr):
        assert v is None or v >= 0


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=200, deadline=None, derandomize=True)
def test_plant_parse_roundtrip_any_id(mid):
    from flink_orc_sink_spark.operators.multimodal import (
        parse_media_dims,
        plant_media_blob,
    )

    fmt, w, h, sr, dur = parse_media_dims(plant_media_blob(mid))
    assert fmt == ("png", "gif", "wav", "jpeg")[mid % 4]
    if fmt == "wav":
        rate = 8000 + (mid % 8) * 1000
        data = (mid % 64 + 1) * 32
        assert (sr, dur) == (rate, data * 1000 // (rate * 2))
    else:
        assert (w, h) != (None, None)


cdc_rows = st.lists(
    st.tuples(
        keys,                                      # k
        st.integers(min_value=0, max_value=30),    # seq
        st.sampled_from(["U", "D"]),               # op
        vals,                                      # v
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda r: (r[0], r[1]),
)


@given(rows=cdc_rows)
@SETTINGS
def test_cdc_latest_state_matches_reference(spark, rows):
    from flink_orc_sink_spark.operators.relational import cdc_latest_state

    df = spark.createDataFrame(rows, "k long, seq long, op string, v long")
    got = {
        (r.k, r.seq, r.v, r.n_changes)
        for r in cdc_latest_state(df, ["k"], ["seq"]).collect()
    }
    want = set()
    by_key: dict = {}
    for k, seq, op, v in rows:
        by_key.setdefault(k, []).append((seq, op, v))
    for k, ch in by_key.items():
        seq, op, v = max(ch)
        if op != "D":
            want.add((k, seq, v, len(ch)))
    assert got == want


@given(rows=st.lists(
    st.tuples(keys, st.integers(min_value=0, max_value=30),
              st.sampled_from(["a", "b", "c"])),
    min_size=1, max_size=15, unique_by=lambda r: (r[0], r[1]),
))
@SETTINGS
def test_scd2_history_matches_reference(spark, rows):
    from flink_orc_sink_spark.operators.relational import scd2_history

    df = spark.createDataFrame(rows, "k long, ts long, attr string")
    got = {
        (r.k, r.attr, r.version, r.effective_from, r.effective_to,
         r.is_current)
        for r in scd2_history(df, ["k"], "attr", "ts").collect()
    }
    want = set()
    by_key: dict = {}
    for k, ts, attr in rows:
        by_key.setdefault(k, []).append((ts, attr))
    for k, ch in by_key.items():
        ch.sort()
        ivals = [
            (ts, attr) for i, (ts, attr) in enumerate(ch)
            if i == 0 or ch[i - 1][1] != attr
        ]
        for i, (ts, attr) in enumerate(ivals):
            nxt = ivals[i + 1][0] if i + 1 < len(ivals) else None
            want.add((k, attr, i + 1, ts, nxt, nxt is None))
    assert got == want
    # invariant: intervals per key are non-overlapping and ordered
    for k, ch in by_key.items():
        spans = sorted(
            (f, t) for kk, _, _, f, t, _ in got if kk == k
        )
        for (f1, t1), (f2, _) in zip(spans, spans[1:]):
            assert t1 == f2


def test_symspell_blocking_has_no_false_negatives():
    """Property: any two strings within Levenshtein distance 2 share
    a ≤2-deletion variant — the guarantee that makes the SymSpell
    candidate join exact. Checked against a brute-force DP
    Levenshtein on random short strings."""
    import itertools
    import random

    def lev(a: str, b: str) -> int:
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    def variants(x: str, d: int) -> set:
        seen, frontier = {x}, {x}
        for _ in range(d):
            nxt = set()
            for w in frontier:
                for i in range(len(w)):
                    nxt.add(w[:i] + w[i + 1:])
            nxt -= seen
            seen |= nxt
            frontier = nxt
        return seen

    rng = random.Random(7)
    words = [
        "".join(rng.choice("abc") for _ in range(rng.randint(1, 7)))
        for _ in range(120)
    ]
    checked = 0
    for a, b in itertools.combinations(set(words), 2):
        if lev(a, b) <= 2:
            assert variants(a, 2) & variants(b, 2), (a, b)
            checked += 1
    assert checked > 50  # the corpus actually exercises the property


def _ref_dup_spans(docs: list[tuple[int, str]], n: int):
    """Brute-force reference: literal n-gram strings, global
    occurrence counting, per-doc island merge."""
    from collections import Counter

    toks = {d: t.lower().split() for d, t in docs}
    grams: dict[int, list[str]] = {
        d: [" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)]
        for d, tk in toks.items()
        if len(tk) >= n
    }
    counts = Counter(g for gs in grams.values() for g in gs)
    spans = set()
    for d, gs in grams.items():
        marked = [i for i, g in enumerate(gs) if counts[g] >= 2]
        start = prev = None
        for p in marked:
            if start is None:
                start = prev = p
            elif p > prev + n:
                spans.add((d, start, prev + n - 1))
                start = prev = p
            else:
                prev = p
        if start is not None:
            spans.add((d, start, prev + n - 1))
    return spans


@given(
    st.lists(
        st.lists(
            st.sampled_from(["wa", "wb", "wc", "wd", "we"]),
            min_size=0,
            max_size=14,
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=4),
)
@SETTINGS
def test_dup_ngram_spans_matches_reference(spark, token_lists, n):
    """dup_ngram_spans == the brute-force literal-string reference on
    random corpora — duplicated grams within AND across docs, empty
    docs, docs shorter than n, all-duplicate corpora."""
    from flink_orc_sink_spark.operators.dedup import dup_ngram_spans

    docs = [(i, " ".join(tks)) for i, tks in enumerate(token_lists)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc, r.span_start, r.span_end)
        for r in dup_ngram_spans(df, "doc_id", "text", n=n).collect()
    }
    assert got == _ref_dup_spans(docs, n)


def _ref_cut_docs(docs: list[tuple[int, str]], n: int):
    """Brute-force keep-first excision reference: literal grams,
    global (doc, pos) occurrence order, coverage removal."""
    from collections import defaultdict

    toks = {d: t.lower().split() for d, t in docs}
    occs: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for d in sorted(toks):
        tk = toks[d]
        for i in range(len(tk) - n + 1):
            occs[" ".join(tk[i : i + n])].append((d, i))
    removed: dict[int, set[int]] = defaultdict(set)
    for lst in occs.values():
        if len(lst) >= 2:
            for d, i in lst[1:]:
                removed[d].update(range(i, i + n))
    return {
        d: (
            " ".join(t for i, t in enumerate(tk) if i not in removed[d]),
            len(tk) - len(removed[d]),
            len(removed[d]),
        )
        for d, tk in toks.items()
    }


@given(
    st.lists(
        st.lists(
            st.sampled_from(["wa", "wb", "wc", "wd", "we"]),
            min_size=0,
            max_size=14,
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=4),
)
@SETTINGS
def test_cut_dup_spans_matches_reference(spark, token_lists, n):
    """cut_dup_spans == the brute-force keep-first reference on random
    corpora — exact-dup docs collapse to '', the globally-first
    occurrence survives, short/empty docs pass through whole."""
    from flink_orc_sink_spark.operators.dedup import cut_dup_spans

    docs = [(i, " ".join(tks)) for i, tks in enumerate(token_lists)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc: (r.clean_text, r.n_kept, r.n_removed)
        for r in cut_dup_spans(df, "doc_id", "text", n=n).collect()
    }
    assert got == _ref_cut_docs(docs, n)
