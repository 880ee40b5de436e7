"""Unit tests for tools/gen_window.py — the driver-window generator
(round-11 verdict #7: the rotation discipline must be generated and
asserted, not hand-computed).

No SparkSession needed: these exercise the pure parts (stale-fill
reproducibility against the committed CORRECTNESS artifacts, and the
changed-detection's per-dict-key attribution via a monkeypatched
diff), so the whole file runs in ~2 s.
"""

from __future__ import annotations

import ast
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import gen_window  # noqa: E402


@pytest.fixture(scope="module")
def registry_names():
    import __spark_entry__ as entry

    return list(entry.queries())


def test_committed_window_reproduces_discipline(registry_names):
    """The committed _PRIORITY must equal changed-first (as pinned by
    _WINDOW_CHANGED_COUNT) + stale_fill from the pinned basis — the
    exact invariant `gen_window --check` enforces, asserted here so
    plain pytest catches a hand-edit too."""
    from flink_orc_sink_spark import queries as reg

    basis = reg._WINDOW_BASIS
    k = reg._WINDOW_CHANGED_COUNT
    pri = list(reg._PRIORITY)
    assert len(pri) == gen_window.WINDOW
    assert len(set(pri)) == len(pri), "window has duplicates"
    want_fill = gen_window.stale_fill(
        gen_window.last_green_rounds(basis),
        registry_names,
        set(pri[:k]),
        gen_window.WINDOW - k,
    )
    assert pri[k:] == want_fill


def test_stale_fill_orders_by_last_green_then_name():
    last = {"b": 3, "a": 3, "z": 1, "never": 0}
    names = ["a", "b", "z", "never", "other"]
    # "other" absent from last -> 0 (maximally stale), ties by name
    got = gen_window.stale_fill(last, names, set(), 4)
    assert got == ["never", "other", "z", "a"]
    # exclusion removes from the pool, not just the front
    got = gen_window.stale_fill(last, names, {"never"}, 4)
    assert got == ["other", "z", "a", "b"]


def _pair_span(path: str, dict_name: str, key: str) -> tuple[int, int]:
    """(lineno, end_lineno) of one key/value pair inside a top-level
    dict assignment — the span a one-entry registration diff covers."""
    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    for stmt in tree.body:
        if not isinstance(stmt, ast.Assign):
            continue
        if not any(
            isinstance(t, ast.Name) and t.id == dict_name
            for t in stmt.targets
        ):
            continue
        if not isinstance(stmt.value, ast.Dict):
            continue
        for k, v in zip(stmt.value.keys, stmt.value.values):
            if isinstance(k, ast.Constant) and k.value == key:
                return k.lineno, v.end_lineno or v.lineno
    raise AssertionError(f"{dict_name}[{key!r}] not found in {path}")


def test_registry_dict_hunk_marks_only_its_key(
    monkeypatch, registry_names
):
    """A diff that touches exactly ONE pair of the module-level
    QUERIES dict must mark exactly that query — not the ~60 module
    siblings (the r12 over-inclusion bug: two registrations flagged
    125 queries and displaced the stale rotation entirely)."""
    rel = os.path.join("flink_orc_sink_spark", "queries", "events.py")
    span = _pair_span(
        os.path.join(REPO, rel), "QUERIES", "events_rfm_segments_approx"
    )
    monkeypatch.setattr(
        gen_window, "_diff_ranges", lambda base: {rel: [span]}
    )
    changed = gen_window.changed_queries("IGNORED", registry_names)
    assert changed == ["events_rfm_segments_approx"]


def test_changed_assignment_propagates_to_referencing_defs(
    monkeypatch, registry_names
):
    """A module-level hunk on a plain constant assignment marks the
    queries whose defs (or oracle-dict values) reference that name —
    and nothing else wholesale."""
    rel = os.path.join("flink_orc_sink_spark", "queries", "events.py")
    path = os.path.join(REPO, rel)
    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    target = None
    for stmt in tree.body:
        if isinstance(stmt, ast.Assign) and any(
            isinstance(t, ast.Name) and t.id == "RFM_APPROX_SQL"
            for t in stmt.targets
        ):
            target = (stmt.lineno, stmt.lineno)  # first line is enough
    assert target, "RFM_APPROX_SQL constant not found"
    monkeypatch.setattr(
        gen_window, "_diff_ranges", lambda base: {rel: [target]}
    )
    changed = gen_window.changed_queries("IGNORED", registry_names)
    # the oracle dict maps events_rfm_segments_approx to this
    # constant, so the query must re-verify; the module's other ~60
    # queries must NOT be dragged in
    assert "events_rfm_segments_approx" in changed
    assert len(changed) < 10


def test_module_fallback_still_fires_for_imports(
    monkeypatch, registry_names
):
    """An unattributable module-level hunk (the import block) keeps
    the conservative whole-module marking: silent omission is the
    failure mode this tool exists to prevent."""
    rel = os.path.join("flink_orc_sink_spark", "queries", "events.py")
    path = os.path.join(REPO, rel)
    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    imp = next(
        s for s in tree.body if isinstance(s, (ast.Import, ast.ImportFrom))
    )
    monkeypatch.setattr(
        gen_window,
        "_diff_ranges",
        lambda base: {rel: [(imp.lineno, imp.lineno)]},
    )
    changed = gen_window.changed_queries("IGNORED", registry_names)
    # every events-module registry query marks changed
    n_events_queries = sum(
        1 for n in registry_names if n.startswith("events_")
    )
    assert len(changed) >= n_events_queries
