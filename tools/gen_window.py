"""Generate the driver-window ``_PRIORITY`` list (round-11 verdict #7).

The driver's correctness gate checks the FIRST 50 entries of
``all_queries()`` each round; the rotation discipline (prescribed by
the round-10/11 verdicts) is:

1. **changed-first** — every registry query whose implementation was
   touched since the last driver round goes at the front, so the gate
   re-verifies exactly the surfaces that moved;
2. **stalest-fill** — the remaining slots go to the queries whose
   last driver-green round (from the committed ``CORRECTNESS_r*.json``
   artifacts) is OLDEST, ties broken alphabetically, so cumulative
   freshness is maximized.

Until round 11 the window was hand-computed each round (and the r10
advice added only a typo guard); this tool makes it generated.

**Changed detection** maps ``git diff <base>..worktree`` over the
package to registry queries through a function-span index: a query is
"changed" when its own ``def``'s line span intersects a changed hunk,
or — transitively — when any package function whose span intersects
the diff is reachable from the query by name reference (the marker
propagates from changed defs to every def that references them, to a
fixed point). Module-level hunks are attributed to the top-level
STATEMENT they land in: a changed assignment marks its target name
(propagating to every def that references it); a changed pair inside
a top-level dict literal with string keys (the QUERIES/ORACLES
registries) marks exactly the named query — so registering a new
query does NOT mark its 60 module siblings (the r12 lesson: the two
approx-twin registrations flagged 125 queries under the old
whole-module rule, displacing the stale rotation entirely); changed
imports or unattributable module-level hunks still mark the whole
module. Over-inclusion is safe (it spends window slots re-verifying
an unchanged query); silent omission is the failure mode this tool
exists to prevent. ``queries/__init__.py`` itself is excluded — the
window rotation is not a behavior change.

**Reproducibility contract** (what the unit test asserts): the
stale-fill section is a pure function of the committed
``CORRECTNESS_r01..r{basis}.json`` files and the recorded changed
set, both of which ``queries/__init__.py`` pins next to ``_PRIORITY``
(``_WINDOW_BASIS``, ``_WINDOW_CHANGED_COUNT``). ``--check`` re-derives
the fill from those pins and fails on any hand-edit that breaks the
discipline.

Usage:
    python tools/gen_window.py --base <commit>     # emit the window
    python tools/gen_window.py --check             # verify HEAD's one
"""

from __future__ import annotations

import argparse
import ast
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "flink_orc_sink_spark")
WINDOW = 50


def last_green_rounds(up_to: int | None = None) -> dict[str, int]:
    """{query: newest round with a driver-green CORRECTNESS entry}.
    Green = rows_match and (hash_match true, or absent for the
    rows-only no-oracle checks). Queries never in any window map to
    0 — maximally stale."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if up_to is not None and rnd > up_to:
            continue
        with open(path) as f:
            data = json.load(f)
        for name, res in data.items():
            if not isinstance(res, dict):
                continue
            if res.get("rows_match") and res.get("hash_match") in (
                True,
                None,
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def _diff_ranges(base: str) -> dict[str, list[tuple[int, int]]]:
    """{repo-relative path: [(new_start, new_end), ...]} of the
    new-side hunks in ``git diff base`` over the package (worktree
    included, so an uncommitted rework still rotates the window)."""
    txt = subprocess.run(
        ["git", "diff", "-U0", base, "--", "flink_orc_sink_spark"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    ranges: dict[str, list[tuple[int, int]]] = {}
    cur: str | None = None
    for line in txt.splitlines():
        if line.startswith("+++ b/"):
            cur = line[6:]
        elif line.startswith("@@") and cur:
            m = re.search(r"\+(\d+)(?:,(\d+))?", line)
            if m:
                start = int(m.group(1))
                count = int(m.group(2)) if m.group(2) is not None else 1
                # a pure deletion has count 0: mark the anchor line so
                # the enclosing def still registers as touched
                ranges.setdefault(cur, []).append(
                    (start, start + max(count, 1) - 1)
                )
    return ranges


def _def_index() -> list[dict]:
    """Every top-level (or class-nested) function in the package:
    {name, file, span, refs} where refs are the identifier names the
    def's body mentions (the cheap call-graph edge)."""
    defs: list[dict] = []
    for dirpath, _dirs, files in os.walk(PKG):
        if "__pycache__" in dirpath:
            continue
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, REPO)
            with open(path) as f:
                src = f.read()
            tree = ast.parse(src, filename=path)
            for node in ast.walk(tree):
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    refs = {
                        n.id
                        for n in ast.walk(node)
                        if isinstance(n, ast.Name)
                    } | {
                        n.attr
                        for n in ast.walk(node)
                        if isinstance(n, ast.Attribute)
                    }
                    defs.append(
                        {
                            "name": node.name,
                            "file": rel,
                            "span": (node.lineno, node.end_lineno or 0),
                            "refs": refs,
                        }
                    )
    return defs


def changed_queries(base: str, registry_names: list[str]) -> list[str]:
    """Registry queries affected by the diff since ``base``, via
    span-intersection + caller propagation (see module docstring)."""
    skip = os.path.join("flink_orc_sink_spark", "queries", "__init__.py")
    ranges = {
        f: rs for f, rs in _diff_ranges(base).items() if f != skip
    }
    if not ranges:
        return []
    defs = _def_index()

    def _touches(d: dict) -> bool:
        for lo, hi in ranges.get(d["file"], []):
            if lo <= d["span"][1] and hi >= d["span"][0]:
                return True
        return False

    marked = {(d["file"], d["name"]) for d in defs if _touches(d)}
    # module-level hunks (outside every def in that file) are
    # attributed to the top-level statement they intersect:
    #   Assign/AnnAssign  -> mark the target NAME (propagates below
    #                        to defs referencing it); for dict
    #                        literals with string keys (the registry
    #                        dicts) additionally mark exactly the
    #                        keys whose pair spans moved
    #   FunctionDef/Class -> covered by the def-span pass above
    #   anything else     -> whole-module fallback (imports etc.)
    by_file: dict[str, list[dict]] = {}
    for d in defs:
        by_file.setdefault(d["file"], []).append(d)
    changed_names: set[str] = {n for _f, n in marked}
    direct_marks: set[str] = set()  # registry query names hit by key
    # (file, query-key) -> identifier names its dict value references;
    # lets a changed SQL constant mark the oracle entries built on it
    pair_refs: list[tuple[str, set[str]]] = []
    for f, rs in ranges.items():
        fdefs = by_file.get(f, [])
        path = os.path.join(REPO, f)
        try:
            with open(path) as fh:
                tree = ast.parse(fh.read(), filename=path)
        except (OSError, SyntaxError):
            marked |= {(d["file"], d["name"]) for d in fdefs}
            continue
        top = list(tree.body)
        for stmt in top:
            if isinstance(stmt, (ast.Assign, ast.AnnAssign)):
                val = stmt.value
                if isinstance(val, ast.Dict):
                    for k, v in zip(val.keys, val.values):
                        if isinstance(k, ast.Constant) and isinstance(
                            k.value, str
                        ):
                            pair_refs.append(
                                (
                                    k.value,
                                    {
                                        n.id
                                        for n in ast.walk(v)
                                        if isinstance(n, ast.Name)
                                    },
                                )
                            )
        for lo, hi in rs:
            if any(
                d["span"][0] <= lo and hi <= d["span"][1] for d in fdefs
            ):
                continue  # inside a def: the span pass handled it
            hits = [
                s
                for s in top
                if s.lineno <= hi and (s.end_lineno or s.lineno) >= lo
            ]
            attributed = bool(hits)
            for stmt in hits:
                if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef,
                                     ast.ClassDef)):
                    continue  # def-span pass covers these
                if isinstance(stmt, (ast.Assign, ast.AnnAssign)):
                    targets = (
                        stmt.targets
                        if isinstance(stmt, ast.Assign)
                        else [stmt.target]
                    )
                    for t in targets:
                        for n in ast.walk(t):
                            if isinstance(n, ast.Name):
                                changed_names.add(n.id)
                    val = stmt.value
                    if isinstance(val, ast.Dict):
                        # precise per-key attribution inside registry
                        # dicts: only pairs whose own span moved
                        for k, v in zip(val.keys, val.values):
                            klo = (k or v).lineno
                            khi = v.end_lineno or v.lineno
                            if (
                                klo <= hi
                                and khi >= lo
                                and isinstance(k, ast.Constant)
                                and isinstance(k.value, str)
                            ):
                                direct_marks.add(k.value)
                elif isinstance(stmt, ast.Expr) and isinstance(
                    stmt.value, ast.Constant
                ):
                    continue  # docstring-only hunk: no behavior
                else:
                    attributed = False  # imports/if/etc: conservative
            if not attributed:
                marked |= {(d["file"], d["name"]) for d in fdefs}
                break
    # propagate changed -> callers by name reference, to fixed point
    while True:
        grew = False
        for d in defs:
            key = (d["file"], d["name"])
            if key in marked:
                continue
            if d["refs"] & changed_names:
                marked.add(key)
                changed_names.add(d["name"])
                grew = True
        if not grew:
            break
    # a registry-dict value (oracle SQL, wrapped callable) built on a
    # changed name marks its key even though the key's own pair span
    # did not move
    for qkey, refs in pair_refs:
        if refs & changed_names:
            direct_marks.add(qkey)
    # map to registry entries through the implementing callable
    import importlib
    import inspect

    sys.path.insert(0, REPO)
    entry = importlib.import_module("__spark_entry__")
    out: list[str] = []
    for qname in registry_names:
        if qname in direct_marks:
            out.append(qname)
            continue
        fn = entry.queries()[qname]
        fn = inspect.unwrap(fn)
        try:
            rel = os.path.relpath(inspect.getsourcefile(fn), REPO)
        except TypeError:
            continue
        if (rel, fn.__name__) in marked:
            out.append(qname)
    return out


def stale_fill(
    last_green: dict[str, int],
    registry_names: list[str],
    exclude: set[str],
    slots: int,
) -> list[str]:
    pool = [n for n in registry_names if n not in exclude]
    pool.sort(key=lambda n: (last_green.get(n, 0), n))
    return pool[:slots]


def build_window(
    base: str, basis: int | None = None, front: list[str] | None = None
) -> tuple[list[str], list[str]]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    names = list(entry.queries())
    changed = sorted(changed_queries(base, names))
    if front:
        missing = [n for n in front if n not in set(changed)]
        if missing:
            raise SystemExit(
                f"--front names not in the changed set: {missing}"
            )
    if len(changed) > WINDOW:
        # Round 13: when two rounds of central-helper churn mark more
        # queries than the window holds, keep the STALEST changed
        # queries (oldest driver-green round, ties alphabetical) —
        # the same estimator the fill uses — instead of the
        # alphabetical head, which systematically starves late-
        # alphabet families (pyds_*, stream_*) of driver re-
        # verification. ``front`` (the verdict's explicitly named
        # must-recheck queries, recorded in the round doc) leads the
        # section regardless of staleness. Deterministic from the
        # committed CORRECTNESS artifacts plus the recorded front
        # list.
        green = last_green_rounds(basis)
        head = list(front or [])
        rest = sorted(
            (n for n in changed if n not in set(head)),
            key=lambda n: (green.get(n, 0), n),
        )
        print(
            f"warning: {len(changed)} changed queries exceed the "
            f"{WINDOW}-slot window; {len(head)} fronted + stalest"
            f" {WINDOW - len(head)} kept, the rest rely on the"
            " full-registry CHECKLOG gate",
            file=sys.stderr,
        )
        changed = sorted(head) + sorted(rest[: WINDOW - len(head)])
    fill = stale_fill(
        last_green_rounds(basis), names, set(changed), WINDOW - len(changed)
    )
    return changed, fill


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--base",
        default=None,
        help="git ref of the previous driver round's final commit",
    )
    ap.add_argument(
        "--rounds-up-to",
        type=int,
        default=None,
        help="use CORRECTNESS artifacts only up to this round",
    )
    ap.add_argument(
        "--front",
        default=None,
        help="comma-separated query names that must lead the changed"
        " section (verdict-prescribed must-recheck list); only"
        " meaningful when the changed set overflows the window",
    )
    ap.add_argument(
        "--check",
        action="store_true",
        help="verify the committed _PRIORITY against its recorded"
        " basis pins (reproducible: no git diff involved)",
    )
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from flink_orc_sink_spark import queries as reg

    if args.check:
        basis = getattr(reg, "_WINDOW_BASIS", None)
        k = getattr(reg, "_WINDOW_CHANGED_COUNT", None)
        if basis is None or k is None:
            print("no _WINDOW_BASIS/_WINDOW_CHANGED_COUNT pins — window"
                  " predates gen_window; nothing to check")
            return 1
        import __spark_entry__ as entry

        names = list(entry.queries())
        pri = list(reg._PRIORITY)
        changed, front = set(pri[:k]), pri[:k]
        want_fill = stale_fill(
            last_green_rounds(basis), names, changed, WINDOW - k
        )
        if pri[k:] != want_fill:
            print("DISCIPLINE VIOLATION: stale-fill section diverges from")
            print(f"  expected: {want_fill}")
            print(f"  actual:   {pri[k:]}")
            return 1
        print(
            f"window OK: {k} changed-first + {WINDOW - k} stalest"
            f" (basis r{basis}); fill reproduces exactly"
        )
        return 0

    if not args.base:
        ap.error("--base required unless --check")
    front = (
        [n for n in args.front.split(",") if n] if args.front else None
    )
    changed, fill = build_window(args.base, args.rounds_up_to, front)
    print(f"# changed since {args.base} ({len(changed)}):")
    for n in changed:
        print(f'    "{n}",')
    print(f"# stalest fill ({len(fill)}):")
    for n in fill:
        print(f'    "{n}",')
    print(
        f"# pins: _WINDOW_BASIS = <round>, _WINDOW_CHANGED_COUNT ="
        f" {len(changed)}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
