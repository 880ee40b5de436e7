"""Assemble a certified bench pin from per-family chunk artifacts.

Round-11 verdict #1: healthy host windows on this VM (<2% steal,
probes within drift of the healthy floor) are SHORTER than the
~8-minute monolithic bench — six full-run re-pin attempts failed
certification on external evidence. The fix is structural: run the
bench in per-family chunks (``bench.py --families ... --pin-intent
--out BENCH_CHUNK_x.json``), each inside its own verified window, and
assemble the pin from chunks that INDIVIDUALLY certify:

  * hypervisor steal measured and < 2% across the chunk run;
  * all three calibration probe pairs (jvm/python/io) present, with
    the pair MIN within 1.3x of the healthy reference floor (default:
    the previous pin's min-of-pair probes) — proof the host could run
    that path at floor during this window, and a consistently-SLOW
    window cannot certify just by being consistent;
  * the MEASURED LOOP itself stable: the run's family-boundary
    mini-probe samples (taken BETWEEN queries, where the measurement
    actually happens) all within 2x of the mini floor with a median
    within 1.4x. The full before/after pair alone cannot judge this —
    its endpoints sit OUTSIDE the loop and are systematically
    poisoned on this VM (a sustained-load ramp inflates the first
    pair: jvm 1.93->0.96 with 0.2% steal while every interior mini
    read healthy; in-session python-probe aging inflates the last
    pair: the r10 pin itself reads 0.55->2.28). Chunks with fewer
    than two mini samples fall back to pair movement <= 1.3x;
  * not aborted mid-run (``aborted_family`` absent).

Coverage must be exact: the union of certified chunk queries ==
bench.HEADLINE. When certified chunks overlap (partial artifacts from
aborted windows accumulate; a family may be re-captured), each query
takes its MIN across the certified samples — the same
least-contended estimator the probes (min-of-two) and the isolation
protocol (min-of-runs) use, applied uniformly to every query. The output artifact is gate-compatible (queries /
telemetry / probes_first / probes_last / host_steal_pct) plus a
``chunks`` provenance block recording each chunk's certification
evidence — the per-family certified-window proof the round-11 verdict
asked to see committed.

Merged probes are the ELEMENT-WISE MIN across chunks on each side:
the pin's probes represent the healthy floor the gate normalizes
against (it already aggregates baseline pairs with min — round-10
verdict #1), and each chunk proved its own window healthy, so the min
is the least-contended certified measurement, not cherry-picking.
host_steal_pct is the MAX across chunks (worst certified window).

Usage:
    python tools/assemble_pin.py BENCH_CHUNK_*.json --out BENCH_PIN_r11.json
    python tools/assemble_pin.py --status BENCH_CHUNK_*.json   # coverage report
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (HEADLINE, _family, PIN_STEAL_MAX)

CALIB_DRIFT = 1.3  # same line as tools/bench_regression.py
PROBE_PATHS = ("jvm", "python", "io")
# Healthy floors for the FAMILY-BOUNDARY mini-probes (bench.py
# ``mini_probe``: same probe bodies at ~10-20x smaller row counts, so
# they have their own scale). Medians of the interior samples across
# the certified-healthy stretches measured on this VM 2026-08-16
# (jvm 0.20-0.41, python 0.35-0.50, io 0.20-0.32 while steal read
# 0.1-0.2% and the queries matched or beat their pins raw).
MINI_FLOORS = {"jvm": 0.33, "python": 0.46, "io": 0.27}
MINI_MAX_X = 2.0  # no interior sample above this multiple of floor
MINI_MEDIAN_X = 1.4  # and the run's median must sit near the floor


def certify_chunk(chunk: dict, ref_probes: dict[str, float]) -> list[str]:
    """Reasons this chunk CANNOT certify (empty list = certified)."""
    import statistics

    problems: list[str] = []
    if not chunk.get("queries"):
        problems.append("no surviving queries (nothing to certify)")
    steal = chunk.get("host_steal_pct")
    if not (isinstance(steal, (int, float)) and steal >= 0):
        problems.append("hypervisor steal not measured")
    elif chunk.get("aborted_family"):
        # An aborted chunk is NOT rejected wholesale: the degraded
        # family's queries were already dropped at the boundary, and
        # partial coverage accumulates across windows instead of
        # being thrown away (the abort stays visible in provenance).
        # But the RUN-LEVEL steal includes the dropped family's
        # degradation, so the survivors are judged on their own
        # per-query steal stamps instead.
        tel = chunk.get("telemetry") or {}
        steals = [
            tel.get(q, {}).get("steal_pct", -1.0)
            for q in chunk.get("queries", {})
        ]
        if any(
            not isinstance(s, (int, float)) or s < 0 for s in steals
        ):
            problems.append(
                "aborted chunk: surviving queries lack steal stamps"
            )
        elif steals and max(steals) >= bench.PIN_STEAL_MAX:
            problems.append(
                f"aborted chunk: surviving query saw steal"
                f" {max(steals):.1f}% >= 2%"
            )
    elif steal >= bench.PIN_STEAL_MAX:
        problems.append(f"hypervisor steal {steal:.1f}% >= 2%")
    pf, pl = chunk.get("probes_first"), chunk.get("probes_last")
    if not (isinstance(pf, dict) and isinstance(pl, dict)):
        problems.append("probe pairs missing")
        return problems
    minis = chunk.get("family_probes") or []
    for p in PROBE_PATHS:
        a, b = pf.get(p), pl.get(p)
        if not (a and b and a > 0 and b > 0):
            problems.append(f"{p} probe pair missing/non-positive")
            continue
        # the pair MIN proves the host could run this path at floor
        # sometime during the window
        ref = ref_probes.get(p)
        if ref and min(a, b) / ref > CALIB_DRIFT:
            problems.append(
                f"{p} probe {min(a, b):.2f}s is"
                f" {min(a, b) / ref:.2f}x the healthy floor"
                f" ({ref:.2f}s) — consistently-slow window"
            )
        # interior stability: judged on the family-boundary minis
        # (taken where the measurement happens); the pair endpoints
        # sit outside the loop and carry the documented ramp/aging
        # artifacts of this VM
        samples = [
            s[p]
            for s in minis
            if isinstance(s.get(p), (int, float)) and s[p] > 0
        ]
        mfloor = MINI_FLOORS.get(p)
        if len(samples) >= 2 and mfloor:
            worst = max(samples)
            med = statistics.median(samples)
            if worst > MINI_MAX_X * mfloor:
                problems.append(
                    f"{p} interior mini-probe hit {worst:.2f}s"
                    f" ({worst / mfloor:.1f}x its {mfloor:.2f}s floor)"
                    " — transient stall inside the measured loop"
                )
            if med > MINI_MEDIAN_X * mfloor:
                problems.append(
                    f"{p} interior mini-probe median {med:.2f}s"
                    f" ({med / mfloor:.1f}x its {mfloor:.2f}s floor)"
                    " — loop ran degraded"
                )
        elif max(a, b) / min(a, b) > CALIB_DRIFT:
            # no interior evidence: fall back to pair movement
            problems.append(
                f"{p} probe moved mid-run ({a:.2f}s -> {b:.2f}s)"
                " and no interior mini-probe samples to adjudicate"
            )
    return problems


def _load(path: str) -> dict:
    with open(path) as f:
        raw = json.load(f)
    return raw.get("parsed") or raw


def _ref_probes(path: str) -> dict[str, float]:
    """Healthy floor: the reference pin's min-of-pair probes (the
    same aggregation the gate applies to baselines)."""
    base = _load(path)
    out: dict[str, float] = {}
    pf, pl = base.get("probes_first"), base.get("probes_last")
    if isinstance(pf, dict) and isinstance(pl, dict):
        for p in PROBE_PATHS:
            vals = [v for v in (pf.get(p), pl.get(p)) if v and v > 0]
            if vals:
                out[p] = min(vals)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("chunks", nargs="+", help="BENCH_CHUNK_*.json files")
    ap.add_argument("--out", default=None, help="pin file to write")
    ap.add_argument(
        "--ref-pin",
        default=os.path.join(REPO, "BENCH_PIN_r10.json"),
        help="pin whose min-of-pair probes define the healthy floor",
    )
    ap.add_argument(
        "--status",
        action="store_true",
        help="report per-chunk certification + remaining coverage,"
        " don't write",
    )
    ap.add_argument(
        "--allow-uncertified",
        action="store_true",
        help="assemble even with certification problems (for"
        " inspection only; the problems are still recorded)",
    )
    ap.add_argument(
        "--missing-tokens",
        action="store_true",
        help="print ONLY a comma list of bench.py --families tokens"
        " covering the queries certified chunks don't yet provide"
        " (empty line = coverage complete) — the chunk hunter's"
        " work-list interface",
    )
    args = ap.parse_args()
    if args.missing_tokens:
        # per-chunk reporting goes to stderr so stdout is exactly
        # the token list
        global print
        _stdout_print = print

        def print(*a, **k):  # noqa: A001
            k.setdefault("file", sys.stderr)
            _stdout_print(*a, **k)

    ref = _ref_probes(args.ref_pin)
    merged_q: dict[str, float] = {}
    merged_tel: dict[str, dict] = {}
    chunk_meta: list[dict] = []
    owner: dict[str, str] = {}
    pf_min: dict[str, float] = {}
    pl_min: dict[str, float] = {}
    steal_max = -1.0
    all_ok = True
    sf_val = None

    loaded: list[tuple[str, dict, list[str]]] = []
    for path in args.chunks:
        if args.missing_tokens and not os.path.exists(path):
            # a fresh hunt starts with ZERO chunks: the shell passes
            # the unexpanded glob literally, and crashing here made
            # the hunter's empty-stdout check read "coverage
            # complete" (round-13 fix) — skip so the full headline
            # token list prints instead
            print(f"{path}: no such chunk (skipped)")
            continue
        c = _load(path)
        name = os.path.basename(path)
        problems = certify_chunk(c, ref)
        loaded.append((name, c, problems))
    # stable processing order for deterministic output
    loaded.sort(key=lambda t: t[0])

    for name, c, problems in loaded:
        status = "CERTIFIED" if not problems else "NOT CERTIFIED"
        fams = sorted({bench._family(q) for q in c.get("queries", {})})
        aborted = c.get("aborted_family")
        print(
            f"{name}: {status} — families {','.join(fams) or '-'},"
            f" {len(c.get('queries', {}))} queries,"
            f" steal {c.get('host_steal_pct', 'n/a')}%"
            + (f" (partial: {aborted} aborted)" if aborted else "")
        )
        for p in problems:
            print(f"    - {p}")
        merge_this = not problems or args.allow_uncertified
        if problems:
            all_ok = False
        if not merge_this:
            continue
        if sf_val is None:
            sf_val = c.get("sf")
        elif c.get("sf") != sf_val:
            print(
                f"    - scale mismatch: {c.get('sf')} vs {sf_val}"
            )
            all_ok = False
        # Overlapping CERTIFIED chunks take the per-query MIN — the
        # same least-contended estimator the probes (min-of-two) and
        # the isolation protocol (min-of-runs) use, applied uniformly
        # to every query in both directions (never hand-picked).
        # Each chunk is an independent certified sample of the same
        # fixed workload; the min biases the pin LOW, i.e. the gate
        # STRICT — conservative for a baseline (the first assembly
        # pinned stream_scd2_apply's documented idle bounce at
        # 10.35 s where a second certified window measured 4.12 s).
        took = 0
        for q, sec in c.get("queries", {}).items():
            if q in owner and merged_q[q] <= sec:
                continue
            owner[q] = name
            merged_q[q] = sec
            took += 1
            if q in (c.get("telemetry") or {}):
                merged_tel[q] = c["telemetry"][q]
        if took < len(c.get("queries", {})):
            print(
                f"    ({took}/{len(c['queries'])} taken — rest had"
                " lower-wall samples in other certified chunks)"
            )
        pf, pl = c.get("probes_first") or {}, c.get("probes_last") or {}
        for p in PROBE_PATHS:
            if pf.get(p, 0) and pf[p] > 0:
                pf_min[p] = min(pf_min.get(p, pf[p]), pf[p])
            if pl.get(p, 0) and pl[p] > 0:
                pl_min[p] = min(pl_min.get(p, pl[p]), pl[p])
        if aborted:
            # run-level steal includes the dropped family's window;
            # the survivors' own stamps are the honest number
            tel = c.get("telemetry") or {}
            svals = [
                tel.get(q, {}).get("steal_pct", -1.0)
                for q in c.get("queries", {})
            ]
            svals = [s for s in svals if isinstance(s, (int, float))]
            if svals:
                steal_max = max(steal_max, max(svals))
        else:
            steal = c.get("host_steal_pct")
            if isinstance(steal, (int, float)):
                steal_max = max(steal_max, steal)
        chunk_meta.append(
            {
                "file": name,
                "families": fams,
                "n_queries": took,
                "host_steal_pct": c.get("host_steal_pct"),
                "aborted_family": aborted,
                "probes_first": c.get("probes_first"),
                "probes_last": c.get("probes_last"),
                "certified": not problems,
                "problems": problems,
            }
        )

    missing = [q for q in bench.HEADLINE if q not in merged_q]
    extra = [q for q in merged_q if q not in bench.HEADLINE]
    by_fam: dict[str, int] = {}
    for q in missing:
        by_fam[bench._family(q)] = by_fam.get(bench._family(q), 0) + 1
    if missing:
        print(
            f"coverage: {len(merged_q)}/{len(bench.HEADLINE)} — still"
            f" missing {dict(sorted(by_fam.items()))}"
        )
    else:
        print(f"coverage: complete ({len(merged_q)} headline queries)")
    if extra:
        print(f"note: {len(extra)} non-headline queries ignored: {extra}")
        for q in extra:
            merged_q.pop(q)
            merged_tel.pop(q, None)

    if args.missing_tokens:
        # contiguous within-family index runs as fam / fam:a:b tokens
        # (bench.select_headline's slice syntax); certified-chunk
        # abort drops are family-atomic and slices can't split
        # chains, so missingness is always token-expressible
        within: dict[str, int] = {}
        fam_missing: dict[str, list[int]] = {}
        fam_total: dict[str, int] = {}
        for q in bench.HEADLINE:
            fam = bench._family(q)
            i = within.get(fam, 0)
            within[fam] = i + 1
            fam_total[fam] = fam_total.get(fam, 0) + 1
            if q not in merged_q:
                fam_missing.setdefault(fam, []).append(i)
        toks = []
        for fam in sorted(fam_missing):
            idxs = fam_missing[fam]
            if len(idxs) == fam_total[fam]:
                toks.append(fam)
                continue
            run_start = prev = idxs[0]
            for i in idxs[1:] + [None]:
                if i is not None and i == prev + 1:
                    prev = i
                    continue
                toks.append(f"{fam}:{run_start}:{prev + 1}")
                if i is not None:
                    run_start = prev = i
        sys.stdout.write(",".join(toks) + "\n")
        return 0 if not missing else 1

    if args.status:
        return 0 if (all_ok and not missing) else 1
    if missing:
        print("NOT ASSEMBLED: coverage incomplete")
        return 1
    # uncertified files were already excluded from the merge (unless
    # --allow-uncertified); complete coverage from certified chunks
    # is assemblable even when junk attempts were also listed

    pin = {
        "metric": "headline_wall_sec",
        "value": round(sum(merged_q.values()), 3),
        "unit": "sec",
        "queries": merged_q,
        "telemetry": merged_tel,
        "probes_first": pf_min,
        "probes_last": pl_min,
        "host_steal_pct": steal_max,
        "calibration_first_sec": pf_min.get("jvm"),
        "calibration_last_sec": pl_min.get("jvm"),
        "sf": sf_val,
        "composite": True,
        "chunks": chunk_meta,
    }
    out = args.out or os.path.join(REPO, "BENCH_PIN_new.json")
    with open(out, "w") as f:
        json.dump(pin, f, indent=1, sort_keys=True)
    print(
        f"assembled {os.path.basename(out)}: {len(merged_q)} queries,"
        f" total {pin['value']:.1f}s, probes floor {pf_min},"
        f" worst chunk steal {steal_max:.1f}%"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
