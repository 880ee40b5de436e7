"""Bench regression gate against the pinned baseline.

Reads a fresh bench artifact from stdin (or a file given as argv[1])
— either ``BENCH_DETAIL.json`` (the per-query map; preferred, and
followed automatically when the input carries a ``detail_file``
pointer next to this repo) or a raw ``bench.py`` headline line (which
since r9 carries the same ``calibration_first_sec``/``_last_sec``
keys; older lines' 2-element ``calib`` array is also accepted). When
only the headline line is available the gate runs on per-FAMILY sums,
not per-query. It compares against the pinned baseline
(``BENCH_PIN_r10.json`` by default — the round-10 clean exclusive run
with all three calibration probes and per-query telemetry; override
with argv[2] or $SPARK_GRAFT_BENCH_BASELINE). Fails (exit 1) if any overlapping query
— or the total — is more than ``THRESHOLD``× slower than the
baseline. Queries absent from the baseline are reported but never
fail the gate (new coverage is not a regression).

Host-vs-code adjudication (round 11): baseline probes use the MIN of
their before/after pair (an aged pin probe must not mask fresh-run
drift); per-query normalization by the matching path probe's drift;
a raw >threshold regression absorbed by normalization prints a
masked-by-normalization warning; FAIL lines cite the nearest
family-boundary mini-probe sample and the query's own hypervisor
steal%; and when 100% of failures kept their pin job counts the
HOST-DEGRADATION line fires (naming drifted probes, or saying the
probes were inconclusive, plus the failing queries' median steal).

``--certify`` additionally judges pin quality: exit 0 only when the
gate is clean AND no probe drifted vs the pin AND none moved mid-run
AND hypervisor steal stayed <2% — the mechanical re-pin criteria
(round-10 verdict #7).

Usage:
    python bench.py | tail -1 | python tools/bench_regression.py
    python tools/bench_regression.py [--certify] fresh.json [baseline.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

THRESHOLD = 1.5
# Documented non-regressions: baseline entries that measure an OLD
# implementation deliberately replaced since that pin (see BASELINE.md
# caveats). Keyed BY BASELINE FILE so a re-pin (which measures the new
# implementation) automatically re-arms the gate for these queries.
WAIVED_BY_BASELINE = {
    "BENCH_PIN_r06.json": {
        "emb_semantic_dedup": "round-7 swap to the value-oracled"
        " fixed-point-k-means + join form (BASELINE.md caveat)",
    },
    # BENCH_PIN_r08.json measures the current implementations on an
    # idle host with calibration embedded: no waivers.
    "BENCH_PIN_r08.json": {},
    # BENCH_PIN_r09.json: the round-9 clean run after the LSM
    # delta-log rework of the retract/CDC/SCD2 sinks and the
    # per-micro-batch fixed-cost cuts (stream family 119.6 -> 102.3 s,
    # total 248.6 -> 218.8 s at comparable calibration): no waivers.
    "BENCH_PIN_r09.json": {},
    # BENCH_PIN_r10.json: the round-10 clean exclusive run at HEAD —
    # first pin with all three calibration probes AND full per-query
    # telemetry (job counts / GC / block-I/O / worker CPU), measuring
    # the salted-hash index appenders and the distributed
    # contamination-bloom build: no waivers. (Round 11 replaced its
    # stream_index_forget_ingest headline entry with the four
    # stream_fidx_* phase entries — those appear as 'new', and the
    # retired lifecycle entry simply stops being compared.)
    "BENCH_PIN_r10.json": {},
    # BENCH_PIN_r11.json: the composite pin assembled from per-family
    # chunks each certified inside its own verified window
    # (tools/assemble_pin.py; round-11 verdict #1): no waivers.
    "BENCH_PIN_r11.json": {},
}
# Ignore regressions on queries faster than this in the baseline:
# sub-300ms timings on a warm local[32] JVM are scheduler noise.
MIN_BASE_SEC = 0.3
# ... and require a real absolute cost on top of the ratio: repeated
# clean runs on this VM show ±35% jitter on sub-second queries
# (q1: 0.87s vs 1.20s back-to-back, identical code), so a ratio alone
# flags noise. A genuine regression must cost absolute wall time.
MIN_DELTA_SEC = 0.75
# Calibration drift beyond this means the fresh run was host-contended
# (or the pin was) — normalize per-query times by the drift instead of
# hand-adjudicating phantom regressions (round-6/7 pattern).
CALIB_DRIFT = 1.3

# Static fallback path classification by family, used only when the
# BASELINE artifact carries no per-query telemetry (pre-r10 pins).
# With telemetry present, the path is derived from measured
# Python-worker CPU and JVM block-I/O instead (see _query_path).
FAMILY_PATH = {
    "multimodal": "python",
    "pyds": "python",
    "emb": "python",
    "stream": "io",
    "orc": "io",
}


def _family(name: str) -> str:
    return (
        "tpch"
        if name[0] == "q" and len(name) > 1 and name[1].isdigit()
        else name.split("_")[0]
    )


def _probe_means(d: dict, agg: str = "mean") -> dict[str, float]:
    """{path: probe sec} from either artifact form — the detail
    file's probes_first/probes_last dicts or the headline line's
    probes {path: [first, last]}. The legacy JVM-only calibration keys
    feed the 'jvm' entry when no probes block exists.

    ``agg`` is "mean" for the FRESH run (both samples describe the run
    being judged) and "min" for the BASELINE (round-10 verdict #1: the
    pin's end-of-run probe carries documented in-session aging — its
    python pair was 0.55/2.28 s — and averaging it into the base
    inflates the denominator so real fresh-run drift never crosses the
    threshold; the pin's min is its start-of-run health)."""
    out: dict[str, float] = {}
    # both aggregators take a LIST: a legacy baseline with only
    # calibration_first_sec, or a probe pair with one non-positive
    # entry, yields a single-element list, and min(1.5) would raise
    # TypeError exactly on the older pins this fallback supports
    pick = min if agg == "min" else (lambda v: sum(v) / len(v))
    pf, pl = d.get("probes_first"), d.get("probes_last")
    if isinstance(pf, dict) and isinstance(pl, dict):
        for k in pf:
            if k in pl and pf[k] > 0 and pl[k] > 0:
                out[k] = pick([pf[k], pl[k]])
    elif isinstance(d.get("probes"), dict):
        for k, pair in d["probes"].items():
            vals = [v for v in pair if isinstance(v, (int, float)) and v > 0]
            if vals:
                out[k] = pick(vals)
    if "jvm" not in out:
        legacy = _calib_pair(d)
        vals = [v for v in legacy if isinstance(v, (int, float)) and v > 0]
        if vals:
            out["jvm"] = pick(vals)
    return out


def _query_path(name: str, base_tel: dict | None) -> str:
    """Which probe normalizes this query: measured classification from
    the pin's telemetry when available (Python-worker CPU ≥ 20% of
    wall or any worker spawn → python; JVM block-I/O ≥ 20 MB or
    ≥ 10 MB/s → io), else the family fallback, else jvm. Queries on
    the state-backed runtimes (stream_*/orc_*) whose telemetry shows
    neither Python nor heavy bytes still classify io: their state
    snapshots + checkpoint fsyncs are small in BYTES but their
    run-to-run jitter tracks filesystem health (measured: jobs-flat
    walls 4.9-8.5 s on stream_interval_join while the io probe
    drifted), and page-cache hits hide their reads from /proc io."""
    fam_prior = FAMILY_PATH.get(_family(name), "jvm")
    if base_tel:
        wall_ms = max(base_tel.get("sec", 0.0), 0.001) * 1000
        py_ms = base_tel.get("py_cpu_ms", 0) or 0
        if py_ms >= max(200, 0.2 * wall_ms) or (
            base_tel.get("py_spawns", 0) or 0
        ) > 0:
            return "python"
        mb = max(base_tel.get("jvm_rd_mb", 0) or 0, 0) + max(
            base_tel.get("jvm_wr_mb", 0) or 0, 0
        )
        if mb >= 20 or mb / (wall_ms / 1000) >= 10:
            return "io"
        # telemetry says neither python- nor byte-heavy: keep the io
        # family prior (state-backed runtime), otherwise jvm
        return "io" if fam_prior == "io" else "jvm"
    return fam_prior


def _near_probe_note(path: str, t0, fam_probes: list) -> str:
    """Cite the family-boundary mini-probe sample nearest to a flagged
    query (round-10 verdict #2): a transient host stall mid-run (the
    13 s events_hourly_anomaly with flat jobs) is localized by a probe
    from its own neighborhood instead of start/end pairs 300 s away.
    Compares the nearest sample to the run-median of that path's
    mini-probes — >1.3x above median means the flagged query ran in a
    locally degraded window."""
    if t0 is None or not fam_probes:
        return ""
    vals = sorted(
        s[path] for s in fam_probes if isinstance(s.get(path), (int, float))
    )
    if not vals:
        return ""
    # statistics.median, not vals[len//2]: the upper-middle element of
    # an even-length sample biases toward the slower probe and shifts
    # the >1.3x "local host stall" callout near the threshold
    median = statistics.median(vals)
    near = min(
        (s for s in fam_probes if isinstance(s.get(path), (int, float))),
        key=lambda s: abs(s.get("t", 0.0) - t0),
    )
    note = (
        f" [near-probe {path} {near[path]:.2f}s @t={near.get('t', 0):.0f}s"
        f" vs run-median {median:.2f}s"
    )
    if median > 0 and near[path] / median > CALIB_DRIFT:
        note += " — local host stall"
    return note + "]"


def _calib_pair(d: dict) -> tuple[float | None, float | None]:
    cf = d.get("calibration_first_sec")
    cl = d.get("calibration_last_sec")
    if cf is None and cl is None and isinstance(d.get("calib"), list):
        pair = (d["calib"] + [None, None])[:2]
        cf, cl = pair[0], pair[1]
    return cf, cl


def _newest_pin() -> str:
    """Default baseline: the highest-round BENCH_PIN_r*.json at the
    repo root — a freshly assembled pin re-arms the gate without a
    code edit (the stale default was round-11 verdict residual #2:
    every round judged against an aged pin accumulates adjudication
    debt)."""
    import glob
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pins = []
    for p in glob.glob(os.path.join(root, "BENCH_PIN_r*.json")):
        m = re.search(r"_r(\d+)\.json$", p)
        if m:
            pins.append((int(m.group(1)), p))
    if not pins:
        return os.path.join(root, "BENCH_PIN_r10.json")
    return max(pins)[1]


def load_baseline(path: str) -> dict:
    with open(path) as f:
        raw = json.load(f)
    # Driver artifacts wrap the parsed line under "parsed"; a raw
    # bench.py line is already the flat object.
    return raw.get("parsed") or raw


def main() -> int:
    # --certify: also judge whether this run QUALIFIES AS A NEW PIN
    # (round-10 verdict #7 made re-pin criteria explicit; this makes
    # them mechanical): exit 0 under --certify only when the gate is
    # clean AND no probe drifted vs the pin AND no probe moved
    # mid-run AND hypervisor steal stayed <2% — i.e. a run another
    # round can be judged against without adjudication.
    argv = [a for a in sys.argv[1:] if a != "--certify"]
    certify = "--certify" in sys.argv[1:]
    if argv:
        with open(argv[0]) as f:
            fresh = json.load(f)
    else:
        fresh = json.loads(sys.stdin.read().strip().splitlines()[-1])
    # bench.py's printed line now carries per-FAMILY sums plus a
    # pointer to the full per-query map; follow it for the real gate.
    if "detail_file" in fresh:
        detail_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            fresh["detail_file"],
        )
        if os.path.exists(detail_path):
            with open(detail_path) as f:
                fresh = json.load(f)

    base_path = (
        argv[1]
        if len(argv) > 1
        else os.environ.get("SPARK_GRAFT_BENCH_BASELINE") or _newest_pin()
    )
    base = load_baseline(base_path)
    waived = WAIVED_BY_BASELINE.get(os.path.basename(base_path), {})

    # --- contention detection: the in-artifact calibration probes ---
    # bench.py runs three fixed probes (jvm CPU, python worker/Arrow,
    # ORC file-I/O) before and after the headline loop; their wall
    # times move with host health along each path, not with repo code.
    # When a fresh probe drifts past the pin's, queries ON THAT PATH
    # are scaled back by the drift before gating — regressions must
    # survive normalization to count. The r9 failure mode (JVM probe
    # clean at 1.00x while Python-worker families inflated 4-6x) is
    # exactly what per-path probes make visible and per-path
    # normalization absorbs.
    fresh_probes = _probe_means(fresh, "mean")
    base_probes = _probe_means(base, "min")
    unhealthy: list[str] = []
    host_steal = fresh.get("host_steal_pct")
    if isinstance(host_steal, (int, float)) and host_steal >= 2.0:
        print(
            f"note: hypervisor steal {host_steal:.1f}% across the run —"
            " the physical host ran others while this guest had"
            " runnable vCPUs (external contention, not repo code)"
        )
        unhealthy.append(f"hypervisor steal {host_steal:.1f}%")
    pin_problems: list[str] = []
    if certify:
        # Certification criteria are SHARED with the composite-chunk
        # path (tools/assemble_pin.py::certify_chunk): steal measured
        # and <2%, probe-pair MINs within drift of the baseline's
        # floor, and loop stability judged on the interior
        # family-boundary mini-probes (the pair endpoints carry this
        # VM's documented ramp/aging artifacts; pair movement is the
        # fallback only when fewer than two minis exist). A driver
        # run that lands in a healthy window therefore certifies
        # mechanically and can become the next pin as-is.
        import assemble_pin

        pin_problems = assemble_pin.certify_chunk(fresh, base_probes)
        missing = {"jvm", "python", "io"} - set(base_probes)
        if missing:
            pin_problems.append(
                f"pin artifact missing probe(s) {sorted(missing)}"
            )
    path_scale: dict[str, float] = {}
    for p in sorted(set(fresh_probes) & set(base_probes)):
        drift = fresh_probes[p] / base_probes[p]
        if drift > CALIB_DRIFT:
            path_scale[p] = 1.0 / drift
            unhealthy.append(f"{p} probe drifted {drift:.2f}x vs pin")
            print(
                f"CONTENTION DETECTED [{p}]: probe {fresh_probes[p]:.2f}s "
                f"vs pinned {base_probes[p]:.2f}s ({drift:.2f}x) — "
                f"normalizing {p}-path queries by {1 / drift:.3f}"
            )
        elif drift < 1.0 / CALIB_DRIFT:
            print(
                f"note: probe [{p}] {fresh_probes[p]:.2f}s vs pinned "
                f"{base_probes[p]:.2f}s ({drift:.2f}x) — pin looks "
                f"contended on this path"
            )
    if fresh_probes and not base_probes:
        print(
            f"note: fresh probes {fresh_probes}; baseline "
            f"{os.path.basename(base_path)} has none — no normalization"
        )
    # mid-run drift warning on EVERY probe pair in the fresh run —
    # the r9 failure mode degrades python/io specifically, so a
    # jvm-only check would miss exactly the paths that matter
    fpf, fpl = fresh.get("probes_first"), fresh.get("probes_last")
    if isinstance(fpf, dict) and isinstance(fpl, dict):
        for p in sorted(set(fpf) & set(fpl)):
            a, b = fpf[p], fpl[p]
            if a and b and max(a, b) / min(a, b) > CALIB_DRIFT:
                unhealthy.append(f"{p} probe moved mid-run")
                print(
                    f"CONTENTION WARNING: [{p}] probe moved mid-run "
                    f"({a:.2f}s -> {b:.2f}s) — normalization is "
                    f"approximate; re-run on an idle host to confirm"
                )
    else:
        cf, cl = _calib_pair(fresh)
        if cf and cl and max(cf, cl) / min(cf, cl) > CALIB_DRIFT:
            print(
                f"CONTENTION WARNING: jvm calibration moved mid-run "
                f"({cf:.2f}s -> {cl:.2f}s) — normalization is "
                f"approximate; re-run on an idle host to confirm"
            )

    # legacy fallback: ONLY queries whose path has no probe pair in
    # both artifacts use the jvm drift (the pre-r10 behavior). A path
    # whose own probe pair exists and measured NO drift must scale
    # 1.0 — falling back to the jvm drift there would normalize (and
    # mask) a genuine regression on a path the probes proved healthy.
    default_scale = path_scale.get("jvm", 1.0)
    measured_paths = set(fresh_probes) & set(base_probes)

    fresh_tel = fresh.get("telemetry") or {}
    base_tel = base.get("telemetry") or {}
    fam_probes = fresh.get("family_probes") or []

    failures: list[str] = []
    scaled_by: dict[str, float] = {}
    qpath: dict[str, str] = {}
    fq: dict[str, float] = {}
    scale_src: dict[str, str] = {}
    for n, s in fresh["queries"].items():
        p = _query_path(n, base_tel.get(n))
        qpath[n] = p
        if p in measured_paths:
            sc = path_scale.get(p, 1.0)
            scale_src[n] = p
        else:
            sc = default_scale
            # the query's own path had no probe pair in both
            # artifacts: the legacy jvm drift did the scaling, and
            # any message must blame THAT, not the unmeasured path
            scale_src[n] = "jvm (legacy fallback)"
        scaled_by[n] = sc
        fq[n] = s * sc
    bq = base["queries"]
    for name, sec in sorted(fq.items()):
        if name not in bq:
            print(f"new  {name}: {sec:.3f}s (no baseline)")
            continue
        raw = fresh["queries"][name]
        ratio = sec / bq[name] if bq[name] > 0 else float("inf")
        status = "ok  "
        if (
            ratio > THRESHOLD
            and bq[name] >= MIN_BASE_SEC
            and sec - bq[name] >= MIN_DELTA_SEC
        ):
            if name in waived:
                status = "WAIV"
            else:
                status = "FAIL"
                failures.append(name)
        # plan-shape check: identical Spark job counts vs the pin
        # mean the plan didn't change — a wall regression with flat
        # jobs and a drifted path probe is host, not code
        note = ""
        ft, bt = fresh_tel.get(name), base_tel.get(name)
        if ft and bt and ft.get("jobs", -1) >= 0 and bt.get("jobs", -1) >= 0:
            if ft["jobs"] != bt["jobs"]:
                note = f" [jobs {bt['jobs']}->{ft['jobs']}]"
            elif status == "FAIL":
                note = f" [jobs flat at {ft['jobs']}]"
        if scaled_by.get(name, 1.0) != 1.0:
            note += f" [norm x{scaled_by[name]:.3f}]"
        if status == "FAIL":
            note += _near_probe_note(
                qpath[name], (ft or {}).get("t0"), fam_probes
            )
            steal = (ft or {}).get("steal_pct", -1.0)
            if isinstance(steal, (int, float)) and steal >= 1.0:
                # hypervisor steal during THIS query's window: the
                # guest-external contention proof (an idle guest with
                # steal >0 was descheduled by the physical host)
                note += f" [steal {steal:.0f}%]"
        print(
            f"{status} {name}: {sec:.3f}s vs {bq[name]:.3f}s "
            f"({ratio:.2f}x){note}"
        )
        # A drifted-probe normalization that absorbed a would-be FAIL
        # must not be silent (round-10 advice): the judge sees what
        # the scaling ate and can re-run that query on a healthy host.
        raw_ratio = raw / bq[name] if bq[name] > 0 else float("inf")
        if (
            status == "ok  "
            and scaled_by.get(name, 1.0) != 1.0
            and raw_ratio > THRESHOLD
            and bq[name] >= MIN_BASE_SEC
            and raw - bq[name] >= MIN_DELTA_SEC
        ):
            print(
                f"     masked-by-normalization: {name} raw "
                f"{raw:.3f}s ({raw_ratio:.2f}x) scaled to ok by the "
                f"drifted [{scale_src[name]}] probe — host suspected, "
                f"not proven; re-run on an idle host to confirm"
            )

    overlap_total_fresh = sum(s for n, s in fq.items() if n in bq)
    overlap_total_base = sum(bq[n] for n in fq if n in bq)
    if overlap_total_base > 0:
        total_ratio = overlap_total_fresh / overlap_total_base
        print(
            f"total (overlap): {overlap_total_fresh:.1f}s vs"
            f" {overlap_total_base:.1f}s ({total_ratio:.2f}x)"
        )
        if total_ratio > THRESHOLD:
            failures.append("__total__")
    else:
        # no shared names (e.g. family sums vs a per-query pin):
        # nothing comparable — say so rather than inventing a failure
        print("total (overlap): no overlapping queries with baseline")

    if failures:
        # One-glance host-vs-code adjudication for the judge: when
        # every per-query failure kept its pin job count (plan
        # unchanged) and at least one calibration probe pair drifted
        # past the contention threshold, the failures are host-path
        # degradation the point-sample probes under-normalized — the
        # r9 driver scenario. Still exit 1 (a slower same-plan
        # implementation also keeps job counts flat), but say so.
        q_fail = [f for f in failures if f != "__total__"]
        jobs_flat = [
            f
            for f in q_fail
            if fresh_tel.get(f, {}).get("jobs", -1) >= 0
            and fresh_tel[f].get("jobs") == base_tel.get(f, {}).get("jobs")
        ]
        drifted = sorted(
            p
            for p in set(fresh_probes) & set(base_probes)
            if fresh_probes[p] / base_probes[p] > CALIB_DRIFT
        )
        if q_fail and len(jobs_flat) == len(q_fail):
            # Fire on 100% jobs-flat even when no probe pair crossed
            # the threshold (round-10 verdict #1: point-sample probes
            # can miss a transient mid-run stall entirely — the
            # jobs-flat evidence stands on its own; say which case).
            probe_clause = (
                f"probe path(s) {drifted} drifted >{CALIB_DRIFT}x"
                if drifted
                else "probes inconclusive (no pair crossed "
                f"{CALIB_DRIFT}x — a transient stall between samples "
                "would not register)"
            )
            steals = sorted(
                fresh_tel[f]["steal_pct"]
                for f in q_fail
                if isinstance(
                    fresh_tel.get(f, {}).get("steal_pct"), (int, float)
                )
                and fresh_tel[f]["steal_pct"] >= 0
            )
            if steals and statistics.median(steals) >= 2.0:
                probe_clause += (
                    f"; hypervisor steal median"
                    f" {statistics.median(steals):.0f}%"
                    f" (max {steals[-1]:.0f}%) during the failing"
                    " queries — contention is EXTERNAL to the guest"
                )
            print(
                f"HOST-DEGRADATION SUSPECTED: all {len(q_fail)} "
                f"failing queries have job counts identical to the pin "
                f"and {probe_clause} "
                f"— re-run on a healthy host before treating as a code "
                f"regression"
            )
        print(f"REGRESSION: {failures}")
        if certify:
            print(
                "PIN-QUALITY: NOT CERTIFIED — "
                + "; ".join(pin_problems + [f"{len(failures)} FAIL(s)"])
            )
        return 1
    if certify:
        if pin_problems:
            print(
                "PIN-QUALITY: NOT CERTIFIED — " + "; ".join(pin_problems)
            )
            return 1
        print(
            "PIN-QUALITY: CERTIFIED — gate clean, probe floor within"
            " drift of the pin, measured loop stable (interior"
            " mini-probes), hypervisor steal <2%"
        )
    print("bench regression gate: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
