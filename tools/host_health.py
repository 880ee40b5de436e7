"""Pre-flight host-health check before a bench/pin run.

Samples hypervisor steal from /proc/stat for a few seconds and (with
--probes) runs one pass of bench.py's three calibration probes, then
prints a one-line verdict. Use before burning a ~6-minute sf0.1
bench run: on this VM the degraded windows (steal 5-12% while the
guest sits >90% idle) last tens of minutes and inflate same-plan
query walls 2-20× with flat Spark job counts — a run started inside
one can never certify as a pin (see BASELINE.md round-11 notes and
``tools/bench_regression.py --certify``).

Usage:
    python tools/host_health.py            # steal sample only (~6 s)
    python tools/host_health.py --probes   # + jvm/python/io probes

Exit 0 = healthy window (steal < 1.5%), 1 = degraded.
"""

from __future__ import annotations

import os
import sys
import time

STEAL_HEALTHY_PCT = 1.5
SAMPLE_SEC = 6

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import bench  # noqa: E402  (bench.py's imports are stdlib-only)


def steal_pct(seconds: int = SAMPLE_SEC) -> float | None:
    """% steal over ``seconds``; None where /proc/stat is unreadable
    (bench._cpu_ticks returns its (-1, -1) sentinel — one guarded
    implementation, not a second copy)."""
    s0, t0 = bench._cpu_ticks()
    time.sleep(seconds)
    s1, t1 = bench._cpu_ticks()
    if s0 < 0 or s1 < 0:
        return None
    return 100.0 * (s1 - s0) / max(t1 - t0, 1)


def main() -> int:
    pct = steal_pct()
    if pct is None:
        print(
            "hypervisor steal unmeasurable (/proc/stat unreadable) —"
            " treat as DEGRADED: a pin run could not certify anyway"
            " (bench_regression --certify requires measured steal)"
        )
        return 1
    verdict = "healthy" if pct < STEAL_HEALTHY_PCT else "DEGRADED"
    print(f"hypervisor steal over {SAMPLE_SEC}s: {pct:.1f}% — {verdict}")
    # The idle sample alone is BLIND on this VM: the hypervisor only
    # deschedules the guest when it runs (measured 2026-08-16: idle
    # 0.1% in the same minute the loaded sample read 6.8%), which is
    # how two round-11 "certified-at-idle" windows died mid-bench.
    # The loaded sample saturates the vCPUs with busy-loop children
    # while sampling — the same pre-flight bench.py --pin-intent uses.
    loaded = bench.loaded_steal_pct()
    if loaded >= 0:
        lverd = (
            "healthy" if loaded < STEAL_HEALTHY_PCT else "DEGRADED"
        )
        print(f"hypervisor steal UNDER LOAD: {loaded:.1f}% — {lverd}")
        pct = max(pct, loaded)
    if "--probes" in sys.argv[1:]:
        from flink_orc_sink_spark.session import get_spark

        spark = get_spark("host-health")
        bench.calibration_sec(spark)  # codegen warm-up
        bench.calibration_python_sec(spark)
        bench.calibration_io_sec(spark)
        s0, t0 = bench._cpu_ticks()  # sample the ACTUAL probe window
        probes = bench.run_probes(spark)
        s1, t1 = bench._cpu_ticks()
        print(
            "probes (min-of-2, warm): "
            + ", ".join(f"{k}={v:.2f}s" for k, v in probes.items())
        )
        pct2 = (
            100.0 * (s1 - s0) / max(t1 - t0, 1)
            if s0 >= 0 and s1 >= 0
            else None
        )
        print(
            f"steal during probes: "
            f"{'unmeasurable' if pct2 is None else f'{pct2:.1f}%'}"
            " — compare probe values against the pin's probes_first"
            " (BENCH_PIN_r10.json: jvm 0.94, python 0.55, io 0.62)"
        )
        if pct2 is None or pct2 >= STEAL_HEALTHY_PCT:
            print("verdict: DEGRADED (steal under load)")
            return 1
    return 0 if pct < STEAL_HEALTHY_PCT else 1


if __name__ == "__main__":
    sys.exit(main())
