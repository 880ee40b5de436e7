"""Isolated, steal-stamped measurement of single headline queries.

Round-11 verdict #2: `docs_bm25_index_build` and `stream_dedup_ttl`
stayed >=2.2x their pin even in the judge's least-contended re-time
window — but that window itself measured 7.6% under-load steal, so
"host" remained likely, not proven. This tool produces the proof
artifact the verdict asked for: each query measured inside a window
whose health is verified IN the artifact.

Protocol per query (the judge's warm twice-run protocol, plus the
evidence): loaded-steal pre-flight (refuses a degraded window unless
--force), fresh session, standard bench warm-up, then the query runs
TWICE; each run carries its own wall, Spark job count, and /proc/stat
steal%; calibration probes (jvm/python/io) bracket the pair. The
MIN of the two runs is the reported number (same least-contended
estimator the probes use). Output: one JSON object per query on
stdout + appended to ISOLATION_LOG.jsonl for the BASELINE.md record.

Usage:
    python tools/isolate_query.py docs_bm25_index_build stream_dedup_ttl
    python tools/isolate_query.py --sf-dir /root/testdata/sf0.1 --force q1_pricing_summary
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument(
        "--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )
    ap.add_argument(
        "--runs", type=int, default=2, help="timed runs per query"
    )
    ap.add_argument(
        "--force",
        action="store_true",
        help="measure even when the loaded-steal pre-flight is"
        " degraded (the stamps still record it)",
    )
    ap.add_argument(
        "--log",
        default=os.path.join(REPO, "ISOLATION_LOG.jsonl"),
        help="append one JSON line per query here",
    )
    args = ap.parse_args()

    pre = bench.loaded_steal_pct()
    print(f"pre-flight loaded steal: {pre:.1f}%", file=sys.stderr)
    if pre >= bench.PIN_STEAL_MAX and not args.force:
        print(
            "degraded window — refusing to measure (use --force to"
            " record anyway)",
            file=sys.stderr,
        )
        return 2

    from flink_orc_sink_spark.queries import all_queries
    from flink_orc_sink_spark.queries.engine import (
        BENCH_ONLY as ENGINE_BENCH,
    )
    from flink_orc_sink_spark.queries.llm import BENCH_ONLY
    from flink_orc_sink_spark.session import get_spark

    queries = {**all_queries(), **BENCH_ONLY, **ENGINE_BENCH}
    unknown = [q for q in args.queries if q not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 1

    spark = get_spark("isolate")
    fams = {bench._family(q) for q in args.queries}
    bench.warm_session(spark, queries, args.sf_dir, families=fams)
    tel = bench.Telemetry(spark)

    results = []
    for name in args.queries:
        # chained bench-only entries (docs_bm25_index_probe etc.)
        # need their build; the caller lists it first — no implicit
        # dependency running here, the evidence must name every run
        probes_before = bench.run_probes(spark)
        runs = []
        for i in range(args.runs):
            before = tel.snap()
            t0 = time.time()
            queries[name](spark, args.sf_dir).count()
            wall = round(time.time() - t0, 3)
            after = tel.snap()
            d = tel.delta(before, after)
            runs.append(
                {
                    "wall_sec": wall,
                    "jobs": d["jobs"],
                    "steal_pct": d["steal_pct"],
                    "py_cpu_ms": d["py_cpu_ms"],
                }
            )
            for t in spark.catalog.listTables():
                if t.isTemporary:
                    spark.catalog.dropTempView(t.name)
            spark.catalog.clearCache()
        probes_after = bench.run_probes(spark)
        rec = {
            "query": name,
            "sf_dir": args.sf_dir,
            "pre_flight_loaded_steal_pct": pre,
            "runs": runs,
            "min_wall_sec": min(r["wall_sec"] for r in runs),
            "max_run_steal_pct": max(r["steal_pct"] for r in runs),
            "probes_before": probes_before,
            "probes_after": probes_after,
        }
        results.append(rec)
        print(json.dumps(rec))
        with open(args.log, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
