"""Dump ``explain("formatted")`` of named queries to files — the
before/after plan evidence an optimization round commits under
``plans/r{N}/``.

Usage:
    python tools/dump_plans.py --out plans/r13 --suffix _after q1 q2 ...

Run it from a pre-change worktree (with PYTHONPATH pointing there) for
the ``_before`` side. Queries run against sf0.01 (same as
tools/gen_plans.py): plan SHAPE is scale-independent, and chained
queries (index build → probe) execute their side effects, so the dump
is cheap but real."""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from flink_orc_sink_spark.queries import all_queries
    from flink_orc_sink_spark.session import get_spark

    registry = all_queries()
    try:
        from flink_orc_sink_spark.queries.llm import BENCH_ONLY

        registry = {**registry, **BENCH_ONLY}
    except ImportError:
        pass
    try:
        from flink_orc_sink_spark.queries.engine import (
            BENCH_ONLY as ENGINE_BENCH,
        )

        registry = {**registry, **ENGINE_BENCH}
    except ImportError:
        pass

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("dump-plans")
    rc = 0
    for name in args.queries:
        fn = registry.get(name)
        if fn is None:
            print(f"unknown query: {name}", file=sys.stderr)
            rc = 1
            continue
        df = fn(spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(main())
