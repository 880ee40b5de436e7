"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01, compares row count, column
names, and an order-insensitive value hash (columns sorted by name,
rows sorted, cells canonicalized). Prints one status line per query
and a final summary; exit code 1 if anything fails.

Usage: python tools/check_correctness.py [sf_dir] [query ...]

With ``--checklog`` (full-registry runs only), additionally rewrites
``CHECKLOG.md`` from the in-memory status lines and ASSERTS that
``n_ok + n_skip + n_fail == len(registry)`` — the round-3 log lost 16
pass lines to a copy-paste truncation and its footer contradicted its
body; generating the file from the same list the summary is computed
from makes that impossible.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd


def canon_cell(v) -> str:
    if v is None or v != v:  # NaN/None
        return "∅"
    if isinstance(v, float):
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def frame_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


CHECKLOG_HEADER = """# CHECKLOG — committed correctness-gate replica run

Full `tools/check_correctness.py --checklog` run at sf0.01 over the
ENTIRE registry (the driver's CORRECTNESS gate caps at the first 50
entries of `all_queries()`; this log covers every entry, including the
spill past the cap). This file is WRITTEN BY THE GENERATOR from the
same status list its own summary line is computed from, and the
generator asserts `n_ok + n_skip + n_fail == len(registry)` — so the
line count below cannot contradict the footer. SKIP rows are the
rows-only queries (approximate ANN/projection ops plus the BPE
encoder), each pytest-pinned.

"""


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--checklog"]
    write_checklog = "--checklog" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if write_checklog and only:
        raise SystemExit("--checklog requires a full-registry run (no query filter)")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry
    from flink_orc_sink_spark.session import get_spark
    from flink_orc_sink_spark.sources.catalog import TABLES

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, os_ = entry.queries(), entry.oracle_sql()
    n_pass = n_fail = n_skip = 0
    failures = []
    lines: list[str] = []

    def emit(s: str) -> None:
        print(s, flush=True)
        lines.append(s)

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            emit(f"ERR  {name}: spark: {type(exc).__name__}: {exc}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in os_:
            n_skip += 1
            emit(f"SKIP {name}: no oracle (rows={len(sdf)})")
            continue
        try:
            odf = con.sql(os_[name]).df()
        except Exception as exc:  # noqa: BLE001
            emit(f"ERR  {name}: duckdb: {type(exc).__name__}: {exc}")
            n_fail += 1
            failures.append(name)
            continue
        dt = time.time() - t0
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(
                f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"
            )
        if not problems and frame_hash(sdf) != frame_hash(odf):
            problems.append("value-hash mismatch")
        if problems:
            n_fail += 1
            failures.append(name)
            emit(f"FAIL {name}: {'; '.join(problems)}  ({dt:.1f}s)")
        else:
            n_pass += 1
            emit(f"ok   {name}  rows={len(sdf)}  ({dt:.1f}s)")
    summary = (
        f"{n_pass} pass, {n_skip} rows-only SKIP, {n_fail} fail"
        + (f": {failures}" if failures else "")
    )
    print(f"\n{summary}")

    if write_checklog:
        n_lines = n_pass + n_skip + n_fail
        assert n_lines == len(lines), (n_lines, len(lines))
        assert n_lines == len(qs), (
            f"status lines ({n_lines}) != registry size ({len(qs)}) — "
            f"refusing to write a CHECKLOG that undercounts the registry"
        )
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(repo, "CHECKLOG.md"), "w") as f:
            f.write(CHECKLOG_HEADER)
            f.write(f"Scale: {sf_dir}. Registry size: {len(qs)}.\n\n```\n")
            f.write("\n".join(lines))
            f.write(f"\n{summary}\n```\n")
        print(f"CHECKLOG.md written: {n_lines} status lines == registry {len(qs)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
