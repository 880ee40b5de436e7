"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01, compares row count, column
names, and an order-insensitive value hash (columns sorted by name,
rows sorted, cells canonicalized). Prints one status line per query
and a final summary; exit code 1 if anything fails.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

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
    n_pass = n_fail = 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: spark: {type(exc).__name__}: {exc}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in os_:
            print(f"SKIP {name}: no oracle (rows={len(sdf)})")
            continue
        try:
            odf = con.sql(os_[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: duckdb: {type(exc).__name__}: {exc}")
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
            print(f"FAIL {name}: {'; '.join(problems)}  ({dt:.1f}s)")
        else:
            n_pass += 1
            print(f"ok   {name}  rows={len(sdf)}  ({dt:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail" + (f": {failures}" if failures else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
