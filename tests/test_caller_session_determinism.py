"""Caller-session determinism: the driver runs queries under ITS OWN
plain SparkSession, in whatever JVM timezone the host has. Results
must match the (timezone-naive) DuckDB oracles regardless — the
catalog pins UTC + nanosAsLong at table load (sources/catalog.py).

This spawns a real subprocess (fresh JVM) with TZ=Asia/Tokyo and a
vanilla SparkSession.builder, and compares three timestamp-sensitive
queries to their oracles by the driver's own hash protocol.
"""

from __future__ import annotations

import pytest

import os
import subprocess
import sys

# slow tier: re-runs queries under a foreign-timezone subprocess —
# excluded from the default (driver) gate, see pytest.ini
pytestmark = pytest.mark.slow

SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tools!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
assert spark.conf.get("spark.sql.session.timeZone") == "Asia/Tokyo"
import duckdb
import __spark_entry__ as e
from check_correctness import frame_hash

qs, os_ = e.queries(), e.oracle_sql()
sf = "/root/testdata/sf0.001"
con = duckdb.connect()
for t in ("orders", "lineitem", "events", "embeddings", "documents"):
    con.sql(f"CREATE VIEW {{t}} AS SELECT * FROM '{{sf}}/{{t}}.parquet'")
for name in ("events_tumbling_hourly", "events_hourly_anomaly",
             "date_funcs_showcase", "events_bitmap_distinct_rollup",
             "events_cdc_apply", "events_scd2_status",
             "orc_incremental_agg",
             # round-3 timestamp-emitting additions
             "events_max_concurrency", "events_twap_daily",
             "events_sessionize_dynamic",
             # round-7 fixed-point / unrolled-SQL additions (no
             # timestamps, but their integer recipes must survive a
             # plain caller session too)
             "emb_pca_project", "emb_semantic_dedup",
             "docs_bpe_encode"):
    s = qs[name](spark, sf).toPandas()
    o = con.sql(os_[name]).df()
    assert len(s) == len(o), (name, len(s), len(o))
    assert frame_hash(s) == frame_hash(o), name
print("TOKYO_OK")
"""


def test_queries_deterministic_under_foreign_timezone():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, TZ="Asia/Tokyo")
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=repo, tools=os.path.join(repo, "tools"))],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert "TOKYO_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
