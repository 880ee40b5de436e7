"""ORC type round-trip + partition layout (SURVEY.md §5 items 2-3).

Covers the ten reference types (``OrcSchema.java:45-57``) including
nulls through write_orc → read_orc, with the §1.4 fixes asserted:
booleans actually work (broken in ``RowOrcWriter.java:76-81``) and
SHORT survives values > 127 (the reference narrows to tinyint).
"""

from __future__ import annotations

import datetime
from decimal import Decimal

from flink_orc_sink_spark.schema import make_schema, orc_struct_string, to_ddl
from flink_orc_sink_spark.sources.orc_sink import read_orc, write_orc

FIELDS = [
    "f_bool", "f_byte", "f_short", "f_int", "f_long",
    "f_float", "f_double", "f_string", "f_dec", "f_ts",
]
TYPES = [
    "boolean", "byte", "short", "int", "long",
    "float", "double", "string", "big_dec", "sql_timestamp",
]

ROW_FULL = (
    True, 7, 1000, 42, 1 << 40,
    1.5, 2.25, "hello", Decimal("12345.6789"),
    datetime.datetime(2024, 1, 2, 3, 4, 5),
)
ROW_NULLS = (None,) * 10


def test_make_schema_ten_types():
    schema = make_schema(FIELDS, TYPES)
    assert len(schema.fields) == 10
    assert all(f.nullable for f in schema.fields)
    assert "f_short SMALLINT" in to_ddl(schema)  # §1.4: not tinyint
    assert orc_struct_string(schema).startswith("struct<f_bool:boolean")


def test_orc_round_trip_with_nulls(spark, tmp_path):
    schema = make_schema(FIELDS, TYPES)
    df = spark.createDataFrame([ROW_FULL, ROW_NULLS], schema)
    out = str(tmp_path / "roundtrip_orc")
    write_orc(df, out)
    back = read_orc(spark, out)
    assert back.schema == schema
    rows = sorted(back.collect(), key=lambda r: (r.f_int is None, r.f_int))
    full, nulls = rows[0], rows[1]
    assert full.f_bool is True  # §1.4: boolean write works
    assert full.f_short == 1000  # §1.4: no tinyint narrowing
    assert full.f_dec == Decimal("12345.6789")
    assert full.f_ts == ROW_FULL[9]
    assert all(v is None for v in nulls)


def test_partition_layout_hive_style(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "part string, v int"
    )
    out = tmp_path / "part_orc"
    write_orc(df, str(out), partition_cols=["part"])
    # Hive-style k=v dirs, the reference's bucket layout
    # (RowOrcBucketingSink.java:41,111)
    assert (out / "part=a").is_dir() and (out / "part=b").is_dir()
    back = read_orc(spark, str(out))
    assert back.count() == 3
    assert {r.part for r in back.select("part").distinct().collect()} == {"a", "b"}


def test_orc_readable_by_independent_reader(spark, tmp_path):
    """Warehouse-readability parity (README.md:13,17 — Hive reads the
    reference's output): an independent ORC reader (pyarrow) must read
    our files."""
    import pyarrow.orc as pa_orc

    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string")
    out = tmp_path / "interop_orc"
    write_orc(df, str(out), compression="zstd")
    files = [p for p in out.iterdir() if p.name.startswith("part-")]
    assert files
    total = sum(pa_orc.ORCFile(str(p)).read().num_rows for p in files)
    assert total == 2


def test_sort_within_partitions_clusters_stripes(spark, tmp_path):
    """sort_within_partitions orders rows inside each ORC file so
    stripe min/max stats can prune time-range scans."""
    import pyarrow.orc as pa_orc

    df = spark.range(0, 10_000).selectExpr(
        "id", "cast(10000 - id as long) as ts_key"
    ).repartition(4)
    out = tmp_path / "sorted_orc"
    write_orc(df, str(out), sort_within_partitions=["ts_key"])
    files = [p for p in out.iterdir() if p.name.startswith("part-")]
    assert files
    for p in files:
        col = pa_orc.ORCFile(str(p)).read(columns=["ts_key"])["ts_key"]
        vals = col.to_pylist()
        assert vals == sorted(vals), f"{p.name} not clustered on ts_key"


def test_write_orc_table_registers_partitions(spark):
    from pyspark.sql import functions as F

    from flink_orc_sink_spark.sources.catalog import table
    from flink_orc_sink_spark.sources.orc_sink import write_orc_table

    e = table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "dt", F.to_date("ts")
    )
    spark.sql("DROP TABLE IF EXISTS events_orc_tbl")
    write_orc_table(e, "events_orc_tbl", partition_cols=["dt"])
    try:
        back = spark.table("events_orc_tbl")
        assert back.count() == e.count()
        n_parts = spark.sql("SHOW PARTITIONS events_orc_tbl").count()
        n_days = e.select("dt").distinct().count()
        assert n_parts == n_days > 0
        # catalog reports it as an ORC table
        desc = {
            r.col_name: r.data_type
            for r in spark.sql("DESCRIBE TABLE EXTENDED events_orc_tbl").collect()
        }
        assert "orc" in desc.get("Provider", "").lower()
    finally:
        spark.sql("DROP TABLE IF EXISTS events_orc_tbl")
