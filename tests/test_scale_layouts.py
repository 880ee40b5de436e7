"""Scale-layout operators: salted skew joins and bucketed co-located
joins — correctness plus the plan property that makes them worth it."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from flink_orc_sink_spark.operators.relational import salted_join
from flink_orc_sink_spark.sources.orc_sink import read_orc, write_orc_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key (90% of rows) + a tail
    left = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(k, 0) for k in range(2, 102)],
        "k long, v long",
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 102)], "k long, name string"
    )
    plain = (
        left.join(right, "k")
        .groupBy("k", "name")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    )
    salted = (
        salted_join(left, right, "k", salt_buckets=8)
        .groupBy("k", "name")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k long, x string")
    right = spark.createDataFrame([(1, "r1")], "k long, y string")
    got = {
        (r.k, r.x, r.y)
        for r in salted_join(left, right, "k", how="left", salt_buckets=4).collect()
    }
    assert got == {(1, "a", "r1"), (2, "b", None)}


def test_bucketed_join_has_no_exchange(spark):
    facts = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    dims = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    write_orc_bucketed(facts, "t_facts", ["k"], num_buckets=8, sort_by=["k"])
    write_orc_bucketed(dims, "t_dims", ["k"], num_buckets=8, sort_by=["k"])
    try:
        # disable auto-broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_facts").join(spark.table("t_dims"), "k")
        plan = _plan(joined)
        # co-located: bucketed scans satisfy the join distribution —
        # no shuffle exchange anywhere in the plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 100
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS t_facts")
        spark.sql("DROP TABLE IF EXISTS t_dims")


def test_orc_table_readable_from_files(spark):
    """Bucketed output is still plain ORC on disk (warehouse dir),
    readable by any ORC reader — the Hive-readability contract."""
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    write_orc_bucketed(df, "t_plain", ["k"], num_buckets=4)
    try:
        loc = (
            spark.sql("DESCRIBE TABLE EXTENDED t_plain")
            .filter("col_name = 'Location'")
            .collect()[0]
            .data_type
        )
        back = read_orc(spark, loc.replace("file:", ""))
        assert back.count() == 50
    finally:
        spark.sql("DROP TABLE IF EXISTS t_plain")


def test_zorder_layout_serves_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order vs linear sort on (o_custkey, o_orderdate): the linear
    layout clusters only its own sort column; the Z-order layout gives
    BOTH columns tight per-file ranges, so a range selection on either
    dimension touches a small fraction of the files."""
    from pyspark.sql import functions as F

    from flink_orc_sink_spark.sources.catalog import table
    from flink_orc_sink_spark.sources.orc_sink import write_orc_zordered

    o = table(spark, sf_dir, "orders")
    n_files = 16
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_orc_zordered(
        o, zpath, ["o_custkey", "o_orderdate"], n_files=n_files
    )
    (
        o.repartitionByRange(n_files, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.format("orc")
        .save(lpath)
    )

    lo, hi = o.agg(F.min("o_custkey"), F.max("o_custkey")).first()
    dlo, dhi = o.agg(F.min("o_orderdate"), F.max("o_orderdate")).first()
    k_hi = lo + (hi - lo) // 10          # 10% key range
    d_hi = dlo + (dhi - dlo) / 10        # 10% date range

    def files_touched(path, cond):
        return (
            spark.read.orc(path)
            .filter(cond)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    key_cond = F.col("o_custkey") <= k_hi
    date_cond = F.col("o_orderdate") <= F.lit(d_hi)

    # Z-order: BOTH dimensions cluster — a 10% range lives in a
    # minority of files on each axis.
    assert files_touched(zpath, key_cond) <= n_files // 2
    assert files_touched(zpath, date_cond) <= n_files // 2
    # Linear: its own column clusters tightly…
    assert files_touched(lpath, key_cond) <= 3
    # …but the other dimension scatters across essentially all files.
    assert files_touched(lpath, date_cond) >= n_files - 2
    # and the data survives the layout unchanged
    assert spark.read.orc(zpath).count() == o.count()


def test_minmax_index_prunes_file_opens(spark, sf_dir, tmp_path):
    """The external min/max index hands the reader only intersecting
    files: on a Z-ordered table a 10% key range admits a minority of
    the 16 files, and the pruned read returns exactly the full-scan
    filter's rows."""
    import glob

    from pyspark.sql import functions as F

    from flink_orc_sink_spark.sources.catalog import table
    from flink_orc_sink_spark.sources.orc_sink import (
        build_minmax_index,
        pruned_read,
        write_orc_zordered,
    )

    o = table(spark, sf_dir, "orders")
    data = str(tmp_path / "data")
    idx = str(tmp_path / "idx")
    write_orc_zordered(o, data, ["o_custkey", "o_orderdate"], n_files=16)
    build_minmax_index(spark, data, ["o_custkey"], idx)

    lo_k, hi_k = o.agg(F.min("o_custkey"), F.max("o_custkey")).first()
    lo, hi = lo_k, lo_k + (hi_k - lo_k) // 10

    admitted = (
        spark.read.parquet(idx)
        .filter(
            (F.col("o_custkey_max") >= lo) & (F.col("o_custkey_min") <= hi)
        )
        .count()
    )
    n_data_files = len(glob.glob(data + "/part-*"))
    assert n_data_files >= 8
    assert admitted <= n_data_files // 2  # the index actually skips

    got = pruned_read(spark, data, idx, "o_custkey", lo, hi)
    want = spark.read.orc(data).filter(
        (F.col("o_custkey") >= lo) & (F.col("o_custkey") <= hi)
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """Dynamic partition pruning: joining a partitioned fact table to
    a FILTERED dimension must prune fact partitions at RUNTIME from
    the dim-side join keys (the filter value isn't known at plan
    time). At 100 TB this is what keeps a star-join from scanning the
    whole fact table; the plan must carry a dynamicpruning subquery on
    the fact scan and the result must equal the unpruned join."""
    from pyspark.sql import functions as F

    from flink_orc_sink_spark.sources.catalog import table

    o = table(spark, sf_dir, "orders").withColumn(
        "m", F.date_format("o_orderdate", "yyyy-MM")
    )
    path = str(tmp_path / "fact")
    o.write.partitionBy("m").parquet(path)
    fact = spark.read.parquet(path)
    dim = o.select("m").distinct().filter(F.col("m") >= "1998-06")

    joined = fact.join(dim.hint("broadcast"), "m")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:4000]
    want = o.filter(F.col("m") >= "1998-06").count()
    assert joined.count() == want


def test_bloom_index_prunes_file_opens(spark, sf_dir, tmp_path):
    """Point lookup through the bloom file index must open a strict
    minority of hash-clustered files (each key lives in exactly one;
    false positives only add file opens, never lose rows) and return
    exactly the full-scan answer."""
    from pyspark.sql import functions as F

    from flink_orc_sink_spark.sources.catalog import table
    from flink_orc_sink_spark.sources.orc_sink import (
        bloom_pruned_read,
        build_bloom_index,
    )

    o = table(spark, sf_dir, "orders")
    data = str(tmp_path / "data")
    idx = str(tmp_path / "idx")
    o.repartition(8, "o_custkey").write.format("orc").save(data)
    build_bloom_index(spark, data, "o_custkey", idx)

    key = o.select("o_custkey").first().o_custkey
    got = bloom_pruned_read(spark, data, idx, "o_custkey", key)
    n_admitted = got.select(F.input_file_name()).distinct().count()
    n_total = (
        spark.read.orc(data)
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert n_total == 8
    # the key's rows live in ONE file; blooms may admit a couple more
    assert n_admitted <= 3
    want = sorted(
        r.o_orderkey
        for r in o.filter(F.col("o_custkey") == key)
        .select("o_orderkey")
        .collect()
    )
    have = sorted(r.o_orderkey for r in got.select("o_orderkey").collect())
    assert have == want and len(have) > 0

    # a key absent from the table: blooms must admit few files and
    # the exact filter must return nothing
    missing = bloom_pruned_read(spark, data, idx, "o_custkey", 10**12)
    assert missing.count() == 0


def test_bloom_probe_runs_on_executors(spark, sf_dir, tmp_path):
    """The bitset probe must be a pandas-UDF FILTER in the index read
    plan — bitsets probed and discarded executor-side — and the frame
    that reaches the driver must carry ONLY file names. Guards the
    scale property: index bytes grow with table cardinality (≈1.2
    bytes per distinct key), so collecting bitsets to the driver
    (the round-3 shape this replaced) would be a multi-GB pull per
    point lookup at 100 TB."""
    from flink_orc_sink_spark.sources.catalog import table
    from flink_orc_sink_spark.sources.orc_sink import (
        bloom_admitted_files,
        build_bloom_index,
    )

    o = table(spark, sf_dir, "orders")
    data = str(tmp_path / "data")
    idx = str(tmp_path / "idx")
    o.repartition(8, "o_custkey").write.format("orc").save(data)
    build_bloom_index(spark, data, "o_custkey", idx)

    key = o.select("o_custkey").first().o_custkey
    admitted = bloom_admitted_files(spark, idx, key)
    # only names cross the collect boundary
    assert admitted.columns == ["file"]
    plan = admitted._jdf.queryExecution().executedPlan().toString()
    # the probe is an Arrow-batched Python eval feeding a Filter,
    # upstream of the final name-only projection
    assert "ArrowEvalPython" in plan, plan[:4000]
    assert "Filter" in plan, plan[:4000]
    assert 1 <= admitted.count() <= 3


def test_index_append_file_count_bounded(spark, sf_dir, tmp_path):
    """One appended micro-batch must add O(cluster parallelism) data
    files to a persisted index, NOT O(tasks x bands) — the round-9
    advice: a plain (band, key) hash repartition interleaves every
    band across all shuffle tasks, so steady ingest compounds small
    files. The salted-hash appenders bound an append to
    <= bands x ceil(parallelism / bands) files (minhash/ahash) or
    <= n_buckets files (bm25)."""
    import os

    from flink_orc_sink_spark.operators.dedup import (
        MINHASH_BANDS,
        append_to_minhash_index,
        build_minhash_index,
    )
    from flink_orc_sink_spark.sources.catalog import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    idx = str(tmp_path / "mh_idx")
    build_minhash_index(docs.limit(50), "doc_id", "text", idx)

    def data_files(root):
        out = set()
        for dirpath, _d, files in os.walk(root):
            out |= {
                os.path.join(dirpath, f)
                for f in files
                if f.endswith(".parquet")
            }
        return out

    bands_dir = os.path.join(idx, "bands")
    before = data_files(bands_dir)
    batch = docs.filter("doc_id % 7 = 3").limit(40)
    append_to_minhash_index(batch, "doc_id", "text", idx)
    added = data_files(bands_dir) - before
    par = spark.sparkContext.defaultParallelism
    k = max(1, -(-par // MINHASH_BANDS))
    bound = MINHASH_BANDS * k
    assert 0 < len(added) <= bound, (len(added), bound)
