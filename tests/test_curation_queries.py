"""Semantic invariants for the curation / sequence-analytics queries.

The DuckDB oracle gate checks value equality; these assert the
*properties* a pipeline relies on (monotone funnel stages, token
conservation in packing, sample determinism, survivor accounting) —
the guarantees that must keep holding at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_orc_sink_spark.functions.text import token_count
from flink_orc_sink_spark.queries.events import (
    events_daily_retention,
    events_funnel_3step,
)
from flink_orc_sink_spark.queries.llm import (
    docs_contamination,
    docs_hash_sample,
    docs_neardup_survivors,
    docs_pack_sequences,
    docs_repetition_ratio,
)
from flink_orc_sink_spark.sources.catalog import table


def test_funnel_stages_monotone(spark, sf_dir):
    row = events_funnel_3step(spark, sf_dir).collect()[0]
    assert row.n_view >= row.n_view_click >= row.n_view_click_purchase
    assert row.n_view > 0


def test_retention_day0_equals_cohort_size(spark, sf_dir):
    ret = events_daily_retention(spark, sf_dir)
    # day 0 exists for every cohort (first-active day is active) and
    # no offset is negative.
    day0 = ret.filter(F.col("day_offset") == 0)
    cohorts = ret.select("cohort_ts").distinct()
    assert day0.count() == cohorts.count()
    assert ret.filter(F.col("day_offset") < 0).count() == 0


def test_pack_sequences_conserves_tokens(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    expected = (
        d.select(F.sum(token_count("text")).alias("t")).collect()[0].t
    )
    packs = docs_pack_sequences(spark, sf_dir)
    got = packs.select(F.sum("seq_tokens").alias("t")).collect()[0].t
    assert got == expected
    # seq ids start at 0 per source
    firsts = packs.groupBy("source").agg(F.min("seq_id").alias("m"))
    assert firsts.filter(F.col("m") != 0).count() == 0


def test_hash_sample_deterministic_fraction(spark, sf_dir):
    s1 = {r.doc_id for r in docs_hash_sample(spark, sf_dir).collect()}
    s2 = {r.doc_id for r in docs_hash_sample(spark, sf_dir).collect()}
    assert s1 == s2  # rerun-stable, unlike df.sample
    n_total = table(spark, sf_dir, "documents").count()
    assert 0.02 <= len(s1) / n_total <= 0.25  # ~10% with small-SF slack


def test_contamination_only_train_docs(spark, sf_dir):
    cont = docs_contamination(spark, sf_dir)
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    joined = cont.join(d, "doc_id")
    assert joined.filter(F.col("source") == "src0").count() == 0
    assert cont.filter(F.col("n_shared_shingles") < 1).count() == 0


def test_survivor_accounting(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    survivors = docs_neardup_survivors(spark, sf_dir)
    n_total, n_surv = d.count(), survivors.count()
    assert 0 < n_surv <= n_total
    # survivors are a subset of the corpus
    assert survivors.join(d, "doc_id", "left_anti").count() == 0


def test_repetition_ratio_bounds(spark, sf_dir):
    rep = docs_repetition_ratio(spark, sf_dir)
    out_of_range = rep.filter(
        (F.col("rep_ratio") < 0) | (F.col("rep_ratio") > 1)
    )
    assert out_of_range.count() == 0
    assert rep.count() == table(spark, sf_dir, "documents").count()


def test_export_shards_order_and_determinism(spark, sf_dir):
    """The shard export contract: (1) every doc lands in exactly one
    shard (partition of the corpus), (2) each shard FILE is physically
    sorted by the seeded shuffle key — the order a trainer streams,
    (3) a rerun is byte-identical (manifest equality), because every
    step is a pure function of (seed, doc_id)."""
    import glob

    import pyarrow.orc as paorc

    from flink_orc_sink_spark.queries.llm import docs_export_shards

    m1 = {
        tuple(r)
        for r in docs_export_shards(spark, sf_dir).collect()
    }
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r[1] for r in m1) == n_docs  # partition, no loss/dup
    assert len(m1) == 8

    # rerun -> identical manifest (fresh output dir each call)
    m2 = {
        tuple(r)
        for r in docs_export_shards(spark, sf_dir).collect()
    }
    assert m1 == m2

    # file order within each shard == skey order (pyarrow preserves
    # physical row order; Spark reads don't promise it)
    import os
    import tempfile

    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_export_shards_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    out_dirs = sorted(glob.glob(f"{out}/shard=*"))
    assert len(out_dirs) == 8, "export wrote no shard directories"
    checked = 0
    for sd in out_dirs:
        for f in glob.glob(f"{sd}/*.orc"):
            keys = paorc.ORCFile(f).read(columns=["skey"])[
                "skey"
            ].to_pylist()
            assert keys == sorted(keys)
            checked += 1
    assert checked >= 8
