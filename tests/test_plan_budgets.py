"""Physical-plan shuffle budgets for flagship queries.

Every `Exchange` is a cluster-wide shuffle; at 100 TB an accidental
extra one is the difference between an hour and a day. These tests
pin the exchange count (and broadcast-ness of dimension joins) of the
flagship plans so a refactor that silently degrades the plan fails CI
— the plan-shape contract SCALE.md documents.

Counts are upper bounds ON THE COMPILED PLAN (before AQE runtime
re-optimization, which only ever removes/merges work).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entry

# name -> (max shuffle exchanges, min broadcast exchanges)
BUDGETS = {
    "q1_pricing_summary": (1, 0),    # one partial-agg shuffle
    "q6_forecast_revenue": (1, 0),   # scan → filter → single agg
    "q3_shipping_priority": (1, 2),  # lineitem agg shuffle; 2 dims broadcast
    "q5_local_supplier_volume": (2, 3),
    "q10_returned_items": (2, 2),
    "window_running_total": (1, 0),  # one window shuffle
    "sort_global_topk": (0, 0),      # TakeOrderedAndProject, no exchange
    "docs_token_stats": (0, 0),      # map-only
    "docs_repetition_ratio": (0, 0),  # map-only
    "docs_hash_sample": (0, 0),      # pushed predicate, map-only
    "events_tumbling_hourly": (1, 0),
    "agg_price_histogram": (1, 0),
    # round-3 surface: the claims in each docstring, pinned
    "events_cdc_apply": (1, 0),      # ranking + count share one key shuffle
    "events_scd2_status": (1, 0),    # both windows reuse the key exchange
    "events_bitmap_distinct_rollup": (3, 0),  # 3-level rollup hierarchy
    "window_percent_rank": (1, 0),
    "join_not_in_nulls": (0, 1),     # broadcast null-aware probe, no shuffle
    "events_daily_gapfill": (2, 1),  # daily agg + spine join (spine b/c)
    "dq_audit_orders": (5, 1),       # 3 scan checks share ONE agg pass
    "docs_tfidf_top_terms": (5, 2),  # tf, df aggs; df+N broadcast back
    # round-3 additions
    "docs_paragraph_dedup": (2, 0),  # hash window + per-doc rollup
    "docs_temperature_mix": (2, 0),  # source agg + tiny-frame window
    "events_cohort_revenue": (3, 0),  # first-purchase agg, join, rollup
    "docs_lm_quality_buckets": (5, 3),  # lm core + lang join + ntile
    # round-3 batch 2
    "docs_hash_classifier_score": (0, 0),  # in-row HOF scoring, map-only
    "docs_dsir_weights": (3, 2),     # token agg ×2; bucket table broadcast
    "events_top_paths": (2, 0),      # trigram window + TakeOrdered count
    "events_rfm_segments": (3, 1),   # user agg, global ntile, segment agg
    "events_windowed_funnel": (2, 0),  # all 3 stages share ONE user window
    "agg_mode_per_group": (2, 0),    # count agg + shared ranking window
    # round-4 surface: the stdlib media codecs are MAP-ONLY stages —
    # plant → decode → stats with zero shuffle of raw media bytes
    "multimodal_jpeg_stats": (0, 0),
    "multimodal_gif_stats": (0, 0),
    "multimodal_audio_features": (0, 0),
    "multimodal_decode_stats": (0, 0),
    "multimodal_frame_sample_stats": (0, 0),  # frame fan-out in-partition
}


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_shuffle_budget(spark, sf_dir, name):
    max_shuffles, min_broadcasts = BUDGETS[name]
    plan = _plan(entry.queries()[name](spark, sf_dir))
    # formatted output shows each node twice (tree + detail); count
    # the numbered detail headers, which are unique per node.
    shuffles = len(re.findall(r"\(\d+\) Exchange\b", plan))
    broadcasts = len(re.findall(r"\(\d+\) BroadcastExchange\b", plan))
    assert shuffles <= max_shuffles, (
        f"{name}: {shuffles} shuffle exchanges (budget {max_shuffles})\n{plan}"
    )
    assert broadcasts >= min_broadcasts, (
        f"{name}: {broadcasts} broadcast exchanges (expected ≥ {min_broadcasts})"
        f"\n{plan}"
    )


def test_sort_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(entry.queries()["sort_global_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # never global sort + limit


def test_skewed_join_aqe_split_fires(spark):
    """The AQE skew-join split must actually FIRE on the 50%-hot-key
    join shape (round-4 verdict #6) — the executed adaptive plan
    marks the sort-merge join skew=true. Two scalings make the
    mechanism observable at test size: (a) the 256 MiB production
    threshold shrinks to this probe's KiB-sized shuffle, and (b) the
    fact side must arrive from MULTIPLE map tasks — AQE splits a
    skewed partition into (mapper-range, reducer) slices, so a
    single-mapper input (like the one-row-group local parquet
    fixtures) is UNSPLITTABLE no matter how skewed; production scans
    have thousands of mappers. The registered query's plan shape is
    asserted separately below."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # the registered query's exact shape (50% hot key 0, uniform
        # tail, 10k-key dim, forced SMJ) with an 8-mapper fact
        fact = spark.range(60_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.col("id"), F.lit(10_000)))
            .cast("long")
            .alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        dim = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("w")
        )
        df = (
            fact.join(dim.hint("merge"), "k")
            .groupBy("w")
            .agg(F.sum("v").alias("sv"))
        )
        df.collect()  # AQE decisions only exist in the EXECUTED plan
        executed = df._jdf.queryExecution().toString()
        assert "skew=true" in executed, executed[-4000:]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_skewed_join_salted_spreads_hot_key(spark, sf_dir):
    """The salted form must (a) shuffle on (k, __salt) — the plan's
    join keys include the salt — and (b) never broadcast the hot-side
    fact table."""
    df = entry.queries()["join_skewed_salted"](spark, sf_dir)
    plan = _plan(df)
    assert "__salt" in plan
    assert "SortMergeJoin" in plan
    # same answer as the AQE form: the mitigation must not change results
    aqe = {
        tuple(r)
        for r in entry.queries()["join_skewed_hot_key"](spark, sf_dir).collect()
    }
    assert {tuple(r) for r in df.collect()} == aqe
