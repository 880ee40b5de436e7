"""Round-11 scale contract: no forced broadcast survives on frames
that grow with the data, so when the planner's size budget says a
side cannot broadcast (the 100 TB condition, simulated here by
setting both broadcast thresholds to -1) the SAME queries must
(a) plan shuffle joins instead of broadcast-hash joins and
(b) produce byte-identical results. The pre-round-11 code force-
broadcast these sides with ``F.broadcast`` hints, which override the
threshold — i.e. this test FAILS on the old code by still planning a
BroadcastHashJoin, which at real scale is a driver OOM.

Fixed-dim hints (nation/region, 25/5 rows at every SF) are exempt by
design and keep their justified ``# bounded-broadcast:`` hints, so
the queries under test are ones with NO surviving hints.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from flink_orc_sink_spark.queries import events as ev
from flink_orc_sink_spark.queries import llm
from flink_orc_sink_spark.queries import relational as rel

# queries whose every join side is SF-scaled (no surviving hints)
CASES = [
    rel.q14_promo_effect,        # lineitem ⋈ part (hint removed)
    rel.q18_large_orders,        # lineitem-agg ⋈ orders ⋈ customer
    ev.events_hourly_anomaly,    # hourly ⋈ per-user stats (r10 flag)
    ev.events_daily_retention,   # activity ⋈ per-user cohort (r10 flag)
    llm.docs_tfidf_top_terms,    # tokens ⋈ vocab-sized doc-freqs
]


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("fn", CASES, ids=lambda f: f.__name__)
def test_degrades_to_shuffle_join_when_broadcast_budget_is_zero(
    spark, sf_dir, fn
):
    want = sorted(map(tuple, fn(spark, sf_dir).collect()))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        prev_aqe = spark.conf.get(
            "spark.sql.adaptive.autoBroadcastJoinThreshold"
        )
    except Exception:
        prev_aqe = None  # unset: falls back to the non-AQE threshold
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        df = fn(spark, sf_dir)
        plan = _plan(df)
        assert "BroadcastHashJoin" not in plan, (
            f"{fn.__name__} still force-broadcasts with a zero "
            "broadcast budget — a forced hint survived on an "
            "SF-scaled side"
        )
        assert "Join" in plan  # it still joins, just shuffled
        got = sorted(map(tuple, df.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe is not None:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe
            )
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    assert got == want, f"{fn.__name__} values changed under shuffle plan"


def test_fixed_dims_keep_their_broadcast(spark, sf_dir):
    """nation/region hints are justified (25/5 rows at EVERY scale)
    and must keep broadcasting even with a zero budget — the hint is
    the point for frames whose size is a constant of the schema."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(rel.q5_local_supplier_volume(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" in plan  # nation/region hints held
