"""The bounded-broadcast lint (tools/audit_plans.py, round 11) must
not be vacuously clean: grouped-aggregate broadcasts — including a
groupBy held in a local variable — are findings unless annotated,
while global aggregates, re-aggregated scalars, limits, fixed dims
and annotated sites pass."""

from __future__ import annotations

import importlib.util
import os
import textwrap

_SPEC = importlib.util.spec_from_file_location(
    "audit_plans",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "audit_plans.py",
    ),
)
audit_plans = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(audit_plans)

SYNTH = textwrap.dedent(
    """
    from pyspark.sql import functions as F

    def bad_grouped_in_var(df):
        g = df.groupBy("user_id")
        stats = g.agg(F.count("*"))
        return df.join(F.broadcast(stats), "user_id")

    def good_global_agg(df):
        tot = df.agg(F.count("*").alias("n"))
        return df.crossJoin(F.broadcast(tot))

    def good_regrouped_scalar(df):
        m = df.groupBy("k").agg(F.count("*").alias("n")).agg(F.max("n"))
        return df.crossJoin(F.broadcast(m))

    def bad_plain_grouped(df):
        s = df.groupBy("u").agg(F.sum("x"))
        return df.join(F.broadcast(s), "u")

    def good_annotated(df):
        s = df.groupBy("etype").agg(F.sum("x"))
        # bounded-broadcast: event-type enum domain
        return df.join(F.broadcast(s), "etype")

    def good_limit(df):
        top = df.orderBy("x").limit(5)
        return df.join(F.broadcast(top), "k")

    def good_fixed_dim(spark, sf_dir):
        n = table(spark, sf_dir, "nation")
        return n.select("n_nationkey").crossJoin(F.broadcast(n))

    def bad_nested_limit(df, small):
        return df.join(F.broadcast(df.join(small.limit(5), "k")), "k")

    def bad_nested_dim(spark, sf_dir, big):
        j = big.join(table(spark, sf_dir, "nation"), "n_nationkey")
        return big.join(F.broadcast(j), "n_nationkey")
    """
)


def test_sweep_flags_unbounded_and_passes_bounded(tmp_path):
    (tmp_path / "synth.py").write_text(SYNTH)
    findings = audit_plans._audit_forced_broadcasts(str(tmp_path))
    flagged_lines = sorted(
        int(f.split(":")[1]) for f in findings if "synth.py" in f
    )
    src_lines = SYNTH.splitlines()
    flagged_fns = set()
    for ln in flagged_lines:
        for i in range(ln - 1, -1, -1):
            if src_lines[i].startswith("def "):
                flagged_fns.add(src_lines[i].split("(")[0][4:])
                break
    # the nested-limit / nested-dim shapes (round-11 advice #2): a
    # .limit or nation scan INSIDE a larger expression bounds only
    # that operand, not the broadcast frame — both must flag
    assert flagged_fns == {
        "bad_grouped_in_var",
        "bad_plain_grouped",
        "bad_nested_limit",
        "bad_nested_dim",
    }


def test_sweep_clean_on_package():
    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "flink_orc_sink_spark",
    )
    assert audit_plans._audit_forced_broadcasts(pkg) == []
