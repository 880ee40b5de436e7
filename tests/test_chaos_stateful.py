"""Randomized (seeded) crash-point sweep over every stateful sink.

The reference's exactly-once claim (``README.md:3``) generalized: each
of the six stateful surfaces (retract agg, retract join, CDC apply,
SCD2, quarantine DLQ, index ingest) is fed the same batch sequence two
ways —

- ORACLE: one fresh instance, all input drained in a single pass;
- CHAOS: batch-at-a-time drains with a crash injected at a
  SEEDED-RANDOM micro-batch boundary (the established simulation: the
  checkpoint's last commit entry is deleted, so the restart re-runs
  that batch against the already-updated state — crash-after-work-
  before-commit, the hardest replay window) and, for the sinks that
  have maintenance ops, a TORN maintenance run mid-stream (horizon
  marker recorded, rewrite never executed — cleanup's documented
  crash window) followed later by a real cleanup under the lease;

and the final authoritative state must match exactly. The torn-
compaction windows of the index families are covered separately in
``test_retention.py`` (recover_index suite)."""

from __future__ import annotations

import os
import random
import time
import zlib

import pytest
from pyspark.sql import functions as F

# slow tier: seeded crash-point matrices, ~3 min — excluded from the default (driver) gate, see pytest.ini
pytestmark = pytest.mark.slow


def _drain(start_fn, timeout=180):
    for attempt in range(10):
        q = start_fn()
        try:
            assert q.awaitTermination(timeout), "stream did not drain"
            return
        except AssertionError:
            raise
        except Exception:
            if attempt == 9 or "concurrently using" not in str(
                q.exception()
            ):
                raise
            time.sleep(1)


def _drop_last_commit(ckpt: str) -> None:
    commits = sorted(
        c
        for c in os.listdir(os.path.join(ckpt, "commits"))
        if not c.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", commits[-1]))


# --------------------------------------------------------------------
# case definitions: schema, 4 input batches, sink starter, state reader
# --------------------------------------------------------------------


def _retract_agg_case(spark, tmp, tag):
    from flink_orc_sink_spark.streaming import (
        read_retract_agg,
        stream_from_files,
        stream_retract_agg_orc,
    )

    schema = "k long, grp string, v long, op string, seq long"
    batches = [
        [
            (1, "a", 10, "U", 10),
            (2, "a", 20, "U", 11),
            (3, "b", 30, "U", 12),
            (4, "c", 40, "U", 13),
            (4, "c", 0, "D", 14),
        ],
        [(2, "b", 21, "U", 20), (5, "a", 50, "U", 21)],
        [(1, "a", 11, "U", 30), (3, "b", 0, "D", 31)],
        # last batch replays a batch-0 row verbatim (stale replay)
        [(6, "b", 60, "U", 40), (1, "a", 10, "U", 10)],
    ]
    state = str(tmp / f"state_{tag}")
    ck = str(tmp / f"ck_{tag}")

    def start():
        return stream_retract_agg_orc(
            stream_from_files(spark, str(tmp / f"in_{tag}"), schema),
            state,
            checkpoint=ck,
            key_col="k",
            group_col="grp",
            val_col="v",
            order_cols=["seq"],
            trigger={"availableNow": True},
        )

    def read():
        return {
            (r.grp, r.sum_val, r.n_keys)
            for r in read_retract_agg(spark, state).collect()
        }

    def torn_maintenance():
        # cleanup crash window: horizon marker recorded, rewrite never
        # ran (crash right after the marker — documented harmless)
        from flink_orc_sink_spark.streaming.orc_sink import (
            _record_replay_horizon,
        )

        _record_replay_horizon(spark, state, 20)

    def maintenance():
        from flink_orc_sink_spark.streaming import cleanup_retract_state

        stats = cleanup_retract_state(spark, state, horizon=20)
        assert stats["tombstones_dropped"] >= 1  # k=4's D (seq 14)

    return schema, batches, start, read, ck, torn_maintenance, maintenance


def _retract_join_case(spark, tmp, tag):
    from flink_orc_sink_spark.streaming import (
        stream_from_files,
        stream_retract_join_orc,
    )

    schema = (
        "side string, pk long, jk long, seq long, op string,"
        " val long, attr string"
    )
    batches = [
        [
            ("L", 101, 1, 10, "U", 10, None),
            ("L", 102, 1, 11, "U", 20, None),
            ("L", 104, 1, 12, "U", 30, None),
            ("L", 104, 1, 13, "D", None, None),
            ("R", 1, 1, 14, "U", None, "x"),
            ("R", 2, 2, 15, "U", None, "y"),
        ],
        [("L", 102, 2, 20, "U", 25, None)],  # jk move 1 -> 2
        [
            ("R", 1, 1, 30, "D", None, None),
            ("L", 103, 2, 31, "U", 35, None),
        ],
        [("L", 101, 1, 10, "U", 10, None)],  # verbatim stale replay
    ]
    state = str(tmp / f"state_{tag}")
    ck = str(tmp / f"ck_{tag}")

    def start():
        return stream_retract_join_orc(
            stream_from_files(spark, str(tmp / f"in_{tag}"), schema),
            state,
            checkpoint=ck,
            trigger={"availableNow": True},
        )

    def read():
        from flink_orc_sink_spark.streaming import read_retract_join_view

        return {
            (r.l_pk, r.jk, r.l_val, r.r_attr)
            for r in read_retract_join_view(spark, state).collect()
        }

    def torn_maintenance():
        from flink_orc_sink_spark.streaming.orc_sink import (
            _record_replay_horizon,
        )

        _record_replay_horizon(spark, state, 20)

    def maintenance():
        from flink_orc_sink_spark.streaming import (
            cleanup_retract_join_state,
        )

        stats = cleanup_retract_join_state(spark, state, horizon=20)
        assert stats["tombstones_dropped"] >= 1  # L104's D (seq 13)

    return schema, batches, start, read, ck, torn_maintenance, maintenance


def _cdc_case(spark, tmp, tag):
    from flink_orc_sink_spark.streaming import (
        stream_cdc_apply_orc,
        stream_from_files,
    )

    schema = "k long, seq long, op string, v long"
    batches = [
        [(1, 1, "U", 10), (2, 2, "U", 20), (3, 3, "U", 30)],
        [(2, 10, "U", 21), (4, 11, "U", 40)],
        [(3, 20, "D", 0), (1, 21, "U", 11)],
        [(5, 30, "U", 50), (2, 2, "U", 20)],  # stale replay of k=2
    ]
    state = str(tmp / f"state_{tag}")
    ck = str(tmp / f"ck_{tag}")

    def start():
        return stream_cdc_apply_orc(
            stream_from_files(spark, str(tmp / f"in_{tag}"), schema),
            state,
            checkpoint=ck,
            key_col="k",
            order_cols=["seq"],
            trigger={"availableNow": True},
        )

    def read():
        from flink_orc_sink_spark.streaming import read_cdc_table

        return {
            (r.k, r.seq, r.v)
            for r in read_cdc_table(spark, state)
            .filter(F.col("op") == "U")
            .collect()
        }

    return schema, batches, start, read, ck, None, None


def _scd2_case(spark, tmp, tag):
    from flink_orc_sink_spark.streaming import (
        stream_from_files,
        stream_scd2_apply_orc,
    )

    schema = "k long, attr string, ts long, seq long"
    batches = [
        [(1, "A", 10, 1), (2, "A", 10, 2)],
        [(1, "B", 30, 3), (2, "A", 30, 4)],  # change vs repeat
        [(1, "A", 20, 5)],  # LATE row splits 1's interval
        [(3, "C", 40, 6), (1, "B", 30, 3)],  # new key + verbatim replay
    ]
    state = str(tmp / f"state_{tag}")
    ck = str(tmp / f"ck_{tag}")

    def start():
        return stream_scd2_apply_orc(
            stream_from_files(spark, str(tmp / f"in_{tag}"), schema),
            state,
            checkpoint=ck,
            key_col="k",
            attr_col="attr",
            ts_col="ts",
            order_cols=["ts", "seq"],
            trigger={"availableNow": True},
        )

    def read():
        from flink_orc_sink_spark.streaming import read_scd2_history

        return {
            (r.k, r.attr, r.version, r.effective_from, r.effective_to)
            for r in read_scd2_history(spark, state).collect()
        }

    return schema, batches, start, read, ck, None, None


def _quarantine_case(spark, tmp, tag):
    from flink_orc_sink_spark.streaming import (
        stream_from_files,
        stream_quarantine_orc,
    )

    schema = "id long, v long"
    batches = [
        [(1, 10), (2, -5), (3, 30)],
        [(4, -1), (5, 50)],
        [(6, 60), (7, -7)],
        [(8, 80)],
    ]
    valid = str(tmp / f"valid_{tag}")
    quar = str(tmp / f"quar_{tag}")
    ck = str(tmp / f"ck_{tag}")

    def start():
        return stream_quarantine_orc(
            stream_from_files(spark, str(tmp / f"in_{tag}"), schema),
            valid,
            quar,
            checkpoint=ck,
            expectation=F.col("v") >= 0,
            trigger={"availableNow": True},
        )

    def read():
        # batch ids legitimately differ between the single-drain
        # oracle and the chaos run — compare the row SETS
        g = {
            (r.id, r.v) for r in spark.read.orc(valid).collect()
        }
        b = {(r.id, r.v) for r in spark.read.orc(quar).collect()}
        return (frozenset(g), frozenset(b))

    return schema, batches, start, read, ck, None, None


def _index_ingest_case(spark, tmp, tag):
    from flink_orc_sink_spark.operators.dedup import append_to_gram_index
    from flink_orc_sink_spark.streaming import stream_from_files

    schema = "doc long, text string"
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "how vexingly quick daft zebras jump",
        "sphinx of black quartz judge my vow",
        "the five boxing wizards jump quickly",
        "jackdaws love my big sphinx of quartz",
        "mr jock tv quiz phd bags few lynx",
        "waltz bad nymph for quick jigs vex",
    ]
    batches = [
        [(2 * i, texts[2 * i]), (2 * i + 1, texts[2 * i + 1])]
        for i in range(4)
    ]
    idx = str(tmp / f"idx_{tag}")
    ck = str(tmp / f"ck_{tag}")

    def start():
        def on_batch(bdf, bid):
            append_to_gram_index(
                bdf, "doc", "text", idx, n=4, tag=int(bid)
            )

        return (
            stream_from_files(spark, str(tmp / f"in_{tag}"), schema)
            .writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )

    def read():
        # presence semantics: the authoritative content is the gram
        # hash SET (tags legitimately differ between oracle and chaos)
        return frozenset(
            r.gh
            for r in spark.read.parquet(f"{idx}/grams")
            .select("gh")
            .distinct()
            .collect()
        )

    return schema, batches, start, read, ck, None, None


_CASES = {
    "retract_agg": _retract_agg_case,
    "retract_join": _retract_join_case,
    "cdc_apply": _cdc_case,
    "scd2": _scd2_case,
    "quarantine": _quarantine_case,
    "index_ingest": _index_ingest_case,
}


@pytest.mark.parametrize("case", sorted(_CASES))
def test_chaos_crash_matrix(spark, tmp_path, case):
    make = _CASES[case]
    # seeded per case and STABLE across processes (hash() is salted)
    rng = random.Random(zlib.crc32(case.encode()))

    # ---- oracle: fresh instance, everything in one drain ----------
    schema, batches, start, read, ck, torn, maint = make(
        spark, tmp_path, "oracle"
    )
    src = str(tmp_path / "in_oracle")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    _drain(start)
    want = read()
    assert want, "oracle produced empty state — broken case setup"

    # ---- chaos: batch-at-a-time with a seeded crash point ---------
    schema, batches, start, read, ck, torn, maint = make(
        spark, tmp_path, "chaos"
    )
    src = str(tmp_path / "in_chaos")
    crash_at = rng.randrange(len(batches))
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _drain(start)
        if i == crash_at:
            # crash-after-work-before-commit: the restart re-runs
            # this batch against the already-updated state
            _drop_last_commit(ck)
            _drain(start)
        if torn is not None and i == 1:
            torn()  # maintenance crashed mid-run (marker only)
        if maint is not None and i == 2:
            maint()  # real cleanup (takes the lease between drains)

    got = read()
    assert got == want, (
        f"{case}: chaos state diverged from the from-scratch oracle "
        f"(crash at batch {crash_at})\n got: {sorted(got)}\nwant: "
        f"{sorted(want)}"
    )
