"""Retraction-join scale probe: is per-batch maintenance really
O(touched buckets), independent of accumulated state?

Feeds a growing amount of PRIOR state (left rows over a fixed key
space) through `streaming/orc_sink.py::stream_retract_join_orc`, then
measures the wall of ONE more micro-batch of FIXED size (mixed
updates/moves/deletes + right-side churn, with the maintained
aggregate enabled). The pk-layer merge, the jk-layer apply, the view
recompute and the aggregate deltas are all bounded by the batch's
touched buckets, so the last-batch wall must stay ~flat while state
grows 25x. Correctness is asserted inline at every size: the summed
aggregate deltas must equal a from-scratch aggregate of the
latest-live join.

Usage: python tools/scale_probe_retract_join.py [state sizes ...]
       (default: 20000 100000 500000)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from flink_orc_sink_spark.session import get_spark
    from flink_orc_sink_spark.streaming import (
        read_retract_agg,
        stream_from_files,
        stream_retract_join_orc,
    )

    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 100_000, 500_000]
    spark = get_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    batch_rows = 2_000
    n_jk = 50_000  # join-key space (customers)

    for n_state in sizes:
        base = tempfile.mkdtemp(prefix="probe_rjoin_")
        src = os.path.join(base, "in")
        state = os.path.join(base, "state")

        def lrow(df, pk, jk, seq, op, val):
            return df.select(
                F.lit("L").alias("side"),
                pk.cast("long").alias("pk"),
                jk.cast("long").alias("jk"),
                seq.cast("long").alias("seq"),
                op.alias("op"),
                val.cast("long").alias("val"),
                F.lit(None).cast("string").alias("attr"),
            )

        # bootstrap state: n_state left rows + the full right dim,
        # drained as ONE batch (build cost is not what we measure)
        ids = spark.range(n_state)
        left0 = lrow(
            ids,
            F.col("id"),
            F.pmod(F.hash("id"), F.lit(n_jk)),
            F.lit(1),
            F.lit("U"),
            F.col("id") % 1000,
        )
        right0 = spark.range(n_jk).select(
            F.lit("R").alias("side"),
            F.col("id").cast("long").alias("pk"),
            F.col("id").cast("long").alias("jk"),
            F.lit(1).cast("long").alias("seq"),
            F.lit("U").alias("op"),
            F.lit(None).cast("long").alias("val"),
            F.concat(F.lit("seg"), (F.col("id") % 5).cast("string")).alias(
                "attr"
            ),
        )
        left0.unionByName(right0).coalesce(4).write.mode(
            "append"
        ).parquet(src)

        def run(ckpt):
            q = stream_retract_join_orc(
                stream_from_files(
                    spark,
                    src,
                    "side string, pk long, jk long, seq long,"
                    " op string, val long, attr string",
                ),
                state,
                checkpoint=os.path.join(base, ckpt),
                trigger={"availableNow": True},
                agg_group_col="r_attr",
                agg_val_col="l_val",
            )
            assert q.awaitTermination(600), "stream did not drain"

        t0 = time.time()
        run("ckpt_boot")
        boot_s = time.time() - t0

        # the measured batch: fixed-size mixed churn — updates that
        # MOVE keys, deletes, inserts, and right-side relabels
        upd = spark.range(batch_rows)
        batch = (
            lrow(  # move: new jk for existing pks
                upd.filter(F.col("id") % 4 == 0),
                F.col("id"),
                F.pmod(F.hash("id") + 7, F.lit(n_jk)),
                F.lit(2),
                F.lit("U"),
                F.col("id") % 1000 + 1,
            )
            .unionByName(
                lrow(  # delete tombstones
                    upd.filter(F.col("id") % 4 == 1),
                    F.col("id"),
                    F.pmod(F.hash("id"), F.lit(n_jk)),
                    F.lit(2),
                    F.lit("D"),
                    F.lit(0),
                )
            )
            .unionByName(
                lrow(  # brand-new keys
                    upd.filter(F.col("id") % 4 == 2),
                    F.col("id") + 10_000_000,
                    F.pmod(F.hash("id"), F.lit(n_jk)),
                    F.lit(1),
                    F.lit("U"),
                    F.lit(5),
                )
            )
            .unionByName(  # right-side relabel of 100 customers
                spark.range(100).select(
                    F.lit("R").alias("side"),
                    F.col("id").cast("long").alias("pk"),
                    F.col("id").cast("long").alias("jk"),
                    F.lit(2).cast("long").alias("seq"),
                    F.lit("U").alias("op"),
                    F.lit(None).cast("long").alias("val"),
                    F.lit("seg9").alias("attr"),
                )
            )
        )
        batch.coalesce(1).write.mode("append").parquet(src)
        t0 = time.time()
        run("ckpt_boot")  # same checkpoint: only the new file runs
        batch_s = time.time() - t0

        # correctness: summed deltas == from-scratch aggregate
        got = {
            (r.grp, r.sum_val, r.n_keys)
            for r in read_retract_agg(spark, state).collect()
        }
        view = spark.read.orc(os.path.join(state, "view"))
        want = {
            (r.r_attr, r.s, r.n)
            for r in view.groupBy("r_attr")
            .agg(
                F.sum("l_val").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        }
        assert got == want, f"delta/agg mismatch at {n_state}"
        print(
            f"state={n_state:>8,}  boot={boot_s:6.1f}s  "
            f"fixed-batch={batch_s:6.1f}s  groups={len(got)}",
            flush=True,
        )
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
