"""Relational operators Spark has no single call for.

Each is a composition of shuffles/windows chosen for 100 TB behavior:
- as-of join: ONE shuffle by key + in-partition sort (the union/window
  trick), instead of an O(n·m) theta join.
- top-k per group: window + filter — map-side partial top-k via AQE;
  no global sort.
- sessionize: ``session_window`` (built-in) for the common case; a
  gaps-and-islands window formulation that any SQL engine can verify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-``k`` rows per group by ``order_cols`` (include explicit
    tie-breaker columns to keep results deterministic).

    One shuffle on ``group_cols``; rows never leave their partition
    after that, so it scales with the number of groups, not rows.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right_time <= left_time`` (direction='backward'), the earliest
    right row with ``right_time >= left_time`` (direction='forward'),
    or whichever of those two is closer in time
    (direction='nearest'; backward wins exact ties), on the same key.

    Implementation is the union + window ``last/first(ignorenulls)``
    trick: tag both sides, union them, sort within key by (time, side)
    and carry the adjacent right-side values across. Cost: ONE shuffle
    by key + an in-partition sort — the same shape as a sort-merge
    join, with no cross-product blow-up. This is the scalable form of
    the theta-join ``right_time <= left_time`` (SURVEY.md §2.4 row 1).

    Returns the left rows plus ``right_value_cols`` (null when no
    right row precedes/follows).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    lcols = left.columns
    tagged_r = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in right_value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    tagged_l = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_value_cols],
        *[F.col(c) for c in lcols],
    )
    unioned = tagged_r.unionByName(tagged_l)
    if direction == "nearest":
        # Both passes share ONE shuffle on __key; the two window sorts
        # happen in-partition. Backward wins exact-distance ties (the
        # pandas merge_asof convention is backward-biased too).
        import pyspark.sql.types as _T

        t_type = left.schema[left_time].dataType
        if isinstance(t_type, (_T.TimestampType, _T.TimestampNTZType, _T.DateType)):
            def _us(c: Column) -> Column:
                return F.unix_micros(c.cast("timestamp"))
        else:
            def _us(c: Column) -> Column:
                return c
        wb = (
            Window.partitionBy("__key")
            .orderBy(F.col("__t"), F.col("__side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy("__key")
            .orderBy(F.col("__t"), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        right_t = F.when(F.col("__side") == 0, F.col("__t"))
        back_t = F.last(right_t, ignorenulls=True).over(wb)
        fwd_t = F.first(right_t, ignorenulls=True).over(wf)
        take_back = fwd_t.isNull() | (
            back_t.isNotNull()
            & ((_us(F.col("__t")) - _us(back_t)) <= (_us(fwd_t) - _us(F.col("__t"))))
        )
        carry = [
            F.when(
                take_back,
                F.last(
                    F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True
                ).over(wb),
            )
            .otherwise(
                F.first(
                    F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True
                ).over(wf)
            )
            .alias(c)
            for c in right_value_cols
        ]
        carried = unioned.select(*lcols, F.col("__side"), *carry)
        return carried.filter(F.col("__side") == 1).drop("__side")
    if direction == "backward":
        # Right rows sort before left rows at equal timestamps
        # (__side 0<1), so an exactly-equal right timestamp IS visible
        # to the left row — standard as-of "<=" semantics; carry the
        # LAST right value seen so far.
        w = (
            Window.partitionBy("__key")
            .orderBy(F.col("__t"), F.col("__side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = [
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(c)
            for c in right_value_cols
        ]
    else:
        # Forward: left rows sort before right rows at equal
        # timestamps (__side desc: 1 before 0), so an exactly-equal
        # right timestamp is inside the FOLLOWING frame — ">="
        # semantics; take the FIRST right value at or after.
        w = (
            Window.partitionBy("__key")
            .orderBy(F.col("__t"), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = [
            F.first(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(c)
            for c in right_value_cols
        ]
    carried = unioned.select(*lcols, F.col("__side"), *carry)
    return carried.filter(F.col("__side") == 1).drop("__side")


def range_join(
    fact: DataFrame,
    buckets: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Join fact rows to range buckets on ``lo <= value < hi``.

    The bucket side is broadcast (it is small by construction), so the
    non-equi condition never becomes a shuffled nested-loop join — the
    only plan that survives 100 TB on the fact side.
    """
    return fact.join(
        # bounded-broadcast: bucket-bounds table: one row per requested bucket (caller constant n)
        F.broadcast(buckets),
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)),
        "inner",
    )


def ntile_approx(
    df: DataFrame,
    value_col: str,
    n: int = 4,
    bucket_col: str = "bucket",
    relative_error: float = 0.001,
) -> DataFrame:
    """Scale-safe n-tile bucketing.

    An unpartitioned ``Window.orderBy`` (exact ntile) collapses the
    whole dataset into ONE partition — correct, but a single-task
    sort that cannot survive 100 TB. This variant computes the n−1
    boundary quantiles with ``approx_percentile`` (one aggregation,
    bounded memory, mergeable sketches) and assigns buckets with a
    broadcast comparison — fully parallel, two narrow passes.

    Ties at a boundary all land in the lower bucket (deterministic);
    bucket populations are approximate within ``relative_error``.
    """
    probs = [i / n for i in range(1, n)]
    bounds_row = df.agg(
        F.percentile_approx(
            value_col, probs, F.lit(int(1.0 / relative_error))
        ).alias("bounds")
    )
    with_bounds = df.crossJoin(F.broadcast(bounds_row))
    bucket = F.lit(1)
    for i in range(n - 1):
        bucket = bucket + F.when(
            F.col(value_col) > F.element_at("bounds", i + 1), 1
        ).otherwise(0)
    return with_bounds.withColumn(bucket_col, bucket).drop("bounds")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join with key salting for extreme skew.

    AQE's skew-join splitting (enabled in ``session.py``) handles most
    skew at runtime; explicit salting is for the pathological case — a
    single key holding a double-digit percentage of the fact side,
    where even a split partition overwhelms one join task.

    Mechanics: the big (left) side gets a deterministic salt in
    ``[0, salt_buckets)`` derived from the whole row (monotonically_
    increasing_id is partition-local, no shuffle); the small (right)
    side is replicated once per salt value via an in-row explode. The
    shuffle key becomes (key, salt), spreading one hot key over
    ``salt_buckets`` tasks. Cost: right side × salt_buckets — use for
    dimension-sized right sides that just miss the broadcast
    threshold.
    """
    salted_l = left.withColumn(
        "__salt",
        F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets)),
    )
    salted_r = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return salted_l.join(salted_r, [on, "__salt"], how).drop("__salt")


def sessionize(
    df: DataFrame,
    key_col: str,
    time_col: str,
    gap_minutes: int = 10,
) -> DataFrame:
    """Assign gaps-and-islands session IDs per key: a new session
    starts when the time since the previous row is >= the gap.

    Window formulation (lag + cumulative sum) rather than
    ``F.session_window`` so (a) the session id is exposed as a plain
    column usable by later joins, and (b) the semantics are plain SQL
    any engine can verify. One shuffle by key.
    """
    # Order by (time, any unique col) is the caller's job if timestamps
    # can tie; integer microseconds keep the gap comparison exact (and
    # identical to DuckDB's epoch_us) — no float drift.
    w = Window.partitionBy(key_col).orderBy(time_col)
    gap_us = gap_minutes * 60 * 1_000_000
    t_us = F.unix_micros(F.col(time_col))
    prev = F.lag(t_us).over(w)
    is_new = (prev.isNull() | ((t_us - prev) >= gap_us)).cast("int")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_seq", F.sum(is_new).over(wsum))


def cdc_latest_state(
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC change feed: the LATEST change per key (strict
    total order via ``order_cols``, descending), with keys whose
    latest change is a delete absent, plus ``n_changes`` per surviving
    key for audit. ONE shuffle on the key — the count window rides the
    same partition as the ranking window.

    Latest-wins is idempotent and associative, which is what makes
    the incremental/streaming form (``streaming/orc_sink.py::
    stream_cdc_apply_orc``) converge under crash replay and arbitrary
    batch splits."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    wk = Window.partitionBy(*key_cols)
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_changes", F.count("*").over(wk))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn")
    )


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    attr_col: str,
    ts_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """SCD Type-2 history of ``attr_col`` per key: collapse
    consecutive repeats (ordered by ``order_cols``, default
    ``[ts_col]``), then emit one row per attribute interval with
    ``version``, ``effective_from`` (= the change's ``ts_col``),
    ``effective_to`` (= next change's, NULL while open) and
    ``is_current``. Both windows partition on the key — one exchange,
    reused."""
    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    changes = (
        df.withColumn("_prev", F.lag(attr_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr_col)))
        .drop("_prev")
    )
    return (
        changes.withColumn("version", F.row_number().over(w))
        .withColumn("effective_from", F.col(ts_col))
        .withColumn("effective_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("effective_to").isNull())
    )


def sessionize_dynamic(
    df: DataFrame,
    key_col: str,
    time_col: str,
    gap_minutes_col: Column,
) -> DataFrame:
    """Gaps-and-islands sessionization with a PER-ROW inactivity gap
    (``F.session_window``'s dynamic-gap form as a plain column): each
    event keeps its session alive for ITS OWN gap, and — exactly as
    ``session_window`` merges overlapping extensions — a session
    stays open as long as the running MAX of ``t_i + gap_i`` reaches
    the next event (a long-gap event keeps the session alive through
    later short-gap ones; the previous-event-gap rule alone
    under-merges). New session iff ``t ≥ max_{i<t}(t_i + gap_i)``:
    one running-max window, so batch and streaming forms agree
    event-for-event. Integer-microsecond arithmetic keeps every
    boundary exact cross-engine.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(time_col)
    t_us = F.unix_micros(F.col(time_col))
    gap_us = (gap_minutes_col * 60 * 1_000_000).cast("long")
    prev_reach = F.max(t_us + gap_us).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = (prev_reach.isNull() | (t_us >= prev_reach)).cast("int")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_seq", F.sum(is_new).over(wsum))
