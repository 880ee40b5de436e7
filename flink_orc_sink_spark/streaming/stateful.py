"""Custom stateful streaming operators (SURVEY.md §2.4 streaming row).

The reference has no stateful operators beyond its file-commit state
machine; these are the engine-surface extensions a streaming pipeline
needs, built on the two sanctioned Spark primitives:

- ``dropDuplicatesWithinWatermark`` — built-in keyed dedup with state
  eviction at the watermark (the streaming analogue of
  ``queries/events.py::events_dedup_latest``).
- ``applyInPandasWithState`` — Arrow-batched per-key custom state, the
  general escape hatch (running aggregates, custom sessionization,
  enrichment caches). State lives in the checkpoint, sized per key —
  the 100 TB rule is bounded per-key state + watermark-driven timeout.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_dedup(
    df: DataFrame,
    key_cols: list[str],
    watermark_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Exactly-once keyed dedup within the watermark horizon.

    State is evicted once the watermark passes ``delay`` — bounded
    memory regardless of stream length, unlike an unbounded
    ``dropDuplicates`` whose state grows forever.
    """
    return df.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def running_totals(
    df: DataFrame,
    key_col: str,
    value_col: str,
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Per-key running (count, sum) maintained in custom state — the
    minimal ``applyInPandasWithState`` operator shape: state is one
    tuple per key, updates are Arrow batches, output is one row per
    key per micro-batch (update semantics).
    """

    output_schema = f"{key_col} long, n_events long, total double"
    state_schema = "n long, total double"

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total": [total]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout,
    )


def running_totals_exact(
    df: DataFrame,
    key_col: str,
    int_value_col: str,
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Per-key running (count, sum) over an INTEGER value column in
    custom state. The integer variant exists for value-level oracle
    checks: int64 accumulation is associative and order-independent,
    so the final state is bit-identical however micro-batches split
    the stream — float accumulation (``running_totals``) is not.
    Callers quantize upstream (e.g. ``floor(value*1e6+0.5)`` micros)
    and descale downstream."""

    output_schema = f"{key_col} long, n_events long, total long"
    state_schema = "n long, total long"

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0)
        for pdf in batches:
            n += len(pdf)
            total += int(pdf[int_value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total": [total]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout,
    )


# NOTE (round 9): a ``transformWithStateInPandas`` twin of
# ``running_totals_exact`` existed through round 8 but was EXCISED.
# The TWS state-server protocol hard-requires the ``protobuf``
# package, which this container does not ship and cannot install —
# the operator was the one registry surface never executable here
# (permanently pytest-skipped), i.e. untestable code posing as
# coverage. ``applyInPandasWithState`` (above) is the supported
# custom-stateful-UDF path in this engine; it expresses the same
# per-key state semantics and is value-gated against the batch
# GROUP BY oracle. If a deployment target has protobuf, the TWS form
# is a mechanical port of ``running_totals_exact`` onto a
# ``StatefulProcessor`` with one ``ValueState`` (see Spark 4's
# pyspark.sql.streaming.stateful_processor docs).
