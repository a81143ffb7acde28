"""Custom stateful streaming operator via applyInPandasWithState (I2 in
its state-store form).

streaming.incremental maintains pattern state as re-aggregated batch
snapshots — readable by any batch consumer, idempotent, but the merged
view costs a re-aggregation per read. This module is the other point in
the design space: TRUE streaming state, one entry per pattern in Spark's
state store, updated per micro-batch and emitted in ``update`` output
mode. Use it when consumers want per-batch deltas pushed to a sink rather
than a rebuildable snapshot.

Scale: state is (pattern → 4 scalars); the store shuffles by the group key
so each pattern's state lives on exactly one executor. Arrow batches carry
each group's new rows to Python — the per-batch Python work is
O(new rows), not O(state).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "normalized_query string, frequency long, total_duration_ms double, "
    "first_seen timestamp, last_seen timestamp"
)
# timestamps kept as epoch-MICROS longs in the state tuple: state values
# round-trip through Arrow and naive-vs-aware pandas timestamps are a
# correctness trap; integers are not
STATE_SCHEMA = "frequency long, total_duration_ms double, first_us long, last_us long"


def stateful_pattern_counts(logs: DataFrame) -> DataFrame:
    """Per-pattern running (frequency, total duration, first/last seen),
    maintained in the state store across micro-batches. Emits one updated
    row per pattern per batch in which it received data."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        freq, total, first_us, last_us = (
            state.get if state.exists else (0, 0.0, None, None)
        )
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            freq += len(pdf)
            total += float(pdf["query_duration_ms"].sum())
            mn = int(pd.Timestamp(pdf["query_start_time"].min()).value // 1_000)
            mx = int(pd.Timestamp(pdf["query_start_time"].max()).value // 1_000)
            first_us = mn if first_us is None else min(first_us, mn)
            last_us = mx if last_us is None else max(last_us, mx)
        state.update((freq, total, first_us, last_us))
        yield pd.DataFrame(
            {
                "normalized_query": [key[0]],
                "frequency": [freq],
                "total_duration_ms": [total],
                "first_seen": [pd.to_datetime(first_us, unit="us")],
                "last_seen": [pd.to_datetime(last_us, unit="us")],
            }
        )

    return logs.groupBy("normalized_query").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
