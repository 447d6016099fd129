"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.8 T4, §2.9: the engine's user-extension door for state
Spark's built-in operators can't express).

The reference keeps exactly one piece of cross-refresh state: the
memoized per-entity verdict map with a freshness window
(src/services/externalData.ts:191-196,476-479). Its batch form is
``streaming.verdict_cache.VerdictCache``; the operator here is the
continuous form — per-key state maintained inside the stream itself,
with idle-timeout eviction playing the TTL role.

Scale notes: state lives in the state store partitioned by key (RocksDB
backend on a real cluster), is updated with Arrow-batched pandas
groups, and is BOUNDED — every key sets a processing-time timeout, so
abandoned keys are evicted instead of accumulating forever (the same
property watermarks give windowed aggs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RUNNING_STATS_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

_RUNNING_STATS_STATE = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)


def running_stats_per_key(
    events: DataFrame,
    key_col: str = "key",
    value_col: str = "value",
    ts_col: str = "ts",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Continuously-updated per-key running aggregate: each micro-batch
    emits the key's cumulative (count, sum, last event time) so a
    downstream sink always has the latest rollup per entity — the
    stream-native version of the verdict cache's "latest state per
    key" contract.

    ``idle_timeout_ms`` evicts state for keys silent that long
    (processing-time timeout — the TTL analogue). ``None`` keeps state
    for the stream's lifetime (tests: deterministic, no wall-clock
    dependence).
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += int(len(pdf))
            total += float(pdf[value_col].fillna(0.0).sum())
            if len(pdf):
                # pandas Timestamp → integer micros: state schemas hold
                # plain longs (timestamps in state round-trip poorly).
                batch_max_us = int(pd.Timestamp(pdf[ts_col].max()).value // 1000)
                last_us = max(last_us, batch_max_us)
        state.update((n, round(total, 4), last_us))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
                "last_ts": [pd.Timestamp(last_us * 1000)],
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_STATS_OUTPUT,
        stateStructType=_RUNNING_STATS_STATE,
        outputMode="update",
        timeoutConf=timeout,
    )
