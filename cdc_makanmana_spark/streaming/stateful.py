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


ASOF_ENRICH_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("probe_ts", TimestampType()),
        StructField("obs_ts", TimestampType()),
        StructField("obs_value", DoubleType()),
    ]
)

_ASOF_STATE = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("last_value", DoubleType()),
    ]
)


def asof_enrich_stream(
    tagged: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    kind_col: str = "kind",
    value_col: str = "value",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming as-of enrichment — the continuous twin of
    ``operators.asof.asof_join`` (q44): one tagged stream carries
    ``kind='update'`` rows (key, ts, value — the observed state) and
    ``kind='probe'`` rows (key, ts); each probe emits the latest
    update at-or-before its event time (inclusive tie, matching the
    batch operator and DuckDB ASOF). Per-key state is ONE row — the
    latest observation — so state size is O(keys), bounded further by
    the idle timeout.

    Within a micro-batch the merge is vectorized ``pd.merge_asof``
    over the event-time-sorted batch (updates visible to later probes
    in the same batch); across batches the state row carries the last
    observation forward. Arrival-order caveat, inherent to streaming
    as-of without a reorder buffer: an update arriving AFTER a probe
    in a LATER batch cannot retro-correct that probe's answer — add a
    watermark-delay buffer upstream if the source can deliver that
    late (same trade ``dropDuplicatesWithinWatermark`` makes).
    """
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_us, last_val = state.get if state.exists else (-1, float("nan"))
        # A key's micro-batch rows can span several Arrow chunks (bounded
        # by arrow.maxRecordsPerBatch) and applyInPandasWithState makes
        # no ordering promise across chunks — merging per chunk with a
        # one-row carried seed would hand a later-chunk probe whose event
        # time precedes the carried observation a wrong stale/NULL
        # answer. Materialize the whole group, sort ONCE, merge ONCE.
        chunks = [c for c in pdfs if len(c)]
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame(columns=[key_col, ts_col, kind_col, value_col])
        )
        pdf = pdf.sort_values(ts_col, kind="stable")
        upd = pdf[pdf[kind_col] == "update"][[ts_col, value_col]].copy()
        if last_us >= 0:
            seed = pd.DataFrame(
                {ts_col: [pd.Timestamp(last_us * 1000)], value_col: [last_val]}
            )
            upd = pd.concat([seed, upd], ignore_index=True)
        upd = upd.sort_values(ts_col, kind="stable")
        probes = pdf[pdf[kind_col] == "probe"][[ts_col]].copy()
        if len(probes):
            merged = pd.merge_asof(
                probes.rename(columns={ts_col: "probe_ts"}),
                upd.rename(columns={ts_col: "obs_ts", value_col: "obs_value"}),
                left_on="probe_ts",
                right_on="obs_ts",
                direction="backward",  # inclusive at equal ts
            )
            merged.insert(0, "key", key[0])
            yield merged[["key", "probe_ts", "obs_ts", "obs_value"]]
        if len(upd):
            tail = upd.iloc[-1]
            last_us = int(pd.Timestamp(tail[ts_col]).value // 1000)
            last_val = float(tail[value_col])
        state.update((last_us, last_val))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return tagged.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=ASOF_ENRICH_OUTPUT,
        stateStructType=_ASOF_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )
