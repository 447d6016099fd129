"""Pipeline QC metrics via ``df.observe`` — counters that piggyback
the action instead of paying a second scan.

The reference logs row counts and degradation flags at every pipeline
stage (console telemetry in src/App.tsx:102-143 and the landing
chain's route/count reporting, src/utils/proxyUtils.ts). The engine's
batch analogue is Spark's Observation API: named aggregate
expressions attached to a plan node, collected as a side effect of
whatever action the caller runs — at 100 TB the difference between
``observe`` and a separate ``df.count()`` + null-rate query is a full
extra pass over the table.

Streaming queries get the same numbers through ProgressTracker
(streaming/progress.py); this module is the batch half.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def qc_counters(text_col: str | None = None) -> dict[str, Column]:
    """The standard ingest-QC counter set: row count, plus null/blank
    text accounting when a text column is named (the dedup ladder's
    blank-policy rows — worth watching because they bypass the near
    tiers by design)."""
    counters: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    if text_col is not None:
        blank = F.col(text_col).isNull() | (F.trim(F.col(text_col)) == "")
        counters["n_blank_text"] = F.count(F.when(blank, 1))
        counters["n_text_chars"] = F.coalesce(
            F.sum(F.length(text_col)), F.lit(0).cast("long")
        )
    return counters


def observe_qc(
    df: DataFrame,
    name: str = "qc",
    counters: dict[str, Column] | None = None,
    text_col: str | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach QC counters to ``df``. Returns (df, observation); run
    any action on the returned df (write, count, collect), then read
    ``observation.get`` — a dict of the counter values for exactly the
    rows that flowed through this node. No extra job, no extra scan,
    and unlike accumulators the values are exact (not inflated by task
    retries)."""
    counters = counters or qc_counters(text_col)
    obs = Observation(name)
    aggs = [c.alias(n) for n, c in counters.items()]
    return df.observe(obs, *aggs), obs
