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


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column data profile in ONE aggregation pass: for each
    column, (n_rows, n_nulls, n_distinct, min_value, max_value) as a
    tidy row. The first query every engine user runs against an
    unfamiliar table — and the shape matters at 100 TB: one ``agg``
    over all columns scans the data once, where the naive
    per-column-query loop scans it k times.

    ``n_distinct`` is ``approx_count_distinct`` (HLL, ``rsd``) by
    default — exact multi-column DISTINCT aggregates force an Expand
    (k+1 row multiplication before the shuffle), which is the right
    trade only when exactness is the point (``exact_distinct=True``;
    the q82 oracle check uses it so DuckDB can replay it). min/max are
    computed on the RAW column (native ordering, not lexicographic)
    and cast to string afterwards so heterogeneous columns share one
    schema; note non-integer floats may render differently across
    engines — profile derived integral columns (e.g. lengths) when the
    output must hash-match an external replica.
    """
    cols = df.columns if columns is None else columns
    if not cols:
        raise ValueError(
            "profile: empty column list (pass None to profile every column)"
        )
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile: unknown column(s) {missing}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        nd = (
            F.count_distinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(c, rsd)
        )
        aggs.extend(
            [
                F.count(F.when(F.col(c).isNull(), 1)).alias(f"__{c}__nulls"),
                nd.alias(f"__{c}__nd"),
                F.min(F.col(c)).cast("string").alias(f"__{c}__min"),
                F.max(F.col(c)).cast("string").alias(f"__{c}__max"),
            ]
        )
    one = df.agg(*aggs)
    per = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"__{c}__nulls").alias("n_nulls"),
            F.col(f"__{c}__nd").alias("n_distinct"),
            F.col(f"__{c}__min").alias("min_value"),
            F.col(f"__{c}__max").alias("max_value"),
        )
        for c in cols
    ]
    return one.select(
        F.col("__n").alias("n_rows"), F.explode(F.array(*per)).alias("__s")
    ).select("__s.col_name", "n_rows", "__s.n_nulls", "__s.n_distinct", "__s.min_value", "__s.max_value")
