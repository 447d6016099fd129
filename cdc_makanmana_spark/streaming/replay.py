"""Deterministic availableNow replays of the streaming layer.

The streaming operators (cdc.py upsert MERGE, rollup.py continuous
aggregates, joins.py stream-stream interval joins) are exercised by
batch-equivalence tests, but a test the builder wrote is a weaker
signal than the driver's DuckDB hash-diff. This module runs the ACTUAL
Structured Streaming machinery — file-source micro-batches,
``foreachBatch`` MERGE, watermarked stateful operators — over a staged
copy of a batch fixture with ``trigger(availableNow=True)``, producing
a DataFrame a plain SQL replay can hash-match (queries q103-q105).

Determinism is a design property, not luck:

- the upsert MERGE retains tombstones (``retain_tombstones=True``) and
  orders events by a unique id, so the merged state depends only on
  the SET of events, never on how the file source batched them;
- rollup partials are additive (count/sum), so partial-merge order
  can't change the served aggregate;
- the stateful interval join is replayed in event-time order: staged
  files get strictly increasing modification times matching their ts
  ranges (the file source sorts by mtime), so the watermark only ever
  advances behind data that has already been seen — eviction can never
  race ahead of unseen older rows.

Staging writes through the local filesystem (``os.utime`` has no
Hadoop-FS analogue) — this is a replay/verification harness, not the
production sink path; the operators themselves stay FS-agnostic.

Reference: the reference's refresh loop re-reads its whole snapshot
per cycle (src/services/dataManager.ts:132-187); these replays are the
streaming generalization with per-event change capture.
"""

from __future__ import annotations

import os
import re
import time

from pyspark.sql import DataFrame, SparkSession

from cdc_makanmana_spark.streaming.cdc import read_upsert_stream, upsert_to_parquet


def _part_index(fname: str) -> int:
    """Writer-assigned partition index parsed from a Spark part-file
    name (``part-00003-<uuid>...parquet`` → 3); raises on anything
    else so a naming-scheme change cannot silently reorder a replay."""
    m = re.match(r"part-(\d+)-", fname)
    if m is None:
        raise ValueError(
            f"unrecognized part-file name {fname!r}; cannot pin replay order"
        )
    return int(m.group(1))


def ordered_part_files(stage_dir: str) -> list[str]:
    """Part-file names under ``stage_dir`` in WRITER-PARTITION order
    (numeric, not lexicographic), with duplicates rejected — the
    replay-determinism precondition stage_ranged_files relies on."""
    parts = sorted(
        (f for f in os.listdir(stage_dir) if f.endswith(".parquet")),
        key=_part_index,
    )
    indices = [_part_index(f) for f in parts]
    if len(set(indices)) != len(indices):
        raise ValueError(
            f"duplicate partition indices {indices} in {stage_dir!r}"
        )
    return parts


def stage_ranged_files(
    spark: SparkSession,
    df: DataFrame,
    stage_dir: str,
    ts_col: str = "ts",
    n_files: int = 8,
) -> None:
    """Stage ``df`` as ``n_files`` parquet files range-partitioned on
    ``ts_col`` — each file a disjoint, ascending time slice, i.e. the
    on-disk shape of files landing from an in-order CDC feed. File
    mtimes are bumped to a strictly increasing sequence in ts order
    (range partition i maps to part-file i), pinning the file source's
    (mtime, path) replay order to event-time order."""
    (
        df.repartitionByRange(n_files, ts_col)
        .write.mode("overwrite")
        .parquet(stage_dir)
    )
    # Sort by the PARSED partition index, not lexicographically: the
    # replay-order guarantee rides on "range partition i == part-file
    # i", and while Spark's zero-padded part-%05d naming makes the two
    # orders coincide today, a naming-scheme change (or >99999 files)
    # must fail loudly here rather than silently scramble the
    # event-time replay order q105's determinism proof depends on
    # (r5 advisor find).
    parts = ordered_part_files(stage_dir)
    base = time.time()
    for i, p in enumerate(parts):
        t = base + i
        os.utime(os.path.join(stage_dir, p), (t, t))


def replay_upsert_merge(
    spark: SparkSession,
    stage_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    ts_col: str = "ts",
    tie_cols: list[str] | None = None,
    max_files_per_trigger: int = 2,
) -> None:
    """Drive the foreachBatch upsert MERGE (cdc.upsert_to_parquet) over
    the staged files as a real availableNow stream — several
    micro-batches, each merging into the bucketed target — and block
    until the stream completes. The target retains tombstones; serve
    it with ``op <> 'delete'``."""
    schema = spark.read.parquet(stage_dir).schema
    stream = read_upsert_stream(
        spark,
        stage_dir,
        schema,
        fmt="parquet",
        max_files_per_trigger=max_files_per_trigger,
    )
    q = upsert_to_parquet(
        stream,
        target_dir,
        key_cols,
        ts_col=ts_col,
        checkpoint_dir=checkpoint_dir,
        tie_cols=tie_cols,
        retain_tombstones=True,
    )
    q.awaitTermination()


def replay_rollup(
    spark: SparkSession,
    stage_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    keys: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
    max_files_per_trigger: int = 2,
) -> None:
    """Drive the continuous-aggregate maintainer (rollup.py) over the
    staged files: each micro-batch writes its additive partial,
    write-once commit-marked; ``RollupMaintainer(...).serve()`` reads
    the result."""
    from cdc_makanmana_spark.streaming.rollup import RollupMaintainer

    schema = spark.read.parquet(stage_dir).schema
    stream = read_upsert_stream(
        spark,
        stage_dir,
        schema,
        fmt="parquet",
        max_files_per_trigger=max_files_per_trigger,
    )
    maintainer = RollupMaintainer(
        spark,
        rollup_dir,
        window=window,
        keys=keys or [],
        ts_col=ts_col,
        value_col=value_col,
    )
    q = maintainer.ingest_stream(stream, checkpoint_dir=checkpoint_dir)
    q.awaitTermination()


def replay_interval_join(
    spark: SparkSession,
    left_stage: str,
    right_stage: str,
    out_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    watermark: str = "2 hours",
    max_files_per_trigger: int = 2,
) -> None:
    """Drive the watermark-bounded stream-stream interval join
    (joins.py) over two staged streams and append the matches to
    ``out_dir``. Both stages MUST have been written by
    ``stage_ranged_files`` (event-time-ordered replay) — the inner
    join's state eviction is then provably behind any row yet to
    arrive, so the result equals the batch join."""
    from cdc_makanmana_spark.streaming.joins import stream_stream_interval_join

    lschema = spark.read.parquet(left_stage).schema
    rschema = spark.read.parquet(right_stage).schema
    left = read_upsert_stream(
        spark, left_stage, lschema, fmt="parquet",
        max_files_per_trigger=max_files_per_trigger,
    )
    right = read_upsert_stream(
        spark, right_stage, rschema, fmt="parquet",
        max_files_per_trigger=max_files_per_trigger,
    )
    joined = stream_stream_interval_join(
        left, right, key_cols, left_ts, right_ts, lower_s, upper_s,
        watermark=watermark,
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def replay_stateful_asof(
    spark: SparkSession,
    stage_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "key",
    ts_col: str = "ts",
    kind_col: str = "kind",
    value_col: str = "value",
    max_files_per_trigger: int = 2,
) -> None:
    """Drive the applyInPandasWithState as-of enrichment
    (stateful.asof_enrich_stream) over a staged TAGGED stream
    (kind='update' carries state, kind='probe' asks for it) and append
    each probe's answer to ``out_dir``. Staged via
    ``stage_ranged_files`` so updates replay in event-time order —
    a probe can never arrive in a micro-batch BEFORE an earlier
    update's batch, which makes every answer equal the batch as-of
    join's (the per-key state row carries the latest observation
    across batches; pd.merge_asof resolves within-batch)."""
    from cdc_makanmana_spark.streaming.stateful import asof_enrich_stream

    schema = spark.read.parquet(stage_dir).schema
    stream = read_upsert_stream(
        spark, stage_dir, schema, fmt="parquet",
        max_files_per_trigger=max_files_per_trigger,
    )
    enriched = asof_enrich_stream(
        stream, key_col=key_col, ts_col=ts_col,
        kind_col=kind_col, value_col=value_col,
    )
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def replay_stream_dedup(
    spark: SparkSession,
    stage_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "90 days",
    max_files_per_trigger: int = 2,
) -> None:
    """Drive streaming exact-dedup (dropDuplicatesWithinWatermark)
    over a staged stream: the first arrival of each key is appended to
    ``out_dir``; later duplicates inside the watermark are suppressed
    by the dedup state store. ``watermark_delay`` must exceed the
    staged data's event-time span for the replay to equal a global
    DISTINCT (state is evicted ``delay`` behind the watermark — a key
    whose state expired would re-emit). Downstream consumers project
    the KEY columns only, so which physical duplicate arrived first
    never shows in the result.

    The span precondition is ENFORCED, not assumed: a generator change
    widening the event-time span past the delay would evict early keys
    mid-replay and silently re-emit late duplicates (r6 review find) —
    fail loudly here instead."""
    from pyspark.sql import functions as F

    staged = spark.read.parquet(stage_dir)
    m = re.fullmatch(r"(\d+)\s+days?", watermark_delay.strip())
    if m is None:
        raise ValueError(
            f"watermark_delay {watermark_delay!r} must be '<n> days' so the "
            "span precondition can be checked"
        )
    lo, hi = staged.select(F.min(ts_col), F.max(ts_col)).first()
    if lo is not None and (hi - lo).days >= int(m.group(1)):
        raise ValueError(
            f"staged event-time span {hi - lo} reaches the watermark delay "
            f"({watermark_delay}): dedup state would evict mid-replay and "
            "re-emit duplicates; raise the delay above the span"
        )
    schema = staged.schema
    stream = read_upsert_stream(
        spark, stage_dir, schema, fmt="parquet",
        max_files_per_trigger=max_files_per_trigger,
    )
    deduped = stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
