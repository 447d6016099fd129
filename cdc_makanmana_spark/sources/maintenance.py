"""Table maintenance: small-file compaction.

Streaming sinks (foreachBatch appends, availableNow micro-batches) and
high-parallelism writers accumulate many small files; at 100 TB the
resulting scan-planning and NameNode/liststore pressure dominates query
latency long before data volume does. ``compact_parquet`` rewrites a
directory to ~``target_file_bytes`` files using the same
staging → rename → ``_COMMITTED`` discipline as the MVCC sinks
(fs.py:126), with explicit crash-window repair so a killed compaction
never loses the table.

Reference analogue: the cache rewrite-in-place the reference performs on
every refresh (src/services/dataManager.ts:68-77) — generalized to a
maintenance operation. Readers never see a torn MIX of old and new
files, but the two-rename swap does leave a brief window where the
directory is absent (generic filesystems have no atomic directory
swap): run compaction in the ingest pause of a maintenance window, or
point readers through a versioned layout (LandingJob) where the swap
problem disappears entirely.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from cdc_makanmana_spark import fs

_STAGING = ".__compact_staging"
_OLD = ".__compact_old"


def _data_files(spark: SparkSession, path: str) -> list[str]:
    names = [
        n
        for n in fs.list_names(spark, path)
        if not (n.startswith(".") or n.startswith("_"))
    ]
    subdirs = [n for n in names if fs.is_dir(spark, f"{path}/{n}")]
    if subdirs:
        # a hive-partitioned layout: a flat rewrite would both mis-size
        # (directories stat as 0 bytes) and DESTROY the partitioning —
        # compact each partition directory individually instead.
        raise ValueError(
            f"{path} contains subdirectories ({subdirs[:3]}...): "
            "compact_parquet operates on flat table directories; for a "
            "partitioned layout, compact each partition directory "
            "(they are independent flat directories)"
        )
    return names


def repair(spark: SparkSession, path: str) -> str:
    """Repair the crash windows of a previous ``compact_parquet``:

    - swap completed staging in if the table directory is the hole
      (crash between the two renames, staged data committed);
    - roll the original back if staging never committed;
    - sweep stale staging/old leftovers otherwise.

    Returns one of 'clean', 'finished_swap', 'rolled_back', 'swept'.
    """
    p = path.rstrip("/")
    staging, old = p + _STAGING, p + _OLD
    if not fs.exists(spark, p):
        if fs.exists(spark, staging) and fs.is_committed(spark, staging):
            fs.rename(spark, staging, p)
            fs.delete(spark, old)
            return "finished_swap"
        if fs.exists(spark, old):
            fs.rename(spark, old, p)
            fs.delete(spark, staging)
            return "rolled_back"
    swept = False
    for leftover in (staging, old):
        if fs.exists(spark, leftover):
            fs.delete(spark, leftover)
            swept = True
    return "swept" if swept else "clean"


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
    verify_counts: bool = True,
) -> dict:
    """Rewrite ``path`` to ``ceil(total_bytes / target_file_bytes)``
    files. No-op (and no data movement) when the file count is already
    at or under the target — safe to schedule unconditionally after
    every streaming ingest window.

    Protocol: write the repartitioned copy to a staging sibling, mark
    it ``_COMMITTED`` (readers of the staging path ignore torn dirs,
    same rule as the MVCC sinks), then swap via two renames keeping the
    original as ``.__compact_old`` until the new directory is in place.
    Every crash window is recoverable by :func:`repair`, which runs
    first on each invocation.

    ``verify_counts`` re-counts the staged copy before the swap and
    aborts (deleting staging, original untouched) on any mismatch —
    the belt-and-braces guard for a tool whose failure mode is data
    loss. Returns a stats dict.
    """
    p = path.rstrip("/")
    repair(spark, p)
    names = _data_files(spark, p)
    total = sum(fs.file_size(spark, f"{p}/{n}") for n in names)
    n_target = max(1, math.ceil(total / target_file_bytes))
    if len(names) <= n_target:
        return {
            "compacted": False,
            "files": len(names),
            "bytes": total,
            "target_files": n_target,
        }

    df: DataFrame = spark.read.format(fmt).load(p)
    n_before = df.count() if verify_counts else None
    staging, old = p + _STAGING, p + _OLD
    fs.delete(spark, staging)
    df.repartition(n_target).write.format(fmt).mode("overwrite").save(staging)
    if verify_counts:
        n_staged = spark.read.format(fmt).load(staging).count()
        if n_staged != n_before:
            fs.delete(spark, staging)
            raise RuntimeError(
                f"compaction aborted: staged count {n_staged} != source {n_before}"
            )
    fs.mark_committed(spark, staging)
    fs.delete(spark, old)
    # Hadoop rename returns False instead of raising; every failure
    # must fail CLOSED with the original data reachable (directly or
    # via repair()), never delete-and-report-success.
    if not fs.rename(spark, p, old):
        fs.delete(spark, staging)
        raise RuntimeError(f"compaction aborted: could not move {p} aside")
    if not fs.rename(spark, staging, p):
        rolled_back = fs.rename(spark, old, p)
        raise RuntimeError(
            f"compaction failed installing the compacted copy at {p}; "
            + ("original restored" if rolled_back else
               "original preserved at " + old + " (run repair())")
        )
    fs.delete(spark, old)
    return {
        "compacted": True,
        "files": len(names),
        "bytes": total,
        "target_files": n_target,
        "rows": n_before,
    }
