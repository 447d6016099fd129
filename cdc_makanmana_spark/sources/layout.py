"""Bucketed table layout: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a repeated fact-fact join (orders ×
lineitem every run, events × sessions every run) is re-shuffling both
sides on the join key each time. Bucketing pays that shuffle ONCE at
write: rows are hash-partitioned into ``n_buckets`` files per side,
and any equi-join between tables bucketed on the same key with the
same bucket count plans with NO Exchange on either side — Catalyst
proves co-partitioning from the catalog metadata (verified by
tests/test_plans.py::test_cobucketed_join_plans_without_exchange).

Sorted buckets (``sort_by``) additionally let the join run as a merge
without an in-memory hash map, and give downstream window functions
their ordering for free.

Reference analogue: none — the reference re-scans its whole table per
query (merchantUtils.ts:37); this is the storage-layout discipline a
Spark deployment adds. Bucket pruning on point predicates and
AQE-coalesced small buckets come free with the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_by: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    ``n_buckets`` sizing rule at scale: total_size / n_buckets should
    land near the executor task target (128-512 MB compressed) — too
    few buckets caps join parallelism, too many makes small files.
    Both sides of a planned co-located join MUST use the same
    ``bucket_cols`` and ``n_buckets``.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucketing metadata rides along, which is what
    lets Catalyst elide the Exchange."""
    return spark.table(table)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int = 32,
) -> None:
    """Data-skipping layout: range-repartition on ``sort_cols`` then
    sort within each partition before writing parquet.

    Why this matters at 100 TB: parquet stores min/max statistics per
    row group, and the scan skips any row group whose range excludes
    the filter — but stats only PRUNE if the data is clustered. A
    hash-shuffled write scatters every value range across every file
    (all stats cover everything, nothing skips); this layout gives
    each file a DISJOINT value range and each row group a tight one,
    so a selective predicate on the sort prefix reads a sliver of the
    table instead of all of it. The single-dimension cousin of
    Z-order clustering, and the right default for the one column your
    queries actually filter on (event time, doc length, score).

    The range exchange samples the column to build balanced
    boundaries — one extra job at write time, zero cost at read."""
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
