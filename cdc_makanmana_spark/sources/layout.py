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


def zorder_key(
    quantized: "list",
    bits: int = 8,
):
    """Morton (Z-order) interleave of pre-quantized columns: bit j of
    column i lands at position ``j * n_cols + i`` of the key, so the
    key's ordering alternates between dimensions at every bit — rows
    close in ANY dimension stay close in key order, which is what
    makes multi-column min/max pruning work (a single-column sort
    gives one dimension perfect clustering and the others none).

    ``quantized`` are integer Columns already in ``[0, 2**bits)``
    (see ``write_zordered`` for the quantizer). Pure codegen bit ops
    — ``bits * n_cols`` shift/mask/or terms, no UDF, no shuffle.
    """
    from pyspark.sql import functions as F

    n = len(quantized)
    if bits * n > 63:
        # bit position j*n+i would reach the long's sign bit: high-range
        # keys go negative and the range sort mis-clusters exactly the
        # rows it should cluster — silent data-skipping degradation.
        raise ValueError(
            f"bits * n_cols = {bits * n} exceeds 63: Morton key overflows "
            f"the signed long (reduce bits to <= {63 // n} for {n} columns)"
        )
    key = F.lit(0).cast("long")
    for j in range(bits):
        for i, q in enumerate(quantized):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(q.cast("long"), j).bitwiseAND(F.lit(1)),
                    j * n + i,
                )
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 32,
) -> None:
    """Multi-dimension data-skipping layout: Z-order clustering on
    ``cols`` (2-4 numeric/timestamp columns), then range-repartition +
    sort on the Morton key before writing parquet.

    ``write_range_sorted`` clusters ONE dimension perfectly and the
    rest not at all; Z-order trades a little per-dimension tightness
    for usable min/max pruning on EVERY listed column — the layout for
    a table filtered sometimes by time, sometimes by entity, sometimes
    by both (the Delta/Iceberg OPTIMIZE ZORDER discipline, expressed
    with plain DataFrame ops).

    Quantization is equi-width over the observed min/max (ONE small
    aggregate job at write time — 2 scalars per column on the driver,
    never data-sized): q = floor((x - min) / span * 2**bits), clamped.
    Equi-width keeps the quantizer pure codegen; heavily skewed
    columns cluster less tightly than a quantile quantizer would (the
    documented tradeoff — at that point pre-bucket the skewed column
    into its own partition column instead). NULLs quantize to 0 and
    therefore cluster together at the low end of the layout.

    Timestamp columns are quantized on their epoch-second value.
    """
    from pyspark.sql import functions as F

    num = {
        c: (
            F.unix_timestamp(F.col(c)).cast("double")
            if dict(df.dtypes)[c].startswith("timestamp")
            else F.col(c).cast("double")
        )
        for c in cols
    }
    stats = df.agg(
        *[F.min(e).alias(f"mn_{c}") for c, e in num.items()],
        *[F.max(e).alias(f"mx_{c}") for c, e in num.items()],
    ).collect()[0]
    hi = (1 << bits) - 1
    quantized = []
    for c, e in num.items():
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) or 1.0
        q = F.floor((e - F.lit(mn)) / F.lit(span) * (1 << bits))
        quantized.append(
            F.coalesce(F.least(F.greatest(q, F.lit(0)), F.lit(hi)), F.lit(0))
        )
    (
        df.withColumn("__zkey", zorder_key(quantized, bits))
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
