"""Skew-mitigation operators (SURVEY.md §4 scale tactics).

First line of defense at scale is AQE (``skewJoin.enabled`` splits
oversized post-shuffle partitions at runtime — on by default in
``session.get_spark``). Salting is for the cases AQE can't fix:

- a shuffle join where ONE key holds a meaningful fraction of all rows
  (AQE splits the partition, but every split still contains the same
  hot key on the build side);
- holistic aggregations (``collect_list``/``collect_set``) where a hot
  group's buffer must fit one task.

``salted_join`` spreads each hot fact key over ``n_salts`` shuffle
partitions by appending a salt to the key, replicating the (small-side)
dim rows once per salt. Replication multiplies the dim by ``n_salts``,
so this is for dim tables too big to broadcast but small enough to
replicate — the classic mid-size-dim skew case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the fact side salted over ``n_salts``
    buckets and the dim side replicated to every bucket.

    The salt is derived from the fact row's full content hash —
    deterministic (re-runs and retried tasks salt identically; no
    ``rand()``, which would break task-retry correctness) while still
    spreading a hot key's rows across buckets.

    Only ``inner`` and ``left`` are legal: the dim side is replicated
    ``n_salts``×, so a right/full outer join would emit every unmatched
    dim row once PER SALT — silently wrong. Refused loudly here.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner', 'left'); got {how!r} — "
            "the replicated dim side would duplicate unmatched rows "
            f"{n_salts}x under outer semantics"
        )
    fact_salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    )
    dim_replicated = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    out = fact_salted.join(dim_replicated, [key, "__salt"], how)
    return out.drop("__salt")


def top_frequency_keys(df: DataFrame, key: str, min_count: int) -> DataFrame:
    """Diagnostic: keys whose row count is at least ``min_count`` —
    the skew survey you run before choosing broadcast / salting /
    df-capping (the same measurement the dedup ladder's
    ``max_shingle_df`` guard is built on)."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") >= min_count)
        .orderBy(F.desc("n_rows"), F.asc(key))
    )
