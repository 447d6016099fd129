"""Exact interpolated percentiles at cluster scale: approx-bracket +
exact-within-band.

Spark's exact ``percentile`` aggregate builds a value→count map per
group and merges the maps at the group's single reducer — when the
value domain barely compresses (e.g. 2-dp prices over a wide range:
26.6M distinct (flag, price) pairs at the 100× organic probe), a
3-group aggregation funnels ~9M-entry map merges through 3 tasks and
dominates the whole query (measured: 44-48 s of q34's 67-93 s).

This operator computes the SAME result (linear interpolation at rank
``q*(n-1)``, Spark/DuckDB ``quantile_cont`` semantics) with bounded
per-task state:

1. one pass: exact group counts ``n``;
2. one pass: a Greenwald-Khanna ``approx_percentile`` sketch per group
   brackets each target rank from both sides. GK's rank error is
   DETERMINISTIC (≤ n/accuracy), so with a 2/accuracy percentage
   margin the bracket provably contains the target ranks — this is a
   correctness-preserving bracket, not a heuristic;
3. one pass: rows inside any bracket are tagged per target (a row can
   serve several targets when brackets overlap), counted-below to
   anchor local offsets, and the two neighboring order statistics are
   picked by a window over the TINY band (~4·n/accuracy rows per
   target per group, ≈8k at n=20M with the default accuracy);
4. interpolate ``lo + (hi - lo) * frac`` — bit-identical to Spark's
   Percentile evaluator (and exact when hi == lo, matching the q90
   duplicate-run lesson).

The wide input is never sorted, never map-merged: every full-table
pass is a map-side-combinable aggregate, and the only sort touches the
band. At 100 TB the band stays ~4·n/accuracy rows — raise ``accuracy``
to shrink it.

Reference shape: src/utils/distanceUtils.ts:1-12 computes client-side
stats over the full merchant array; this is the engine's distributed
generalization for order statistics.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F


def exact_group_percentiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    percentages: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    """(key_cols..., p, value) — the exact interpolated percentile of
    ``value_col`` per group for every p in ``percentages``, matching
    ``percentile(value, array(...))`` / DuckDB ``quantile_cont``.

    NULL values are ignored (aggregate semantics). Groups smaller than
    ~accuracy/2 rows skip the bracket and sort directly — the band IS
    the group there.
    """
    if not percentages:
        raise ValueError("percentages must be non-empty")
    for p in percentages:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percentage {p} outside [0, 1]")
    eps = 1.0 / accuracy

    rows = df.select(*key_cols, F.col(value_col).alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    counts = rows.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))

    # GK bracket per group: the sketch at percentage (p - 3ε) returns a
    # value holding SOME sorted index j with j ≤ (p-3ε+ε)n = pn - 2εn;
    # pn - 2εn ≤ floor(p(n-1)) whenever 2εn ≥ p + 1 — i.e. for groups
    # with n ≥ accuracy the bracket PROVABLY contains both neighboring
    # order statistics (symmetric argument for p + 3ε above). Groups
    # under the cutover take (-inf, +inf) — the band is the whole
    # group, whose sort is trivial at that size.
    lo_pcts = [max(0.0, p - 3.0 * eps) for p in percentages]
    hi_pcts = [min(1.0, p + 3.0 * eps) for p in percentages]
    bounds = rows.groupBy(*key_cols).agg(
        F.expr(
            f"approx_percentile(__v, array({', '.join(repr(x) for x in lo_pcts + hi_pcts)}), {accuracy})"
        ).alias("__bnd")
    )
    k = len(percentages)
    small = F.col("__n") < accuracy
    meta = counts.join(bounds, key_cols).select(
        *key_cols,
        "__n",
        *[
            F.when(small, F.lit(float("-inf")))
            .otherwise(F.col("__bnd")[i])
            .alias(f"__lo_{i}")
            for i in range(k)
        ],
        *[
            F.when(small, F.lit(float("inf")))
            .otherwise(F.col("__bnd")[k + i])
            .alias(f"__hi_{i}")
            for i in range(k)
        ],
    )

    # Per-target rank arithmetic (mirrors Spark Percentile: position =
    # p*(n-1) in double, floor/ceil neighbors).
    tagged = rows.join(F.broadcast(meta), key_cols)
    per_target = []
    for i, p in enumerate(percentages):
        rank = F.lit(float(p)) * (F.col("__n") - 1).cast("double")
        lo_idx = F.floor(rank).cast("long")
        per_target.append(
            F.struct(
                F.lit(i).alias("ti"),
                F.lit(float(p)).alias("p"),
                lo_idx.alias("lo_idx"),
                rank.alias("position"),
                F.col(f"__lo_{i}").alias("blo"),
                F.col(f"__hi_{i}").alias("bhi"),
            )
        )
    targets = F.array(*per_target)

    # One wide pass: for each target, how many rows fall strictly
    # below its bracket (anchors the band-local offset), plus the
    # band rows themselves tagged with the target index.
    below_cols = [
        F.sum(
            F.when(F.col("__v") < F.element_at(targets, i + 1)["blo"], 1).otherwise(0)
        ).alias(f"__below_{i}")
        for i in range(k)
    ]
    below = tagged.groupBy(*key_cols).agg(*below_cols)

    # explode-then-filter (k is tiny, the filter is codegen-inline):
    # a higher-order F.filter whose lambda mixes the outer __v with the
    # meta-side array trips Catalyst's projection collapse (the lambda
    # body lands in a plan node that no longer carries __v —
    # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND), so keep the predicate a
    # plain row-level filter instead
    band = (
        tagged.select(*key_cols, "__v", F.explode(targets).alias("__t"))
        .filter(
            (F.col("__v") >= F.col("__t.blo")) & (F.col("__v") <= F.col("__t.bhi"))
        )
    )

    w = Window.partitionBy(*key_cols, F.col("__t.ti")).orderBy("__v")
    ranked = band.withColumn("__r", F.row_number().over(w) - 1).join(
        F.broadcast(below), key_cols
    )
    # local offsets of the two neighboring order statistics
    off = F.col("__r") + _below_of(k)
    lo_hit = off == F.col("__t.lo_idx")
    hi_hit = off == F.col("__t.lo_idx") + 1
    picked = (
        ranked.filter(lo_hit | hi_hit)
        .groupBy(*key_cols, F.col("__t.ti").alias("__ti"))
        .agg(
            F.first(F.col("__t.p")).alias("p"),
            F.first(F.col("__t.position")).alias("__pos"),
            F.min(F.when(lo_hit, F.col("__v"))).alias("__lo"),
            F.min(F.when(hi_hit, F.col("__v"))).alias("__hi"),
        )
    )
    # bit-identical to Spark Percentile.getPercentile: early return at
    # integral positions, else the WEIGHTED BLEND (higher-position)*lo
    # + (position-lower)*hi — NOT lo + (hi-lo)*frac, whose rounding
    # differs in the last ulp and breaks hash parity
    lower = F.floor(F.col("__pos")).cast("double")
    higher = F.ceil(F.col("__pos")).cast("double")
    value = F.when(higher == lower, F.col("__lo")).otherwise(
        (higher - F.col("__pos")) * F.col("__lo")
        + (F.col("__pos") - lower) * F.col("__hi")
    )
    return picked.select(*key_cols, "p", value.alias("value"))


def _below_of(k: int) -> Column:
    """below_<ti> column selected by the row's target index (k is tiny
    — a CASE chain stays codegen-friendly)."""
    expr = F.lit(None).cast("long")
    for i in range(k):
        expr = F.when(F.col("__t.ti") == i, F.col(f"__below_{i}")).otherwise(expr)
    return expr
