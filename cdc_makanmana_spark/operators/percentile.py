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

1. one map-side-combinable pass: exact non-null count AND a
   Greenwald-Khanna ``approx_percentile`` sketch per group; the sketch
   brackets each target rank from both sides. GK's rank error is
   DETERMINISTIC (≤ n/accuracy), so with the percentage margins below
   the bracket provably contains the target ranks — a
   correctness-preserving bracket, not a heuristic;
2. one pass: rows inside any bracket are tagged per target (a row can
   serve several targets when brackets overlap), counted-below to
   anchor local offsets, and the two neighboring order statistics are
   picked by a window over the TINY band (~6·n/accuracy rows per
   target per group at the default accuracy);
3. interpolate with Spark Percentile's WEIGHTED BLEND —
   ``(higher-position)*lo + (position-lower)*hi`` with the early
   return at integral positions — bit-identical to the builtin (NOT
   ``lo + (hi-lo)*frac``, whose last-ulp rounding differs; the same
   formula-divergence class q90 hit between Spark and DuckDB inside
   duplicate runs).

The wide input is never sorted, never map-merged: both full-table
passes are map-side-combinable aggregates, and the only sort touches
the band. At 100 TB the band stays ~6·n/accuracy rows — raise
``accuracy`` to shrink it.

Reference shape: the reference computes client-side order statistics
over the full in-memory merchant array (src/utils/merchantUtils.ts);
this is the engine's distributed generalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from cdc_makanmana_spark.operators.joins import join_null_safe as _join_null_safe


def exact_group_percentiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    percentages: list[float],
    accuracy: int = 10_000,
    broadcast_groups: bool = False,
) -> DataFrame:
    """(key_cols..., p, value) — the exact interpolated percentile of
    ``value_col`` per group for every p in ``percentages``, matching
    ``percentile(value, array(...))`` / DuckDB ``quantile_cont``.

    ``broadcast_groups`` pins a broadcast of the per-group meta/below
    frames onto the wide-side joins: pass True when the GROUP-KEY
    cardinality is known small (q34: 3 flags — the static planner
    otherwise stages SortMergeJoins whose probe-side shuffles cost more
    than AQE's late conversion recovers, measured +8 s at 100×); leave
    False for unknown cardinality — a pinned broadcast that scales
    with group count is the driver-OOM trap.

    NULL values are ignored within a group; a group whose values are
    ALL NULL is still emitted, with NULL for every percentage (the
    builtin aggregate's contract — an operator that silently dropped
    such groups would shrink downstream joins). Groups smaller than
    ``accuracy`` rows skip the bracket and sort directly — the band IS
    the group there (and the bracket guarantee below needs
    n ≥ accuracy).
    """
    if not percentages:
        raise ValueError("percentages must be non-empty")
    for p in percentages:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percentage {p} outside [0, 1]")
    eps = 1.0 / accuracy
    k = len(percentages)

    rows = df.select(*key_cols, F.col(value_col).alias("__v"))

    # ONE pass for both the exact non-null count and the GK bracket
    # (count(__v) and approx_percentile both ignore NULLs, and a group
    # of only NULLs still yields its meta row — count 0, NULL sketch).
    # Bracket guarantee: the sketch at percentage (p - 3ε) returns a
    # value holding SOME sorted index j with j ≤ (p-3ε+ε)n = pn - 2εn;
    # pn - 2εn ≤ floor(p(n-1)) whenever 2εn ≥ p + 1 — i.e. for groups
    # with n ≥ accuracy the bracket PROVABLY contains both neighboring
    # order statistics (symmetric argument for p + 3ε above).
    lo_pcts = [max(0.0, p - 3.0 * eps) for p in percentages]
    hi_pcts = [min(1.0, p + 3.0 * eps) for p in percentages]
    meta = rows.groupBy(*key_cols).agg(
        F.count("__v").alias("__n"),
        F.expr(
            f"approx_percentile(__v, array({', '.join(repr(x) for x in lo_pcts + hi_pcts)}), {accuracy})"
        ).alias("__bnd"),
    )
    small = F.col("__n") < accuracy
    meta = meta.select(
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
    hint = F.broadcast if broadcast_groups else (lambda side: side)
    tagged = _join_null_safe(
        rows.filter(F.col("__v").isNotNull()), meta, key_cols, hint=hint
    )
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
    band = tagged.select(*key_cols, "__v", F.explode(targets).alias("__t")).filter(
        (F.col("__v") >= F.col("__t.blo")) & (F.col("__v") <= F.col("__t.bhi"))
    )

    w = Window.partitionBy(*key_cols, F.col("__t.ti")).orderBy("__v")
    ranked = _join_null_safe(
        band.withColumn("__r", F.row_number().over(w) - 1),
        below,
        key_cols,
        hint=hint,
    )
    # local offsets of the two neighboring order statistics
    off = F.col("__r") + _below_of(k)
    lo_hit = off == F.col("__t.lo_idx")
    hi_hit = off == F.col("__t.lo_idx") + 1
    picked = (
        ranked.filter(lo_hit | hi_hit)
        .groupBy(*key_cols, F.col("__t.ti").alias("__ti"))
        .agg(
            F.first(F.col("__t.position")).alias("__pos"),
            F.min(F.when(lo_hit, F.col("__v"))).alias("__lo"),
            F.min(F.when(hi_hit, F.col("__v"))).alias("__hi"),
        )
    )
    # bit-identical to Spark Percentile.getPercentile: early return at
    # integral positions, else the weighted blend.
    lower = F.floor(F.col("__pos")).cast("double")
    higher = F.ceil(F.col("__pos")).cast("double")
    value = F.when(higher == lower, F.col("__lo")).otherwise(
        (higher - F.col("__pos")) * F.col("__lo")
        + (F.col("__pos") - lower) * F.col("__hi")
    )

    # (group × percentage) universe from the meta frame, so all-NULL
    # groups surface with NULL values instead of vanishing.
    universe = meta.select(
        *key_cols,
        "__n",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("__ti"), F.lit(float(p)).alias("p"))
                    for i, p in enumerate(percentages)
                ]
            )
        ).alias("__u"),
    ).select(
        *key_cols, "__n", F.col("__u.__ti").alias("__ti"), F.col("__u.p").alias("p")
    )
    # Bracket-miss guard: a (group, p) with non-null rows (__n > 0)
    # MUST have picked both order statistics — a NULL here means the
    # GK bracket failed its guarantee (e.g. a merged sketch whose rank
    # error exceeded 1/accuracy), and silently returning NULL would be
    # indistinguishable from an all-NULL group downstream. Raise in the
    # executor instead of emitting plausible-looking NULLs.
    # picked is (groups × percentages) rows — bounded by the same
    # contract that justifies broadcast_groups, so the hint rides along
    # (without it the static planner stages a SortMergeJoin here)
    joined = _join_null_safe(
        universe,
        picked.select(*key_cols, "__ti", value.alias("value")),
        [*key_cols, "__ti"],
        "left",
        hint=hint,
    )
    checked = F.when(
        F.col("value").isNull() & (F.col("__n") > 0),
        F.raise_error(
            F.concat(
                F.lit("exact_group_percentiles: GK bracket missed for p="),
                F.col("p").cast("string"),
                F.lit(" in a group with __n="),
                F.col("__n").cast("string"),
            )
        ).cast("double"),
    ).otherwise(F.col("value"))
    return joined.select(*key_cols, "p", checked.alias("value"))


def _below_of(k: int) -> Column:
    """below_<ti> column selected by the row's target index (k is tiny
    — a CASE chain stays codegen-friendly)."""
    expr = F.lit(None).cast("long")
    for i in range(k):
        expr = F.when(F.col("__t.ti") == i, F.col(f"__below_{i}")).otherwise(expr)
    return expr
