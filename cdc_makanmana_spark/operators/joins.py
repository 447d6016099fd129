"""Shared join helpers.

``join_null_safe`` is the engine's one idiom for re-joining per-group
frames on their GROUP KEYS: SQL GROUP BY treats a NULL key as a real
group, so any equi-join re-assembling grouped legs must use null-safe
equality or it silently orphans the NULL-key group (the r6 class found
in exact_group_percentiles and q34). Right-side keys are renamed
before the join because frames derived from one base scan share
attribute ids — qualifying by source frame self-compares a single
attribute (MISSING_ATTRIBUTES) — and the renamed columns are dropped
after.

Plan shape: EqualNullSafe is an extractable equi-join key (hash/sort
join eligible, never a nested loop); the one planning difference from
a plain equi-join is that Catalyst cannot infer IS NOT NULL filters on
the keys — which is exactly the semantics being asked for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def join_null_safe(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    how: str = "inner",
    hint=None,
) -> DataFrame:
    """Join ``left`` and ``right`` on ``keys`` with NULL-SAFE equality
    (NULL key == NULL key). ``hint`` (e.g. ``F.broadcast``) wraps the
    renamed right side — pass it only under a bounded-cardinality
    contract, as everywhere else in the engine."""
    renamed = right
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"__r_{k}")
    if hint is not None:
        renamed = hint(renamed)
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__r_{k}"))
        cond = c if cond is None else (cond & c)
    return left.join(renamed, cond, how).drop(*[f"__r_{k}" for k in keys])
