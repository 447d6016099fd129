"""As-of (point-in-time) join — an operator Spark's join menu lacks.

For each left row, attach the single right row with the greatest
``right_ts <= left_ts`` within the same key group (the "latest state
known at that moment" join: order ← latest account snapshot, trade ←
latest quote, merchant query ← latest verdict refresh; generalizes the
reference's latest-state lookups, src/services/dataManager.ts:26-51,
from "latest overall" to "latest as of a probe time").

Spark-first shape — the UNION + WINDOW form, not a range join:

    right: (k, t, v)  tagged 0        left: (k, t, ...)  tagged 1
        └────────────── unionByName ──────────────┘
    last(v ignorenulls) OVER (PARTITION BY k ORDER BY t, tag
                              ROWS UNBOUNDED PRECEDING..CURRENT)
        └── filter tag = 1 → left rows now carry the as-of value

A predicate join ``ON l.k = r.k AND r.t <= l.t`` explodes to
|right_per_key| × |left_per_key| candidate pairs before the argmax
prunes them; the union form is ONE hash shuffle on the key and a
per-partition sort — linear in |left| + |right|, the same cost class
as the key-grouped window it is. Skewed keys get AQE's skew splitting
on the exchange; within a key the sort is the unavoidable lower bound
(as-of is an ordering-dependent operator).

Ties: a right row at exactly ``left_ts`` IS visible (inclusive match,
tag 0 sorts before tag 1 at equal time). Duplicate right rows at the
same (key, time) must be resolved by the caller (e.g. ``max_by`` on a
sequence column) — the operator asserts nothing about them and the
window would pick the last in arbitrary intra-time order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    prefix: str = "",
    tolerance: int | float | None = None,
) -> DataFrame:
    """Backward as-of left join. Returns every left row + for each
    ``value_cols`` entry a ``{prefix}{col}`` column and
    ``{prefix}{right_ts}`` (the matched observation time), all NULL
    when no right row precedes the left row.

    ``left``/``right`` time columns must be mutually comparable
    (both timestamp, both date, or both numeric).

    ``tolerance`` bounds match staleness (pandas ``merge_asof``'s
    tolerance): a match older than ``left_ts - tolerance`` is nulled
    out, exactly as if no observation preceded the row. Units: SECONDS
    for timestamp/date time columns, plain column units for numeric
    ones. Implemented as a post-window filter on the carried struct —
    the plan shape (one key shuffle, zero join operators) is
    unchanged.

    Raises ``ValueError`` when an output alias ``{prefix}{col}`` would
    shadow an existing left column (e.g. the default ``prefix=""`` with
    a shared ``ts`` name on both sides would silently emit two columns
    named ``ts``), or when ``left`` already carries one of the reserved
    internal names ``__t``/``__v``/``__tag``/``__m``.
    """
    reserved = {"__t", "__v", "__tag", "__m"}
    clash = reserved.intersection(left.columns)
    if clash:
        raise ValueError(
            f"asof_join reserves internal column names {sorted(clash)}; "
            "rename them on the left side first"
        )
    out_aliases = [f"{prefix}{right_ts}", *(f"{prefix}{c}" for c in value_cols)]
    shadowed = [a for a in out_aliases if a in left.columns]
    if shadowed:
        raise ValueError(
            f"asof_join output column(s) {shadowed} collide with left columns; "
            "pass a non-empty prefix (e.g. prefix='r_')"
        )
    dupes = sorted({a for a in out_aliases if out_aliases.count(a) > 1})
    if dupes:
        # value_cols repeating right_ts (or each other) would emit two
        # output columns under one name — the same silent-shadowing
        # failure the left-side guard exists for
        raise ValueError(
            f"asof_join output aliases collide with each other: {dupes}; "
            "deduplicate value_cols / right_ts"
        )
    carried = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c).alias(c) for c in value_cols]
    )
    r = right.select(
        *key_cols,
        F.col(right_ts).alias("__t"),
        carried.alias("__v"),
        F.lit(0).alias("__tag"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        F.lit(None).cast(r.schema["__v"].dataType).alias("__v"),
        F.lit(1).alias("__tag"),
    )
    u = r.unionByName(l, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__v", ignorenulls=True).over(w)
    res = u.withColumn("__m", matched).filter(F.col("__tag") == 1)
    if tolerance is not None:
        if tolerance < 0:
            raise ValueError(f"tolerance must be >= 0, got {tolerance}")
        t_type = dict(left.dtypes)[left_ts]
        if t_type in ("timestamp", "timestamp_ntz", "date"):
            age = F.unix_micros(F.col("__t").cast("timestamp")) - F.unix_micros(
                F.col("__m")[right_ts].cast("timestamp")
            )
            in_tol = age <= int(tolerance * 1_000_000)
        else:
            in_tol = (F.col("__t") - F.col("__m")[right_ts]) <= F.lit(tolerance)
        res = res.withColumn("__m", F.when(in_tol, F.col("__m")))
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("__m")[right_ts].alias(f"{prefix}{right_ts}"))
    out_cols.extend(F.col("__m")[c].alias(f"{prefix}{c}") for c in value_cols)
    return res.select(*out_cols)
