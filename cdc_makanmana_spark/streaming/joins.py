"""Stream-stream joins: watermark-bounded state on both sides.

The missing piece of the streaming surface next to windowed aggs
(cdc.py) and custom state (stateful.py): joining two LIVE streams —
the canonical ad-tech shape (impressions ⋈ clicks within an
attribution window), or in this engine's domain a merchant-refresh
stream against a verdict-refresh stream.

Why the time bound is mandatory: without one, Spark must keep EVERY
past row of both sides forever (any future row might match) — state
grows without bound and the job dies at scale. With an event-time
constraint plus watermarks on both sides, each side's state is
evicted once the other side's watermark passes the constraint window:
state size is O(rows inside the attribution window), independent of
stream age. That eviction bound is the whole design; an unbounded
stream-stream join is a bug, not a feature, so this module refuses to
build one.

Reference analogue: none directly (the reference is request/response),
but the TTL'd verdict-cache refresh (externalData.ts:191-224) composed
with the merchant refresh stream is exactly this join's domain shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    watermark: str = "30 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on key equality plus the event-time band
    ``left_ts - lower_s <= right_ts <= left_ts + upper_s``.

    Both sides get ``withWatermark`` (required: the watermark + band
    is what lets Spark evict join state — see module docstring).
    ``how`` supports 'inner' and 'left_outer'; outer results for
    unmatched left rows emit only once the right watermark passes the
    band's upper edge (late-binding NULLs — inherent to streaming
    outer joins, not a bug: the row must wait until a match is
    provably impossible).

    Column collisions: ``right`` must not share non-key column names
    with ``left`` (rename upstream) — Spark would silently emit
    ambiguous duplicates.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"stream-stream join supports inner/left_outer, got {how!r}")
    if lower_s < 0 or upper_s < 0:
        raise ValueError("lower_s/upper_s are non-negative band widths")
    overlap = set(left.columns) & set(right.columns) - set(key_cols)
    if overlap:
        raise ValueError(
            f"right stream re-uses left column names {sorted(overlap)}; "
            "rename them before joining"
        )
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    band = (
        F.col(right_ts)
        >= F.col(left_ts) - F.expr(f"INTERVAL {lower_s} SECONDS")
    ) & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper_s} SECONDS"))
    cond = band
    for k in key_cols:
        cond = (l[k] == r[k]) & cond
    joined = l.join(r, cond, how)
    # de-duplicate the key columns (present on both sides post-join)
    keep = [l[k].alias(k) for k in key_cols]
    keep += [l[c] for c in left.columns if c not in key_cols]
    keep += [r[c] for c in right.columns if c not in key_cols]
    return joined.select(*keep)
