"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``cdc_makanmana_spark.plans.queries`` — the declared
query surface (SURVEY.md §2/§7). The driver runs ``entry(spark)`` as a
smoke check and hash-diffs each ``queries()[name]`` against
``oracle_sql()[name]`` via DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_makanmana_spark.plans.queries import ORACLE_SQL, QUERIES, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


# Driver-window rotation (round 9). The driver's correctness harness
# checks the FIRST 50 entries of queries() in declaration order.
# Certification history: r7's window covered q40-q71, q73-q85,
# q104-q106, q110-q111 + q59 (CORRECTNESS_r07 — 50/50); r8's covered
# the 20 changed/stale-r5 queries (q59, q104, q110, q23/q24/q37/q50/
# q67/q95, q86-q92, q94, q101-q103) plus q01-q22 and q25-q32
# (CORRECTNESS_r08 — 50/50); the stalest certificates on the surface
# are the 16 r6-window ones (the r8 verdict's re-certify list). This
# round leads with the CHANGED queries: q77 + q87 (oracle SQL rewritten
# from recursive CTEs to unrolled MATERIALIZED fixed-iteration passes —
# 101 s → 0.6 s at sf0.1), q76 (within-block pairing cost work), and
# q110 (JPEG joins the fixture mix through the new baseline-DCT
# decode). Then the 16 stale r6-certified queries. The rest fill
# stalest-first (the r7 block, by number). New queries (q112+)
# auto-front via _KNOWN_MAX.
_ROTATION_FRONT = [
    "q77_pagerank_influence",
    "q87_personalized_pagerank",
    "q76_knn_graph",
    "q110_multimodal_neardup",
    # the stale r6-certified block (last driver row: CORRECTNESS_r06)
    "q33_distance_format_hours",
    "q34_group_stats",
    "q35_embedding_blocked_neardup",
    "q36_grouping_sets",
    "q38_salted_supplier_rollup",
    "q39_ann_ivf_topk",
    "q72_scd2_event_intervals",
    "q93_activity_gini",
    "q96_edge_churn",
    "q97_time_weighted_value",
    "q98_snm_multipass",
    "q99_persistent_heavy_hitters",
    "q100_referential_audit",
    "q107_stream_dedup",
    "q108_scd2_pit_join",
    "q109_embedding_decontamination",
]
# round each query number last earned a driver CORRECTNESS row
_R8_CERTIFIED = (
    {59, 104, 110, 23, 24, 37, 50, 67, 95}
    | set(range(86, 93))
    | {94}
    | set(range(101, 104))
    | set(range(1, 23))
    | set(range(25, 33))
)
_R7_CERTIFIED = (
    set(range(40, 72)) | set(range(73, 86)) | {104, 105, 106, 110, 111}
) - _R8_CERTIFIED
_R6_CERTIFIED = (
    set(range(1, 40)) | {72, 93} | set(range(96, 101)) | {107, 108, 109}
) - _R8_CERTIFIED - _R7_CERTIFIED
# highest query number existing when this rotation was written: anything
# above it is NEW and auto-fronts even if _ROTATION_FRONT wasn't edited —
# a brand-new query must never ship outside the driver's 50-entry window
# (the mechanical tier the r6 review asked to keep)
_KNOWN_MAX = 111


def _rotated(names: list[str]) -> list[str]:
    def num(n: str) -> int:
        return int(n.split("_", 1)[0][1:])

    def staleness(n: str) -> int:  # lower sorts first = stalest
        if num(n) in _R8_CERTIFIED:
            return 2
        if num(n) in _R7_CERTIFIED:
            return 1
        return 0  # r6 certificates — oldest on the surface

    front = sorted((n for n in names if num(n) > _KNOWN_MAX), key=num)
    front += [n for n in _ROTATION_FRONT if n in names and n not in front]
    rest = [n for n in names if n not in front]
    rest.sort(key=lambda n: (staleness(n), num(n)))
    return front + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    order = _rotated(list(QUERIES))
    return {n: QUERIES[n] for n in order}


def oracle_sql() -> dict[str, str]:
    # same rotated order as queries() in case the driver iterates this
    # dict rather than keying into it
    order = _rotated(list(QUERIES))
    return {n: ORACLE_SQL[n] for n in order if n in ORACLE_SQL}
