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


# Driver-window rotation (round 8). The driver's correctness harness
# checks the FIRST 50 entries of queries() in declaration order.
# Certification history: r6's window covered q01-q39, q72, q93,
# q96-q100, q106-q109 (CORRECTNESS_r06 — 50/50); r7's covered
# q40-q71, q73-q85, q104-q106, q110-q111 + q59 (CORRECTNESS_r07 —
# 50/50); the stalest certificates on the surface are the r5-window
# ones (q86-q92, q94, q95, q101-q103 — the r7 verdict's re-certify
# list). This round leads with the CHANGED queries: q59 (certification
# tier fused to 2 exact fact passes), q104 (serve + oracle moved to
# sign-aware overflow-safe integer half-up), q110 (image fixtures now
# mixed PPM+PNG through the new zlib PNG decode; scan glob widened),
# and the six whose ORACLE SQL was rewritten for x10 tractability
# (blocked shingle equi-join replaces all-pairs list_intersect):
# q23, q24, q37, q50, q67, q95. Then the 12 stale r5-certified
# queries. The rest fill stalest-first (the r6 block).
_ROTATION_FRONT = [
    "q59_approx_group_sketches",
    "q104_stream_rollup_serve",
    "q110_multimodal_neardup",
    "q23_minhash_lsh_neardup",
    "q24_ngram_jaccard_neardup",
    "q37_duplicate_clusters",
    "q50_dedup_incremental_batch",
    "q67_cluster_dedup_report",
    "q95_cluster_size_profile",
    # the stale r5-certified block (last driver row: CORRECTNESS_r05)
    "q86_group_trend",
    "q87_personalized_pagerank",
    "q88_rolling_active_users",
    "q89_decayed_engagement",
    "q90_equidepth_histogram",
    "q91_association_lift",
    "q92_source_overlap",
    "q94_split_balance_audit",
    "q101_cobucketed_revenue",
    "q102_rangesorted_event_scan",
    "q103_stream_upsert_merge",
]
# round each query number last earned a driver CORRECTNESS row
_R7_CERTIFIED = (
    set(range(40, 72)) | set(range(73, 86)) | {104, 105, 106, 110, 111}
)
_R6_CERTIFIED = (
    set(range(1, 40)) | {72, 93} | set(range(96, 101)) | {107, 108, 109}
)
_R5_CERTIFIED = (set(range(86, 96)) | set(range(101, 104))) - _R7_CERTIFIED
# highest query number existing when this rotation was written: anything
# above it is NEW and auto-fronts even if _ROTATION_FRONT wasn't edited —
# a brand-new query must never ship outside the driver's 50-entry window
# (the mechanical tier the r6 review asked to keep)
_KNOWN_MAX = 111


def _rotated(names: list[str]) -> list[str]:
    def num(n: str) -> int:
        return int(n.split("_", 1)[0][1:])

    def staleness(n: str) -> int:  # lower sorts first = stalest
        if num(n) in _R7_CERTIFIED:
            return 2
        if num(n) in _R6_CERTIFIED:
            return 1
        return 0  # r5 certificates — oldest on the surface

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
