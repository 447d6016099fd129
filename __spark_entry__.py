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


# Driver-window rotation (round 6). The driver's correctness harness
# checks the FIRST 50 entries of queries() in declaration order.
# Certification history: r1-r4 covered q01-q50; r5's rotated window
# covered q103-q105, q101-q102 and q51-q95 (CORRECTNESS_r05.json),
# leaving q96-q100 never driver-certified. This round leads with the
# new streaming queries (q106/q107), the never-certified q96-q100,
# and the queries FIXED this round (q72/q93 — the HUGEINT oracle-type
# mismatches r5 flagged — plus q34, whose Spark plan changed); the
# rest follow stalest-certification-first (the r4-certified q01-q50
# block before the r5-certified block) so every query's driver row is
# refreshed within two rounds of any change.
_ROTATION_FRONT = [
    "q106_stream_stateful_asof",
    "q107_stream_dedup",
    "q96_edge_churn",
    "q97_time_weighted_value",
    "q98_snm_multipass",
    "q99_persistent_heavy_hitters",
    "q100_referential_audit",
    "q72_scd2_event_intervals",
    "q93_activity_gini",
    "q34_group_stats",
]
# round each query number last earned a driver CORRECTNESS row
_R5_CERTIFIED = set(range(51, 96)) | {101, 102, 103, 104, 105}
# highest query number existing when this rotation was written: anything
# above it is NEW and auto-fronts even if _ROTATION_FRONT wasn't edited —
# a brand-new query must never ship outside the driver's 50-entry window
# (the mechanical tier the r6 review asked to keep)
_KNOWN_MAX = 107


def _rotated(names: list[str]) -> list[str]:
    def num(n: str) -> int:
        return int(n.split("_", 1)[0][1:])

    front = sorted((n for n in names if num(n) > _KNOWN_MAX), key=num)
    front += [n for n in _ROTATION_FRONT if n in names and n not in front]
    rest = [n for n in names if n not in front]
    rest.sort(key=lambda n: (num(n) in _R5_CERTIFIED, num(n)))
    return front + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    order = _rotated(list(QUERIES))
    return {n: QUERIES[n] for n in order}


def oracle_sql() -> dict[str, str]:
    # same rotated order as queries() in case the driver iterates this
    # dict rather than keying into it
    order = _rotated(list(QUERIES))
    return {n: ORACLE_SQL[n] for n in order if n in ORACLE_SQL}
