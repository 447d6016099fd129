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


# Driver-window rotation (round 7). The driver's correctness harness
# checks the FIRST 50 entries of queries() in declaration order.
# Certification history: r1-r4 covered q01-q50; r5's rotated window
# covered q51-q95 and q101-q105; r6's covered q01-q39 (re-certified),
# q72, q93, q96-q100 and q106-q109 (CORRECTNESS_r06.json — 50/50
# green). This round leads with the CHANGED queries — q59 (now
# hash-certifiable: exact values + in-bound flags, its first-ever
# oracle row) and q106 (NULL-key pin changed the Spark plan) — plus
# the NEW q110/q111 (auto-front via the number rule; q111 also lands
# inside the window because 111 > _KNOWN_MAX) and q105 (its replay
# build gained volume-adaptive batching this round — the served scan
# is unchanged and batching independence is test-pinned, but the
# front-what-changed rule applies to the whole build-through-serve
# path). The rest follow stalest-certification-first: the
# r4-certified q40-q50 block (oldest certificates on the surface),
# then the r5 block, then the just-certified r6 block.
_ROTATION_FRONT = [
    "q59_approx_group_sketches",
    "q106_stream_stateful_asof",
    "q105_stream_interval_join",
    # serve-plan change this round: avg now derives via exact integer
    # half-up (the x10 organic probe caught round(double,4) diverging
    # between engines at a decimal tie — see rollup.serve)
    "q104_stream_rollup_serve",
]
# round each query number last earned a driver CORRECTNESS row
_R6_CERTIFIED = (
    set(range(1, 40)) | {72, 93} | set(range(96, 101)) | {106, 107, 108, 109}
)
_R5_CERTIFIED = (set(range(51, 96)) | set(range(101, 106))) - _R6_CERTIFIED
# highest query number existing when this rotation was written: anything
# above it is NEW and auto-fronts even if _ROTATION_FRONT wasn't edited —
# a brand-new query must never ship outside the driver's 50-entry window
# (the mechanical tier the r6 review asked to keep)
_KNOWN_MAX = 110


def _rotated(names: list[str]) -> list[str]:
    def num(n: str) -> int:
        return int(n.split("_", 1)[0][1:])

    def staleness(n: str) -> int:  # lower sorts first = stalest
        if num(n) in _R6_CERTIFIED:
            return 2
        if num(n) in _R5_CERTIFIED:
            return 1
        return 0  # r4 certificates (q40-q50) — oldest on the surface

    front = sorted((n for n in names if num(n) > _KNOWN_MAX), key=num)
    front += ["q110_multimodal_neardup"] if "q110_multimodal_neardup" in names else []
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
