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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
