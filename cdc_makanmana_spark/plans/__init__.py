"""Declared query surface: (spark_fn, oracle_sql) registry."""

from cdc_makanmana_spark.plans.queries import ORACLE_SQL, QUERIES

__all__ = ["QUERIES", "ORACLE_SQL"]
